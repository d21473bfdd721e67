#!/usr/bin/env bash
# Differential check of the descent's rho-sampling path against its DuckDB
# twin (r16 advice: the rho<100 branch ships dormant at the default
# rho=100, so a divergence between the Scala hash/used-set logic and the
# twin's unroll would go undetected until someone turns the dial).
#
# SPARK_GRAFT_DESCENT_RHO moves BOTH sides in lockstep: SimilarityOps
# reads it for the build, and Verify interpolates the same constant into
# oracle_sql.json at runtime. The refined family's five oracle rows then
# prove build == twin at the requested rho.
#
# Usage: tools/rho_twin_check.sh [rho] [sfDir]   (defaults: 50, sf0.001)
set -euo pipefail
cd "$(dirname "$0")/.."
RHO="${1:-50}"
SF="${2:-/root/testdata/sf0.001}"
OUT="/tmp/rho_twin_check_${RHO}"
QUERIES="sim_knn_graph_refined,sim_knn_recall_refined,sim_knn_components,sim_pagerank,sim_cluster_exemplars"
SPARK_GRAFT_DESCENT_RHO="$RHO" sbt -batch \
  "runMain graft.Verify $SF $OUT $QUERIES" >/dev/null
python3 tools/check.py "$SF" "$OUT"
