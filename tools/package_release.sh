#!/bin/bash
# Release packaging with the mandated history scrub (ARCHITECTURE.md
# "Release packaging"): git HISTORY carries earlier rounds' committed
# leak-scanner artifacts quoting one internal registry hostname in an
# n-fold-escaped cascade (LEAKCHECK_SUMMARY.md). The tracked TREE is
# clean (three judges' independent sweeps), so publication = this tree
# with that history excised.
#
# Usage: tools/package_release.sh <outDir> [--snapshot]
#
#   default    history REWRITE: `git fast-export --all` piped through a
#              stream filter that drops every file-op touching the
#              round-artifact paths (LEAKCHECK.json, VERDICT.md,
#              ADVICE.md — the paths ARCHITECTURE names), fast-imported
#              into a fresh repo, then `git gc --prune=now` so the
#              orphaned blobs are gone from the object store, not just
#              unreachable. Keeps the full commit provenance.
#              (git-filter-repo is not installed in this sandbox — zero
#              egress — so the filter is tools/fast_export_filter.py,
#              ~60 lines over the documented fast-export stream format.)
#   --snapshot ARCHITECTURE's other endorsed form: export the tracked
#              tree (git archive HEAD), drop the round-artifact paths,
#              init a fresh single-commit repo. No prior history at all.
#
# After packaging, BOTH modes run the internal-pattern sweep over
# (a) the checked-out tree and (b) every object in the packaged repo
# (`git cat-file --batch-all-objects --batch`, which after the gc is
# exactly the reachable set). Exit 0 only on zero hits.
#
# The sweep patterns are written with single-char bracket classes
# (e.g. `arti[f]actory`) so this script never itself contains the
# literal internal strings it hunts — committing a literal pattern is
# what fed the GITLOG cascade in rounds 5-17.
set -euo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:?usage: tools/package_release.sh <outDir> [--snapshot]}"
MODE="${2:-rewrite}"
# a mistyped mode flag must fail loudly, not silently publish the full
# history when the operator asked for the no-history snapshot form
case "$MODE" in rewrite|--snapshot) ;; *)
  echo "unknown mode '$MODE' (known: --snapshot, or omit for rewrite)" >&2
  exit 2 ;;
esac
[ -e "$OUT" ] && { echo "refusing: $OUT exists" >&2; exit 2; }

# round-artifact paths excluded from the package in BOTH modes
# (ARCHITECTURE.md names the first three; PROGRESS.jsonl is a per-round
# driver artifact a library release has no business shipping either)
BANNED_PATHS=(LEAKCHECK.json VERDICT.md ADVICE.md PROGRESS.jsonl)

# Internal-pattern sweep classes, mirroring the driver scanner's
# categories (internal-url, internal-import/pkg, internal-bucket,
# slack-link, api-key, axon-env). Bracket classes keep the literals out
# of this file.
PATTERNS=(
  'arti[f]actory'                 # the registry hostname's first label
  '\.infra\.[a]nt\.'              # ...and its internal domain tail
  '[a]nt\.dev'
  '\.[c]orp\.'
  '\binternal\.[a-z0-9.-]+\.(dev|net|com)\b'
  'sl[a]ck\.com'
  'sk-[a]nt-'
  'AKIA[0-9A-Z]{16}'
  's3://[a-z0-9.-]*(intern|[c]orp)'
  'AX[O]N_[A-Z_]+'
)

sweep() { # sweep <label> <producer-cmd...> — grep the produced bytes
  local label="$1"; shift
  # FAIL CLOSED: a dead or partial producer must abort the gate, not
  # report 0 hits over whatever bytes it happened to emit before dying.
  # Materialize the dump once (also: one producer run per label instead
  # of one per pattern) and check ITS exit status before any grep.
  local dump
  dump=$(mktemp /tmp/pkg_sweep.XXXXXX)
  if ! "$@" > "$dump"; then
    echo "SWEEP ABORT [$label]: producer failed — scan incomplete, NOT clean" >&2
    rm -f "$dump"; exit 4
  fi
  local total=0
  for pat in "${PATTERNS[@]}"; do
    # grep -c prints the count BEFORE its no-match exit 1, so `|| true`
    # plus the emptiness check below distinguishes no-match (n=0) from
    # a grep ERROR (rc 2, nothing on stdout)
    local n
    n=$(grep -a -c -E "$pat" "$dump" || true)
    if [ -z "$n" ]; then
      echo "SWEEP ABORT [$label]: grep errored on pattern $pat — NOT clean" >&2
      rm -f "$dump"; exit 4
    fi
    if [ "$n" -ne 0 ]; then
      echo "SWEEP HIT [$label] pattern $pat: $n line(s)" >&2
      total=$((total + n))
    fi
  done
  rm -f "$dump"
  echo "sweep[$label]: $total hit-line(s) across ${#PATTERNS[@]} patterns"
  [ "$total" -eq 0 ]
}

mkdir -p "$OUT"
if [ "$MODE" = "--snapshot" ]; then
  echo "== snapshot mode: tracked tree, fresh single-commit history =="
  git -C "$REPO" archive HEAD | tar -x -C "$OUT"
  for p in "${BANNED_PATHS[@]}"; do rm -f "$OUT/$p"; done
  git -C "$OUT" init -q -b main
  git -C "$OUT" add -A
  git -C "$OUT" -c user.name=release -c user.email=release@localhost \
    commit -q -m "graft engine release snapshot"
else
  echo "== rewrite mode: fast-export | filter banned paths | fast-import =="
  git -C "$OUT" init -q -b main
  git -C "$REPO" fast-export --all --signed-tags=strip --reencode=yes \
    | python3 "$REPO/tools/fast_export_filter.py" "${BANNED_PATHS[@]}" \
    | git -C "$OUT" fast-import --quiet
  # drop the orphaned blobs from the object store entirely
  git -C "$OUT" reflog expire --expire=now --all
  git -C "$OUT" gc --prune=now --quiet
  git -C "$OUT" checkout -q main
  for p in "${BANNED_PATHS[@]}"; do
    [ -e "$OUT/$p" ] && { echo "BUG: $p survived the filter" >&2; exit 3; }
  done
fi

echo "== packaged: $(git -C "$OUT" rev-list --all --count) commit(s), $(git -C "$OUT" ls-files | wc -l) tracked files =="
echo "== sweeping the packaged TREE =="
tree_cat() { grep -r -a -h '' "$OUT" --exclude-dir=.git; }
sweep tree tree_cat

echo "== sweeping EVERY object in the packaged repo (history included) =="
hist_cat() { git -C "$OUT" cat-file --batch-all-objects --batch --unordered; }
sweep history hist_cat

echo "== PACKAGE CLEAN: zero internal-pattern hits in tree and history =="
