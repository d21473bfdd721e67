#!/usr/bin/env python3
"""Consolidate RecallGate JSONL rows into the round's RECALL_rN.json.

Usage: python3 tools/recall_artifact.py RECALL_r13.json in1.jsonl [in2.jsonl ...]

Keeps every distinct measurement (sweep points included); the shipped
configuration is whichever row carries config == "default" for each
(graph, sf). Rows are sorted by (graph, sf, config) for stable diffs.

RecallGate appends (CREATE+APPEND), so a rerun against an existing JSONL
duplicates rows byte-for-byte; exact duplicates are dropped here (with a
stderr note) so reruns cannot inflate the artifact of record. Rows that
share (graph, config, sf) but DISAGREE on the measurement are kept — two
honest re-measures are evidence, not noise — and flagged on stderr.
"""
import json, sys


def main():
    out, ins = sys.argv[1], sys.argv[2:]
    rows, seen_exact, keyed = [], set(), {}
    n_dupes = 0
    # compare the full measurement, not just recall (r14 advice: rows
    # agreeing on recall but disagreeing on hits/true_edges/n_vectors went
    # unflagged, and each new row was only checked against the FIRST seen)
    MEASURE = ("recall", "hits", "true_edges", "n_vectors", "n_queries", "error")
    for f in ins:
        for line in open(f):
            line = line.strip()
            if not line:
                continue
            if line in seen_exact:
                n_dupes += 1
                continue
            seen_exact.add(line)
            r = json.loads(line)
            key = (r["graph"], r["config"], r["sf"])
            meas = tuple(r.get(k) for k in MEASURE)
            prior = keyed.setdefault(key, [])
            # note only a NEW disagreeing measurement: a row repeating an
            # already-seen measurement must not re-print stale notes
            if meas not in prior:
                for p in prior:
                    print(f"NOTE: {key} re-measured: "
                          f"{dict(zip(MEASURE, p))} vs {dict(zip(MEASURE, meas))} "
                          "(both kept)", file=sys.stderr)
                prior.append(meas)
            rows.append(r)
    if n_dupes:
        print(f"NOTE: dropped {n_dupes} byte-identical duplicate rows "
              "(rerun against an existing JSONL)", file=sys.stderr)
    rows.sort(key=lambda r: (r["graph"], r["sf"], r["config"]))
    with open(out, "w") as fh:
        json.dump({"rows": rows}, fh, indent=1)
    print(f"{out}: {len(rows)} rows")


if __name__ == "__main__":
    main()
