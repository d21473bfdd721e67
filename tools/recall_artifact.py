#!/usr/bin/env python3
"""Consolidate RecallGate JSONL rows into the round's RECALL_rN.json.

Usage: python3 tools/recall_artifact.py RECALL_r13.json in1.jsonl [in2.jsonl ...]

Keeps every row (sweep points included); the shipped configuration is
whichever row carries config == "default" for each (graph, sf). Rows are
sorted by (graph, sf, config) for stable diffs.
"""
import json, sys

def main():
    out, ins = sys.argv[1], sys.argv[2:]
    rows = []
    for f in ins:
        for line in open(f):
            line = line.strip()
            if line:
                rows.append(json.loads(line))
    rows.sort(key=lambda r: (r["graph"], r["sf"], r["config"]))
    with open(out, "w") as fh:
        json.dump({"rows": rows}, fh, indent=1)
    print(f"{out}: {len(rows)} rows")

if __name__ == "__main__":
    main()
