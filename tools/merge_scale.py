#!/usr/bin/env python3
"""Merge a targeted BenchScale side file's kernels into BENCH_scale.json.

Usage: python3 tools/merge_scale.py /tmp/scale_side.json [kernel ...]

Copies the named kernels' `queries` and `rows` dicts (all kernels in the
side file if none named) into the committed artifact, preserving
everything else. The committed artifact's provenance note lives in
SURVEY §9.
"""
import json
import sys

side_path = sys.argv[1]
names = sys.argv[2:]
with open(side_path) as f:
    side = json.load(f)
with open("BENCH_scale.json") as f:
    main = json.load(f)
picked = names or list(side.get("queries", {}))
for n in picked:
    if n in side.get("queries", {}):
        main["queries"][n] = side["queries"][n]
        if n in side.get("rows", {}):
            main.setdefault("rows", {})[n] = side["rows"][n]
        print(f"merged {n}: {side['queries'][n]}")
    else:
        print(f"WARNING: {n} not in side file", file=sys.stderr)
with open("BENCH_scale.json", "w") as f:
    json.dump(main, f)
    f.write("\n")
