#!/usr/bin/env python3
"""Re-pin per-query bench budgets from TWO fresh full boards.

Usage: python3 tools/pin_budgets.py board1.json board2.json [out.json]

Budget per query = 1.5 x max(board1, board2) + 0.35 s additive floor —
the ratio absorbs proportional noise, the floor absorbs scheduling
jitter on sub-second queries. The boards must be full-registry min-of-2
runs written by graft.Bench (bench_board.json).

"_calibration" = min of the two boards' calibration_sec: the most
idle-machine estimate, pinned alongside the budgets measured on those
same runs. At gate time Bench re-measures the same fixed probe and
stretches every budget by the clamped ratio, so a loaded driver machine
(round 9: ~1.8x across all 167 queries) no longer fails the gate while
a query that regressed relative to its neighbors still does.
"""
import json
import sys

if len(sys.argv) < 3:
    sys.exit(__doc__)
b1, b2 = (json.load(open(p)) for p in sys.argv[1:3])
out_path = sys.argv[3] if len(sys.argv) > 3 else "bench_budgets.json"

for name, b in (("board1", b1), ("board2", b2)):
    if b.get("failed", 0):
        sys.exit(f"{name} records failed={b['failed']} - fix before pinning")

keys = sorted(set(b1["queries"]) | set(b2["queries"]))
doc = {}
cals = [b["calibration_sec"] for b in (b1, b2) if b.get("calibration_sec", 0) > 0]
if cals:
    doc["_calibration"] = round(min(cals), 3)
else:
    print("WARN: neither board carries calibration_sec - gate will run "
          "un-normalized (factor 1.0)", file=sys.stderr)
for q in keys:
    t1, t2 = b1["queries"].get(q, 0.0), b2["queries"].get(q, 0.0)
    if min(t1, t2) < 0:
        sys.exit(f"{q} has a failure marker in a board - fix before pinning")
    doc[q] = round(1.5 * max(t1, t2) + 0.35, 2)

with open(out_path, "w") as f:
    json.dump(doc, f, indent=1)
    f.write("\n")
print(f"pinned {len(keys)} budgets"
      + (f" + _calibration={doc['_calibration']}" if cals else "")
      + f" -> {out_path}")
