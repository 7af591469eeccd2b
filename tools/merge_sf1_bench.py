#!/usr/bin/env python3
"""Merge two full-board Bench runs (sf0.1 + sf1) into BENCH_sf1.json.

Usage: python3 tools/merge_sf1_bench.py <sf01.json> <sf1.json>

Each input is either a bench_board.json-style file (whole-file JSON
with a "queries" map) or a capture of Bench stdout (r16: the per-query
detail prints as CHUNKED {"metric":"per_query","part":i,...} lines —
all parts are concatenated). The output keeps the artifact's shape:
per-query {sf0.1, sf1, ratio} plus the offender list under the sweep's
allowance (10x the sf0.1 time + 2s).
"""
import json
import sys

ALLOW_FACTOR, ALLOW_SLACK = 10.0, 2.0


def load_queries(path):
    txt = open(path).read()
    try:
        return json.loads(txt)["queries"]
    except (json.JSONDecodeError, KeyError):
        qs = {}
        for line in txt.splitlines():
            line = line.strip()
            if line.startswith("{") and '"per_query"' in line:
                qs.update(json.loads(line)["queries"])
        if not qs:
            raise SystemExit(f"{path}: neither a board file nor per_query lines")
        return qs


def main():
    sf01 = load_queries(sys.argv[1])
    sf1 = load_queries(sys.argv[2])
    assert set(sf01) == set(sf1), "query sets differ between the two runs"
    queries, offenders = {}, []
    for q in sorted(sf01):
        a, b = sf01[q], sf1[q]
        if a < 0 or b < 0:
            queries[q] = {"sf0.1": a, "sf1": b, "ratio": None, "failed": True}
            offenders.append(q)
            continue
        queries[q] = {"sf0.1": round(a, 2), "sf1": round(b, 2),
                      "ratio": round(b / max(a, 0.01), 1)}
        if b > a * ALLOW_FACTOR + ALLOW_SLACK:
            offenders.append(q)
    out = {
        "metric": "sf1_scale_sweep",
        "unit": "sec",
        "note": (f"full {len(queries)}-query board; sf1 = 10x sf0.1 local fixture "
                 "(tools/make_sf1.py: documents/embeddings perturbed copies, "
                 "events time-shifted, TPC-H facts key-shifted, dims "
                 "verbatim); min of 2 passes at local[32]; allowance "
                 f"{ALLOW_FACTOR:g}x sf0.1 + {ALLOW_SLACK:g}s"),
        "sf01_total": round(sum(v for v in sf01.values() if v >= 0), 2),
        "sf1_total": round(sum(v for v in sf1.values() if v >= 0), 2),
        "queries": queries,
        "offenders_over_10x_plus_2s": offenders,
    }
    with open("BENCH_sf1.json", "w") as f:
        json.dump(out, f, indent=1)
    print(f"sf0.1 {out['sf01_total']}s -> sf1 {out['sf1_total']}s; "
          f"{len(offenders)} offender(s): {offenders}")


if __name__ == "__main__":
    main()
