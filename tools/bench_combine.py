#!/usr/bin/env python3
"""Combine two Bench runs (sf0.1 and sf1-equivalent) into BENCH_sf1.json
with per-query slopes.

Usage: bench_combine.py <bench_sf01.json> <bench_sf1.json> <factor> <out.json>

slope = t_sf1 / (t_sf01 * factor); <= 1 means at-or-better-than-linear
scaling (sf0.1 timings are fixed-cost dominated, so healthy queries land
well under 1).
"""
import json
import sys


def main() -> None:
    lo_path, hi_path, factor, out_path = (
        sys.argv[1], sys.argv[2], float(sys.argv[3]), sys.argv[4])
    lo = json.load(open(lo_path))
    hi = json.load(open(hi_path))
    qlo, qhi = lo["queries"], hi["queries"]
    shared = sorted(set(qlo) & set(qhi))
    slopes = {
        q: round(qhi[q] / (qlo[q] * factor), 4)
        for q in shared if qlo[q] > 0
    }
    worst = sorted(slopes.items(), key=lambda kv: -kv[1])[:10]
    out = {
        "factor": factor,
        "sf_lo": lo.get("sf"),
        "sf_hi": hi.get("sf"),
        "total_lo_sec": lo["total"],
        "total_hi_sec": hi["total"],
        "n_queries": len(shared),
        "worst_slopes": [{"query": q, "slope": s} for q, s in worst],
        "queries": {
            q: {"t_lo": qlo[q], "t_hi": qhi[q], "slope": slopes.get(q)}
            for q in shared
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"wrote {out_path}: {len(shared)} queries, "
          f"total {lo['total']:.0f}s -> {hi['total']:.0f}s")
    for q, s in worst:
        print(f"  worst slope {s:6.2f}  {q}")


if __name__ == "__main__":
    main()
