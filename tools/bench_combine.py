#!/usr/bin/env python3
"""Combine two Bench runs (sf0.1 and sf1-equivalent) into BENCH_sf1.json
with per-query slopes.

Usage: bench_combine.py <bench_sf01.json> <bench_sf1.json> <factor> <out.json>

slope = t_sf1 / (t_sf01 * factor); <= 1 means at-or-better-than-linear
scaling (sf0.1 timings are fixed-cost dominated, so healthy queries land
well under 1).

The output embeds each input's heap size and, for the worst-slope
queries, the hi-run's PER-TRAVERSAL samples — so a GC/cache-regime
contaminated record is self-diagnosing (r8 finding: a 48g run's later
traversals degraded 3-5x and the committed record carried no way to see
it). A healthy query's samples are flat; monotone-growing samples mean
the measurement regime, not the plan, produced the slope.
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
    hi_runs = hi.get("runs", {})
    out = {
        "factor": factor,
        "sf_lo": lo.get("sf"),
        "sf_hi": hi.get("sf"),
        "heap_gb_lo": lo.get("heap_gb"),
        "heap_gb_hi": hi.get("heap_gb"),
        "repeats_lo": lo.get("repeats"),
        "repeats_hi": hi.get("repeats"),
        "sentinel_sec_hi": hi.get("sentinel_sec"),
        # drift-normalization fields, ported from the per-run records so
        # the x10 campaign record adjudicates machine drift by itself the
        # same way the sf0.1 record does (r10 verdict ask): the hi run's
        # warm-sentinel median vs the pinned reference (Bench.Pins), and
        # the machine-normalized totals for both sides.
        "sentinel_ref_sec": hi.get("sentinel_ref_sec"),
        "sentinel_warm_median_lo": lo.get("sentinel_warm_median"),
        "sentinel_warm_median_hi": hi.get("sentinel_warm_median"),
        "sentinel_ratio_lo": lo.get("sentinel_ratio"),
        "sentinel_ratio_hi": hi.get("sentinel_ratio"),
        "total_norm_lo_sec": lo.get("total_norm_sec"),
        "total_norm_hi_sec": hi.get("total_norm_sec"),
        "traversal_totals_hi": hi.get("traversal_totals"),
        "total_lo_sec": lo["total"],
        "total_hi_sec": hi["total"],
        "n_queries": len(shared),
        "worst_slopes": [
            {"query": q, "slope": s, "t_hi_samples": hi_runs.get(q)}
            for q, s in worst
        ],
        "queries": {
            q: {"t_lo": qlo[q], "t_hi": qhi[q], "slope": slopes.get(q)}
            for q in shared
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"wrote {out_path}: {len(shared)} queries, "
          f"total {lo['total']:.0f}s -> {hi['total']:.0f}s "
          f"(heap {lo.get('heap_gb')}g -> {hi.get('heap_gb')}g)")
    for q, s in worst:
        print(f"  worst slope {s:6.2f}  {q}  samples={hi_runs.get(q)}")


if __name__ == "__main__":
    main()
