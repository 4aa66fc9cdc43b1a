#!/usr/bin/env python3
"""Sort-sweep vs BASELINE.md ratio gate.

Reads the 100k-row sort_sweep_us cells from a bench metrics JSON
(default results/bench_local.json) and prints each cell's ratio against
the reference's published numbers (BASELINE.md, digitized below). The
parquet-dictionary cell families are compared against the same
dictionary rows — the reference's input IS dictionary-encoded, so the
storage-born variant is the closer like-for-like. Exit 1 if any cell
exceeds the 2x gate.
"""
import json, os, sys

# BASELINE.md 100k-row rows (us/batch), source: /root/reference/img/*.png
BASELINE_US = {
    ("mixed-tuple", "dyn-comparator"): 2700.0,
    ("mixed-tuple", "rows-format"): 6000.0,
    ("utf8-tuple", "dyn-comparator"): 4700.0,
    ("utf8-tuple", "rows-format"): 7500.0,
    ("dictionary-tuple", "dyn-comparator"): 3600.0,
    ("dictionary-tuple", "rows-format"): 3100.0,
    ("mixed-dictionary-tuple", "dyn-comparator"): 3700.0,
    ("mixed-dictionary-tuple", "rows-format"): 3100.0,
    # parquet-round-trip variants measure the same workload; the
    # reference rows are the same dictionary numbers
    ("dictionary-tuple-parquet", "dyn-comparator"): 3600.0,
    ("dictionary-tuple-parquet", "rows-format"): 3100.0,
    ("mixed-dictionary-tuple-parquet", "dyn-comparator"): 3700.0,
    ("mixed-dictionary-tuple-parquet", "rows-format"): 3100.0,
}
GATE = 2.0

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(ROOT, "results", "bench_local.json")
    d = json.loads(open(path).read().strip().splitlines()[-1])
    # Gate on the MEAN (the reference's published statistic is a
    # 50-iteration mean, src/main.rs:57-70); older artifacts carried
    # only the min under sort_sweep_us, so fall back for comparability.
    sweep = d.get("sort_sweep_avg_us") or d.get("sort_sweep_us", {})
    mins = d.get("sort_sweep_us", {})
    stat = "mean" if d.get("sort_sweep_avg_us") else "min"
    bad = 0
    ratios = []
    for key, us in sorted(sweep.items()):
        case, strategy, size = key.rsplit("|", 2)
        if size != "100000" or (case, strategy) not in BASELINE_US:
            continue
        base = BASELINE_US[(case, strategy)]
        r = us / base
        ratios.append(r)
        flag = "FAIL" if r > GATE else "ok"
        if r > GATE:
            bad += 1
        mn = mins.get(key, us)
        print(f"{flag:4s} {case:33s} {strategy:15s} {stat} {us:8.1f} us"
              f"  (min {mn:8.1f})  baseline {base:6.0f}  ratio {r:.2f}x")
    if not ratios:
        sys.exit("no 100k sweep cells found")
    print(f"== {len(ratios)} cells, mean ratio {sum(ratios)/len(ratios):.2f}x, "
          f"worst {max(ratios):.2f}x, {bad} over the {GATE}x gate ==")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
