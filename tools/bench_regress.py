#!/usr/bin/env python3
"""Per-round bench regression gate (VERDICT r5 item 2).

Correctness is oracle-gated every round; the remaining silent failure
mode is perf drift, which round 5 only the judge caught (d5 3x). This
tool keeps a committed per-round, per-cell history and flags any cell
that got meaningfully slower than its previous round.

Usage:
  bench_regress.py record <round> [bench_json]   # default results/bench_local.json
  bench_regress.py check  [round]                # default: latest recorded round

`record` parses the bench metrics line (queries + skew_queries seconds,
sort_sweep_us microseconds) and MIN-MERGES into that round's rows in
results/bench_history.csv (round,cell,unit,value): a cell already
recorded for the round keeps the smaller value. Same-round re-records
happen when later runs add queries, and the host's throughput windows
mean a re-record can land 15-50% slow across the board — replacing
good baselines with window-inflated ones would let a real next-round
regression hide inside the slack (min-of-runs is also the sweep's
documented estimator). Pass --replace to overwrite instead (e.g. after
a deliberate fixture change that makes cells slower for real).
`check` compares each
cell of <round> against the most recent earlier round that has the cell,
and flags ratio > 1.5 with an absolute-floor guard (0.15 s / 500 us) so
scheduler jitter on near-zero cells can't trip the gate. Exit code 1 on
any flagged regression, 0 otherwise.

A flag is a PROMPT TO PROBE (graft.bench.QProbe <cell>), not proof of a
regression: this host's minute-scale throughput windows swing ~1.5x, so
cells near 1 s occasionally trip the ratio on no code change. A real
regression reproduces in the probe's warm iterations; window noise
does not.
"""
import csv, json, os, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HIST = os.path.join(ROOT, "results", "bench_history.csv")
RATIO = 1.5
FLOOR = {"sec": 0.15, "us": 500.0}


def load_hist():
    rows = []
    if os.path.exists(HIST):
        with open(HIST) as f:
            for r in csv.DictReader(f):
                rows.append({"round": int(r["round"]), "cell": r["cell"],
                             "unit": r["unit"], "value": float(r["value"])})
    return rows


def save_hist(rows):
    os.makedirs(os.path.dirname(HIST), exist_ok=True)
    with open(HIST, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["round", "cell", "unit", "value"])
        for r in sorted(rows, key=lambda r: (r["round"], r["unit"], r["cell"])):
            w.writerow([r["round"], r["cell"], r["unit"], "%.4f" % r["value"]])


def parse_bench(path):
    """Extract per-cell rows from a bench metrics JSON line (or a driver
    BENCH_r*.json whose `parsed` field holds the same object).

    Bench emits TWO lines since round 9 (detail + per-family summary);
    pick the line with the most query cells — taking the LAST line
    silently recorded the 8 summary aggregates as the round's cells and,
    because `record` replaces the round's rows, destroyed its detailed
    minima (round-9 session-2 incident; restored from git)."""
    with open(path) as f:
        text = f.read()
    try:
        # driver BENCH_r*.json is pretty-printed multi-line JSON — parse
        # the whole file first; per-line parsing would JSONDecodeError on
        # its interior lines (and on any blank line in a bench dump)
        candidates = [json.loads(text)]
    except json.JSONDecodeError:
        candidates = []
        for l in text.splitlines():
            l = l.strip()
            if not l:
                continue
            try:
                candidates.append(json.loads(l))
            except json.JSONDecodeError:
                continue
    if not candidates:
        sys.exit(f"no parseable JSON in {path}")
    d = max(candidates, key=lambda c: len(c.get("queries", {})) if isinstance(c, dict) else -1)
    if not isinstance(d, dict):
        sys.exit(f"no JSON object found in {path}")
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    cells = []
    for k, v in d.get("queries", {}).items():
        if v >= 0:
            cells.append((k, "sec", v))
    for k, v in d.get("skew_queries", {}).items():
        if v >= 0:
            cells.append((k, "sec", v))
    for k, v in d.get("sort_sweep_us", {}).items():
        cells.append((k, "us", v))
    if not cells:
        sys.exit(f"no cells found in {path}")
    return cells


def record(rnd, path, replace=False):
    cells = parse_bench(path)
    rows = [r for r in load_hist() if r["round"] != rnd]
    prior = {} if replace else {
        r["cell"]: r["value"] for r in load_hist() if r["round"] == rnd}
    merged = 0
    new_rows = []
    for c, u, v in cells:
        if c in prior and prior[c] < v:
            v = prior[c]
            merged += 1
        new_rows.append({"round": rnd, "cell": c, "unit": u, "value": v})
    rows += new_rows
    save_hist(rows)
    kept = f", kept {merged} faster prior values" if merged else ""
    print(f"[bench_regress] recorded round {rnd}: {len(cells)} cells{kept} -> {HIST}")


def check(rnd):
    rows = load_hist()
    if not rows:
        sys.exit(f"no history at {HIST}; run `record` first")
    rounds = sorted({r["round"] for r in rows})
    if rnd is None:
        rnd = rounds[-1]
    cur = {r["cell"]: r for r in rows if r["round"] == rnd}
    if not cur:
        sys.exit(f"round {rnd} not in history (have {rounds})")
    # Disappeared cells are the MOST silent failure: a dropped/renamed
    # query or a vanished sweep family would otherwise pass with fewer
    # "cells compared" and exit 0.
    prev_rounds = [r for r in rounds if r < rnd]
    missing = []
    if prev_rounds:
        prev_cells = {r["cell"] for r in rows if r["round"] == prev_rounds[-1]}
        missing = sorted(prev_cells - set(cur))
        for cell in missing:
            print(f"MISSING    {cell}: present in round {prev_rounds[-1]}, absent in round {rnd}")
    flagged = []
    compared = 0
    for cell, r in sorted(cur.items()):
        prev = [p for p in rows if p["cell"] == cell and p["round"] < rnd]
        if not prev:
            continue
        p = max(prev, key=lambda p: p["round"])
        compared += 1
        worse = r["value"] - p["value"]
        if r["value"] > RATIO * p["value"] and worse > FLOOR[r["unit"]]:
            flagged.append((cell, p["round"], p["value"], r["value"], r["unit"]))
            print("REGRESSION %-40s r%d %.3f -> r%d %.3f %s (%.1fx)"
                  % (cell, p["round"], p["value"], rnd, r["value"], r["unit"],
                     r["value"] / p["value"]))
    print(f"== round {rnd}: {compared} cells compared, {len(flagged)} regressed, "
          f"{len(missing)} missing (gate: >{RATIO}x and >+{FLOOR['sec']}s/{FLOOR['us']:.0f}us) ==")
    sys.exit(1 if (flagged or missing) else 0)


if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] not in ("record", "check"):
        sys.exit(__doc__)
    if sys.argv[1] == "record":
        args = [a for a in sys.argv[2:] if a != "--replace"]
        rnd = int(args[0])
        path = args[1] if len(args) > 1 else os.path.join(ROOT, "results", "bench_local.json")
        record(rnd, path, replace="--replace" in sys.argv)
    else:
        check(int(sys.argv[2]) if len(sys.argv) > 2 else None)
