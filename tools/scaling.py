#!/usr/bin/env python3
"""Scale-ladder analysis (VERDICT r3 "Next round #1").

Reads graft.Bench JSON lines measured at increasing scale factors and emits
per-query scaling exponents: slope of log(time) vs log(sf) between the two
LARGEST rungs (small rungs are fixed-cost-dominated, so the top interval is
the honest scaling signal). Exponent ~1 = linear, <1 = sublinear (fixed
costs still amortizing), >1 = super-linear (a scale hazard).

Usage: scaling.py OUT.json SF:BENCH.json SF:BENCH.json ... [--md]
"""
import json
import sys


def load(path):
    with open(path) as f:
        line = next(l for l in f if '"metric"' in l)
    return json.loads(line[line.index('{'):])


def main():
    out_path = sys.argv[1]
    rungs = []  # (sf, {query: sec})
    emit_md = "--md" in sys.argv
    for arg in sys.argv[2:]:
        if arg == "--md":
            continue
        sf, path = arg.split(":", 1)
        rungs.append((float(sf), load(path)["queries"]))
    rungs.sort()
    if len(rungs) < 2:
        sys.exit("need at least two rungs")
    import math
    (sf_lo, q_lo), (sf_hi, q_hi) = rungs[-2], rungs[-1]
    ratio = math.log(sf_hi / sf_lo)
    rows = []
    for name in sorted(q_hi):
        if name not in q_lo:
            continue
        t_lo, t_hi = q_lo[name], q_hi[name]
        exp = math.log(t_hi / t_lo) / ratio if t_lo > 0 else float("nan")
        rows.append({
            "query": name,
            "times": {str(sf): q[name] for sf, q in rungs if name in q},
            "exponent": round(exp, 3),
        })
    total = {str(sf): round(sum(q.values()), 2) for sf, q in rungs}
    worst = max(rows, key=lambda r: r["exponent"])
    superlinear = [r["query"] for r in rows if r["exponent"] > 1.1]
    result = {
        "interval": [sf_lo, sf_hi],
        "totals": total,
        "queries": rows,
        "worst": {"query": worst["query"], "exponent": worst["exponent"]},
        "superlinear_over_1.1": superlinear,
    }
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    if emit_md:
        print(f"| query | " + " | ".join(f"sf{sf}" for sf, _ in rungs) + " | exponent |")
        print("|---" * (len(rungs) + 2) + "|")
        for r in rows:
            ts = " | ".join(f"{r['times'].get(str(sf), float('nan')):.2f}"
                            for sf, _ in rungs)
            print(f"| {r['query']} | {ts} | {r['exponent']:.2f} |")
    print(f"\nrungs: {[sf for sf, _ in rungs]} totals: {total}", file=sys.stderr)
    print(f"worst exponent: {worst['query']} = {worst['exponent']}", file=sys.stderr)
    print(f"superlinear (>1.1): {superlinear or 'none'}", file=sys.stderr)


if __name__ == "__main__":
    main()
