#!/usr/bin/env python3
"""Mechanical round-over-round bench triage: compare two BENCH_FULL.json
files by their ISOLATED rep medians (the machine-checkable record; the
in-suite single timings carry suite-position and machine-load noise).

A query is flagged as a REGRESSION only when its new median exceeds the
old rep window by the tolerance — i.e. new_median > old_max * (1+tol) —
which is exactly the judgment the r9/r10 verdicts performed by hand.
Improvements (new_median < old_min / (1+tol)) are listed too.

Usage: rep_diff.py OLD_BENCH_FULL.json NEW_BENCH_FULL.json [tol=0.15]
Exit status: 0 = no regressions, 1 = at least one.
"""
import json
import sys


def main(old_p, new_p, tol=0.15):
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    o, n = old.get("reps", {}), new.get("reps", {})
    reg, imp = [], []
    for q in sorted(n):
        if q not in o:
            continue
        om, on = o[q], n[q]
        if on["median"] > om["max"] * (1 + tol):
            reg.append((q, om, on))
        elif on["median"] < om["min"] / (1 + tol):
            imp.append((q, om, on))
    missing_old = sorted(set(n) - set(o))
    missing_new = sorted(set(o) - set(n))
    print(f"compared {len(set(o) & set(n))} queries "
          f"(old total {old.get('value')}s/{old.get('n_queries')}q, "
          f"new total {new.get('value')}s/{new.get('n_queries')}q, tol {tol:.0%})")
    for tag, rows in (("REGRESSION", reg), ("improved", imp)):
        for q, om, on in rows:
            print(f"  {tag:10s} {q:32s} "
                  f"old med {om['median']:.3f} [{om['min']:.3f}-{om['max']:.3f}]"
                  f" -> new med {on['median']:.3f} "
                  f"[{on['min']:.3f}-{on['max']:.3f}]")
    if missing_old:
        print(f"  new-only (no old reps): {', '.join(missing_old)}")
    if missing_new:
        print(f"  gone (no new reps): {', '.join(missing_new)}")
    if not reg:
        print("  no regressions outside rep spread")
    return 1 if reg else 0


if __name__ == "__main__":
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    sys.exit(main(sys.argv[1], sys.argv[2], tol))
