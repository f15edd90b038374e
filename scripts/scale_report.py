#!/usr/bin/env python3
"""Turn three ScaleBench JSONs (sf0.1 / sf0.3-equivalent / sf1-equivalent)
into the SCALE.md scaling table: per query, median seconds at each scale
and the fitted exponent of t ~ sf^e (least-squares slope in log-log over
the three points; 1.0 = perfectly linear in data volume, < 1 = fixed
overheads still dominate, > 1 = superlinear — investigate)."""
import json
import math
import sys

def load(p):
    with open(p) as f:
        return json.load(f)

def main(p01, p03, p1):
    a, b, c = load(p01), load(p03), load(p1)
    xs = [math.log(0.1), math.log(0.3), math.log(1.0)]
    rows = []
    for q in a["queries"]:
        if q not in b["queries"] or q not in c["queries"]:
            continue
        ts = [a["queries"][q]["median"], b["queries"][q]["median"],
              c["queries"][q]["median"]]
        # %.3f-rounded sub-millisecond medians would be log(0)
        ys = [math.log(max(t, 0.001)) for t in ts]
        n = 3
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        rows.append((q, ts[0], ts[1], ts[2], slope))
    rows.sort(key=lambda r: -r[4])
    print("| query | t@sf0.1 | t@sf0.3 | t@sf1 | exponent |")
    print("| --- | --- | --- | --- | --- |")
    for q, t0, t3, t1, e in rows:
        print(f"| {q} | {t0:.2f} s | {t3:.2f} s | {t1:.2f} s | {e:.2f} |")
    sup = [r for r in rows if r[4] > 1.15]
    print()
    tot = [sum(load(p)["queries"][q]["median"] for q, *_ in rows)
           for p in (p01, p03, p1)]
    print(f"totals: sf0.1 {tot[0]:.1f} s, sf0.3 {tot[1]:.1f} s, "
          f"sf1 {tot[2]:.1f} s "
          f"(overall exponent {(math.log(tot[2]) - math.log(tot[0])) / math.log(10):.2f})")
    if sup:
        print(f"superlinear (> 1.15): {', '.join(r[0] for r in sup)}")
    else:
        print("superlinear (> 1.15): none")

if __name__ == "__main__":
    args = sys.argv[1:4]
    if args and len(args) != 3:
        sys.exit("usage: scale_report.py [sf01.json sf03.json sf1.json]")
    main(*(args or
           ["/tmp/sb_sf01.json", "/tmp/sb_sf03.json", "/tmp/sb_sf1.json"]))
