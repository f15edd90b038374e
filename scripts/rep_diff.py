#!/usr/bin/env python3
"""Mechanical round-over-round bench triage: compare two BENCH_FULL.json
files by their ISOLATED rep medians (the machine-checkable record; the
in-suite single timings carry suite-position and machine-load noise).

Flag classes (r12 verdict ask #4, tuned on the r13 anchor A/B evidence —
q174's +41% shift escaped the old single rule by 9 ms; the sub-0.5 s
WALL tail churned between same-code runs; POINT task-CPU on spill-heavy
queries swung 1.5-2.6x between same-code runs, and sub-250 ms CPU reads
jitter +/-50%):

  REGRESSION  wall rule: new median > old rep-window max * (1+tol).
              Applies to queries >= 0.5 s — below that, wall at sf0.1 is
              noise-dominated, so...
  CPU-REG     ...the sub-0.5 s tail is gated on per-query TASK CPU.
              Bench.scala records a per-rep CPU WINDOW since r13
              (cpu_s/cpu_min/cpu_max = median/min/max over the 3
              isolated reps): new cpu median > old cpu max * (1+tol),
              floored at 250 ms. Files carrying only a point cpu_s
              (early r13) compare point-to-point with a doubled
              tolerance. Also applied to >= 0.5 s queries whose wall
              stayed quiet (the q177 idle-cores lesson).
  SHIFT       rep windows DON'T OVERLAP (old max < new min, or the
              reverse) and the median moved >= 5% — a distribution
              shift, not noise, regardless of the tolerance. Wall-only
              SHIFTs need a >= 0.5 s query; tail shifts need the cpu
              windows to be disjoint in the same direction.

Usage: rep_diff.py OLD_BENCH_FULL.json NEW_BENCH_FULL.json [tol=0.15]
Exit status: 0 = clean, 1 = at least one REGRESSION/CPU-REG/SHIFT.
"""
import json
import sys

CPU_FLOOR = 0.25   # s — below this, task CPU is scheduler jitter
SHIFT_MIN = 0.05   # 5% median move required for a SHIFT
TAIL_WALL = 0.5    # s — queries under this are wall-noise-dominated


def disjoint(a, b):
    """Windows don't overlap; returns +1 (b higher), -1 (b lower), 0."""
    if a["max"] < b["min"]:
        return 1
    if b["max"] < a["min"]:
        return -1
    return 0


def cpu_window(rep):
    if "cpu_s" not in rep:
        return None
    return {"median": rep["cpu_s"],
            "min": rep.get("cpu_min", rep["cpu_s"]),
            "max": rep.get("cpu_max", rep["cpu_s"]),
            "point": "cpu_min" not in rep}


def main(old_p, new_p, tol=0.15):
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    o, n = old.get("reps", {}), new.get("reps", {})
    reg, imp, shifts = [], [], []
    for q in sorted(n):
        if q not in o:
            continue
        om, on = o[q], n[q]
        oc, nc = cpu_window(om), cpu_window(on)
        have_cpu = oc is not None and nc is not None
        tail = max(om["median"], on["median"]) < TAIL_WALL
        wall_reg = on["median"] > om["max"] * (1 + tol)
        cpu_reg = False
        if have_cpu and nc["median"] > CPU_FLOOR:
            # point-only data (no window) gets a doubled tolerance — the
            # r13 A/B showed point CPU swings that windows absorb
            eff_tol = 2 * tol if (oc["point"] or nc["point"]) else tol
            cpu_reg = nc["median"] > oc["max"] * (1 + eff_tol)
        if tail and have_cpu:
            # cpu-gated tail: wall churn is invisible, cpu growth is not
            if cpu_reg:
                reg.append(("CPU-REG", q, om, on, oc, nc))
                continue
        elif wall_reg:
            reg.append(("REGRESSION", q, om, on, oc, nc))
            continue
        elif cpu_reg:
            # big query, wall hidden by idle cores but cpu grew — the
            # q177 lesson as a standing rule
            reg.append(("CPU-REG", q, om, on, oc, nc))
            continue
        if on["median"] < om["min"] / (1 + tol):
            imp.append(("improved", q, om, on, oc, nc))
            continue
        d = disjoint(om, on)
        if d and abs(on["median"] - om["median"]) \
                >= SHIFT_MIN * max(om["median"], 1e-9):
            cpu_confirms = have_cpu and disjoint(oc, nc) == d \
                and not (oc["point"] or nc["point"])
            if (not tail) or cpu_confirms:
                direction = "up" if d > 0 else "down"
                why = "cpu-confirmed" if cpu_confirms else ">=0.5s"
                shifts.append((f"SHIFT({direction},{why})", q, om, on, oc, nc))
    missing_old = sorted(set(n) - set(o))
    missing_new = sorted(set(o) - set(n))
    print(f"compared {len(set(o) & set(n))} queries "
          f"(old total {old.get('value')}s/{old.get('n_queries')}q, "
          f"new total {new.get('value')}s/{new.get('n_queries')}q, tol {tol:.0%})")
    for tag, q, om, on, oc, nc in reg + shifts + imp:
        cpu = ""
        if oc is not None and nc is not None:
            cpu = f"  cpu {oc['median']:.3f}->{nc['median']:.3f}"
        print(f"  {tag:22s} {q:32s} "
              f"old med {om['median']:.3f} [{om['min']:.3f}-{om['max']:.3f}]"
              f" -> new med {on['median']:.3f} "
              f"[{on['min']:.3f}-{on['max']:.3f}]{cpu}")
    if missing_old:
        print(f"  new-only (no old reps): {', '.join(missing_old)}")
    if missing_new:
        print(f"  gone (no new reps): {', '.join(missing_new)}")
    if not reg and not shifts:
        print("  no regressions or distribution shifts outside rep spread")
    return 1 if (reg or shifts) else 0


if __name__ == "__main__":
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    sys.exit(main(sys.argv[1], sys.argv[2], tol))
