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

--movers mode (r15 verdict ask #7 — replace the anchor-narrative prose):
  rep_diff.py --movers OLD NEW [move=0.05]
lists EVERY query whose rep median moved >= `move` (both directions) and
classifies each mechanically: IN-WINDOW (the new median falls inside the
old rep window, or the windows overlap — same-code machine noise, the
"scattered movers" an anchor narrative used to adjudicate in prose) vs
OUT-OF-WINDOW (disjoint windows — a distribution shift worth
investigating). Ends with the one-line census the narrative needs:
"N movers: K in-window (noise), M out-of-window (investigate)".
Exit status: 0 = no out-of-window mover, 1 otherwise.
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


def movers(old_p, new_p, move=0.05):
    """Census of EVERY median mover >= `move`, each classified
    mechanically — the replacement for the anchor narratives' prose.

    Two-level rule, matching what the narratives actually adjudicated:
    the box drifts tens of percent BETWEEN same-code runs (whole-run
    shifts that move most queries the same way), so raw rep windows
    from 3 isolated reps flag the drift itself. The census therefore
    (1) estimates the run-pair's drift factor g = the MEDIAN of
    per-query median ratios (robust to the movers themselves), and
    (2) classifies each mover against the old rep window SCALED by g
    and widened by the module's REGRESSION tolerance (±15% — the same
    constant main() treats as measurement tolerance; a 3-rep window
    underestimates between-run variance, which is the whole reason the
    REGRESSION rule carries a tolerance): inside = noise; beyond it =
    OUT-OF-WINDOW, a per-query distribution shift worth investigating.
    Raw-window disjointness is also printed so nothing is hidden."""
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    o, n = old.get("reps", {}), new.get("reps", {})
    shared = sorted(set(o) & set(n))
    ratios = sorted(n[q]["median"] / o[q]["median"]
                    for q in shared if o[q]["median"] > 0)
    g = ratios[len(ratios) // 2] if ratios else 1.0
    rows = []
    for q in shared:
        om, on = o[q], n[q]
        if om["median"] <= 0:
            continue
        rel = (on["median"] - om["median"]) / om["median"]
        if abs(rel) < move:
            continue
        raw = disjoint(om, on)
        scaled = {"min": om["min"] * g / 1.15,
                  "max": om["max"] * g * 1.15}
        adj = disjoint(scaled, on)
        cls = "OUT-OF-WINDOW" if adj else "in-window"
        rows.append((cls, q, om, on, rel, raw))
    print(f"movers >= {move:.0%} between {old_p} and {new_p} "
          f"({len(shared)} shared queries, totals "
          f"{old.get('value')}s -> {new.get('value')}s, "
          f"run drift factor g={g:.3f})")
    for cls, q, om, on, rel, raw in sorted(rows, key=lambda r: -abs(r[4])):
        rawtag = " raw-disjoint" if raw and cls == "in-window" else ""
        print(f"  {cls:14s} {q:32s} {om['median']:.3f} "
              f"[{om['min']:.3f}-{om['max']:.3f}] -> {on['median']:.3f} "
              f"[{on['min']:.3f}-{on['max']:.3f}]  {rel:+.0%}{rawtag}")
    out = sum(1 for r in rows if r[0] == "OUT-OF-WINDOW")
    print(f"{len(rows)} movers: {len(rows) - out} in-window after drift "
          f"adjustment (noise), {out} out-of-window (investigate)")
    return 1 if out else 0


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--movers":
        mv = float(sys.argv[4]) if len(sys.argv) > 4 else 0.05
        sys.exit(movers(sys.argv[2], sys.argv[3], mv))
    tol = float(sys.argv[3]) if len(sys.argv) > 3 else 0.15
    sys.exit(main(sys.argv[1], sys.argv[2], tol))
