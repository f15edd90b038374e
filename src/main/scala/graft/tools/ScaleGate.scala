package graft.tools

import com.fasterxml.jackson.databind.ObjectMapper

/** The scripted form of the r11 scale rule — "a CPU exponent ≳ 1.3 on
  * > 50 CPU-s absolutes is a defect until diagnosed" (SCALE.md, the
  * q177 lesson: a quadratic can sit invisible in WALL time for a whole
  * round while idle cores absorb it; executor CPU cannot hide it).
  * Prose rules rot; this one exits non-zero.
  *
  * `runMain graft.tools.ScaleGate <loDecade.json> <hiDecade.json>
  * [factor]` — both files are ScaleBench outputs (`{"queries":{name:
  * {"median":s,...,"cpu_ms":ms}}}`), `factor` the data-size ratio
  * between them (default 3.0, the ScaleGen ×10 vs ×30 decade).
  * For every query present in BOTH files it computes
  *
  *   expW   = ln(wallHi  / wallLo) / ln(factor)
  *   expCPU = ln(cpuHi   / cpuLo)  / ln(factor)
  *
  * and BREACHES on either of:
  *   - expCPU ≥ 1.3 with cpuHi ≥ 50 CPU-s   (the primary rule)
  *   - expW   ≥ 1.3 with wallHi ≥ 5 s       (a wall blow-up is a defect
  *     even when per-core accounting is noisy)
  *
  * unless the query carries a recorded disposition in [[allowlist]] —
  * each entry is a WRITTEN justification, the CatalogAudit convention,
  * so an allowlisted row is a documented trade, not a silenced alarm.
  * Exit status: 0 all green, 1 any undiagnosed breach, 2 usage/parse
  * error. A query missing `cpu_ms` (pre-r11 file) gates on wall only
  * and says so loudly.
  */
object ScaleGate {

  /** Queries whose super-linear growth is DIAGNOSED and accepted, with
    * the reason a reviewer needs. Growing this map requires the same
    * discipline as CatalogAudit's: a written disposition or a fix. */
  val allowlist: Map[String, String] = Map(
    "q181_margin_mining" -> ("quadratic BY SPECIFICATION: the exact " +
      "O(n^2) audit form that validates q200's LSH recall; " +
      "dispositioned r10, production path q200 is gated instead"),
    "q197_skewed_linkage" -> ("quadratic BY FIXTURE CONSTRUCTION: 90% " +
      "of rows share one block so pairs grow ~n^2 — the skew-survival " +
      "demo itself; ScaleGen preserves the concentration. SCALE.md r11 " +
      "taxonomy; real corpora re-block (q177 playbook) before salting"),
    "q107_salted_join" -> ("quadratic BY FIXTURE CONSTRUCTION: " +
      "synthetic 90%-hot join key persists across ScaleGen copies; " +
      "wall FALLS with scale (AQE + salt spread the work). SCALE.md r11")
  )

  final case class Obs(wall: Double, cpuMs: Option[Double])
  final case class Row(name: String, expW: Double, expCpu: Option[Double],
      wallHi: Double, cpuHiS: Option[Double], verdict: String) {
    def breach: Boolean = verdict.startsWith("BREACH")
  }

  /** Write-path dispositions (the `--write` mode's allowlist) — same
    * convention: a written justification or a fix, never a silenced
    * alarm. */
  val writeAllowlist: Map[String, String] = Map(
    "ingest/graft.ingest.write" -> ("includes the HARNESS's own cost: " +
      "WriteBench filters each of the 24 batches out of the persisted " +
      "full source, so this phase scans batches x full-source rows by " +
      "construction (linear per decade at fixed batch count, but its " +
      "absolute CPU is dominated by the bench fixture, not the table " +
      "write path; the per-phase split exists to keep it out of the " +
      "digest verdict)")
  )

  /** Parse a WriteBench JSON file into per-phase observations: keys are
    * `section/phase` (e.g. `digest/graft.digest.write`, cpu from task
    * executorCpuTime, wall from the phase's job wall) plus the
    * section-level wall rows (`digest`, `ingest`, `scan`, …) the r12
    * files carried. The decade factor comes from the files' own `rows`
    * fields — WriteBench records them (see [[mainWrite]]). */
  def parseWrite(path: String): (Map[String, Obs], Long) = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    require(root.has("rows"), s"$path: no rows field (not a WriteBench file)")
    val rows = root.get("rows").asLong
    val out = Map.newBuilder[String, Obs]
    // section-level walls + whole-section task CPU (r12 compatibility)
    for ((sec, wallK, cpuK) <- Seq(
        ("ingest", "ingest_s", "ingest_cpu_s"),
        ("digest", "digest_s", "digest_cpu_s"),
        ("reingest", "reingest_s", ""), ("redigest", "redigest_s", ""),
        ("scan", "scan_s", ""),
        ("optimize", "optimize_s", "optimize_cpu_s"),
        ("scan_zorder", "scan_zorder_s", "")) if root.has(wallK)) {
      val cpu = if (cpuK.nonEmpty && root.has(cpuK))
        Some(root.get(cpuK).asDouble * 1e3) else None
      out += sec -> Obs(root.get(wallK).asDouble, cpu)
    }
    val phases = root.get("phases")
    if (phases != null && phases.isObject) {
      val secs = phases.properties().iterator()
      while (secs.hasNext) {
        val se = secs.next()
        val ph = se.getValue.properties().iterator()
        while (ph.hasNext) {
          val pe = ph.next()
          val v = pe.getValue
          out += s"${se.getKey}/${pe.getKey}" -> Obs(
            v.get("wall_s").asDouble,
            Some(v.get("cpu_s").asDouble * 1e3))
        }
      }
    }
    (out.result(), rows)
  }

  /** Parse a ScaleBench JSON file's queries map. */
  def parse(path: String): Map[String, Obs] = {
    val mapper = new ObjectMapper()
    val root = mapper.readTree(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)))
    val qs = root.get("queries")
    require(qs != null && qs.isObject, s"$path: no queries object")
    val it = qs.properties().iterator()
    val out = Map.newBuilder[String, Obs]
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      require(v.has("median"), s"$path: ${e.getKey} has no median")
      val cpu = if (v.has("cpu_ms")) Some(v.get("cpu_ms").asDouble) else None
      out += e.getKey -> Obs(v.get("median").asDouble, cpu)
    }
    out.result()
  }

  /** The gate itself, pure so the spec can feed it synthetic curves. */
  def evaluate(lo: Map[String, Obs], hi: Map[String, Obs], factor: Double,
      allow: Map[String, String] = allowlist): Seq[Row] = {
    require(factor > 1.0, s"factor must be > 1, got $factor")
    val lf = math.log(factor)
    // floors keep a 0.01 s / 10 ms reading from fabricating an exponent
    def exp(a: Double, b: Double, floor: Double): Double =
      math.log(math.max(b, floor) / math.max(a, floor)) / lf
    lo.keySet.intersect(hi.keySet).toSeq.sorted.map { name =>
      val (l, h) = (lo(name), hi(name))
      val expW = exp(l.wall, h.wall, 0.05)
      val expCpu = for (cl <- l.cpuMs; ch <- h.cpuMs)
        yield exp(cl, ch, 50.0)
      val cpuHiS = h.cpuMs.map(_ / 1e3)
      val cpuBreach = expCpu.exists(_ >= 1.3) && cpuHiS.exists(_ >= 50.0)
      val wallBreach = expW >= 1.3 && h.wall >= 5.0
      val verdict =
        if (cpuBreach || wallBreach) allow.get(name) match {
          case Some(why) => s"allowlisted: $why"
          case None if cpuBreach && wallBreach => "BREACH (cpu+wall)"
          case None if cpuBreach => "BREACH (cpu)"
          case None => "BREACH (wall)"
        }
        else if (expCpu.isEmpty) "ok (wall only — NO cpu_ms in input)"
        else "ok"
      Row(name, expW, expCpu, h.wall, cpuHiS, verdict)
    }
  }

  def render(rows: Seq[Row]): String = {
    val header = f"${"query"}%-26s ${"expW"}%6s ${"expCPU"}%6s " +
      f"${"wall@hi"}%8s ${"cpu@hi"}%8s  verdict"
    val body = rows.map { r =>
      val ec = r.expCpu.map(v => f"$v%6.2f").getOrElse("     —")
      val ch = r.cpuHiS.map(v => f"$v%7.1fs").getOrElse("       —")
      f"${r.name}%-26s ${r.expW}%6.2f $ec ${r.wallHi}%7.2fs $ch  ${r.verdict}"
    }
    (header +: body).mkString("\n")
  }

  /** `--write` mode: gate two WriteBench decade files the way the query
    * mode gates ScaleBench files (r12 verdict ask #2 — "write-side
    * exponents live in prose again, the exact gap ScaleGate just
    * closed"). The factor is the files' own row-count ratio, so the gate
    * cannot be fed a wrong decade by hand. */
  def mainWrite(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: ScaleGate --write <loWriteBench.json> <hiWriteBench.json>")
      sys.exit(2)
    }
    val rows =
      try {
        val (lo, nLo) = parseWrite(args(0))
        val (hi, nHi) = parseWrite(args(1))
        require(nHi > nLo, s"hi rows $nHi must exceed lo rows $nLo")
        evaluate(lo, hi, nHi.toDouble / nLo, writeAllowlist)
      } catch { case e: Exception =>
        System.err.println(s"[scalegate] parse error: ${e.getMessage}")
        sys.exit(2); throw e
      }
    println(render(rows))
    val breaches = rows.filter(_.breach)
    if (breaches.nonEmpty) {
      System.err.println(s"[scalegate] ${breaches.size} UNDIAGNOSED " +
        s"super-linear write phase${if (breaches.size == 1) "" else "s"}: " +
        breaches.map(_.name).mkString(", ") +
        " — diagnose and fix, or record a disposition in " +
        "ScaleGate.writeAllowlist (SCALE.md r11 rule)")
      sys.exit(1)
    }
    println(s"[scalegate] ${rows.size} write phases green")
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--write")) { mainWrite(args.drop(1)); return }
    if (args.length < 2) {
      System.err.println(
        "usage: ScaleGate <loDecade.json> <hiDecade.json> [factor=3.0]" +
          "\n   or: ScaleGate --write <loWriteBench.json> <hiWriteBench.json>")
      sys.exit(2)
    }
    val factor = args.lift(2).map(_.toDouble).getOrElse(3.0)
    val rows =
      try evaluate(parse(args(0)), parse(args(1)), factor)
      catch { case e: Exception =>
        System.err.println(s"[scalegate] parse error: ${e.getMessage}")
        sys.exit(2); throw e
      }
    println(render(rows))
    val breaches = rows.filter(_.breach)
    if (breaches.nonEmpty) {
      System.err.println(s"[scalegate] ${breaches.size} UNDIAGNOSED " +
        s"super-linear quer${if (breaches.size == 1) "y" else "ies"}: " +
        breaches.map(_.name).mkString(", ") +
        " — diagnose and fix, or record a disposition in " +
        "ScaleGate.allowlist (SCALE.md r11 rule)")
      sys.exit(1)
    }
    println(s"[scalegate] ${rows.size} queries green at factor $factor")
  }
}
