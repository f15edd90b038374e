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

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: ScaleGate <loDecade.json> <hiDecade.json> [factor=3.0]")
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
