package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.ScaleGate
import graft.tools.ScaleGate.Obs

/** The scale gate must be a GATE: a synthetic quadratic has to trip it,
  * a linear query must not, a recorded disposition must downgrade the
  * alarm to a documented trade, and the thresholds (50 CPU-s, 5 s wall)
  * must keep tiny absolutes from crying wolf. */
class ScaleGateSpec extends AnyFunSuite {

  private def row(rows: Seq[ScaleGate.Row], name: String) =
    rows.find(_.name == name).getOrElse(fail(s"$name missing from gate"))

  test("a synthetic quadratic trips the gate; a linear neighbor does not") {
    // 3x data: linear CPU grows 3x, quadratic 9x (exponent 2.0)
    val lo = Map(
      "q_linear" -> Obs(2.0, Some(30e3)),
      "q_quad" -> Obs(2.0, Some(30e3)))
    val hi = Map(
      "q_linear" -> Obs(6.0, Some(90e3)),
      "q_quad" -> Obs(6.5, Some(270e3))) // wall hides it; CPU cannot
    val rows = ScaleGate.evaluate(lo, hi, 3.0, allow = Map.empty)
    assert(row(rows, "q_quad").breach, "quadratic CPU must breach")
    assert(row(rows, "q_quad").verdict == "BREACH (cpu)")
    assert(!row(rows, "q_linear").breach)
    assert(math.abs(row(rows, "q_quad").expCpu.get - 2.0) < 0.01)
  }

  test("a wall blow-up breaches even when cpu_ms is linear or absent") {
    val lo = Map("q_wallbomb" -> Obs(3.0, None),
      "q_small" -> Obs(0.1, None))
    val hi = Map("q_wallbomb" -> Obs(27.0, None), // exponent 3 at 27 s
      "q_small" -> Obs(0.9, None)) // exponent 2 but under the 5 s floor
    val rows = ScaleGate.evaluate(lo, hi, 3.0, allow = Map.empty)
    assert(row(rows, "q_wallbomb").verdict == "BREACH (wall)")
    // tiny absolutes never page anyone
    assert(!row(rows, "q_small").breach)
    assert(row(rows, "q_small").verdict.contains("NO cpu_ms"))
  }

  test("the 50 CPU-s absolute floor keeps small-base exponents advisory") {
    // exponent 1.85 — the post-fix q177 shape — on a 29 CPU-s base
    val lo = Map("q_asymptote" -> Obs(0.6, Some(4e3)))
    val hi = Map("q_asymptote" -> Obs(1.6, Some(29e3)))
    val rows = ScaleGate.evaluate(lo, hi, 3.0, allow = Map.empty)
    assert(!row(rows, "q_asymptote").breach)
  }

  test("an allowlisted quadratic passes with its disposition visible") {
    val lo = Map("q_demo" -> Obs(10.0, Some(100e3)))
    val hi = Map("q_demo" -> Obs(52.0, Some(1160e3)))
    val bare = ScaleGate.evaluate(lo, hi, 3.0, allow = Map.empty)
    assert(row(bare, "q_demo").breach, "sanity: it IS super-linear")
    val allowed = ScaleGate.evaluate(lo, hi, 3.0,
      allow = Map("q_demo" -> "fixture-by-construction skew demo"))
    val r = row(allowed, "q_demo")
    assert(!r.breach)
    assert(r.verdict.contains("fixture-by-construction"))
  }

  test("the shipped allowlist holds the r11 decade files green and the " +
      "render carries every column") {
    // golden copies of the r11 sf1/sf3 readings for the three shapes the
    // gate must classify: allowlisted quadratic, linear, clean
    val lo = Map(
      "q197_skewed_linkage" -> Obs(11.6, Some(105e3)),
      "q174_pagerank" -> Obs(4.1, Some(80e3)),
      "q67_normalize" -> Obs(0.3, Some(600.0)))
    val hi = Map(
      "q197_skewed_linkage" -> Obs(51.8, Some(1162e3)),
      "q174_pagerank" -> Obs(10.3, Some(229e3)),
      "q67_normalize" -> Obs(0.4, Some(2.6e3)))
    val rows = ScaleGate.evaluate(lo, hi, 3.0)
    assert(rows.forall(!_.breach))
    assert(row(rows, "q197_skewed_linkage").verdict.startsWith("allowlisted"))
    val table = ScaleGate.render(rows)
    assert(table.contains("q174_pagerank") && table.contains("expCPU"))
  }

  test("the COMMITTED decade files pass the gate — the exponent rule " +
      "runs mechanically in every suite run, not just when remembered") {
    val pairs = Seq(
      ("scripts/bench_data/sb3_sf1_r11.json",
        "scripts/bench_data/sb3_sf3_r11.json", 3.0),
      ("scripts/bench_data/sb3_sf3_r11.json",
        "scripts/bench_data/sb4_sf10_r12.json", 10.0 / 3.0))
    for ((lo, hi, factor) <- pairs) {
      assume(java.nio.file.Files.exists(java.nio.file.Paths.get(lo)) &&
        java.nio.file.Files.exists(java.nio.file.Paths.get(hi)))
      val rows = ScaleGate.evaluate(
        ScaleGate.parse(lo), ScaleGate.parse(hi), factor)
      val breaches = rows.filter(_.breach)
      assert(breaches.isEmpty,
        s"$lo -> $hi: undiagnosed super-linear " +
          breaches.map(_.name).mkString(", ") +
          " — diagnose/fix or record a disposition in ScaleGate.allowlist")
    }
  }

  test("parse reads a ScaleBench file (pretty-printed and cpu-less both)") {
    val dir = SparkSpec.tempDir("scalegate")
    val withCpu = dir.resolve("hi.json")
    java.nio.file.Files.write(withCpu,
      """{"sf":"/tmp/x","reps":3,"queries":{
        |  "q_a": {"median": 1.5, "min": 1.2, "max": 1.9,
        |          "spill_mem": 0, "spill_disk": 0, "peak_exec": 1,
        |          "cpu_ms": 2500.0},
        |  "q_b": {"median": 0.5}
        |}}""".stripMargin.getBytes("UTF-8"))
    val m = ScaleGate.parse(withCpu.toString)
    assert(m("q_a") == Obs(1.5, Some(2500.0)))
    assert(m("q_b") == Obs(0.5, None))
  }

  private def writeBenchJson(rows: Long, digestCpu: Double): String =
    s"""{"metric":"write_path","sf":"/tmp/x","rows":$rows,"batches":24,
       |"ingest_s":${rows / 1e6},"ingest_cpu_s":${rows / 1e5},
       |"digest_s":${rows / 2e6},"digest_cpu_s":$digestCpu,
       |"scan_s":0.5,"scan_rows":$rows,"blocks":2,
       |"phases":{
       |  "digest":{
       |    "graft.digest.write":{"cpu_s":$digestCpu,"run_s":1,"wall_s":1,
       |      "tasks":10,"in_mb":1,"in_rows":$rows,"out_mb":1,
       |      "out_rows":$rows,"shuf_w_mb":1,"shuf_r_mb":1,
       |      "spill_mem_mb":0,"spill_disk_mb":0},
       |    "graft.digest.segstats":{"cpu_s":${rows / 1e6},"run_s":1,
       |      "wall_s":1,"tasks":3,"in_mb":1,"in_rows":$rows,"out_mb":0,
       |      "out_rows":0,"shuf_w_mb":0,"shuf_r_mb":0,
       |      "spill_mem_mb":0,"spill_disk_mb":0}}}}""".stripMargin

  test("--write mode: a quadratic digest phase trips the gate, a linear " +
      "one passes; the factor comes from the files' own rows fields " +
      "(r12 verdict ask #2)") {
    val dir = SparkSpec.tempDir("scalegate-write")
    def dump(name: String, body: String) = {
      val p = dir.resolve(name)
      java.nio.file.Files.write(p, body.getBytes("UTF-8"))
      p.toString
    }
    // lo: 18M rows, digest.write 100 cpu-s
    val lo = dump("lo.json", writeBenchJson(18000000L, 100.0))
    // linear hi: 60M rows (3.33x), digest.write 333 cpu-s — exponent 1.0
    val hiLin = dump("hi_lin.json", writeBenchJson(60000000L, 333.0))
    // quadratic hi: 1110 cpu-s — exponent 2.0
    val hiQuad = dump("hi_quad.json", writeBenchJson(60000000L, 1110.0))

    val (loM, nLo) = ScaleGate.parseWrite(lo)
    val (hiL, nHi) = ScaleGate.parseWrite(hiLin)
    val (hiQ, _) = ScaleGate.parseWrite(hiQuad)
    assert(nLo == 18000000L && nHi == 60000000L)
    // section rows AND phase rows both parse
    assert(loM.contains("digest") && loM.contains("digest/graft.digest.write"))
    val factor = nHi.toDouble / nLo

    val linRows = ScaleGate.evaluate(loM, hiL, factor, allow = Map.empty)
    assert(!row(linRows, "digest/graft.digest.write").breach)

    val quadRows = ScaleGate.evaluate(loM, hiQ, factor, allow = Map.empty)
    val r = row(quadRows, "digest/graft.digest.write")
    assert(r.breach, "quadratic write phase must breach")
    assert(math.abs(r.expCpu.get - 2.0) < 0.01)
    // the whole-section digest row breaches with it (it carries the same
    // cpu total), and a disposition downgrades both to visible notes
    assert(row(quadRows, "digest").breach)
    val allowed = ScaleGate.evaluate(loM, hiQ, factor,
      allow = Map("digest/graft.digest.write" -> "diagnosed: xyz",
        "digest" -> "same"))
    assert(!row(allowed, "digest/graft.digest.write").breach)
    assert(row(allowed, "digest/graft.digest.write").verdict
      .contains("diagnosed: xyz"))
  }

  test("bench tmp preflight counts stale graft dirs (anchor hygiene)") {
    // the r13 anchor-A incident made mechanical: Bench counts stale
    // graft-*/demo-* dirs under java.io.tmpdir and emits the count in
    // its summary JSON. Plant three, expect them counted, clean up.
    val planted = (1 to 3).map(i =>
      java.nio.file.Files.createTempDirectory("graft-preflightprobe" + i))
    try {
      val n = graft.Bench.tmpPreflight()
      assert(n >= 3, s"expected >= 3 stale dirs counted, got $n")
    } finally planted.foreach(java.nio.file.Files.deleteIfExists)
  }
}
