package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.expressions.RobotsKernel

/** robots.txt kernel ([[RobotsKernel]], RFC 9309): group selection,
  * longest-match precedence, wildcard/anchor matching — hand-pinned, then
  * the matcher differential-fuzzed against a regex translation. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def ok(robots: String, agent: String, path: String): Boolean =
    RobotsKernel.eval(UTF8String.fromString(robots),
      UTF8String.fromString(agent), UTF8String.fromString(path))

  private val Policy =
    """# comments stripped
      |User-agent: *
      |Disallow: /
      |
      |User-agent: GraftBot
      |User-agent: otherbot
      |Disallow: /private
      |Allow: /private/ok
      |Disallow: /tmp/*.bak$
      |""".stripMargin

  test("group selection: exact token beats *, case-insensitive, combined") {
    assert(ok(Policy, "graftbot", "/anything"))       // exact group, no rule
    assert(!ok(Policy, "randombot", "/anything"))     // * group: deny all
    assert(!ok(Policy, "GRAFTBOT", "/private/x"))     // case-insensitive
    assert(ok(Policy, "otherbot", "/public"))         // shared UA lines
    // no group at all → allowed
    assert(ok("User-agent: x\nDisallow: /\n", "graftbot", "/q"))
    // rules before any User-agent line are ignored (RFC invalid-line rule)
    assert(ok("Disallow: /\nUser-agent: graftbot\nAllow: /a\n",
      "graftbot", "/zzz"))
  }

  test("precedence: longest pattern wins; Allow wins ties; empty ignored") {
    assert(!ok(Policy, "graftbot", "/private"))
    assert(!ok(Policy, "graftbot", "/private/other"))
    assert(ok(Policy, "graftbot", "/private/ok"))     // longer Allow
    assert(ok(Policy, "graftbot", "/private/okay"))   // prefix semantics
    val tie = "User-agent: a\nDisallow: /dir\nAllow: /dir\n"
    assert(ok(tie, "a", "/dir/x"))                    // equal length → Allow
    assert(ok("User-agent: a\nDisallow:\n", "a", "/")) // empty = no rule
  }

  test("pattern semantics: prefix, wildcard, final-$ anchor, literal $") {
    assert(RobotsKernel.matches("/a/b/c", "/a"))
    assert(!RobotsKernel.matches("/x/a", "/a"))       // prefix, not substring
    assert(RobotsKernel.matches("/a/b.bak", "/a/*.bak"))
    assert(RobotsKernel.matches("/a/b.bak.old", "/a/*.bak")) // prefix after *
    assert(RobotsKernel.matches("/a/b.bak", "/a/*.bak$"))
    assert(!RobotsKernel.matches("/a/b.bak.old", "/a/*.bak$")) // anchored
    assert(RobotsKernel.matches("/p$x", "/p$x"))      // non-final $ literal
    assert(!ok(Policy, "graftbot", "/tmp/x.bak"))
    assert(ok(Policy, "graftbot", "/tmp/x.bak2"))     // $ anchor missed
    // CRLF endings and trailing comments parse
    assert(!ok("User-agent: a\r\nDisallow: /x # note\r\n", "a", "/x/y"))
  }

  test("fuzz: wildcard matcher == regex translation on 4000 cases") {
    val rnd = new scala.util.Random(9309)
    val alphabet = "ab/*$"
    def rs(n: Int): String =
      Seq.fill(rnd.nextInt(n))(alphabet(rnd.nextInt(alphabet.length))).mkString
    var checked = 0
    for (_ <- 0 until 4000) {
      val pat = rs(8)
      val path = rs(10).replace("*", "x").replace("$", "y") // paths literal
      if (pat.nonEmpty) {
        val anchored = pat.last == '$'
        val core = if (anchored) pat.dropRight(1) else pat
        val rx = core.map {
          case '*' => ".*"
          case c => java.util.regex.Pattern.quote(c.toString)
        }.mkString
        val want = path.matches(rx + (if (anchored) "" else ".*"))
        assert(RobotsKernel.matches(path, pat) === want,
          s"pattern '$pat' vs path '$path'")
        checked += 1
      }
    }
    assert(checked > 3000)
  }

  test("crawl-delay: winning group, max across combined, invalid ignored") {
    def delay(robots: String, agent: String): java.lang.Double =
      RobotsKernel.evalDelay(UTF8String.fromString(robots),
        UTF8String.fromString(agent))
    val p = """User-agent: *
              |Crawl-delay: 2
              |Disallow: /x
              |
              |User-agent: GraftBot
              |Crawl-delay: 0.5
              |Disallow: /y
              |""".stripMargin
    assert(delay(p, "graftbot").doubleValue === 0.5) // exact group wins
    assert(delay(p, "randombot").doubleValue === 2.0) // * group
    // two groups naming the winner combine -> MAX (most polite)
    val two = "User-agent: a\nCrawl-delay: 1\nDisallow: /p\n" +
      "User-agent: a\nCrawl-delay: 3\nDisallow: /q\n"
    assert(delay(two, "a").doubleValue === 3.0)
    // absent / invalid / negative-ish forms -> null, never zero
    assert(delay("User-agent: a\nDisallow: /p\n", "a") === null)
    assert(delay("User-agent: a\nCrawl-delay: fast\n", "a") === null)
    assert(delay("User-agent: a\nCrawl-delay: -1\n", "a") === null)
    assert(delay("User-agent: a\nCrawl-delay: 1e3\n", "a") === null)
    // no matching group at all -> null
    assert(delay("User-agent: x\nCrawl-delay: 9\n", "a") === null)
    // SQL surface: one parse serves both allow and delay (shared memo)
    val df = Seq((1L, p, "/y/q"), (2L, p, "/ok")).toDF("id", "r", "pth")
    df.createOrReplaceTempView("delay_fixture")
    val out = spark.sql(
      """SELECT id, graft_robots_allowed(r, 'graftbot', pth) AS ok,
        |  graft_robots_delay(r, 'graftbot') AS d
        |FROM delay_fixture ORDER BY id""".stripMargin).collect()
    assert(out(0).getBoolean(1) === false && out(0).getDouble(2) === 0.5)
    assert(out(1).getBoolean(1) === true && out(1).getDouble(2) === 0.5)
  }

  test("memo: interleaved hosts parse each robots.txt once, not per row") {
    // the normal frontier-join shape: rows alternate hosts A,B,C,A,B,C,…
    // The direct-mapped per-thread memo must hold all three concurrently —
    // a single-slot memo would re-parse on EVERY row here.
    val policies = (0 until 3).map(i =>
      s"User-agent: *\nDisallow: /private$i\nAllow: /private$i/ok\n")
    val before = RobotsKernel.parseCount.get()
    for (row <- 0 until 200; h <- 0 until 3) {
      assert(!ok(policies(h), "anybot", s"/private$h/x"), s"row=$row host=$h")
      assert(ok(policies(h), "anybot", s"/private$h/ok"))
    }
    val parses = RobotsKernel.parseCount.get() - before
    // bound: one parse per distinct (robots, agent) pair — not 1200
    assert(parses <= 3L, s"expected <=3 parses for 3 hosts, got $parses")
  }

  test("memo adversary: 65-host round-robin degrades to re-parsing, " +
      "bounded by rows; clustering by host restores one parse per host") {
    // the DOCUMENTED worst case (Robots.scala: direct-mapped, 64 slots):
    // 65 distinct hosts visited round-robin guarantee at least one
    // same-bucket pair by pigeonhole, and that pair evicts each other
    // every round. The spec pins the degradation's exact shape —
    val policies = (0 until 65).map(i =>
      s"User-agent: *\nDisallow: /deny$i\n")
    val rounds = 40
    val before = RobotsKernel.parseCount.get()
    for (_ <- 0 until rounds; h <- 0 until 65) {
      assert(!ok(policies(h), "anybot", s"/deny$h/x"))
      assert(ok(policies(h), "anybot", s"/allow$h"))
    }
    val parses = RobotsKernel.parseCount.get() - before
    val rows = rounds.toLong * 65 * 2
    // (1) degradation is RE-PARSING and nothing worse: never more than
    //     one parse per evaluated row
    assert(parses <= rows, s"parses $parses exceed rows $rows")
    // (2) the collision is real: more parses than distinct pairs means
    //     at least one bucket thrashed (pigeonhole: 65 hosts, 64 slots)
    assert(parses > 65L, s"expected same-bucket eviction, got $parses")
    // (3) the documented mitigation — cluster the frontier by host —
    //     restores the one-parse-per-pair bound even over 65 hosts,
    //     because each host's rows arrive consecutively
    val before2 = RobotsKernel.parseCount.get()
    for (h <- 0 until 65; _ <- 0 until rounds) {
      assert(!ok(policies(h), "anybot", s"/deny$h/x"))
      assert(ok(policies(h), "anybot", s"/allow$h"))
    }
    val clustered = RobotsKernel.parseCount.get() - before2
    assert(clustered <= 65L,
      s"clustered input must parse once per host, got $clustered")
  }

  test("SQL surface: frontier filter composes with outlinks") {
    val robots = "User-agent: *\nDisallow: /private\n"
    val df = Seq((1L, robots, "/public/a"), (2L, robots, "/private/b"),
      (3L, null.asInstanceOf[String], "/x")).toDF("id", "r", "p")
    df.createOrReplaceTempView("robots_fixture")
    val out = spark.sql(
      """SELECT id, graft_robots_allowed(r, 'anybot', p) AS ok
        |FROM robots_fixture ORDER BY id""".stripMargin).collect()
    assert(out(0).getBoolean(1) === true)
    assert(out(1).getBoolean(1) === false)
    assert(out(2).isNullAt(1))
  }
}
