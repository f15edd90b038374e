package graft

import graft.operators.Events

/** Randomized differential fuzz for the event-analytics family: random
  * logs dense with timestamp TIES (the generator draws seconds from a
  * 0..499 space, so same-user same-second collisions are routine) checked
  * against independent in-memory references. Gap boundaries (`gap >
  * gapSecs` vs `>=`), funnel frontier strictness (`ts > t` plus the
  * step-window inclusive edge), as-of tie resolution (touch at exactly
  * conv_ts matches; max-id pre-reduction), and the interval-join bucket
  * split (a pair at gap == windowSec straddling a bucket edge) are all
  * one-character bugs the fixed catalog timestamps never probe.
  *
  * References are plain Scala over the collected log — no shared helpers
  * beyond the operator's own entry point.
  */
class EventsFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def canon(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

  /** (uid, ts, etype, eid): 8-15 users x 5-29 events, seconds 0..499
    * (ties guaranteed), types A..E, globally unique ids. */
  private def randomLog(seed: Int): Seq[(Long, Long, String, Long)] = {
    val rnd = new scala.util.Random(seed)
    var id = 0L
    (1L to (8 + rnd.nextInt(8)).toLong).flatMap { u =>
      Seq.fill(5 + rnd.nextInt(25)) {
        id += 1
        (u, rnd.nextInt(500).toLong, ('A' + rnd.nextInt(5)).toChar.toString, id)
      }
    }
  }

  private def df(log: Seq[(Long, Long, String, Long)]) =
    log.toDF("uid", "ts", "etype", "eid")

  test("sessionize fuzz: gap-rule sessions == sorted in-memory walk") {
    for (seed <- Seq(3, 27); gap <- Seq(5L, 40L)) {
      val log = randomLog(seed)
      val want = log.groupBy(_._1).toSeq.flatMap { case (u, es) =>
        val sorted = es.sortBy(e => (e._2, e._4))
        var sidx = 0L
        var prev = Long.MinValue
        val sessions = scala.collection.mutable.Map
          .empty[Long, Vector[Long]].withDefaultValue(Vector.empty)
        for (e <- sorted) {
          if (prev == Long.MinValue || e._2 - prev > gap) sidx += 1
          sessions(sidx) :+= e._2
          prev = e._2
        }
        sessions.toSeq.map { case (si, ts) =>
          Seq(u.toString, si.toString, ts.min.toString, ts.max.toString,
            ts.size.toString, (ts.max - ts.min).toString)
        }
      }.sortBy(_.mkString("|"))
      val got = canon(Events.sessionize(df(log), "uid", "ts", "eid", gap))
      assert(got === want, s"seed $seed gap $gap")
    }
  }

  test("funnel fuzz: frontier recursion == per-user in-memory replay, " +
      "with and without a step window") {
    for (seed <- Seq(9, 33); window <- Seq(None, Some(30L), Some(0L))) {
      val log = randomLog(seed)
      val steps = Seq("A", "B", "C")
      var frontier: Map[Long, Long] = log.filter(_._3 == steps.head)
        .groupBy(_._1).map { case (u, es) => u -> es.map(_._2).min }
      var want = Vector(Seq("1", steps.head, frontier.size.toString))
      for ((st, i) <- steps.zipWithIndex.drop(1)) {
        frontier = (for {
          (u, t) <- frontier.toSeq
          cand = log.filter(e => e._1 == u && e._3 == st && e._2 > t &&
            window.forall(w => e._2 <= t + w)).map(_._2)
          if cand.nonEmpty
        } yield u -> cand.min).toMap
        want :+= Seq((i + 1).toString, st, frontier.size.toString)
      }
      val got = canon(
        Events.funnel(df(log), "uid", "ts", "etype", steps, window))
      assert(got === want.sortBy(_.mkString("|")), s"seed $seed window $window")
    }
  }

  test("lastTouchAttribution fuzz: backward as-of + window == in-memory " +
      "most-recent-at-or-before (ties to max touch id)") {
    for (seed <- Seq(13, 39); window <- Seq(0L, 25L)) {
      val log = randomLog(seed)
      val touches = log.filter(_._3 == "A")
        .groupBy(e => (e._1, e._2))
        .map { case ((u, ts), es) => (u, ts, es.map(_._4).max) }.toSeq
      val want = (for {
        c <- log if c._3 == "C"
        prior = touches.filter(t => t._1 == c._1 && t._2 <= c._2)
        if prior.nonEmpty
        best = prior.maxBy(_._2)
        if c._2 - best._2 <= window
      } yield Seq(c._4.toString, c._1.toString, c._2.toString,
        best._3.toString, (c._2 - best._2).toString))
        .sortBy(_.mkString("|"))
      val got = canon(Events.lastTouchAttribution(df(log), "uid", "ts",
        "eid", "etype", convType = "C", touchType = "A", windowSec = window))
      assert(got === want, s"seed $seed window $window")
    }
  }

  test("intervalPairs fuzz: bucket-split band join == brute all-pairs " +
      "(gap exactly windowSec, same-second id ordering)") {
    for (seed <- Seq(17, 43); window <- Seq(7L, 60L)) {
      val log = randomLog(seed)
      val pairs = for {
        e1 <- log; e2 <- log
        if e1._1 == e2._1
        gap = e2._2 - e1._2
        if gap >= 0 && gap <= window
        if e1._2 < e2._2 || (e1._2 == e2._2 && e1._4 < e2._4)
      } yield (e1._3, e2._3, gap)
      val want = pairs.groupBy(p => (p._1, p._2)).toSeq.map {
        case ((t1, t2), ps) =>
          Seq(t1, t2, ps.size.toString,
            ps.map(_._3).min.toString, ps.map(_._3).max.toString)
      }.sortBy(_.mkString("|"))
      val got = canon(
        Events.intervalPairs(df(log), "uid", "ts", "eid", "etype", window))
      assert(got === want, s"seed $seed window $window")
    }
  }

  test("cohortRetention fuzz: first-seen cohort matrix == in-memory") {
    for (seed <- Seq(21, 49); bucket <- Seq(50L, 100L)) {
      val log = randomLog(seed)
      val cohort = log.groupBy(_._1)
        .map { case (u, es) => u -> es.map(e => e._2 / bucket * bucket).min }
      val want = log.map(e => (cohort(e._1), e._2 / bucket * bucket, e._1))
        .distinct.groupBy(x => (x._1, x._2)).toSeq
        .map { case ((c, b), us) =>
          Seq(c.toString, b.toString, us.size.toString)
        }.sortBy(_.mkString("|"))
      val got = canon(
        Events.cohortRetention(df(log), "uid", "ts", bucket))
      assert(got === want, s"seed $seed bucket $bucket")
    }
  }
}
