package graft

import graft.operators.{Dedup, Graph}

/** Randomized differential fuzz for the graph family (the PairFuzzSpec
  * template applied to link analysis): random multigraphs — gappy id
  * spaces, duplicate edges, self-loops — checked against independent
  * in-memory references. The join/renaming choreography inside
  * [[Graph.pageRank]] (fresh attribute ids per round), the ordered
  * two-join in [[Graph.triangleCounts]], and the min-label fixpoint in
  * [[Dedup.connectedComponents]] are exactly the code where a lineage
  * mix-up or a dropped boundary case (dangling node, isolated self-loop,
  * parallel edge) would be invisible to the fixed catalog graphs.
  *
  * References share NOTHING with the operators: plain Scala maps,
  * union-find, and brute triple enumeration.
  */
class GraphFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def canon(d: org.apache.spark.sql.DataFrame) =
    d.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq

  /** Random multigraph: ids from a gappy 1..200 space, duplicate edges
    * KEPT (pageRank weights parallel edges), self-loops included. */
  private def randomEdges(seed: Int, nEdges: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    val ids = Seq.fill(30 + rnd.nextInt(30))(1L + rnd.nextInt(200)).distinct
    Seq.fill(nEdges)((ids(rnd.nextInt(ids.size)), ids(rnd.nextInt(ids.size))))
  }

  test("pageRank fuzz: fixed-iteration PR == in-memory reference on " +
      "random multigraphs (dangling mass leaks, parallel edges weight)") {
    for (seed <- Seq(11, 47); iters <- Seq(1, 4)) {
      val edges = randomEdges(seed, nEdges = 120)
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val n = nodes.size
      val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size }
      val damping = 0.85
      var rank = nodes.map(_ -> 1.0 / n).toMap
      for (_ <- 1 to iters) {
        val inflow = edges.groupBy(_._2).map { case (d, es) =>
          d -> es.map(e => rank(e._1) / outdeg(e._1)).sum
        }
        rank = nodes.map(v => v ->
          ((1.0 - damping) / n + damping * inflow.getOrElse(v, 0.0))).toMap
      }
      val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet === rank.keySet, s"seed $seed iters $iters node set")
      // the engine rounds each contribution to 1e-12 (decimal-exact sum);
      // the reference sums raw doubles — 1e-9 absorbs both grains
      for ((v, r) <- rank)
        assert(math.abs(got(v) - r) < 1e-9,
          s"seed $seed iters $iters node $v: ${got(v)} vs $r")
    }
  }

  test("triangleCounts fuzz: ordered two-join == brute triple enumeration " +
      "(self-loops dropped, parallel edges collapse)") {
    for (seed <- Seq(7, 23)) {
      val edges = randomEdges(seed, nEdges = 150)
      val und = edges.collect { case (a, b) if a != b =>
        (math.min(a, b), math.max(a, b))
      }.toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      val cnt = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      for {
        i <- nodes.indices
        j <- (i + 1) until nodes.size
        if und((nodes(i), nodes(j)))
        k <- (j + 1) until nodes.size
        if und((nodes(j), nodes(k))) && und((nodes(i), nodes(k)))
      } {
        cnt(nodes(i)) += 1; cnt(nodes(j)) += 1; cnt(nodes(k)) += 1
      }
      val want = cnt.toSeq.map { case (v, c) => Seq(v.toString, c.toString) }
        .sortBy(_.mkString("|"))
      val got = canon(
        Graph.triangleCounts(edges.toDF("src", "dst"), "src", "dst"))
      assert(got === want, s"seed $seed")
    }
  }

  test("connectedComponents fuzz: min-label fixpoint == union-find " +
      "(isolated self-loops keep their own cluster)") {
    for (seed <- Seq(5, 19)) {
      val pairs = randomEdges(seed, nEdges = 60)
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      val nodes = pairs.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.foreach(v => parent.getOrElseUpdate(v, v))
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = nodes.map(v => Seq(v.toString, find(v).toString))
        .sortBy(_.mkString("|"))
      val cc = Dedup.connectedComponents(pairs.toDF("d1", "d2"))
      val got = canon(cc)
      graft.core.Checkpoints.release(cc)
      assert(got === want, s"seed $seed")
    }
  }
}
