package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link analysis over an edge list — the corpus-graph stage of a training
  * pipeline (rank domains/hosts by citation structure, weight documents by
  * the authority of what links to them, find hub accounts in an event
  * graph).
  *
  * PageRank here runs a FIXED iteration count rather than to a
  * convergence tolerance: the result is then a pure deterministic function
  * of the edge list, which is what lets the SQL oracle replay it
  * level-by-level (the same reason q157's BPE learner fixes its merge
  * count). Production runs pick the count by graph diameter (web-graph
  * practice: 10-20 rounds); the plan per round is identical either way.
  */
object Graph {

  /** Fixed-iteration PageRank over `(src, dst)` edges. Parallel edges are
    * honored as weight (two links = twice the contribution); callers
    * wanting simple-graph semantics `.distinct()` first.
    *
    * Determinism (the driver hash-compares against DuckDB): per-edge
    * contributions are one IEEE division each (`rank/outdeg`), per-node
    * inflow accumulates EXACTLY in DECIMAL(38,12) — order- and
    * partitioning-independent — and converts to double once; the damping
    * update is the same literal arithmetic in both engines. Scale 12,
    * not 18: contributions are ≤ 1, so scaled sums stay far below 2^53
    * (where both engines' decimal→double finish is exact-int division,
    * bit-identical), and the per-term double→decimal rounding grain
    * (1e-12) towers over the gap between a double's exact binary value
    * (DuckDB's cast rounds this) and its shortest decimal repr (Spark's
    * cast rounds this) — at scale 18 that gap straddles rounding
    * boundaries often enough to flip hashes. Dangling
    * nodes (no out-edges) leak their mass, the classic simplification;
    * ranks then sum to < 1, which is fine for ranking use.
    *
    * Scale shape per iteration: one shuffle of the node-sized rank table
    * onto the out-degree table (both keyed by node, AQE co-partitions),
    * one shuffle of the edge list on `src` for the contribution join, and
    * one partial-aggregated shuffle on `dst` for the inflow sum — the
    * textbook distributed PR round, nothing quadratic, nothing collected
    * to the driver except the node count. The edge list and degree table
    * are registered in the bounded plan cache so the 2·iterations
    * consumers share one scan instead of re-reading the source each
    * round.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iterations >= 1 && iterations <= 50,
      s"pageRank: iterations must be in 1..50, got $iterations")
    require(damping > 0.0 && damping < 1.0,
      s"pageRank: damping must be in (0, 1), got $damping")
    // null endpoints are not edges: a null src's outdegree group can
    // never join ranks, inflow routed to a null dst is lost at the left
    // join (null keys never match), and the output would carry a
    // nonsense node=null row — drop them before anything counts.
    //
    // r17 optimization (guide §2.4 — remove shuffles outright): the edge
    // list is PRE-PARTITIONED on `src` and sorted before the persist, so
    // every iteration's contribution join reads the cached layout
    // directly — the measured r17-baseline plan re-EXCHANGED the cached
    // 1.19M-row edge list (28 MB dataSize) and re-SORTED it (576 MB sort
    // reservation) once per iteration; with the layout in the cache all
    // three iterations join exchange-free and sort-free on the edge
    // side, leaving the per-round inflow aggregation as the only
    // edge-sized shuffle (the textbook PR round). The partition count
    // rides the session's shuffle.partitions (scale-parameterised, not a
    // local constant); repartition-by-column keeps AQE free to size it.
    val e = graft.core.Stats.PlanCache.register(
      edges.select(col(srcCol).cast("long").as("src"),
          col(dstCol).cast("long").as("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .repartition(col("src"))
        .sortWithinPartitions(col("src")))
    // nodes feed iterations+1 consumers plus the count — cache alongside
    // the edge list, pre-partitioned on `node` so each round's rank
    // update (nodes ⋈ inflow, both node-keyed) is exchange-free too
    val nodes = graft.core.Stats.PlanCache.register(
      e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
        .repartition(col("node"))
        .sortWithinPartitions(col("node")))
    // the only driver-side value: the node count (one long)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    // grouped directly over the cached src-partitioned edges: the
    // aggregation inherits the partitioning, so building the degree
    // table is shuffle-free and its cache keeps that layout for the
    // per-round share join
    val outdeg = graft.core.Stats.PlanCache.register(
      e.groupBy(col("src")).agg(count(lit(1)).as("__deg")))
    val base = (1.0 - damping) / n.toDouble
    var ranks = nodes.select(col("node"), lit(1.0 / n.toDouble).as("rank"))
    for (_ <- 1 to iterations) {
      // rank ⋈ degree is node-sized on both sides; edges then pick up
      // each source's per-edge share and route it to dst. The rename
      // mints fresh attribute ids — outdeg and e share lineage, and a
      // same-id `src` on both sides of the edge join would be rejected
      // as an ambiguous self-join.
      val share = ranks
        .join(outdeg.withColumnRenamed("src", "__sn"),
          col("node") === col("__sn"))
        .select(col("__sn").as("src"),
          (col("rank") / col("__deg").cast("double")).as("__c"))
      // graft_dsum = the int128 exact-decimal sum, bit-identical to
      // SUM(CAST(__c AS DECIMAL(38,12))) cast back to double but ~3.5x
      // faster (expressions/DecimalSum.scala)
      val inflow = e.join(share, "src")
        .groupBy(col("dst").as("node"))
        .agg(call_function("graft_dsum", col("__c"), lit(12)).as("__s"))
      ranks = nodes.join(inflow, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + lit(damping) * coalesce(col("__s"), lit(0.0)))
            .as("rank"))
    }
    ranks
  }

  /** Per-node triangle participation over an undirected edge list — the
    * local clustering signal (tightly-knit item neighborhoods, social
    * cliques, co-purchase communities). Edges are canonicalized to
    * `(min, max)` and deduplicated; each triangle `{x < y < z}` is found
    * exactly once by the ordered two-join (`e(x,y) ⋈ e(y,z) ⋈ e(x,z)`)
    * and credited to all three corners.
    *
    * Scale: the textbook distributed triangle enumeration — two hash
    * equi-joins on node keys; the fan-out is Σ deg(v)² on the ORDERED
    * adjacency (each edge points low→high, so a hub's fan-out is
    * bounded by its higher-id neighbors only — the standard degree-
    * ordering trick cuts the classic skew). Counts partial-aggregate.
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val e = graft.core.Stats.PlanCache.register(
      edges.select(
          least(col(srcCol), col(dstCol)).cast("long").as("a"),
          greatest(col(srcCol), col(dstCol)).cast("long").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct())
    val e1 = e.toDF("x", "y")
    val e2 = e.toDF("y2", "z")
    val e3 = e.toDF("x3", "z3")
    val tris = e1
      .join(e2, col("y") === col("y2"))
      .join(e3, col("x") === col("x3") && col("z") === col("z3"))
      .select(col("x"), col("y"), col("z"))
    tris.select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_triangles"))
  }
}
