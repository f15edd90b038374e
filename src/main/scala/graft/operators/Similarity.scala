package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  *  - [[cosineTopK]]: brute-force scan against one query vector — the
  *    exact baseline; one pass, no shuffle (query broadcast).
  *  - [[blockedPairs]]: all-pairs cosine restricted to a coarse partition
  *    key (IVF-style blocking) — per-bucket self-join, never O(n²).
  *  - [[lshBuckets]]: random-hyperplane LSH — sign-bit signature from
  *    deterministic pseudo-random planes; bucket collisions are ANN
  *    candidates (the scale path when no prebuilt partition exists).
  *
  * All dot products are double-precision folds in fixed array order, so
  * results are bit-deterministic across partitionings.
  */
object Similarity {

  /** Dot product via the native codegen expression (graft.expressions.
    * DotProduct, registered by GraftExtensions). Bit-identical to the HOF
    * fold `aggregate(zip_with(...))` but runs as a fused loop inside
    * whole-stage codegen. */
  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  def norm(a: Column): Column = sqrt(call_function("graft_dot", a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** L2-normalized copy of an embedding (native one-pass expression). */
  def l2Normalize(vec: Column): Column = call_function("graft_l2_normalize", vec)

  /** Symmetric int8 quantization: struct(scale, q) — 4x smaller embeddings
    * for storage/shuffle; dequantize with [[dequantize]]. */
  def quantizeInt8(vec: Column): Column = call_function("graft_quantize8", vec)

  /** Reconstruct doubles from a [[quantizeInt8]] struct. */
  def dequantize(qz: Column): Column =
    transform(qz.getField("q"), x => x.cast("double") / qz.getField("scale"))

  /** Exact top-k by cosine against the vector with id `queryId`. */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val qv = emb.filter(col(idCol) === queryId).select(col(vecCol).as("__qv"))
    emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col(idCol), cosine(col(vecCol), col("__qv")).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** All-pairs dot product within a blocking key, thresholded. */
  def blockedPairs(emb: DataFrame, idCol: String, vecCol: String,
      blockCol: String, minDot: Double): DataFrame = {
    val a = emb.select(col(blockCol).as("__bk"), col(idCol).as("id1"), col(vecCol).as("e1"))
    val b = emb.select(col(blockCol).as("__bk2"), col(idCol).as("id2"), col(vecCol).as("e2"))
    a.join(b, col("__bk") === col("__bk2") && col("id1") < col("id2"))
      .select(col("id1"), col("id2"), dot(col("e1"), col("e2")).as("dot"))
      .filter(col("dot") > minDot)
  }

  /** Deterministic pseudo-random hyperplane weight for (seed, plane, dim):
    * splitmix-style integer hash → uniform in [-1, 1). Public so oracle SQL
    * twins can embed the identical literals. */
  def planeWeight(seed: Int, p: Int, d: Int): Double = {
    var z = (seed.toLong * 1000003 + p.toLong * 8191 + d).toLong
    z = (z ^ (z >>> 33)) * 0xff51afd7ed558ccdL
    z = (z ^ (z >>> 33)) * 0xc4ceb9fe1a85ec53L
    z ^= z >>> 33
    (z.toDouble / Long.MaxValue.toDouble)
  }

  /** Random-hyperplane signature: `planes` sign bits, each from a
    * deterministic pseudo-random hyperplane derived from (seed, dim index)
    * via a hash — no RNG state, reproducible across runs and engines.
    *
    * `dims` must match the embedding width: a mismatched row fails fast
    * with raise_error instead of silently null-padding the projection to
    * bucket 0 (which would degenerate ANN candidates to one giant bucket).
    */
  /** The signature as a column (native `graft_dotw` projections — fused
    * codegen fold, bit-identical to the HOF formulation and the oracle's
    * in-order double fold). */
  private def bucketCol(vecCol: String, planes: Int, seed: Int, dims: Int): Column = {
    val sigBits = (0 until planes).map { p =>
      val weights = array((0 until dims).map(d => lit(planeWeight(seed, p, d))): _*)
      val proj = call_function("graft_dotw", col(vecCol), weights)
      when(proj > 0, 1L << p).otherwise(0L)
    }
    val dimGuard = when(size(col(vecCol)) =!= dims,
      raise_error(concat(lit(s"lshBuckets: expected $dims-dim embedding, got "),
        size(col(vecCol)).cast("string")))).otherwise(lit(null)).cast("long")
    sigBits.reduce(_ + _) + coalesce(dimGuard, lit(0L))
  }

  def lshBuckets(emb: DataFrame, idCol: String, vecCol: String,
      planes: Int = 8, seed: Int = 42, dims: Int = 64): DataFrame =
    emb.select(col(idCol), bucketCol(vecCol, planes, seed, dims).as("bucket"))

  /** Embedding near-dup pairs with NO prebuilt blocking key: the LSH
    * bucket IS the block — all-pairs exact cosine runs only within a
    * bucket (the [[blockedPairs]] shape with a computed key). Candidate
    * recall follows the hyperplane collision bound (1 - θ/π)^planes; pairs
    * the planes separate are missed, which is the standard LSH trade —
    * raise recall with fewer planes or a multi-table union, both knobs the
    * caller owns.
    *
    * Scale: one projection computes buckets (no shuffle), one equi-join on
    * the bucket (uniform signature key), O(collisions) exact cosines —
    * never O(n²). */
  def lshNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
      minCos: Double, planes: Int = 8, seed: Int = 42, dims: Int = 64): DataFrame = {
    val withB = emb.select(col(idCol), col(vecCol),
      bucketCol(vecCol, planes, seed, dims).as("__bk"))
    val a = withB.select(col("__bk"), col(idCol).as("id1"), col(vecCol).as("e1"))
    val b = withB.select(col("__bk").as("__bk2"), col(idCol).as("id2"),
      col(vecCol).as("e2"))
    a.join(b, col("__bk") === col("__bk2") && col("id1") < col("id2"))
      .select(col("id1"), col("id2"), cosine(col("e1"), col("e2")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** Approximate top-k by cosine for a set of query ids: `tables`
    * independent LSH signatures (seed offset per table); candidates are
    * vectors sharing a (table, bucket) with the query; exact cosine is
    * computed on candidates only. Standard multi-table LSH ANN — recall
    * rises as `1 - (1 - p^planes)^tables` with per-plane collision p =
    * 1 - angle/pi; the recall harness in OperatorsSpec measures it against
    * [[cosineTopK]] ground truth.
    *
    * Scale shape: each signature pass is a projection (no shuffle); the
    * candidate join keys on (table, bucket) — uniform hash keys, no skew,
    * O(collisions) pairs; nothing cross-joins.
    */
  /** Collected centroid vectors for IVF: the `nClusters` lowest-id
    * embeddings, float widened to double (exact). ONE job, with the
    * `id < nClusters` filter pushed to the scan — the centroid table is the
    * model (bounded small, like query vectors), not a per-block loop. */
  private def seedCentroids(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int): Seq[(Long, Seq[Double])] = {
    val cents = emb.filter(col(idCol) < nClusters)
      .select(col(idCol), col(vecCol))
      .collect().toSeq
      .map(r => (r.getLong(0),
        r.getAs[collection.Seq[Float]](1).toSeq.map(_.toDouble)))
      .sortBy(_._1)
    require(cents.size >= 2, // greatest() needs 2+; 0/1 centroids is no IVF
      s"IVF needs >= 2 seed centroids; found ${cents.size} rows with $idCol < $nClusters")
    cents
  }

  /** Nearest-centroid id as a pure projection (no shuffle): `nClusters`
    * fused `graft_dotw` folds + an argmax via `greatest` on (sim, -cid)
    * structs — lexicographic struct order makes the SMALLEST cid win ties,
    * matching the oracle's ORDER BY sim DESC, cid. */
  private def ivfClusterCol(cents: Seq[(Long, Seq[Double])], vecCol: String): Column = {
    val packed = cents.map { case (cid, cv) =>
      struct(call_function("graft_dotw", col(vecCol),
        array(cv.map(lit): _*)).as("s"), lit(-cid).as("n"))
    }
    -greatest(packed: _*).getField("n")
  }

  /** IVF coarse quantization — the inverted-file ANN scale path: every
    * vector is assigned to its nearest of `nClusters` centroids by dot
    * product. Centroids are SEEDED deterministically as the lowest-id
    * vectors (production replaces them with offline k-means means; the
    * parts that must scale — broadcast centroids, shuffle-free assignment,
    * probe-limited search — are identical either way). */
  def ivfAssign(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16): DataFrame =
    emb.select(col(idCol),
      ivfClusterCol(seedCentroids(emb, idCol, vecCol, nClusters), vecCol)
        .as("cluster"))

  /** IVF ANN top-k: per query, probe the `nProbe` nearest centroids and
    * compute exact cosine ONLY on vectors assigned to probed clusters —
    * the candidate set shrinks by ~nProbe/nClusters versus a full scan.
    *
    * Scale shape: centroids broadcast (driver-bounded by nClusters);
    * assignment is a projection over one scan; probes and query vectors
    * broadcast; the only shuffle is the final per-query top-k window over
    * candidates. Versus [[annTopK]] (LSH): IVF gives tunable recall via
    * nProbe and data-adaptive partitions, at the cost of a trained/seeded
    * codebook. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, nClusters: Int = 16, nProbe: Int = 4,
      trainIters: Int = 0): DataFrame = {
    val cents =
      if (trainIters > 0) kmeansFit(emb, idCol, vecCol, nClusters, trainIters)
      else seedCentroids(emb, idCol, vecCol, nClusters)
    val assigned = emb.select(col(idCol), col(vecCol),
      ivfClusterCol(cents, vecCol).as("__c"))
    // probe list per query: top nProbe centroids by the same dot. The
    // structs carry the ACTUAL centroid id — a positional (posexplode)
    // index would only equal the id when the seed ids happen to be
    // contiguous from 0, and would silently mis-join on sparse id sets
    val simStructs = array(cents.map { case (cid, cv) =>
      struct(lit(cid).as("cid"),
        call_function("graft_dotw", col(vecCol), array(cv.map(lit): _*)).as("csim"))
    }: _*)
    val qsims = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), explode(simStructs).as("cs"))
      .select(col("qid"), col("cs.cid").as("cid"), col("cs.csim").as("csim"))
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("csim").desc, col("cid"))
    val probes = qsims.withColumn("rk", row_number().over(wq))
      .filter(col("rk") <= nProbe)
      .select(col("qid"), col("cid"))
    val qvecs = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid2"), col(vecCol).as("qv"))
    val scored = assigned
      .join(broadcast(probes), col("__c") === col("cid") && col(idCol) =!= col("qid"))
      .join(broadcast(qvecs), col("qid") === col("qid2"))
      .select(col("qid"), col(idCol), cosine(col(vecCol), col("qv")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  def annTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, planes: Int = 8, tables: Int = 8,
      seed: Int = 42, dims: Int = 64): DataFrame = {
    // ONE scan computes every table's signature, then explodes to
    // (id, tbl, bucket) rows — not `tables` unioned scans of the data
    val sigs = emb
      .select(col(idCol),
        posexplode(array((0 until tables).map(t =>
          bucketCol(vecCol, planes, seed + 1000 * t, dims)): _*)).as(Seq("tbl", "bucket")))
    val qsigs = sigs.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col("tbl").as("qtbl"), col("bucket").as("qbucket"))
    val cands = sigs
      .join(broadcast(qsigs),
        col("tbl") === col("qtbl") && col("bucket") === col("qbucket") &&
          col(idCol) =!= col("qid"))
      .select(col("qid"), col(idCol)).distinct()
    val qvecs = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid2"), col(vecCol).as("qv"))
    val scored = cands
      .join(emb.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(qvecs), col("qid") === col("qid2"))
      .select(col("qid"), col(idCol), cosine(col(vecCol), col("qv")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** Multi-probe LSH ANN (Lv et al., VLDB 2007): instead of replicating
    * the index into `tables` signature copies ([[annTopK]]), keep ONE
    * signature per vector and let each QUERY probe `probes` extra
    * buckets — the neighbors of its own bucket reached by flipping the
    * sign bits with the smallest projection margins (the planes the
    * query sits closest to, exactly where near neighbors fall on the
    * other side). Same recall lever, index cost 1× instead of tables×:
    * the trade that matters when the index is 100 TB and the queries are
    * thousands.
    *
    * Probe order is deterministic: planes sort by `(|projection|, plane
    * index)`, single-bit flips only (the classic perturbation depth-1
    * sequence; deeper perturbation sets compose by raising `probes`).
    *
    * Scale shape: the data side computes ONE bucket per vector (scan-side
    * projection, no replication, no shuffle); the probe fan-out explodes
    * only the bounded query set, which then broadcasts into the candidate
    * join on the uniform bucket key; exact cosine runs on candidates
    * only; per-query top-k windows partition on the bounded query ids.
    */
  /** `(qid, __bk)` probe rows for the bounded query set: the home bucket
    * plus `probes` single-bit margin-ordered flips — THE multi-probe
    * front end, in exactly one place: [[annMultiProbe]] serves queries
    * with it and [[lshCandidateRecall]] audits the SAME code path (an
    * audit of a copy would silently measure a different front end than
    * production the moment either drifted). */
  private def probeBuckets(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], planes: Int, seed: Int, dims: Int,
      probes: Int): DataFrame = {
    val projArr = array((0 until planes).map { p =>
      val weights = array((0 until dims).map(d =>
        lit(planeWeight(seed, p, d))): _*)
      call_function("graft_dotw", col(vecCol), weights)
    }: _*)
    emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), projArr.as("__pj"))
      .withColumn("__bk0", (0 until planes).map(p =>
        when(element_at(col("__pj"), p + 1) > 0, lit(1L << p))
          .otherwise(lit(0L))).reduce(_ + _))
      .select(col("qid"), explode(expr(
        s"""concat(array(__bk0), transform(
           |  slice(array_sort(transform(sequence(1, $planes),
           |    p -> struct(abs(__pj[p - 1]) AS a, p AS p))), 1, $probes),
           |  s -> __bk0 ^ shiftleft(CAST(1 AS BIGINT), s.p - 1)))"""
          .stripMargin)).as("__bk"))
  }

  def annMultiProbe(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int, planes: Int = 8, seed: Int = 42,
      dims: Int = 64, probes: Int = 3): DataFrame = {
    require(probes >= 0 && probes <= planes,
      "annMultiProbe: probes must be in [0, planes]")
    val data = emb.select(col(idCol),
      bucketCol(vecCol, planes, seed, dims).as("__bk"))
    val qprobes = probeBuckets(emb, idCol, vecCol, queryIds, planes, seed,
      dims, probes)
    val cands = data.join(broadcast(qprobes), Seq("__bk"))
      .filter(col("qid") =!= col(idCol))
      .select(col("qid"), col(idCol)).distinct()
    val qvecs = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid2"), col(vecCol).as("qv"))
    val scored = cands
      .join(emb.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(qvecs), col("qid") === col("qid2"))
      .select(col("qid"), col(idCol), cosine(col(vecCol), col("qv")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col(idCol))
    scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= k).drop("rk")
  }

  /** ANN index quality as a QUERY — per-probe candidate recall of the
    * multi-probe LSH front end against the exact top-k: did the true
    * nearest neighbors land in the probed buckets at all? Candidate
    * recall upper-bounds anything the rerank stage can deliver, so this
    * is the number an index design review starts from (the recall
    * harness in OperatorsSpec measures end recall; this makes the audit
    * a catalog citizen with an oracle).
    *
    * Determinism: the exact side ranks by `graft_dsum` DECIMAL(38,12)
    * cosine folds (the [[labelConsistency]] discipline — a ULP cannot
    * flip a near-tie neighbor); the candidate side reuses [[lshBuckets]]'
    * sign folds and [[annMultiProbe]]'s margin-ordered bit flips
    * (sign/margin stability across engines established by q47/q166).
    *
    * Scale: the probe set is bounded; signatures are a scan-side
    * projection; candidates join on the uniform bucket key; the exact
    * side's dim join reduces map-side into |probe|·n sums. One corpus
    * scan per side.
    */
  def lshCandidateRecall(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], k: Int = 10, planes: Int = 8, seed: Int = 42,
      dims: Int = 64, probes: Int = 3): DataFrame = {
    require(queryIds.nonEmpty && k >= 1, "lshCandidateRecall: queryIds nonempty, k >= 1")
    // probes <= 0 would silently degrade to home-bucket-only candidates
    // and probes > planes would silently clamp via the flip slice — both
    // are caller bugs, not recall settings
    require(probes >= 1 && probes <= planes,
      s"lshCandidateRecall: probes must be in [1, planes=$planes], got $probes")
    import org.apache.spark.sql.expressions.Window
    // exact top-k by decimal-fold cosine — per-row graft_ddot folds
    // (bit-identical to the exploded-dim dsum aggregation they replace;
    // see labelConsistency r17 note)
    def ddot(a: Column, b: Column): Column =
      call_function("graft_ddot", a, b, lit(12))
    val withNorm = emb.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      sqrt(ddot(col(vecCol), col(vecCol))).as("__nn"))
    val probesF = withNorm.filter(col("__id").isin(queryIds: _*))
      .toDF("__pid", "__pv", "__pn")
    val cosv = withNorm.join(broadcast(probesF),
        col("__id") =!= col("__pid"))
      .select(col("__pid"), col("__id"),
        (ddot(col("__v"), col("__pv")) /
          (col("__pn") * col("__nn"))).as("__cos"))
    val wP = Window.partitionBy(col("__pid"))
      .orderBy(col("__cos").desc, col("__id"))
    val exact = cosv.withColumn("__rk", row_number().over(wP))
      .filter(col("__rk") <= k)
      .select(col("__pid").as("qid"), col("__id").as("nid"))
    // candidate sets: the annMultiProbe front end — the SHARED
    // probeBuckets helper, so the audit measures production's code path
    val data = emb.select(col(idCol).as("nid"),
      bucketCol(vecCol, planes, seed, dims).as("__bk"))
    val qprobes = probeBuckets(emb, idCol, vecCol, queryIds, planes, seed,
      dims, probes)
    val cands = data.join(broadcast(qprobes), Seq("__bk"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid")).distinct()
    val candCounts = cands.groupBy(col("qid"))
      .agg(count(lit(1)).as("n_candidates"))
    exact
      .join(cands.withColumn("__hit", lit(1L)), Seq("qid", "nid"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("k_found"),
        sum(coalesce(col("__hit"), lit(0L))).as("hits"))
      .join(broadcast(candCounts), Seq("qid"), "left")
      .select(col("qid"), coalesce(col("n_candidates"), lit(0L))
          .as("n_candidates"),
        col("k_found"), col("hits"),
        (col("hits").cast("double") / col("k_found").cast("double"))
          .as("recall"))
  }

  /** Lloyd k-means refinement of the IVF codebook — turns [[ivfAssign]]'s
    * seeded centroids into trained ones. Each iteration: (1) nearest-
    * centroid assignment as a shuffle-free projection (broadcast centroid
    * literals, fused `graft_dotw` argmax — identical machinery to
    * [[ivfAssign]]); (2) per-dimension means via ONE aggregation keyed on
    * (cluster, dim) — exact DECIMAL(38,9) sums (`graft_dsum`), so the
    * centroid update is order-independent and bit-identical across
    * partitionings and engines; (3) collect the k×dims means to the driver
    * (the MODEL — bounded by the codebook size, like MLlib's k-means, not
    * by the data). An empty cluster keeps its previous centroid.
    *
    * Scale: per iteration one scan + one shuffle whose key space is
    * k×dims (uniform, tiny); map-side partial aggregation reduces each
    * task's output to at most k×dims rows, so the shuffle volume is
    * O(tasks·k·dims), independent of row count. Dims are inferred from the
    * seed centroids — no hardcoded width.
    */
  def kmeansFit(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, iters: Int = 2): Seq[(Long, Seq[Double])] = {
    // cache the (id, vec) working set across Lloyd passes — the standard
    // iterative-trainer pattern (MLlib does the same); spills to disk if
    // the table outgrows executor memory
    val working = emb.select(col(idCol), col(vecCol)).persist()
    try {
      var cents = seedCentroids(working, idCol, vecCol, nClusters)
      for (_ <- 0 until iters) {
        val means = working
          .select(ivfClusterCol(cents, vecCol).as("cluster"),
            posexplode(col(vecCol)).as(Seq("dim", "v")))
          .groupBy(col("cluster"), col("dim"))
          .agg((call_function("graft_dsum", col("v").cast("double"), lit(9))
            / count(lit(1))).as("m"))
          .collect()
        val byCluster = means.groupBy(_.getLong(0)).map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
        cents = cents.map { case (cid, cv) => (cid, byCluster.getOrElse(cid, cv)) }
      }
      cents
    } finally { working.unpersist(blocking = false); () }
  }

  /** Final cluster assignment under [[kmeansFit]]-trained centroids: a
    * single shuffle-free projection over the data, exactly like
    * [[ivfAssign]] but with the refined codebook. */
  def kmeansAssign(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, iters: Int = 2): DataFrame =
    emb.select(col(idCol),
      ivfClusterCol(kmeansFit(emb, idCol, vecCol, nClusters, iters), vecCol)
        .as("cluster"))

  /** Cluster-quality report over a trained codebook: per cluster, its
    * size and the total / mean dot-product similarity of members to
    * their own centroid — the cosine-space inertia that tells you
    * whether `nClusters` fits the data (falling mean similarity as k
    * shrinks = clusters too coarse). ONE fit, one shuffle-free
    * assignment+score projection (the cluster argmax and the member→
    * centroid dot compute in the same scan pass), one groupBy. The
    * total rides an exact int128 decimal sum — order-independent,
    * engine-reproducible; the mean is one IEEE division.
    */
  def clusterQuality(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, iters: Int = 2): DataFrame = {
    val cents = kmeansFit(emb, idCol, vecCol, nClusters, iters)
    // member→own-centroid similarity via the same packed argmax trick:
    // keep the winning struct's score instead of its id
    val packed = cents.map { case (cid, cv) =>
      struct(call_function("graft_dotw", col(vecCol),
        array(cv.map(lit): _*)).as("s"), lit(-cid).as("n"))
    }
    val win = greatest(packed: _*)
    emb.select((-win.getField("n")).as("cluster"), win.getField("s").as("sim"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        call_function("graft_dsum", col("sim"), lit(6)).as("total_sim"))
      .withColumn("mean_sim", col("total_sim") / col("n"))
  }

  /** Product-quantization codebooks: for each of `m` subspaces, the
    * sub-vectors of the `k` lowest-id embeddings (seeded, like
    * [[ivfAssign]]'s centroids — production swaps in per-subspace k-means
    * without changing the scale structure). Returns
    * `(subspace, code, subvector)` with `dims/m` doubles each. */
  /** In-order double fold — the SAME accumulation order as `graft_dotw`
    * and the oracle SQL's list_reduce, so driver-side LUTs and norms are
    * bit-identical to their in-plan twins. */
  private def dotFold(a: Seq[Double], b: Seq[Double]): Double = {
    var sum = 0.0; var i = 0
    while (i < a.size && i < b.size) { sum += a(i) * b(i); i += 1 }
    sum
  }

  /** Collected (id, vector-as-doubles) rows for a bounded id set. */
  private def collectVecs(emb: DataFrame, idCol: String, vecCol: String,
      ids: Seq[Long]): Seq[(Long, Seq[Double])] =
    emb.filter(col(idCol).isin(ids: _*))
      .select(col(idCol), col(vecCol)).collect().toSeq
      .map(r => (r.getLong(0),
        r.getAs[collection.Seq[Float]](1).toSeq.map(_.toDouble)))
      .sortBy(_._1)

  /** Per-query ADC column structs: `struct(qid, adc)` where adc sums the
    * m codebook-LUT lookups in fixed subspace order (0.0-seeded, matching
    * the oracle's list_prepend fold). */
  private def adcStructs(queries: Seq[(Long, Seq[Double])],
      books: Seq[(Int, Int, Seq[Double])], m: Int): Seq[Column] = {
    val sub = books.head._3.size
    queries.map { case (qid, qv) =>
      val adc = (0 until m).map { s =>
        val lut = books.filter(_._1 == s).sortBy(_._2)
          .map { case (_, _, cv) => dotFold(qv.slice(s * sub, (s + 1) * sub), cv) }
        element_at(array(lut.map(lit): _*), col(s"code_$s") + 1)
      }.foldLeft(lit(0.0))(_ + _)
      struct(lit(qid).as("qid"), adc.as("adc"))
    }
  }

  /** Exact-cosine rerank tail shared by the PQ searchers: join the
    * broadcast query vectors (+ precomputed norms), score candidates with
    * the fused folds, keep the per-query top `kNN`. */
  private def exactRerank(cands: DataFrame, queries: Seq[(Long, Seq[Double])],
      idCol: String, vecCol: String, kNN: Int): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val qdf = broadcast(queries.map { case (qid, qv) =>
      (qid, qv, math.sqrt(dotFold(qv, qv))) }.toDF("__qid", "__qv", "__qnorm"))
    val wSim = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col(idCol))
    cands.join(qdf, col("qid") === col("__qid"))
      .select(col("qid"), col(idCol),
        (call_function("graft_dotw", col(vecCol), col("__qv")) /
          (sqrt(call_function("graft_dot", col(vecCol), col(vecCol))) *
            col("__qnorm"))).as("sim"))
      .withColumn("__rk", row_number().over(wSim))
      .filter(col("__rk") <= kNN).drop("__rk")
  }

  private def pqCodebooks(emb: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): Seq[(Int, Int, Seq[Double])] = {
    val seeds = emb.filter(col(idCol) < k).select(col(idCol), col(vecCol))
      .collect().toSeq
      .map(r => (r.getLong(0),
        r.getAs[collection.Seq[Float]](1).toSeq.map(_.toDouble)))
      .sortBy(_._1)
    pqCodebooksFrom(seeds, m, k, idCol)
  }

  /** Codebook slicing over ALREADY-collected seed rows — split out (r18)
    * so the composed searchers can feed centroids, codebooks and query
    * vectors from ONE bounded collect instead of one scan job per model
    * piece (ivfPqTopK paid four per construction: cents + books + queries
    * + pqEncode's internal re-collect). */
  private def pqCodebooksFrom(seeds: Seq[(Long, Seq[Double])], m: Int,
      k: Int, idCol: String): Seq[(Int, Int, Seq[Double])] = {
    require(seeds.size == k, s"PQ needs $k seed vectors with $idCol < $k")
    // m must tile the embedding exactly: a remainder would silently drop
    // tail dimensions from every code and every ADC lookup, and m > dims
    // would degenerate every slice to empty (all codes 0, all scores
    // equal) with no diagnostic
    val dims = seeds.head._2.size
    require(m >= 1 && dims % m == 0,
      s"PQ subspace count m=$m must divide the embedding width $dims")
    val sub = dims / m
    for ((j, v) <- seeds; s <- 0 until m)
      yield (s, j.toInt, v.slice(s * sub, (s + 1) * sub))
  }

  /** ONE bounded collect for the seed rows (`id < seedBound`) AND the
    * query vectors — the model pieces every PQ/IVF searcher needs
    * driver-side. An id satisfying both predicates lands in both outputs.
    */
  private def collectSeedAndQueryVecs(emb: DataFrame, idCol: String,
      vecCol: String, seedBound: Int, ids: Seq[Long])
      : (Seq[(Long, Seq[Double])], Seq[(Long, Seq[Double])]) = {
    val qset = ids.toSet
    val pred =
      if (ids.isEmpty) col(idCol) < seedBound
      else col(idCol) < seedBound || col(idCol).isin(ids: _*)
    val rows = emb.filter(pred).select(col(idCol), col(vecCol))
      .collect().toSeq
      .map(r => (r.getLong(0),
        r.getAs[collection.Seq[Float]](1).toSeq.map(_.toDouble)))
    (rows.filter(_._1 < seedBound).sortBy(_._1),
      rows.filter(t => qset.contains(t._1)).sortBy(_._1))
  }

  /** PQ encoding: per subspace, the code of the centroid with the LARGEST
    * dot product against the sub-vector (ties → smallest code), computed
    * as a shuffle-free fused-fold projection — identical machinery to
    * [[ivfClusterCol]] per subspace. The encoded row is `m` small ints
    * (`m` bytes at k ≤ 256): a 64-dim float vector compresses 32× — THE
    * published memory answer for corpus-scale ANN (IVF bounds candidates,
    * PQ bounds bytes-per-vector). */
  def pqEncode(emb: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16): DataFrame =
    pqEncodeWith(emb, idCol, vecCol, pqCodebooks(emb, idCol, vecCol, m, k))

  /** [[pqEncode]] over an already-collected codebook — no scan job. */
  private def pqEncodeWith(emb: DataFrame, idCol: String, vecCol: String,
      books: Seq[(Int, Int, Seq[Double])]): DataFrame = {
    val m = books.map(_._1).max + 1
    val sub = books.head._3.size
    val codeCols = (0 until m).map { s =>
      val packed = books.filter(_._1 == s).sortBy(_._2).map { case (_, j, cv) =>
        struct(call_function("graft_dotw",
          slice(col(vecCol), s * sub + 1, sub), array(cv.map(lit): _*)).as("d"),
          lit(-j).as("n"))
      }
      (-greatest(packed: _*).getField("n")).cast("int").as(s"code_$s")
    }
    emb.select(col(idCol) +: col(vecCol) +: codeCols: _*)
  }

  /** PQ ANN search with ADC (asymmetric distance computation): each query
    * precomputes an `m×k` lookup table of sub-dot-products against the
    * codebooks (driver-side — the LUT is the query's model, k·m doubles),
    * every encoded vector is scored by `m` table lookups summed in fixed
    * subspace order, the top `rerank` ADC candidates get EXACT cosines,
    * and the top `kNN` win. One scan computes codes and every query's ADC
    * score (exploded per query, never one branch per query); the only
    * shuffles are the two per-query top-k windows.
    */
  def pqTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], kNN: Int, m: Int = 8, k: Int = 16,
      rerank: Int = 50): DataFrame = {
    // one bounded collect feeds codebooks + query vectors, and the
    // encoder reuses the collected books (was 3 scan jobs, r18)
    val (seeds, queries) =
      collectSeedAndQueryVecs(emb, idCol, vecCol, k, queryIds)
    val books = pqCodebooksFrom(seeds, m, k, idCol)
    val encoded = pqEncodeWith(emb, idCol, vecCol, books)
    val scored = encoded
      .select(col(idCol), col(vecCol),
        explode(array(adcStructs(queries, books, m): _*)).as("a"))
      .select(col(idCol), col(vecCol), col("a.qid").as("qid"), col("a.adc").as("adc"))
      .filter(col(idCol) =!= col("qid"))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc").desc, col(idCol))
    val cands = scored.withColumn("__rk", row_number().over(wAdc))
      .filter(col("__rk") <= rerank).drop("__rk")
    exactRerank(cands, queries, idCol, vecCol, kNN)
  }

  /** IVF + PQ — the production pairing for corpus-scale ANN: the coarse
    * quantizer (IVF) bounds WHICH vectors are scored (~nProbe/nClusters of
    * the corpus), PQ bounds the BYTES per scored vector (m codes instead
    * of the float vector), ADC scores candidates via lookup tables, and
    * exact cosine reranks the survivors. Every stage is the proven
    * standalone machinery ([[ivfAssign]]'s argmax, [[pqEncode]],
    * [[pqTopK]]'s LUTs) composed in one plan: ONE scan computes cluster +
    * codes + every query's ADC, the probe list broadcasts, and the only
    * shuffles are the two per-query top-k windows.
    */
  def ivfPqTopK(emb: DataFrame, idCol: String, vecCol: String,
      queryIds: Seq[Long], kNN: Int, nClusters: Int = 16, nProbe: Int = 4,
      m: Int = 8, k: Int = 16, rerank: Int = 50): DataFrame = {
    val spark = emb.sparkSession
    // ONE bounded collect for centroids + codebooks + query vectors (was
    // 4 scan jobs per construction counting pqEncode's internal
    // re-collect, r18)
    val (seeds, queries) = collectSeedAndQueryVecs(emb, idCol, vecCol,
      math.max(nClusters, k), queryIds)
    val cents = seeds.filter(_._1 < nClusters)
    require(cents.size >= 2,
      s"IVF needs >= 2 seed centroids; found ${cents.size} rows with " +
        s"$idCol < $nClusters")
    val books = pqCodebooksFrom(seeds.filter(_._1 < k), m, k, idCol)
    // driver-side probe list: nProbe nearest centroids per query (same
    // dot + tiebreak as ivfTopK, computed on the collected query vectors)
    val probes = queries.flatMap { case (qid, qv) =>
      cents.map { case (cid, cv) => (qid, cid, dotFold(qv, cv)) }
        .sortBy { case (_, cid, d) => (-d, cid) }
        .take(nProbe).map { case (qid2, cid, _) => (qid2, cid) }
    }
    import spark.implicits._
    val probeDf = broadcast(probes.toDF("__pqid", "__pcid"))
    val encoded = pqEncodeWith(emb, idCol, vecCol, books)
      .withColumn("__c", ivfClusterCol(cents, vecCol))
    val scored = encoded
      .select(col(idCol), col(vecCol), col("__c"),
        explode(array(adcStructs(queries, books, m): _*)).as("a"))
      .select(col(idCol), col(vecCol), col("__c"),
        col("a.qid").as("qid"), col("a.adc").as("adc"))
      .join(probeDf, col("qid") === col("__pqid") && col("__c") === col("__pcid"))
      .filter(col(idCol) =!= col("qid"))
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc").desc, col(idCol))
    val cands = scored.withColumn("__rk", row_number().over(wAdc))
      .filter(col("__rk") <= rerank).drop("__rk")
    exactRerank(cands, queries, idCol, vecCol, kNN)
  }

  /** Semantic deduplication (SemDeDup-style): cluster the embedding space
    * with the IVF codebook, then WITHIN each cluster drop every vector
    * that is cosine-similar (≥ `minCos`) to a lower-id vector — duplicates
    * in meaning, not bytes (translations, paraphrases, re-crawls survive
    * exact and MinHash dedup; they land in the same embedding
    * neighborhood). Returns `(id, cluster, dropped)` for the whole corpus.
    *
    * The cluster is the blocking key: all-pairs cosine runs per cluster,
    * never corpus-wide — the [[blockedPairs]] shape with a learned
    * (or seeded) partition. Cross-cluster near-duplicates are missed by
    * construction (the standard SemDeDup trade: the codebook IS the
    * candidate blocking; raise nClusters for tighter clusters, lower for
    * higher recall). The keep-lowest-id rule is single-pass — a drop
    * decision needs only "some smaller-id similar vector exists", not the
    * transitive closure ([[Dedup.connectedComponents]] exists when full
    * closure semantics are wanted).
    *
    * Scale: assignment is a shuffle-free broadcast-codebook projection;
    * the pair join keys on the cluster id; per-cluster pair count is
    * O(avg cluster size) per row, the quantity nClusters controls. One
    * distinct + one left join on uniformly-hashed ids finish the verdict.
    */
  def semanticDedup(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int = 16, minCos: Double = 0.99, trainIters: Int = 0): DataFrame = {
    val cents =
      if (trainIters > 0) kmeansFit(emb, idCol, vecCol, nClusters, trainIters)
      else seedCentroids(emb, idCol, vecCol, nClusters)
    val assigned = emb.select(col(idCol), col(vecCol),
      ivfClusterCol(cents, vecCol).as("cluster"))
    val a = assigned.select(col("cluster").as("__c1"), col(idCol).as("id1"),
      col(vecCol).as("e1"))
    val b = assigned.select(col("cluster").as("__c2"), col(idCol).as("id2"),
      col(vecCol).as("e2"))
    val drops = a.join(b, col("__c1") === col("__c2") && col("id1") < col("id2"))
      .filter(cosine(col("e1"), col("e2")) >= minCos)
      .select(col("id2").as(idCol)).distinct()
      .withColumn("__dropped", lit(1L))
    assigned.select(col(idCol), col("cluster"))
      .join(drops, Seq(idCol), "left")
      .select(col(idCol), col("cluster"),
        coalesce(col("__dropped"), lit(0L)).as("dropped"))
  }

  /** Hard-negative mining for contrastive training: for each query vector,
    * the `k` most cosine-similar vectors with a DIFFERENT label — similar
    * enough to be hard, labeled differently so they are negatives.
    *
    * Shape: the query vectors broadcast (queries are a tiny slice of the
    * corpus), one corpus scan scores every (query, candidate) with the
    * fused `graft_dot` cosine, the label inequality prunes in the same
    * pass, and per-query top-k is a window over the query key — |Q| tasks,
    * each ranking its own candidate stream. For query sets too large to
    * broadcast, run [[annTopK]]'s bucketed candidate generation first and
    * rescore; this exact form is the recall-1.0 baseline.
    */
  def hardNegatives(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, queryIds: Seq[Long], k: Int): DataFrame = {
    val q = emb.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("qid"), col(vecCol).as("__qv"),
        col(labelCol).as("__qlabel"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col(idCol))
    emb.join(broadcast(q), col(labelCol) =!= col("__qlabel"))
      .select(col("qid"), col(idCol), col(labelCol),
        cosine(col(vecCol), col("__qv")).as("sim"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Embedding-space drift between the early and late halves of the id
    * range, per label: how far each cluster's CENTROID direction moved
    * (cosine between the two per-label sum-vectors — scale-invariant, so
    * no mean division is needed) next to the side populations. The
    * vector-space companion to the scalar drift family
    * ([[graft.core.Stats.driftReport]] / `ksDrift`): a corpus refresh
    * that re-embeds or re-balances a cluster shows up as
    * `centroid_cos < 1` long before scalar stats move.
    *
    * Float discipline, engine-portable: each component is quantized to
    * exact integer micro-units (`⌊x·10⁶⌋` — the floor of an identical
    * double is identical on every engine, unlike double→decimal
    * rounding, whose HALF_UP/HALF_EVEN convention differs) and the
    * per-dimension sums accumulate those integers in decimal(38,0) —
    * exact, hence ORDER-INDEPENDENT under any partitioning (a naive
    * double sum is not). One correctly-rounded cast to double per
    * (label, dim), then the final cosine folds the assembled per-label
    * vectors left-to-right exactly like the oracle's `list_reduce`. The
    * 1e-6 quantization is orders of magnitude below any drift signal;
    * what it buys is bit-identical output across engines. Groups empty
    * on one side (or with a zero centroid) report NULL, never NaN.
    *
    * Scale: the exploded stream is rows × dims but carries only
    * `(label, dim, decimal)` triples that partial-aggregate map-side
    * into |labels|·dims rows; the per-label finish assembles dims-length
    * arrays — broadcast-scale — and the id-extent scalar rides one
    * broadcast. No shuffle ever carries a raw vector.
    */
  def embeddingDrift(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val st = emb.agg(min(col(idCol)).as("__imin"), max(col(idCol)).as("__imax"))
    // rows at exactly the midpoint belong to the later period (driftReport)
    val j = emb.select(col(labelCol), col(idCol).as("__id"),
        col(vecCol).as("__v"))
      .crossJoin(broadcast(st))
      .withColumn("__ia",
        when(col("__id") < expr("(__imin + __imax) div 2"), 1).otherwise(0))
    val n = j.groupBy(col(labelCol))
      .agg(sum(col("__ia")).as("n_a"),
        sum(lit(1) - col("__ia")).as("n_b"))
    val e = j.select(col(labelCol), col("__ia"),
      posexplode(col("__v")).as(Seq("__dim", "__x")))
    val qx = floor(col("__x").cast("double") * lit(1000000.0)).cast(dec)
    val s = e.groupBy(col(labelCol), col("__dim"))
      .agg(
        sum(when(col("__ia") === 1, qx).otherwise(lit(0).cast(dec)))
          .cast("double").as("__sa"),
        sum(when(col("__ia") === 0, qx).otherwise(lit(0).cast(dec)))
          .cast("double").as("__sb"))
    val v = s.groupBy(col(labelCol))
      .agg(collect_list(struct(col("__dim"), col("__sa"))).as("__pa"),
        collect_list(struct(col("__dim"), col("__sb"))).as("__pb"))
      .select(col(labelCol),
        expr("transform(array_sort(__pa), p -> p.__sa)").as("__va"),
        expr("transform(array_sort(__pb), p -> p.__sb)").as("__vb"))
    v.join(n, labelCol)
      .withColumn("__dot", expr(
        "aggregate(zip_with(__va, __vb, (a, b) -> a * b), 0D, (x, y) -> x + y)"))
      .withColumn("__na2", expr(
        "aggregate(transform(__va, x -> x * x), 0D, (x, y) -> x + y)"))
      .withColumn("__nb2", expr(
        "aggregate(transform(__vb, x -> x * x), 0D, (x, y) -> x + y)"))
      .select(col(labelCol),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        when(col("n_a") > 0 && col("n_b") > 0 &&
          col("__na2") > 0 && col("__nb2") > 0,
          col("__dot") / (sqrt(col("__na2")) * sqrt(col("__nb2"))))
          .otherwise(lit(null).cast("double")).as("centroid_cos"))
  }

  /** Label geometry report: the pairwise cosine matrix of per-label
    * centroid DIRECTIONS — which classes sit on top of each other in
    * embedding space (cosine near 1 = the labels are geometrically
    * confusable; a classifier or router built on these embeddings will
    * mix them). Cosine of the per-label SUM vectors — scale-invariant,
    * so no mean division — under the same exact-integer float discipline
    * as [[embeddingDrift]]: `⌊x·10⁶⌋` micro-units, decimal(38,0)
    * order-independent sums, one cast per (label, dim), dim-ordered
    * folds. Zero-vector labels report NULL cosine.
    *
    * Scale: the per-(label, dim) rollup partial-aggregates map-side;
    * assembled vectors are |labels|·dims — broadcast-scale — and the
    * pair join is a |labels|² self-join of that tiny table. No shuffle
    * carries a raw vector.
    */
  def labelCentroidCosines(emb: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val e = emb.select(col(labelCol),
      posexplode(col(vecCol)).as(Seq("__dim", "__x")))
    val qx = floor(col("__x").cast("double") * lit(1000000.0)).cast(dec)
    val s = e.groupBy(col(labelCol), col("__dim"))
      .agg(sum(qx).cast("double").as("__s"))
    val n = emb.groupBy(col(labelCol)).agg(count(lit(1)).as("n"))
    val v = s.groupBy(col(labelCol))
      .agg(collect_list(struct(col("__dim"), col("__s"))).as("__p"))
      .select(col(labelCol),
        expr("transform(array_sort(__p), p -> p.__s)").as("__v"))
      .join(n, labelCol)
    val a = v.select(col(labelCol).as("label_a"), col("__v").as("__va"),
      col("n").as("n_a"))
    val b = v.select(col(labelCol).as("label_b"), col("__v").as("__vb"),
      col("n").as("n_b"))
    a.join(broadcast(b), col("label_a") < col("label_b"))
      .withColumn("__dot", expr(
        "aggregate(zip_with(__va, __vb, (x, y) -> x * y), 0D, (x, y) -> x + y)"))
      .withColumn("__na2", expr(
        "aggregate(transform(__va, x -> x * x), 0D, (x, y) -> x + y)"))
      .withColumn("__nb2", expr(
        "aggregate(transform(__vb, x -> x * x), 0D, (x, y) -> x + y)"))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        when(col("__na2") > 0 && col("__nb2") > 0,
          col("__dot") / (sqrt(col("__na2")) * sqrt(col("__nb2"))))
          .otherwise(lit(null).cast("double")).as("centroid_cos"))
  }

  /** Johnson–Lindenstrauss projection distortion audit: project the
    * embeddings down to `outDims` with the deterministic [[planeWeight]]
    * matrix (uniform in [-1, 1) ⇒ per-entry variance 1/3, so the
    * unbiased squared-distance estimator is `(3/outDims)·‖Pa − Pb‖²`)
    * and report, for every pair of a deterministic probe set, how far
    * the projected squared distance strays from the true one. This is
    * the acceptance gauge run before swapping a cheap projected index in
    * for full-width vectors (the JL lemma promises ratios near 1; the
    * audit measures the actual spread on YOUR data).
    *
    * Determinism: the projection and squared-distance folds accumulate
    * per-element terms in exact DECIMAL(38,12) via `graft_dsum` and
    * convert to double once — order- and engine-independent. (A plain
    * double fold is NOT oracle-safe here: DuckDB's `list_reduce` does
    * not accumulate strictly left-to-right on computed double lists —
    * observed 1-ULP drift vs the unrolled left chain — so any oracle
    * that hash-checks a raw 64-term double fold is betting on luck.
    * The sign-only LSH folds in [[lshBuckets]] are immune; exact-value
    * folds are not.) The remaining per-pair arithmetic is a short fixed
    * chain of IEEE ops identical in both engines.
    *
    * Scale: the probe set (`probeIds`, bounded) is filtered with id
    * pushdown, exploded to (id, dim, x) — |probe|·dims rows — and
    * everything after is O(|probe|²·dims) on tiny frames; the corpus is
    * touched once.
    */
  def jlDistortion(emb: DataFrame, idCol: String, vecCol: String,
      probeIds: Seq[Long], outDims: Int = 16, seed: Int = 7,
      dims: Int = 64): DataFrame = {
    require(outDims > 0 && outDims <= dims,
      s"jlDistortion: outDims must be in 1..$dims")
    require(probeIds.nonEmpty, "jlDistortion: empty probe set")
    val scale = 3.0 / outDims.toDouble
    def dsum(c: Column): Column =
      call_function("graft_dsum", c, lit(12))
    val ex = emb.filter(col(idCol).isin(probeIds: _*))
      .select(col(idCol).as("__id"),
        posexplode(col(vecCol)).as(Seq("__dim", "__x")))
      .select(col("__id"), col("__dim"),
        col("__x").cast("double").as("__xd"))
    // per-row projections: y_p = Σ_d x_d·w_pd, each term rounded into
    // DECIMAL(38,12) and summed exactly (element_at is 1-based;
    // scale 12 keeps the scaled sum below 2^53, where the decimal→double
    // finish is a single exact-int division both engines round identically)
    val ys = ex.groupBy(col("__id"))
      .agg(dsum(col("__xd") *
          element_at(array((0 until dims).map(d =>
            lit(planeWeight(seed, 0, d))): _*), col("__dim") + 1))
          .as("__y0"),
        (1 until outDims).map { p =>
          val w = array((0 until dims).map(d =>
            lit(planeWeight(seed, p, d))): _*)
          dsum(col("__xd") * element_at(w, col("__dim") + 1)).as(s"__y$p")
        }: _*)
    // exact pairwise original distance from the exploded form
    val ea = ex.toDF("__ida", "__dima", "__xa")
    val eb = ex.toDF("__idb", "__dimb", "__xb")
    val d2o = ea.join(eb,
        col("__dima") === col("__dimb") && col("__ida") < col("__idb"))
      .groupBy(col("__ida"), col("__idb"))
      .agg(dsum((col("__xa") - col("__xb")) * (col("__xa") - col("__xb")))
        .as("d2_orig"))
    val ya = ys.toDF(ys.columns.map(_ + "_a").toIndexedSeq: _*)
    val yb = ys.toDF(ys.columns.map(_ + "_b").toIndexedSeq: _*)
    val d2p = (0 until outDims).map { p =>
      val d = col(s"__y${p}_a") - col(s"__y${p}_b")
      d * d
    }.reduce(_ + _)
    d2o
      .join(broadcast(ya), col("__ida") === col("__id_a"))
      .join(broadcast(yb), col("__idb") === col("__id_b"))
      .select(col("__ida").as("id_a"), col("__idb").as("id_b"),
        col("d2_orig"), (d2p * lit(scale)).as("d2_proj"))
      .withColumn("ratio",
        when(col("d2_orig") > 0, col("d2_proj") / col("d2_orig"))
          .otherwise(lit(null).cast("double")))
  }

  /** Centroid silhouette — the clustering-quality audit in its
    * scale-honest form: the classic silhouette needs all pairwise
    * point-to-point distances (O(n²), dead at corpus size), so this uses
    * the standard centroid approximation — `a` = distance to the nearest
    * centroid (the assignment), `b` = distance to the second-nearest,
    * `s = (b − a) / max(a, b)` — one number per cluster telling you
    * which clusters are well-separated and which are mush. Centroids are
    * the `nClusters` lowest-id vectors (the [[ivfAssign]] seed
    * convention, SQL-replicable — no trained state in the oracle path).
    *
    * Determinism: squared distances fold per (point, centroid) through
    * exact `graft_dsum` DECIMAL(38,12) on the exploded dim join (the
    * [[jlDistortion]] discipline); sqrt / subtract / divide / compare
    * finish per point; per-cluster means accumulate the silhouettes in
    * decimal again.
    *
    * Scale: the dim-level join fans out n·dims·k rows but reduces
    * map-side into n·k sums; the per-point top-2 is a k-bounded sort
    * inside one row group; nothing collects, centroids broadcast.
    */
  def centroidSilhouette(emb: DataFrame, idCol: String, vecCol: String,
      nClusters: Int): DataFrame = {
    require(nClusters >= 2, "centroidSilhouette: need >= 2 clusters")
    // fail fast like the seedCentroids path instead of returning a
    // silently empty report when ids don't start at 0 (post-dedup or
    // hash-derived id spaces); one pushed-filter count, bounded work
    val nSeeds = emb.filter(col(idCol) < nClusters).count()
    require(nSeeds == nClusters,
      s"centroidSilhouette: needs $nClusters seed rows with $idCol in " +
        s"[0, $nClusters); found $nSeeds")
    import org.apache.spark.sql.expressions.Window
    def dsum(c: Column): Column = call_function("graft_dsum", c, lit(12))
    // r17: per-(point, centroid) squared distance as ONE graft_ddot fold
    // over the explicit difference vector — zip_with subtracts in double
    // exactly like the exploded (__x - __c) did, and the shared
    // Decimal128 kernel keeps each (x−c)² term's decimal rounding and
    // the accumulation bit-identical to the dsum aggregation this
    // replaces; the dims× fan-out and pair-keyed aggregate disappear.
    // The centroid set is nClusters rows — a bounded broadcast.
    val diff = expr(
      "zip_with(__v, __cv, (a, b) -> CAST(a AS DOUBLE) - CAST(b AS DOUBLE))")
    val d2 = emb.select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .crossJoin(broadcast(emb.filter(col(idCol) < nClusters)
        .select(col(idCol).as("__cid"), col(vecCol).as("__cv"))))
      .select(col("__id"), col("__cid"),
        call_function("graft_ddot", diff, diff, lit(12)).as("__d2"))
    val wPt = Window.partitionBy(col("__id"))
      .orderBy(col("__d2"), col("__cid"))
    val ranked = d2.withColumn("__rk", row_number().over(wPt))
      .filter(col("__rk") <= 2)
    val a = ranked.filter(col("__rk") === 1)
      .select(col("__id"), col("__cid").as("cluster"),
        sqrt(col("__d2")).as("__a"))
    val b = ranked.filter(col("__rk") === 2)
      .select(col("__id"), sqrt(col("__d2")).as("__b"))
    val sil = a.join(b, "__id")
      .select(col("cluster"),
        when(greatest(col("__a"), col("__b")) > 0,
          (col("__b") - col("__a")) / greatest(col("__a"), col("__b")))
          .otherwise(lit(0.0)).as("__s"))
    sil.groupBy(col("cluster"))
      .agg(count(lit(1)).as("n"),
        (dsum(col("__s")) / count(lit(1)).cast("double"))
          .as("mean_silhouette"),
        min(col("__s")).as("min_silhouette"),
        max(col("__s")).as("max_silhouette"))
  }

  /** kNN label-consistency audit ("confident learning" lite): for each
    * probe vector, the fraction of its k exact nearest neighbors (by
    * cosine, self excluded) sharing its label — rows near 0 are the
    * mislabeled/boundary candidates a label-cleaning pass reviews first.
    *
    * Determinism: cosines build from exact `graft_dsum` DECIMAL(38,12)
    * folds of the exploded dim join (the [[jlDistortion]] discipline) —
    * a raw double fold would let a 1-ULP cross-engine drift flip a
    * near-tie neighbor and change the reported fraction. Ranking ties
    * break on the neighbor id.
    *
    * Scale: probes are a bounded set (id-pushdown filter); the dim join
    * fans out |probe|·n·dims rows but reduces map-side into |probe|·n
    * sums; the per-probe top-k is a k-bounded window within one probe's
    * rows. The corpus scans once.
    */
  def labelConsistency(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, probeIds: Seq[Long], k: Int = 8): DataFrame = {
    require(probeIds.nonEmpty && k >= 1, "labelConsistency: probes, k >= 1")
    import org.apache.spark.sql.expressions.Window
    // r17: dots and norms fold per ROW through graft_ddot — the shared
    // Decimal128 kernel makes each fold bit-identical to the exploded-dim
    // graft_dsum aggregation this replaces (same per-term double→decimal
    // rounding, same order-free int128 accumulation), while the dims×
    // row fan-out, the dim-pairing join, and the pair-keyed hash
    // aggregate all disappear (q193: 3M exploded rows → 48k scalar folds)
    def ddot(a: Column, b: Column): Column =
      call_function("graft_ddot", a, b, lit(12))
    val base = emb.select(col(idCol).as("__id"), col(labelCol).as("__lbl"),
      col(vecCol).as("__v"))
    val withNorm = base.select(col("__id"), col("__lbl"), col("__v"),
      sqrt(ddot(col("__v"), col("__v"))).as("__norm"))
    val probes = withNorm.filter(col("__id").isin(probeIds: _*))
      .toDF("__pid", "__plbl", "__pv", "__pnorm")
    val cos = withNorm.join(broadcast(probes),
        col("__id") =!= col("__pid"))
      .select(col("__pid"), col("__plbl"), col("__id"), col("__lbl"),
        (ddot(col("__v"), col("__pv")) /
          (col("__pnorm") * col("__norm"))).as("__cos"))
    val wP = Window.partitionBy(col("__pid"))
      .orderBy(col("__cos").desc, col("__id"))
    cos.withColumn("__rk", row_number().over(wP))
      .filter(col("__rk") <= k)
      .groupBy(col("__pid").as("probe_id"), col("__plbl").as("probe_label"))
      .agg(count(lit(1)).as("k_found"),
        sum(when(col("__lbl") === col("__plbl"), 1L).otherwise(0L))
          .as("n_same_label"))
      .withColumn("consistency",
        col("n_same_label").cast("double") / col("k_found").cast("double"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk 2019): score a
    * cross-corpus pair not by raw cosine but by how much it stands out
    * against each side's OTHER nearest neighbors —
    * `margin(x,y) = cos(x,y) / (0.5·(rx + ry))`, where `rx`/`ry` are the
    * mean top-`kNeigh` cosines of x into the target side and y into the
    * source side. Hub vectors (close to everything) get discounted;
    * genuine translation/near-duplicate pairs across shards stand out.
    *
    * Determinism: cosines build from `graft_dsum` DECIMAL(38,12) folds
    * of the exploded dim join (dot and both norms), the top-k means
    * accumulate in decimal, and the margin is a fixed chain of IEEE ops.
    *
    * Scale: this exact form scores |S|·|T| pairs — the audit/recall-
    * ceiling configuration for bounded slices. The production path at
    * corpus size generates candidates first (LSH buckets or IVF probes,
    * [[annMultiProbe]]) and applies the same margin to candidates only;
    * the scoring plan is identical, only the pair source changes.
    */
  def marginMining(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, srcLabel: Int, tgtLabel: Int, kNeigh: Int = 4,
      topK: Int = 50): DataFrame = {
    require(kNeigh >= 1 && topK >= 1, "marginMining: kNeigh, topK >= 1")
    import org.apache.spark.sql.expressions.Window
    // r17: per-pair graft_ddot folds (bit-identical to the exploded-dim
    // dsum aggregation they replaced — shared Decimal128 kernel) over an
    // explicit bounded-slice cross join; the dims× fan-out, dim-pairing
    // join, and pair-keyed aggregate disappear. The cross join is this
    // exact form's documented shape (it always scored |S|·|T| pairs —
    // the dim equi-join was the same cartesian wearing a join key);
    // production uses [[marginMiningLsh]].
    def ddot(a: Column, b: Column): Column =
      call_function("graft_ddot", a, b, lit(12))
    def side(label: Int, pre: String): DataFrame =
      emb.filter(col(labelCol) === label)
        .select(col(idCol).as(s"${pre}id"), col(vecCol).as(s"${pre}v"),
          sqrt(ddot(col(vecCol), col(vecCol))).as(s"${pre}n"))
    // r18 (ADVICE): the broadcast of the target slice is size-GATED — a
    // label slice is corpus-proportional, and an unconditional broadcast
    // makes the local-mode assumption physical (driver/executor memory).
    // Under the broadcast threshold the hint keeps r17's plan; above it
    // the cartesian runs as a plain (shuffled) cross join — same |S|·|T|
    // pair count either way, that shape is this exact form's contract.
    val tgt = side(tgtLabel, "t_")
    val thr = emb.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val tgtEst =
      try tgt.queryExecution.optimizedPlan.stats.sizeInBytes
      catch { case _: Throwable => BigInt(Long.MaxValue) }
    val tgtSide = if (thr > 0 && tgtEst <= BigInt(thr)) broadcast(tgt) else tgt
    val cos = side(srcLabel, "s_")
      .crossJoin(tgtSide)
      .select(col("s_id"), col("t_id"),
        (ddot(col("s_v"), col("t_v")) /
          (col("s_n") * col("t_n"))).as("cos"))
    marginScore(cos, kNeigh, topK)
  }

  /** The margin-scoring tail shared by [[marginMining]] (exact all-pairs
    * cos) and [[marginMiningLsh]] (LSH candidates): per-side top-`kNeigh`
    * neighborhood means over whatever pair frame arrives, then the
    * Artetxe–Schwenk ratio. ONE copy — the exact and candidate paths must
    * rank identically given the same pairs. */
  private def marginScore(cos: DataFrame, kNeigh: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def dsum(c: Column): Column = call_function("graft_dsum", c, lit(12))
    val wS = Window.partitionBy(col("s_id"))
      .orderBy(col("cos").desc, col("t_id"))
    val wT = Window.partitionBy(col("t_id"))
      .orderBy(col("cos").desc, col("s_id"))
    val flagged = cos
      .withColumn("__rs", row_number().over(wS))
      .withColumn("__rt", row_number().over(wT))
    val rx = flagged.filter(col("__rs") <= kNeigh)
      .groupBy(col("s_id"))
      .agg((dsum(col("cos")) / count(lit(1)).cast("double")).as("__rx"))
    val ry = flagged.filter(col("__rt") <= kNeigh)
      .groupBy(col("t_id"))
      .agg((dsum(col("cos")) / count(lit(1)).cast("double")).as("__ry"))
    cos.join(broadcast(rx), "s_id").join(broadcast(ry), "t_id")
      .select(col("s_id"), col("t_id"), col("cos"),
        // guard the ratio like the file's other reports (embeddingDrift,
        // jlDistortion): a zero/negative neighborhood mean would put
        // NaN/Infinity margins at the top of the ranking — report null
        // instead, which desc ordering sorts last
        when((col("__rx") + col("__ry")) > 0.0,
          col("cos") / ((col("__rx") + col("__ry")) * lit(0.5)))
          .as("margin"))
      .orderBy(col("margin").desc, col("s_id"), col("t_id"))
      .limit(topK)
  }

  /** [[marginMining]]'s PRODUCTION form: candidates from shared LSH
    * buckets instead of the |S|·|T| cross product — the scale path the
    * exact form's scaladoc promises. Pairs come from one equi-join on the
    * random-hyperplane bucket ([[lshBuckets]]' deterministic planes, so
    * the oracle reproduces every sign bit); exact cosine (`graft_dot`
    * in-order fold) runs on candidates only; the scoring tail is
    * [[marginScore]], shared with the exact form.
    *
    * Neighborhood means `rx`/`ry` are computed over the CANDIDATE
    * neighbor sets (the standard mined-bitext approximation; the exact
    * form is the recall/ranking ceiling).
    *
    * Scale: candidate count is Θ(|S|·|T| / 2^planes) for near-uniform
    * buckets — `planes` is the knob that holds per-bucket occupancy flat
    * as the corpus grows (planes ≈ log₂(n/target_occupancy)); everything
    * else is linear in candidates. Measured (SCALE.md): at 10× data,
    * planes 8 → 11 restores sf0.1-level candidate density.
    */
  def marginMiningLsh(emb: DataFrame, idCol: String, vecCol: String,
      labelCol: String, srcLabel: Int, tgtLabel: Int, kNeigh: Int = 4,
      topK: Int = 50, planes: Int = 8, seed: Int = 42,
      dims: Int = 64): DataFrame = {
    require(kNeigh >= 1 && topK >= 1, "marginMiningLsh: kNeigh, topK >= 1")
    // norms are computed ONCE per row at scan time, not once per joined
    // candidate (each vector's self-dot would otherwise re-fold per pair
    // it appears in — 2 of every 3 dot products redundant); sqrt of the
    // same self-dot multiplied in the same order is bit-identical to the
    // per-pair cosine() form the oracle replays
    def side(label: Int, pre: String): DataFrame =
      emb.filter(col(labelCol) === label)
        .select(col(idCol).as(s"${pre}id"), col(vecCol).as(s"${pre}v"),
          norm(col(vecCol)).as(s"${pre}n"),
          bucketCol(vecCol, planes, seed, dims).as(s"${pre}bk"))
    val cos = side(srcLabel, "s_").join(side(tgtLabel, "t_"),
        col("s_bk") === col("t_bk"))
      .select(col("s_id"), col("t_id"),
        (dot(col("s_v"), col("t_v")) / (col("s_n") * col("t_n"))).as("cos"))
    marginScore(cos, kNeigh, topK)
  }
}
