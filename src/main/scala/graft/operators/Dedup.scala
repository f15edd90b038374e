package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document corpora, exact → fuzzy:
  *
  *  1. [[exactDedup]] — content-hash groupBy (one shuffle on the hash);
  *  2. [[minhashBands]] / [[lshCandidates]] — MinHash-LSH candidate
  *     generation (shuffle on band signature, O(collisions) pairs);
  *  3. [[jaccardVerify]] — exact shingle-set Jaccard on candidates only;
  *  4. [[simhashDedup]] — SimHash bucket grouping (near-dup by few-bit
  *     difference);
  *  5. embedding-cosine near-dup lives in [[Similarity.blockedPairs]].
  *
  * At 100 TB: every stage keys its shuffle on a hash/signature (uniformly
  * distributed — no skew), candidate verification touches only colliding
  * pairs, and nothing ever cross-joins.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per content hash. Returns one
    * row per distinct content: `(content_hash, keep_id, copies)` — join
    * back on `md5(text)` (or semi-join `keep_id`) to materialize the
    * deduped corpus. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(col(textCol))
    docs.select(col(idCol), h.as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))
  }

  /** (id, band, signature) rows: `bands` bands of `rows` minhashes each,
    * md5-based (engine-portable). All `bands*rows` seed minima come from
    * ONE fused pass over the tokens (native `graft_minhash` expression,
    * expressions/MinHash.scala) — no per-seed interpreted HOF re-walks.
    * The array is still materialized behind a repartition barrier so
    * CollapseProject cannot inline the expression into each band consumer.
    */
  def minhashBands(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 2, rows: Int = 2): DataFrame = {
    val k = bands * rows
    // signatures compute scan-side, THEN shuffle: the exchange carries
    // fixed-width signatures (~128 B/doc), never raw text, and doubles as
    // the barrier keeping graft_minhash materialized once rather than
    // re-inlined per band consumer (PlanSpec)
    val sigDf = docs
      .filter(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).as("__id"),
        call_function("graft_minhash", split(col(textCol), " "), lit(k)).as("mha"))
      .repartition(col("__id"))
    val bandStructs = (0 until bands).map { b =>
      val sig = concat((1 to rows).map(r => element_at(col("mha"), b * rows + r)): _*)
      struct(lit(b).as("band"), sig.as("mh"))
    }
    sigDf.select(col("__id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("__id").as(idCol), col("b.band").as("band"), col("b.mh").as("mh"))
  }

  /** Candidate pairs from band collisions: one equi-join on (band, mh). */
  def lshCandidates(bandsDf: DataFrame, idCol: String): DataFrame = {
    val a = bandsDf.select(col(idCol).as("d1"), col("band"), col("mh"))
    val b = bandsDf.select(col(idCol).as("d2"), col("band").as("band2"), col("mh").as("mh2"))
    a.join(b, col("band") === col("band2") && col("mh") === col("mh2") &&
        col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
  }

  /** Exact 3-shingle Jaccard for candidate pairs (integers → deterministic
    * division). Shingle sets travel as distinct 64-bit hashes (native
    * `graft_shingle_hash`, one fused pass) — |A∩B| and |A∪B| are identical
    * to the string-set counts barring 64-bit collisions (~1e-13 per pair),
    * and the joins shuffle long arrays instead of rebuilt shingle strings.
    */
  def jaccardVerify(docs: DataFrame, candidates: DataFrame,
      idCol: String, textCol: String, threshold: Double): DataFrame = {
    // self-join form: BOTH pair sides read the same shingle sets — pin
    // the (id, hashed-shingle-array) frame so the corpus tokenizes and
    // shingle-hashes once per run instead of once per side (r18; the
    // setSimJoin `tokens` discipline)
    val sh = graft.core.Stats.PlanCache.register(
      docs.select(col(idCol).as("__vid"),
        call_function("graft_shingle_hash", split(col(textCol), " "))
          .as("__vsh")))
    verifyFromShingles(
      sh.select(col("__vid").as("xid"), col("__vsh").as("sh1")),
      sh.select(col("__vid").as("yid"), col("__vsh").as("sh2")),
      candidates, threshold)
  }

  /** Two-frame form of [[jaccardVerify]] — each pair side brings its own
    * shingle-set source (the cross-corpus case, where the corpora may
    * even share id values). ONE copy of the verification convention:
    * the self-join form above delegates to the same tail. */
  private def jaccardVerifyTwoSided(docsX: DataFrame, docsY: DataFrame,
      candidates: DataFrame, idCol: String, textCol: String,
      threshold: Double): DataFrame =
    verifyFromShingles(
      docsX.select(col(idCol).as("xid"),
        call_function("graft_shingle_hash", split(col(textCol), " "))
          .as("sh1")),
      docsY.select(col(idCol).as("yid"),
        call_function("graft_shingle_hash", split(col(textCol), " "))
          .as("sh2")),
      candidates, threshold)

  private def verifyFromShingles(x: DataFrame, y: DataFrame,
      candidates: DataFrame, threshold: Double): DataFrame = {
    val inter = size(array_intersect(col("sh1"), col("sh2")))
    val union = size(array_distinct(concat(col("sh1"), col("sh2"))))
    candidates
      .join(x, col("xid") === col("d1"))
      .join(y, col("yid") === col("d2"))
      .select(col("d1"), col("d2"), (inter.cast("double") / union).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental-ingest near-dup check: for each NEW document, the
    * EXISTING documents it near-duplicates — the cross-corpus form of the
    * LSH pipeline (a fresh crawl against the standing corpus), which the
    * intra-corpus self-join family cannot express: [[lshCandidates]]'
    * `d1 < d2` dedup would drop half the cross pairs and the self-join
    * would waste time on new×new and old×old collisions nobody asked for.
    *
    * Bands compute per side ([[minhashBands]] — signatures shuffle, text
    * never does), candidates are ONE new×old equi-join on `(band, mh)`,
    * and verification is exact shingle Jaccard on candidates only, each
    * side bringing its own shingle-set source (so the two corpora may
    * even share id values). Output: `(new_id, old_id, jaccard)`.
    *
    * Scale: the old side's bands are a materialize-once artifact in a
    * real pipeline — band rows are tiny (id + ~32 B), so the standing
    * corpus index is a fraction of corpus bytes and the per-crawl cost
    * is bands(new) + one equi-join + candidate verification.
    */
  def crossCorpusNearDups(newDocs: DataFrame, oldDocs: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.6): DataFrame = {
    val nb = minhashBands(newDocs, idCol, textCol)
      .select(col(idCol).as("d1"), col("band"), col("mh"))
    val ob = minhashBands(oldDocs, idCol, textCol)
      .select(col(idCol).as("d2"), col("band").as("band2"),
        col("mh").as("mh2"))
    val cand = nb.join(ob,
        col("band") === col("band2") && col("mh") === col("mh2"))
      .select(col("d1"), col("d2")).distinct()
    // the SHARED verification convention (jaccardVerifyTwoSided) — a
    // drifting copy here would silently diverge the cross-corpus path
    jaccardVerifyTwoSided(newDocs, oldDocs, cand, idCol, textCol, threshold)
      .select(col("d1").as("new_id"), col("d2").as("old_id"),
        col("jaccard"))
  }

  /** Edit-distance verify for candidate pairs: exact Levenshtein distance,
    * computed ONLY on pairs the LSH front end surfaced — never all-pairs
    * (Levenshtein is O(len²) per pair; the candidate restriction is what
    * makes it affordable, same two-stage shape as [[jaccardVerify]]).
    * Integer output — bit-exact across engines by construction. Keeps
    * pairs with distance ≤ `maxDist`.
    *
    * Complements [[jaccardVerify]]: Jaccard on shingle SETS ignores word
    * order and local edits; Levenshtein is the character-level ground
    * truth for "same document modulo small edits".
    */
  def editDistanceVerify(docs: DataFrame, candidates: DataFrame,
      idCol: String, textCol: String, maxDist: Int): DataFrame = {
    val x = docs.select(col(idCol).as("xid"), col(textCol).as("t1"))
    val y = docs.select(col(idCol).as("yid"), col(textCol).as("t2"))
    // the banded DP dwarfs everything else here (len·maxDist per pair vs
    // 16-byte candidate rows), so an unconditional round-robin spread is
    // cheap insurance against AQE coalescing a small candidate set onto
    // one core (r17; the exchange is noise at any candidate volume)
    candidates.repartition(
        candidates.sparkSession.sparkContext.defaultParallelism)
      .join(x, col("xid") === col("d1"))
      .join(y, col("yid") === col("d2"))
      // |len(a)-len(b)| lower-bounds the distance — prune before the DP;
      // the 3-arg levenshtein runs the BANDED O(len·maxDist) DP (exact
      // when ≤ maxDist, -1 beyond), not the full O(len²) matrix
      .filter(abs(length(col("t1")) - length(col("t2"))) <= maxDist)
      .select(col("d1"), col("d2"),
        levenshtein(col("t1"), col("t2"), maxDist).cast("long")
          .as("edit_dist"))
      .filter(col("edit_dist") >= 0)
  }

  /** SimHash near-dup grouping: docs sharing a signature bucket. For
    * few-bit tolerance, join on rotated signatures or band the bits — here
    * exact-bucket grouping (hamming distance 0 within bucket). */
  def simhashDedup(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 16): DataFrame =
    docs.select(col(idCol), TextAnalysis.simhash(col(textCol), bits).as("simhash"))
      .groupBy(col("simhash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** Hamming-tolerant SimHash near-dup pairs via pigeonhole banding: split
    * the `bits`-bit signature into `maxHamming + 1` contiguous bands; two
    * signatures within hamming distance `maxHamming` differ in at most
    * `maxHamming` bands, so they agree EXACTLY on at least one band — the
    * equi-join on (band, bandBits) is guaranteed-complete while touching
    * only colliding candidates, never all pairs. False candidates (same
    * band, far apart elsewhere) are pruned by the exact popcount check.
    *
    * At 100 TB: one shuffle on (band, bandBits) — md5-vote signatures make
    * the band key near-uniform (no skew) — then a distinct on the pair.
    * This is the scalable alternative the hamming-0 [[simhashDedup]]
    * bucket-group can't offer: tolerance without rotations or all-pairs.
    */
  def simhashNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      bits: Int = 16, maxHamming: Int = 3): DataFrame = {
    // explicit null filter + coalesce makes the signature NON-NULLABLE:
    // otherwise the null-intolerant band join infers isnotnull(bandBits),
    // which pushes down as isnotnull(graft_simhash(...)) and evaluates the
    // whole expensive expression once in a Filter and AGAIN in the Project
    // — 4 evals per doc instead of 2 (seen in .explain("formatted"))
    val sigs = docs
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).as("__sig_id"),
        coalesce(TextAnalysis.simhash(col(textCol), bits), lit(0L))
          .as("__sig"))
    hammingNearDupPairs(sigs, "__sig_id", "__sig", bits, maxHamming)
  }

  /** Hamming-tolerant pair join over ANY per-row `bits`-wide hash column
    * — the pigeonhole banding [[simhashNearDupPairs]] introduced,
    * factored out so other fixed-width signatures (e.g. the raster
    * perceptual hashes, `graft_ppm_phash`) reuse the ONE implementation:
    * split the hash into `maxHamming + 1` equal bands; two hashes within
    * `maxHamming` must agree on at least one whole band (pigeonhole), so
    * the band equi-join is guaranteed-complete and the exact popcount
    * filter on candidates only discards. Null ids/hashes are excluded
    * (a null hash matches nothing).
    *
    * Scale: hashes shuffle (8 B/row·band), never payloads; the join keys
    * on (band, bits) — uniform; a pair colliding in several bands emits
    * from its lowest band only (per-row filter, no distinct shuffle).
    */
  def hammingNearDupPairs(hashes: DataFrame, idCol: String,
      hashCol: String, bits: Int, maxHamming: Int): DataFrame = {
    val nBands = maxHamming + 1
    require(bits % nBands == 0,
      s"bits ($bits) must split evenly into maxHamming+1 = $nBands bands")
    require(bits >= nBands && bits <= 64,
      s"bits must be in [$nBands, 64], got $bits")
    val w = bits / nBands
    // w can be 64 (bits=64, maxHamming=0): Scala's shift wraps mod 64,
    // so (1L<<64)-1 would be 0 and every band key would collapse to the
    // SAME bucket — a silent full cross join
    def mask(width: Int): Long = if (width >= 64) -1L else (1L << width) - 1
    val sigs = hashes
      .filter(col(idCol).isNotNull && col(hashCol).isNotNull)
      // mask to the declared width: a signed narrower hash (int with
      // bits=32) would sign-extend through the long cast and inflate
      // hamming distances past the tolerance. coalesce post-filter is a
      // no-op that flips nullability — without it the null-intolerant
      // band join infers isnotnull(bb) and re-evaluates an expensive
      // hash expression in a pushed-down Filter AND the Project (the
      // 4-evals-vs-2 regression the simhash path documented)
      .select(col(idCol).as("__id"),
        coalesce(col(hashCol).cast("long").bitwiseAND(lit(mask(bits))),
          lit(0L)).as("sh"))
      .repartition(col("__id")) // barrier: one fused hash eval per row
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("sh"), b * w).bitwiseAND(lit(mask(w))).as("bb"))
    }
    val banded = sigs
      .select(col("__id"), col("sh"), explode(array(bandCols: _*)).as("bk"))
      .select(col("__id"), col("sh"), col("bk.band").as("band"), col("bk.bb").as("bb"))
    val lhs = banded.select(col("__id").as("d1"), col("sh").as("sh1"),
      col("band"), col("bb"))
    val rhs = banded.select(col("__id").as("d2"), col("sh").as("sh2"),
      col("band").as("band2"), col("bb").as("bb2"))
    // canonical-band dedup: a pair colliding in several bands is emitted
    // ONLY from its lowest colliding band — for every lower band the bits
    // must differ. A per-row filter over the two signatures, replacing a
    // distinct() that would shuffle every matched pair (the dominant cost
    // on dup-heavy corpora where identical signatures collide in ALL bands)
    val lowestCollidingBand = (0 until nBands).map { b =>
      val m = lit(mask(w))
      (lit(b) >= col("band")) ||
        (shiftright(col("sh1"), b * w).bitwiseAND(m) =!=
          shiftright(col("sh2"), b * w).bitwiseAND(m))
    }.reduce(_ && _)
    lhs.join(rhs, col("band") === col("band2") && col("bb") === col("bb2") &&
        col("d1") < col("d2"))
      .filter(lowestCollidingBand)
      .select(col("d1"), col("d2"),
        bit_count(col("sh1").bitwiseXOR(col("sh2"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Apply a keeper assignment: keep exactly the rows whose id IS a
    * keep_id — the materialization stage after [[exactDedup]] /
    * [[simhashDedup]] (or any (keep_id, ...) frame). One broadcast-or-
    * shuffle semi join on the id; no row ever collects to the driver. */
  def applyDedup(docs: DataFrame, keepers: DataFrame, idCol: String): DataFrame =
    docs.join(keepers.select(col("keep_id").as(idCol)).distinct(),
      Seq(idCol), "left_semi")

  /** End-to-end near-dup removal: LSH candidates → exact Jaccard verify →
    * union-find-free keeper choice (keep the smallest id of each verified
    * duplicate pair's closure, approximated by one pass: drop any doc that
    * verifies as a duplicate of a smaller id). For chains a<b<c where only
    * (a,b) and (b,c) verify, c is dropped via b even though (a,c) never
    * verified — the standard single-pass approximation; exact transitive
    * closure needs iterative connected components (graph layer, out of
    * scope here). */
  def nearDedup(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, bands: Int = 2, rows: Int = 2): DataFrame = {
    val verified = jaccardVerify(docs,
      lshCandidates(minhashBands(docs, idCol, textCol, bands, rows), idCol),
      idCol, textCol, threshold)
    // d1 < d2 by construction → d2 is always the duplicate to drop
    docs.join(verified.select(col("d2").as(idCol)).distinct(),
      Seq(idCol), "left_anti")
  }

  /** Connected components over candidate duplicate pairs: min-label
    * propagation to fixpoint. Returns `(id, cluster_id)` for every node
    * that appears in a pair, where `cluster_id` is the smallest id
    * reachable through the pair graph — the exact transitive closure the
    * single-pass [[nearDedup]] approximates (a<b<c chains where only
    * (a,b),(b,c) verified collapse into one cluster keyed by a).
    *
    * Scale: duplicate graphs are squat — clusters are near-cliques from
    * LSH banding, so the diameter (= iteration count) is small; each
    * iteration is one edge⋈label shuffle + a min groupBy, both keyed on
    * uniformly-hashed ids. Lineage is cut per iteration
    * ([[graft.core.Checkpoints.pin]]: executor-local by default,
    * reliable under `spark.graft.checkpointDir`) so the plan does not
    * grow with iterations, and
    * convergence is detected with one small count per round. For
    * adversarially long path graphs, the large-star/small-star variant
    * halves diameter per round; duplicate clusters do not need it.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "d1",
      bCol: String = "d2", maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col(aCol).cast("long").as("src"),
        col(bCol).cast("long").as("dst"))
      .union(pairs.select(col(bCol).cast("long"), col(aCol).cast("long")))
      .distinct()
    val pinnedEdges = graft.core.Checkpoints.pin(edges)
    // labels only ever DECREASE (min over a set containing the old label),
    // so sum(cluster_id) is strictly monotone until fixpoint — an agg on
    // the fresh labels alone detects convergence with no labels⋈labels
    // join. DECIMAL(38,0) accumulation: ids from a 64-bit hash space over
    // millions of nodes overflow a long sum (ANSI mode would abort the
    // query mid-iteration; wraparound would void the monotonicity
    // argument entirely).
    def checksum(l: org.apache.spark.sql.DataFrame): BigDecimal =
      BigDecimal(l.agg(coalesce(
          sum(col("cluster_id").cast(org.apache.spark.sql.types
            .DecimalType(38, 0))), lit(0).cast(org.apache.spark.sql.types
            .DecimalType(38, 0))))
        .collect()(0).getDecimal(0))
    // the seed pin and its checksum job sit INSIDE the guarded region:
    // a failure there must still release whatever got pinned
    var labels: org.apache.spark.sql.DataFrame = null
    var prevSum = BigDecimal(0)
    var iter = 1
    var converged = false
    try {
      // seed = iteration one computed directly on edges: min(id, neighbors)
      labels = graft.core.Checkpoints.pin(
        pinnedEdges.groupBy(col("src"))
          .agg(least(min(col("dst")), col("src")).as("cluster_id"))
          .select(col("src").as("id"), col("cluster_id")))
      prevSum = checksum(labels)
      while (!converged && iter < maxIter) {
        // each node adopts min(own label, labels seen from its neighbors)
        val fromNbrs = pinnedEdges
          .join(labels.select(col("id").as("src"), col("cluster_id")), "src")
          .select(col("dst").as("id"), col("cluster_id"))
        val next = graft.core.Checkpoints.pin(
          labels.select(col("id"), col("cluster_id"))
            .union(fromNbrs)
            .groupBy("id").agg(min("cluster_id").as("cluster_id")))
        // the old front is superseded the moment the new pin materializes
        // (pin is eager): release it, or the checkpoint dir / block store
        // grows by one full label copy per iteration. `labels` must point
        // at the NEW front before the old one is released — if release
        // throws, the catch block frees whatever `labels` holds, and that
        // must be the still-pinned new front, not the half-released old one
        val old = labels
        labels = next
        graft.core.Checkpoints.release(old)
        val s = checksum(labels)
        converged = s == prevSum
        prevSum = s
        iter += 1
      }
      if (!converged) throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter iterations")
    } catch { case t: Throwable =>
      // abnormal exit (seed/checksum failure, mid-iteration failure, or
      // non-convergence): the in-flight front has no consumer left —
      // release it, or its checkpoint dir / block store leaks past the
      // failed call
      if (labels != null) {
        try graft.core.Checkpoints.release(labels)
        catch { case e: Throwable => t.addSuppressed(e) }
      }
      throw t
    } finally graft.core.Checkpoints.release(pinnedEdges)
    // the FINAL front stays pinned — it backs the returned DataFrame.
    // Its storage is caller-owned: a long-lived session issuing many
    // calls can Checkpoints.release(result) once consumers are done.
    labels
  }

  /** End-to-end cluster dedup: LSH candidates → exact-Jaccard verify →
    * connected components → keep ONLY the cluster-minimum document of each
    * verified duplicate cluster (docs in no verified pair are kept as
    * their own singleton cluster). */
  def clusterDedup(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double, bands: Int = 2, rows: Int = 2): DataFrame = {
    val verified = jaccardVerify(docs,
      lshCandidates(minhashBands(docs, idCol, textCol, bands, rows), idCol),
      idCol, textCol, threshold)
    val clusters = connectedComponents(verified)
    val drops = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    docs.join(drops, Seq(idCol), "left_anti")
  }

  /** Exact Jaccard-threshold set-similarity self-join WITHOUT LSH — the
    * prefix-filtering (AllPairs/PPJoin-family) algorithm: a pair can reach
    * Jaccard ≥ t only if it shares at least one token in each side's
    * PREFIX, where the prefix holds the globally RAREST
    * `|set| - ceil(t·|set|) + 1` tokens of the set under a
    * document-frequency ordering. Candidates come from an equi-join on
    * prefix tokens; exact Jaccard verifies every candidate, so the output
    * is exactly the brute-force all-pairs result (the oracle IS the brute
    * force) with none of MinHash-LSH's probabilistic recall.
    *
    * Scale shape: document frequency is one shuffle on the token (uniform
    * key space); the per-doc frequency sort is local (each doc sorts its
    * own tokens); the candidate join keys on PREFIX tokens — by
    * construction the rarest tokens in each document, so stopwords never
    * become join keys and the candidate count stays near the true pair
    * count; verification touches candidates only. Both completeness
    * bounds (prefix length, size-ratio prune) take a 1e-9 slack so double
    * rounding can only ADD candidates, never drop a boundary pair —
    * exactness lives in the verify stage.
    *
    * Complements [[lshCandidates]]: LSH scales to lower thresholds but
    * misses pairs probabilistically; prefix filtering is exact and
    * shines at high thresholds (t ≥ ~0.5) where prefixes are short.
    */
  def setSimJoin(docs: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, shingle: Int = 3): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1, "minJaccard must be in (0,1]")
    val t = minJaccard
    // the SET is the distinct `shingle`-gram set (shingle=1: distinct
    // unigrams), carried as 64-bit hashes end-to-end (`graft_shingle_hash`,
    // one fused pass): the df shuffle, the prefix join, and the verify
    // arrays all move longs instead of rebuilt shingle strings (~4× less
    // shuffle; |A∩B|/|A∪B| equals the string-set Jaccard barring 64-bit
    // collisions, ~1e-13/pair — the [[jaccardVerify]] convention). Any
    // total order works for prefix filtering as long as it is global;
    // (df, hash) is the one used here. Docs too short for a single
    // shingle get the empty set and can never pair.
    // three consumers (the exploded candidate pipeline + both verify
    // sides) — pinned so the corpus is tokenized+hashed once per run,
    // not three times (r17; the pin is (id, long-array) rows, far
    // smaller than the text)
    val tokens = graft.core.Stats.PlanCache.register(
      graft.core.Spread.narrow(docs.select(col(idCol), col(textCol)))
        .select(col(idCol).as("__id"),
          call_function("graft_shingle_hash", split(col(textCol), " "),
            lit(shingle)).as("tk")))
    val toks = tokens.select(col("__id"), size(col("tk")).as("s"),
      explode(col("tk")).as("tok"))
    val dfreq = toks.groupBy(col("tok")).agg(count(lit(1)).as("__df"))
    // per-doc tokens ordered rarest-first (df asc, token asc): local sort
    // of each doc's own tokens after the df join
    val sorted = toks.join(dfreq, "tok")
      .groupBy(col("__id"), col("s"))
      .agg(sort_array(collect_list(struct(col("__df"), col("tok")))).as("st"))
    // prefix length p = s - ceil(t*s) + 1; the -1e-9 makes ceil round DOWN
    // on exact integer boundaries under double error (longer prefix = safe)
    val p = (col("s") - ceil(col("s") * t - 1e-9) + 1).cast("int")
    // both join sides read the prefix — pinned so the df join + per-doc
    // sort + slice runs once per run instead of twice (r17)
    val prefix = graft.core.Stats.PlanCache.register(
      sorted.select(col("__id"), col("s"),
        posexplode(slice(col("st"), lit(1), p)).as(Seq("pos0", "pt")))
      .select(col("__id"), col("s"), (col("pos0") + 1).as("pos"),
        col("pt.tok").as("tok")))
    val lhs = prefix.select(col("tok"), col("__id").as("d1"),
      col("s").as("s1"), col("pos").as("pos1"))
    val rhs = prefix.select(col("tok").as("tok2"), col("__id").as("d2"),
      col("s").as("s2"), col("pos").as("pos2"))
    // J >= t forces t*max(s1,s2) <= min(s1,s2); slack keeps the prune safe
    val raw = lhs.join(rhs, col("tok") === col("tok2") &&
        col("d1") < col("d2") &&
        col("s2").cast("double") >= col("s1") * t - 1e-9 &&
        col("s1").cast("double") >= col("s2") * t - 1e-9)
    // PPJoin positional filter, exact: both docs sort by the SAME global
    // order, so their common tokens appear in the same relative order and
    // min(pos1) identifies the pair's FIRST common token. At that first
    // match nothing earlier is shared, so |A∩B| <= 1 + min(s1-pos1,
    // s2-pos2); J >= t needs |A∩B| >= t/(1+t)·(s1+s2). The min-struct
    // aggregation replaces the distinct() (same shuffle) and the filter
    // prunes candidates whose shared tokens sit too deep to ever reach
    // the overlap bar.
    val m = min(struct(col("pos1"), col("pos2"), col("s1"), col("s2"))).as("m")
    val cands = raw.groupBy(col("d1"), col("d2")).agg(m)
      .filter(lit(1.0) +
        least(col("m.s1") - col("m.pos1"), col("m.s2") - col("m.pos2")) >=
        (col("m.s1") + col("m.s2")) * (t / (1 + t)) - 1e-9)
      .select(col("d1"), col("d2"))
    val x = tokens.select(col("__id").as("xid"), col("tk").as("tk1"))
    val y = tokens.select(col("__id").as("yid"), col("tk").as("tk2"))
    val inter = size(array_intersect(col("tk1"), col("tk2")))
    val uni = size(col("tk1")) + size(col("tk2")) - inter
    cands
      .join(x, col("xid") === col("d1"))
      .join(y, col("yid") === col("d2"))
      .select(col("d1"), col("d2"),
        (inter.cast("double") / uni).as("jaccard"))
      .filter(col("jaccard") >= t)
  }

  /** Corpus-global exact chunk dedup — the paragraph-granularity exact
    * substring pass (cf. "deduplicating training data" pipelines): split
    * every document into consecutive `chunkTokens`-token chunks, keep only
    * the globally FIRST occurrence of each distinct chunk (ordered by
    * `(id, position)`), and reassemble each document from its surviving
    * chunks in original order. Unlike [[Decontam.removeCommonUnits]]
    * (drop units above a document-frequency threshold everywhere), this
    * keeps one canonical copy of repeated material.
    *
    * Output: `(id, cleaned, n_kept, n_dropped)`; a document whose every
    * chunk appeared earlier elsewhere comes back with `cleaned = ""`.
    *
    * Scale: first-occurrence discovery is `min(struct(id, pos))` grouped
    * by chunk — partial-aggregatable, so a viral chunk's million
    * occurrences reduce map-side and the shuffle carries one row per
    * distinct chunk per input partition (no window over the raw
    * occurrences, which would serialize hot chunks through one task).
    * The join back on the chunk key and the per-document reassembly
    * groupBy are the only other shuffles; the per-doc ordering sort is
    * array_sort over that document's own chunks, never global.
    */
  def chunkDedupGlobal(docs: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int): DataFrame = {
    val c = chunkTokens
    require(c >= 1, "chunkTokens must be >= 1")
    // size(tk) >= 1 always (split of "" is [""]), so the sequence upper
    // bound ceil(size/c)-1 >= 0 and never triggers descending generation.
    // chunks feeds THREE consumers (first-occurrence agg, the kept join,
    // the per-doc chunk count): the bounded PlanCache pins it so the
    // corpus is scanned and re-chunked once, not three times — the
    // containmentScored discipline.
    val chunks = graft.core.Stats.PlanCache.register(docs
      .select(col(idCol), split(col(textCol), " ").as("tk"))
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(tk) / $c.0) as int) - 1), " +
          s"i -> array_join(slice(tk, i * $c + 1, $c), ' '))"))
        .as(Seq("pos", "chunk"))))
    val first = chunks.groupBy(col("chunk"))
      .agg(min(struct(col(idCol), col("pos"))).as("f"))
    val kept = chunks.join(first, "chunk")
      .filter(col(s"f.$idCol") === col(idCol) && col("f.pos") === col("pos"))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("chunk")))),
          x => x.getField("chunk"))).as("cleaned"),
        count(lit(1)).as("n_kept"))
    chunks.groupBy(col(idCol)).agg(count(lit(1)).as("__n_chunks"))
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("cleaned"), lit("")).as("cleaned"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__n_chunks") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Sorted-neighborhood dedup: rank every document by a sort key that
    * clusters near-duplicates (here the text itself — shared prefixes
    * sort adjacent), then verify ONLY pairs within `window` rank
    * positions of each other. The third classic candidate scheme next to
    * LSH banding (probabilistic) and prefix filtering (set-overlap):
    * O(n·window) candidates instead of O(n²), catches prefix-anchored
    * near-dups that minhash banding can miss on short docs, and misses
    * dups whose edits start at token 0 — which is why production
    * pipelines run it as ONE pass of a multi-pass blocking union.
    *
    * Returns `(d1, d2, jaccard)` for neighbor pairs with exact shingle
    * Jaccard ≥ `threshold` (d1 < d2).
    *
    * Scale shape: the rank comes from [[Ranking.globalRowNumber]] (range-
    * partition + per-partition rank + offset join — NO single global
    * window task), and the neighbor join is an EQUI-join: each row
    * explodes its rank to `rn+1 … rn+window` target ranks, so candidate
    * generation is a uniform-key hash join, not a range join. The verify
    * stage reuses [[jaccardVerify]] — exact Jaccard touches only the
    * O(n·window) neighbor pairs.
    */
  def sortedNeighborhood(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 3, threshold: Double = 0.4): DataFrame = {
    require(window >= 1, "sortedNeighborhood: window must be >= 1")
    val ranked = Ranking.globalRowNumber(
        docs.select(col(idCol), col(textCol)),
        Seq(col(textCol), col(idCol)), "rn")
      .select(col(idCol), col("rn"))
    // left side fans out to its `window` successors; equi-join on the rank
    val probes = ranked.select(col(idCol).as("d1"),
      explode(sequence(col("rn") + 1, col("rn") + window)).as("rn"))
    val cand = probes.join(ranked.select(col(idCol).as("d2"), col("rn")), "rn")
      .select(least(col("d1"), col("d2")).as("d1"),
        greatest(col("d1"), col("d2")).as("d2"))
    jaccardVerify(docs, cand, idCol, textCol, threshold)
  }

  /** MinHash calibration report: for every LSH candidate pair, the
    * signature-estimated Jaccard (fraction of the `bands·rows` component
    * minima that agree — the unbiased MinHash estimator, a k-step
    * quantized value) next to the exact shingle-set Jaccard. This is the
    * measurement that justifies trusting the estimate at scales where
    * exact verification of every pair is unaffordable: run it on a
    * sample, read off the estimator error, pick band/row counts.
    *
    * Both numbers are exact integer ratios — engine-portable without
    * rounding. Scale shape: candidates come from band collisions (never
    * all-pairs); signatures join back by doc id (uniform key); the exact
    * Jaccard reuses [[jaccardVerify]] on the candidate set only.
    */
  def minhashEstimateVsExact(docs: DataFrame, idCol: String, textCol: String,
      bands: Int = 2, rows: Int = 2): DataFrame = {
    val k = bands * rows
    val sigs = docs
      .filter(size(split(col(textCol), " ")) >= 3)
      .select(col(idCol).as("__sid"),
        call_function("graft_minhash", split(col(textCol), " "), lit(k)).as("sig"))
    val cand = lshCandidates(minhashBands(docs, idCol, textCol, bands, rows), idCol)
    val est = cand
      .join(sigs.select(col("__sid").as("d1"), col("sig").as("s1")), "d1")
      .join(sigs.select(col("__sid").as("d2"), col("sig").as("s2")), "d2")
      .select(col("d1"), col("d2"),
        (expr("aggregate(zip_with(s1, s2, (x, y) -> IF(x = y, 1, 0)), " +
          "0, (a, x) -> a + x)").cast("double") / k).as("est_jaccard"))
    est.join(jaccardVerify(docs, cand, idCol, textCol, 0.0), Seq("d1", "d2"))
  }

  /** Substring-window duplicate detection: every document's sliding
    * `windowTokens`-token windows are hashed, any window occurring more
    * than once in the corpus is duplicated, and each document reports how
    * much of it is covered by duplicated windows. This is the Spark shape
    * of suffix-array exact substring dedup (Lee et al. 2021,
    * "Deduplicating Training Data Makes Language Models Better"): instead
    * of one machine-wide suffix array, the corpus becomes a distributed
    * multiset of window hashes — the same "this 50-token span exists
    * elsewhere" verdict, computed with two uniform-key shuffles. Distinct
    * from [[chunkDedupGlobal]], whose non-overlapping chunks miss
    * duplicates that straddle chunk boundaries; sliding windows catch any
    * duplicated run of `windowTokens` or more tokens at any offset.
    *
    * `sampleMod > 1` turns on winnowing-style CONTENT-DEFINED sampling:
    * a window is kept iff its own hash selects it (first md5 hex digit
    * value ≡ 0 mod `sampleMod`), thinning the stream ~`sampleMod`-fold.
    * Sampling by the window's content — never by its position — is what
    * keeps the verdict sound: an identical window is kept in every
    * document it appears in or in none, so duplicates stay mutually
    * visible. (A positional stride would sample the same duplicated run
    * at different phases in differently-aligned documents and could never
    * match them.) The per-document fractions become unbiased estimates
    * over the ~1/`sampleMod` kept windows.
    *
    * Output: one row per input document —
    * `(id, n_windows, n_dup_windows, dup_frac)` over the kept windows;
    * documents shorter than one window come back with zero windows and
    * `dup_frac = 0.0`.
    *
    * Scale: the exploded stream carries `(id, md5)` pairs — 32-byte
    * hashes, never window text — and the selection filter runs inside the
    * same codegen stage as the explode, so `sampleMod` divides the
    * SHUFFLE volume (the real bottleneck; the paper's corpora tolerate
    * aggressive thinning because real duplicated runs are much longer
    * than one window). The corpus is scanned and exploded ONCE: the
    * occurrence stream partial-aggregates map-side into `(hash, id)`
    * rollup rows (a viral window's million within-document repeats
    * collapse before the shuffle), per-hash totals come from one window
    * over that rollup — the same rollup-then-window shape as the exact
    * quantile family, sized by distinct (window, document) pairs, never
    * raw occurrences — and the per-document rollup is the only other
    * shuffle. No join, nothing global, nothing driver-side.
    */
  def windowDedup(docs: DataFrame, idCol: String, textCol: String,
      windowTokens: Int, sampleMod: Int = 1,
      keepCols: Seq[String] = Nil): DataFrame = {
    val k = windowTokens
    require(k >= 1, "windowDedup: windowTokens must be >= 1")
    require(sampleMod >= 1 && 16 % sampleMod == 0,
      "windowDedup: sampleMod must divide 16 (hex-digit selector)")
    // r18: the fused native pass (expressions/WindowMd5.scala) replaces
    // the interpreted HOF `transform(sequence, p -> md5(array_join(
    // slice(tk, p+1, k), ' ')))` — same md5 hex per position bit-for-bit
    // (the oracle replays the md5 selection, so the digest itself is
    // pinned; only the per-window slice/join allocations go away)
    val windows = docs
      .select(col(idCol), split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= k)
      .select(col(idCol), explode(call_function("graft_window_md5_all",
        col("tk"), lit(k))).as("h"))
      .filter(expr("(locate(substring(h, 1, 1), '0123456789abcdef') - 1)" +
        s" % $sampleMod = 0"))
    val grouped = windows.groupBy(col("h"), col(idCol))
      .agg(count(lit(1)).as("__c"))
    val total = sum(col("__c"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy(col("h")))
    val perDoc = grouped.withColumn("__tot", total)
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_windows"),
        sum(when(col("__tot") > 1, col("__c")).otherwise(0L))
          .as("n_dup_windows"))
    // completion join re-attaches zero-window docs; `keepCols` ride along
    // so callers grouping the report (per source/lang) don't need a
    // second scan of the corpus
    docs.select((idCol +: keepCols).map(col): _*)
      .join(perDoc, Seq(idCol), "left")
      .select((idCol +: keepCols).map(col) ++ Seq(
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows")): _*)
      .withColumn("dup_frac",
        when(col("n_windows") > 0,
          col("n_dup_windows").cast("double") / col("n_windows"))
          .otherwise(lit(0.0)))
  }

  /** Aggressive normalization for near-exact dedup keys (the CCNet
    * pre-dedup normalization): lowercase → strip common accents →
    * drop punctuation → collapse whitespace → trim. Two documents that
    * differ only in case, accents, punctuation, or spacing map to one
    * key. Every step is engine-portable (`lower`/`translate`/
    * `regexp_replace` behave identically in Spark and DuckDB), so the
    * keys — and the dedup verdicts built on them — hash-check. */
  def normalizeForDedup(text: Column): Column = {
    val accFrom = "áàâäãåéèêëíìîïóòôöõúùûüñçý"
    val accTo = "aaaaaaeeeeiiiiooooouuuuncy"
    // the whitespace class is spelled out (not \s) so the Spark-side
    // Java regex and the oracle's RE2 agree character-for-character;
    // tabs/newlines must collapse too or two docs differing only in the
    // whitespace KIND would keep distinct keys
    trim(regexp_replace(
      regexp_replace(translate(lower(text), accFrom, accTo),
        "[.,!?;:()\\-]", ""),
      "[ \\t\\n\\r]+", " "))
  }

  /** Near-exact duplicate report on the normalized key: groups of
    * documents identical AFTER [[normalizeForDedup]], with how many RAW
    * variants each group holds — `near_exact_only = true` marks groups
    * exact dedup ([[exactDedup]]) cannot see (raw bytes differ, content
    * doesn't). Output per dup group: `(key_hash, keep_id, n_docs,
    * n_raw_variants, near_exact_only)`.
    *
    * Scale: normalization fuses into the scan; ONE shuffle on the
    * 16-byte key hash with map-side partials; raw text never shuffles.
    */
  def normalizedDedup(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol), md5(col(textCol)).as("__raw"),
        md5(normalizeForDedup(col(textCol))).as("key_hash"))
      .groupBy(col("key_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"),
        count_distinct(col("__raw")).as("n_raw_variants"))
      .filter(col("n_docs") > 1)
      .withColumn("near_exact_only", col("n_raw_variants") > 1)

  /** Content-defined chunk dedup (the rsync/LBFS boundary trick): chunk
    * boundaries fall where a TOKEN's hash satisfies `h % avgTokens == 0`,
    * so boundaries are a function of content, not position — insert a
    * paragraph at the top of a page and every downstream chunk still
    * starts at the same tokens, which is exactly what fixed-stride
    * chunking ([[chunkDedupGlobal]]) loses (one token of shift re-keys
    * every chunk). Expected chunk length ≈ `avgTokens` tokens; a boundary
    * token CLOSES its chunk.
    *
    * Output per document: `(id, n_chunks, n_dup_chunks, dup_frac)` where
    * a chunk is dup if its exact text occurs anywhere else in the corpus
    * (including elsewhere in the same document).
    *
    * Scale shape: the chunk-id assignment is a per-document running sum —
    * a document-keyed window, parallel across docs (the q54-sessionize
    * pattern; one doc's tokens sort in one task, bounded by doc length).
    * Chunk reassembly groups on (doc, chunk); the dup count shuffles md5
    * keys (uniform); the report rolls up on the doc id. Chunk TEXT never
    * shuffles beyond its own doc's reassembly — the global frequency
    * table carries 16-byte hashes.
    */
  def cdcChunkDedup(docs: DataFrame, idCol: String, textCol: String,
      avgTokens: Int = 8): DataFrame = {
    require(avgTokens >= 2, "cdcChunkDedup: avgTokens must be >= 2")
    import org.apache.spark.sql.expressions.Window
    // per-token md5 boundary draws are the scan-side cost — spread a
    // narrow scan first (r17)
    val toks = graft.core.Spread.narrow(
        docs.select(col(idCol), col(textCol)))
      .select(col(idCol), posexplode(split(col(textCol), " "))
        .as(Seq("pos", "t")))
      .withColumn("__m",
        when(conv(substring(md5(col("t")), 1, 4), 16, 10)
          .cast("long") % avgTokens === 0L, 1L).otherwise(0L))
    val prior = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // chunks feeds the frequency table AND the report join — pinned so
    // the window + reassembly runs once per run (r17)
    val chunks = graft.core.Stats.PlanCache.register(toks
      .withColumn("chunk", coalesce(sum(col("__m")).over(prior), lit(0L)))
      .groupBy(col(idCol), col("chunk"))
      .agg(md5(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("t")))),
        x => x.getField("t")), " ")).as("__h")))
    val freq = chunks.groupBy(col("__h")).agg(count(lit(1)).as("__f"))
    chunks.join(freq, "__h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("__f") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_frac",
        col("n_dup_chunks").cast("double") / col("n_chunks").cast("double"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the
    * MOSS algorithm): per document, hash every `k`-token gram, slide a
    * window of `w` hashes, and keep each window's MINIMUM hash. The
    * selected set is position-robust — any shared substring of at least
    * `k + w − 1` tokens is guaranteed to contribute at least one COMMON
    * fingerprint to both documents — so matching on fingerprints finds
    * substring-level copies that whole-doc MinHash dilutes away.
    *
    * Returns `(id, fp)` distinct fingerprint rows (md5-hex strings; the
    * min is the lexicographic min, reproducible in any engine).
    *
    * Documents shorter than `k` tokens produce no grams and are absent; a
    * doc with fewer than `w` grams yields one fingerprint (the min of
    * what exists) — the guarantee above still holds.
    *
    * Scale: selection is entirely row-local through the native
    * `graft_winnow` expression — each gram hashed ONCE, window minima
    * via a monotonic deque, O(n) per document. The equivalent HOF
    * formulation (`array_min` over slices of a gram-hash `transform`)
    * is the trap this expression exists to avoid: CollapseProject
    * substitutes the single-use hash array into the per-window lambda
    * and every window re-hashes every gram — O(n²·w) md5 calls, a
    * measured 100× blowup at sf0.1. Output size is ~`2·n_grams/(w+1)`
    * per doc (winnowing's expected density), distinct-ed per doc before
    * any downstream join.
    */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, salt: String = "win"): DataFrame = {
    require(k >= 1, "winnowFingerprints: k must be >= 1")
    require(w >= 1, "winnowFingerprints: w must be >= 1")
    // graft_winnow (md5 per gram + deque minima) is the scan-side cost —
    // spread a narrow scan first (r17)
    graft.core.Spread.narrow(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        call_function("graft_winnow", split(col(textCol), " "),
          lit(k), lit(w), lit(salt)).as("fps"))
      .filter(size(col("fps")) > 0)
      .select(col(idCol), explode(col("fps")).as("fp"))
  }

  /** Cross-document substring-copy report over [[winnowFingerprints]]:
    * document pairs ranked by shared fingerprints, with the overlap
    * coefficient `n_shared / min(|A|, |B|)` computed over the df-KEPT
    * fingerprint sets on both sides of the ratio (1.0 = every retained
    * selected substring of the smaller doc appears in the larger —
    * containment, which Jaccard under-scores for asymmetric sizes; the
    * df cap changes which fingerprints count, never the ratio's
    * internal consistency).
    *
    * `maxDf` drops fingerprints appearing in more than that many docs
    * BEFORE the pair join — viral boilerplate grams would otherwise
    * explode the self-join quadratically (the same bound invertedIndex
    * places on postings); what remains joins on the fingerprint key with
    * per-pair counts partial-aggregating map-side. `minShared` prunes the
    * pair tail, and the final top-k is a bounded TakeOrdered.
    */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, maxDf: Long = 20L, minShared: Long = 2L,
      topK: Int = 100, salt: String = "win"): DataFrame = {
    // the winnow kernel feeds two consumers (df + the kept join side) —
    // pinned so the corpus winnows once per run (r17)
    val fps = graft.core.Stats.PlanCache.register(
      winnowFingerprints(docs, idCol, textCol, k, w, salt))
    val dfreq = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
    val kept = graft.core.Stats.PlanCache.register(
      fps.join(dfreq.filter(col("__df") <= maxDf), "fp"))
    // sizes over the KEPT fingerprints: numerator and denominator must
    // see the same df cap, or a fully-contained doc whose boilerplate
    // fingerprints were dropped could never reach the documented 1.0
    // (the ratio-consistency rule containmentScored states); pinned —
    // two consumers
    val sizes = graft.core.Stats.PlanCache.register(
      kept.groupBy(col(idCol)).agg(count(lit(1)).as("n_fp")))
    // pair generation from each fingerprint's df-capped id list (the
    // containmentScored r17 shape): one groupBy on fp replaces the
    // kept⋈kept self-join; lists are ≤ maxDf by the upstream filter
    val pairs = kept.groupBy(col("fp"))
      .agg(collect_list(col(idCol)).as("__ids"))
      .select(explode(col("__ids")).as("id_a"), col("__ids"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    pairs
      .join(sizes.select(col(idCol).as("id_a"), col("n_fp").as("__na")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("n_fp").as("__nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          least(col("__na"), col("__nb"))).as("overlap"))
      .orderBy(col("n_shared").desc, col("id_a").asc, col("id_b").asc)
      .limit(topK)
  }

  /** Exact duplicated-span report (the k-gram-resolution form of
    * suffix-array substring dedup, Lee et al. "Deduplicating Training
    * Data Makes Language Models Better"): every position whose k-gram
    * occurs elsewhere in the corpus is "duplicated"; overlapping
    * duplicated k-grams merge into MAXIMAL spans, reported per document
    * (count, token mass, longest). This is the report that drives span
    * excision / memorization audits — a shared run of length L ≥ k
    * produces L − k + 1 duplicated starts that merge into one span of
    * exactly L tokens.
    *
    * Interval merging needs no fold: start positions are sorted per doc
    * and all intervals have length k, so ends are monotone and a span
    * breaks exactly where `pos − lag(pos) > k − 1` — one doc-partitioned
    * window, integers only.
    *
    * Scale: grams ship as md5 hashes (16 B), the df count reduces
    * map-side on a uniform key, the dup-start join is hash-keyed, and
    * every window partitions by doc — millions of small partitions. Text
    * never shuffles.
    */
  def dupSpans(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5, minDf: Long = 2L): DataFrame = {
    require(k >= 2, s"dupSpans: k must be >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select(col(idCol), split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= k)
      .select(col(idCol), size(col("tk")).cast("long").as("n_tokens"),
        // positional 64-bit gram hashes (graft_shingle_hash_all, one
        // fused pass): element i = gram starting at token i, so
        // posexplode recovers the start positions the span merge keys
        // on; longs shuffle 4x smaller than the md5 hex formulation and
        // the string-gram oracle doubles as the no-collision check
        posexplode(call_function("graft_shingle_hash_all",
          col("tk"), lit(k))).as(Seq("pos", "h")))
    val df = grams.groupBy(col("h")).agg(count(lit(1)).as("__df"))
    val dupStarts = grams.join(df.filter(col("__df") >= minDf), "h")
      .select(col(idCol), col("n_tokens"), col("pos"))
    val wDoc = Window.partitionBy(col(idCol)).orderBy(col("pos"))
    val spans = dupStarts
      .withColumn("__new",
        when(col("pos") - lag(col("pos"), 1).over(wDoc) <= k - 1, 0L)
          .otherwise(1L))
      .withColumn("__span", sum(col("__new")).over(
        wDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(idCol), col("__span"))
      .agg(min(col("n_tokens")).as("n_tokens"),
        (max(col("pos")).cast("long") - min(col("pos")).cast("long") +
          lit(k.toLong)).as("__len"))
    spans.groupBy(col(idCol))
      .agg(min(col("n_tokens")).as("n_tokens"),
        count(lit(1)).as("n_spans"),
        sum(col("__len")).as("dup_tokens"),
        max(col("__len")).as("longest_span"))
      .withColumn("dup_frac",
        col("dup_tokens").cast("double") / col("n_tokens").cast("double"))
  }

  /** Directional containment pairs: `|grams(a) ∩ grams(b)| / |grams(a)|`
    * — the asymmetric near-dup relation Jaccard misses (a tweet quoted
    * inside an article has tiny Jaccard but containment ≈ 1). Candidates
    * come from shared distinct n-gram hashes with a document-frequency
    * cap (a gram in more than `maxDf` docs is boilerplate, not evidence,
    * and would otherwise quadratically blow up the pair fan-out — the
    * PPJoin-style frequency prune).
    *
    * Counts are exact integers over the KEPT grams on both sides of the
    * ratio, so the df cap changes candidate recall, never correctness of
    * the reported ratio; one IEEE division finishes.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxDf: Long = 50L, minContainment: Double = 0.5,
      topK: Int = 100): DataFrame =
    containmentScored(docs, idCol, textCol, n, maxDf, minContainment)
      .orderBy(col("containment").desc, col("id_a"), col("id_b"))
      .limit(topK)

  /** [[containmentPairs]] without the report cap: the SET-COMPLETE pair
    * frame for waterfall/purge composition, where a top-k would silently
    * truncate the purge set on a duplicate-heavy corpus and the global
    * sort behind it is wasted work for a consumer that only feeds a
    * distinct semi-join. */
  def containmentPairsAll(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxDf: Long = 50L,
      minContainment: Double = 0.5): DataFrame =
    containmentScored(docs, idCol, textCol, n, maxDf, minContainment)

  private def containmentScored(docs: DataFrame, idCol: String,
      textCol: String, n: Int, maxDf: Long,
      minContainment: Double): DataFrame = {
    require(n >= 1, s"containmentPairs: n must be >= 1, got $n")
    // distinct n-gram identity travels as native 64-bit hashes
    // (graft_shingle_hash, one fused pass) — longs shuffle 4x smaller
    // than md5 hex strings and the counts equal the string-set counts
    // barring ~1e-13 collisions; the oracle counts STRING n-grams, so
    // hash equality doubles as the no-collision check (q37/q57 pattern)
    val grams = graft.core.Spread.narrow(
        docs.select(col(idCol), col(textCol)))
      .select(col(idCol), split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col(idCol), explode(call_function("graft_shingle_hash",
        col("tk"), lit(n))).as("h"))
    val df = grams.groupBy(col("h")).agg(count(lit(1)).as("__df"))
    // kept feeds two consumers (sizes + the pair generator); the bounded
    // PlanCache pins the (id, 16-byte-hash) rows — far smaller than the
    // text they came from — so the corpus scans once
    val kept = graft.core.Stats.PlanCache.register(
      grams.join(df.filter(col("__df") <= maxDf), "h"))
    // sizes is consumed twice (id_a and id_b joins) — without the pin the
    // r17 profile showed the whole 260k-row aggregation + exchange
    // executing twice per run
    val sizes = graft.core.Stats.PlanCache.register(
      kept.groupBy(col(idCol)).agg(count(lit(1)).as("__n")))
    // r17 (guide §2.4/§3): pair generation from each gram's BOUNDED id
    // list instead of the kept⋈kept self-join — the df cap (applied
    // BEFORE grouping, so no group buffer can exceed maxDf ids) makes
    // every list ≤ maxDf elements; the self-join's second scan, its
    // broadcast/exchange of the whole kept frame, and the join probe all
    // disappear, leaving one groupBy(h) and the same Σ df² pair fan-out
    // generated map-side. Counts are identical: grams are per-doc
    // distinct, so each (h, id) occurs once.
    val byH = kept.groupBy(col("h"))
      .agg(collect_list(col(idCol)).as("__ids"))
    val inter = byH
      .select(explode(col("__ids")).as("id_a"), col("__ids"))
      .select(col("id_a"), explode(col("__ids")).as("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(sizes.select(col(idCol).as("id_a"), col("__n").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("__n").as("n_b")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_common"), col("n_a"),
        col("n_b"),
        (col("n_common").cast("double") / col("n_a").cast("double"))
          .as("containment"))
      .filter(col("containment") >= minContainment)
  }

  /** EXACT asymmetric containment self-join at ANY threshold — the
    * low-threshold companion that rounds out the family: PPJoin
    * ([[setSimJoin]]) is exact for high Jaccard, LSH covers mid, and
    * [[containmentPairs]]' df cap trades recall for fan-out; this one is
    * candidate-COMPLETE even below containment 0.5, where symmetric
    * prefixes stop working.
    *
    * The asymmetric prefix filter: `c(a→b) = |A∩B|/|A| ≥ t` means at
    * most `⌊(1−t)·|A|⌋` of A's grams are missing from B, so the
    * `⌊(1−t)·|A|⌋ + 1` globally RAREST grams of A (document-frequency
    * order) must include at least one gram present in B — joining just
    * that prefix against the full gram lists loses nothing, at any `t`.
    * Exact intersection counts verify every candidate, so the output
    * equals the brute-force all-pairs join (the oracle IS that brute
    * force). The bound takes a 1e-9 slack so double rounding can only
    * ADD prefix grams, never drop a boundary pair.
    *
    * Scale shape: the prefix is rarest-first, so join keys are the
    * grams with the SMALLEST df wherever the data allows — boilerplate
    * grams enter a prefix only for documents that consist mostly of
    * boilerplate (where they genuinely are the evidence). At low `t`
    * the prefix approaches the whole gram set — that is the price of
    * exactness at low thresholds, paid in join fan-out bounded by each
    * prefix gram's df, never in lost pairs. The per-doc rarest-first
    * sort is a doc-partitioned window (each doc sorts its own grams,
    * the [[setSimJoin]] discipline); verification touches candidates
    * only. Tie order within equal df is by hash — any complete prefix
    * yields the same verified output, so the tie-break never needs
    * cross-engine replay.
    */
  def containmentJoin(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minContainment: Double = 0.35): DataFrame = {
    require(n >= 1, s"containmentJoin: n must be >= 1, got $n")
    require(minContainment > 0.0 && minContainment <= 1.0,
      s"containmentJoin: threshold must be in (0, 1], got $minContainment")
    import org.apache.spark.sql.expressions.Window
    // one narrow-scan spread feeds BOTH the gram pipeline and the verify
    // arrays (r17) — tokenize+hash runs at session parallelism
    val src = graft.core.Spread.narrow(
      docs.select(col(idCol), col(textCol)))
    val grams = src
      .select(col(idCol), split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col(idCol), explode(call_function("graft_shingle_hash",
        col("tk"), lit(n))).as("h"))
    val dfreq = grams.groupBy(col("h")).agg(count(lit(1)).as("__df"))
    // (id, h, df) feeds four consumers (sizes, prefix, join side, verify
    // sides); the bounded PlanCache pins it so the corpus scans once
    val kept = graft.core.Stats.PlanCache.register(grams.join(dfreq, "h"))
    // three consumers (prefix filter + both pruned-side joins) — pinned,
    // or the 255k-row aggregation executes three times per run (r17
    // profile)
    val sizes = graft.core.Stats.PlanCache.register(
      kept.groupBy(col(idCol)).agg(count(lit(1)).as("__n")))
    val wDoc = Window.partitionBy(col(idCol))
      .orderBy(col("__df").asc, col("h").asc)
    val prefix = kept
      .withColumn("__rk", row_number().over(wDoc))
      .join(sizes, idCol)
      .filter(col("__rk") <= floor(
        (lit(1.0) - lit(minContainment)) * col("__n") + lit(1e-9)) + 1)
      .select(col(idCol).as("id_a"), col("h"))
    val cands = prefix
      .join(kept.select(col("h"), col(idCol).as("id_b")), "h")
      .filter(col("id_a") =!= col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // size prune before verification: n_common <= |B|, so c >= t forces
    // |B| >= t·|A| (1e-9 slack keeps boundary pairs); then ONE
    // array_intersect per surviving candidate — candidate-count work,
    // not candidate×|A| explode-join rows
    val pruned = cands
      .join(sizes.select(col(idCol).as("id_a"), col("__n").as("n_a")), "id_a")
      .join(sizes.select(col(idCol).as("id_b"), col("__n").as("n_b")), "id_b")
      .filter(col("n_b").cast("double") >=
        lit(minContainment) * col("n_a").cast("double") - lit(1e-9))
    // pinned: both verify sides read it, and it re-tokenizes the corpus
    val shset = graft.core.Stats.PlanCache.register(src
      .select(col(idCol), split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col(idCol), call_function("graft_shingle_hash",
        col("tk"), lit(n)).as("sh")))
    pruned
      .join(shset.select(col(idCol).as("id_a"), col("sh").as("__sha")),
        "id_a")
      .join(shset.select(col(idCol).as("id_b"), col("sh").as("__shb")),
        "id_b")
      .select(col("id_a"), col("id_b"),
        size(array_intersect(col("__sha"), col("__shb"))).cast("long")
          .as("n_common"),
        col("n_a"),
        (size(array_intersect(col("__sha"), col("__shb"))).cast("double") /
          col("n_a").cast("double")).as("containment"))
      .filter(col("containment") >= minContainment)
  }

  /** Cross-source duplication matrix: for every pair of corpus slices,
    * how many distinct n-gram shingles they share — the all-pairs form of
    * the per-source data card's dup column, pointing at which feeds are
    * re-crawling each other. Overlap coefficient `|∩|/min(|A|,|B|)` so a
    * small feed fully contained in a big one reads 1.0.
    *
    * Scale: gram sets reduce to (source, hash) DISTINCT rows — the join
    * fans out per shared gram but sources are few, and the per-pair
    * aggregate is |sources|²-bounded. A gram present in many sources
    * contributes one row per source pair sharing it — cap pathological
    * grams upstream with [[containmentPairs]]' df prune if slices share
    * boilerplate.
    */
  def crossSourceDupMatrix(docs: DataFrame, sourceCol: String,
      textCol: String, n: Int = 3): DataFrame = {
    require(n >= 1, s"crossSourceDupMatrix: n must be >= 1, got $n")
    // native 64-bit gram hashes (see containmentPairs) — the oracle's
    // string grams make equality the no-collision check
    val grams = graft.core.Spread.narrow(
        docs.select(col(sourceCol), col(textCol)))
      .select(col(sourceCol).as("__src"), split(col(textCol), " ").as("tk"))
      .filter(size(col("tk")) >= n)
      .select(col("__src"), explode(call_function("graft_shingle_hash",
        col("tk"), lit(n))).as("h"))
      .distinct()
    val cached = graft.core.Stats.PlanCache.register(grams)
    val sizes = graft.core.Stats.PlanCache.register(
      cached.groupBy(col("__src")).agg(count(lit(1)).as("__n")))
    // r17 (guide §2.4): source pairs generated from each gram's bounded
    // source list (|sources| is small by contract) — one groupBy(h)
    // replaces the self-join's second scan + exchange; the (src, h) rows
    // are distinct, so pair counts are identical
    cached.groupBy(col("h"))
      .agg(collect_list(col("__src")).as("__srcs"))
      .select(explode(col("__srcs")).as("src_a"), col("__srcs"))
      .select(col("src_a"), explode(col("__srcs")).as("src_b"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("__src").as("src_a"),
        col("__n").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("__src").as("src_b"),
        col("__n").as("n_b"))), "src_b")
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_a"),
        col("n_b"),
        (col("n_shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double")).as("overlap"))
  }
}
