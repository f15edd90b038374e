package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Native expression semantics — above all graft_dsum, which must be
  * BIT-IDENTICAL to the decimal-exact sum pipeline it replaces. */
class ExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def decimalSum(c: String, s: Int) =
    sum(col(c).cast(DecimalType(38, s))).cast(DoubleType)
  private def graftSum(c: String, s: Int) =
    call_function("graft_dsum", col(c), lit(s))

  test("graft_dsum == decimal-exact sum on adversarial values, all scales") {
    val rnd = new scala.util.Random(7)
    // magnitudes spread over 9 decades, signs mixed, plus boundary-hugging
    // values (k + 0.00005-ish patterns that sit near the scale-4 round edge)
    val values =
      Seq.fill(20000)(rnd.nextDouble() * math.pow(10, rnd.nextInt(9)) *
        (if (rnd.nextBoolean()) 1 else -1)) ++
      Seq.tabulate(5000)(i => i + 0.00005) ++
      Seq.tabulate(5000)(i => -(i + 0.000049999999999)) ++
      Seq(0.0, -0.0, 1e-12, -1e-12, 123456789.0001, 0.00004999999999999999)
    val df = values.zipWithIndex.map { case (v, i) => (i % 7, v) }.toDF("g", "x")
    for (s <- Seq(0, 2, 4, 6)) {
      val r = df.groupBy("g").agg(
        decimalSum("x", s).as("dec"), graftSum("x", s).as("graft")).collect()
      r.foreach { row =>
        assert(row.getDouble(1) === row.getDouble(2),
          s"scale $s group ${row.getInt(0)}: dec=${row.getDouble(1)} graft=${row.getDouble(2)}")
      }
    }
  }

  test("graft_dsum weighted == decimal(c,6)*w exact sum") {
    val rnd = new scala.util.Random(13)
    val df = Seq.fill(30000)((rnd.nextInt(5),
        rnd.nextDouble() * math.pow(10, rnd.nextInt(7)),
        (rnd.nextInt(1000) + 1).toLong))
      .toDF("g", "x", "w")
    val r = df.groupBy("g").agg(
      sum(col("x").cast(DecimalType(38, 6)) * col("w")).cast(DoubleType).as("dec"),
      call_function("graft_dsum", col("x"), lit(6), col("w")).as("graft"))
      .collect()
    r.foreach(row => assert(row.getDouble(1) === row.getDouble(2),
      s"group ${row.getInt(0)}"))
  }

  test("graft_dsum null semantics match decimal SUM") {
    val df = Seq((1, Some(1.5)), (1, None), (2, None), (2, None))
      .toDF("g", "x")
    val r = df.groupBy("g").agg(
      decimalSum("x", 4).as("dec"), graftSum("x", 4).as("graft"))
      .orderBy("g").collect()
    assert(!r(0).isNullAt(1) && r(0).getDouble(1) === r(0).getDouble(2))
    assert(r(1).isNullAt(1) && r(1).isNullAt(2), "all-null group must be null")
  }

  test("graft_dsum long inputs past 2^53 sum exactly (no double round-trip)") {
    // epoch-nanos / snowflake-id magnitudes: doubleValue() would lose the
    // low bits and the old slow path threw past |v·10^s| >= 2^63
    val vals = Seq(9007199254740993L, 9007199254740995L, // 2^53+1, 2^53+3
      1723456789123456789L, -1723456789123456787L,
      Long.MaxValue, Long.MinValue + 1, 1234567890123456789L)
    val df = vals.toDF("x")
    for (s <- Seq(0, 6)) {
      val dec = df.agg(sum(col("x").cast(DecimalType(38, s))).cast(DoubleType))
        .collect()(0).getDouble(0)
      val g = df.agg(call_function("graft_dsum", col("x"), lit(s)))
        .collect()(0).getDouble(0)
      assert(dec === g, s"scale $s")
    }
    // exactness, not just double-equality: sum of the first two is 2^54+4
    val small = Seq(9007199254740993L, 9007199254740995L).toDF("x")
    val exact = small.agg(call_function("graft_dsum", col("x"), lit(0)))
      .collect()(0).getDouble(0)
    assert(exact === 18014398509481988.0)
  }

  test("graft_dsum weighted long products past 2^63 stay exact") {
    val df = Seq((4000000000L, 4000000000L), (-3000000000L, 5000000000L),
      (9007199254740993L, 1024L)).toDF("x", "w")
    val dec = df.agg(sum(col("x").cast(DecimalType(38, 6)) * col("w"))
      .cast(DoubleType)).collect()(0).getDouble(0)
    val g = df.agg(call_function("graft_dsum", col("x"), lit(6), col("w")))
      .collect()(0).getDouble(0)
    assert(dec === g)
  }

  test("graft_dsum doubles outside the long window take the exact big path") {
    val df = Seq(1.5e20, -2.25e19, 3.141e21, 7.5e13).toDF("x")
    val dec = df.agg(decimalSum("x", 6)).collect()(0).getDouble(0)
    val g = df.agg(graftSum("x", 6)).collect()(0).getDouble(0)
    assert(dec === g)
  }

  test("graft_minhash skips shingles containing null tokens (no NPE)") {
    // session-registered, so arbitrary SQL can feed null-element arrays;
    // the HOF it replaced hashed such shingles to null and array_min
    // skipped them — here the only fully-non-null shingle is (b,c,d)
    val withNulls = spark.sql(
      "SELECT graft_minhash(array('a', CAST(NULL AS STRING), 'b', 'c', 'd'), 4) AS mh")
      .collect()(0).getAs[collection.Seq[String]]("mh")
    val clean = spark.sql("SELECT graft_minhash(array('b', 'c', 'd'), 4) AS mh")
      .collect()(0).getAs[collection.Seq[String]]("mh")
    assert(withNulls === clean)
    // all shingles contain a null → all-null result (like < 3 tokens)
    val allNull = spark.sql(
      "SELECT graft_minhash(array('a', CAST(NULL AS STRING), 'b'), 2) AS mh")
      .collect()(0).getAs[collection.Seq[String]]("mh")
    assert(allNull === Seq(null, null))
  }

  test("graft_dsum int128 buffer survives huge partial sums") {
    // 2M values of ~9e12 scaled magnitude: the long-sum would overflow at
    // ~1e6 such rows x larger data; int128 must not
    val df = spark.range(0, 2000000, 1, 32)
      .select((col("id") % 1000 + 9e8).as("x"))
    val dec = df.agg(decimalSum("x", 4)).collect()(0).getDouble(0)
    val g = df.agg(graftSum("x", 4)).collect()(0).getDouble(0)
    assert(dec === g)
  }

  test("graft_repetition == composed explode/groupBy formulation") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("a", "bb", "ccc", "dd d", "", "日本", "e")
    val docs = Seq.tabulate(300) { i =>
      val n = rnd.nextInt(40) // 0..39 words, incl. empty and 1-word docs
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    val w = split(col("text"), " ")
    val fused = docs.select(col("doc_id"),
      call_function("graft_repetition", w).as("r"))
      .select(col("doc_id"), col("r.n_words"), col("r.n_distinct"),
        col("r.top_bigram"), col("r.n_bigrams"))
    // independent composed formulation
    val words = docs.select(col("doc_id"), w.as("w"))
    val base = words.select(col("doc_id"),
      size(col("w")).cast("long").as("n_words"),
      size(array_distinct(col("w"))).cast("long").as("n_distinct"))
    val bg = words.select(col("doc_id"),
      explode(when(size(col("w")) >= 2,
        transform(sequence(lit(0), size(col("w")) - 2),
          i => concat_ws(" ", slice(col("w"), i + 1, lit(2)))))
        .otherwise(array())).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(max("c").as("top_bigram"), sum("c").as("n_bigrams"))
    val composed = base.join(bg, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"), col("n_distinct"),
        coalesce(col("top_bigram"), lit(0L)).as("top_bigram"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
    assert(fused.orderBy("doc_id").collect().toSeq ===
      composed.orderBy("doc_id").collect().toSeq)
  }

  test("graft_shingles == HOF distinct-ngram chain, order preserved") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq("x", "yy", "z z", "", "ww")
    val docs = Seq.tabulate(200) { i =>
      val n = rnd.nextInt(12)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    for (ng <- Seq(1, 2, 3, 5)) {
      val w = split(col("text"), " ")
      val fused = docs.select(col("doc_id"),
        call_function("graft_shingles", w, lit(ng)).as("s"))
      val hof = docs.select(col("doc_id"),
        when(size(w) >= ng,
          array_distinct(transform(sequence(lit(0), size(w) - ng),
            i => concat_ws(" ", slice(w, i + 1, lit(ng))))))
          .otherwise(array().cast("array<string>")).as("s"))
      assert(fused.orderBy("doc_id").collect().toSeq ===
        hof.orderBy("doc_id").collect().toSeq, s"n=$ng")
    }
  }

  test("graft_shingle_hash_all: positional, aligned, distinct == set form") {
    val rnd = new scala.util.Random(29)
    val vocab = Seq("aa", "b", "cc c", "", "dd")
    val docs = Seq.tabulate(150) { i =>
      val n = rnd.nextInt(14)
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
    for (ng <- Seq(2, 3, 5)) {
      val w = split(col("text"), " ")
      val rows = docs.select(col("doc_id"), size(w).as("len"),
        call_function("graft_shingle_hash_all", w, lit(ng)).as("all"),
        call_function("graft_shingle_hash", w, lit(ng)).as("set"))
        .collect()
      rows.foreach { r =>
        val len = r.getInt(1)
        val all = r.getSeq[Long](2)
        val set = r.getSeq[Long](3)
        assert(all.length === math.max(len - ng + 1, 0),
          s"one hash per start position (n=$ng)")
        assert(all.distinct.toSet === set.toSet,
          s"positional stream dedups to the set form (n=$ng)")
      }
    }
    // alignment law: the hash at position i is the hash of the i-slice
    val one = Seq((1L, "p q r s t")).toDF("doc_id", "text")
    val aligned = one.select(
      element_at(call_function("graft_shingle_hash_all",
        split(col("text"), " "), lit(3)), 3).as("h_at_2"),
      element_at(call_function("graft_shingle_hash",
        split(lit("r s t"), " "), lit(3)), 1).as("h_slice"))
      .collect()(0)
    assert(aligned.getLong(0) === aligned.getLong(1))
  }

  test("graft_dsum transient int128 excursion cancels; net overflow throws") {
    // 6e31 at scale 6 scales to 6e37; three in a row pass 2^127 ~ 1.70e38,
    // then the negatives bring the total back to exactly 0 — wrapping adds
    // are order-independent, so this must NOT throw regardless of prefix
    val cancel = Seq(6.0e31, 6.0e31, 6.0e31, -6.0e31, -6.0e31, -6.0e31)
      .toDF("x").repartition(1)
    assert(cancel.agg(graftSum("x", 6)).collect()(0).getDouble(0) === 0.0)
    // a FINAL total past the window must still fail loudly at eval
    val over = Seq(6.0e31, 6.0e31, 6.0e31).toDF("x").repartition(1)
    val e = intercept[Exception] { over.agg(graftSum("x", 6)).collect() }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(_.isInstanceOf[ArithmeticException]),
      s"expected ArithmeticException cause, got $e")
  }
  test("graft_nfc: decomposed -> precomposed, idempotent, null-safe") {
    import spark.implicits._
    val rows = Seq(
      ("e\u0301"),            // decomposed e + combining acute
      ("\u00e9"),             // already NFC
      ("caf\u00e9 du cine\u0301ma"),
      ("plain ascii"),
      ("A\u030a ring"),       // A + combining ring -> U+00C5
      ("")
    ).toDF("s")
    val out = rows.select(col("s"),
        call_function("graft_nfc", col("s")).as("n"),
        call_function("graft_nfc", call_function("graft_nfc", col("s"))).as("nn"),
        octet_length(col("s")).as("sb"), octet_length(col("n")).as("nb"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getInt(4)))
    for ((s0, n, nn, _, _) <- out) {
      assert(n == java.text.Normalizer.normalize(s0, java.text.Normalizer.Form.NFC))
      assert(nn == n, "NFC must be idempotent")
    }
    val byIn = out.map(r => r._1 -> r).toMap
    assert(byIn("e\u0301")._2 == "\u00e9" && byIn("e\u0301")._5 < byIn("e\u0301")._4)
    assert(byIn("A\u030a ring")._2 == "\u00c5 ring")
    assert(byIn("plain ascii")._2 == "plain ascii")
    // null passes through as null
    assert(Seq((null: String)).toDF("s")
      .select(call_function("graft_nfc", col("s"))).collect()(0).isNullAt(0))
  }

  test("l2_normalize / quantize8 generate real inline loops, not an " +
      "eval callback") {
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val in = BoundReference(0, ArrayType(FloatType), nullable = true)
    val l2 = graft.expressions.L2Normalize(in)
      .genCode(new CodegenContext).code.toString
    assert(l2.contains("Math.sqrt") && l2.contains("for ("),
      "L2Normalize must inline its norm loop")
    assert(!l2.contains("nullSafeEvalPub"),
      "L2Normalize must not call back into the interpreter")
    val q8 = graft.expressions.QuantizeInt8(in)
      .genCode(new CodegenContext).code.toString
    assert(q8.contains("Math.floor") && q8.contains("127.0"),
      "QuantizeInt8 must inline its rounding loop")
    assert(!q8.contains("nullSafeEvalPub"),
      "QuantizeInt8 must not call back into the interpreter")
  }

  test("l2_normalize / quantize8: codegen and interpreted paths agree") {
    val df = Seq(
      Seq(0.1f, -2.5f, 3.0f, 0.0f),
      Seq(127.0f),
      Seq(0.0f, 0.0f),                 // zero vector: scale 0, q all 0
      Seq(-1e-6f, 1e-6f, 5.5f, -5.5f)  // tie at .5 rounding both signs
    ).toDF("v")
    def run(): Seq[Seq[String]] = df.select(
        call_function("graft_l2_normalize", col("v")).as("n"),
        call_function("graft_quantize8", col("v")).as("q"))
      .collect().map(_.toSeq.map(String.valueOf)).toSeq
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try run() finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(gen === interp)
    // spot-check the quantized values themselves
    val q = df.select(call_function("graft_quantize8", col("v")).as("q"))
      .selectExpr("q.scale", "q.q").collect()
    assert(q(1).getDouble(0) === 1.0 && q(1).getSeq[Byte](1) === Seq(127.toByte))
    assert(q(2).getDouble(0) === 0.0 &&
      q(2).getSeq[Byte](1) === Seq(0.toByte, 0.toByte))
  }

  test("graft_bloom_contains: no false negatives, codegen probe, null semantics") {
    import org.apache.spark.util.sketch.BloomFilter
    val bloom = BloomFilter.create(1000, 0.01)
    (0L until 500L).foreach(i => bloom.putLong(i * 7919L))
    val bytes = { val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos); bos.toByteArray }
    val df = (0L until 500L).map(i => i * 7919L)
      .toDF("h").union(Seq(-1L, -2L).toDF("h"))
    def hits(): Long = df.filter(call_function(
      "graft_bloom_contains", lit(bytes), col("h"))).count()
    val gen = hits()
    assert(gen >= 500L, "a bloom filter never false-negatives an insert")
    // codegen and interpreted paths agree
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    val interp = try hits() finally {
      spark.conf.unset("spark.sql.codegen.wholeStage")
      spark.conf.unset("spark.sql.codegen.factoryMode")
    }
    assert(gen === interp)
    // generated code probes the referenced filter inline — no interpreter
    // callback, no lambda
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
    val expr = graft.expressions.GraftBloomContains(
      Literal(bytes, org.apache.spark.sql.types.BinaryType),
      BoundReference(0, org.apache.spark.sql.types.LongType, nullable = true))
    val codeStr = expr.genCode(new CodegenContext).code.toString
    assert(codeStr.contains("mightContainLong"),
      "probe must inline against the referenced BloomFilter")
    assert(!codeStr.contains("nullSafeEvalPub") && !codeStr.contains("eval("),
      "no interpreter callback")
    // null probe value -> null (filter drops it), null bloom -> null
    val nulls = Seq[java.lang.Long](1L, null).toDF("h")
    assert(nulls.filter(call_function(
      "graft_bloom_contains", lit(bytes), col("h"))).count() <= 1L)
    assert(nulls.filter(call_function("graft_bloom_contains",
      lit(null).cast("binary"), col("h"))).count() === 0L)
  }

  test("graft_normalize_text: byte-exact to the legacy regex chain on " +
      "ASCII, Unicode, and adversarial whitespace") {
    val rnd = new scala.util.Random(31)
    val asciiPool = "abcXYZ 019 .,!-_@#\t" // tab is NOT [^a-z0-9 ]-space
    val uniPool = "caf\u00e9 \u212aELVIN \u0130stanbul \u4e2d\u6587 e\u0301"
    def randStr(pool: String, n: Int) =
      (0 until n).map(_ => pool(rnd.nextInt(pool.length))).mkString
    val cases = Seq("", " ", "   ", "a", "  a  b  ", "!!!", "A1 b2",
      "\u212a", "\u0130", "tab\there") ++
      (0 until 300).map(_ => randStr(asciiPool, rnd.nextInt(60))) ++
      (0 until 150).map(_ => randStr(asciiPool + uniPool, rnd.nextInt(40)))
    val df = cases.toDF("t")
    val got = df.select(
      graft.operators.TextAnalysis.normalizeText(col("t")).as("k"),
      graft.operators.TextAnalysis.normalizeTextLegacy(col("t")).as("l"))
      .collect()
    for ((r, i) <- got.zipWithIndex)
      assert(r.getString(0) === r.getString(1),
        s"case $i input=${cases(i)} kernel=${r.getString(0)} legacy=${r.getString(1)}")
    // null passes through
    assert(Seq[Option[String]](None).toDF("t")
      .select(graft.operators.TextAnalysis.normalizeText(col("t")))
      .head().isNullAt(0))
  }

  test("graft_pii_count / graft_pii_redact: byte-exact to the " +
      "java.util.regex chain AND Spark's regexp_* on adversarial inputs") {
    import java.util.regex.Pattern
    val pe = Pattern.compile(graft.operators.Pii.EmailRe)
    val pp = Pattern.compile(graft.operators.Pii.PhoneRe)
    val pi = Pattern.compile(graft.operators.Pii.Ipv4Re)
    def cnt(p: Pattern, s: String): Long = {
      val m = p.matcher(s); var c = 0L; while (m.find()) c += 1; c
    }
    def legacyRedact(s: String): String =
      pi.matcher(pp.matcher(pe.matcher(s).replaceAll("<EMAIL>"))
        .replaceAll("<PHONE>")).replaceAll("<IP>")

    // every shape the kernel's case analysis calls out, plus the
    // sequential-order traps (phone inside an email local part; an ipv4
    // gaining a word boundary from a replaced span; overlap where the
    // phone pass must beat the ipv4 pass)
    val targeted = Seq(
      "", "@", "a@", "@b.co", "a@b", "a@b.c", "a@b.co", "a@b.co.",
      "a@@b.com", "a@b@c.com", "x#y%z+w@sub.do-main.org!",
      "a@.co", "a@.com.de", "a@-.co", "a@..co", "a@x.co",
      "a@b.com.de1", "a@b.comx@d.org", "a@b.com1.2.3.4",
      "12-345-678-9012@x.com", "mail 12-345-678-9012@x.com end",
      "12-345-678-9012", "x12-345-678-9012", "12-345-678-9012x",
      "5-12-345-678-9012", "12-345-678-90123", "1-345-678-9012",
      "1.2.3.4", "1.2.3.4.5.6.7.8", "1234.5.6.7", "1.2.3.4567",
      "1.2.3.4a", "_1.2.3.4", "1.2.3.45-123-456-7890",
      "ip 10.0.255.1, tel 10-001-031-7919, a.b@c.example.com.",
      // \b in java.util.regex is Unicode-aware even in default mode: a
      // letter, combining mark, or join control next to the digits
      // SUPPRESSES the boundary; punctuation/ideographic spaces do not
      "é1.2.3.4é", "中12-345-678-9012中",
      "é1.2.3.4", "‍12-345-678-9012", "　1.2.3.4　",
      "café@b.com", "a@café.com", "a@b.coém", "�1.2.3.4",
      // contextual marks: a combining acute (U+0301) with a letter base
      // is word (suppresses \b); with no base, an underscore base, or a
      // surrogate-pair base it isn't (the boundary survives)
      "á1.2.3.4", "́1.2.3.4", "😀́1.2.3.4",
      "_́1.2.3.4", "á́1.2.3.4", "1.2.3.4́",
      "1.2.3.4á", "12-345-678-9012́x")
    val rnd = new scala.util.Random(53)
    val frags = Seq("a@b.co", "x.y", "1.2.3.4", "12-345-678-9012", "12",
      "345", ".", "-", "@", " ", "", "_", "#", "%", "+", "com", "9",
      "1234", "é", "中", "a@", ".co", "10.0.0", "99-", "́", "‍",
      "　", "😀")
    val fuzz = (0 until 400).map { _ =>
      (0 until rnd.nextInt(8)).map(_ => frags(rnd.nextInt(frags.size)))
        .mkString
    }
    val cases = targeted ++ fuzz
    val df = cases.toDF("t")
    val got = df.select(
      call_function("graft_pii_count", col("t"), lit("email")).as("ke"),
      call_function("graft_pii_count", col("t"), lit("phone")).as("kp"),
      call_function("graft_pii_count", col("t"), lit("ipv4")).as("ki"),
      call_function("graft_pii_count", col("t"), lit("total")).as("kt"),
      call_function("graft_pii_redact", col("t")).as("kr"),
      regexp_count(col("t"), lit(graft.operators.Pii.EmailRe)).as("se"),
      regexp_count(col("t"), lit(graft.operators.Pii.PhoneRe)).as("sp"),
      regexp_count(col("t"), lit(graft.operators.Pii.Ipv4Re)).as("si"),
      regexp_replace(regexp_replace(regexp_replace(col("t"),
        graft.operators.Pii.EmailRe, "<EMAIL>"),
        graft.operators.Pii.PhoneRe, "<PHONE>"),
        graft.operators.Pii.Ipv4Re, "<IP>").as("sr")).collect()
    for ((r, i) <- got.zipWithIndex) {
      val in = cases(i)
      assert(r.getLong(0) === cnt(pe, in), s"email count on <$in>")
      assert(r.getLong(1) === cnt(pp, in), s"phone count on <$in>")
      assert(r.getLong(2) === cnt(pi, in), s"ipv4 count on <$in>")
      assert(r.getLong(3) === r.getLong(0) + r.getLong(1) + r.getLong(2),
        s"total on <$in>")
      assert(r.getString(4) === legacyRedact(in), s"redact on <$in>")
      // Spark's regexp_* agree (pins the engine-side semantics too)
      assert(r.getLong(0) === r.getInt(5).toLong, s"spark email on <$in>")
      assert(r.getLong(1) === r.getInt(6).toLong, s"spark phone on <$in>")
      assert(r.getLong(2) === r.getInt(7).toLong, s"spark ipv4 on <$in>")
      assert(r.getString(4) === r.getString(8), s"spark redact on <$in>")
    }
    // null passes through; an unknown category fails analysis loudly
    val nr = Seq[Option[String]](None).toDF("t").select(
      call_function("graft_pii_count", col("t"), lit("email")),
      call_function("graft_pii_redact", col("t"))).head()
    assert(nr.isNullAt(0) && nr.isNullAt(1))
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("x").toDF("t")
        .select(call_function("graft_pii_count", col("t"), lit("ssn")))
        .collect()
    }
    assert(bad.getMessage.contains("unknown category"))
  }
}
