package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}

/** Dev scratch: time the stages of the LSH pipeline independently. */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = Tables.load(spark, dir, "documents")
    docs.count() // warm

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val toks = docs.filter(size(split(col("text"), " ")) >= 3)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .repartition(col("doc_id"))
    time("toks.count")(toks.count())

    val sh = toks.select(col("doc_id"),
      transform(sequence(lit(1), size(col("toks")) - 2),
        i => concat_ws(" ", slice(col("toks"), i, lit(3)))).as("sh"))
    time("sh.count")(sh.count())
    time("sh.forcecompute")(sh.select(sum(size(col("sh")))).collect())

    def mh(seed: Int) = array_min(
      transform(col("sh"), x => md5(concat(lit(s"$seed:"), x))))
    val sig1 = sh.select(col("doc_id"), mh(1).as("m1"))
    time("one minhash")(sig1.select(max(col("m1"))).collect())
    val sig4 = sh.select(col("doc_id"), mh(1).as("m1"), mh(2).as("m2"), mh(3).as("m3"), mh(4).as("m4"))
    time("four minhashes")(sig4.select(max(col("m1"))).collect())

    val bands = sig4.select(col("doc_id"),
      explode(array(struct(lit(1).as("band"), concat(col("m1"), col("m2")).as("mh")),
        struct(lit(2).as("band"), concat(col("m3"), col("m4")).as("mh")))).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.mh").as("mh"))
    val a = bands.select(col("doc_id").as("d1"), col("band"), col("mh"))
    val b = bands.select(col("doc_id").as("d2"), col("band").as("band2"), col("mh").as("mh2"))
    val pairs = a.join(b, col("band") === col("band2") && col("mh") === col("mh2") && col("d1") < col("d2"))
      .select(col("d1"), col("d2")).distinct()
    time("pairs.count")(pairs.count())
    spark.stop()
  }
}
