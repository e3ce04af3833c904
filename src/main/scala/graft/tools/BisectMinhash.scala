package graft.tools

import graft.{Sessions, Tables}
import graft.functions.{minhash_shingled, shared_count, shingle_hashes}
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Scratch bisect harness for the round-2 dedup_minhash bench
  * regression (6.9 s -> 35.3 s). Not part of the library surface;
  * deleted once the culprit is pinned.
  */
object BisectMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder("bisect-minhash", "local[32]", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.load(spark, sfDir, "nation").count()

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"BISECT $label%-50s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    def docs: DataFrame = Tables.load(spark, sfDir, "documents")

    // inline copy of Dedup.minhashPairs with toggles
    def inline(doRepartition: Boolean, doCheckpoint: Boolean,
        stages: Boolean): Long = {
      val k = 16; val bands = 4; val rows = k / bands
      val minJaccard = 0.7; val shingleWords = 3
      val par = spark.sparkContext.defaultParallelism
      var base = docs.select(col("doc_id").as("id"), Dedup.tokens(col("text")).as("wt"))
        .filter(size(col("wt")) >= shingleWords)
      if (doRepartition) base = base.repartition(par, col("id"))
      val based = base
        .withColumn("sig", minhash_shingled(col("wt"), shingleWords, k))
        .withColumn("toks", shingle_hashes(col("wt"), shingleWords))
        .drop("wt")
        .persist(StorageLevel.MEMORY_AND_DISK)
      if (stages) time("  stage base.count")(based.count())
      val bandCols = (0 until bands).map { b =>
        xxhash64(lit(b), slice(col("sig"), b * rows + 1, rows))
      }
      val banded = based.select(col("id"), explode(array(bandCols: _*)).as("bk"))
      val candidates = banded.as("a")
        .join(banded.as("b"),
          col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .distinct()
      if (stages) time("  stage candidates.count")(candidates.count())
      val toks = based.select(col("id"), col("toks"))
      val verified = candidates
        .join(toks.select(col("id").as("id_a"), col("toks").as("toks_a")), "id_a")
        .join(toks.select(col("id").as("id_b"), col("toks").as("toks_b")), "id_b")
        .withColumn("shared", shared_count(col("toks_a"), col("toks_b")))
        .withColumn("total",
          size(col("toks_a")) + size(col("toks_b")) - col("shared"))
        .filter(col("total") > 0 && col("shared") >= col("total") * minJaccard)
        .select(col("id_a"), col("id_b"), col("shared"), col("total"))
      val n = if (doCheckpoint) {
        val out = verified.localCheckpoint()
        based.unpersist()
        out.count()
      } else {
        val c = verified.count()
        based.unpersist()
        c
      }
      n
    }

    for (coalesce <- Seq(true, false)) {
      spark.conf.set(
        "spark.sql.adaptive.coalescePartitions.enabled", coalesce.toString)
      time(s"canonical coalesce=$coalesce") {
        Dedup.minhashPairs(docs, k = 16, bands = 4, minJaccard = 0.7).count()
      }
      time(s"inline repart=T ckpt=T coalesce=$coalesce")(
        inline(doRepartition = true, doCheckpoint = true, stages = false))
      time(s"inline repart=T ckpt=F coalesce=$coalesce")(
        inline(doRepartition = true, doCheckpoint = false, stages = false))
      time(s"inline repart=F ckpt=F coalesce=$coalesce")(
        inline(doRepartition = false, doCheckpoint = false, stages = false))
    }
    // stage-level breakdown under the default (coalesce=true) config
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    println("BISECT stage breakdown, coalesce=true, repart=T ckpt=T:")
    time("inline staged total")(
      inline(doRepartition = true, doCheckpoint = true, stages = true))
    spark.stop()
  }
}
