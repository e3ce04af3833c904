package graft.tools

import graft.{Scratch, Sessions, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off A/B probe for the link-prediction wedge generator (r19
  * optimization round): same inputs, same output contract, three
  * physical shapes. Times each variant in ONE JVM so JIT/session
  * warm-up cancels; prints per-variant medians and asserts the
  * variants agree row-for-row before any timing is trusted.
  */
object LinkPredProbe {

  private def incidence(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("node"), col("l_partkey").as("via"))

  private def pin(df: DataFrame): DataFrame = df.localCheckpoint()

  /** Variant A — the current shape: per-via sorted adjacency arrays,
    * nested transform/slice/flatten pair explode, broadcast degrees.
    */
  def variantA(inc: DataFrame, maxHubDeg: Long, k: Int): DataFrame = {
    val p = inc.select(col("node"), col("via")).distinct()
    val keptVia = p.groupBy(col("via")).agg(count(lit(1)).as("vd"))
      .filter(col("vd") <= maxHubDeg).select(col("via"))
    val grouped = pin(p.join(keptVia, "via")
      .groupBy(col("via"))
      .agg(sort_array(collect_list(col("node"))).as("ns")))
    val deg = pin(grouped
      .select(explode(col("ns")).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg")))
    val wedges = grouped
      .select(explode(expr(
        "flatten(transform(ns, (x, i) -> " +
          "transform(slice(ns, i + 2, size(ns) - i - 1), " +
          "y -> named_struct('a', x, 'b', y))))")).as("w"))
      .groupBy(col("w.a").as("a"), col("w.b").as("b"))
      .agg(count(lit(1)).as("cn"))
    finish(wedges, deg, k)
  }

  /** Variant B — pinned kept edge list, via-keyed self-join (the r18
    * join shape, but with the incidence pipeline pinned so nothing
    * recomputes per consumer), broadcast degrees.
    */
  def variantB(inc: DataFrame, maxHubDeg: Long, k: Int): DataFrame = {
    val p = inc.select(col("node"), col("via")).distinct()
    val keptVia = p.groupBy(col("via")).agg(count(lit(1)).as("vd"))
      .filter(col("vd") <= maxHubDeg).select(col("via"))
    val kept = pin(p.join(keptVia, "via"))
    val deg = pin(kept.groupBy(col("node")).agg(count(lit(1)).as("deg")))
    val wedges = kept.as("x")
      .join(kept.as("y"),
        col("x.via") === col("y.via") && col("x.node") < col("y.node"))
      .groupBy(col("x.node").as("a"), col("y.node").as("b"))
      .agg(count(lit(1)).as("cn"))
    finish(wedges, deg, k)
  }

  /** Variant C — adjacency arrays, but chained generates instead of
    * the nested flatten: posexplode anchors (via, i, a), then a slice
    * explode per anchor.
    */
  def variantC(inc: DataFrame, maxHubDeg: Long, k: Int): DataFrame = {
    val p = inc.select(col("node"), col("via")).distinct()
    val keptVia = p.groupBy(col("via")).agg(count(lit(1)).as("vd"))
      .filter(col("vd") <= maxHubDeg).select(col("via"))
    val grouped = pin(p.join(keptVia, "via")
      .groupBy(col("via"))
      .agg(sort_array(collect_list(col("node"))).as("ns")))
    val deg = pin(grouped
      .select(explode(col("ns")).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg")))
    val wedges = grouped
      .select(posexplode(col("ns")).as(Seq("i", "a")), col("ns"))
      .select(col("a"), explode(
        expr("slice(ns, i + 2, size(ns) - i - 1)")).as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("cn"))
    finish(wedges, deg, k)
  }

  private def finish(wedges: DataFrame, deg: DataFrame, k: Int): DataFrame =
    wedges
      .join(broadcast(deg.select(col("node").as("a"),
        col("deg").as("da"))), "a")
      .join(broadcast(deg.select(col("node").as("b"),
        col("deg").as("db"))), "b")
      .select(col("a"), col("b"), col("cn"), col("da"), col("db"),
        expr("(10000 * cn) div (da + db - cn)").as("jaccard_bp"))
      .orderBy(col("cn").desc, col("jaccard_bp").desc, col("a"),
        col("b"))
      .limit(k)

  def main(args: Array[String]): Unit = {
    Scratch.redirectTmpdir()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "3").toInt
    val spark = Sessions.builder("graft-linkpred-probe", s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val variants = Seq[(String, (DataFrame, Long, Int) => DataFrame)](
      "A-arrays-nested" -> variantA,
      "B-pinned-selfjoin" -> variantB,
      "C-arrays-chained" -> variantC)
    // agreement check first: all variants must emit identical rows
    val results = variants.map { case (n, f) =>
      n -> f(incidence(spark, sfDir), 40L, 50).collect().toSeq
    }
    val ref = results.head._2
    results.tail.foreach { case (n, r) =>
      require(r == ref, s"variant $n disagrees with ${results.head._1}")
    }
    System.err.println(s"AGREE: all ${variants.size} variants emit " +
      s"identical ${ref.size}-row results")
    // warm-up + timed runs, interleaved so load drift hits all equally
    def timeAll(dir: String, label: String): Unit =
      for (rep <- 1 to reps; (n, f) <- variants) {
        val before = spark.sparkContext.getPersistentRDDs.keySet
        val t0 = System.nanoTime()
        f(incidence(spark, dir), 40L, 50).count()
        val t = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.getPersistentRDDs.foreach { case (rid, rdd) =>
          if (!before.contains(rid)) rdd.unpersist(blocking = false)
        }
        System.err.println(f"LINKPRED[$label] rep$rep $n%-20s $t%7.2f s")
      }
    timeAll(sfDir, "1x")
    val copies = sys.env.getOrElse("SPARK_GRAFT_PROBE_COPIES", "0").toInt
    if (copies > 1) {
      val scaled = Scratch.diskDir("graft-lp-scale").toFile
      try {
        ScaleProbe.buildScaled(spark, sfDir, scaled.toString, copies)
        timeAll(scaled.toString, s"${copies}x")
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(scaled)
      }
    }
    spark.stop()
  }
}
