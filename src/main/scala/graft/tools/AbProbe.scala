package graft.tools

import graft.{Scratch, Sessions, SparkEntry}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B timer for registered queries across two
  * code shapes that both live in the build (r19 optimization round):
  * host load on this box drifts 2x within minutes, so sequential
  * bench runs cannot resolve sub-30% effects — interleaved reps in
  * one JVM cancel the drift. Variants are expressed as NAMES in the
  * live registry plus local alternates coded here; results must agree
  * before timing is trusted.
  *
  * Usage: runMain graft.tools.AbProbe <queryName> (alternates wired
  * in `alternates` below; absent name = registry-only timing).
  */
object AbProbe {

  /** Local alternate implementations, keyed by registered name. */
  private def alternates(name: String)
      : Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)] =
    name match {
      case "graph_triangles" => Seq("unpinned" -> { (s, dir) =>
        val items = graft.Tables.load(s, dir, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val edges = items.as("i").join(items.as("j"),
            col("i.o") === col("j.o") && col("i.p") < col("j.p"))
          .select(col("i.p").as("src"), col("j.p").as("dst")).distinct()
        // the pre-r19 triangles body, verbatim, no pins
        val und = edges
          .select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .filter(col("a") < col("b")).distinct()
        val deg = und.select(col("a").as("node"))
          .union(und.select(col("b").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        val withDeg = und
          .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
          .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
        val oriented = withDeg.select(
          when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
            struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
            .otherwise(struct(col("b").as("u"), col("a").as("v"),
              col("da").as("dv")))
            .as("e"))
          .select(col("e.u"), col("e.v"), col("e.dv"))
        val wedges = oriented.as("x").join(oriented.as("y"),
            col("x.u") === col("y.u") &&
              (struct(col("x.dv"), col("x.v")) <
                struct(col("y.dv"), col("y.v"))))
          .select(col("x.u").as("n1"), col("x.v").as("n2"),
            col("y.v").as("n3"))
        val tris = wedges.join(
          oriented.select(col("u").as("n2"), col("v").as("n3")),
          Seq("n2", "n3"))
        val perNode = tris.select(col("n1").as("node"))
          .union(tris.select(col("n2").as("node")))
          .union(tris.select(col("n3").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
        deg.join(perNode, Seq("node"), "left")
          .select(col("node"), col("deg"),
            coalesce(col("triangles"), lit(0L)).as("triangles"))
          .withColumn("cc_micro",
            when(col("deg") > 1,
              expr("(2000000 * triangles) div (deg * (deg - 1))"))
              .otherwise(lit(0L)))
          .orderBy(col("node"))
      })
      case "dedup_containment" => Seq("unpinned" -> { (s, dir) =>
        // the pre-r19 containmentPairs body, verbatim, no pin
        val docs = graft.Tables.load(s, dir, "documents")
          .filter(col("doc_id") < 500)
          .select(col("doc_id"), col("text"))
        val grams = docs.select(col("doc_id").as("id"),
          explode(graft.operators.Dedup.charNgrams(col("text"), 8))
            .as("g"))
        val counts = grams.groupBy(col("id")).agg(count(lit(1)).as("ng"))
        val g = grams.join(counts, "id")
        g.as("a")
          .join(g.as("b"),
            col("a.g") === col("b.g") && col("a.id") < col("b.id"))
          .groupBy(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .agg(count(lit(1)).as("shared"), first(col("a.ng")).as("n_a"),
            first(col("b.ng")).as("n_b"))
          .withColumn("cont_bp",
            expr("(10000 * shared) div least(n_a, n_b)"))
          .filter(col("cont_bp") >= 9000L)
          .select(col("id_a"), col("id_b"), col("shared"), col("n_a"),
            col("n_b"), col("cont_bp"))
          .orderBy(col("id_a"), col("id_b"))
      })
      case "text_pmi" => Seq("marg-from-bg" -> { (s, dir) =>
        // the pre-r19 shape: marginals re-counted from the exploded
        // bigram stream (one scan+explode per marginal)
        val par = s.sparkContext.defaultParallelism
        val bg = graft.Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("text"))
          .repartition(par, col("doc_id"))
          .select(explode(graft.functions.word_shingles(
            graft.operators.Dedup.tokens(col("text")), 2)).as("pair"))
          .select(col("pair"),
            substring_index(col("pair"), " ", 1).as("w1"),
            substring_index(col("pair"), " ", -1).as("w2"))
        val pairCounts = bg.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("n_ab"))
        val firstCounts = bg.groupBy(col("w1"))
          .agg(count(lit(1)).as("n_a"))
        val secondCounts = bg.groupBy(col("w2"))
          .agg(count(lit(1)).as("n_b"))
        val total = bg.agg(count(lit(1)).as("n_total"))
        pairCounts.filter(col("n_ab") >= 3)
          .join(firstCounts, "w1")
          .join(secondCounts, "w2")
          .crossJoin(broadcast(total))
          .select(col("w1"), col("w2"), col("n_ab"), col("n_a"),
            col("n_b"),
            expr("(n_ab * n_total * 1000000) div (n_a * n_b)")
              .as("lift_micro"))
          .orderBy(col("lift_micro").desc, col("w1"), col("w2"))
          .limit(50)
      })
      case "text_prf_search" => Seq("per-consumer" -> { (s, dir) =>
        // the pre-r20 shape: every consumer re-derives from the raw
        // token stream (explode per consumer, no shared exchange)
        import s.implicits._
        val docs = graft.Tables.load(s, dir, "documents")
        val terms = Seq("spark", "window", "merge")
        val k = 10; val fbDocs = 5; val expTerms = 3
        val toks = docs.select(col("doc_id"),
            explode(split(lower(col("text")), " ")).as("term"))
          .filter(col("term") =!= "")
        val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val corpus = dl.agg(sum(col("dl")).as("len_corpus"))
        val n = docs.agg(count(lit(1)).as("n_corpus"))
        val q0 = terms.toDF("term")
        def bm25(termFrame: DataFrame): DataFrame = {
          val tf = toks.join(termFrame, "term")
            .groupBy(col("doc_id"), col("term"))
            .agg(count(lit(1)).as("tf"))
          val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
          tf.join(df, "term").join(dl, "doc_id")
            .crossJoin(n).crossJoin(corpus)
            .withColumn("w", graft.functions.idiv(
              lit(1000000L) * (col("n_corpus") + 1L), col("df") + 1L))
            .withColumn("contrib", graft.functions.idiv(
              col("w").cast("decimal(38,0)") * lit(22L) *
                col("len_corpus") * col("tf"),
              lit(10L) * col("len_corpus") * col("tf")
                + lit(3L) * col("len_corpus")
                + lit(9L) * col("n_corpus") * col("dl")))
            .groupBy(col("doc_id"))
            .agg(sum(col("contrib")).as("score"),
              count(lit(1)).as("n_terms"))
        }
        val fb = bm25(q0)
          .orderBy(col("score").desc, col("doc_id")).limit(fbDocs)
          .select(col("doc_id"))
        val dfAll = toks.select(col("doc_id"), col("term")).distinct()
          .groupBy(col("term")).agg(count(lit(1)).as("dfc"))
        val exp = toks.join(fb, "doc_id")
          .join(q0, Seq("term"), "left_anti")
          .groupBy(col("term")).agg(count(lit(1)).as("tf_fb"))
          .join(dfAll, "term").crossJoin(n)
          .withColumn("escore", col("tf_fb") * graft.functions.idiv(
            lit(1000000L) * (col("n_corpus") + 1L), col("dfc") + 1L))
          .orderBy(col("escore").desc, col("term")).limit(expTerms)
          .select(col("term"))
        bm25(q0.union(exp))
          .orderBy(col("score").desc, col("doc_id")).limit(k)
      })
      case "profile_corr_matrix" => Seq("dec-mul" -> { (s, dir) =>
        // the pre-r20 shape: per-row DECIMAL multiplies inside the
        // sufficient-statistic sums (dec(a) * b), verbatim
        import org.apache.spark.sql.Column
        val dec = (c: Column) => c.cast("decimal(38,0)")
        val cols = Seq("l_quantity" -> "qty", "l_extendedprice" -> "price",
          "l_discount" -> "disc", "l_tax" -> "tax")
        val b = graft.Tables.load(s, dir, "lineitem").select(cols.map {
          case (c, a) => round(col(c) * 100).cast("long").as(a) }: _*)
        val names = cols.map(_._2)
        val pairs = for {
          i <- names.indices; j <- (i + 1) until names.size
        } yield (names(i), names(j))
        val aggs =
          Seq(count(lit(1)).as("n")) ++
          names.map(a => sum(dec(col(a))).as(s"s_$a")) ++
          names.map(a => sum(dec(col(a)) * col(a)).as(s"ss_$a")) ++
          pairs.map { case (a, bb) =>
            sum(dec(col(a)) * col(bb)).as(s"sp_${a}_$bb") }
        val wide = b.agg(aggs.head, aggs.tail: _*)
        val rows = pairs.map { case (a, bb) =>
          struct(lit(a).as("col_a"), lit(bb).as("col_b"),
            col("n").as("n"),
            (dec(col("n")) * col(s"sp_${a}_$bb") -
              col(s"s_$a") * col(s"s_$bb")).as("num"),
            (dec(col("n")) * col(s"ss_$a") -
              col(s"s_$a") * col(s"s_$a")).as("den"),
            (dec(col("n")) * col(s"ss_$bb") -
              col(s"s_$bb") * col(s"s_$bb")).as("deny"))
        }
        wide.select(explode(array(rows: _*)).as("p"))
          .select(col("p.col_a").as("col_a"), col("p.col_b").as("col_b"),
            col("p.n").as("n"),
            when(col("p.den") =!= 0,
              col("p.num").cast("double") / col("p.den").cast("double"))
              .as("slope"),
            when(col("p.den") =!= 0 && col("p.deny") =!= 0,
              col("p.num").cast("double") * col("p.num").cast("double") /
                (col("p.den").cast("double") * col("p.deny").cast("double")))
              .as("r2"))
          .orderBy(col("col_a"), col("col_b"))
      })
      case _ => Seq.empty
    }

  def main(args: Array[String]): Unit = {
    Scratch.redirectTmpdir()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPS", "4").toInt
    val name = args.headOption.getOrElse(
      sys.error("usage: AbProbe <queryName>"))
    val spark = Sessions.builder("graft-ab-probe", s"local[$cpus]", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val variants =
      ("registry" -> SparkEntry.queries(name)) +: alternates(name)
    for (rep <- 1 to reps; (vn, f) <- variants) {
      // like-for-like builds: a registry variant that is a memoFrame
      // tenant would otherwise hit the cross-query memo on reps 2+
      // while the local alternate rebuilds from parquet every rep
      SparkEntry.evictMemos(spark)
      val before = spark.sparkContext.getPersistentRDDs.keySet
      val t0 = System.nanoTime()
      f(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      SparkEntry.sweepLeakedBlocks(spark, before)
      System.err.println(f"AB $name rep$rep $vn%-14s $t%7.2f s")
    }
    spark.stop()
  }
}
