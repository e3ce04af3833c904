package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic corpus-construction operators (split / mixture /
  * token budget).
  */
class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("fixedK: exactly k rows, rerun- and partitioning-stable, " +
      "via TakeOrderedAndProject") {
    import spark.implicits._
    val a = Sampling.fixedK(docs, 50).select("doc_id")
      .as[Long].collect().toSet
    assert(a.size == 50)
    val b = Sampling.fixedK(docs.repartition(13), 50).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b, "sample membership depends on partitioning")
    assert(Sampling.fixedK(docs, 10000).count() == docs.count(),
      "k larger than corpus returns everything")
    val plan = Sampling.fixedK(docs, 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("prioritySample: exactly k rows, rerun/partitioning-stable, " +
      "weight-dominant rows always selected, priorities exact") {
    import spark.implicits._
    val base = docs.select(col("doc_id"), col("n_chars"))
    val a = Sampling.prioritySample(base, 40, "n_chars")
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.prioritySample(base.repartition(13), 40, "n_chars")
      .select("doc_id").as[Long].collect().toSet
    assert(a.size == 40 && a == b, "not partitioning-stable")
    // a weight > 2³¹× every other row's has priority w/u above any
    // rival's even at the u extremes — it can never miss the sample
    // (and 2³³·10⁶ stays far inside the two-limb overflow bound)
    val whale = base.withColumn("n_chars",
      when(col("doc_id") === 7L, lit(1L << 33)).otherwise(lit(1L)))
    val w = Sampling.prioritySample(whale, 5, "n_chars")
      .select("doc_id").as[Long].collect().toSet
    assert(w.contains(7L), "heaviest row missed the sample")
    // two-limb priority pinned: exact long division of w/u to 10⁻¹²
    val got = Sampling.prioritySample(base, 1, "n_chars")
      .select(col("doc_id"), col("n_chars"), col("prio_unit"),
        col("prio_frac"))
      .as[(Long, Long, Long, Long)].head()
    val u = base.filter(col("doc_id") === got._1)
      .select(Sampling.scrambledRank(col("doc_id")) + lit(1L))
      .as[Long].head()
    val w6 = got._2 * 1000000L
    assert(got._3 == w6 / u && got._4 == (w6 % u) * 1000000L / u)
  }

  test("fixedKStratified: k rows per stratum, partitioning-stable, " +
      "with map-side WindowGroupLimit") {
    import spark.implicits._
    val k = 10
    val a = Sampling.fixedKStratified(docs, k, "source")
    val perStratum = a.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val sizes = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(perStratum.keySet == sizes.keySet, "a stratum vanished")
    perStratum.foreach { case (s, n) =>
      assert(n == math.min(k.toLong, sizes(s)), s"stratum $s: $n rows")
    }
    val b = Sampling.fixedKStratified(docs.repartition(13), k, "source")
      .select("doc_id").as[Long].collect().toSet
    assert(a.select("doc_id").as[Long].collect().toSet == b,
      "sample membership depends on partitioning")
    // the rank filter must push a group-limit below the shuffle: the
    // exchanged volume is then ~k rows per stratum, not the corpus
    val plan = a.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("hashSplit is deterministic, partition-independent, and near " +
      "the target fractions") {
    import spark.implicits._
    val a = Sampling.hashSplit(docs).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = Sampling.hashSplit(docs.repartition(7)).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b, "split must not depend on physical partitioning")
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.8) < 0.08, s"train ${frac("train")}")
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.1) < 0.06)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.1) < 0.06)
  }

  test("mixture: weight 0 drops a stratum, weight 1 keeps it whole, " +
      "and smaller weights select subsets") {
    import spark.implicits._
    def ids(w: Map[String, Double], default: Double): Set[Long] =
      Sampling.mixture(docs, "source", w, default)
        .select("doc_id").as[Long].collect().toSet
    val all = docs.select("doc_id").as[Long].collect().toSet
    assert(ids(Map.empty, 1.0) == all)
    val dropped = ids(Map("src0" -> 0.0), 1.0)
    val src0 = docs.filter(col("source") === "src0")
      .select("doc_id").as[Long].collect().toSet
    assert(dropped == all -- src0)
    val half = ids(Map.empty, 0.5)
    val quarter = ids(Map.empty, 0.25)
    assert(quarter.subsetOf(half) && half.subsetOf(all))
    assert(quarter.nonEmpty && half.size < all.size)
  }

  test("mixtureUpsampled: whole copies plus a deterministic fractional " +
      "share, downsampling agrees with mixture") {
    import spark.implicits._
    val up = Sampling.mixtureUpsampled(docs, "source",
      Map("src0" -> 2.5, "src1" -> 0.5), default = 1.0)
      .select("doc_id", "source", "copy")
      .as[(Long, String, Long)].collect()
    val bySrc = up.groupBy(_._2)
    val src0Docs = docs.filter(col("source") === "src0").count()
    val src0Copies = bySrc("src0").length
    // every src0 doc appears at least twice, at most thrice; the
    // fractional third copies are strictly between none and all
    assert(bySrc("src0").groupBy(_._1).values.forall(c =>
      c.length >= 2 && c.length <= 3))
    assert(src0Copies > 2 * src0Docs && src0Copies < 3 * src0Docs)
    // copy indices are 1..copies with no gaps
    for ((_, rows) <- up.groupBy(r => (r._1, r._2)))
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    // weight 0.5 stratum reduces to mixture's decision exactly
    val downIds = bySrc("src1").map(_._1).toSet
    val mixIds = Sampling.mixture(docs.filter(col("source") === "src1"),
      "source", Map("src1" -> 0.5)).select("doc_id").as[Long].collect().toSet
    assert(downIds == mixIds)
    // default weight 1.0 strata appear exactly once per doc
    assert(bySrc.view.filterKeys(s => s != "src0" && s != "src1").values
      .forall(_.groupBy(_._1).values.forall(_.length == 1)))
  }

  test("tokenBudget admits docs in stable hash order until the budget " +
      "and excludes the first overflow") {
    import spark.implicits._
    val withTokens = docs.withColumn("n_tokens",
      when(length(trim(col("text"))) === 0, lit(0L))
        .otherwise((length(col("text")) -
          length(replace(col("text"), lit(" "))) + 1).cast("long")))
    val budget = 500L
    val kept = Sampling.tokenBudget(withTokens, col("n_tokens"), budget,
      strataCol = "source")
      .select("source", "doc_id", "n_tokens", "cum_tokens")
      .as[(String, Long, Long, Long)].collect()
    assert(kept.nonEmpty)
    // per-stratum: cum_tokens is the running sum in (bucket, id) order
    // and never exceeds the budget
    assert(kept.forall(_._4 <= budget))
    val order = withTokens.select(col("source"), col("doc_id"),
      Sampling.bucket(col("doc_id")).as("bk"), col("n_tokens"))
      .as[(String, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(r => (r._3, r._2))).toMap
    for ((src, rows) <- kept.groupBy(_._1)) {
      val expected = order(src).scanLeft(0L)(_ + _._4).drop(1)
        .zip(order(src)).takeWhile(_._1 <= budget)
        .map { case (cum, r) => (r._2, cum) }
      assert(rows.sortBy(_._2).map(r => (r._2, r._4)).toSeq ==
        expected.sortBy(_._1).toSeq, s"stratum $src")
    }
    // a huge budget keeps everything
    val allKept = Sampling.tokenBudget(withTokens, col("n_tokens"),
      Long.MaxValue, strataCol = "source").count()
    assert(allKept == docs.count())
  }

  test("packSequences: concat-and-chop invariants per shard") {
    import spark.implicits._
    val budget = 256L
    val packed = Sampling.packSequences(docs,
      graft.operators.TextStats.nTokens(col("text")), budget)
      .select("doc_id", "shard", "n_tokens", "bin", "offset")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(packed.size == docs.count())
    // offsets live inside a sequence; bins/offsets are the chop of the
    // per-shard running token stream in doc_id order
    assert(packed.forall { case (_, _, _, bin, off) =>
      bin >= 0 && off >= 0 && off < budget })
    for ((_, rows) <- packed.groupBy(_._2)) {
      var cum = 0L
      for ((_, _, nTok, bin, off) <- rows.sortBy(_._1)) {
        assert(bin == cum / budget && off == cum % budget)
        cum += nTok
      }
    }
    // shards are deterministic and near-uniform (each ≤ 3x the mean)
    val sizes = packed.groupBy(_._2).view.mapValues(_.size)
    assert(sizes.values.max <= 3 * packed.size / sizes.size)
  }

  test("packedText materializes each bin's members in id order") {
    import spark.implicits._
    val budget = 256L
    val toks = graft.operators.TextStats.nTokens(col("text"))
    val meta = Sampling.packSequences(docs, toks, budget)
      .select("doc_id", "shard", "n_tokens", "bin")
      .as[(Long, Long, Long, Long)].collect()
    val text = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toMap
    val expected = meta.groupBy(r => (r._2, r._4)).map { case (k, rows) =>
      val sorted = rows.sortBy(_._1)
      k -> (sorted.length.toLong, sorted.map(_._3).sum,
        sorted.map(r => text(r._1)).mkString(" "))
    }
    val got = Sampling.packedText(docs, toks, budget)
      .select("shard", "bin", "n_docs", "n_tokens", "text")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == expected)
  }

  test("splitByCluster: no near-dup pair ever straddles a split " +
      "boundary; singletons follow the plain hash split") {
    import spark.implicits._
    val docs = (1L to 200L).toDF("doc_id")
    // chain 1-2-3 must move as one cluster; 10-11 as another
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.splitByCluster(docs, pairs)
      .select(col("doc_id"), col("split_key"), col("split"))
      .as[(Long, Long, String)].collect()
    val byId = out.map(r => r._1 -> r).toMap
    assert(out.length == 200)
    // the leakage invariant: paired docs share key AND split
    for ((a, b) <- Seq((1L, 2L), (2L, 3L), (10L, 11L))) {
      assert(byId(a)._2 == byId(b)._2, s"$a/$b split_key diverged")
      assert(byId(a)._3 == byId(b)._3, s"$a/$b straddle a boundary")
    }
    // docs in no pair: own key, same assignment as hashSplit
    val plain = Sampling.hashSplit((1L to 200L).toDF("doc_id"))
      .as[(Long, String)].collect().toMap
    out.filter(r => !Seq(1L, 2L, 3L, 10L, 11L).contains(r._1))
      .foreach { r =>
        assert(r._2 == r._1 && r._3 == plain(r._1), s"singleton ${r._1}")
      }
  }

  test("greedyCoverage: marginal gains shrink as grams get covered, " +
      "ties break to the smaller id, saturation exits early") {
    import spark.implicits._
    // doc1 grams {abc,bcd}; doc2 {bcd,cde}; doc3 {abc} (fully covered
    // after doc1) — k=3 must stop at 2 picks
    val docs = Seq((1L, "a b c d"), (2L, "b c d e"), (3L, "a b c"))
      .toDF("doc_id", "text")
    val got = graft.operators.Sampling.greedyCoverage(docs, k = 3)
      .orderBy("rank").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 2L), (2L, 2L, 1L)))
  }

  test("timeSplitAudit: boundary from the data's own day span, " +
      "embargo rows quarantined, train∩test user overlap reported") {
    import spark.implicits._
    // 10 days (0..9), trainPct 70 → t0 = day 7; embargo days 7-8;
    // test day 9. user 1 spans train+test (leaks), user 2 train-only,
    // user 3 test-only, user 4 embargo-only.
    def ts(day: Int) = java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plus(java.time.Duration.ofDays(day)))
    val ev = Seq((1L, ts(0)), (1L, ts(9)), (2L, ts(3)), (3L, ts(9)),
      (4L, ts(7)), (4L, ts(8))).toDF("user_id", "ts")
    val got = graft.operators.Sampling.timeSplitAudit(ev)
      .orderBy("split")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("embargo", 2L, 1L, 7L, 8L, 1L),
      ("test", 2L, 2L, 9L, 9L, 1L),
      ("train", 2L, 2L, 0L, 3L, 1L)))
  }

  test("qualityTieredKeep: integer quality tiers get graded keep " +
      "rates; a 100% tier keeps everything, a 0% tier nothing") {
    import spark.implicits._
    // scored rows built directly: (doc_id, n_chars_m, n_punct,
    // stop_hits). iq = max(0, 1e6·stop − 1e4·punct) div chars.
    val scored = Seq(
      (1L, 100L, 0L, 0L),   // iq = 0      → tier 0
      (2L, 100L, 0L, 1L),   // iq = 10000  → tier 2
      (3L, 50L, 0L, 1L),    // iq = 20000  → tier 3
      (4L, 100L, 2000L, 1L), // negative numerator clamps → iq 0, tier 0
      (5L, 0L, 0L, 0L)      // empty doc: defined iq = 0
    ).toDF("doc_id", "n_chars_m", "n_punct", "stop_hits")
    val all = graft.operators.Sampling.qualityTieredKeep(scored,
      keepPct = Seq(100, 100, 100, 100))
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(all.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L))
    assert(all.map(r => r._1 -> r._2).toMap ==
      Map(1L -> 0L, 2L -> 2L, 3L -> 3L, 4L -> 0L, 5L -> 0L))
    // zero the top tier: doc 3 must vanish, everything else stays
    val zeroTop = graft.operators.Sampling.qualityTieredKeep(scored,
      keepPct = Seq(100, 100, 100, 0))
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(zeroTop == Set(1L, 2L, 4L, 5L))
    // keep decisions are deterministic (same bucket machinery as
    // hashSplit): two runs agree
    val p10 = graft.operators.Sampling.qualityTieredKeep(scored,
      keepPct = Seq(10, 10, 10, 10))
      .as[(Long, Long, Long)].collect().map(_._1).toSet
    assert(graft.operators.Sampling.qualityTieredKeep(scored,
      keepPct = Seq(10, 10, 10, 10))
      .as[(Long, Long, Long)].collect().map(_._1).toSet == p10)
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.qualityTieredKeep(scored,
        keepPct = Seq(101))
    }
  }

  test("isqrt: exact at squares and off-by-one neighbors up to 10^12") {
    import spark.implicits._
    val xs = Seq(0L, 1L, 2L, 3L, 4L, 99L, 100L, 101L,
      999999999999L, 1000000000000L, 1000000000001L,
      999998000001L - 1, 999998000001L) // (10^6-1)^2 ± 1
    val got = xs.toDF("x")
      .select(col("x"), Sampling.isqrt(col("x")).as("s"))
      .as[(Long, Long)].collect().toMap
    xs.foreach { x =>
      val s = got(x)
      assert(s * s <= x && (s + 1) * (s + 1) > x, s"isqrt($x) = $s")
    }
  }

  test("mixtureTemperature: alpha=1/2 keep rates exact, smallest " +
      "stratum kept whole, membership partitioning-stable") {
    import spark.implicits._
    val df = ((1L to 100L).map(i => (i, "small")) ++
      (101L to 500L).map(i => (i, "big"))).toDF("doc_id", "source")
    val rows = Sampling.mixtureTemperature(df, "source")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // small: n_min/n = 1 -> keep everything at 10^6 ppm
    assert(rows("small") == ((100L, 1000000L, 100L)))
    // big: sqrt(100/400) = 1/2 -> exactly 500000 ppm; realized count
    // is the deterministic draw, strictly thinned but non-empty
    val (nBig, ppmBig, keptBig) = rows("big")
    assert(nBig == 400L && ppmBig == 500000L)
    assert(keptBig > 0L && keptBig < 400L)
    val again = Sampling.mixtureTemperature(df.repartition(13), "source")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(again == rows, "not partitioning-stable")
  }

  test("bucketUniformity: scrambled ids pass the 99-df gate, a " +
      "single-bucket pile fails it, empty buckets count as evidence") {
    import spark.implicits._
    val ok = Sampling.bucketUniformity(
      (0L until 10000L).toDF("doc_id")).head()
    assert(ok.getAs[Long]("n_rows") == 10000L &&
      ok.getAs[Long]("n_buckets") == 100L &&
      ok.getAs[Boolean]("uniform_ok"),
      s"chi2=${ok.getAs[Long]("chi2_micro")}")
    // every row the same id -> one bucket holds all mass; the 99
    // empty buckets must drive chi2 to 99n micro-exactly
    val bad = Sampling.bucketUniformity(
      Seq.fill(500)(7L).toDF("doc_id")).head()
    assert(!bad.getAs[Boolean]("uniform_ok"))
    assert(bad.getAs[Long]("chi2_micro") == 99L * 500L * 1000000L,
      "degenerate chi2 must be exactly 99n")
  }

  test("poissonBootstrap: constant values collapse every replicate " +
      "mean to the estimate (zero variance), deterministic across " +
      "partitionings") {
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, "s", 10L))
      .toDF("doc_id", "source", "v")
    val got = Sampling.poissonBootstrap(df, "source", "v", b = 8)
      .as[(String, Long, Long, Long)].collect().toSeq
    // (1000·10·sw) div sw = 10000 for every replicate -> variance 0
    assert(got == Seq(("s", 50L, 10000L, 0L)))
    val spread = (0L until 50L).map(i => (i, "s", i)).toDF(
      "doc_id", "source", "v")
    val a = Sampling.poissonBootstrap(spread, "source", "v", b = 8)
      .as[(String, Long, Long, Long)].collect().toSeq
    val b2 = Sampling.poissonBootstrap(spread.repartition(9),
      "source", "v", b = 8)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(a == b2, "bootstrap weights depend on partitioning")
    // non-constant values: replicate means scatter -> variance > 0
    assert(a.head._4 > 0L)
    intercept[IllegalArgumentException] {
      Sampling.poissonBootstrap(df, "source", "v", b = 1)
    }
  }

  test("neymanAllocation: w = N·S exactly, constant strata get zero, " +
      "allocations split the budget proportionally") {
    import spark.implicits._
    // "hi": N=4, values 0/20/0/20 -> rad = 4·800 − 40² = 1600, w = 40
    // (= N·S with S = 10); "lo": constant -> S = 0 -> w = 0
    val df = (Seq.fill(4)(("lo", 10L)) ++
      Seq(("hi", 0L), ("hi", 20L), ("hi", 0L), ("hi", 20L)))
      .toDF("source", "n_chars")
    val got = Sampling.neymanAllocation(df, "source", "n_chars", k = 10L)
      .orderBy("source")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("hi", 4L, 40L, 10L), ("lo", 4L, 0L, 0L)))
    intercept[IllegalArgumentException] {
      Sampling.neymanAllocation(df, "source", "n_chars", k = 0L)
    }
  }

  test("neymanApply: draws exactly alloc_h per stratum, the fixedK " +
      "rank order decides WHICH, and the draw is partitioning-stable") {
    import spark.implicits._
    // same fixture as the allocation test but with ids: hi gets the
    // whole budget (alloc 10 > its 4 docs -> all 4), lo gets 0
    val df = ((1L to 4L).map(i => (i, "lo", 10L)) ++
      Seq((11L, "hi", 0L), (12L, "hi", 20L), (13L, "hi", 0L),
        (14L, "hi", 20L))).toDF("doc_id", "source", "n_chars")
    val got = Sampling.neymanApply(df, "source", "n_chars", k = 10L)
      .orderBy("source", "doc_id")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("hi", 11L), ("hi", 12L), ("hi", 13L),
      ("hi", 14L)))
    val rep = Sampling.neymanApply(df.repartition(7), "source",
        "n_chars", k = 10L)
      .orderBy("source", "doc_id")
      .as[(String, Long)].collect().toSeq
    assert(rep == got, "draw must be partitioning-stable")
  }

  test("interleave: strict round-robin while strata last, epoch order " +
      "within stratum, partitioning-stable") {
    import spark.implicits._
    val df = (Seq((1L, "a"), (2L, "a"), (3L, "a"), (10L, "b"), (11L, "b")))
      .toDF("doc_id", "source")
    val got = Sampling.interleave(df, "source", limit = 10)
      .as[(Long, String, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 1L, 2L, 3L, 4L))
    assert(got.map(_._2) == Seq("a", "b", "a", "b", "a"))
    assert(got.filter(_._2 == "a").map(_._3).toSet == Set(1L, 2L, 3L))
    assert(got.filter(_._2 == "b").map(_._3).toSet == Set(10L, 11L))
    val again = Sampling.interleave(df.repartition(7), "source",
      limit = 10).as[(Long, String, Long)].collect().toSeq
    assert(again == got)
  }

  test("lengthBatches: full batches pad to zero waste, remainder and " +
      "mixed-length bands account waste exactly") {
    import spark.implicits._
    // band 0: 20 docs of 10 tokens -> batches of 8/8/4, waste 0
    // band 1: 3 docs of 17/18/31 tokens -> one batch, max 31
    val docs = ((1L to 20L).map(i => (i, 10L)) ++
      Seq((21L, 17L), (22L, 18L), (23L, 31L))).toDF("doc_id", "n")
    val got = Sampling.lengthBatches(docs, col("n"),
      batchSize = 8, bandWidth = 16L)
      .orderBy("band", "batch")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val band0 = got.filter(_._1 == 0L)
    assert(band0.map(_._3) == Seq(8L, 8L, 4L), got.mkString(","))
    assert(band0.forall(r => r._4 == 10L && r._6 == 0L))
    val Seq(b1) = got.filter(_._1 == 1L)
    assert(b1._3 == 3L && b1._4 == 31L && b1._5 == 66L)
    // waste = (3*31 - 66) / 93 = 27/93 in ppm, truncated
    assert(b1._6 == 1000000L * 27 / 93)
    // epoch shuffle is deterministic: repartition changes nothing
    val again = Sampling.lengthBatches(docs.repartition(7), col("n"),
      batchSize = 8, bandWidth = 16L)
      .orderBy("band", "batch")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("matchDistribution: exact per-bucket weights and keep " +
      "probabilities; the heaviest bucket keeps everything") {
    import spark.implicits._
    // src (even ids): 16 docs in bucket 1, 4 in bucket 2; ref (odd
    // ids): 5 in each plus 2 in REF-ONLY bucket 5 (n_ref = 12 — the
    // ref-only mass counts in the total but emits no row: rejection
    // cannot conjure it). w_b1 = (5*20*1e4)//(16*12) = 5208, w_b2 =
    // (5*20*1e4)//(4*12) = 20833 -> p_b1 = 2499, p_b2 = 10000.
    val docs = (
      (0 until 32 by 2).map(i => (i.toLong, 150L)) ++
      (32 until 40 by 2).map(i => (i.toLong, 250L)) ++
      (1 until 10 by 2).map(i => (i.toLong, 150L)) ++
      (11 until 20 by 2).map(i => (i.toLong, 250L)) ++
      Seq((21L, 550L), (23L, 550L))
    ).toDF("doc_id", "n_chars")
    val got = Sampling.matchDistribution(docs)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) == Seq(
      (1L, 16L, 5L, 5208L, 2499L),
      (2L, 4L, 5L, 20833L, 10000L)), got.mkString(","))
    val Seq(b1, b2) = got
    assert(b2._6 == 4L) // p = 10000 keeps every source doc
    assert(b1._6 >= 0L && b1._6 <= 16L)
    // deterministic rejection: a reshuffle changes nothing
    val again = Sampling.matchDistribution(docs.repartition(7))
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("truncationLoss: exact per-source token loss at the cut, NULL " +
      "for a zero-token source") {
    import spark.implicits._
    val long130 = (1 to 130).map(_ => "w").mkString(" ")
    val docs = Seq((1L, "A", "a b c"), (2L, "A", long130),
      (3L, "B", "")).toDF("doc_id", "source", "text")
    val got = Sampling.truncationLoss(docs, maxLen = 128L)
      .as[(String, Long, Long, Long, Long, Option[Long])]
      .collect().toSeq
    // A: 133 tokens, 131 kept, 1 doc truncated, lost 2/133 -> 150 bp
    assert(got == Seq(
      ("A", 2L, 133L, 131L, 1L, Some(150L)),
      ("B", 1L, 0L, 0L, 0L, None)), got.mkString(","))
  }

  test("sourceConcentration: exact shares, HHI, and effective-domain " +
      "count on a hand-computed 3:1 split") {
    import spark.implicits._
    // A: 3 tokens, B: 1 -> shares 750000/250000 ppm; HHI =
    // (75e4^2 + 25e4^2) // 1e6 = 625000; eff = 1e8 // 625000 = 160
    val docs = Seq((1L, "A", "a b c"), (2L, "B", "q"))
      .toDF("doc_id", "source", "text")
    val got = Sampling.sourceConcentration(docs)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("A", 3L, 750000L, 625000L, 160L),
      ("B", 1L, 250000L, 625000L, 160L)), got.mkString(","))
  }

  test("mixtureEpochs: exact recipe table — zero-weight domain drops " +
      "to 0 target tokens, upsampled domains exceed 10000 bp epochs") {
    import spark.implicits._
    // tokens: A = 4 (2 docs x "a b"), B = 3, C = 1; weights A=0,
    // B=5000, default 7500 -> wsum 12500; budget = 8*3//2 = 12.
    // targets: A 0, B 4, C 7; epochs: A 0, B 13333, C 70000.
    val docs = Seq((1L, "A", "a b"), (2L, "A", "a b"),
      (3L, "B", "x y z"), (4L, "C", "q"))
      .toDF("doc_id", "source", "text")
    val got = Sampling.mixtureEpochs(docs, "source",
      Map("A" -> 0L, "B" -> 5000L), defaultBp = 7500L,
      budgetNum = 3L, budgetDen = 2L)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      ("A", 4L, 0L, 0L, Some(0L)),
      ("B", 3L, 5000L, 4L, Some(13333L)),
      ("C", 1L, 7500L, 7L, Some(70000L))), got.mkString(","))
  }

  test("mixtureReweight: uniform-difficulty corpus leaves every " +
      "factor at 10^4 and shares at weight ratio + uniform floor; " +
      "a below-mean domain gets the exact linearized Hedge factor") {
    import spark.implicits._
    // identical text -> identical qualityCbp -> cmean = every mean
    // -> excess 0 -> factor 10000 for all; w_raw = w_bp. shares:
    // A 2500/10000, B 7500/10000; eps = 0 -> ppm exactly 250000 /
    // 750000.
    val uni = Seq((1L, "A", "the cat"), (2L, "B", "the cat"))
      .toDF("doc_id", "source", "text")
    val got = Sampling.mixtureReweight(uni, "source",
      Map("A" -> 2500L), defaultBp = 7500L, etaBp = 5000L, epsBp = 0L)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._4, r._5, r._6)) == Seq(
      ("A", 0L, 10000L, 250000L), ("B", 0L, 10000L, 750000L)), got)
    // B's punct-heavy text sits below the corpus mean -> excess > 0
    // -> factor = 10^4 + (eta * excess) div 10^4, replicated exactly
    val skew = Seq((1L, "A", "the and of to"), (2L, "B", "!!!!"))
      .toDF("doc_id", "source", "text")
    val g2 = Sampling.mixtureReweight(skew, "source", Map.empty,
      defaultBp = 10000L, etaBp = 5000L, epsBp = 1000L)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    val qa = (1000000L * 4 - 10000L * 0) / 13  // qualityCbp("the and of to")
    val qb = (1000000L * 0 - 10000L * 4) / 4   // qualityCbp("!!!!")
    val cmean = (qa + qb) / 2
    val excess = math.max(cmean - qb, 0L)
    val factor = 10000L + (5000L * excess) / 10000L
    val rawA = 10000L; val rawB = 10000L * factor / 10000L
    val sraw = rawA + rawB
    def ppm(raw: Long) =
      (10000L - 1000L) * (1000000L * raw / sraw) / 10000L +
        1000000L * 1000L / (10000L * 2)
    assert(g2 == Seq(("A", 1L, qa, 0L, 10000L, ppm(rawA)),
      ("B", 1L, qb, excess, factor, ppm(rawB))), g2)
  }

  test("curriculumStages: bucket-grain quartiles with exact hand-" +
      "computed difficulty ranges, partition-invariant") {
    import spark.implicits._
    // qualityCbp per doc: "!!!!" -> -10000, "ab!" -> -3333,
    // "abcd"/"x y z" -> 0, "the x"/"and x" -> 200000, "of x" ->
    // 250000, "the of" -> 333333. Buckets (div 250) are all distinct
    // except the two zero docs and the two 200000 docs -> cum counts
    // 0,1,2,4,6,7 -> stages 0,0,1,1,2,2,3,3: perfect quartiles.
    val docs = Seq(
      (1L, "!!!!"), (2L, "ab!"), (3L, "abcd"), (4L, "x y z"),
      (5L, "the x"), (6L, "and x"), (7L, "of x"), (8L, "the of"))
      .map { case (id, t) => (id, t, t.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    val got = Sampling.curriculumStages(docs, stages = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, -10000L, -3333L, 7L),
      (1L, 2L, 0L, 0L, 9L),
      (2L, 2L, 200000L, 200000L, 10L),
      (3L, 2L, 250000L, 333333L, 10L)), got.mkString(","))
    val again = Sampling.curriculumStages(docs.repartition(5), stages = 4)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(again == got)
  }
}
