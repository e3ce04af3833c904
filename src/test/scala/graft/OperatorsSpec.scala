package graft

import graft.operators.{Events, ProgressMeter, SkewJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("progress meter counts input rows across tasks (F12)") {
    val logged = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val m = ProgressMeter.attach(spark, every = 1000, log = s => logged.add(s))
    try {
      Tables.load(spark, dir, "lineitem").count()
      // listener bus is async; poll for delivery
      val deadline = System.currentTimeMillis() + 10000
      while (m.totalRows < 6000L && System.currentTimeMillis() < deadline) {
        Thread.sleep(50)
      }
      assert(m.totalRows >= 6000L)
      assert(!logged.isEmpty)
      assert(logged.peek().matches("Read records: [\\d,]+ processing time: [\\d,]+ msec"))
    } finally ProgressMeter.detach(spark, m)
  }

  test("salted join equals plain join (values) and spreads the key") {
    import spark.implicits._
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    val plain = li.join(o, Seq("l_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    val salted = SkewJoin.saltedJoin(li, o, Seq("l_orderkey"), 8)
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toSet
    assert(salted == plain)
  }

  test("sql-registered functions match the Column API") {
    import spark.implicits._
    graft.functions.registerSql(spark)
    Tables.load(spark, dir, "documents").createOrReplaceTempView("graft_documents")
    val viaSql = spark.sql(
      "SELECT sdbm_hash(doc_id, text) FROM graft_documents ORDER BY doc_id")
      .as[Long].collect().toSeq
    val viaCol = Tables.load(spark, dir, "documents")
      .orderBy("doc_id")
      .select(graft.functions.sdbm_hash(col("doc_id"), col("text")))
      .as[Long].collect().toSeq
    assert(viaSql == viaCol)
    val gramsSql = spark.sql(
      "SELECT size(char_ngrams(text, 5)) FROM graft_documents ORDER BY doc_id")
      .as[Int].collect().toSeq
    val gramsCol = Tables.load(spark, dir, "documents")
      .orderBy("doc_id")
      .select(size(graft.functions.char_ngrams(col("text"), 5)))
      .as[Int].collect().toSeq
    assert(gramsSql == gramsCol && gramsSql.exists(_ > 0))
  }

  test("streaming sessionize equals batch sessionize") {
    import spark.implicits._
    val batch = Events.sessionize(Tables.load(spark, dir, "events"))
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .as[(Long, String, String, Long)].collect().toSet
    val stream = graft.streaming.EventsStream
      .sessionizeToCompletion(spark, dir)
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .as[(Long, String, String, Long)].collect().toSet
    assert(stream == batch)
    assert(batch.nonEmpty)
    // the replay splits the fixture at the median timestamp into two
    // micro-batches: sessions crossing that instant can only be right
    // if GroupState carried the open session across batches — make
    // sure the fixture actually exercises that path
    val ev = Tables.load(spark, dir, "events")
    val r = ev.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .head()
    val mid = graft.streaming.EventsStream
      .splitInstant(ev, r.getLong(0), r.getLong(1))
    val spanning = Events.sessionize(ev)
      .filter(unix_micros(col("session_start")) < mid &&
        unix_micros(col("session_end")) >= mid)
      .count()
    assert(spanning > 0, "no session spans the micro-batch split — " +
      "the cross-batch state path is untested by this fixture")
  }

  test("transformWithState sessionize equals batch sessionize (typed " +
      "ValueState + explicit event-time timers, RocksDB provider)") {
    import spark.implicits._
    val batch = Events.sessionize(Tables.load(spark, dir, "events"))
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .as[(Long, String, String, Long)].collect().toSet
    val stream = graft.streaming.EventsStream
      .sessionizeTwsToCompletion(spark, dir)
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .as[(Long, String, String, Long)].collect().toSet
    assert(stream == batch)
    assert(batch.nonEmpty)
  }

  test("warm-start sessionize: batch history + bootstrapped initial " +
      "state + post-cutover stream equals the all-batch sessionize") {
    import spark.implicits._
    val batch = Events.sessionize(Tables.load(spark, dir, "events"))
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .as[(Long, String, String, Long)].collect().toSet
    val warm = graft.streaming.EventsStream
      .sessionizeWarmStartToCompletion(spark, dir)
      .select(col("user_id"), col("session_start").cast("string"),
        col("session_end").cast("string"), col("n_events"))
      .as[(Long, String, String, Long)].collect().toSet
    // the cutover bisects an open session (splitInstant), so equality
    // here proves the bootstrapped state actually merged with
    // post-cutover events — not just that both halves were disjoint
    assert(warm == batch)
    assert(batch.nonEmpty)
  }

  test("asof join: latest right row at-or-before, null when none precedes") {
    import spark.implicits._
    import graft.operators.AsOfJoin
    val left = Seq((1L, 5L), (1L, 10L), (2L, 1L), (3L, 4L))
      .toDF("k", "t")
    val right = Seq((1L, 5L, "a"), (1L, 7L, "b"), (2L, 3L, "c"))
      .toDF("rk", "rt", "v")
    val got = AsOfJoin.asofJoin(left, right, "k", "rk", "t", "rt",
      Seq("v", "rt"))
      .orderBy("k", "t")
      .select(col("k"), col("t"), col("v"))
      .as[(Long, Long, Option[String])].collect().toSeq
    assert(got == Seq(
      (1L, 5L, Some("a")),   // inclusive match at equal time
      (1L, 10L, Some("b")),  // latest preceding
      (2L, 1L, None),        // nothing precedes
      (3L, 4L, None)))       // key absent on right
  }

  test("nearestJoin: tolerance-filtered bidirectional match, nearer " +
      "side wins, exact ties go backward, absent key yields null") {
    import graft.operators.AsOfJoin
    import spark.implicits._
    val left = Seq((1L, 1L, 100L), (2L, 1L, 91L), (3L, 2L, 50L),
      (5L, 3L, 95L)).toDF("id", "k", "t")
    val right = Seq((1L, 90L, "A"), (1L, 105L, "B"),
      (3L, 90L, "C"), (3L, 100L, "D")).toDF("rk", "rt", "v")
    val got = AsOfJoin.nearestJoin(left, right, "k", "rk", "t", "rt",
        Seq("v"), toleranceUs = 5L)
      .orderBy("id")
      .select(col("id"), col("v"), col("gap_us"))
      .as[(Long, Option[String], Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, Some("B"), Some(5L)), // forward nearer (5 vs 10), at tol
      (2L, Some("A"), Some(1L)), // backward nearer
      (3L, None, None),          // key absent on right
      (5L, Some("C"), Some(5L)))) // exact 5/5 tie → backward
  }

  test("GraftExtensions injects SQL functions at session construction") {
    import spark.implicits._
    // newSession drops temp-function registrations but keeps the
    // session extensions — resolving here proves the injection path,
    // not a leftover registerSql call from another suite
    val fresh = spark.newSession()
    val viaExt = fresh.sql("SELECT sdbm_hash(0, 'abc') AS h")
      .as[Long].collect().head
    val viaApi = Seq("abc").toDF("s")
      .select(graft.functions.sdbm_hash(lit(0L), col("s")))
      .as[Long].collect().head
    assert(viaExt == viaApi)
    assert(fresh.sql("SELECT char_ngrams('abcd', 3) AS g")
      .as[Seq[String]].collect().head == Seq("abc", "bcd"))
  }

  test("profile: one row per column with null/distinct/minmax stats") {
    import spark.implicits._
    import graft.operators.Profile
    val df = Seq((Some(1L), "a"), (None, "b"), (Some(3L), "b"))
      .toDF("id", "s")
    val got = Profile.table(df).orderBy("col_name")
      .as[(String, Long, Long, Long, Option[String], Option[String])]
      .collect().toSeq
    assert(got == Seq(
      ("id", 3L, 1L, 2L, Some("1"), Some("3")),
      ("s", 3L, 0L, 2L, Some("a"), Some("b"))))
    // approx mode keeps the same shape (counts are HLL estimates)
    val approx = Profile.table(df, approxDistinct = true)
    assert(approx.columns.toSeq ==
      Seq("col_name", "n", "n_null", "n_distinct", "min_s", "max_s"))
    assert(approx.count() == 2)
  }

  test("approxTable: sketch estimates stay within bound of the exact " +
      "pass; quantiles only on numeric columns") {
    import spark.implicits._
    import graft.operators.Profile
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = Profile.table(docs)
      .select("col_name", "n", "n_null", "n_distinct")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val approx = Profile.approxTable(docs)
      .as[(String, Long, Long, Long,
        Option[Double], Option[Double], Option[Double])].collect()
    assert(approx.map(_._1).sorted.toSeq == exact.keys.toList.sorted)
    approx.foreach { case (c, n, nNull, nd, p50, p95, p99) =>
      val (_, en, enNull, end) = exact(c)
      assert(n == en && nNull == enNull, s"$c: exact counts must be exact")
      // HLL at relativeSD=0.05: allow 3 standard deviations = 15%
      assert(math.abs(nd - end) <= math.max(1L, (end * 0.15).toLong),
        s"$c: approx_distinct $nd vs exact $end")
      assert((p50.isDefined && p95.isDefined && p99.isDefined) ==
        Seq("doc_id", "n_chars").contains(c),
        s"$c: quantiles must exist exactly for numeric columns")
    }
    // quantile error bound: percentile_approx at accuracy 10000 on a
    // 500-row column is rank-exact; check p50 against the sorted truth
    val chars = docs.select("n_chars").as[Long].collect().sorted
    val p50 = approx.find(_._1 == "n_chars").get._5.get
    assert(chars.contains(p50.toLong))
    val lowerRank = chars.count(_ < p50.toLong)
    assert(math.abs(lowerRank - chars.length / 2) <= chars.length / 100,
      s"p50 rank off: $lowerRank of ${chars.length}")
  }

  test("histogram bins cover the range; constant columns take one bin") {
    import spark.implicits._
    import graft.operators.Profile
    val h = Profile.histogram(
      (0L to 99L).toDF("v"), "v", nBins = 10)
      .orderBy("bin").as[(Long, Long, Long, Long)].collect().toSeq
    // range 0..99, width ceil(100/10)=10: ten full bins of 10
    assert(h == (0L to 9L).map(i => (i, i * 10, (i + 1) * 10, 10L)))
    val const = Profile.histogram(Seq(5L, 5L, 5L).toDF("v"), "v")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(const == Seq((0L, 5L, 6L, 3L))) // zero range -> width 1
  }

  test("equi-depth histogram balances counts on skewed data where " +
      "equi-width cannot; approx path stays near exact") {
    import spark.implicits._
    import graft.operators.Profile
    // heavy skew: 900 values at 1..9, a thin tail to 10000
    val vals = (1 to 900).map(i => (i % 9 + 1).toLong) ++
      (1 to 100).map(i => (i * 100).toLong)
    val df = vals.toDF("v")
    val eq = Profile.equiDepthHistogram(df, "v", nBins = 4, exact = true)
      .as[(Int, Double, Double, Long)].collect().sortBy(_._1)
    assert(eq.map(_._4).sum == 1000L)
    // every bin within 2x of the ideal 250 (ties on tiny domains skew)
    eq.foreach { case (b, lo, hi, n) =>
      assert(n <= 500, s"bin $b holds $n of 1000")
      assert(lo <= hi)
    }
    // ranges are disjoint and ordered
    eq.sliding(2).foreach {
      case Array((_, _, hi1, _), (_, lo2, _, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // equi-width on the same data: one bin hoards ~90% — the contrast
    val ew = Profile.histogram(df, "v", nBins = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(ew.map(_._4).max >= 900L)
    // approx boundaries agree with exact on this size
    val ap = Profile.equiDepthHistogram(df, "v", nBins = 4)
      .as[(Int, Double, Double, Long)].collect().sortBy(_._1)
    assert(ap.map(_._4).sum == 1000L)
    assert(ap.map(_._1).toSeq == eq.map(_._1).toSeq)
  }

  test("fk orphans surfaces child rows without a parent key") {
    import spark.implicits._
    import graft.operators.Profile
    val child = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "pid")
    val parent = Seq((10L, "a"), (30L, "c")).toDF("pk", "name")
    val got = Profile.fkOrphans(child, parent, "pid", "pk")
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("heavy hitters orders by count then value, capped at k") {
    import spark.implicits._
    import graft.operators.Profile
    val df = Seq("a", "a", "a", "c", "c", "b", "b", "d").toDF("v")
    val got = Profile.heavyHitters(df, "v", k = 3)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("a", 3L), ("b", 2L), ("c", 2L))) // b before c on tie
  }

  test("range join: containment matches exactly once, even across " +
      "bucket boundaries") {
    import spark.implicits._
    import graft.operators.RangeJoin
    def ts(h: Int, m: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val points = Seq(
      (1L, ts(0, 30), 100L),  // inside a 3-bucket-spanning interval
      (1L, ts(2, 15), 101L),  // same interval, different hour bucket
      (1L, ts(2, 30), 102L),  // exactly at the inclusive end
      (1L, ts(3, 0), 103L),   // after the interval: no match
      (2L, ts(0, 30), 104L))  // key absent in intervals: no match
      .toDF("user_id", "ts", "event_id")
    val intervals = Seq((1L, ts(0, 15), ts(2, 30)))
      .toDF("user_id", "session_start", "session_end")
    val got = RangeJoin.pointInInterval(points, intervals, Seq("user_id"))
      .select("event_id").as[Long].collect().toSeq.sorted
    // 100-102 match exactly once each despite the interval covering
    // three hourly buckets (matches meet only in the point's bucket)
    assert(got == Seq(100L, 101L, 102L))
  }

  test("range join equals the brute-force inequality join on random " +
      "data (seeded)") {
    import spark.implicits._
    import graft.operators.RangeJoin
    val rnd = new scala.util.Random(42)
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    val dayUs = 86400L * 1000000L
    val points = (1 to 300).map { i =>
      (rnd.nextInt(5).toLong, ts(rnd.nextLong(10 * dayUs)), i.toLong)
    }.toDF("user_id", "ts", "event_id")
    val intervals = (1 to 60).map { i =>
      val start = rnd.nextLong(10 * dayUs)
      (rnd.nextInt(5).toLong, ts(start),
        ts(start + rnd.nextLong(2 * dayUs)), i.toLong)
    }.toDF("user_id", "session_start", "session_end", "iv_id")
    val bucketed = RangeJoin.pointInInterval(points, intervals,
      Seq("user_id"))
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    val brute = points.as("p").join(intervals.as("iv"),
      col("p.user_id") === col("iv.user_id") &&
        col("p.ts") >= col("iv.session_start") &&
        col("p.ts") <= col("iv.session_end"))
      .select("event_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(bucketed == brute)
    assert(brute.nonEmpty)
  }

  test("frame sampling fans out bounded rows per document") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
    val frames = graft.operators.Multimodal.frameSample(docs)
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .agg(min("n"), max("n")).as[(Long, Long)].collect().head
    assert(perDoc._1 >= 1L && perDoc._2 <= 7L)
    assert(frames.count() > docs.count()) // it actually fans out
  }

  test("corrMatrix: perfectly linear columns give exact slope and " +
      "r² = 1 in one pass — sign carried by the slope") {
    import spark.implicits._
    val df = Seq((1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0))
      .toDF("a", "b", "c")
    val got = graft.operators.Profile.corrMatrix(df,
        Seq("a" -> "a", "b" -> "b", "c" -> "c"))
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("a", "b", 3L, 2.0, 1.0),
      ("a", "c", 3L, -1.0, 1.0), ("b", "c", 3L, -0.5, 1.0)))
  }

  test("giniImpurity: constant column → 0 ppm, uniform over k → " +
      "(1−1/k)·10⁶ floored, NULL counted as its own category") {
    import spark.implicits._
    val df = Seq(
      ("x", "a", Some("u")), ("x", "b", Some("u")),
      ("x", "c", None), ("x", "d", None)
    ).toDF("const", "uni", "nully")
    val got = graft.operators.Profile.giniImpurity(df,
        Seq("const", "uni", "nully"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("const") == ("const", 4L, 1L, 0L))
    // uniform over 4: 1e6 − 1e6·4 div 16 = 750000
    assert(got("uni") == ("uni", 4L, 4L, 750000L))
    // two groups of 2 (incl. the NULL group): 1e6 − 1e6·8 div 16
    assert(got("nully") == ("nully", 4L, 2L, 500000L))
  }

  test("kruskalWallis: hand-computed midranks on a 2-group split; " +
      "identical groups give H at its floor") {
    import spark.implicits._
    // group a: {1, 2}, group b: {2, 3}. Distinct values 1,2,3 with
    // counts 1,2,1 → doubled midranks 2·0+1+1=2, 2·1+2+1=5, 2·3+1+1=8.
    // R2(a) = 2+5 = 7, R2(b) = 5+8 = 13; N=4.
    val df = Seq(("a", 1L), ("a", 2L), ("b", 2L), ("b", 3L))
      .toDF("g", "v")
    val r = graft.operators.Profile.kruskalWallis(df, "g", "v")
      .collect().map(x => x.getAs[String]("grp") -> x).toMap
    assert(r("a").getAs[Long]("r2_sum") == 7L)
    assert(r("b").getAs[Long]("r2_sum") == 13L)
    assert(r("a").getAs[Long]("rbar2_micro") == 3500000L)
    assert(r("a").getAs[Long]("n_total") == 4L)
    // ties: value 2 has c=2 → Σ(c³−c) = 6
    assert(r("a").getAs[Long]("tie_cube") == 6L)
    // H·1000 = (3000·(49 div 2 + 169 div 2)) div 20 − 3000·5
    //        = (3000·(24+84)) div 20 − 15000 = 16200 − 15000 = 1200
    assert(r("a").getAs[Long]("h_milli") == 1200L)
    // both groups identical → rank sums equal, H hugs its floor
    val eq = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L))
      .toDF("g", "v")
    val re = graft.operators.Profile.kruskalWallis(eq, "g", "v")
      .collect().map(x => x.getAs[String]("grp") -> x).toMap
    assert(re("a").getAs[Long]("r2_sum") == re("b").getAs[Long]("r2_sum"))
    assert(re("a").getAs[Long]("h_milli") <= 0L)
  }

  test("freshness: per-source lag behind the freshest upstream, " +
      "stale flag at the threshold boundary") {
    import spark.implicits._
    def ts(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 09:00:00")
    val df = Seq(
      ("a", ts(10)), ("a", ts(12)),  // freshest
      ("b", ts(10)),                 // lag 2 -> boundary, NOT stale
      ("c", ts(9))                   // lag 3 -> stale
    ).toDF("source", "ts")
    val got = graft.operators.Profile.freshness(df, "source", "ts",
        maxLagDays = 2L)
      .orderBy("source")
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(r => (r._1, r._4, r._5)) == Seq(
      ("a", 0L, false), ("b", 2L, false), ("c", 3L, true)))
    assert(got.head._2 == 2L, "row counts per source")
  }

  test("cramersV: perfect association reads exactly 10^6 ppm, " +
      "independence reads 0, zero cells counted in the grid") {
    import spark.implicits._
    // a == b on a balanced 2x2 -> chi2 = N·(k-1) exactly -> V = 1
    val perfect = Seq.fill(5)(("x", "x")) ++ Seq.fill(5)(("y", "y"))
    val p = graft.operators.Profile.cramersV(
      perfect.toDF("a", "b"), "a", "b").head()
    assert(p.getAs[Long]("n_cells") == 4L, "zero cells must be in the grid")
    assert(p.getAs[Long]("df_min") == 1L)
    assert(p.getAs[Long]("chi2_micro") == 10000000L)
    assert(p.getAs[Long]("cramers_v_ppm") == 1000000L)
    // perfectly balanced independent margins -> chi2 = 0 -> V = 0
    val indep = (for (a <- Seq("x", "y"); b <- Seq("u", "v", "w"))
      yield Seq.fill(3)((a, b))).flatten
    val i = graft.operators.Profile.cramersV(
      indep.toDF("a", "b"), "a", "b").head()
    assert(i.getAs[Long]("n_cells") == 6L &&
      i.getAs[Long]("chi2_micro") == 0L &&
      i.getAs[Long]("cramers_v_ppm") == 0L)
    // degenerate margin (single-valued column) -> df 0, V reported 0
    val d = graft.operators.Profile.cramersV(
      Seq(("x", "u"), ("x", "v")).toDF("a", "b"), "a", "b").head()
    assert(d.getAs[Long]("df_min") == 0L &&
      d.getAs[Long]("cramers_v_ppm") == 0L)
  }
}
