package graft

import graft.functions._
import graft.operators._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 (the
  * reference's own surface or the extended north-star set). Entries
  * with an [[oracleSql]] twin are hash-compared against DuckDB on the
  * same parquet; FP-sensitive queries are designed around integer
  * quantization / decimal sums so both engines produce bit-identical
  * values. Entries without an oracle (hash/XML/LSH ops that ANSI SQL
  * can't express) are pinned by golden + property tests instead.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** SF-envelope broadcast for dimensions that GROW with scale factor
    * (customer/supplier/part — unlike nation/region, which are O(1)
    * rows at every SF): the hint is applied only while Catalyst's size
    * estimate for the frame stays under the session broadcast
    * threshold, so at sf0.1 the dims broadcast as intended and at
    * sf100 (customer ≈ 15 M rows / GBs) the join goes unhinted and
    * AQE picks the strategy from observed runtime sizes instead of a
    * forced driver-side collect. Stats come from the optimized logical
    * plan (file sizes for scans — no job is run), the same estimate
    * the static planner itself compares against the threshold.
    */
  private def bcDim(df: DataFrame): DataFrame = {
    val threshold =
      df.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    if (threshold > 0 &&
        df.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold)
      broadcast(df)
    else df
  }

  /** The scoped ground-truth near-dup pair set (exact n-gram Jaccard
    * over the capped 500-doc slice) feeds three queries: the pairs
    * themselves, connected-components clustering, and the corpus
    * filter. A production pipeline materializes the pair set once and
    * derives everything downstream from it — model that here with a
    * per-(session, dir) memo of the localCheckpoint'd (tiny) pair set
    * instead of re-running the deliberately-quadratic join per query.
    *
    * Lifecycle: entries are bounded (one tiny checkpointed frame per
    * (session, dir) actually queried) and live until [[evictPairs]] —
    * NOT weakly keyed: a cached DataFrame strongly references its
    * session, so weak keys would never collect anyway. The pair set is
    * computed OUTSIDE any lock — a concurrent duplicate computation of
    * the same deterministic input is identical values and merely
    * wasted work, whereas a global lock held across a Spark job would
    * serialize unrelated sessions.
    */
  private val pairsMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def groundTruthPairs(s: SparkSession, dir: String): DataFrame = {
    val key = (s, dir)
    val hit = pairsMemo.get(key)
    if (hit != null) return hit
    val pairs = Dedup.ngramJaccardPairs(
      t(s, dir, "documents").filter(col("doc_id") < 500),
      n = 3, minJaccard = 0.8).localCheckpoint()
    val prev = pairsMemo.putIfAbsent(key, pairs)
    if (prev != null) {
      // lost the race: free the redundant checkpoint's blocks now —
      // otherwise they stay pinned for the session lifetime
      unpersistCheckpoint(pairs)
      prev
    } else pairs
  }

  /** Unpersist the block-manager storage behind a `localCheckpoint`'d
    * frame. `df.rdd` would NOT do this — it derives a fresh RDD from
    * the plan; the checkpoint blocks belong to the RDD captured inside
    * the plan's `LogicalRDD` leaf.
    */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** RDD ids backing the cross-query memoized frames for `s` — a
    * long-lived harness that sweeps leaked checkpoint blocks between
    * queries (graft.Bench) must exempt these; everything else a query
    * leaves persisted after it finishes is garbage to such a harness.
    */
  def memoizedRddIds(s: SparkSession): Set[Int] = {
    import scala.jdk.CollectionConverters._
    pairsMemo.asScala.iterator
      .collect { case ((sess, _), df) if sess eq s => df }
      .flatMap(_.queryExecution.analyzed.collect {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.id
      })
      .toSet
  }

  /** Sweep blocks a query left persisted: everything in the context's
    * persistent-RDD registry that was not there before the query and
    * is not a cross-query memo is a leak to a long-running harness
    * (localCheckpoint blocks otherwise wait on GC + ContextCleaner
    * and pile up across a 140+-query marathon — measured as 2-8×
    * in-suite inflation). ONE implementation shared by Bench and
    * Verify so the memo exemption cannot drift between them.
    */
  def sweepLeakedBlocks(s: SparkSession,
      persistedBefore: scala.collection.Set[Int]): Unit = {
    val keep = memoizedRddIds(s)
    s.sparkContext.getPersistentRDDs.foreach { case (rid, rdd) =>
      if (!persistedBefore.contains(rid) && !keep.contains(rid))
        rdd.unpersist(blocking = false)
    }
  }

  /** Drop a session's memoized pair sets, unpersisting their
    * checkpoint blocks (safe no-op on an already-stopped session).
    * Long-lived JVMs that cycle many sessions call this from their
    * session teardown.
    */
  def evictPairs(s: SparkSession): Unit = {
    val it = pairsMemo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) {
        try unpersistCheckpoint(e.getValue)
        catch { case _: Throwable => () } // stopped session: blocks already gone
        it.remove()
      }
    }
  }

  /** Where the `*_recall` gate queries materialize their approximate
    * (sketch) outputs so the DuckDB oracle can read the SAME rows via
    * `read_parquet`: the sketch hashes (murmur) are not
    * ANSI-SQL-expressible, but the recall arithmetic against the
    * SQL-expressible exact twin is — materializing the approximate
    * side as data turns the former spec-only recall floors into
    * hash-checked driver gates. Keyed by the sf-dir basename so a
    * Verify run (sf0.01) and a later Bench run (sf0.1) never clobber
    * each other's dumps; [[Verify]] substitutes [[RecallDirToken]] in
    * [[oracleSql]] with this path at dump time.
    */
  def recallDumpDir(sfDir: String): String =
    s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft_recall/" +
      new java.io.File(sfDir).getName

  /** Placeholder in [[oracleSql]] for the recall dump dir. */
  val RecallDirToken = "__RECALL_DIR__"

  /** One-row recall gate (n_exact, n_hit, recall_bp, meets_floor):
    * write the approximate pair/neighbor keys to [[recallDumpDir]],
    * read them back (so Spark and the oracle score byte-identical
    * rows), and score them against the exact twin. `recall_bp` is
    * integer basis points — `(10000 * n_hit) DIV n_exact`, truncating
    * in both engines for non-negative counts — so the hash compare
    * never rides on double formatting. Floors are pinned comfortably
    * below the observed fixture minimum (measured across sf0.001/0.01/
    * 0.1 by [[graft.tools.RecallProbe]]), not at it.
    */
  /** Materialize a frame under [[recallDumpDir]] and read it back —
    * the shared move behind every `*_recall` / `*_bounds` gate: Spark
    * and the DuckDB oracle then score byte-identical rows.
    */
  private def dumpForOracle(s: SparkSession, dir: String, name: String,
      df: DataFrame): DataFrame = {
    val path = s"${recallDumpDir(dir)}/$name"
    df.coalesce(1).write.mode("overwrite").parquet(path)
    s.read.parquet(path)
  }

  private def recallGate(s: SparkSession, dir: String, name: String,
      exact: DataFrame, approx: DataFrame, keys: Seq[String],
      floorBp: Int): DataFrame = {
    val dumped = dumpForOracle(s, dir, name,
      approx.select(keys.map(col): _*).distinct())
    val ex = exact.select(keys.map(col): _*)
    val recallBp = "CASE WHEN n_exact = 0 THEN CAST(10000 AS BIGINT) " +
      "ELSE (10000 * n_hit) DIV n_exact END"
    ex.agg(count(lit(1)).as("n_exact")).crossJoin(
        ex.join(dumped, keys, "left_semi").agg(count(lit(1)).as("n_hit")))
      .selectExpr("n_exact", "n_hit", s"$recallBp AS recall_bp",
        s"$recallBp >= $floorBp AS meets_floor")
  }

  /** Deterministic PII injection for the scrub queries: the fixture
    * text is digit-free, so append doc_id-derived emails / IPv4s /
    * phones / long numeric ids to selected rows. Mirrored verbatim by
    * [[piiSql]] — `concat` stringifies longs identically to DuckDB's
    * `||` (no sign, no decimal point), and doc_id is non-negative so
    * `%` agrees between the engines.
    */
  private def piiDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" mail user"), col("doc_id"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 4 === 0,
          concat(lit(" host 10."), col("doc_id") % 256, lit(".0.7")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0, lit(" call +1-555-014-2288"))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" acct 9021077"), col("doc_id"), lit("55")))
          .otherwise(lit(""))).as("text"))

  /** SQL twin of [[piiDocs]] (a FROM-able subquery over `documents`). */
  private val piiSql: String = """
    (SELECT doc_id, source,
       text ||
       CASE WHEN doc_id % 3 = 0
            THEN ' mail user' || doc_id || '@example.com' ELSE '' END ||
       CASE WHEN doc_id % 4 = 0
            THEN ' host 10.' || (doc_id % 256) || '.0.7' ELSE '' END ||
       CASE WHEN doc_id % 5 = 0
            THEN ' call +1-555-014-2288' ELSE '' END ||
       CASE WHEN doc_id % 7 = 0
            THEN ' acct 9021077' || doc_id || '55' ELSE '' END AS text
     FROM documents)"""

  /** CTE chain mirroring [[Scrub.redact]]'s sequential count+replace:
    * step k counts rule k's hits on the text as left by rules 1..k-1,
    * then replaces. Patterns come from the SAME `Scrub.DefaultRules`
    * the Spark side uses (the dialect-neutral regex subset). `keyCol`
    * is whatever identity column the query carries through.
    */
  private def scrubChainSql(keyCol: String): String =
    Scrub.DefaultRules.zipWithIndex.map { case (r, i) =>
      val src = if (i == 0) "pii" else s"s$i"
      val carried = Scrub.DefaultRules.take(i)
        .map(p => s"n_${p.name}, ").mkString
      s"""s${i + 1} AS (SELECT $keyCol, $carried
             CAST(len(regexp_extract_all(t, '${r.pattern}')) AS BIGINT)
               AS n_${r.name},
             regexp_replace(t, '${r.pattern}', '${r.replacement}', 'g') AS t
           FROM $src)"""
    }.mkString(",\n      ")

  /** The fixture text is plain prose, so the HTML-clean query stages a
    * deterministic web-page wrapper around it (both engines build the
    * IDENTICAL string): tags, a comment, a script body, and the
    * `&amp;lt;` double-decode trap the rule order must not fall into.
    */
  private val htmlWrapPrefix =
    "<html><!-- nav --><body><p class=\"x\">"
  private val htmlWrapSuffix =
    "</p>&nbsp;&amp;lt;<script>var x=1;</script></body></html>"

  /** SQL twin of [[Scrub.htmlCleanCol]]: the same ordered rule chain,
    * generated from the SAME `Scrub.HtmlRules` list so the dialects
    * cannot drift. `e` is any text-typed SQL expression.
    */
  private def htmlCleanSql(e: String): String = {
    def q(s: String) = "'" + s.replace("'", "''") + "'"
    "trim(" + Scrub.HtmlRules.foldLeft(e) { case (acc, (pat, repl)) =>
      s"regexp_replace($acc, ${q(pat)}, ${q(repl)}, 'g')"
    } + ")"
  }

  /** Recursive temp-dir cleanup for the sink round-trip queries. */
  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's README example (`SELECT content, title, url, pos FROM
    * test.Pages` with `-keys url,pos`) reshaped onto the documents fixture:
    * full scan → render → xmlpipe2 documents with composite-key doc ids.
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("text"), col("source"), col("doc_id"), col("n_chars"))
    XmlPipe.formatDocs(docs, Seq("source", "doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference parity: xmlpipe2 export (F1,F3,F4,F5,F6,F8,F10) ----
    "xml_documents" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("text"), col("source"), col("doc_id"), col("n_chars"))
      XmlPipe.formatDocs(docs, Seq("doc_id")).orderBy(col("id"))
    }),
    "xml_documents_composite" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("text"), col("source"), col("doc_id"), col("n_chars"))
      XmlPipe.formatDocs(docs, Seq("source", "doc_id"))
        .orderBy(col("id"), col("doc"))
    }),
    "xml_lineitem" -> ((s, dir) => {
      XmlPipe.formatDocs(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_linenumber")).orderBy(col("id"), col("doc"))
    }),
    "xml_events" -> ((s, dir) => {
      // exercises the bracketed-string fallback (JSON objects fail the
      // List<Integer[]> parse → escaped raw text, Query.java:294-297)
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("props"), col("ts"))
      XmlPipe.formatDocs(ev, Seq("event_id")).orderBy(col("id"))
    }),
    "xml_events_stream" -> ((s, dir) => {
      // the same formatting pipeline driven through Structured
      // Streaming (continuous-indexing shape); same oracle as the
      // batch twin
      graft.streaming.EventsStream.xmlToCompletion(s, dir)
        .orderBy(col("id"))
    }),

    // ---- doc-id kernels (F4/F5/F6) ----
    "docid_single" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(DocId.docId(docs, Seq("doc_id")).as("id"))
        .orderBy(col("id"))
    }),
    "docid_composite" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"),
        DocId.docId(docs, Seq("source", "doc_id")).as("id"))
        .orderBy(col("doc_id"))
    }),
    "docid_strict" -> ((s, dir) => {
      // strict-parity single-key id reads the key through getInt
      // (Query.java:203): a synthetic wide key — 2³²-multiples plus a
      // signed low word — collapses to just the (sign-extended) low
      // word, which the oracle reproduces with modular arithmetic
      val docs = t(s, dir, "documents").withColumn("big_id",
        col("doc_id") * lit(4294967296L) + col("doc_id") - lit(250L))
      docs.select(col("doc_id"),
        DocId.docId(docs, Seq("big_id"), strictParity = true).as("id"))
        .orderBy(col("doc_id"))
    }),

    // ---- typed rendering (F8/F9) ----
    "render_lineitem" -> ((s, dir) => {
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").cast("string").as("r_orderkey"),
        col("l_quantity").cast("string").as("r_quantity"),
        col("l_returnflag").as("r_flag"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("r_shipdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    "render_arrays" -> ((s, dir) => {
      t(s, dir, "embeddings").select(
        col("vec_id"),
        array_join(transform(col("embedding"),
          x => round(x.cast("double") * 1000).cast("long").cast("string")),
          " ").as("r_embedding"))
        .orderBy(col("vec_id"))
    }),
    "render_strict" -> ((s, dir) => {
      // bug-for-bug getValue emulation (Render.renderStrict): Date
      // .toString timestamps (Q:253), ByteBuffer descriptor blobs
      // (Q:225/243), counter-through-getInt truncation (Q:247) — the
      // +3e9 offset pushes user_id past Int.MaxValue so the 32-bit
      // window actually bites
      val ev = t(s, dir, "events")
      ev.select(col("event_id"),
        Render.renderStrict(col("ts"), ev.schema("ts").dataType).as("r_ts"),
        Render.renderStrict(encode(coalesce(col("props"), lit("")), "UTF-8"),
          org.apache.spark.sql.types.BinaryType).as("r_blob"),
        Render.renderStrict(col("user_id") + lit(3000000000L),
          org.apache.spark.sql.types.LongType, counter = true)
          .as("r_counter"))
        .orderBy(col("event_id"))
    }),

    // ---- mem markup (F7) ----
    "mem_markup_events" -> ((s, dir) => {
      t(s, dir, "events").select(
        col("event_id"),
        MemMarkup.memMarkup(col("props")).as("markup"),
        MemMarkup.isMem(col("props")).as("is_mem"))
        .orderBy(col("event_id"))
    }),
    "mem_markup_matrix" -> ((s, dir) => {
      // The events fixture's props are JSON objects, so
      // mem_markup_events only oracle-exercises the fallback branch.
      // Here the POSITIVE branch is oracle-checked too: build
      // deterministic int-matrix JSON from event fields — plain ints,
      // quoted ints (Jackson's Integer.parseInt coercion), a two-row
      // matrix, plus object and float-cell fallbacks — and let the
      // oracle construct the expected <mem> rendering from the same
      // fields directly (no JSON parsing needed on the SQL side).
      val u = col("user_id").cast("string")
      val e = (col("event_id") % 1000).cast("string")
      val raw = when(col("event_id") % 5 === 0,
          concat(lit("[["), u, lit(","), e, lit("]]")))
        .when(col("event_id") % 5 === 1,
          concat(lit("[[\""), u, lit("\",\""), e, lit("\"]]")))
        .when(col("event_id") % 5 === 2,
          concat(lit("[["), u, lit("],["), e, lit(",7]]")))
        .when(col("event_id") % 5 === 3, lit("{\"k\":1}"))
        .otherwise(concat(lit("[[1.5,"), u, lit("]]")))
      t(s, dir, "events").select(
        col("event_id"),
        MemMarkup.memMarkup(raw).as("markup"),
        MemMarkup.isMem(raw).as("is_mem"))
        .orderBy(col("event_id"))
    }),

    // ---- CQL-pushdown query shapes (SURVEY §2b: filter/sort/limit) ----
    "q_filter_project" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_quantity") > 30 && col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    "q_topk" -> ((s, dir) => {
      t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(100)
    }),
    "q_in_range" -> ((s, dir) => {
      t(s, dir, "orders")
        .filter(col("o_orderstatus").isin("O", "F") &&
          col("o_orderdate") >= lit("1995-01-01").cast("timestamp"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          // DECIMAL internally (associativity-exact), DOUBLE on the final
          // output: a DECIMAL output column stringifies with trailing
          // fractional zeros ('38.40') on one side of the driver's hash
          // compare vs shortest-repr ('38.4') on the other. Both engines
          // print the identical nearest-double for the same exact value.
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- relational core: agg / join / window / rollup / setops ----
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)"))
            .cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q_join_agg" -> ((s, dir) => {
      // Q5-style revenue per nation; nation (25 rows, O(1) at every SF)
      // broadcasts unconditionally, customer rides the bcDim size gate
      // (it grows with SF — hinted under the threshold, AQE above it).
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(bcDim(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    }),
    // ---- TPC-H composite shapes (multi-join + agg + top-k — the
    // canonical 100 TB warehouse workloads, adapted to the fixture
    // schema; revenue rides the decimal(18,4) quantization so both
    // engines hash identically) ----
    "tpch_q3" -> ((s, dir) => {
      // Q3 shipping priority (o_orderpriority stands in for the
      // fixture's missing o_shippriority). The selective segment
      // filter broadcasts into the orders⋈lineitem shuffle join; the
      // final top-10 compiles to TakeOrderedAndProject, with the
      // orderkey tie-break making the cut deterministic cross-engine.
      val cutoff = lit("1998-06-01").cast("timestamp")
      t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
        .join(t(s, dir, "orders").filter(col("o_orderdate") < cutoff),
          col("l_orderkey") === col("o_orderkey"))
        .join(bcDim(t(s, dir, "customer")
            .filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),
    "tpch_q5" -> ((s, dir) => {
      // Q5 local supplier volume: revenue from orders where supplier
      // and customer share a nation, nations restricted to one region,
      // one order year. The O(1) region→nation frame (5 rows) broadcasts
      // unconditionally; customer/supplier grow with SF so they ride
      // the bcDim size gate. The only guaranteed shuffle join is
      // fact-side lineitem⋈orders. The c_nationkey = s_nationkey
      // constraint rides the supplier broadcast join condition.
      val asiaNations = t(s, dir, "nation")
        .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(bcDim(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(bcDim(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),
    "tpch_q8" -> ((s, dir) => {
      // Q8 national market share, reshaped to the fixture: among
      // ECONOMY-type parts bought by AMERICA-region customers, the
      // yearly revenue share held by NATION_7 suppliers. Double
      // division is not hash-stable cross-engine, so the share is
      // integer basis points over exact decimal tenth-cent sums
      // (both engines truncate non-negative integer division).
      val americaKeys = t(s, dir, "nation")
        .join(t(s, dir, "region").filter(col("r_name") === "AMERICA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("cn_key"))
      val supplierNation = t(s, dir, "supplier")
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val volume = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")
      t(s, dir, "lineitem")
        .join(bcDim(t(s, dir, "part")
            .filter(col("p_type") === "ECONOMY")),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(bcDim(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(americaKeys), col("c_nationkey") === col("cn_key"))
        .join(bcDim(supplierNation),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          (sum(when(col("supp_nation") === "NATION_7", volume)
            .otherwise(lit(0).cast("decimal(18,4)"))) * 10000)
            .cast("long").as("nation_rev_tc"),
          (sum(volume) * 10000).cast("long").as("total_rev_tc"))
        .select(col("o_year"), col("nation_rev_tc"), col("total_rev_tc"),
          expr("(10000 * nation_rev_tc) div total_rev_tc").as("share_bp"))
        .orderBy(col("o_year"))
    }),
    "tpch_q10" -> ((s, dir) => {
      // Q10 returned-item reporting: customers who returned goods in
      // one quarter, ranked by lost revenue, top 20. Nation broadcasts
      // unconditionally, customer via the bcDim size gate; the
      // returnflag filter prunes the fact scan.
      t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders").filter(
          col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1997-07-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(bcDim(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
          col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    "tpch_q7" -> ((s, dir) => {
      // Q7 volume shipping: bilateral trade between two nations by
      // year — revenue where the supplier sits in one and the customer
      // in the other, both directions kept as separate groups. The two
      // nation lookups are O(1) broadcasts; customer/supplier ride the
      // bcDim SF gate; the only guaranteed shuffle join is
      // lineitem⋈orders.
      val nation = t(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))
      val lo = lit("1996-01-01").cast("timestamp")
      val hi = lit("1998-01-01").cast("timestamp")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lo && col("l_shipdate") < hi)
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(bcDim(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .join(bcDim(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation.select(col("n_nationkey").as("ck"),
          col("n_name").as("cust_nation"))), col("c_nationkey") === col("ck"))
        .join(broadcast(nation.select(col("n_nationkey").as("sk"),
          col("n_name").as("supp_nation"))), col("s_nationkey") === col("sk"))
        .filter((col("supp_nation") === "NATION_1" &&
            col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" &&
            col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    }),
    "tpch_q9" -> ((s, dir) => {
      // Q9 product-type profit, adapted: the fixture has no partsupp
      // table, so "profit" is discounted revenue without the
      // ps_supplycost·l_quantity subtrahend — the plan shape (name-
      // filtered part dim pruning the fact scan, supplier→nation
      // rollup, year grouping) is the exercise. part/supplier ride the
      // bcDim gate, nation broadcasts unconditionally.
      t(s, dir, "lineitem")
        .join(bcDim(t(s, dir, "part")
            .filter(col("p_name").like("%widget%"))
            .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(bcDim(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),
    "tpch_q12" -> ((s, dir) => {
      // Q12 late-shipment priority audit, adapted to the fixture (no
      // l_shipmode/commitdate/receiptdate): per line status over one
      // shipping year, how many lines belong to URGENT/HIGH-priority
      // orders vs the rest — the canonical conditional-count-after-
      // join shape. One shuffle join; the CASE counts fold map-side.
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    }),
    "tpch_q14" -> ((s, dir) => {
      // Q14 promotion effect: share of one month's revenue from PROMO
      // parts, in integer basis points over exact tenth-cent sums
      // (double division is not hash-stable cross-engine). The part
      // dim rides the bcDim gate; single-row output.
      val volume = (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .join(bcDim(t(s, dir, "part")
            .select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          (sum(when(col("p_type") === "PROMO", volume)
            .otherwise(lit(0).cast("decimal(18,4)"))) * 10000)
            .cast("long").as("promo_rev_tc"),
          (sum(volume) * 10000).cast("long").as("total_rev_tc"))
        .select(col("promo_rev_tc"), col("total_rev_tc"),
          expr("(10000 * promo_rev_tc) div total_rev_tc").as("promo_bp"))
    }),
    "tpch_q17" -> ((s, dir) => {
      // Q17 small-quantity-order revenue: among one brand's parts,
      // revenue from lineitems whose quantity is below 20% of that
      // part's average quantity, scaled to a yearly figure. The
      // correlated scalar subquery decorrelates to a per-part
      // aggregate joined back to the fact — quantity sums are exact
      // (integer-valued doubles), so the 0.2·avg threshold is one
      // deterministic IEEE multiply on both engines.
      val brandParts = bcDim(t(s, dir, "part")
        .filter(col("p_brand") === "Brand#12").select(col("p_partkey")))
      val li = t(s, dir, "lineitem")
      val avgQty = li.groupBy(col("l_partkey").as("ap_key"))
        .agg((sum(col("l_quantity")) / count(col("l_quantity")))
          .as("avg_qty"))
      li.join(brandParts, col("l_partkey") === col("p_partkey"))
        .join(avgQty, col("l_partkey") === col("ap_key"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double") / 7.0).as("avg_yearly"))
    }),
    "tpch_q18" -> ((s, dir) => {
      // Q18 large-volume customers: orders whose total quantity tops
      // 300, with their customer, ranked by order value. The HAVING
      // pre-aggregates the fact table BEFORE any join (the shape that
      // matters at scale — the join fan-in is the handful of
      // qualifying orders, not the fact table), then customer rides
      // the bcDim gate.
      val big = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey").as("bo_key"))
        .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
        .filter(col("total_qty") > 300L)
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("bo_key"))
        .join(bcDim(t(s, dir, "customer")
            .select(col("c_custkey"), col("c_name"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    "tpch_q4" -> ((s, dir) => {
      // Q4 order-priority checking, adapted (no l_commitdate /
      // l_receiptdate in the fixture): an order is "late" when some
      // line shipped more than 60 days after the order date. The
      // EXISTS compiles to one left-semi shuffle join with the date
      // condition evaluated join-side; the quarter filter prunes the
      // orders scan.
      val o = t(s, dir, "orders").filter(
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
      o.join(t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate")),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),
    "tpch_q6" -> ((s, dir) => {
      // Q6 forecasting-revenue change: the pure scan-filter-aggregate
      // — every predicate pushes into the parquet scan, no join, no
      // shuffle beyond the final 1-row agg. Discount bounds compare
      // STORED doubles against literal doubles (no arithmetic), so
      // both engines agree bit-for-bit.
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
    }),
    "tpch_q15" -> ((s, dir) => {
      // Q15 top supplier: quarter revenue per supplier, keep the
      // max-revenue one(s). Revenue compares in exact tenth-cent
      // integers so the max-equality join cannot split on FP noise;
      // the 1-row max attaches as a bounded broadcast.
      val rev = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-10-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg((sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")) * 10000).cast("long").as("total_rev_tc"))
      val top = rev.agg(max(col("total_rev_tc")).as("max_tc"))
      rev.crossJoin(broadcast(top))
        .filter(col("total_rev_tc") === col("max_tc"))
        .join(bcDim(t(s, dir, "supplier")
            .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_rev_tc"))
        .orderBy(col("s_suppkey"))
    }),
    "tpch_q16" -> ((s, dir) => {
      // Q16 part-supplier relationship counts, adapted: no partsupp
      // table, so "suppliers who can supply" becomes "suppliers who
      // HAVE supplied" (distinct l_suppkey via lineitem), and the
      // no-complaints supplier exclusion is dropped (no comment
      // column). The distinct-count shuffles once on the descriptor
      // key after the dim join prunes the fact scan.
      t(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" &&
          !col("p_type").like("PROMO%") &&
          col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29))
        .join(t(s, dir, "lineitem")
            .select(col("l_partkey"), col("l_suppkey")),
          col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),
    "tpch_q19" -> ((s, dir) => {
      // Q19 discounted revenue under disjunctive brackets — three
      // (brand, size-range, quantity-range) OR-arms that Catalyst
      // must keep as one residual predicate over a single join (no
      // union-of-scans blowup); the part dim rides the bcDim gate.
      val li = t(s, dir, "lineitem")
      val arm = (brand: String, sizeHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand &&
          col("p_size").between(1, sizeHi) &&
          col("l_quantity").between(qLo, qHi)
      li.join(bcDim(t(s, dir, "part")
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .filter(arm("Brand#3", 5, 1, 11) || arm("Brand#9", 10, 10, 20) ||
          arm("Brand#15", 15, 20, 30))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
    }),
    "tpch_q13" -> ((s, dir) => {
      // Q13 customer order-count distribution: how many customers
      // placed N orders, zeros included — the canonical two-level
      // aggregation (outer-join count, then histogram the counts).
      // The first agg shuffles on custkey, the second on the tiny
      // count domain; customers with no orders ride the left join.
      t(s, dir, "customer").select(col("c_custkey"))
        .join(t(s, dir, "orders")
            .select(col("o_orderkey"), col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),
    "tpch_q22" -> ((s, dir) => {
      // Q22 global-sales-opportunity, adapted twice to the fixture:
      // nation key stands in for the missing phone country code, and
      // "never ordered" becomes "DORMANT — no order since 1999" (the
      // generator gives every customer at least one order, so the
      // classic predicate is structurally empty). Positive-balance
      // customers above the positive-balance average, grouped by
      // nation. The above-average test runs on exact integer cents
      // with the division cross-multiplied away (bal·n > total on
      // both engines — no FP threshold to disagree on); dormancy is
      // one left-anti join against the date-pruned orders scan.
      val cust = t(s, dir, "customer")
        .withColumn("bal_c",
          round(col("c_acctbal") * 100).cast("long"))
      val posStats = cust.filter(col("bal_c") > 0L)
        .agg(sum(col("bal_c")).as("tot_c"), count(lit(1)).as("n_pos"))
      cust.crossJoin(broadcast(posStats))
        .filter(col("bal_c") > 0L &&
          col("bal_c") * col("n_pos") > col("tot_c"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey").as("cntry"))
        .agg(count(lit(1)).as("numcust"), sum(col("bal_c")).as("totbal_c"))
        .orderBy(col("cntry"))
    }),
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rn"))
    }),
    "q_window_range" -> ((s, dir) => {
      // RANGE frame over event time: per user, events in the trailing
      // hour — ordered by exact integer µs so the frame bound is
      // engine-neutral (interval semantics over ns vs µs timestamps
      // are not)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"))
        .rangeBetween(-3600000000L, Window.currentRow)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("n_trailing_1h", count(lit(1)).over(w))
        .select(col("user_id"), col("event_id"), col("n_trailing_1h"))
        .orderBy(col("event_id"))
    }),
    "q_window_nav" -> ((s, dir) => {
      // navigation functions + ntile over one user-time window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .select(col("user_id"), col("event_id"),
          lag(col("event_id"), 1).over(w).as("prev_id"),
          lead(col("event_id"), 1).over(w).as("next_id"),
          first(col("event_id")).over(w).as("first_id"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("event_id"))
    }),
    "q_rollup" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .rollup(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)"))
            .cast("double").as("sum_bal"))
        .orderBy(col("n_name").asc_nulls_first,
          col("c_mktsegment").asc_nulls_first)
    }),
    "q_setops" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
        .except(c.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey")))
        .orderBy(col("c_custkey"))
    }),
    "q_distinct_agg" -> ((s, dir) => {
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("nd_part"),
          countDistinct(col("l_suppkey")).as("nd_supp"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),
    "q_map_funcs" -> ((s, dir) => {
      // map-typed column surface: build a per-user event_type→count
      // map with map_from_entries over a sorted entry array, then
      // interrogate it with try_element_at (ANSI element_at throws on
      // a missing key), map_filter, and map_entries. Maps are
      // UNORDERED — the hashed output renders entries through the
      // sorted array, never the map itself, and the oracle computes
      // the same answers relationally (DuckDB's MAP dialect differs;
      // the point is the Spark surface, the oracle just needs the
      // values).
      val counts = t(s, dir, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      counts.groupBy(col("user_id"))
        .agg(map_from_entries(
          array_sort(collect_list(struct(col("event_type"), col("n")))))
          .as("m"))
        .select(
          col("user_id"),
          size(col("m")).cast("long").as("n_types"),
          coalesce(expr("try_element_at(m, 'click')"), lit(0L))
            .as("clicks"),
          size(map_filter(col("m"), (_, v) => v >= 10)).cast("long")
            .as("n_heavy"),
          array_join(transform(map_entries(col("m")),
            e => concat(e.getField("key"), lit(":"), e.getField("value"))),
            ",").as("summary"))
        .orderBy(col("user_id"))
    }),
    "q_window_ratio" -> ((s, dir) => {
      // percent-of-total window (ratio_to_report): each line's share
      // of its order's revenue in exact integer basis points — the
      // window sum runs over int64 cents, so shares are
      // partitioning-invariant (a double window sum would not be)
      val w = Window.partitionBy(col("l_orderkey"))
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
        .withColumn("order_cents", sum(col("cents")).over(w))
        .selectExpr("l_orderkey", "l_linenumber", "cents",
          "(10000 * cents) div order_cents AS share_bp")
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    "profile_benford" -> ((s, dir) => {
      // Benford leading-digit audit — the classic fabricated-data
      // smell test: observed first-digit distribution of order
      // totals vs the Benford expectation (literal basis points on
      // both sides, so no engine's log10 enters the hash)
      val exp = Map(1 -> 3010, 2 -> 1761, 3 -> 1249, 4 -> 969,
        5 -> 792, 6 -> 669, 7 -> 580, 8 -> 512, 9 -> 458)
      val d = t(s, dir, "orders")
        .select(substring((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      d.crossJoin(broadcast(d.agg(sum(col("n")).as("total"))))
        .selectExpr("digit", "n", "(10000 * n) div total AS obs_bp")
        .withColumn("exp_bp",
          exp.foldLeft(lit(0)) { case (acc, (k, v)) =>
            when(col("digit") === k, v).otherwise(acc) }.cast("long"))
        .orderBy(col("digit"))
    }),
    "q_window_ignore_nulls" -> ((s, dir) => {
      // IGNORE NULLS navigation — sparse-observation forward fill:
      // value is observed only on purchase rows; every event carries
      // the most recent observation (last IGNORE NULLS, running
      // frame) and the user's first observation (first IGNORE NULLS,
      // whole-partition frame). One window shuffle on user_id.
      val v = when(col("event_type") === "purchase", col("value"))
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val fill = byUser
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val whole = byUser
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events").select(col("event_id"), col("user_id"),
        v.as("obs"),
        last(v, ignoreNulls = true).over(fill).as("filled"),
        first(v, ignoreNulls = true).over(whole).as("first_obs"))
        .orderBy(col("event_id"))
    }),
    "q_mode" -> ((s, dir) => {
      // exact mode with a deterministic tie-break (highest count,
      // smallest value wins): two hash aggregates + a top-1 rank that
      // WindowGroupLimit pre-truncates map-side — group-count-sized
      // state, no global sort, no collect.
      val counts = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("n"))
      counts.withColumn("rk", row_number().over(
          Window.partitionBy(col("l_returnflag"))
            .orderBy(col("n").desc, col("l_quantity").asc)))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_qty"),
          col("n"))
        .orderBy(col("l_returnflag"))
    }),
    "q_stats_agg" -> ((s, dir) => {
      // exact least-squares regression per group: quantize both
      // variables to integer units through DECIMAL, accumulate the
      // five sufficient statistics exactly (int64 sums; DECIMAL(38,0)
      // for the cross products that overflow int64), then derive
      // slope / intercept / r² as IEEE doubles OF EXACT RATIONALS —
      // the result is associativity-independent at any parallelism,
      // where a raw double covariance would drift with partition
      // merge order. DuckDB twin runs the same arithmetic in HUGEINT,
      // converted to DOUBLE through VARCHAR: DuckDB's direct
      // int128→double cast is 1 ulp off at 21 digits, while its
      // string parse is correctly rounded like Spark's BigDecimal
      // path.
      val li = t(s, dir, "lineitem").select(
        col("l_returnflag"),
        (col("l_quantity").cast("decimal(18,4)") * 10000)
          .cast("long").as("x"),
        (col("l_extendedprice").cast("decimal(18,4)") * 10000)
          .cast("long").as("y"))
      val d = (c: Column) => c.cast("decimal(38,0)")
      li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(d(col("x")) * d(col("y"))).as("sxy"),
          sum(d(col("x")) * d(col("x"))).as("sxx"),
          sum(d(col("y")) * d(col("y"))).as("syy"))
        .select(col("l_returnflag"), col("n"), col("sx"), col("sy"), {
          val num = d(col("n")) * col("sxy") - d(col("sx")) * d(col("sy"))
          val den = d(col("n")) * col("sxx") - d(col("sx")) * d(col("sx"))
          val deny = d(col("n")) * col("syy") - d(col("sy")) * d(col("sy"))
          val numI = col("sy") * col("sxx") - d(col("sx")) * col("sxy")
          struct(
            (num.cast("double") / den.cast("double")).as("slope"),
            (numI.cast("double") / den.cast("double")).as("intercept"),
            (num.cast("double") * num.cast("double") /
              (den.cast("double") * deny.cast("double"))).as("r2"))
            .as("st")
        })
        .select(col("l_returnflag"), col("n"), col("sx"), col("sy"),
          col("st.slope").as("slope"), col("st.intercept").as("intercept"),
          col("st.r2").as("r2"))
        .orderBy(col("l_returnflag"))
    }),
    "events_retention" -> ((s, dir) => {
      Events.retention(t(s, dir, "events"))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),
    "events_gapfill" -> ((s, dir) => {
      Events.gapfillDaily(t(s, dir, "events"))
        .orderBy(col("event_type"), col("day"))
    }),
    "io_skipping" -> ((s, dir) => {
      // file-level min/max data skipping: clustered write → one-pass
      // (file, min, max) manifest via _metadata → range query planned
      // from the manifest, opening ONLY intersecting files. Result
      // rows are exactly the full-scan filter's (residual filter
      // inside survivors); LayoutSpec proves files actually got
      // skipped. At 100 TB this is listing-level pruning — the
      // manifest stays one row per file.
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-skip").toFile
      try {
        t(s, dir, "lineitem")
          .repartitionByRange(8, col("l_orderkey"))
          .sortWithinPartitions(col("l_orderkey"))
          .write.mode("overwrite").parquet(tmp.toString)
        val man = Layout.minMaxManifest(s, tmp.toString, "l_orderkey")
        Layout.skipScan(s, tmp.toString, man, "l_orderkey", 1000L, 2000L)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
          .localCheckpoint()
      } finally deleteRecursively(tmp)
    }),
    "io_compaction" -> ((s, dir) => {
      // small-file compaction: 64 round-robin shards rewritten to
      // ceil(rows/2000) range-partitioned sorted files; the audit row
      // (file counts driven by ROW COUNT, so they're exact on both
      // sides) rides with content proof re-aggregated from the
      // compacted directory.
      val tmpIn = java.nio.file.Files
        .createTempDirectory("graft-cmp-in").toFile
      val tmpOut = java.nio.file.Files
        .createTempDirectory("graft-cmp-out").toFile
      try {
        t(s, dir, "events")
          .select(col("event_id"), col("event_type"), col("value"))
          .repartition(64).write.mode("overwrite").parquet(tmpIn.toString)
        val stats = Layout.compact(s, tmpIn.toString, tmpOut.toString,
          "event_id", 2000L)
        val back = s.read.parquet(tmpOut.toString)
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("event_id")).as("nd_ids"),
            sum(col("value").cast("decimal(18,4)"))
              .cast("double").as("sum_value"))
        stats.crossJoin(back)
          .select(col("files_before"), col("files_after"),
            col("n_rows"), col("nd_ids"), col("sum_value"))
          .localCheckpoint()
      } finally { deleteRecursively(tmpIn); deleteRecursively(tmpOut) }
    }),
    "io_schema_evolution" -> ((s, dir) => {
      // schema evolution on the lake path: generation 1 lacks a
      // column generation 2 added; mergeSchema unions the file
      // schemas (missing column null-filled) and the directory name
      // becomes the discovered partition column `g`.
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-evo").toFile
      try {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey"), col("o_totalprice"))
          .write.mode("overwrite").parquet(s"$tmp/g=1")
        o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"))
          .write.mode("overwrite").parquet(s"$tmp/g=2")
        s.read.option("mergeSchema", "true").parquet(tmp.toString)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderpriority"), col("g").cast("long").as("g"))
          .orderBy(col("o_orderkey"))
          .localCheckpoint()
      } finally deleteRecursively(tmp)
    }),
    "graph_pagerank" -> ((s, dir) => {
      // 3-iteration damped PageRank over the customer↔supplier
      // bipartite graph (an edge per distinct trading pair, both
      // directions; suppliers offset +100000 into a disjoint id
      // space). Exact integer micro-unit ranks — the DuckDB twin
      // unrolls the identical iterations relationally.
      val e1 = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 100000L).as("dst"))
        .distinct()
      // customer and supplier id spaces are disjoint, so the reverse
      // union introduces no duplicate edges (matches the oracle's
      // deduplicating UNION)
      val edges = e1.unionByName(
        e1.select(col("dst").as("src"), col("src").as("dst")))
      Graph.pageRank(edges).orderBy(col("node"))
    }),
    "graph_triangles" -> ((s, dir) => {
      // exact triangle census + local clustering coefficient over the
      // parts co-purchase graph (parts linked when one order contains
      // both — the market-basket projection; the within-order pair
      // expansion is bounded by basket size, not corpus size). The
      // degree-oriented wedge join keeps the census O(m^1.5) under hub
      // skew — see Graph.triangles.
      val items = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
        .distinct()
      val edges = items.as("i").join(items.as("j"),
          col("i.o") === col("j.o") && col("i.p") < col("j.p"))
        .select(col("i.p").as("src"), col("j.p").as("dst")).distinct()
      Graph.triangles(edges).orderBy(col("node"))
    }),
    "graph_communities" -> ((s, dir) => {
      // deterministic synchronous label propagation (2 rounds, min-
      // label ties) over the same customer↔supplier bipartite graph
      // as graph_pagerank; the oracle unrolls identical rounds
      val e1 = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 100000L).as("dst"))
        .distinct()
      val edges = e1.unionByName(
        e1.select(col("dst").as("src"), col("src").as("dst")))
      Graph.labelPropagation(edges, iters = 2).orderBy(col("node"))
    }),
    "text_pmi" -> ((s, dir) => {
      // collocation mining: pointwise-mutual-information association
      // for adjacent token pairs, as the EXACT integer lift ratio
      // n_ab·N·10⁶ div (n_a·n_b) (monotone in PMI — the log is
      // presentation, the ratio is the statistic; integer division
      // keeps both engines bit-identical). Marginals are counted over
      // bigram SLOTS (first-position / second-position occurrences),
      // the standard bigram-PMI denominators. Three hash aggregations
      // over one exploded pass + two vocabulary-keyed equi-joins;
      // the single-row N attaches via a bounded 1-row broadcast.
      val par = s.sparkContext.defaultParallelism
      val bg = t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(par, col("doc_id"))
        .select(explode(graft.functions.word_shingles(
          Dedup.tokens(col("text")), 2)).as("pair"))
        .select(col("pair"),
          substring_index(col("pair"), " ", 1).as("w1"),
          substring_index(col("pair"), " ", -1).as("w2"))
      val pairCounts = bg.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("n_ab"))
      val firstCounts = bg.groupBy(col("w1")).agg(count(lit(1)).as("n_a"))
      val secondCounts = bg.groupBy(col("w2")).agg(count(lit(1)).as("n_b"))
      val total = bg.agg(count(lit(1)).as("n_total"))
      pairCounts.filter(col("n_ab") >= 3)
        .join(firstCounts, "w1")
        .join(secondCounts, "w2")
        .crossJoin(broadcast(total))
        .select(col("w1"), col("w2"), col("n_ab"), col("n_a"), col("n_b"),
          expr("(n_ab * n_total * 1000000) div (n_a * n_b)")
            .as("lift_micro"))
        .orderBy(col("lift_micro").desc, col("w1"), col("w2"))
        .limit(50)
    }),
    "dq_checks" -> ((s, dir) => {
      // declarative data-quality contract over a corpus drop: all six
      // row-level checks ride ONE aggregate pass, ALL Unique checks
      // fuse into one grouping-sets shuffle, referential integrity
      // one anti-join each — the whole report is 9 rows however big
      // the table
      import Expectations._
      val docs = t(s, dir, "documents")
      val report = Expectations.run(docs, Seq(
        NotNull("text"),
        InRange("n_chars", 1, 500),
        Matches("source", "^src[0-9]+$"),
        InSet("lang", Seq("en", "de", "fr", "es")),
        Predicate("len_eq_n_chars", length(col("text")) === col("n_chars")),
        Unique(Seq("doc_id")),
        Unique(Seq("text"))))
      val fkOrders = Expectations.refIntegrity(t(s, dir, "orders"),
        t(s, dir, "customer"), "o_custkey", "c_custkey")
      val fkEvents = Expectations.refIntegrity(t(s, dir, "events"),
        t(s, dir, "customer"), "user_id", "c_custkey")
      report.unionByName(fkOrders).unionByName(fkEvents)
        .orderBy(col("check"), col("detail"))
    }),
    "dedup_jaccard_allpairs" -> ((s, dir) => {
      // prefix-filtered AllPairs similarity join — SAME oracle as
      // dedup_ngram_jaccard: identical output, ~25x smaller candidate
      // join (only rank-order prefixes hit the equi-join)
      Dedup.jaccardPairsAllPairs(
        t(s, dir, "documents").filter(col("doc_id") < 500))
        .orderBy(col("id_a"), col("id_b"))
    }),
    "q_explode_outer" -> ((s, dir) => {
      // explode_outer: generator rows for non-empty arrays, a single
      // null row for empty/missing — the LEFT JOIN of generators. The
      // oracle IS that left join, relationally.
      val big = t(s, dir, "lineitem").filter(col("l_quantity") > 45)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_quantity").cast("long")))
          .as("qs"))
      t(s, dir, "orders")
        .join(big, col("o_orderkey") === col("l_orderkey"), "left")
        .select(col("o_orderkey"), explode_outer(col("qs")).as("big_qty"))
        .orderBy(col("o_orderkey"), col("big_qty").asc_nulls_first)
    }),
    "q_union_by_name" -> ((s, dir) => {
      // schema reconciliation union: inputs with different column
      // ORDER and a missing column union by NAME, the absent column
      // null-filled (allowMissingColumns) — position-based union
      // would scramble or reject these
      val c = t(s, dir, "customer")
      val a = c.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val b = c.filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_name"), col("c_custkey"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("c_custkey"))
    }),
    "q_try_arith" -> ((s, dir) => {
      // try_* arithmetic: errors become NULL instead of killing the
      // job — division by zero and int64 overflow, the two failure
      // modes a 100 TB pipeline cannot afford to discover row 9
      // billion into a stage. Oracles spell out the same NULL cases.
      t(s, dir, "lineitem").select(
        col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(l_extendedprice, l_linenumber - 1)")
          .as("per_prior"),
        expr("try_multiply(9223372036854775807L, CAST(l_quantity AS LONG))")
          .as("overflow_null"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    "q_bitwise_agg" -> ((s, dir) => {
      // bitwise aggregate surface: AND/OR/XOR folds over user ids +
      // a popcount sum — integer-exact, partitioning-invariant
      // (bitwise ops are commutative/associative)
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(expr("bit_and(user_id)").as("b_and"),
          expr("bit_or(user_id)").as("b_or"),
          expr("bit_xor(user_id)").as("b_xor"),
          sum(expr("bit_count(user_id)")).as("pop_sum"))
        .orderBy(col("event_type"))
    }),
    "q_array_setops" -> ((s, dir) => {
      // array set algebra between the quantity sets of the two line
      // statuses per flag; every derived array is sorted before
      // rendering because set-op output order is implementation-
      // defined in BOTH engines
      val byStatus = t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          sort_array(collect_set(when(col("l_linestatus") === "O",
            col("l_quantity").cast("long")))).as("qo"),
          sort_array(collect_set(when(col("l_linestatus") === "F",
            col("l_quantity").cast("long")))).as("qf"))
      byStatus.select(col("l_returnflag"),
        size(col("qo")).as("n_o"), size(col("qf")).as("n_f"),
        array_join(sort_array(array_intersect(col("qo"), col("qf"))), ",")
          .as("inter_s"),
        array_join(sort_array(array_distinct(
          concat(col("qo"), col("qf")))), ",").as("union_s"),
        array_join(sort_array(array_except(col("qo"), col("qf"))), ",")
          .as("except_s"))
        .orderBy(col("l_returnflag"))
    }),
    "q_string_funcs" -> ((s, dir) => {
      // the string-function surface beyond q_scalar_funcs: translate,
      // padding, reverse, 1-based substring position, delimited-field
      // extraction — each with an exact DuckDB twin
      t(s, dir, "part").select(
        col("p_partkey"),
        translate(col("p_name"), "aeiou", "AEIOU").as("tr"),
        lpad(col("p_partkey").cast("string"), 8, "0").as("padded"),
        reverse(col("p_brand")).as("rev"),
        instr(col("p_type"), "a").as("pos_a"),
        expr("split_part(p_type, ' ', 1)").as("first_word"))
        .orderBy(col("p_partkey"))
    }),
    "q_ivm_agg" -> ((s, dir) => {
      // incremental materialized-view maintenance: per-customer
      // (count, sum-cents) state updated by a signed delta batch
      // (deletes: every 10th order; inserts: every 7th, restated +1¢)
      // WITHOUT touching base rows — hash-equal to the full recompute
      // the oracle performs. Delta-sized work is the entire point at
      // 100 TB.
      val o = t(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      val state = Merge.aggState(o, "o_custkey", "cents")
      val deletes = o.filter(col("o_orderkey") % 10 === 0)
        .select(col("o_custkey"), col("cents"), lit("D").as("op"))
      val inserts = o.filter(col("o_orderkey") % 7 === 0)
        .select(col("o_custkey"), (col("cents") + 1).as("cents"),
          lit("I").as("op"))
      Merge.incrementalAgg(state, deletes.unionByName(inserts),
        "o_custkey", "cents")
        .orderBy(col("o_custkey"))
    }),
    "ivm_stream" -> ((s, dir) => {
      // q_ivm_agg's delta replayed as a 3-micro-batch STREAM, state
      // folded forward per batch via foreachBatch — same oracle: the
      // abelian merge makes the final state batching-invariant
      graft.streaming.EventsStream.ivmToCompletion(s, dir)
        .orderBy(col("o_custkey"))
    }),
    "text_winnow_fp" -> ((s, dir) => {
      TextStats.winnowFingerprints(t(s, dir, "documents")
          .select(col("doc_id"), col("text")))
        .orderBy(col("doc_id"), col("pos"), col("gram"))
    }),
    "dedup_winnow_pairs" -> ((s, dir) => {
      TextStats.winnowPairs(t(s, dir, "documents")
          .select(col("doc_id"), col("text")))
        .orderBy(col("id_a"), col("id_b"))
    }),
    "q_percentiles" -> ((s, dir) => {
      // exact interpolated quartiles over integer cents per order
      // priority — percentile() (NOT percentile_approx), restricted
      // to power-of-two quantiles: the interpolation fraction and the
      // (b−a)·f product are then exact binary operations, so the
      // resulting doubles hash-match DuckDB's quantile_cont (the same
      // trick events_session_stats / events_anomaly_robust ride). One
      // map-side-combinable sort-based aggregate per group at scale.
      t(s, dir, "orders")
        .select(col("o_orderpriority"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").as("cents"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(cents, 0.25)").as("q1_cents"),
          expr("percentile(cents, 0.5)").as("median_cents"),
          expr("percentile(cents, 0.75)").as("q3_cents"))
        .orderBy(col("o_orderpriority"))
    }),
    "q_anti_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 300000),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),
    "q_semi_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 400000),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey"))
    }),
    "q_scalar_funcs" -> ((s, dir) => {
      t(s, dir, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        length(col("p_name")).as("name_len"),
        substring(col("p_type"), 1, 5).as("type5"),
        concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
        floor(col("p_retailprice")).cast("long").as("price_fl"),
        pmod(col("p_partkey"), lit(7)).as("pk_mod"))
        .orderBy(col("p_partkey"))
    }),
    "q_date_funcs" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)"))
            .cast("double").as("sum_price"))
        .orderBy(col("y"), col("m"))
    }),
    "q_case_bucket" -> ((s, dir) => {
      t(s, dir, "customer").select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "neg")
          .when(col("c_acctbal") < 3000, "low")
          .when(col("c_acctbal") < 7000, "mid")
          .otherwise("high").as("bucket"))
        .orderBy(col("c_custkey"))
    }),
    "q_pivot" -> ((s, dir) => {
      // pivot with an EXPLICIT value list: no distinct-value discovery
      // job, and the output schema is fixed at plan time (the only
      // pivot shape that scales — value discovery over 100 TB is a
      // full extra pass)
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type",
          Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        // fill ONLY the pivoted counts — an unscoped fill would also
        // rewrite a null group key to 0 and merge it with real user 0
        .na.fill(0L,
          Seq("click", "error", "purchase", "signup", "view"))
        .orderBy(col("user_id"))
    }),
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "customer")
        .unpivot(Array(col("c_custkey")),
          Array(col("c_acctbal").cast("double").as("c_acctbal"),
            col("c_nationkey").cast("double").as("c_nationkey")),
          "metric", "val")
        .orderBy(col("c_custkey"), col("metric"))
    }),

    // ---- north star: deduplication ----
    "dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents")).orderBy(col("keep_id"))
    }),
    "dedup_minhash" -> ((s, dir) => {
      Dedup.minhashPairs(t(s, dir, "documents"), k = 16, bands = 4,
        minJaccard = 0.7).orderBy(col("id_a"), col("id_b"))
    }),
    "dedup_simhash" -> ((s, dir) => {
      Dedup.simhashPairs(t(s, dir, "documents"), maxHamming = 6)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "dedup_ngram_jaccard" -> ((s, dir) => {
      groundTruthPairs(s, dir).orderBy(col("id_a"), col("id_b"))
    }),
    "dedup_containment" -> ((s, dir) => {
      // asymmetric excerpt detector: pairs where the smaller 8-gram
      // set is ≥ 90% contained in the larger — catches short-doc-
      // quoted-in-long-doc shapes Jaccard's union term drowns. Char
      // 8-grams, not 3-grams: a small alphabet makes short-gram SETS
      // converge across unrelated docs (3-gram containment ≥ 0.55
      // matched 117k of the 125k possible pairs — pure alphabet
      // saturation), while 8-grams keep sets doc-specific. Same
      // scoped 500-doc ground-truth contract as dedup_ngram_jaccard.
      Dedup.containmentPairs(
        t(s, dir, "documents").filter(col("doc_id") < 500)
          .select(col("doc_id"), col("text")),
        n = 8, minContainmentBp = 9000L)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "dedup_clusters" -> ((s, dir) => {
      Dedup.clusters(groundTruthPairs(s, dir)).orderBy(col("doc_id"))
    }),
    "dedup_filtered" -> ((s, dir) => {
      val docs = t(s, dir, "documents").filter(col("doc_id") < 500)
      Dedup.dropNearDuplicates(docs, groundTruthPairs(s, dir))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),
    "dedup_cluster_reps" -> ((s, dir) => {
      // quality-aware collapse: keep each near-dup cluster's LONGEST
      // doc (n_chars as the quality score), not its first-crawled id
      val docs = t(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"), col("n_chars"))
      Dedup.clusterRepresentatives(docs, groundTruthPairs(s, dir),
        scoreCol = "n_chars")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),
    "decontam_semantic" -> ((s, dir) => {
      // embedding-space decontamination: corpus = vec_id >= 50, eval
      // set = vec_id < 50; survivors have no eval neighbor at 0.45
      val emb = t(s, dir, "embeddings")
      Similarity.semanticDecontaminate(
        emb.filter(col("vec_id") >= 50), emb.filter(col("vec_id") < 50),
        minCosine = 0.45)
        .select(col("vec_id")).orderBy(col("vec_id"))
    }),
    "dedup_embedding" -> ((s, dir) => {
      // brute-force O(N²) pairs: the oracle-checkable GROUND TRUTH
      // (and the recall yardstick for dedup_embedding_ann below);
      // production corpora route through the linear ANN path instead
      Similarity.cosinePairs(t(s, dir, "embeddings"), minCosine = 0.45)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "dedup_embedding_ann" -> ((s, dir) => {
      // the 100 TB path: sign-LSH bucketed candidates + exact
      // quantized-cosine verify — linear, nothing broadcast, no O(N²)
      // stage. Fixture-suited geometry: the synthetic embeddings top
      // out at cosine ~0.51 (θ ~1.04 rad, per-plane collision p~0.66),
      // so recall needs coarse tables — 3 planes × 12 tables. A real
      // near-dup corpus (cosine ≥ 0.9, p ≥ 0.86) uses the scale
      // defaults (16 planes × 4 tables) with far smaller buckets.
      Similarity.annCosinePairs(t(s, dir, "embeddings"), minCosine = 0.45,
        nPlanes = 3, nTables = 12)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "dedup_edit_distance" -> ((s, dir) => {
      // typo-class near-dup: the fixture corpus is all-unique at small
      // edit distances, so the query stages mutated recrawls (2-char
      // suffix edits under new ids) the operator must pair with their
      // originals; any natural same-prefix fixture pair joins too
      val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
      val staged = docs.unionByName(
        docs.filter(col("doc_id") < 20)
          .select((col("doc_id") + 20000).as("doc_id"),
            concat(col("text"), lit(" x")).as("text")))
      Dedup.editDistancePairs(staged, maxEdits = 4)
        .orderBy(col("id_a"), col("id_b"))
    }),
    "dedup_semantic" -> ((s, dir) => {
      // SemDeDup: k-means partition + exact within-cell cosine pairs.
      // k-means is not ANSI-SQL-expressible -> no_oracle; pinned by
      // SimilaritySpec (exact-subset-of-brute-force + recall +
      // determinism + plan asserts)
      Similarity.semanticPairs(t(s, dir, "embeddings"), minCosine = 0.45,
        nCells = 4).orderBy(col("id_a"), col("id_b"))
    }),
    "dedup_spans" -> ((s, dir) => {
      // substring-level dedup (Lee et al. 2022 re-expressed
      // Spark-first): maximal cross-doc duplicated regions as merged
      // islands of 30-char grams occurring in >1 document
      Dedup.duplicatedSpans(t(s, dir, "documents"), n = 30)
        .orderBy(col("doc_id"), col("span_start"))
    }),
    "dedup_span_stats" -> ((s, dir) => {
      Dedup.duplicatedSpanStats(t(s, dir, "documents"), n = 30)
        .orderBy(col("doc_id"))
    }),
    "dedup_span_scrubbed" -> ((s, dir) => {
      Dedup.removeDuplicatedSpans(t(s, dir, "documents"), n = 30)
        .orderBy(col("doc_id"))
    }),

    // ---- north star: similarity search ----
    "sim_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.topK(emb.filter(col("vec_id") < 10), emb, k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),
    "sim_hard_negatives" -> ((s, dir) => {
      // contrastive hard-negative mining: top-3 nearest DIFFERENT-
      // label vectors per anchor, exact quantized cosine (the anchor
      // broadcast is batch-sized — 8 rows — same adjudicated shape
      // as sim_topk)
      Similarity.hardNegatives(t(s, dir, "embeddings"),
        col("vec_id") < 8, k = 3)
        .orderBy(col("query_id"), col("rank"))
    }),
    "sim_triplets" -> ((s, dir) => {
      // batch-hard triplet construction: per anchor the farthest
      // same-label positive + nearest different-label negative, with
      // the triplet-violation margin
      Similarity.hardTriplets(t(s, dir, "embeddings"),
        col("vec_id") < 16)
        .orderBy(col("anchor_id"))
    }),
    "sim_ann_lsh" -> ((s, dir) => {
      // fixture-suited table geometry: the synthetic embeddings are
      // near-orthogonal, so a fixture top-5 neighbor sits near cosine
      // ~0.3 (per-plane collision p ≈ 0.6) — coarse-but-many tables
      // (3 planes × 12 tables, union hit 1-(1-p³)¹² ≈ 0.94+) beat the
      // scale defaults (16 planes × 4 tables), which assume a corpus
      // with real near-neighbor structure at cosine ≥ 0.9. Measured
      // recall vs the exact twin: 0.96-1.00 across fixture scales
      // (tools/RecallProbe), driver-gated by sim_ann_lsh_recall below.
      Similarity.annTopK(t(s, dir, "embeddings"), col("id") < 10, k = 5,
        nPlanes = 3, nTables = 12)
        .orderBy(col("query_id"), col("rank"))
    }),
    "sim_ann_ivf" -> ((s, dir) => {
      Similarity.ivfTopK(t(s, dir, "embeddings"), col("id") < 10, k = 5)
        .orderBy(col("query_id"), col("rank"))
    }),
    "sim_ann_pq" -> ((s, dir) => {
      // IVF-PQ (FAISS IVFPQ shape): coarse cells prune, asymmetric
      // distance tables rank candidates in m lookups each, exact
      // rerank restores bit-true cosines; recall driver-gated by
      // sim_ann_pq_recall. Fixture-suited geometry (same reasoning as
      // sim_ann_lsh): the synthetic embeddings are near-orthogonal, so
      // true top-5 neighbors sit in a near-tie band around cosine ~0.3
      // where coarse ADC ordering is hardest — finer subspaces
      // (m=16 × ksub=32) and a deeper exact rerank (12k) hold recall
      // at 0.84–0.96 across fixture scales; a corpus with real
      // near-dup structure is the easy case and runs the m=8 default.
      Similarity.ivfPqTopK(t(s, dir, "embeddings"), col("id") < 10, k = 5,
        nProbe = 8, m = 16, ksub = 32, rerankFactor = 12)
        .orderBy(col("query_id"), col("rank"))
    }),

    // ---- approximate-operator recall gates ----
    // The five sketch operators above are murmur-based and therefore
    // SQL-inexpressible (no_oracle); these derived queries close that
    // evidence gap by materializing each sketch output as parquet
    // (recallDumpDir) and scoring it against its SQL-expressible exact
    // twin — DuckDB re-reads the SAME sketch rows via read_parquet and
    // recomputes n_exact/n_hit/recall independently, so the floors the
    // specs pin become hash-checked driver gates.
    "dedup_minhash_recall" -> ((s, dir) => {
      recallGate(s, dir, "dedup_minhash_recall", groundTruthPairs(s, dir),
        Dedup.minhashPairs(t(s, dir, "documents"), k = 16, bands = 4,
          minJaccard = 0.7),
        Seq("id_a", "id_b"), floorBp = 9500)
    }),
    "dedup_simhash_recall" -> ((s, dir) => {
      recallGate(s, dir, "dedup_simhash_recall", groundTruthPairs(s, dir),
        Dedup.simhashPairs(t(s, dir, "documents"), maxHamming = 6),
        Seq("id_a", "id_b"), floorBp = 9500)
    }),
    "dedup_embedding_ann_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      recallGate(s, dir, "dedup_embedding_ann_recall",
        Similarity.cosinePairs(emb, minCosine = 0.45),
        Similarity.annCosinePairs(emb, minCosine = 0.45, nPlanes = 3,
          nTables = 12),
        Seq("id_a", "id_b"), floorBp = 9000)
    }),
    "sim_ann_lsh_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      recallGate(s, dir, "sim_ann_lsh_recall",
        Similarity.topK(emb.filter(col("vec_id") < 10), emb, k = 5),
        Similarity.annTopK(emb, col("id") < 10, k = 5, nPlanes = 3,
          nTables = 12),
        Seq("query_id", "neighbor_id"), floorBp = 9000)
    }),
    "sim_ann_ivf_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      recallGate(s, dir, "sim_ann_ivf_recall",
        Similarity.topK(emb.filter(col("vec_id") < 10), emb, k = 5),
        Similarity.ivfTopK(emb, col("id") < 10, k = 5),
        Seq("query_id", "neighbor_id"), floorBp = 8000)
    }),
    "sim_ann_pq_recall" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      recallGate(s, dir, "sim_ann_pq_recall",
        Similarity.topK(emb.filter(col("vec_id") < 10), emb, k = 5),
        Similarity.ivfPqTopK(emb, col("id") < 10, k = 5, nProbe = 8,
          m = 16, ksub = 32, rerankFactor = 12),
        Seq("query_id", "neighbor_id"), floorBp = 8000)
    }),
    "dedup_incremental_near_recall" -> ((s, dir) => {
      // the staged recrawls (corpus docs < 50 re-ingested under
      // id+10000 with a short suffix) are near-dups BY CONSTRUCTION,
      // so the must-drop set needs no sketch math: recall = the share
      // of them the incremental near-dedup actually dropped. The
      // survivor ids are materialized; the oracle recomputes the
      // staged set and the drop count from them directly.
      val all = t(s, dir, "documents")
      val corpus = all.filter(col("doc_id") < 400)
      val batch = all.filter(col("doc_id") >= 400)
        .select(col("doc_id"), col("text"))
        .unionByName(corpus.filter(col("doc_id") < 50)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat(col("text"), lit(" recrawled")).as("text")))
      val dumped = dumpForOracle(s, dir, "dedup_incremental_near_recall",
        Dedup.incrementalNear(batch, corpus).select(col("doc_id")))
      val staged = corpus.filter(col("doc_id") < 50)
        .select((col("doc_id") + 10000).as("doc_id"))
      val recallBp = "CASE WHEN n_exact = 0 THEN CAST(10000 AS BIGINT) " +
        "ELSE (10000 * n_hit) DIV n_exact END"
      staged.agg(count(lit(1)).as("n_exact")).crossJoin(
          staged.join(dumped, Seq("doc_id"), "left_anti")
            .agg(count(lit(1)).as("n_hit")))
        .selectExpr("n_exact", "n_hit", s"$recallBp AS recall_bp",
          s"$recallBp >= 9500 AS meets_floor")
    }),
    "dedup_semantic_recall" -> ((s, dir) => {
      // SemDeDup co-clustering recall vs the brute-force pair set;
      // nCells=4 on the near-orthogonal fixture keeps ~2/3 of true
      // pairs co-clustered (measured across scales by RecallProbe) —
      // a real clustered corpus concentrates near-dups in one cell
      val emb = t(s, dir, "embeddings")
      recallGate(s, dir, "dedup_semantic_recall",
        Similarity.cosinePairs(emb, minCosine = 0.45),
        Similarity.semanticPairs(emb, minCosine = 0.45, nCells = 4),
        Seq("id_a", "id_b"), floorBp = 4000)
    }),
    // ---- sketch error-bound gates ----
    // Same materialize-as-data trick as the recall gates, applied to
    // the estimate-valued sketch queries: the DataSketches estimates
    // land in parquet, DuckDB re-reads them next to its own exact
    // computation, and the oracle asserts the expected within-bound
    // outcome — an estimate drifting past its published error bound
    // becomes a hash mismatch, not a silently-agreeing false.
    "profile_sketch_lake_bounds" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dumped = dumpForOracle(s, dir, "profile_sketch_lake_bounds",
        Profile.hllSketchLake(ev).select(col("event_type"),
          col("est_users")))
      val exact = ev.groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("exact_users"))
      dumped.join(exact, "event_type")
        .selectExpr("event_type", "est_users", "exact_users",
          // HLL at default lgK: spec-pinned 5% relative bound, with
          // an absolute floor of 1 for tiny segments
          "100 * abs(est_users - exact_users) <= " +
            "greatest(100L, 5 * exact_users) AS within_bound")
        .orderBy(col("event_type"))
    }),
    "profile_sketch_overlap_bounds" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val dumped = dumpForOracle(s, dir, "profile_sketch_overlap_bounds",
        Profile.audienceOverlap(ev, "click", "purchase")
          .select(col("est_overlap")))
      val exact = ev.filter(col("event_type").isin("click", "purchase"))
        .groupBy(col("user_id"))
        .agg(count_distinct(col("event_type")).as("nk"))
        .filter(col("nk") === 2)
        .agg(count(lit(1)).as("exact_overlap"))
      dumped.crossJoin(exact)
        .selectExpr("est_overlap", "exact_overlap",
          "100 * abs(est_overlap - exact_overlap) <= " +
            "greatest(100L, 5 * exact_overlap) AS within_bound")
    }),
    "sqlfn_gate" -> ((s, dir) => {
      // derived driver gate for q_sql_functions — the last no_oracle
      // entry that had no derived check: materialize the SQL-registry
      // demo output and score every SQL-expressible invariant in
      // DuckDB. The oracle recomputes `h` INDEPENDENTLY via the
      // recursive sdbm CTE (the engine-neutral twin that already pins
      // docid_composite and corpus_manifest), recomputes the shingle
      // count from the text itself, and checks the sorted-merge
      // self-intersection identity; simhash stays ScalaTest-pinned
      // (murmur is the one leg SQL cannot reach).
      val dumped = dumpForOracle(s, dir, "sqlfn_gate",
        queries("q_sql_functions")(s, dir))
      val docs = t(s, dir, "documents")
        .select(col("doc_id").as("d_id"), col("text"))
      dumped.join(docs, col("doc_id") === col("d_id"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("h") ===
            graft.functions.sdbm_hash(col("d_id"), col("text")), 1L)
            .otherwise(0L)).as("n_h_match"),
          sum(when(col("n_shingles") ===
            greatest(size(split(col("text"), " ")) - 2, lit(0)), 1L)
            .otherwise(0L)).as("n_shingle_match"),
          sum(when(col("self_shared") === col("n_distinct_shingles"), 1L)
            .otherwise(0L)).as("n_selfshared_match"))
        .selectExpr("n_rows", "n_h_match", "n_shingle_match",
          "n_selfshared_match",
          "n_h_match = n_rows AS h_ok",
          "n_shingle_match = n_rows AS shingle_ok",
          "n_selfshared_match = n_rows AS selfshared_ok")
    }),
    "text_compression_bounds" -> ((s, dir) => {
      // the deflate kernel's output scored against what any correct
      // DEFLATE of text must satisfy: positive, never past the
      // worst-case envelope (stored-block overhead ≤ 64 bytes at
      // fixture sizes), and a corpus mean ratio in the natural-prose
      // band (observed 0.478; bounds 0.20-0.80) — the oracle computes
      // byte totals from the table itself and asserts the expected
      // outcome booleans
      val docs = t(s, dir, "documents")
      val dumped = dumpForOracle(s, dir, "text_compression_bounds",
        TextStats.compressionSignal(docs)
          .select(col("doc_id"), col("deflate_len")))
      val exact = docs.select(col("doc_id"),
        octet_length(coalesce(col("text"), lit(""))).cast("long")
          .as("n_bytes"))
      dumped.join(exact, "doc_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bytes")).as("bytes_total"),
          sum(col("deflate_len")).as("deflate_total"),
          sum(when(col("n_bytes") === 0L ||
              (col("deflate_len") > 0L &&
                col("deflate_len") <= col("n_bytes") + 64L), 0L)
            .otherwise(1L)).as("n_bad"))
        .selectExpr("n_docs", "bytes_total", "deflate_total",
          "(10000 * deflate_total) DIV bytes_total AS mean_ratio_bp",
          "n_bad = 0 AS all_within_worstcase",
          "(10000 * deflate_total) DIV bytes_total " +
            "BETWEEN 2000 AND 8000 AS ratio_plausible")
    }),
    "profile_approx_bounds" -> ((s, dir) => {
      // the approxTable estimates scored against the exact profiling
      // pass: HLL distinct within the 3-sigma 15% band, approx
      // percentiles within ±1% rank of their target (two-sided via
      // the [count(<p), count(<=p)] rank interval, so value ties
      // cannot false-flag). Rank counts ride along as cross-checked
      // integers; the ok booleans are oracle-asserted TRUE.
      val docs = t(s, dir, "documents")
      val dumped = dumpForOracle(s, dir, "profile_approx_bounds",
        Profile.approxTable(docs))
      val exact = Profile.table(docs)
        .select(col("col_name"), col("n").as("e_n"),
          col("n_null").as("e_null"), col("n_distinct").as("nd_exact"))
      val nums = docs.select(explode(array(
          struct(lit("doc_id").as("col_name"),
            col("doc_id").cast("double").as("v")),
          struct(lit("n_chars").as("col_name"),
            col("n_chars").cast("double").as("v")))).as("m"))
        .select(col("m.col_name"), col("m.v"))
        .filter(col("v").isNotNull)
      val rk = nums
        .join(dumped.select(col("col_name"), col("p50"), col("p95"),
          col("p99")), "col_name")
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("nv"),
          sum(when(col("v") < col("p50"), 1L).otherwise(0L)).as("r50_lt"),
          sum(when(col("v") <= col("p50"), 1L).otherwise(0L)).as("r50_le"),
          sum(when(col("v") < col("p95"), 1L).otherwise(0L)).as("r95_lt"),
          sum(when(col("v") <= col("p95"), 1L).otherwise(0L)).as("r95_le"),
          sum(when(col("v") < col("p99"), 1L).otherwise(0L)).as("r99_lt"),
          sum(when(col("v") <= col("p99"), 1L).otherwise(0L)).as("r99_le"))
      // no NULLs in the output: a NULL BIGINT/BOOLEAN stringifies
      // differently between the two compare paths (None vs nan) —
      // non-numeric columns get vacuously-TRUE percentile oks and
      // zero rank counts on BOTH sides instead
      def band(q: Int): String =
        s"CASE WHEN nv IS NULL THEN TRUE ELSE " +
          s"r${q}_lt <= ($q * nv) DIV 100 + greatest(1L, nv DIV 100) AND " +
          s"r${q}_le >= ($q * nv) DIV 100 - greatest(1L, nv DIV 100) " +
          s"END AS p${q}_ok"
      dumped.join(exact, "col_name").join(rk, Seq("col_name"), "left")
        .selectExpr(Seq("col_name", "nd_exact",
          "n = e_n AND n_null = e_null AS n_ok",
          "abs(approx_distinct - nd_exact) <= " +
            "greatest(1L, (15 * nd_exact) DIV 100) AS nd_ok") ++
          Seq("r50_lt", "r50_le", "r95_lt", "r95_le", "r99_lt", "r99_le")
            .map(c => s"coalesce($c, 0L) AS $c") ++
          Seq(band(50), band(95), band(99)): _*)
        .orderBy(col("col_name"))
    }),

    // ---- north star: text analysis ----
    "text_token_stats" -> ((s, dir) => {
      TextStats.tokenStats(t(s, dir, "documents")).orderBy(col("doc_id"))
    }),
    "text_quality" -> ((s, dir) => {
      TextStats.qualityScore(t(s, dir, "documents")).orderBy(col("doc_id"))
    }),
    "text_langid" -> ((s, dir) => {
      TextStats.langId(t(s, dir, "documents")).orderBy(col("doc_id"))
    }),
    "text_fingerprint" -> ((s, dir) => {
      TextStats.fingerprint(t(s, dir, "documents")).orderBy(col("doc_id"))
    }),
    "text_repetition" -> ((s, dir) => {
      TextStats.repetition(t(s, dir, "documents")).orderBy(col("doc_id"))
    }),
    "profile_documents" -> ((s, dir) => {
      Profile.table(t(s, dir, "documents")).orderBy(col("col_name"))
    }),
    "profile_approx" -> ((s, dir) => {
      // sketch-based profiling twin (HLL distinct + approx quantiles):
      // not ANSI-reproducible -> no_oracle; error-bounded vs the exact
      // pass in OperatorsSpec
      Profile.approxTable(t(s, dir, "documents")).orderBy(col("col_name"))
    }),
    "profile_sketch_lake" -> ((s, dir) => {
      // sketches AS DATA: per-(type, day) HLL sketches unioned at
      // query time — deterministic DataSketches estimates but not
      // ANSI-reproducible -> no_oracle; ProfileSketchSpec pins
      // two-level == single-pass identity and the error bound
      Profile.hllSketchLake(t(s, dir, "events"))
        .orderBy(col("event_type"))
    }),
    "profile_sketch_overlap" -> ((s, dir) => {
      // Theta set algebra over stored sketches: |click ∩ purchase|
      // without joining raw id sets; no_oracle (sketch estimate),
      // error-bounded in ProfileSketchSpec
      Profile.audienceOverlap(t(s, dir, "events"), "click", "purchase")
    }),
    "profile_kll_lake" -> ((s, dir) => {
      // the QUANTILE leg of sketches-as-data: per-(type, day) KLL
      // sketches merged at query time; no_oracle (KLL merge is
      // order-sensitive, so estimates are bound-checked, not
      // hash-checked — profile_kll_lake_bounds below)
      Profile.kllQuantileLake(t(s, dir, "events"))
        .orderBy(col("event_type"))
    }),
    "profile_kll_lake_bounds" -> ((s, dir) => {
      // rank audit of the materialized KLL estimates: the inclusive
      // rank of each estimated quantile must sit within 500 bp of its
      // target (k=200 normalized rank error ~165 bp + discreteness);
      // DuckDB recomputes the SAME ranks from the dump, asserting the
      // within flags TRUE — a drift past the bound hash-mismatches
      val ev = t(s, dir, "events")
      val dumped = dumpForOracle(s, dir, "profile_kll_lake_bounds",
        Profile.kllQuantileLake(ev))
      ev.join(dumped, "event_type")
        .groupBy(col("event_type"), col("p50_est"), col("p95_est"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("value") <= col("p50_est"), 1L).otherwise(0L))
            .as("le50"),
          sum(when(col("value") <= col("p95_est"), 1L).otherwise(0L))
            .as("le95"))
        .selectExpr("event_type",
          "(10000 * le50) div n AS r50_bp",
          "(10000 * le95) div n AS r95_bp",
          "abs((10000 * le50) div n - 5000) <= 500 AS p50_within",
          "abs((10000 * le95) div n - 9500) <= 500 AS p95_within")
        .orderBy(col("event_type"))
    }),
    "profile_equidepth" -> ((s, dir) => {
      // quantile (equi-depth) histogram, exact boundaries for the
      // oracle; the approx default is the 100 TB path (same plan, the
      // sketch replacing the value-buffer percentile)
      Profile.equiDepthHistogram(t(s, dir, "documents"), "n_chars",
        nBins = 8, exact = true)
        .orderBy(col("bin"))
    }),
    "profile_histogram" -> ((s, dir) => {
      Profile.histogram(t(s, dir, "documents"), "n_chars")
        .orderBy(col("bin"))
    }),
    "profile_heavy_hitters" -> ((s, dir) => {
      Profile.heavyHitters(t(s, dir, "events"), "user_id")
        .orderBy(col("n_rows").desc, col("value"))
    }),
    "profile_fk_orphans" -> ((s, dir) => {
      // the TPC-H fixture has full integrity, so the audit's positive
      // path is staged by dropping every 10th customer from the
      // parent side — those customers' orders must surface as orphans
      Profile.fkOrphans(t(s, dir, "orders"),
        t(s, dir, "customer").filter(col("c_custkey") % 10 =!= 0),
        "o_custkey", "c_custkey")
        .select(col("o_orderkey"), col("o_custkey"))
        .orderBy(col("o_orderkey"))
    }),
    "text_chunks" -> ((s, dir) => {
      TextStats.chunk(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),
    "text_chunks_tokens" -> ((s, dir) => {
      TextStats.chunkTokens(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),
    "text_diversity" -> ((s, dir) => {
      TextStats.charDiversity(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),
    "text_vocab" -> ((s, dir) => {
      // corpus-level token frequency table (tokenizer-training prep):
      // the Profile heavy-hitter op composed over exploded tokens
      Profile.heavyHitters(
        t(s, dir, "documents").select(
          explode(split(lower(col("text")), " ")).as("w"))
          .filter(col("w") =!= ""),
        "w", k = 100)
        .orderBy(col("n_rows").desc, col("value"))
    }),
    "text_compression" -> ((s, dir) => {
      // deflate is not SQL-expressible -> no_oracle; the kernel and
      // signal ordering are pinned by TextStatsSpec + a PlanSpec
      // codegen assert
      TextStats.compressionSignal(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),
    "text_bigrams" -> ((s, dir) => {
      // corpus-level adjacent-token-pair counts — the frequency table
      // a BPE-style tokenizer trainer consults each merge step (the
      // top row IS the next merge). The codegen'd shingle kernel (not
      // the interpreted HOF form), spread across cores before the
      // explode (single-row-group scan = one task otherwise).
      val par = s.sparkContext.defaultParallelism
      t(s, dir, "documents")
        .select(col("doc_id"), col("text"))
        .repartition(par, col("doc_id"))
        .select(explode(graft.functions.word_shingles(
          Dedup.tokens(col("text")), 2)).as("pair"))
        .groupBy(col("pair")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("pair")).limit(100)
    }),
    "text_lm_score" -> ((s, dir) => {
      // corpus-as-its-own-language-model fluency scoring
      // (TextStats.lmScore): mean bigram conditional probability in
      // integer basis points. Repartitioned off the single fixture
      // row group like text_bigrams so the explode parallelizes.
      val par = s.sparkContext.defaultParallelism
      TextStats.lmScore(
        t(s, dir, "documents").select(col("doc_id"), col("text"))
          .repartition(par, col("doc_id")))
        .orderBy(col("doc_id"))
    }),
    "text_postings" -> ((s, dir) => {
      // inverted index (IR/retrieval prep): term -> df + sorted
      // posting list
      TextStats.invertedIndex(t(s, dir, "documents"))
        .orderBy(col("term"))
    }),
    "text_search" -> ((s, dir) => {
      // integer-scored tf·idf top-k over the index's token domain;
      // already totally ordered (score desc, doc_id) inside the op
      TextStats.searchTopK(t(s, dir, "documents"),
        Seq("spark", "window", "merge"), k = 10)
    }),
    "text_bm25" -> ((s, dir) => {
      // Okapi BM25 (k1=1.2, b=0.75 as exact rationals) — the length-
      // normalized ranking twin of text_search; integer-exact scores,
      // totally ordered inside the op
      TextStats.bm25TopK(t(s, dir, "documents"),
        Seq("spark", "window", "merge"), k = 10)
    }),
    "text_chisq" -> ((s, dir) => {
      // χ² term–class feature selection over the 20 source classes:
      // top-3 most class-associated terms each, micro-exact scores
      TextStats.chiSquareTerms(t(s, dir, "documents"), "source",
        k = 3, minDf = 3)
        .orderBy(col("cls"), col("rank"))
    }),
    "text_prf_search" -> ((s, dir) => {
      // RM3-lite pseudo-relevance feedback: BM25 → top-5 feedback
      // docs → 3 expansion terms by tf_fb·idf → expanded BM25;
      // fully declarative, nothing collected
      Retrieval.prfSearch(t(s, dir, "documents"),
        Seq("spark", "window", "merge"), k = 10)
    }),
    "text_keywords" -> ((s, dir) => {
      TextStats.tfidfKeywords(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("rank"))
    }),
    "hybrid_search" -> ((s, dir) => {
      // hybrid retrieval: tf·idf lexical pool + exact-cosine vector
      // pool fused by integer-quantized reciprocal-rank fusion — the
      // two-tower search shape with a deterministic BIGINT score.
      // (the vector pool's BNLJ carries a ONE-row build side — the
      // single query vector — same adjudicated shape as the other
      // single-row broadcasts)
      Retrieval.hybridTopK(t(s, dir, "documents"),
        t(s, dir, "embeddings"),
        Seq("spark", "window", "merge"), queryVecId = 0L)
    }),
    "quality_filtered" -> ((s, dir) => {
      // default thresholds chosen so every reason fires on the
      // fixture: token bounds cut ~10% each side, lang drops the
      // no-stopword (pred 'unknown') docs, repetition ~15%, quality
      // ~20% of the surviving en docs
      TextStats.qualityFilter(t(s, dir, "documents"))
        .orderBy(col("doc_id"))
    }),

    // ---- north star: PII scrubbing ----
    // The synthetic fixture text is digit-free, so a scrub over it
    // would never exercise the redaction branch; both sides (Spark and
    // the oracle SQL) first inject deterministic doc_id-derived PII —
    // emails on doc_id%3, IPs on %4, phones on %5, long numeric ids on
    // %7 — then scrub it. The injection is part of the QUERY, not the
    // operator: Scrub itself takes any frame.
    "scrub_redacted" -> ((s, dir) => {
      Scrub.redact(piiDocs(t(s, dir, "documents"))).orderBy(col("doc_id"))
    }),
    "text_html_clean" -> ((s, dir) => {
      // boilerplate strip over the staged web-page wrapper: tags,
      // comment and script body vanish, entities decode exactly once,
      // whitespace collapses — pure codegen'd projection
      val staged = concat(lit(htmlWrapPrefix),
        coalesce(col("text"), lit("")), lit(htmlWrapSuffix))
      t(s, dir, "documents")
        .select(col("doc_id"), Scrub.htmlCleanCol(staged).as("clean_text"))
        .orderBy(col("doc_id"))
    }),
    "url_canonical" -> ((s, dir) => {
      // canonical URL key over a staged crawl URL exercising every
      // rule: uppercase scheme/host, default port, doubled slashes,
      // utm params (first + last positions), fragment
      val staged = concat(lit("HTTP://WWW."), col("source"),
        lit(".Example.com:80//a//"), (col("doc_id") % 7).cast("string"),
        lit("?utm_source=feed&id="), col("doc_id").cast("string"),
        lit("&utm_campaign=x#sec"))
      t(s, dir, "documents")
        .select(col("doc_id"), Urls.canonicalizeUrl(staged).as("url_canonical"))
        .orderBy(col("doc_id"))
    }),
    "url_domains" -> ((s, dir) => {
      // per-domain corpus stats over the staged URLs
      val staged = concat(lit("HTTP://user@WWW."), col("source"),
        lit(".Example.com:80/p"))
      t(s, dir, "documents")
        .groupBy(Urls.domainOf(staged).as("domain"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("domain"))
    }),
    "scrub_counts" -> ((s, dir) => {
      Scrub.summary(piiDocs(t(s, dir, "documents"))).orderBy(col("source"))
    }),
    "scrub_pseudonymize" -> ((s, dir) => {
      // user_id → salted stable token; event_id kept as the row key.
      // Same-user rows share a token (referential integrity), which
      // the oracle checks end-to-end via the sdbm CTE twin.
      Scrub.pseudonymize(
        t(s, dir, "events").select(col("event_id"), col("user_id")),
        Seq("user_id"), salt = "s1", prefix = "u")
        .withColumnRenamed("user_id", "user_token")
        .orderBy(col("event_id"))
    }),
    "quality_filtered_stream" -> ((s, dir) => {
      // the stateless-streaming twin of quality_filtered: same
      // operator, same oracle, run through readStream → append sink
      graft.streaming.StatelessPipe.toCompletion(s, dir, "documents",
        TextStats.qualityFilter(_)).orderBy(col("doc_id"))
    }),

    "sample_packed" -> ((s, dir) => {
      // budget 512 ≈ 9 docs/sequence on this fixture, so shards chop
      // into several bins and offsets exercise the wrap-around
      Sampling.packSequences(t(s, dir, "documents"),
        TextStats.nTokens(col("text")), budget = 512)
        .orderBy(col("doc_id"))
    }),
    "sample_packed_text" -> ((s, dir) => {
      Sampling.packedText(t(s, dir, "documents"),
        TextStats.nTokens(col("text")), budget = 512)
        .orderBy(col("shard"), col("bin"))
    }),
    "sample_fixed_k" -> ((s, dir) => {
      // deterministic reservoir replacement: exactly k rows by
      // scrambled-hash rank (TakeOrderedAndProject, rerun-stable)
      Sampling.fixedK(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          col("text")), k = 50)
        .orderBy(col("doc_id"))
    }),
    "sample_weighted_priority" -> ((s, dir) => {
      // weighted sample: k docs by Duffield–Lund–Thorup priority
      // (w/u, deterministic u from the id hash) — long docs
      // near-certain, short docs ∝ n_chars, variance-optimal subset
      // estimation. Two-limb exact-division priorities keep both
      // engines bit-identical without 64-bit overflow.
      Sampling.prioritySample(
        t(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        k = 50, weightCol = "n_chars")
        .orderBy(col("doc_id"))
    }),
    "dedup_keep_latest" -> ((s, dir) => {
      // recrawl dedup: latest row per key (here: each user's latest
      // event, ts desc, event_id breaking exact-ts ties)
      Dedup.keepLatest(t(s, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type")),
        keyCol = "user_id", orderCol = "ts", tieBreakCol = "event_id")
        .orderBy(col("user_id"))
    }),
    "q_snapshot_diff" -> ((s, dir) => {
      // corpus drop audit: old snapshot lacks doc_id%10==3, the new
      // drop lacks %10==7 and bumps n_chars on %5==0 — added/removed/
      // changed classified in one full-outer key join
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val oldSnap = base.filter(col("doc_id") % 10 =!= 3)
      val newSnap = base.filter(col("doc_id") % 10 =!= 7)
        .withColumn("n_chars",
          when(col("doc_id") % 5 === 0, col("n_chars") + 1)
            .otherwise(col("n_chars")))
      Diff.snapshot(oldSnap, newSnap, Seq("doc_id"))
        .orderBy(col("doc_id"))
    }),
    "sample_fixed_k_stratified" -> ((s, dir) => {
      // k docs PER SOURCE by the same scrambled rank; WindowGroupLimit
      // pre-truncates map-side so the shuffle carries ~k rows/stratum
      Sampling.fixedKStratified(
        t(s, dir, "documents").select(col("doc_id"), col("source"),
          col("text")), k = 10, strataCol = "source")
        .orderBy(col("doc_id"))
    }),
    "dedup_incremental" -> ((s, dir) => {
      // nightly-ingest scenario on the all-unique fixture: the batch
      // is the 100 fresh docs plus 50 recrawls of corpus content
      // under new ids; the survivors must be exactly the fresh 100
      val all = t(s, dir, "documents")
      val corpus = all.filter(col("doc_id") < 400)
      val batch = all.filter(col("doc_id") >= 400).unionByName(
        corpus.filter(col("doc_id") < 50)
          .withColumn("doc_id", col("doc_id") + 10000))
      Dedup.incremental(batch, corpus).orderBy(col("doc_id"))
    }),

    "dedup_incremental_near" -> ((s, dir) => {
      // nightly ingest with NEAR-dup recrawls: the corpus content
      // comes back lightly mutated under new ids; MinHash (not
      // SQL-expressible -> no_oracle; pinned by DedupSpec) drops them
      // plus any batch doc near-duplicating the corpus or an
      // earlier batch doc
      val all = t(s, dir, "documents")
      val corpus = all.filter(col("doc_id") < 400)
      val batch = all.filter(col("doc_id") >= 400)
        .select(col("doc_id"), col("text"))
        .unionByName(corpus.filter(col("doc_id") < 50)
          .select((col("doc_id") + 10000).as("doc_id"),
            concat(col("text"), lit(" recrawled")).as("text")))
      Dedup.incrementalNear(batch, corpus).orderBy(col("doc_id"))
    }),

    // ---- north star: benchmark decontamination ----
    "decontam_flagged" -> ((s, dir) => {
      // "benchmark" = the fixed doc_id < 400 slice (stays eval-suite
      // sized at every SF and is the broadcast side); corpus = the
      // rest (grows with SF, the realistic big input). A corpus doc is
      // contaminated when it shares any 30-char span with the eval set.
      val all = t(s, dir, "documents")
      Decontaminate.flagged(all.filter(col("doc_id") >= 400),
        all.filter(col("doc_id") < 400))
        .orderBy(col("doc_id"))
    }),
    "decontam_clean" -> ((s, dir) => {
      val all = t(s, dir, "documents")
      Decontaminate.clean(all.filter(col("doc_id") >= 400),
        all.filter(col("doc_id") < 400))
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),

    // ---- north star: sampling / corpus construction ----
    "sample_split" -> ((s, dir) => {
      Sampling.hashSplit(t(s, dir, "documents"))
        .select(col("doc_id"), col("split")).orderBy(col("doc_id"))
    }),
    "sample_split_leakage_free" -> ((s, dir) => {
      // leakage-free split: each doc takes the split of its near-dup
      // CLUSTER (connected-components root over the ground-truth pair
      // graph), so paraphrase families never straddle train/test
      val docs = t(s, dir, "documents").filter(col("doc_id") < 500)
        .select(col("doc_id"))
      Sampling.splitByCluster(docs, groundTruthPairs(s, dir))
        .select(col("doc_id"), col("split_key"), col("split"))
        .orderBy(col("doc_id"))
    }),
    "sample_mixture" -> ((s, dir) => {
      // target mixture: src0 quartered, src1 halved, src2 dropped,
      // everything else at 3/4 weight
      Sampling.mixture(t(s, dir, "documents"), "source",
        Map("src0" -> 0.25, "src1" -> 0.5, "src2" -> 0.0), default = 0.75)
        .select(col("doc_id"), col("source")).orderBy(col("doc_id"))
    }),
    "sample_mixture_upsampled" -> ((s, dir) => {
      // src0 is upsampled 2.5× (two whole copies + a deterministic
      // half), src1 halved, the rest passes through once; weights are
      // exact binary fractions so the threshold math is FP-identical
      // on both engines
      Sampling.mixtureUpsampled(t(s, dir, "documents"), "source",
        Map("src0" -> 2.5, "src1" -> 0.5), default = 1.0)
        .select(col("doc_id"), col("source"), col("copy"))
        .orderBy(col("doc_id"), col("copy"))
    }),
    "sample_token_budget" -> ((s, dir) => {
      // per-source token budget over the same whitespace token count
      // text_token_stats pins; docs admitted in stable hash order
      val txt = col("text")
      val nTokens = when(length(trim(txt)) === 0, lit(0L))
        .otherwise((length(txt) - length(replace(txt, lit(" "))) + 1)
          .cast("long"))
      Sampling.tokenBudget(
        t(s, dir, "documents").withColumn("n_tokens", nTokens),
        col("n_tokens"), budget = 1000L, strataCol = "source")
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("cum_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ---- north star: event windows (batch + streaming twin) ----
    "events_tumbling" -> ((s, dir) => {
      Events.tumbling(t(s, dir, "events"))
        .orderBy(col("window_start"), col("event_type"))
    }),
    "events_sliding" -> ((s, dir) => {
      Events.sliding(t(s, dir, "events")).orderBy(col("window_start"))
    }),
    "events_sessionize" -> ((s, dir) => {
      Events.sessionize(t(s, dir, "events"))
        .orderBy(col("user_id"), col("session_start"))
    }),
    "events_session_window" -> ((s, dir) => {
      // Spark's NATIVE gap-session operator — the built-in alternative
      // to the custom sessionizer. Boundary semantics differ by design:
      // session_window's window is [ts, ts+gap), so an event at
      // EXACTLY prev+gap starts a new session (>=), where
      // Events.sessionize continues it (>) — the oracle twin encodes >=
      t(s, dir, "events")
        .groupBy(col("user_id"),
          session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"), max(col("ts")).as("session_end"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("session_end"), col("n_events"))
        .orderBy(col("user_id"), col("session_start"))
    }),
    "q_window_dist" -> ((s, dir) => {
      // distribution window functions: ntile / percent_rank /
      // cume_dist over a deterministic total order
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"))
        .orderBy(col("c_custkey"))
    }),
    "q_cdc_merge" -> ((s, dir) => {
      // lakehouse MERGE: a staged change set (updates with two
      // versions for some keys to exercise last-wins, deletes,
      // inserts) applied onto the customer snapshot
      val cust = t(s, dir, "customer")
      val base = cust.select(col("c_custkey"), col("c_name"),
        col("c_nationkey"), col("c_acctbal"), col("c_mktsegment"))
      val upd1 = base.filter(col("c_custkey") < 50)
        .withColumn("c_acctbal", col("c_acctbal") + 100.0)
        .withColumn("op", lit("U")).withColumn("version", lit(1L))
      val upd2 = base.filter(col("c_custkey") < 20)
        .withColumn("c_acctbal", col("c_acctbal") + 500.0)
        .withColumn("op", lit("U")).withColumn("version", lit(2L))
      val dels = base.filter(col("c_custkey") >= 50 &&
          col("c_custkey") < 60)
        .withColumn("op", lit("D")).withColumn("version", lit(1L))
      val ins = base.filter(col("c_custkey") < 10)
        .withColumn("c_custkey", col("c_custkey") + 100000L)
        .withColumn("op", lit("U")).withColumn("version", lit(1L))
      val changes = upd1.unionByName(upd2).unionByName(dels)
        .unionByName(ins)
      Merge.applyCdc(base, changes, Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    }),
    "q_scd2" -> ((s, dir) => {
      // dimension history from a versioned change log: every order a
      // customer places is a new "version" of the customer dimension
      // (the order date stands in for the change version)
      Merge.scd2(
        t(s, dir, "orders").select(col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp"))
            .as("version"), col("o_totalprice"))
          // duplicate (key, date) rows would make valid_to ambiguous:
          // keep the highest-priced order per day as the day's state
          .groupBy(col("o_custkey"), col("version"))
          .agg(max(col("o_totalprice")).as("o_totalprice")),
        keys = Seq("o_custkey"))
        .orderBy(col("o_custkey"), col("valid_from"))
    }),
    "q_scd2_asof" -> ((s, dir) => {
      // time travel: each customer's dimension state as of 2000-01-01
      // — a pushable interval-containment filter over the history
      val hist = Merge.scd2(
        t(s, dir, "orders").select(col("o_custkey"),
          unix_micros(col("o_orderdate").cast("timestamp"))
            .as("version"), col("o_totalprice"))
          .groupBy(col("o_custkey"), col("version"))
          .agg(max(col("o_totalprice")).as("o_totalprice")),
        keys = Seq("o_custkey"))
      // 2000-01-01T00:00:00Z in epoch µs
      Merge.scd2AsOf(hist, lit(946684800000000L))
        .orderBy(col("o_custkey"))
    }),
    "q_nullsafe_join" -> ((s, dir) => {
      // null-safe equality join (<=>): null keys MATCH each other —
      // the join a dedup on a nullable key actually needs (plain =
      // silently drops every null row)
      val n = t(s, dir, "nation")
      val a = n.select(col("n_nationkey").as("ak"),
        when(col("n_nationkey") % 5 === 0, lit(null))
          .otherwise(col("n_regionkey")).cast("long").as("k"))
      val b = n.select(col("n_nationkey").as("bk"),
        when(col("n_nationkey") % 3 === 0, lit(null))
          .otherwise(col("n_regionkey")).cast("long").as("k2"))
      a.join(b, col("k") <=> col("k2"))
        .select(col("ak"), col("bk"), col("k"))
        .orderBy(col("ak"), col("bk"))
    }),
    "q_lateral_join" -> ((s, dir) => {
      // LATERAL correlated subquery — per-customer top-order lookup
      // planned as a correlated join (DecorrelateInnerQuery path),
      // the remaining subquery shape beside scalar and EXISTS
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT c.c_custkey, l.n_orders, l.max_price
        FROM g_customer c,
        LATERAL (SELECT count(*) AS n_orders,
                        max(o_totalprice) AS max_price
                 FROM g_orders o WHERE o.o_custkey = c.c_custkey) l
        WHERE l.n_orders > 0
        ORDER BY c.c_custkey""")
    }),
    "q_exists_subquery" -> ((s, dir) => {
      // correlated EXISTS + NOT EXISTS through the SQL planner path
      // (RewritePredicateSubquery → semi/anti joins) — the subquery
      // shapes the DataFrame-API q_semi/q_anti queries don't exercise
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT c_custkey, c_name FROM g_customer c
        WHERE EXISTS (SELECT 1 FROM g_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 100000)
          AND NOT EXISTS (SELECT 1 FROM g_orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderpriority = '1-URGENT')
        ORDER BY c_custkey""")
    }),
    "q_hof_arrays" -> ((s, dir) => {
      // higher-order array functions over per-order quantity lists:
      // sort_array for a deterministic collect order, then filter /
      // transform / aggregate — all codegen-adjacent lambda forms,
      // integer-exact so the DuckDB list_* twins hash-match
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_quantity").cast("long")))
          .as("qs"))
        .select(col("l_orderkey"),
          size(col("qs")).as("n_items"),
          size(filter(col("qs"), q => q > 25L)).as("n_big"),
          aggregate(col("qs"), lit(0L), (acc, q) => acc + q)
            .as("total_qty"),
          aggregate(transform(col("qs"), q => q * q), lit(0L),
            (acc, q) => acc + q).as("sum_sq"))
        .orderBy(col("l_orderkey"))
    }),
    "q_json_extract" -> ((s, dir) => {
      // JSON path extraction over the props column (get_json_object —
      // the row-level JSON scalar surface; from_json's structured
      // parse is covered by mem_markup_*)
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))
    }),
    "q_zorder" -> ((s, dir) => {
      // Morton code over (user, hour) — the write-side clustering key;
      // the oracle recomputes the interleave with the same exact
      // integer shift/mask arithmetic. Hour bucket via the
      // subtract-pmod-then-div idiom (RangeJoin.bucketOf): sign-safe
      // exact floor, matching DuckDB's `//` even pre-epoch — bare
      // `div` truncates toward zero and would diverge there
      val us = unix_micros(col("ts"))
      val hr = idiv(
        us - pmod(us, lit(3600000000L)), lit(3600000000L))
        .bitwiseAND(lit(0xFFFFL))
      t(s, dir, "events")
        .select(col("event_id"), col("user_id"), hr.as("hr"))
        .withColumn("z", Layout.zorder2(col("user_id"), col("hr")))
        .orderBy(col("z"), col("event_id"))
    }),
    "events_funnel" -> ((s, dir) => {
      Events.funnel(t(s, dir, "events")).orderBy(col("user_id"))
    }),
    "events_anomaly" -> ((s, dir) => {
      // 1.5σ: the fixture values are uniform-ish (max deviation
      // ~1.73σ), so 3σ would never fire; 1.5σ flags a meaningful
      // minority and exercises both branches
      Events.anomalies(t(s, dir, "events"), sigmaTenths = 15)
        .orderBy(col("event_id"))
    }),
    "events_anomaly_robust" -> ((s, dir) => {
      // IQR boxplot outliers per event type at k=0.9 (the fixture's
      // near-uniform values put nothing outside the classic 1.5 fence
      // — 0.9 exercises both branches)
      Events.anomaliesRobust(t(s, dir, "events"), k = 0.9)
        .orderBy(col("event_id"))
    }),
    "events_ewma" -> ((s, dir) => {
      // exact truncated-EWMA smoothing (α=1/2, depth 8) of hourly
      // per-type value sums — integer weights, floor-normalized
      Events.ewmaHourly(t(s, dir, "events"), depth = 8)
        .orderBy(col("event_type"), col("hour"))
    }),
    "events_ewma_hourly" -> ((s, dir) => {
      // the ewma's input frame on its own — the diagnostic half of
      // the ewma gate: bisects any divergence to bucketing vs
      // smoothing in one run
      Events.hourlyQuantized(t(s, dir, "events"))
        .orderBy(col("event_type"), col("hour"))
    }),
    "events_transitions" -> ((s, dir) => {
      // first-order Markov next-event matrix with basis-point
      // transition probabilities
      Events.transitions(t(s, dir, "events"))
        .orderBy(col("prev_type"), col("next_type"))
    }),
    "events_anomaly_mad" -> ((s, dir) => {
      // median/MAD robust z-test at k=1.5 — completes the anomaly
      // trio (σ, IQR, MAD); dyadic-exact double medians both engines
      Events.anomaliesMad(t(s, dir, "events"), kTenths = 15)
        .orderBy(col("event_id"))
    }),
    "events_winsorize" -> ((s, dir) => {
      // rank-based p05/p95 winsorization per type — exact integer
      // bounds by rank, no quantile interpolation
      Events.winsorize(t(s, dir, "events"))
        .orderBy(col("event_id"))
    }),
    "events_stream_tumbling" -> ((s, dir) => {
      graft.streaming.EventsStream.tumblingToCompletion(s, dir)
        .orderBy(col("window_start"), col("event_type"))
    }),
    "events_stream_tumbling_append" -> ((s, dir) => {
      // append-mode twin: windows emit once, on watermark close
      // (sentinel-flushed); equals the batch tumbling aggregation
      graft.streaming.EventsStream.tumblingAppendToCompletion(s, dir)
        .orderBy(col("window_start"), col("event_type"))
    }),
    "events_state_inspect" -> ((s, dir) => {
      // offline state introspection: the tumbling count's RocksDB
      // checkpoint read back via format("statestore") with no query
      // running — complete-mode drain leaves state == final aggregate,
      // so the batch GROUP BY is the oracle
      graft.streaming.EventsStream.stateInspect(s, dir)
        .orderBy(col("window_start"), col("event_type"))
    }),
    "events_stream_sliding" -> ((s, dir) => {
      graft.streaming.EventsStream.slidingToCompletion(s, dir)
        .orderBy(col("window_start"))
    }),
    "events_stream_enrich" -> ((s, dir) => {
      // stream-static dimension join: stateless, append mode; same
      // oracle as the equivalent batch join
      graft.streaming.EventsStream.enrichToCompletion(s, dir)
        .orderBy(col("event_id"))
    }),
    "events_stream_session_window" -> ((s, dir) => {
      // native session_window merging state across micro-batches;
      // sentinel-flushed, same oracle as the batch twin
      graft.streaming.EventsStream.sessionWindowToCompletion(s, dir)
        .orderBy(col("user_id"), col("session_start"))
    }),
    "events_stream_enrich_outer" -> ((s, dir) => {
      // incomplete dimension: events of every 10th customer surface
      // with null cust_name instead of silently dropping
      graft.streaming.EventsStream.enrichOuterToCompletion(s, dir)
        .orderBy(col("event_id"))
    }),
    "events_stream_foreach" -> ((s, dir) => {
      // foreachBatch programmable sink: stream -> per-batch parquet
      // append -> re-read; hashed against the events table itself
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-feb").toFile
      // localCheckpoint() is EAGER: the sink files are fully read into
      // block storage before the finally deletes them — the lifetime
      // this relies on, so don't swap in a lazy checkpoint/persist
      val back =
        try graft.streaming.EventsStream
          .foreachBatchToParquet(s, dir, tmp.toString).localCheckpoint()
        finally deleteRecursively(tmp)
      back.orderBy(col("event_id"))
    }),
    "events_stream_attribution" -> ((s, dir) => {
      // stream-stream interval join (click -> purchase within 1 h per
      // user), state bounded by watermark + two-sided range condition
      graft.streaming.EventsStream.attributionToCompletion(s, dir)
        .orderBy(col("click_id"), col("purchase_id"))
    }),
    "events_stream_attribution_outer" -> ((s, dir) => {
      // stream-stream LEFT OUTER interval join: unmatched clicks emit
      // with a null purchase side once the watermark passes their
      // eviction point (sentinel-driven in the completion harness)
      graft.streaming.EventsStream.attributionOuterToCompletion(s, dir)
        .orderBy(col("click_id"), col("purchase_id"))
    }),
    "events_stream_attribution_full" -> ((s, dir) => {
      // stream-stream FULL OUTER interval join: unmatched clicks AND
      // unmatched purchases emit null-sided rows, each flushed by its
      // own watermark-driven state eviction — the last cell of the
      // streaming join matrix
      graft.streaming.EventsStream.attributionFullOuterToCompletion(s, dir)
        .orderBy(col("click_id").asc_nulls_first,
          col("purchase_id").asc_nulls_first)
    }),

    // ---- north star: multimodal column plumbing ----
    "multimodal_meta" -> ((s, dir) => {
      Multimodal.decodeMeta(t(s, dir, "documents")).orderBy(col("doc_id"))
    }),
    "multimodal_phash" -> ((s, dir) => {
      // perceptual average-hash over the real decoded rasters; the
      // oracle re-derives every bit from the generator's closed form
      Multimodal.aHash(t(s, dir, "documents")).orderBy(col("doc_id"))
    }),
    "multimodal_phash_groups" -> ((s, dir) => {
      // image near-dup collapse: groups sharing an identical aHash
      // across different geometries/containers
      Multimodal.aHashGroups(t(s, dir, "documents"))
        .orderBy(col("ahash"))
    }),
    "multimodal_resize" -> ((s, dir) => {
      Multimodal.resizePlan(t(s, dir, "documents")).orderBy(col("doc_id"))
    }),
    "multimodal_frames" -> ((s, dir) => {
      Multimodal.frameSample(t(s, dir, "documents"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // ---- additional relational coverage ----
    "q_cube" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .cube(col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)"))
            .cast("double").as("sum_bal"))
        .orderBy(col("n_name").asc_nulls_first,
          col("c_mktsegment").asc_nulls_first)
    }),
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupingSets(
          Seq(Seq(col("n_name")), Seq(col("c_mktsegment")), Seq.empty),
          col("n_name"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)"))
            .cast("double").as("sum_bal"))
        .orderBy(col("n_name").asc_nulls_first,
          col("c_mktsegment").asc_nulls_first)
    }),
    "q_intersect" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
        .intersect(c.filter(col("c_mktsegment") === "BUILDING")
          .select(col("c_custkey")))
        .orderBy(col("c_custkey"))
    }),
    "q_salted_join" -> ((s, dir) => {
      // SkewJoin must be value-identical to the plain join (oracle is
      // the unsalted SQL join).
      SkewJoin.saltedJoin(
        t(s, dir, "lineitem").select(col("l_orderkey"), col("l_extendedprice"),
          col("l_discount")),
        t(s, dir, "orders").select(col("o_orderkey").as("l_orderkey"),
          col("o_orderpriority")),
        Seq("l_orderkey"), saltFactor = 8)
        .groupBy(col("o_orderpriority"))
        .agg(
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    }),
    "events_session_stats" -> ((s, dir) => {
      Events.sessionStats(t(s, dir, "events")).orderBy(col("user_id"))
    }),
    "q_range_join" -> ((s, dir) => {
      // point-in-interval attribution: every event back to the user
      // session that contains it (1:1 by construction — sessions
      // partition a user's events), as a bucketed equi-join, not a
      // BNLJ inequality join
      val ev = t(s, dir, "events")
      RangeJoin.pointInInterval(
        ev.select(col("user_id"), col("ts"), col("event_id")),
        Events.sessionize(ev), keys = Seq("user_id"))
        .select(col("event_id"), col("user_id"), col("session_start"))
        .orderBy(col("event_id"))
    }),
    "q_asof_join" -> ((s, dir) => {
      // point-in-time: each event joined to the user's latest order at
      // or before the event time (right side deduped to unique
      // (key, time) — as-of is ambiguous otherwise)
      val ord = t(s, dir, "orders")
        .groupBy(col("o_custkey"), col("o_orderdate"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin.asofJoin(
        t(s, dir, "events").select(col("event_id"), col("user_id"), col("ts")),
        ord, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey", "o_orderdate"))
        .orderBy(col("event_id"))
    }),
    "q_scalar_subquery" -> ((s, dir) => {
      // correlated max-per-customer, expressed as agg + broadcast join
      // (Catalyst would decorrelate the subquery the same way)
      val maxo = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(max(col("o_totalprice")).as("max_price"))
      t(s, dir, "customer")
        .join(maxo, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("max_price"))
        .orderBy(col("c_custkey"))
    }),
    "q_union_all" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      c.filter(col("c_acctbal") > 9000).select(col("c_custkey"))
        .unionAll(c.filter(col("c_mktsegment") === "MACHINERY")
          .select(col("c_custkey")))
        .groupBy(col("c_custkey")).agg(count(lit(1)).as("n"))
        .orderBy(col("c_custkey"))
    }),
    "q_outer_join" -> ((s, dir) => {
      t(s, dir, "customer")
        .join(t(s, dir, "orders").filter(col("o_totalprice") > 350000),
          col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_big_orders"),
          coalesce(sum(col("o_totalprice").cast("decimal(18,2)")),
            lit(0).cast("decimal(18,2)")).cast("double").as("sum_big"))
        .orderBy(col("c_custkey"))
    }),
    "text_bpe_tokens" -> ((s, dir) => {
      t(s, dir, "documents").select(col("doc_id"),
        size(regexp_extract_all(col("text"), lit("""\w+|[^\w\s]"""), lit(0)))
          .cast("long").as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    }),

    // ---- stateful streaming (flatMapGroupsWithState) ----
    "events_stream_sessionize" -> ((s, dir) => {
      graft.streaming.EventsStream.sessionizeToCompletion(s, dir)
        .orderBy(col("user_id"), col("session_start"))
    }),

    "events_stream_sessionize_tws" -> ((s, dir) => {
      // transformWithState twin: Spark 4's arbitrary-state successor
      // of flatMapGroupsWithState — typed ValueState + explicit
      // event-time timers. Same rows as events_stream_sessionize,
      // same batch oracle.
      graft.streaming.EventsStream.sessionizeTwsToCompletion(s, dir)
        .orderBy(col("user_id"), col("session_start"))
    }),

    "events_stream_sessionize_warm" -> ((s, dir) => {
      // batch→streaming cutover: pre-cutover sessions computed in
      // batch, the open one per user bootstrapped into the stream as
      // transformWithState INITIAL STATE, post-cutover events
      // streamed — union equals the all-batch sessionize
      graft.streaming.EventsStream.sessionizeWarmStartToCompletion(s, dir)
        .orderBy(col("user_id"), col("session_start"))
    }),

    "events_stream_type_profile" -> ((s, dir) => {
      // MapState + ListState primitives: per-user type counts merged
      // across micro-batches, flushed exactly once by a fixed-horizon
      // timer; list emitted sorted so the batch GROUP BY oracles it
      graft.streaming.EventsStream.typeProfileToCompletion(s, dir)
        .orderBy(col("user_id"))
    }),

    "events_stream_dedup" -> ((s, dir) => {
      graft.streaming.EventsStream.dedupToCompletion(s, dir)
        .orderBy(col("event_type"))
    }),
    "events_stream_fingerprint_dedup" -> ((s, dir) => {
      graft.streaming.EventsStream.fingerprintDedupToCompletion(s, dir)
        .orderBy(col("norm"))
    }),

    // ---- training-data JSONL export (extended sink surface) ----
    "jsonl_documents" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      docs.select(col("doc_id"),
        JsonlExport.jsonLine(docs, Seq("doc_id", "source", "text"))
          .as("line"))
        // explicit NULLS FIRST on both sides: the line rendering is
        // null-tolerant, so the sort must agree on null order too
        // (DuckDB defaults to NULLS LAST on ASC; Spark to NULLS FIRST)
        .orderBy(col("doc_id").asc_nulls_first)
    }),

    "jsonl_roundtrip" -> ((s, dir) => {
      // sink→source roundtrip: write sharded JSONL, read it back with
      // an explicit schema, and let the driver hash the result against
      // the parquet ground truth — proves the JSONL I/O pair preserves
      // values exactly (escapes, nulls, unicode) end-to-end
      val docs = t(s, dir, "documents")
      val cols = Seq("doc_id", "source", "text")
      val schema = org.apache.spark.sql.types.StructType(
        cols.map(n => docs.schema(n)))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-jsonl-rt").toFile
      val back =
        try {
          JsonlExport.writeShards(docs.repartition(4), cols, tmp.toString)
          // materialize before the shards are deleted
          JsonlSource.read(s, tmp.toString, schema).localCheckpoint()
        } finally deleteRecursively(tmp)
      back.orderBy(col("doc_id"))
    }),

    "jsonl_corrupt_audit" -> ((s, dir) => {
      // quarantine ingestion: a deterministic dirty corpus (every doc
      // as a clean JSONL line, PLUS one truncated line per
      // doc_id % 50 == 0) read back PERMISSIVE — clean rows parse,
      // malformed lines land whole in _corrupt with null fields, and
      // the job survives. The audit row (counts + clean-id checksum)
      // is derivable from the documents table, which is the oracle.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("source"))
      val clean = docs.select(
        to_json(struct(col("doc_id"), col("source"))).as("line"))
      val bad = docs.filter(col("doc_id") % 50 === 0)
        .select(concat(lit("""{"doc_id":"""), col("doc_id")).as("line"))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("source",
          org.apache.spark.sql.types.StringType)))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-jsonl-dirty").toFile
      val r =
        try {
          clean.union(bad).coalesce(2).write.mode("overwrite")
            .text(tmp.toString)
          JsonlSource.readWithCorrupt(s, tmp.toString, schema)
            .agg(
              count(when(col("_corrupt").isNull, 1)).as("n_clean"),
              sum(when(col("_corrupt").isNull, col("doc_id")))
                .cast("long").as("clean_id_sum"),
              count(col("_corrupt")).as("n_corrupt"))
            .localCheckpoint()
        } finally deleteRecursively(tmp)
      r
    }),

    "csv_roundtrip" -> ((s, dir) => {
      // same contract proof as jsonl_roundtrip for the CSV dialect:
      // sink → explicit-schema source → driver hashes vs parquet truth
      val docs = t(s, dir, "documents")
      val cols = Seq("doc_id", "source", "text")
      val schema = org.apache.spark.sql.types.StructType(
        cols.map(n => docs.schema(n)))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-csv-rt").toFile
      val back =
        try {
          CsvIO.writeShards(docs.repartition(4), cols, tmp.toString)
          CsvIO.read(s, tmp.toString, schema).localCheckpoint()
        } finally deleteRecursively(tmp)
      back.orderBy(col("doc_id"))
    }),

    "orc_roundtrip" -> ((s, dir) => {
      // ORC sink → source round-trip (the third columnar interchange
      // format beside parquet; built-in distributed scan/sink, schema
      // self-described so no dialect to pin). events is the richest
      // fixture typewise: timestamp (µs), double, strings, longs.
      val ev = t(s, dir, "events")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-orc-rt").toFile
      val back =
        try {
          ev.repartition(4).write.mode("overwrite").orc(tmp.toString)
          s.read.schema(ev.schema).orc(tmp.toString).localCheckpoint()
        } finally deleteRecursively(tmp)
      back.orderBy(col("event_id"))
    }),

    "avro_roundtrip" -> ((s, dir) => {
      // Avro sink → source round-trip (the row-oriented lake staple;
      // spark-avro isn't on the bundled classpath, so AvroIO drives
      // the public AvroKeyOutput/InputFormat Hadoop path instead)
      val ev = t(s, dir, "events")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-avro-rt").toFile
      // the Hadoop committer requires a NONEXISTENT output dir: write
      // to a subpath of the (pre-created) temp dir
      val out = new java.io.File(tmp, "out").toString
      val back =
        try {
          AvroIO.write(ev.repartition(4), out)
          AvroIO.read(s, out, ev.schema).localCheckpoint()
        } finally deleteRecursively(tmp)
      back.orderBy(col("event_id"))
    }),

    // ---- SQL text-query surface over registered graft functions ----
    "q_sql_functions" -> ((s, dir) => {
      graft.functions.registerSql(s)
      t(s, dir, "documents").createOrReplaceTempView("graft_documents")
      s.sql("""
        SELECT doc_id,
               sdbm_hash(doc_id, text) AS h,
               simhash64(split(text, ' ')) AS sh,
               size(word_shingles(split(text, ' '), 3)) AS n_shingles,
               size(shingle_hashes(split(text, ' '), 3)) AS n_distinct_shingles,
               shared_count(shingle_hashes(split(text, ' '), 3),
                            shingle_hashes(split(text, ' '), 3)) AS self_shared
        FROM graft_documents ORDER BY doc_id""")
    }),
    "q_udtf" -> ((s, dir) => {
      // the UDTF leg of the UDF/UDAF/UDTF surface: chunk_text is a
      // registered Catalyst Generator, so it resolves in the SQL
      // table-function position (LATERAL VIEW) like explode — one
      // (chunk_id, chunk) row per overlapping 120-char window,
      // bit-identical to the relational TextStats.chunk formulation
      // (which stays codegen'd and is the scale path; this proves the
      // SQL-surface capability)
      t(s, dir, "documents").createOrReplaceTempView("graft_docs_udtf")
      s.sql("""
        SELECT doc_id, c.chunk_id, c.chunk
        FROM graft_docs_udtf
        LATERAL VIEW chunk_text(text, 120, 30) c AS chunk_id, chunk
        ORDER BY doc_id, chunk_id""")
    }),
    "q_listagg" -> ((s, dir) => {
      // ordered string aggregation (SQL:2016 listagg, new in 4.1):
      // WITHIN GROUP pins element order so the result is
      // deterministic under any partitioning
      t(s, dir, "nation").createOrReplaceTempView("graft_nation_la")
      s.sql("""
        SELECT n_regionkey,
               listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)
                 AS names
        FROM graft_nation_la GROUP BY n_regionkey ORDER BY n_regionkey""")
    }),
    "q_recursive_cte" -> ((s, dir) => {
      // recursive CTE (Spark 4.1): bounded-depth hierarchy flattening
      // — every node's root ancestor and depth in a synthetic decimal
      // tree (parent = id div 10) over customers. Spark executes
      // recursion LEVEL BY LEVEL (one plan iteration per level), so
      // the shape only scales when depth is bounded — this tree is
      // ≤5 levels at any SF, vs the divergent date-spine formulation
      // (thousands of levels) that a Spark deployment must avoid.
      // Seed = single-digit ids; id 0's 0->0 self-edge is excluded
      // from the recursion or it never terminates.
      t(s, dir, "customer").createOrReplaceTempView("graft_cust_rec")
      s.sql("""
        WITH RECURSIVE e AS (
          SELECT c_custkey AS id, c_custkey div 10 AS parent
          FROM graft_cust_rec),
        walk(id, root, depth) AS (
          SELECT id, id, 0 FROM e WHERE id < 10
          UNION ALL
          SELECT e.id, w.root, w.depth + 1
          FROM e JOIN walk w ON e.parent = w.id
          WHERE e.id >= 10)
        SELECT id, root, depth FROM walk ORDER BY id""")
    }),
    "q_collation" -> ((s, dir) => {
      // Spark 4 collation support: grouping under UTF8_LCASE merges
      // case variants at the COMPARISON level (no lower() rewrite of
      // the data); the output key is normalized so both engines emit
      // identical text. Mixed case is injected deterministically.
      t(s, dir, "events").createOrReplaceTempView("graft_events_coll")
      s.sql("""
        SELECT lower(k) AS etype, count(*) AS n FROM (
          SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                      ELSE event_type END COLLATE UTF8_LCASE AS k
          FROM graft_events_coll) GROUP BY k ORDER BY etype""")
    }),
    "q_variant" -> ((s, dir) => {
      // Spark 4 native semi-structured ingestion: compose a nested
      // JSON doc (deterministic fixture injection, like the scrub
      // queries), parse ONCE to VARIANT, extract typed fields by
      // path at query time — the open-schema shape where no schema
      // is declared up front and each field is typed at extraction.
      // Extracted outputs are plain scalars so the DuckDB JSON twin
      // hash-compares; the VARIANT stays internal (parquet has no
      // comparable physical rendering). try_variant_get probes a
      // missing path → null, not failure.
      val ev = t(s, dir, "events")
      val j = concat(lit("""{"meta":{"type":""""), col("event_type"),
        lit("""","uid":"""), col("user_id"),
        lit("""},"payload":"""),
        coalesce(col("props"), lit("{}")), lit("}"))
      ev.select(col("event_id"), parse_json(j).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.meta.type", "string").as("etype"),
          variant_get(col("v"), "$.meta.uid", "bigint").as("uid"),
          variant_get(col("v"), "$.payload.k", "bigint").as("k"),
          try_variant_get(col("v"), "$.payload.missing", "bigint")
            .as("missing"))
        .orderBy(col("event_id"))
    }),
    "q_variant_agg" -> ((s, dir) => {
      // variant extractions flow through relational ops like any
      // column: group by a path extraction, sum another — proving
      // VARIANT composes with the agg pipeline (partial+final hash
      // agg), not just row-at-a-time projection
      val ev = t(s, dir, "events")
      val j = concat(lit("""{"meta":{"type":""""), col("event_type"),
        lit("""","uid":"""), col("user_id"),
        lit("""},"payload":"""),
        coalesce(col("props"), lit("{}")), lit("}"))
      ev.select(parse_json(j).as("v"))
        .groupBy(variant_get(col("v"), "$.meta.type", "string").as("etype"))
        .agg(sum(variant_get(col("v"), "$.payload.k", "bigint")).as("k_sum"),
          count(lit(1)).as("n"))
        .orderBy(col("etype"))
    }),

    "text_normalize" -> ((s, dir) => {
      // Unicode hygiene: append decomposed (e+U+0301, o+U+0308) and
      // composed (é ø ñ ü ç) forms to the fixture text, then NFC-
      // canonicalize and accent-fold — the same word in different
      // composition forms must converge before fingerprints/vocab
      // coalesce: Spark concat null-propagates while DuckDB concat
      // skips NULLs — without it a NULL text row would hash-diverge
      val dirty = concat(coalesce(col("text"), lit("")),
        lit(" café Nöel éøñüç"))
      t(s, dir, "documents")
        .select(col("doc_id"),
          graft.functions.nfc_normalize(dirty).as("nfc_text"),
          graft.functions.strip_accents(dirty).as("plain_text"))
        .orderBy(col("doc_id"))
    }),

    "xml_read_roundtrip" -> ((s, dir) => {
      // export → import loop: format documents, land sharded docsets,
      // parse them back with the docset READER — proving a produced
      // index source round-trips to the original values (the
      // migration-validation story). All fields come back as strings;
      // the oracle renders the same columns as text.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-xmlrt").toFile
      val back =
        try {
          val out = new java.io.File(tmp, "docset").toString
          XmlPipe.writeShardedDocsets(
            XmlPipe.formatDocs(docs, Seq("doc_id")), out)
          XmlPipe.readDocset(s, out,
            Seq("doc_id", "lang", "source", "n_chars")).localCheckpoint()
        } finally deleteRecursively(tmp)
      back.orderBy(col("id"))
    }),

    "xml_parse_roundtrip" -> ((s, dir) => {
      // the built-in-parser twin of xml_read_roundtrip: format the
      // full documents row through the xmlpipe2 renderer, then parse
      // each fragment back with Spark 4's NATIVE from_xml — typed
      // recovery (attribute id → _id, entity unescaping, int
      // re-typing) through Catalyst's own StaxXmlParser instead of
      // the regex docset reader. Proves a produced fragment is
      // consumable by a stock Spark pipeline with no graft code on
      // the read side; the oracle reads the same values straight
      // from the source table. Narrow per-row projection — no
      // shuffle before the presentation sort.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
      XmlPipe.formatDocs(docs, Seq("doc_id"))
        .select(from_xml(col("doc"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "_id BIGINT, doc_id BIGINT, text STRING, lang STRING, " +
              "source STRING, n_chars BIGINT"),
          new java.util.HashMap[String, String]()).as("p"))
        .select(col("p._id").as("id"), col("p.doc_id").as("doc_id"),
          col("p.text").as("text"), col("p.lang").as("lang"),
          col("p.source").as("source"), col("p.n_chars").as("n_chars"))
        .orderBy(col("id"))
    }),

    "xml_dsv2_source" -> ((s, dir) => {
      // the DataSource V2 connector end to end: export documents as
      // sharded docsets, read them back through
      // format("xmlpipe2") — the registered TableProvider — proving
      // the connector seam (the one a Cassandra source would plug
      // into) against the driver oracle. Same equivalence as
      // xml_read_roundtrip, via the DSv2 scan instead of column exprs.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-dsv2q").toFile
      val back =
        try {
          val out = new java.io.File(tmp, "docset").toString
          XmlPipe.writeShardedDocsets(
            XmlPipe.formatDocs(docs, Seq("doc_id")), out)
          s.read.format("xmlpipe2")
            .option("fields", "doc_id,lang,source,n_chars").load(out)
            .localCheckpoint()
        } finally deleteRecursively(tmp)
      back.orderBy(col("id"))
    }),

    "xml_dsv2_count" -> ((s, dir) => {
      // aggregate pushdown through the connector: COUNT(*) answered
      // by per-shard delimiter counts (SupportsPushDownAggregates,
      // partial mode — Spark's final agg sums one pre-counted long
      // per shard; no fragment is parsed). The plan must show the
      // pushed aggregation — a silent fallback to a row scan would
      // still count correctly, so the query asserts the plan shape
      // into the hashed output.
      val docs = t(s, dir, "documents").select(col("doc_id"), col("lang"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-dsv2c").toFile
      try {
        val out = new java.io.File(tmp, "docset").toString
        XmlPipe.writeShardedDocsets(
          XmlPipe.formatDocs(docs, Seq("doc_id")), out)
        val counted = s.read.format("xmlpipe2")
          .option("fields", "doc_id").load(out)
          .agg(count(lit(1)).as("n_docs"))
        val pushed = counted.queryExecution.executedPlan.toString
          .contains("PushedAggregation: [COUNT(*)]")
        counted.withColumn("agg_pushed", lit(pushed)).localCheckpoint()
      } finally deleteRecursively(tmp)
    }),

    "corpus_manifest" -> ((s, dir) => {
      // reproducibility manifest: per-source doc count, total size,
      // and an ORDER-INDEPENDENT content fingerprint (XOR-fold of the
      // per-doc sdbm hash — overflow-free, identical under any
      // partitioning) — the dataset-card row a corpus release pins so
      // a rebuild can prove content identity without a byte diff
      t(s, dir, "documents")
        .withColumn("fp", graft.functions.sdbm_hash(lit(0L), col("text")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("decimal(38,0)")).cast("long")
            .as("total_chars"),
          expr("bit_xor(fp)").as("content_fp"))
        .orderBy(col("source"))
    }),
    "corpus_pipeline" -> ((s, dir) => {
      // end-to-end hygiene-chain gate: the COMPOSED default pipeline
      // (NFC-canonicalize → boilerplate strip → PII redact → quality
      // filter → exact fingerprint dedup → duplicated-span removal →
      // deterministic hash split), reduced to a 3-row per-split
      // manifest (count, chars, order-independent content
      // fingerprint). Every stage is individually oracle-green
      // elsewhere; this entry proves their COMPOSITION — a drifted
      // join key, lost column, or reordered stage anywhere in
      // Corpus.pipelineFrame changes a fingerprint here.
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("text"))
      graft.tools.Corpus.pipelineFrame(docs)
        .withColumn("fp", graft.functions.sdbm_hash(lit(0L), col("text")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).cast("long").as("n_chars"),
          expr("bit_xor(fp)").as("content_fp"))
        .orderBy(col("split"))
    }),
    "io_provenance" -> ((s, dir) => {
      // row-level lineage without lineage columns: the _metadata
      // hidden column on file sources names the physical file and the
      // row's position inside it — at 100 TB this is how a sample, a
      // dedup survivor, or a flagged doc traces back to its shard
      // (the fixture file is written in doc_id order, so row_index
      // has a rank-based oracle)
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          col("_metadata.file_name").as("file_name"),
          col("_metadata.row_index").as("row_idx"))
        .orderBy(col("doc_id"))
    }),
    "io_partitioned" -> ((s, dir) => {
      // hive-partitioned lake layout: write events partitioned by day
      // (Layout.writeDatePartitioned), read back a 5-day window — the
      // date filter prunes whole partition DIRECTORIES at listing
      // time (PartitionFilters in the scan; plan recorded via
      // PlanCapture because the materialized result hides the read
      // plan behind the checkpoint leaf). Oracle: the same window
      // aggregated from the unpartitioned original.
      val ev = t(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"), col("ts"))
      val tmp = java.nio.file.Files.createTempDirectory("graft-part").toFile
      val back =
        try {
          val out = new java.io.File(tmp, "events_by_day").toString
          Layout.writeDatePartitioned(ev, "ts", out)
          val read = s.read.parquet(out)
            .filter(col("event_date") >= lit("2024-01-10").cast("date") &&
              col("event_date") <= lit("2024-01-14").cast("date"))
            .groupBy(col("event_type"))
            .agg(count(lit(1)).as("n"),
              sum(col("value").cast("decimal(18,4)"))
                .cast("double").as("sum_value"))
          graft.PlanCapture.record(
            "partition-pruned read (pre-materialize)", read)
          read.localCheckpoint()
        } finally deleteRecursively(tmp)
      back.orderBy(col("event_type"))
    }),

    // ---- typed Aggregator (UDAF) surface ----
    "q_udaf" -> ((s, dir) => {
      // quantity-weighted mean price per return flag via the exact
      // integer-weighted-mean Aggregator: value pre-quantized to cents
      // (round-half-up of price*100 — both engines round positive
      // halves identically), weight = integral l_quantity. All
      // accumulation is long arithmetic; the single final division is
      // the only FP op, so the result is merge-order-independent and
      // hash-comparable to the oracle's SUM/SUM twin.
      graft.functions.Udafs.register(s)
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"),
          col("l_quantity").cast("long").as("qty"))
        .groupBy(col("l_returnflag"))
        .agg(expr("weighted_mean_cents(cents, qty)").as("wmean_price"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),
    "profile_heavy_sketch" -> ((s, dir) => {
      // heavy hitters (≥0.5% of the table) the 100 TB way: a one-pass
      // mergeable Misra-Gries sketch (k=200 counters, ε=1/201 < 0.5%)
      // yields a candidate set PROVABLY containing every qualifying
      // key without shuffling all distinct keys; an exact recount of
      // just the ≤200 candidates (broadcast join, map-side combine)
      // restores exact deterministic output — identical to the plain
      // GROUP BY/HAVING the oracle runs, at a bounded shuffle width.
      graft.functions.Udafs.register(s)
      val ev = t(s, dir, "events").select(col("user_id"))
      val cand = ev.agg(expr("heavy_hitter_keys(user_id)").as("ks"))
        .select(explode(col("ks")).as("user_id"))
      val counted = ev.join(broadcast(cand), Seq("user_id"))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n_rows"))
      val tot = ev.agg(count(lit(1)).as("tot"))
      counted.crossJoin(broadcast(tot))
        .filter(col("n_rows") * 1000 >= col("tot") * 5)
        .select(col("user_id"), col("n_rows"))
        .orderBy(col("user_id"))
    }),

    // ---- round-11 wave: reachability, market-basket association,
    //      time-series diagnostics, Welch testing, skyline, corpus
    //      novelty ----
    "graph_bfs_levels" -> ((s, dir) => {
      // bounded single-source BFS over the same customer↔supplier
      // bipartite graph as graph_pagerank, source = smallest node key
      // (derived, so both engines agree); the oracle's recursive CTE
      // caps depth identically and takes min(d) per node.
      val e1 = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 100000L).as("dst"))
        .distinct()
      val edges = e1.unionByName(
        e1.select(col("dst").as("src"), col("src").as("dst")))
      Graph.bfsLevels(edges, maxHops = 3).orderBy(col("node"))
    }),
    "basket_pairs" -> ((s, dir) => {
      // Apriori-prefiltered co-purchase pairs over order baskets with
      // exact integer lift and cosine²; the full tiebreak (support,
      // p1, p2) makes the top-100 deterministic.
      Basket.frequentPairs(
        t(s, dir, "lineitem").select(col("l_orderkey").as("basket"),
          col("l_partkey").as("item")),
        minItemSup = 5L, minPairSup = 2L)
        .orderBy(col("n_ab").desc, col("p1"), col("p2"))
        .limit(100)
    }),
    "basket_item_sim" -> ((s, dir) => {
      // each item's 3 strongest associates by binarized cosine — the
      // per-key-top-k (WindowGroupLimit) shape over the symmetrized
      // pair frame.
      Basket.itemNeighbors(
        t(s, dir, "lineitem").select(col("l_orderkey").as("basket"),
          col("l_partkey").as("item")),
        k = 3, minItemSup = 5L, minPairSup = 2L)
        .orderBy(col("item"), col("rk"))
    }),
    "events_acf" -> ((s, dir) =>
      Events.acfDaily(t(s, dir, "events"), maxLag = 7)),
    "events_cusum" -> ((s, dir) =>
      Events.cusumDaily(t(s, dir, "events"))),
    "q_welch_ttest" -> ((s, dir) => {
      // Welch's unequal-variance t² for every event-type pair, as a
      // double OF EXACT RATIONALS (the q_stats_agg discipline): value
      // quantized to centi-units by round-half-up (positive halves
      // round identically in both engines), the five sufficient
      // statistics accumulate exactly (int64 sums, DECIMAL(38,0)
      // cross products), and t² = numᴵ/denᴵ is the single FP op.
      // t² = (S₁n₂−S₂n₁)²(n₁−1)(n₂−1) /
      //      [(n₁Q₁−S₁²)(n₂−1)n₂² + (n₂Q₂−S₂²)(n₁−1)n₁²]
      // — the textbook t²=(x̄₁−x̄₂)²/(s₁²/n₁+s₂²/n₂) cleared of
      // denominators. Exactness boundary: aa, bb, cc stay exact
      // decimals (bounded ≲10²⁴ at sf100 — n≈2·10⁷/type, x≤5.6·10⁴
      // centi-units), then CAST TO DOUBLE before the (n−1)·n²
      // combine: num ~ aa²n² ≈ 10⁵² and den ≈ 10⁴⁵ at sf100 would
      // overflow DECIMAL(38,0) — Spark's non-ANSI decimal overflow
      // NULLs silently while DuckDB errors, a divergent failure at
      // the documented target scale. Doubles of exact rationals with
      // the same left-assoc op order on both engines keep t2
      // bit-reproducible (the graph_assortativity/q_cuped
      // discipline). One data-sized hash aggregation; the pair join
      // runs on the event-type-count-sized stats frame.
      val d = (c: Column) => c.cast("decimal(38,0)")
      val st = t(s, dir, "events")
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(d(col("x")) * col("x")).as("qx"))
      st.as("a").join(st.as("b"),
          col("a.event_type") < col("b.event_type"))
        .select(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"),
          col("a.n").as("n_a"), col("b.n").as("n_b"),
          (d(col("a.sx")) * col("b.n") - d(col("b.sx")) * col("a.n"))
            .as("aa"),
          (d(col("a.n")) * col("a.qx") - d(col("a.sx")) * col("a.sx"))
            .as("bb"),
          (d(col("b.n")) * col("b.qx") - d(col("b.sx")) * col("b.sx"))
            .as("cc"))
        .withColumn("num",
          col("aa").cast("double") * col("aa").cast("double") *
            (col("n_a") - 1).cast("double") *
            (col("n_b") - 1).cast("double"))
        .withColumn("den",
          col("bb").cast("double") * (col("n_b") - 1).cast("double") *
            col("n_b").cast("double") * col("n_b").cast("double") +
            col("cc").cast("double") * (col("n_a") - 1).cast("double") *
              col("n_a").cast("double") * col("n_a").cast("double"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          expr("aa div (CAST(n_a AS DECIMAL(38,0)) * n_b)")
            .as("mean_diff_centi"),
          (col("num") / col("den")).as("t2"))
        .orderBy(col("type_a"), col("type_b"))
    }),
    "q_skyline" -> ((s, dir) => {
      // Pareto frontier of the part catalog: minimize retail price
      // (exact cents), maximize size — via the bucketed running-max
      // plan (no quadratic self-join, no global sort window).
      Skyline.pareto2d(
        t(s, dir, "part").select(col("p_partkey").as("id"),
          round(col("p_retailprice") * 100).cast("long").as("cost"),
          col("p_size").cast("long").as("gain")),
        bucketWidth = 100L)
        .orderBy(col("cost"), col("id"))
    }),
    "text_zipf" -> ((s, dir) => {
      // corpus vocabulary-shape summary: token count, vocabulary
      // size, hapax/dis legomena, max frequency, type-token ratio —
      // the Zipf/Heaps diagnostics a curation pass reads before
      // choosing dedup and quality thresholds. One exploded hash
      // aggregation to the vocabulary, one scalar rollup.
      val vc = t(s, dir, "documents")
        .select(explode(Dedup.tokens(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("f"))
      vc.agg(sum(col("f")).as("n_tokens"),
          count(lit(1)).as("vocab"),
          sum(when(col("f") === 1, 1L).otherwise(0L)).as("hapax"),
          sum(when(col("f") === 2, 1L).otherwise(0L)).as("dis"),
          max(col("f")).as("f_max"))
        .withColumn("ttr_micro", expr("(1000000 * vocab) div n_tokens"))
        .withColumn("hapax_vocab_micro",
          expr("(1000000 * hapax) div vocab"))
    }),
    "graph_kcore" -> ((s, dir) => {
      // 3-round k=3 core peel over the customer↔supplier graph; the
      // oracle unrolls identical rounds (each a two-sided alive
      // restriction + degree count)
      val e1 = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 100000L).as("dst"))
        .distinct()
      val edges = e1.unionByName(
        e1.select(col("dst").as("src"), col("src").as("dst")))
      Graph.kCore(edges, k = 3, rounds = 3).orderBy(col("node"))
    }),
    "graph_assortativity" -> ((s, dir) => {
      // degree assortativity of the same graph — exact sufficient
      // statistics, doubles of exact rationals (q_stats_agg pattern)
      val e1 = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 100000L).as("dst"))
        .distinct()
      val edges = e1.unionByName(
        e1.select(col("dst").as("src"), col("src").as("dst")))
      Graph.assortativity(edges)
    }),
    "events_seasonal" -> ((s, dir) =>
      Events.seasonalDow(t(s, dir, "events"))),
    "graph_sssp" -> ((s, dir) => {
      // bounded Bellman–Ford over the customer↔supplier graph with
      // inverse-strength weights (w = 10⁶ div pair link count): the
      // cheapest path routes through the strongest trading relations.
      // The oracle unrolls the identical three relaxation rounds.
      val p = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("src"),
          (col("l_suppkey") + 100000L).as("dst"))
        .agg(count(lit(1)).as("n"))
      val e1 = p.select(col("src"), col("dst"),
        expr("1000000 div n").as("w"))
      val edges = e1.unionByName(e1.select(col("dst").as("src"),
        col("src").as("dst"), col("w")))
      Graph.sssp(edges, rounds = 3).orderBy(col("node"))
    }),
    "q_bucket_recon" -> ((s, dir) => {
      // Merkle-style snapshot reconciliation: sparse synthetic churn
      // (one add, one remove, one change — all ids present at every
      // SF) so the digest phase prunes all but ≤3 of the ~keyspace/100
      // buckets before any row-level compare runs.
      val base = t(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"))
      val oldS = base.filter(col("doc_id") =!= 277)
      val newS = base.filter(col("doc_id") =!= 137)
        .withColumn("n_chars",
          when(col("doc_id") === 421, col("n_chars") + 7)
            .otherwise(col("n_chars")))
      Diff.bucketReconcile(oldS, newS, "doc_id",
        expr("(doc_id * 1000003 + n_chars) % 1000000007"),
        bucketWidth = 100L)
        .orderBy(col("doc_id"))
    }),
    "events_streaks" -> ((s, dir) =>
      Events.streaks(t(s, dir, "events")).orderBy(col("user_id"))),
    "events_trimmed_mean" -> ((s, dir) =>
      Events.trimmedMean(t(s, dir, "events"))
        .orderBy(col("event_type"))),
    "events_anomaly_seasonal" -> ((s, dir) =>
      Events.anomaliesSeasonal(t(s, dir, "events"))),
    "events_concurrency" -> ((s, dir) =>
      Events.maxConcurrencyDaily(t(s, dir, "events"))),
    "events_paths" -> ((s, dir) =>
      Events.eventPaths(t(s, dir, "events"), k = 20)),
    "graph_landmarks" -> ((s, dir) => {
      // 3-landmark simultaneous BFS over the customer↔supplier graph
      val e1 = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 100000L).as("dst"))
        .distinct()
      val edges = e1.unionByName(
        e1.select(col("dst").as("src"), col("src").as("dst")))
      Graph.multiSourceBfsLevels(edges, nSources = 3, maxHops = 3)
        .orderBy(col("source"), col("node"))
    }),
    "events_error_rate" -> ((s, dir) =>
      // daily error share in exact bp — the SRE burn-rate input; one
      // conditional aggregation at daily grain
      t(s, dir, "events")
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("errors"))
        .withColumn("error_bp", expr("(10000 * errors) div n"))
        .orderBy(col("day"))),
    "profile_log2_hist" -> ((s, dir) =>
      // order-of-magnitude histogram of order totals: the log₂
      // bucket is length(bin(cents)) − 1 — EXACT integer in both
      // engines, no floating log2 at power-of-two edges
      t(s, dir, "orders")
        .select(round(col("o_totalprice") * 100).cast("long")
          .as("cents"))
        .groupBy((length(bin(col("cents"))) - 1).cast("long")
          .as("log2_bucket"))
        .agg(count(lit(1)).as("n"), min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"))
        .orderBy(col("log2_bucket"))),
    "events_dau_wau" -> ((s, dir) => {
      // DAU/WAU stickiness: daily actives vs 7-day rolling distinct
      // actives. The rolling distinct is computed by fanning each
      // (user, active-day) row onto the ≤7 window days it supports —
      // a bounded 7× expansion of the user-day frame, never a
      // distinct-over-window shuffle per day.
      val ud = t(s, dir, "events")
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .distinct()
      val dau = ud.groupBy(col("day"))
        .agg(count(lit(1)).as("dau"))
      val wau = ud
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + 6)).as("day"))
        .distinct()
        .groupBy(col("day"))
        .agg(count(lit(1)).as("wau"))
      dau.join(wau, "day")
        .select(col("day"), col("dau"), col("wau"),
          expr("(10000 * dau) div wau").as("stickiness_bp"))
        .orderBy(col("day"))
    }),
    "events_hourly_heatmap" -> ((s, dir) =>
      // (day-of-week, hour-of-day) activity matrix — the ops heatmap
      // feed; pure epoch integer arithmetic, one hash aggregation
      t(s, dir, "events")
        .groupBy(expr("(unix_micros(ts) div 86400000000) % 7")
            .as("dow"),
          expr("(unix_micros(ts) div 3600000000) % 24").as("hour"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("dow"), col("hour"))),
    "sim_label_separation" -> ((s, dir) => {
      // embedding separation: mean signed cos² (exact integer bp) for
      // same-label vs cross-label pairs over the scoped slice — the
      // one-row margin readout behind sim_knn_accuracy
      val q = t(s, dir, "embeddings").filter(col("vec_id") < 500)
        .select(col("vec_id").as("id"), col("label").as("lbl"),
          Similarity.quantize(col("embedding")).as("qv"))
        .withColumn("norm", Similarity.qdot(col("qv"), col("qv")))
      val d = (c: Column) => c.cast("decimal(38,0)")
      q.as("a").join(q.as("b"), col("a.id") < col("b.id"))
        .select((col("a.lbl") === col("b.lbl")).as("intra"),
          Similarity.qdot(col("a.qv"), col("b.qv")).as("dot"),
          (col("a.norm") * d(col("b.norm"))).as("nn"))
        .withColumn("cos2_bp",
          expr("(10000 * CAST(dot AS DECIMAL(38,0)) * abs(dot)) " +
            "div nn"))
        .groupBy(col("intra"))
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(cos2_bp) div count(1)").as("mean_cos2_bp"))
        .orderBy(col("intra"))
    }),
    "text_zipf_by_source" -> ((s, dir) => {
      // per-source vocabulary shape — the text_zipf rollup grouped by
      // source, the side-by-side source-quality comparison (a source
      // with collapsed TTR is template spam before any dedup runs)
      val vc = t(s, dir, "documents")
        .select(col("source"), explode(Dedup.tokens(col("text")))
          .as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("f"))
      vc.groupBy(col("source"))
        .agg(sum(col("f")).as("n_tokens"), count(lit(1)).as("vocab"),
          sum(when(col("f") === 1, 1L).otherwise(0L)).as("hapax"),
          max(col("f")).as("f_max"))
        .withColumn("ttr_micro", expr("(1000000 * vocab) div n_tokens"))
        .orderBy(col("source"))
    }),
    "graph_degree_dist" -> ((s, dir) => {
      // degree distribution (count-of-counts over nodes) of the
      // customer↔supplier graph — the first thing anyone plots about
      // a graph, and the skew input the triangle orientation relies on
      val e1 = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 100000L).as("dst"))
        .distinct()
      val edges = e1.unionByName(
        e1.select(col("dst").as("src"), col("src").as("dst")))
      edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("deg"))
    }),
    "dedup_source_matrix" -> ((s, dir) => {
      // which sources duplicate each other: the scoped ground-truth
      // near-dup pairs attributed to (source, source) cells — the
      // provenance readout a crawl dedup report leads with
      val src = t(s, dir, "documents").select(col("doc_id"),
        col("source"))
      groundTruthPairs(s, dir)
        .join(src.select(col("doc_id").as("id_a"),
          col("source").as("sa")), "id_a")
        .join(src.select(col("doc_id").as("id_b"),
          col("source").as("sb")), "id_b")
        .groupBy(least(col("sa"), col("sb")).as("src_a"),
          greatest(col("sa"), col("sb")).as("src_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("src_a"), col("src_b"))
    }),
    "events_drift_tv" -> ((s, dir) => {
      // day-over-day type-mix drift as exact total-variation distance
      // in basis points: TV = Σ|n_t/N − m_t/M|/2, cleared of
      // fractions to (10⁴·Σ|n_t·M − m_t·N|) div (2·N·M) — the data-
      // drift monitor for ingest mix shifts. One daily aggregation,
      // one self-join shifted a day, one |types|-bounded rollup.
      val d = t(s, dir, "events")
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
      val tot = d.groupBy(col("day")).agg(sum(col("n")).as("nd"))
      val days = tot.join(
        tot.select((col("day") + 1).as("day"), col("nd").as("md")),
        "day")
      val cu = d.select(col("day"), col("event_type"), col("n"))
      val pv = d.select((col("day") + 1).as("day"), col("event_type"),
        col("n").as("m"))
      cu.join(pv, Seq("day", "event_type"), "full_outer")
        .select(col("day"), col("event_type"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("m"), lit(0L)).as("m"))
        .join(days, "day") // inner: only days with a previous day
        .groupBy(col("day"), col("nd"), col("md"))
        .agg(sum(abs(col("n") * col("md") - col("m") * col("nd")))
          .as("s"))
        .select(col("day"),
          expr("(10000 * s) div (2 * nd * md)").as("tv_bp"))
        .orderBy(col("day"))
    }),
    "events_wow_growth" -> ((s, dir) => {
      // week-over-week volume growth per event type in exact basis
      // points: one hash aggregation to (type, epoch-week) grain,
      // then a lag window over the calendar-bounded week sequence
      // per type; growth null on each type's first week
      val wk = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 604800000000").as("week"))
        .agg(count(lit(1)).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("week"))
      wk.withColumn("prev_n", lag(col("n"), 1).over(w))
        .withColumn("growth_bp",
          expr("(10000 * (n - prev_n)) div prev_n"))
        .orderBy(col("event_type"), col("week"))
    }),
    "text_mmr_rerank" -> ((s, dir) => {
      // diversity re-rank of a 10-doc candidate pool (longest src0
      // docs, rel = n_chars as the stand-in upstream score); the
      // oracle replays the identical greedy rounds
      val pool = t(s, dir, "documents")
        .filter(col("source") === "src0")
        .orderBy(col("n_chars").desc, col("doc_id")).limit(10)
        .select(col("doc_id").as("id"), col("n_chars").as("rel"),
          col("text"))
      Retrieval.mmrRerank(pool, k = 5, lambdaBp = 5000L)
        .orderBy(col("rank"))
    }),
    "events_funnel_windowed" -> ((s, dir) =>
      // signup→click→purchase with each step due within 24h of the
      // previous — the bounded-conversion funnel variant
      Events.funnelWindowed(t(s, dir, "events"),
        maxDelayUs = 86400000000L).orderBy(col("user_id"))),
    "sim_knn_accuracy" -> ((s, dir) =>
      // leave-one-out 1-NN label accuracy over the capped slice
      Similarity.knnLabelAccuracy(
        t(s, dir, "embeddings").filter(col("vec_id") < 500))),
    "events_cumulative_users" -> ((s, dir) => {
      // user-growth curve: first-seen day per user (one user-keyed
      // aggregation), daily new-user counts, cumulative over the
      // calendar-bounded day sequence — the novelty-attribution shape
      // (min-key first-touch) on the acquisition axis
      val first = t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(expr("min(unix_micros(ts) div 86400000000)").as("day"))
      val perDay = first.groupBy(col("day"))
        .agg(count(lit(1)).as("new_users"))
      perDay.withColumn("cum_users",
          sum(col("new_users")).over(
            org.apache.spark.sql.expressions.Window.orderBy(col("day"))
              .rowsBetween(org.apache.spark.sql.expressions.Window
                .unboundedPreceding, 0)))
        .orderBy(col("day"))
    }),
    "q_nearest_join" -> ((s, dir) => {
      // nearest order within ±3 days of each event (either
      // direction), per user — the bidirectional as-of variant
      val ev = t(s, dir, "events").select(col("event_id"),
        col("user_id"), unix_micros(col("ts")).as("t"))
      val or = t(s, dir, "orders")
        .groupBy(col("o_custkey"),
          unix_micros(col("o_orderdate")).as("ot"))
        .agg(min(col("o_orderkey")).as("o_orderkey"))
      AsOfJoin.nearestJoin(ev, or, "user_id", "o_custkey", "t", "ot",
        Seq("o_orderkey"), toleranceUs = 259200000000L)
        .orderBy(col("event_id"))
    }),
    "text_code_score" -> ((s, dir) =>
      TextStats.codeScore(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),
    "events_pareto" -> ((s, dir) =>
      Events.paretoConcentration(t(s, dir, "events"))),
    "sample_coverage" -> ((s, dir) =>
      // greedy max-coverage selection; the oracle replays the same 5
      // rounds over materialized gram CTEs
      Sampling.greedyCoverage(t(s, dir, "documents"), k = 5)
        .orderBy(col("rank"))),
    "profile_fd" -> ((s, dir) => {
      // declared-candidate functional dependencies: the primary-key
      // shaped ones hold, the fact-table ones are counted violations
      val o = Profile.functionalDeps(t(s, dir, "orders"),
        Seq(("o_orderkey", "o_custkey"), ("o_custkey", "o_orderkey")))
      val l = Profile.functionalDeps(t(s, dir, "lineitem"),
        Seq(("l_orderkey", "l_returnflag"), ("l_partkey", "l_suppkey")))
      o.unionByName(l).orderBy(col("fd"))
    }),
    "profile_skew" -> ((s, dir) =>
      Profile.keySkew(t(s, dir, "events"),
        Seq("user_id", "event_type")).orderBy(col("column"))),
    "text_boilerplate" -> ((s, dir) =>
      // the synthetic fixture has NO cross-doc repeated sentences, so
      // this report is legitimately empty here (oracle agrees on the
      // empty set + schema); TextStatsSpec plants real boilerplate
      // and pins the non-empty behavior
      TextStats.boilerplateSentences(t(s, dir, "documents"),
        minDocs = 3L, k = 20)),
    "text_langid_confusion" -> ((s, dir) =>
      // label × prediction confusion matrix over the n-gram langid —
      // the evaluation readout of the heuristic classifier
      TextStats.langId(t(s, dir, "documents"))
        .groupBy(col("lang_label"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang_label"), col("pred_lang"))),
    "events_attribution_position" -> ((s, dir) =>
      Events.positionAttribution(t(s, dir, "events"))
        .orderBy(col("channel"))),
    "text_readability" -> ((s, dir) =>
      TextStats.readability(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),
    "sample_coreset" -> ((s, dir) =>
      // k-center greedy diverse subset over the capped slice; the
      // Spark path is k·N scans, the oracle replays rounds over its
      // (oracle-scale) all-pairs distance table
      Similarity.farthestPointSample(
        t(s, dir, "embeddings").filter(col("vec_id") < 500), k = 8)
        .orderBy(col("rank"))),
    "q_did" -> ((s, dir) => {
      // difference-in-differences on the purchase "treatment": four
      // (treat × pre/post) cell means in truncated micro-units, DiD =
      // (m_tp − m_tr) − (m_cp − m_cr). Truncating per-cell means keep
      // the arithmetic int64-safe at ANY scale factor (the cleared-
      // denominator form overflows DECIMAL(38) near sf100). One
      // data-sized aggregation; the cut day is a 1-row broadcast.
      val ev = t(s, dir, "events").select(
        (col("event_type") === "purchase").as("treat"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      val cut = ev.agg((min(col("day")) + 15).as("cut"))
      val post = col("day") >= col("cut")
      val a = ev.crossJoin(cut).agg(
        count(when(col("treat") && post, 1)).as("n_tp"),
        sum(when(col("treat") && post, col("cents"))).as("s_tp"),
        count(when(col("treat") && !post, 1)).as("n_tr"),
        sum(when(col("treat") && !post, col("cents"))).as("s_tr"),
        count(when(!col("treat") && post, 1)).as("n_cp"),
        sum(when(!col("treat") && post, col("cents"))).as("s_cp"),
        count(when(!col("treat") && !post, 1)).as("n_cr"),
        sum(when(!col("treat") && !post, col("cents"))).as("s_cr"))
      a.select(col("n_tp"), col("n_tr"), col("n_cp"), col("n_cr"),
          expr("(1000000 * s_tp) div n_tp").as("m_tp"),
          expr("(1000000 * s_tr) div n_tr").as("m_tr"),
          expr("(1000000 * s_cp) div n_cp").as("m_cp"),
          expr("(1000000 * s_cr) div n_cr").as("m_cr"))
        .withColumn("did_micro",
          col("m_tp") - col("m_tr") - col("m_cp") + col("m_cr"))
    }),
    "sim_centroids" -> ((s, dir) => {
      // label centroids (exact truncated integer means per dimension)
      // and their pairwise cosines — the label-collision diagnostic
      // before contrastive training. All frames after the one explode
      // are (labels × dims)-sized.
      val d = (c: Column) => c.cast("decimal(38,0)")
      val e = t(s, dir, "embeddings").select(col("label"),
        posexplode(Similarity.quantize(col("embedding")))
          .as(Seq("j0", "x")))
        .select(col("label"), (col("j0") + 1).as("j"), col("x"))
      val cent = e.groupBy(col("label"), col("j"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .select(col("label"), col("j"), expr("sx div n").as("c"))
      val dots = cent.as("a").join(cent.as("b"),
          col("a.j") === col("b.j") && col("a.label") < col("b.label"))
        .groupBy(col("a.label").as("label_a"),
          col("b.label").as("label_b"))
        .agg(sum(d(col("a.c")) * col("b.c")).as("dot"))
      val nr = cent.groupBy(col("label"))
        .agg(sum(d(col("c")) * col("c")).as("nn"))
      dots
        .join(nr.select(col("label").as("label_a"), col("nn").as("na")),
          "label_a")
        .join(nr.select(col("label").as("label_b"), col("nn").as("nb")),
          "label_b")
        .select(col("label_a"), col("label_b"),
          (col("dot").cast("double") /
            sqrt(col("na").cast("double") * col("nb").cast("double")))
            .as("cosine"))
        .orderBy(col("label_a"), col("label_b"))
    }),
    "sim_rbm" -> ((s, dir) =>
      // mutual nearest neighbors over the capped slice — the scoped
      // exact ground truth (ANN top-1 both ways is the scale path)
      Similarity.mutualNearestNeighbors(
        t(s, dir, "embeddings").filter(col("vec_id") < 500))
        .orderBy(col("id_a"), col("id_b"))),
    "sim_gram" -> ((s, dir) =>
      // exact integer Gram matrix upper triangle, dimension-bounded
      // shuffle; string-rendered values stay exact at any scale
      Similarity.gramUpper(t(s, dir, "embeddings"))
        .orderBy(col("j"), col("k"))),
    "sim_pca_pc1" -> ((s, dir) =>
      // dominant principal direction by exact integer power iteration
      // (3 rounds, L∞ normalization); oracle replays identical rounds
      Similarity.powerIterationPC(t(s, dir, "embeddings"), rounds = 3)
        .orderBy(col("dim"))),
    "q_block_bootstrap" -> ((s, dir) => {
      // distributed standard-error estimate without resampling: 32
      // deterministic key blocks, per-block exact integer means
      // (micro-cents), then the variance of block means — the block
      // bootstrap / batch-means estimator. One data-sized hash
      // aggregation; the block rollup is 32 rows. Final variance and
      // se² are doubles OF EXACT RATIONALS (q_stats_agg discipline).
      val d = (c: Column) => c.cast("decimal(38,0)")
      val o = t(s, dir, "orders").select(
        (col("o_orderkey") % 32).as("blk"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val blocks = o.groupBy(col("blk"))
        .agg(count(lit(1)).as("n_b"), sum(col("cents")).as("s_b"))
        .withColumn("mbn", lit(1000000L) * d(col("s_b")))
        .withColumn("mb", expr("mbn div n_b"))
      blocks.agg(count(lit(1)).as("n_blocks"),
          sum(col("n_b")).as("n_rows"), sum(col("s_b")).as("s_cents"),
          sum(col("mb")).as("sm"), sum(d(col("mb")) * col("mb")).as("smm"))
        .withColumn("mean_num", lit(1000000L) * d(col("s_cents")))
        .withColumn("vnum",
          d(col("n_blocks")) * col("smm") - d(col("sm")) * col("sm"))
        .withColumn("vden",
          d(col("n_blocks")) * (col("n_blocks") - 1))
        .select(col("n_blocks"), col("n_rows"),
          expr("mean_num div n_rows").as("mean_micro"),
          (col("vnum").cast("double") / col("vden").cast("double"))
            .as("var_mb"),
          (col("vnum").cast("double") /
            (col("vden") * d(col("n_blocks"))).cast("double"))
            .as("se2_micro"))
    }),
    "q_cuped" -> ((s, dir) => {
      // CUPED variance reduction (Deng et al., WSDM 2013): per-user
      // pre-period spend (first 15 days) as the covariate for the
      // post-period outcome; θ = cov/var and the achievable variance
      // reduction ρ² from exact integer sufficient statistics. The
      // cut day derives from the data (min day + 15), attached as a
      // 1-row broadcast, so the operator is a pure function.
      val d = (c: Column) => c.cast("decimal(38,0)")
      val ev = t(s, dir, "events").select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        round(col("value") * 100).cast("long").as("cents"))
      val cut = ev.agg((min(col("day")) + 15).as("cut"))
      val ux = ev.crossJoin(cut) // 1-row broadcast
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") < col("cut"), col("cents"))
            .otherwise(0L)).as("x"),
          sum(when(col("day") >= col("cut"), col("cents"))
            .otherwise(0L)).as("y"))
      ux.agg(count(lit(1)).as("n_users"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(d(col("x")) * col("y")).as("sxy"),
          sum(d(col("x")) * col("x")).as("sxx"),
          sum(d(col("y")) * col("y")).as("syy"))
        .withColumn("num",
          d(col("n_users")) * col("sxy") - d(col("sx")) * col("sy"))
        .withColumn("denx",
          d(col("n_users")) * col("sxx") - d(col("sx")) * col("sx"))
        .withColumn("deny",
          d(col("n_users")) * col("syy") - d(col("sy")) * col("sy"))
        .select(col("n_users"), col("sx"), col("sy"),
          (col("num").cast("double") / col("denx").cast("double"))
            .as("theta"),
          (col("num").cast("double") * col("num").cast("double") /
            (col("denx").cast("double") * col("deny").cast("double")))
            .as("var_reduction"))
    }),
    "q_quantile_norm" -> ((s, dir) => {
      // align per-source n_chars distributions onto the pooled corpus
      // distribution by exact rank mapping — see QuantileNorm
      QuantileNorm.quantileNormalize(
        t(s, dir, "documents").select(col("doc_id").as("id"),
          col("source").as("group"), col("n_chars").as("v")))
        .select(col("id").as("doc_id"), col("group").as("source"),
          col("v").as("n_chars"), col("norm_v").as("norm_chars"))
        .orderBy(col("doc_id"))
    }),
    "dedup_snm_clusters" -> ((s, dir) => {
      // the blocking families all feed the same cluster collapse:
      // sorted-neighborhood pairs → bounded-lineage connected
      // components, the composition a recrawl dedup actually runs
      Dedup.clusters(Dedup.sortedNeighborhoodPairs(
          t(s, dir, "documents"), window = 5, minJaccardBp = 8000L))
        .orderBy(col("doc_id"))
    }),
    "dedup_sorted_neighborhood" -> ((s, dir) =>
      Dedup.sortedNeighborhoodPairs(t(s, dir, "documents"),
        window = 5, minJaccardBp = 8000L)
        .orderBy(col("id_a"), col("id_b"))),
    "text_novelty" -> ((s, dir) => {
      // per-document novelty against everything EARLIER in the corpus
      // (doc_id order): share of the doc's distinct word 3-grams whose
      // first corpus occurrence is this doc — the dataset-growth
      // freshness curve (novelty collapsing toward 0 says new data is
      // re-crawl). Gram-keyed min aggregation + one gram-keyed join
      // back; both shuffles key on the gram, never all-pairs.
      val g = t(s, dir, "documents")
        .select(col("doc_id"),
          explode(graft.functions.word_shingles(
            Dedup.tokens(col("text")), 3)).as("g"))
        .distinct()
      val first = g.groupBy(col("g")).agg(min(col("doc_id")).as("fd"))
      g.join(first, "g")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novelty_micro",
          expr("(1000000 * n_novel) div n_grams"))
        .orderBy(col("doc_id"))
    }),
    "events_mann_whitney" -> ((s, dir) =>
      // nonparametric click-vs-purchase value shift: exact doubled
      // U statistics from value-domain-grain counts (no global rank
      // window) — see Events.mannWhitneyU
      Events.mannWhitneyU(t(s, dir, "events"))),
    "events_life_table" -> ((s, dir) =>
      // Kaplan–Meier churn curve over per-user activity lifetimes;
      // survival recurrence as exact truncating-integer fold, the
      // oracle unrolls it with a recursive CTE
      Events.lifeTable(t(s, dir, "events"))),
    "events_kendall" -> ((s, dir) =>
      // concordant/discordant day-pair census between click and
      // purchase daily volumes — the τ-b sufficient statistics
      Events.kendallDaily(t(s, dir, "events"))),
    "events_theil_sen" -> ((s, dir) =>
      // robust daily-volume trend: median pairwise slope in exact
      // floor-division micro-units, doubled to dodge .5 fractions
      Events.theilSenDaily(t(s, dir, "events"))),
    "graph_link_pred" -> ((s, dir) =>
      // who-trades-alike link prediction: common-part counts +
      // neighborhood Jaccard for customer pairs, hub parts capped
      // before the wedge join (Graph.linkPrediction)
      Graph.linkPrediction(
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .join(t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_partkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("node"),
            col("l_partkey").as("via")),
        maxHubDeg = 40, k = 50)),
    "text_textrank" -> ((s, dir) => {
      // TextRank keywords (Mihalcea & Tarau 2004): unweighted
      // co-occurrence graph of adjacent content tokens (length ≥ 4,
      // pair seen ≥ 2 times, both directions), ranked with the
      // exact-integer pageRank machinery; the oracle unrolls the
      // identical 3 iterations over the same derived edge set. The
      // graph is vocabulary-bounded however large the corpus; the
      // bigram pass is one exploded projection + hash aggregation.
      val bg = t(s, dir, "documents")
        .select(explode(graft.functions.word_shingles(
          Dedup.tokens(col("text")), 2)).as("pair"))
        .select(substring_index(col("pair"), " ", 1).as("w1"),
          substring_index(col("pair"), " ", -1).as("w2"))
        .filter(length(col("w1")) >= 4 && length(col("w2")) >= 4 &&
          col("w1") =!= col("w2"))
      val e0 = bg.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
        .select(col("w1"), col("w2"))
      val e = e0.select(col("w1").as("src"), col("w2").as("dst"))
        .union(e0.select(col("w2").as("src"), col("w1").as("dst")))
        .distinct()
      Graph.pageRank(e, iters = 3)
        .orderBy(col("rank_micro").desc, col("node"))
        .limit(30)
        .select(col("node").as("token"), col("rank_micro"))
    }),
    "events_ks" -> ((s, dir) =>
      // Kolmogorov–Smirnov click-vs-purchase CDF gap at the
      // value-domain grain, DECIMAL cross-products (Events.ksTest)
      Events.ksTest(t(s, dir, "events"))),
    "events_gini" -> ((s, dir) =>
      // activity-inequality monitor: exact Gini over per-user volume
      // via the count-of-counts grain (Events.giniUserActivity)
      Events.giniUserActivity(t(s, dir, "events"))),
    "events_chi2_dow" -> ((s, dir) =>
      // type × weekday independence: per-cell χ² terms in exact
      // micro-units, arithmetic weekday (Events.chiSquareDow)
      Events.chiSquareDow(t(s, dir, "events"))),
    "events_holt" -> ((s, dir) =>
      // level+trend double exponential smoothing over the gapfilled
      // daily series, exact floor-division integer recurrence
      // (Events.holtDaily; oracle = recursive CTE)
      Events.holtDaily(t(s, dir, "events"))),
    "text_bpe_merges" -> ((s, dir) =>
      // BPE merge training on the word-frequency table — 3 learned
      // merges, vocabulary-bounded per round (TextStats.bpeMerges)
      TextStats.bpeMerges(t(s, dir, "documents"), rounds = 3)),
    "events_decompose" -> ((s, dir) =>
      // trend / weekday-seasonal / residual split of the daily
      // volume in exact milli-units (Events.decomposeDaily)
      Events.decomposeDaily(t(s, dir, "events"))),
    "events_changepoint" -> ((s, dir) =>
      // exact integer contrast argmax over prefix/suffix splits of
      // the gapfilled day sequence (Events.changepointDaily)
      Events.changepointDaily(t(s, dir, "events"))),
    "events_rfm" -> ((s, dir) =>
      // recency/frequency/monetary quintile census; boundaries from
      // count-of-counts distributions, no per-user global ranking
      // (Events.rfmSegments)
      Events.rfmSegments(t(s, dir, "events"))),
    "sample_kfold" -> ((s, dir) =>
      // deterministic 5-fold assignment (scrambled-hash bucket) with
      // the fold × source balance audit — cross-validation hygiene:
      // each fold should mirror the corpus mix
      t(s, dir, "documents")
        .select(Sampling.bucket(col("doc_id"), 5).as("fold"),
          col("source"), col("n_chars"))
        .groupBy(col("fold"), col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"))
        .orderBy(col("fold"), col("source"))),
    "events_funnel_latency" -> ((s, dir) =>
      // signup→purchase delay quartiles at the minute-domain grain —
      // exact order statistics, no user-ranked window
      // (Events.funnelLatency)
      Events.funnelLatency(t(s, dir, "events"))),
    "events_srm" -> ((s, dir) =>
      // 50/50 sample-ratio-mismatch gate: exact micro-χ² on user-id
      // parity arms + the 3.84-critical flag (Events.srmCheck)
      Events.srmCheck(t(s, dir, "events"))),
    "events_coverage" -> ((s, dir) =>
      // true engaged time per user: 5-minute presence windows merged
      // by gaps-and-islands interval union (Events.activityCoverage)
      Events.activityCoverage(t(s, dir, "events"))),
    "profile_corr_matrix" -> ((s, dir) =>
      // all-pairs Pearson over lineitem's numeric columns in ONE
      // aggregation pass — exact decimal sufficient statistics,
      // doubles only at the end (Profile.corrMatrix)
      Profile.corrMatrix(t(s, dir, "lineitem"),
        Seq("l_quantity" -> "qty", "l_extendedprice" -> "price",
          "l_discount" -> "disc", "l_tax" -> "tax"))),
    "sim_centroid_drift" -> ((s, dir) =>
      // per-label centroid cosine between vec-id-parity halves —
      // embedding stability monitor, sums-as-centroids exactness
      // (Similarity.centroidDrift)
      Similarity.centroidDrift(t(s, dir, "embeddings"))),
    "events_pattern_match" -> ((s, dir) =>
      // browse-to-buy sequence detection: regex v+cp over per-user
      // type-initial strings, MATCH_RECOGNIZE semantics without the
      // SQL surface (Events.patternMatch)
      Events.patternMatch(t(s, dir, "events"))),
    "events_forecast_eval" -> ((s, dir) =>
      // one-step Holt forecast vs naive persistence, exact summed
      // absolute errors — the smoother earns its keep or not
      // (Events.holtForecastEval)
      Events.holtForecastEval(t(s, dir, "events"))),
    "graph_modularity" -> ((s, dir) => {
      // are the LPA communities real: per-community Newman modularity
      // terms in exact floor-division micro-units over the same
      // bipartite graph graph_communities labels (Graph.modularity)
      val e1 = t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("src"),
          (col("l_suppkey") + 100000L).as("dst"))
        .distinct()
      val edges = e1.unionByName(
        e1.select(col("dst").as("src"), col("src").as("dst")))
      Graph.modularity(edges, Graph.labelPropagation(edges, iters = 2))
    }),
    "text_source_overlap" -> ((s, dir) => {
      // cross-source contamination matrix: 8-gram-set Jaccard between
      // every source pair — gram-keyed equi-join, never all-pairs of
      // documents; the source×source output is mix-bounded
      val g = t(s, dir, "documents")
        .select(col("source"), explode(graft.functions.word_shingles(
          Dedup.tokens(col("text")), 8)).as("g"))
        .distinct()
      val sz = g.groupBy(col("source")).agg(count(lit(1)).as("ng"))
      g.as("a").join(g.as("b"),
          col("a.g") === col("b.g") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("inter"))
        .join(sz.select(col("source").as("source_a"),
          col("ng").as("na")), "source_a")
        .join(sz.select(col("source").as("source_b"),
          col("ng").as("nb")), "source_b")
        .select(col("source_a"), col("source_b"), col("inter"),
          col("na"), col("nb"),
          expr("(10000 * inter) div (na + nb - inter)").as("jaccard_bp"))
        .orderBy(col("source_a"), col("source_b"))
    }),
    "events_burst_rate" -> ((s, dir) =>
      // peak trailing-60s event rate per user — RANGE-frame window,
      // tie-timestamp-safe (Events.burstRate)
      Events.burstRate(t(s, dir, "events"))),
    "profile_id_gaps" -> ((s, dir) =>
      // per-day event-id density audit: distinct ids vs id span —
      // in-range row loss a plain count never shows
      // (Profile.sequenceGaps)
      Profile.sequenceGaps(t(s, dir, "events"), "event_id",
        expr("unix_micros(ts) div 86400000000"))),
    "events_conversion_curve" -> ((s, dir) =>
      // conversion CDF at 1h/6h/24h/72h horizons in exact basis
      // points — one pass over the shared signup→purchase delay
      // frame (Events.conversionCurve)
      Events.conversionCurve(t(s, dir, "events"))),
    "events_decompose_strength" -> ((s, dir) =>
      // how much detrended variation the weekday pattern explains —
      // exact bp shares over the decomposition frame
      // (Events.decomposeStrength)
      Events.decomposeStrength(t(s, dir, "events"))),
    "events_kpi_daily" -> ((s, dir) =>
      // the dashboard mart in one pass: DAU, volume, error rate,
      // buyers, buyer share, revenue — a single day-keyed hash
      // aggregation (distincts expand in the same shuffle), exact
      // integer rates and 1e-4-unit revenue
      t(s, dir, "events")
        .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count_distinct(col("user_id")).as("dau"),
          count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L))
            .as("errors"),
          count_distinct(when(col("event_type") === "purchase",
            col("user_id"))).as("buyers"),
          coalesce(sum(when(col("event_type") === "purchase",
            round(col("value") * 10000).cast("long"))), lit(0L))
            .as("revenue_q"))
        .select(col("day"), col("dau"), col("n_events"),
          expr("(10000 * errors) div n_events").as("error_bp"),
          col("buyers"),
          expr("(10000 * buyers) div dau").as("buyer_share_bp"),
          col("revenue_q"))
        .orderBy(col("day"))),
    "events_cohort_ltv" -> ((s, dir) => {
      // cohort lifetime value: purchase revenue per signup-week
      // cohort by week offset, with the cumulative running sum —
      // the money twin of events_retention's count matrix; shuffles
      // key on user then (cohort, offset), the cumulative window is
      // calendar-bounded per cohort
      val wk = expr("unix_micros(ts) div 604800000000")
      val cohort = t(s, dir, "events").groupBy(col("user_id"))
        .agg(min(wk).as("cohort_week"))
      val rev = t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), wk.as("week"),
          round(col("value") * 10000).cast("long").as("q"))
      val grid = rev.join(cohort, "user_id")
        .groupBy(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .agg(sum(col("q")).as("revenue_q"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cohort_week")).orderBy(col("week_offset"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      grid.withColumn("cum_revenue_q", sum(col("revenue_q")).over(w))
        .orderBy(col("cohort_week"), col("week_offset"))
    }),
    "sample_split_by_user" -> ((s, dir) => {
      // entity-level split: every event follows its USER's scrambled
      // bucket, so no user's history straddles train/val/test — the
      // grouped-leakage guard sample_split applies at document grain,
      // here at the behavioral-data grain. Output is the split census
      // (events + distinct users per split)
      val b = Sampling.bucket(col("user_id"))
      t(s, dir, "events")
        .select(col("user_id"),
          when(b < 80, "train").when(b < 90, "val").otherwise("test")
            .as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"))
        .orderBy(col("split"))
    }),
    "profile_basket_size" -> ((s, dir) => {
      // order-size distribution at the count-of-counts grain: how
      // many orders carry k line items, with exact bp shares — the
      // fan-out profile behind join-cost estimates
      val sz = t(s, dir, "lineitem")
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_orders"))
      val wall = org.apache.spark.sql.expressions.Window
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .unboundedFollowing)
      sz.withColumn("total", sum(col("n_orders")).over(wall))
        .select(col("k").as("basket_size"), col("n_orders"),
          expr("(10000 * n_orders) div total").as("share_bp"))
        .orderBy(col("basket_size"))
    }),
    "text_length_quartiles" -> ((s, dir) => {
      // per-source document-length quartiles as exact order
      // statistics at the (source, length) grain — the corpus-mix
      // profile; windows partition by source, never global
      val cc = t(s, dir, "documents")
        .groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("m"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("n_chars"))
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, org.apache.spark.sql.expressions.Window
          .currentRow)
      val wall = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      cc.withColumn("cum", sum(col("m")).over(w))
        .withColumn("n", sum(col("m")).over(wall))
        .groupBy(col("source"))
        .agg(max(col("n")).as("n_docs"),
          min(when(col("cum") * 4 >= col("n"), col("n_chars")))
            .as("p25_chars"),
          min(when(col("cum") * 4 >= col("n") * 2, col("n_chars")))
            .as("p50_chars"),
          min(when(col("cum") * 4 >= col("n") * 3, col("n_chars")))
            .as("p75_chars"))
        .orderBy(col("source"))
    }),
    "events_new_returning" -> ((s, dir) => {
      // daily acquisition mix: users (and their events) split by
      // whether today is their first-seen day — the growth-health
      // readout behind events_cumulative_users
      val day = expr("unix_micros(ts) div 86400000000")
      val first = t(s, dir, "events").groupBy(col("user_id"))
        .agg(min(day).as("fd"))
      t(s, dir, "events")
        .select(col("user_id"), day.as("day"))
        .join(first, "user_id")
        .groupBy(col("day"))
        .agg(
          count_distinct(when(col("fd") === col("day"),
            col("user_id"))).as("new_users"),
          count_distinct(when(col("fd") < col("day"),
            col("user_id"))).as("returning_users"),
          sum(when(col("fd") === col("day"), 1L).otherwise(0L))
            .as("new_events"),
          sum(when(col("fd") < col("day"), 1L).otherwise(0L))
            .as("returning_events"))
        .orderBy(col("day"))
    }),
    "events_lorenz_deciles" -> ((s, dir) => {
      // full Lorenz concentration table: users ranked by activity
      // fold into ten equal-width rank deciles with exact bp event
      // shares — events_pareto's single 80%-point readout
      // generalized. Works at the count-of-counts grain (activity
      // levels × 10 rows), so no per-user global sort exists
      // anywhere in the plan: a level's nu users occupy the
      // contiguous rank span (cum_us-nu, cum_us] and are
      // interchangeable, so each decile takes its exact slice of the
      // span arithmetically. The global window below orders the
      // level histogram, not users — same bounded-grain shape as
      // events_pareto.
      val uc = t(s, dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("c"))
      val hist = uc.groupBy(col("c")).agg(count(lit(1)).as("nu"))
      val w = Window.orderBy(col("c").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = uc.agg(count(lit(1)).as("total_users"),
        sum(col("c")).as("total_events"))
      hist
        .withColumn("cum_us", sum(col("nu")).over(w))
        .crossJoin(tot) // 1-row broadcast
        .withColumn("d", explode(sequence(lit(0L), lit(9L))))
        // decile d owns rank positions (d*N) div 10 + 1 .. ((d+1)*N)
        // div 10; operands non-negative, idiv == floor
        .withColumn("lo_d",
          idiv(col("d") * col("total_users"), lit(10L)) + lit(1L))
        .withColumn("hi_d",
          idiv((col("d") + lit(1L)) * col("total_users"), lit(10L)))
        .withColumn("lo", col("cum_us") - col("nu") + lit(1L))
        .withColumn("take",
          least(col("hi_d"), col("cum_us")) -
            greatest(col("lo_d"), col("lo")) + lit(1L))
        .filter(col("take") > 0L)
        .groupBy(col("d"))
        .agg(sum(col("take")).as("n_users"),
          sum(col("take") * col("c")).as("n_events"),
          max(col("total_events")).as("te"))
        .select(col("d").as("decile"), col("n_users"),
          col("n_events"),
          idiv(lit(10000L) * col("n_events"), col("te"))
            .as("share_bp"))
        .orderBy(col("decile"))
    }),
    "events_interarrival" -> ((s, dir) => {
      // per-type inter-arrival quartiles: same-user gap to the
      // previous event (any type), attributed to the later event's
      // type — exact order statistics at the (type, gap_s) grain.
      // user-partitioned lag, then type-partitioned cumulative
      // windows; nothing global. Complements events_burst_rate's
      // peak-rate readout with the full gap distribution.
      val wu = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val g = t(s, dir, "events")
        .withColumn("prev", lag(col("ts"), 1).over(wu))
        .filter(col("prev").isNotNull)
        // gaps are non-negative by the window order: idiv == floor
        .select(col("event_type"),
          idiv(expr("unix_micros(ts) - unix_micros(prev)"),
            lit(1000000L)).as("gap_s"))
      val cc = g.groupBy(col("event_type"), col("gap_s"))
        .agg(count(lit(1)).as("m"))
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("gap_s"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.partitionBy(col("event_type"))
      cc.withColumn("cum", sum(col("m")).over(w))
        .withColumn("n", sum(col("m")).over(wall))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_gaps"),
          min(when(col("cum") * 4 >= col("n"), col("gap_s")))
            .as("p25_s"),
          min(when(col("cum") * 4 >= col("n") * 2, col("gap_s")))
            .as("p50_s"),
          min(when(col("cum") * 4 >= col("n") * 3, col("gap_s")))
            .as("p75_s"))
        .orderBy(col("event_type"))
    }),
  )

  /** DuckDB stopword-hit count via replace-length arithmetic — the
    * exact SQL twin of TextStats.occurrences (padded-word matching).
    */
  private def hitsSql(w: String): String =
    s"((length(p) - length(replace(p, ' $w ', ''))) // ${w.length + 2})"

  /** SQL twin of the sdbm doc-id hash (Query.java:303-316) as a
    * recursive CTE: `h = h*65599 + code(c)` in HUGEINT arithmetic mod
    * 2^64 (Java long wraparound), then the signed reinterpretation and
    * `~h+1` negation incl. the MIN_VALUE edge. Codepoints equal UTF-16
    * units for all BMP text (the only kind in the fixtures).
    * Emits CTEs `sdbm_src`/`sdbm_rec`/`sdbm` with (sid, hash).
    */
  /** `name` prefixes the emitted CTEs (`<name>_src`, `<name>_rec`,
    * `<name>`) so one query can instantiate the chain more than once
    * (the corpus_pipeline oracle hashes content, split key, and
    * manifest fingerprints in a single statement).
    */
  private def sdbmCte(fromSql: String, sidExpr: String, seedExpr: String,
      strExpr: String, name: String = "sdbm"): String = s"""
    ${name}_src AS (SELECT DISTINCT $sidExpr AS sid, CAST($seedExpr AS HUGEINT) AS h0,
                        $strExpr AS s FROM $fromSql),
    ${name}_rec AS (
      SELECT sid, h0 % 18446744073709551616 AS h, s, 1 AS i, length(s) AS n
      FROM ${name}_src
      UNION ALL
      SELECT sid, (h * 65599 + unicode(substr(s, i, 1))) % 18446744073709551616,
             s, i + 1, n
      FROM ${name}_rec WHERE i <= n),
    $name AS (
      SELECT sid, CAST(CASE WHEN hs > 0 THEN hs
                            WHEN hs = -9223372036854775808 THEN hs
                            ELSE -hs END AS BIGINT) AS hash
      FROM (SELECT sid,
              CASE WHEN h >= 9223372036854775808
                   THEN h - 18446744073709551616 ELSE h END AS hs
            FROM ${name}_rec WHERE i = n + 1))"""

  /** SQL twin of [[Sampling.bucket]]: MINSTD-scrambled sdbm hash mod
    * `n` (see the scramble rationale in Sampling's scaladoc).
    */
  private def bucketSql(h: String, n: Int = 100): String =
    s"((((($h % 2147483647) + 2147483647) % 2147483647) * 48271)" +
      s" % 2147483647) % $n"

  /** Shared CTE chain for the duplicated-span oracles — the SQL twin
    * of [[Dedup.duplicatedSpans]] (grams by STRING here; Spark keys
    * them by xxhash64, identical modulo a ~1e-8 collision). Yields
    * `spans(doc_id, span_start, span_end)`.
    */
  private def spanCteSqlOver(from: String): String = s"""
      p AS (SELECT doc_id, text,
              unnest(range(1, greatest(CAST(len(text) AS BIGINT) - 28, 1)))
                AS pos
            FROM $from),
      g AS (SELECT doc_id, pos, substr(text, CAST(pos AS INT), 30) AS gram
            FROM p),
      d AS (SELECT gram FROM g GROUP BY gram
            HAVING count(DISTINCT doc_id) > 1),
      hit AS (SELECT doc_id, pos FROM g JOIN d USING (gram)),
      brk AS (SELECT doc_id, pos,
              CASE WHEN pos > coalesce(max(pos + 29) OVER
                  (PARTITION BY doc_id ORDER BY pos
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  -1) + 1
              THEN 1 ELSE 0 END AS b FROM hit),
      isl AS (SELECT doc_id, pos, CAST(sum(b) OVER
                (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS gid
              FROM brk),
      spans AS (SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
                       CAST(max(pos) + 29 AS BIGINT) AS span_end
                FROM isl GROUP BY doc_id, gid)"""

  private val spanCteSql: String = spanCteSqlOver("documents")

  /** Sliding-window oracle, shared by the batch and streaming twins
    * (both produce the same result table by construction).
    */
  /** Shared twin for the batch + streaming native session_window
    * queries (>= gap boundary — [ts, ts+gap) window semantics). */
  private val sessionWindowSql: String = """
      WITH s AS (SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                        THEN 1 ELSE 0 END AS brk
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      t AS (SELECT user_id, ts,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM s)
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events
      FROM t GROUP BY user_id, sid ORDER BY user_id, session_start"""

  private val slidingSql: String = """
      SELECT time_bucket(INTERVAL 15 MINUTE, ts) - k.k * INTERVAL 15 MINUTE AS window_start,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
      GROUP BY 1 ORDER BY 1"""

  /** StAX-compatible XML text escaping in SQL (& first, then <, >). */
  private def escSql(e: String): String =
    s"replace(replace(replace($e, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"

  /** SQL twin of JsonlExport.escapeJson's primary escape set
    * (backslash first, then quote, \n, \r, \t — the fixture corpus
    * contains no other control characters, asserted in JsonlSpec).
    */
  private def jsonEscSql(e: String): String =
    """replace(replace(replace(replace(replace(%s,
      '\', '\\'), '"', '\"'), chr(10), '\n'), chr(13), '\r'),
      chr(9), '\t')""".format(e)

  /** Shared CTE prefix: integer-quantized embeddings + exact int norms
    * (the SQL twin of Similarity.quantize/qdot — see its scaladoc for
    * why quantization makes FP results engine-independent).
    */
  /** Shared CTE chain re-deriving [[Multimodal.aHash]] from the
    * generator's closed-form raster: 8×8 block floor-averages →
    * floor-mean threshold → bits packed via an exact HUGEINT
    * power-of-two table (bit 63 wraps two's-complement on the final
    * BIGINT cast, matching the JVM long). Callers must prefix
    * `WITH RECURSIVE` (the power table is the recursive member).
    */
  private val phashCteSql: String = """
      pw AS (SELECT 0 AS k, CAST(1 AS HUGEINT) AS v
             UNION ALL SELECT k + 1, v * 2 FROM pw WHERE k < 63),
      g AS (SELECT doc_id, CAST(16 + doc_id % 32 AS BIGINT) AS w,
                   CAST(16 + (doc_id * 7) % 24 AS BIGINT) AS h
            FROM documents),
      cellbox AS (SELECT doc_id, w, h, i, j,
                    (i * w) // 8 AS x0, ((i + 1) * w) // 8 AS x1,
                    (j * h) // 8 AS y0, ((j + 1) * h) // 8 AS y1
                  FROM g, UNNEST(range(8)) AS a(i),
                       UNNEST(range(8)) AS b(j)),
      blocksum AS (SELECT doc_id, i, j,
                     sum((doc_id + x + y) % 256) AS s, count(*) AS c
                   FROM cellbox, UNNEST(range(x0, x1)) AS xs(x),
                        UNNEST(range(y0, y1)) AS ys(y)
                   GROUP BY 1, 2, 3),
      cells AS (SELECT doc_id, i, j, s // c AS cv FROM blocksum),
      cmean AS (SELECT doc_id, sum(cv) // 64 AS mean
                FROM cells GROUP BY 1),
      hbits AS (SELECT c.doc_id, c.j * 8 + c.i AS k
                FROM cells c JOIN cmean m USING (doc_id)
                WHERE c.cv > m.mean),
      hraw AS (SELECT g.doc_id, g.w, g.h,
                 coalesce(sum(pw.v), CAST(0 AS HUGEINT)) AS hu
               FROM g LEFT JOIN hbits USING (doc_id)
               LEFT JOIN pw ON pw.k = hbits.k
               GROUP BY 1, 2, 3),
      ph AS (SELECT doc_id, CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               CAST(hu - CASE WHEN hu >= CAST(9223372036854775808 AS HUGEINT)
                     THEN CAST(18446744073709551616 AS HUGEINT)
                     ELSE CAST(0 AS HUGEINT) END AS BIGINT) AS ahash
             FROM hraw)"""

  private val qEmbSql: String = """
    q AS (SELECT vec_id, list_transform(embedding,
           x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS qv
          FROM embeddings),
    e AS (SELECT vec_id, i, qv[i] AS x
          FROM q, UNNEST(range(1, len(qv) + 1)) AS t(i)),
    n AS (SELECT vec_id, sum(x * x) AS norm FROM e GROUP BY vec_id)"""

  /** CTE chain ending in `exact(id_a, id_b)`: the scoped ground-truth
    * n-gram Jaccard pair set (the twin of [[groundTruthPairs]], same
    * text as the dedup_ngram_jaccard oracle).
    */
  private val gtPairsCteSql: String = """
    d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
    g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS g
          FROM d, UNNEST(range(1, length(text) - 1)) AS t(i)),
    p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
          FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
    ng AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id),
    exact AS (SELECT id_a, id_b
              FROM p JOIN ng na ON na.doc_id = id_a
                     JOIN ng nb ON nb.doc_id = id_b
              WHERE CAST(shared AS DOUBLE) / (na.ng + nb.ng - shared) >= 0.8)"""

  /** CTE chain (appended after [[qEmbSql]]) ending in
    * `exact(query_id, neighbor_id)`: brute-force quantized-cosine
    * top-5 for query vectors vec_id < 10 — the twin of the
    * `Similarity.topK(..., k = 5)` exact side of the ANN top-k gates.
    */
  private val exactTop5CteSql: String = """
    s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                 sum(a.x * b.x) AS dot
          FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10
               AND b.vec_id <> a.vec_id
          GROUP BY 1, 2),
    cs AS (SELECT query_id, neighbor_id,
                  CAST(dot AS DOUBLE) / sqrt(CAST(na.norm AS DOUBLE) * CAST(nb.norm AS DOUBLE)) AS cosine
           FROM s JOIN n na ON na.vec_id = query_id
                  JOIN n nb ON nb.vec_id = neighbor_id),
    exact AS (SELECT query_id, neighbor_id
              FROM (SELECT query_id, neighbor_id,
                           row_number() OVER (PARTITION BY query_id
                             ORDER BY cosine DESC, neighbor_id) AS rank
                    FROM cs) rk
              WHERE rank <= 5)"""

  /** Closing CTEs + SELECT for a recall-gate oracle: read the
    * materialized sketch keys from [[recallDumpDir]] (path substituted
    * for [[RecallDirToken]] by Verify), score them against the `exact`
    * CTE the caller prepends, and emit the same one-row
    * (n_exact, n_hit, recall_bp, meets_floor) frame as [[recallGate]]
    * — `//` truncates like Spark's DIV for non-negative counts.
    * `meets_floor` is the literal expected TRUE (not recomputed): the
    * independent cross-check lives in n_exact/n_hit/recall_bp, and
    * asserting the expectation makes a floor violation a visible
    * hash MISMATCH — were both sides to compute the boolean, a
    * recall regression would emit `false` twice and stay green.
    */
  private def recallTailSql(name: String, keys: String,
      floorBp: Int): String = {
    val bp = "CASE WHEN n_exact = 0 THEN CAST(10000 AS BIGINT) " +
      "ELSE (10000 * n_hit) // n_exact END"
    s"""
    approx AS (SELECT DISTINCT $keys
               FROM read_parquet('$RecallDirToken/$name/*.parquet')),
    cnt AS (SELECT count(*) AS n_exact FROM exact),
    hit AS (SELECT count(*) AS n_hit
            FROM exact ex JOIN approx ap USING ($keys))
    SELECT n_exact, n_hit, $bp AS recall_bp,
           TRUE AS meets_floor
    FROM cnt, hit"""
  }

  /** Shared doc-element body for the documents-table XML oracles. */
  private val docFieldsSql: String =
    s"""'<text>' || ${escSql("text")} || '</text>' ||
       '<source>' || ${escSql("source")} || '</source>' ||
       '<doc_id>' || CAST(doc_id AS VARCHAR) || '</doc_id>' ||
       '<n_chars>' || CAST(n_chars AS VARCHAR) || '</n_chars>' ||
       '</sphinx:document>'"""

  /** Oracle for TextStats.qualityFilter — shared verbatim by the
    * batch query and its stateless-streaming twin, which emit
    * identical rows by construction.
    */
  /** The quality-score CTE chain over `$from(doc_id, text)`, ending in
    * `r(doc_id, n_tokens, rep_ratio, quality, pred_lang, reason)` —
    * parameterized so the corpus_pipeline oracle can score REDACTED
    * text while the standalone query scores raw documents.
    */
  private def qualityCtesSql(from: String): String = s"""
      base AS (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p
                    FROM $from),
      sig AS (SELECT doc_id, null_text, n_tokens, rep_ratio, quality,
          CASE WHEN s_en + s_de + s_fr + s_es IS NULL
                 OR s_en + s_de + s_fr + s_es = 0 THEN 'unknown'
               WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
               WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
               WHEN s_fr >= s_es THEN 'fr'
               ELSE 'es' END AS pred_lang
        FROM (SELECT doc_id,
            (text IS NULL) AS null_text,
            CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE length(text) - length(replace(text, ' ', '')) + 1
                 END AS n_tokens,
            CASE WHEN length(text) < 10 THEN 0.0 ELSE
              1.0 - CAST((SELECT count(DISTINCT substr(text, CAST(i AS INT), 10))
                          FROM UNNEST(range(1, length(text) - 8)) AS t(i))
                    AS DOUBLE) / (length(text) - 9) END AS rep_ratio,
            (CAST(${Seq("the", "and", "of", "to").map(hitsSql).mkString(" + ")}
                AS DOUBLE) * 100.0 / CAST(nullif(length(text), 0) AS DOUBLE)
             - CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                AS DOUBLE) / CAST(nullif(length(text), 0) AS DOUBLE))
              AS quality,
            ${graft.operators.TextStats.LangProfiles.map { case (l, ws) =>
              ws.map(hitsSql).mkString(" + ") + s" AS s_$l"
            }.mkString(", ")}
          FROM base)),
      r AS (SELECT *,
          CASE WHEN null_text THEN 'null_text'
               WHEN n_tokens < 20 THEN 'too_few_tokens'
               WHEN n_tokens > 90 THEN 'too_many_tokens'
               WHEN pred_lang NOT IN ('en') THEN 'lang'
               WHEN rep_ratio > 0.04 THEN 'repetitive'
               WHEN quality < 0.5 THEN 'low_quality'
               ELSE 'ok' END AS reason
        FROM sig)"""

  private val qualityFilterSql: String = s"""
      WITH ${qualityCtesSql("documents")}
      SELECT doc_id, n_tokens, rep_ratio, quality, pred_lang,
             reason = 'ok' AS keep, reason
      FROM r ORDER BY doc_id"""

  /** Winnowing (Schleimer et al. 2003) as a DuckDB CTE chain, shared
    * by the fingerprint and pair oracles: words → alphabetical vocab
    * ranks → base-V Horner 3-gram ids → per 4-window min with
    * rightmost tie-break (row_number over g ASC, pos DESC — the
    * relational twin of the engine's min(struct(g, -pos)) frame).
    * Ends in `fp(doc_id, pos, gram)`.
    */
  private val winnowCteSql: String = """
      w0 AS (SELECT doc_id, u.i AS pos, ws[CAST(u.i AS INT)] AS word
             FROM (SELECT doc_id,
                     list_filter(string_split(lower(text), ' '),
                       x -> x <> '') AS ws
                   FROM documents) d,
                  UNNEST(range(1, len(ws) + 1)) AS u(i)),
      vocab AS (SELECT word, dense_rank() OVER (ORDER BY word) AS r
                FROM (SELECT DISTINCT word FROM w0)),
      vt AS (SELECT count(*) + 1 AS v FROM vocab),
      rk AS (SELECT w0.doc_id, w0.pos, vocab.r
             FROM w0 JOIN vocab USING (word)),
      gr AS (SELECT doc_id, pos,
               (r * v + lead(r, 1) OVER w) * v + lead(r, 2) OVER w AS g
             FROM rk, vt
             WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      g2 AS (SELECT doc_id, pos, g FROM gr WHERE g IS NOT NULL),
      pm AS (SELECT doc_id, max(pos) AS p FROM g2 GROUP BY 1),
      anc AS (SELECT g2.doc_id, g2.pos AS j
              FROM g2 JOIN pm USING (doc_id)
              WHERE g2.pos <= greatest(pm.p - 3, 1)),
      cand AS (SELECT a.doc_id, a.j, b.pos, b.g,
                 row_number() OVER (PARTITION BY a.doc_id, a.j
                                    ORDER BY b.g ASC, b.pos DESC) AS rn
               FROM anc a JOIN g2 b ON b.doc_id = a.doc_id
                                   AND b.pos BETWEEN a.j AND a.j + 3),
      fp AS (SELECT DISTINCT doc_id, pos, g AS gram FROM cand WHERE rn = 1)"""

  /** events_holt's DuckDB twin: the identical floor-division Holt
    * recurrence unrolled as a recursive CTE. The level/trend update
    * strings are composed here exactly as Events.holtDaily composes
    * its lambda (neither SQL dialect has let-bindings, so the level
    * expression is inlined into the trend update on both sides).
    */
  private def holtRecCteSql: String = {
    val lRaw = "2 * f.y * 1000000 + 8 * (rec.l + rec.b)"
    val lNew = s"(($lRaw) - ((($lRaw) % 10) + 10) % 10) // 10"
    val bRaw = s"($lNew) - rec.l + 9 * rec.b"
    val bNew = s"(($bRaw) - ((($bRaw) % 10) + 10) % 10) // 10"
    s"""
      WITH RECURSIVE d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                   count(*) AS y FROM events GROUP BY 1),
      spine AS (SELECT unnest(range((SELECT min(day) FROM d),
                  (SELECT max(day) FROM d) + 1)) AS day),
      f AS (SELECT spine.day, CAST(coalesce(d.y, 0) AS BIGINT) AS y,
              row_number() OVER (ORDER BY spine.day) AS rn
            FROM spine LEFT JOIN d USING (day)),
      rec AS (SELECT rn, day, y, y * 1000000 AS l,
                CAST(0 AS BIGINT) AS b
              FROM f WHERE rn = 1
              UNION ALL
              SELECT f.rn, f.day, f.y, $lNew, $bNew
              FROM f JOIN rec ON f.rn = rec.rn + 1)"""
  }

  private def holtOracleSql: String = s"""
      $holtRecCteSql
      SELECT day, y, l AS level_micro, b AS trend_micro
      FROM rec ORDER BY day"""

  /** text_bpe_merges' DuckDB twin: three merge rounds unrolled as
    * CTE pairs (pair-count → argmax → rewrite), each mirroring one
    * iteration of TextStats.bpeMerges' loop.
    */
  private def bpeOracleSql: String = s"""
      WITH wf AS (SELECT w, count(*) AS cnt FROM (
             SELECT unnest(list_filter(
               string_split_regex(lower(text), '\\s+'), x -> x <> ''))
               AS w
             FROM documents) GROUP BY w),
      s0 AS (SELECT concat(' ',
               regexp_replace(w, '(.)', '\\1 ', 'g'), '_ ') AS seq,
               cnt FROM wf),
      ${(1 to 3).map { r => s"""
      p$r AS (SELECT pr, CAST(sum(cnt) AS BIGINT) AS n FROM (
          SELECT sym[CAST(i AS INT)] || ' ' ||
                 sym[CAST(i AS INT) + 1] AS pr, cnt
          FROM (SELECT list_filter(string_split_regex(seq, '\\s+'),
                  x -> x <> '') AS sym, cnt FROM s${r - 1}),
               unnest(range(1, len(sym))) AS t(i)) GROUP BY pr),
      b$r AS (SELECT pr, n FROM p$r ORDER BY n DESC, pr LIMIT 1),
      s$r AS (SELECT replace(seq, ' ' || pr || ' ',
                ' ' || replace(pr, ' ', '') || ' ') AS seq, cnt
              FROM s${r - 1}, b$r)"""
      }.mkString(",")}
      SELECT CAST(1 AS BIGINT) AS round, pr AS pair, n AS pair_cnt
      FROM b1
      UNION ALL SELECT CAST(2 AS BIGINT), pr, n FROM b2
      UNION ALL SELECT CAST(3 AS BIGINT), pr, n FROM b3
      ORDER BY round"""

  /** Shared CTE chain for the decomposition oracles: gapfilled day
    * spine → centered 7-day MA trend (`tt`) → weekday seasonal means
    * (`ss`) — the twin of Events.decomposeDaily, reused by
    * events_decompose and events_decompose_strength.
    */
  private def decomposeCteSql: String = """
      WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                   count(*) AS y FROM events GROUP BY 1),
      spine AS (SELECT unnest(range((SELECT min(day) FROM d),
                  (SELECT max(day) FROM d) + 1)) AS day),
      f AS (SELECT spine.day, CAST(coalesce(d.y, 0) AS BIGINT) AS y
            FROM spine LEFT JOIN d USING (day)),
      t0 AS (SELECT day, y, CAST(sum(y) OVER w7 AS BIGINT) AS s7,
               count(*) OVER w7 AS nw
             FROM f WINDOW w7 AS (ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
      tt AS (SELECT day, y, (1000 * s7) // 7 AS trend_milli,
               1000 * y - (1000 * s7) // 7 AS detr_milli
             FROM t0 WHERE nw = 7),
      seas AS (SELECT day % 7 AS dw,
                 CAST(sum(detr_milli) AS BIGINT) AS sd,
                 CAST(count(*) AS BIGINT) AS m
               FROM tt GROUP BY 1),
      ss AS (SELECT dw, (sd - ((sd % m) + m) % m) // m
               AS seasonal_milli FROM seas)"""

  /** One RFM quintile-boundary CTE (SQL twin of the count-of-counts
    * `bounds` frame inside Events.rfmSegments).
    */
  private def rfmBounds(name: String, dim: String): String = s"""
      $name AS (SELECT ${(1 to 4).map(k =>
        s"min(CASE WHEN cum * 5 >= n * $k THEN v END) AS ${dim}_b$k")
        .mkString(", ")}
        FROM (SELECT v, sum(m) OVER (ORDER BY v) AS cum,
                sum(m) OVER () AS n
              FROM (SELECT $dim AS v, count(*) AS m FROM ur
                    GROUP BY 1)))"""

  /** events_rfm's DuckDB twin — per-dimension boundary CTEs + the
    * 1 + #boundaries-below score, mirroring Events.rfmSegments.
    */
  private def rfmOracleSql: String = {
    def score(dim: String) = s"CAST(1 ${(1 to 4).map(k =>
      s"+ (CASE WHEN $dim > ${dim}_b$k THEN 1 ELSE 0 END)")
      .mkString(" ")} AS BIGINT)"
    s"""
      WITH u AS (SELECT user_id,
                   max(epoch_us(ts) // 86400000000) AS last_day,
                   count(*) AS f,
                   CAST(sum(CAST(round(value * 10000) AS BIGINT))
                     AS BIGINT) AS mq
                 FROM events GROUP BY 1),
      mx AS (SELECT max(epoch_us(ts) // 86400000000) AS dmax
             FROM events),
      ur AS (SELECT user_id, dmax - last_day AS r,
               CAST(f AS BIGINT) AS f, mq
             FROM u, mx),
      ${rfmBounds("rb", "r")},
      ${rfmBounds("fb", "f")},
      ${rfmBounds("mb", "mq")},
      scored AS (SELECT ${score("r")} AS r_q, ${score("f")} AS f_q,
               ${score("mq")} AS m_q
             FROM ur, rb, fb, mb)
      SELECT r_q, f_q, m_q, count(*) AS n_users
      FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""
  }

  /** Shared CTE chain for the LPA-family oracles: the customer↔
    * supplier bipartite graph (e0/e2/nodes) + two synchronous
    * min-label-tie label-propagation rounds ending in `l2(node,
    * label)` — the twin of graph_communities' Spark side, reused by
    * graph_modularity.
    */
  private def lpaCteSql: String = s"""
      WITH e0 AS (SELECT DISTINCT o_custkey AS src,
                    100000 + l_suppkey AS dst
                  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      e2 AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      nodes AS (SELECT DISTINCT src AS node FROM e2),
      l0 AS (SELECT node, node AS label FROM nodes),
      ${Seq(("l0", "l1"), ("l1", "l2")).map { case (prev, nxt) => s"""
      $nxt AS (SELECT n.node, coalesce(w.new_label, p.label) AS label
        FROM nodes n JOIN $prev p ON p.node = n.node
        LEFT JOIN (SELECT node, label AS new_label FROM (
            SELECT v.node, v.label,
                   row_number() OVER (PARTITION BY v.node
                     ORDER BY v.n DESC, v.label) AS rk
            FROM (SELECT e2.dst AS node, r.label, count(*) AS n
                  FROM e2 JOIN $prev r ON r.node = e2.src
                  GROUP BY e2.dst, r.label) v) rkq
          WHERE rk = 1) w ON w.node = n.node)"""
      }.mkString(",")}"""

  /** profile_corr_matrix's DuckDB twin: the same single sufficient-
    * statistics pass (HUGEINT exact) + one UNION ALL row per pair.
    */
  private def corrMatrixOracleSql: String = {
    val cols = Seq("l_quantity" -> "qty", "l_extendedprice" -> "price",
      "l_discount" -> "disc", "l_tax" -> "tax")
    val names = cols.map(_._2)
    val pairs = for {
      i <- names.indices; j <- (i + 1) until names.size
    } yield (names(i), names(j))
    val quant = cols.map { case (c, a) =>
      s"CAST(round($c * 100) AS BIGINT) AS $a" }.mkString(", ")
    val sums = (Seq("count(*) AS n") ++
      names.map(a => s"sum(CAST($a AS HUGEINT)) AS s_$a") ++
      names.map(a => s"sum(CAST($a AS HUGEINT) * $a) AS ss_$a") ++
      pairs.map { case (a, b) =>
        s"sum(CAST($a AS HUGEINT) * $b) AS sp_${a}_$b" }).mkString(", ")
    val rows = pairs.map { case (a, b) =>
      val num = s"(n * sp_${a}_$b - s_$a * s_$b)"
      val den = s"(n * ss_$a - s_$a * s_$a)"
      val deny = s"(n * ss_$b - s_$b * s_$b)"
      s"""SELECT '$a' AS col_a, '$b' AS col_b, CAST(n AS BIGINT) AS n,
        CAST($num AS DOUBLE) / CAST($den AS DOUBLE) AS slope,
        CAST($num AS DOUBLE) * CAST($num AS DOUBLE) /
          (CAST($den AS DOUBLE) * CAST($deny AS DOUBLE)) AS r2
      FROM w"""
    }.mkString(" UNION ALL ")
    s"""
      WITH b AS (SELECT $quant FROM lineitem),
      w AS (SELECT $sums FROM b)
      $rows ORDER BY col_a, col_b"""
  }

  def oracleSql: Map[String, String] = Map(
    "xml_documents" -> s"""
      SELECT doc_id AS id,
             chr(10) || '<sphinx:document id="' || CAST(doc_id AS VARCHAR) || '">' ||
             $docFieldsSql AS doc
      FROM documents ORDER BY id""",
    "xml_documents_composite" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "doc_id", "source")}
      SELECT s.hash AS id,
             chr(10) || '<sphinx:document id="' || CAST(s.hash AS VARCHAR) || '">' ||
             $docFieldsSql AS doc
      FROM documents JOIN sdbm s ON s.sid = doc_id
      ORDER BY id, doc""",
    "xml_lineitem" -> s"""
      WITH RECURSIVE ${sdbmCte("lineitem",
        "l_orderkey * 10 + l_linenumber", "l_orderkey",
        "CAST(l_linenumber AS VARCHAR)")}
      SELECT s.hash AS id,
             chr(10) || '<sphinx:document id="' || CAST(s.hash AS VARCHAR) || '">' ||
             '<l_orderkey>' || CAST(l_orderkey AS VARCHAR) || '</l_orderkey>' ||
             '<l_partkey>' || CAST(l_partkey AS VARCHAR) || '</l_partkey>' ||
             '<l_suppkey>' || CAST(l_suppkey AS VARCHAR) || '</l_suppkey>' ||
             '<l_linenumber>' || CAST(l_linenumber AS VARCHAR) || '</l_linenumber>' ||
             '<l_quantity>' || CAST(l_quantity AS VARCHAR) || '</l_quantity>' ||
             '<l_extendedprice>' || CAST(l_extendedprice AS VARCHAR) || '</l_extendedprice>' ||
             '<l_discount>' || CAST(l_discount AS VARCHAR) || '</l_discount>' ||
             '<l_tax>' || CAST(l_tax AS VARCHAR) || '</l_tax>' ||
             '<l_returnflag>' || l_returnflag || '</l_returnflag>' ||
             '<l_linestatus>' || l_linestatus || '</l_linestatus>' ||
             '<l_shipdate>' || strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') || '</l_shipdate>' ||
             '</sphinx:document>' AS doc
      FROM lineitem JOIN sdbm s ON s.sid = l_orderkey * 10 + l_linenumber
      ORDER BY id, doc""",
    "xml_events" -> s"""
      SELECT event_id AS id,
             chr(10) || '<sphinx:document id="' || CAST(event_id AS VARCHAR) || '">' ||
             '<event_id>' || CAST(event_id AS VARCHAR) || '</event_id>' ||
             '<props>' || ${escSql("props")} || '</props>' ||
             '<ts>' || strftime(ts, '%Y-%m-%d %H:%M:%S') || '</ts>' ||
             '</sphinx:document>' AS doc
      FROM events ORDER BY id""",
    "xml_events_stream" -> s"""
      SELECT event_id AS id,
             chr(10) || '<sphinx:document id="' || CAST(event_id AS VARCHAR) || '">' ||
             '<event_id>' || CAST(event_id AS VARCHAR) || '</event_id>' ||
             '<props>' || ${escSql("props")} || '</props>' ||
             '<ts>' || strftime(ts, '%Y-%m-%d %H:%M:%S') || '</ts>' ||
             '</sphinx:document>' AS doc
      FROM events ORDER BY id""",
    "docid_composite" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "doc_id", "source")}
      SELECT doc_id, s.hash AS id
      FROM documents JOIN sdbm s ON s.sid = doc_id
      ORDER BY doc_id""",
    "docid_strict" -> """
      SELECT doc_id,
             ((doc_id * 4294967296 + doc_id - 250 + 2147483648) % 4294967296
               + 4294967296) % 4294967296 - 2147483648 AS id
      FROM documents ORDER BY doc_id""",
    "render_strict" -> """
      SELECT event_id,
             strftime(ts, '%a %b %d %H:%M:%S UTC %Y') AS r_ts,
             'java.nio.HeapByteBuffer[pos=0 lim=' ||
               CAST(octet_length(encode(coalesce(props, ''))) AS VARCHAR) ||
               ' cap=' ||
               CAST(octet_length(encode(coalesce(props, ''))) AS VARCHAR) ||
               ']' AS r_blob,
             CAST(((user_id + 3000000000 + 2147483648) % 4294967296
               + 4294967296) % 4294967296 - 2147483648 AS VARCHAR) AS r_counter
      FROM events ORDER BY event_id""",
    "text_fingerprint" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0",
        "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")}
      SELECT doc_id, s.hash AS fp
      FROM documents JOIN sdbm s ON s.sid = doc_id
      ORDER BY doc_id""",
    "dedup_exact" -> """
      SELECT min(doc_id) AS keep_id, count(*) AS dup_count, text
      FROM documents GROUP BY text ORDER BY keep_id""",
    "dedup_edit_distance" -> """
      WITH aug AS (SELECT doc_id, text FROM documents
                   UNION ALL
                   SELECT doc_id + 20000, text || ' x' FROM documents
                   WHERE doc_id < 20),
      b AS (SELECT doc_id, text, substr(lower(text), 1, 12) AS blk,
                   len(text) AS ln FROM aug)
      SELECT a.doc_id AS id_a, c.doc_id AS id_b,
             CAST(levenshtein(a.text, c.text) AS BIGINT) AS edits
      FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
        AND abs(a.ln - c.ln) <= 4
      WHERE levenshtein(a.text, c.text) <= 4
      ORDER BY id_a, id_b""",
    "dedup_spans" -> s"""
      WITH $spanCteSql
      SELECT doc_id, span_start, span_end FROM spans
      ORDER BY doc_id, span_start""",
    "dedup_span_stats" -> s"""
      WITH $spanCteSql,
      agg AS (SELECT doc_id, count(*) AS n_spans,
                     sum(span_end - span_start + 1) AS dup_chars
              FROM spans GROUP BY doc_id)
      SELECT d.doc_id, CAST(len(d.text) AS BIGINT) AS n_chars,
             CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
             CAST(coalesce(a.dup_chars, 0) AS BIGINT) AS dup_chars,
             CASE WHEN len(d.text) = 0 THEN 0.0
                  ELSE CAST(coalesce(a.dup_chars, 0) AS DOUBLE) /
                       CAST(len(d.text) AS DOUBLE) END AS dup_ratio
      FROM documents d LEFT JOIN agg a USING (doc_id)
      ORDER BY doc_id""",
    "dedup_span_scrubbed" -> s"""
      WITH $spanCteSql,
      keep AS (
        SELECT doc_id, s, e FROM (
          SELECT doc_id,
                 coalesce(lag(span_end) OVER
                   (PARTITION BY doc_id ORDER BY span_start), 0) + 1 AS s,
                 span_start - 1 AS e
          FROM spans) WHERE s <= e
        UNION ALL
        SELECT sp.doc_id, sp.mx + 1 AS s, CAST(len(d.text) AS BIGINT) AS e
        FROM (SELECT doc_id, max(span_end) AS mx FROM spans
              GROUP BY doc_id) sp
        JOIN documents d USING (doc_id) WHERE sp.mx + 1 <= len(d.text)),
      aff AS (SELECT DISTINCT doc_id FROM spans),
      scrub AS (SELECT a.doc_id,
                  coalesce(string_agg(
                    substr(d.text, CAST(k.s AS INT),
                           CAST(k.e - k.s + 1 AS INT)),
                    '' ORDER BY k.s), '') AS clean_text
                FROM aff a JOIN documents d USING (doc_id)
                LEFT JOIN keep k ON k.doc_id = a.doc_id
                GROUP BY a.doc_id)
      SELECT s.doc_id, s.clean_text,
             CAST(len(d.text) - len(s.clean_text) AS BIGINT) AS n_removed
      FROM scrub s JOIN documents d USING (doc_id)
      ORDER BY s.doc_id""",
    "text_repetition" -> """
      SELECT doc_id,
             CASE WHEN length(text) < 10 THEN 0
                  ELSE length(text) - 9 END AS n_grams,
             CASE WHEN length(text) < 10 THEN 0 ELSE
               (SELECT count(DISTINCT substr(text, CAST(i AS INT), 10))
                FROM UNNEST(range(1, length(text) - 8)) AS t(i)) END
               AS n_distinct,
             CASE WHEN length(text) < 10 THEN 0.0 ELSE
               1.0 - CAST((SELECT count(DISTINCT substr(text, CAST(i AS INT), 10))
                           FROM UNNEST(range(1, length(text) - 8)) AS t(i))
                     AS DOUBLE) / (length(text) - 9) END AS rep_ratio
      FROM documents ORDER BY doc_id""",
    "decontam_flagged" -> """
      WITH g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 30) AS g
                 FROM documents, UNNEST(range(1, length(text) - 28)) AS t(i)),
      hits AS (SELECT c.doc_id, count(DISTINCT c.g) AS shared_ngrams
               FROM (SELECT * FROM g WHERE doc_id >= 400) c
               JOIN (SELECT DISTINCT g FROM g WHERE doc_id < 400) b
                 ON c.g = b.g
               GROUP BY c.doc_id)
      SELECT doc_id, shared_ngrams FROM hits
      WHERE shared_ngrams >= 1 ORDER BY doc_id""",
    "decontam_clean" -> """
      WITH g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 30) AS g
                 FROM documents, UNNEST(range(1, length(text) - 28)) AS t(i)),
      bad AS (SELECT DISTINCT c.doc_id
              FROM (SELECT * FROM g WHERE doc_id >= 400) c
              JOIN (SELECT DISTINCT g FROM g WHERE doc_id < 400) b
                ON c.g = b.g)
      SELECT doc_id FROM documents
      WHERE doc_id >= 400 AND doc_id NOT IN (SELECT doc_id FROM bad)
      ORDER BY doc_id""",
    "sample_fixed_k" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0",
        "CAST(doc_id AS VARCHAR)")},
      r AS (SELECT d.doc_id, d.source, d.text,
              ((((s.hash % 2147483647) + 2147483647) % 2147483647)
                * 48271) % 2147483647 AS rk
            FROM documents d JOIN sdbm s ON s.sid = d.doc_id)
      SELECT doc_id, source, text FROM (
        SELECT doc_id, source, text FROM r
        ORDER BY rk, doc_id LIMIT 50)
      ORDER BY doc_id""",
    "sample_weighted_priority" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0",
        "CAST(doc_id AS VARCHAR)")},
      r AS (SELECT d.doc_id, d.n_chars,
              (((((s.hash % 2147483647) + 2147483647) % 2147483647)
                * 48271) % 2147483647) + 1 AS u
            FROM documents d JOIN sdbm s ON s.sid = d.doc_id)
      SELECT doc_id, n_chars, prio_unit, prio_frac FROM (
        SELECT doc_id, n_chars,
               (n_chars * 1000000) // u AS prio_unit,
               (((n_chars * 1000000) % u) * 1000000) // u AS prio_frac
        FROM r ORDER BY prio_unit DESC, prio_frac DESC, doc_id LIMIT 50)
      ORDER BY doc_id""",
    "tpch_q4" -> """
      SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1997-04-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "tpch_q6" -> """
      SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24""",
    "tpch_q15" -> """
      WITH rev AS (
        SELECT l_suppkey,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_rev_tc
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-10-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_rev_tc
      FROM rev JOIN supplier ON l_suppkey = s_suppkey
      WHERE total_rev_tc = (SELECT max(total_rev_tc) FROM rev)
      ORDER BY s_suppkey""",
    "tpch_q16" -> """
      SELECT p_brand, p_type, p_size,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      FROM part JOIN lineitem ON p_partkey = l_partkey
      WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'PROMO%'
        AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "tpch_q19" -> """
      SELECT CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#9' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)""",
    "tpch_q13" -> """
      SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey) t
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC""",
    "tpch_q22" -> """
      WITH c AS (SELECT c_custkey, c_nationkey,
                        CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
                 FROM customer),
      p AS (SELECT CAST(sum(bal_c) AS BIGINT) AS tot_c,
                   count(*) AS n_pos FROM c WHERE bal_c > 0)
      SELECT c_nationkey AS cntry, CAST(count(*) AS BIGINT) AS numcust,
             CAST(sum(bal_c) AS BIGINT) AS totbal_c
      FROM c, p
      WHERE bal_c > 0 AND bal_c * n_pos > tot_c
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
      GROUP BY 1 ORDER BY cntry""",
    "dedup_keep_latest" -> """
      SELECT user_id, ts, event_id, event_type FROM (
        SELECT user_id, ts, event_id, event_type,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1
      ORDER BY user_id""",
    "q_snapshot_diff" -> """
      WITH o AS (SELECT doc_id, source, n_chars FROM documents
                 WHERE doc_id % 10 <> 3),
      n AS (SELECT doc_id, source,
              CASE WHEN doc_id % 5 = 0 THEN n_chars + 1 ELSE n_chars END
                AS n_chars
            FROM documents WHERE doc_id % 10 <> 7),
      j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
              CASE WHEN o.doc_id IS NULL THEN 'A'
                   WHEN n.doc_id IS NULL THEN 'R'
                   WHEN o.source IS DISTINCT FROM n.source
                     OR o.n_chars IS DISTINCT FROM n.n_chars THEN 'C'
              END AS op,
              o.source AS old_source, n.source AS new_source,
              o.n_chars AS old_n_chars, n.n_chars AS new_n_chars
            FROM o FULL JOIN n ON o.doc_id = n.doc_id)
      SELECT * FROM j WHERE op IS NOT NULL ORDER BY doc_id""",
    "sample_fixed_k_stratified" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0",
        "CAST(doc_id AS VARCHAR)")},
      r AS (SELECT d.doc_id, d.source, d.text,
              ((((s.hash % 2147483647) + 2147483647) % 2147483647)
                * 48271) % 2147483647 AS rk
            FROM documents d JOIN sdbm s ON s.sid = d.doc_id)
      SELECT doc_id, source, text FROM (
        SELECT doc_id, source, text,
               row_number() OVER (PARTITION BY source
                                  ORDER BY rk, doc_id) AS rn
        FROM r) WHERE rn <= 10
      ORDER BY doc_id""",
    "sample_split" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0",
        "CAST(doc_id AS VARCHAR)")}
      SELECT d.doc_id,
             CASE WHEN ${bucketSql("s.hash")} < 80 THEN 'train'
                  WHEN ${bucketSql("s.hash")} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents d JOIN sdbm s ON s.sid = d.doc_id
      ORDER BY d.doc_id""",
    // the dedup_clusters CTE chain (identical text) + the sample_split
    // hash CTE over the cluster root instead of the doc id
    "sample_split_leakage_free" -> s"""
      WITH RECURSIVE
      d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
      g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS gr
            FROM d, UNNEST(range(1, length(text) - 1)) AS t(i)),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id),
      pairs AS (SELECT id_a, id_b
                FROM p JOIN n na ON na.doc_id = id_a
                       JOIN n nb ON nb.doc_id = id_b
                WHERE CAST(shared AS DOUBLE) / (na.ng + nb.ng - shared) >= 0.8),
      e AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT a AS node, a AS r FROM e
        UNION
        SELECT e.b AS node, reach.r FROM reach JOIN e ON e.a = reach.node),
      cl AS (SELECT node AS doc_id, min(r) AS cluster_id
             FROM reach GROUP BY node),
      keyed AS (SELECT d.doc_id,
                  coalesce(cl.cluster_id, d.doc_id) AS split_key
                FROM d LEFT JOIN cl ON cl.doc_id = d.doc_id),
      ${sdbmCte("keyed", "split_key", "0", "CAST(split_key AS VARCHAR)")}
      SELECT k.doc_id, k.split_key,
             CASE WHEN ${bucketSql("s.hash")} < 80 THEN 'train'
                  WHEN ${bucketSql("s.hash")} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM keyed k JOIN sdbm s ON s.sid = k.split_key
      ORDER BY k.doc_id""",
    "sample_mixture" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0",
        "CAST(doc_id AS VARCHAR)")}
      SELECT d.doc_id, d.source
      FROM documents d JOIN sdbm s ON s.sid = d.doc_id
      WHERE CAST(${bucketSql("s.hash")} AS DOUBLE) <
            CASE d.source WHEN 'src0' THEN 25.0 WHEN 'src1' THEN 50.0
                 WHEN 'src2' THEN 0.0 ELSE 75.0 END
      ORDER BY d.doc_id""",
    "sample_mixture_upsampled" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0",
        "CAST(doc_id AS VARCHAR)")},
      wd AS (SELECT d.doc_id, d.source,
               CASE d.source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.5
                    ELSE 1.0 END AS w,
               ${bucketSql("s.hash")} AS bk
             FROM documents d JOIN sdbm s ON s.sid = d.doc_id),
      c AS (SELECT doc_id, source,
              CAST(floor(w) AS BIGINT) +
                CASE WHEN CAST(bk AS DOUBLE) < (w - floor(w)) * 100
                     THEN 1 ELSE 0 END AS copies
            FROM wd)
      SELECT doc_id, source, CAST(i AS BIGINT) AS copy
      FROM c, UNNEST(range(1, copies + 1)) AS t(i)
      ORDER BY doc_id, copy""",
    "sample_token_budget" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0",
        "CAST(doc_id AS VARCHAR)")},
      tok AS (SELECT doc_id, source,
                CASE WHEN length(trim(text)) = 0 THEN 0
                     ELSE length(text) - length(replace(text, ' ', '')) + 1
                END AS n_tokens
              FROM documents),
      b AS (SELECT t.doc_id, t.source, t.n_tokens,
              ${bucketSql("s.hash")} AS bk
            FROM tok t JOIN sdbm s ON s.sid = t.doc_id),
      c AS (SELECT doc_id, source, n_tokens,
              CAST(sum(n_tokens) OVER (PARTITION BY source
                ORDER BY bk, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                AS cum_tokens
            FROM b)
      SELECT doc_id, source, n_tokens, cum_tokens
      FROM c WHERE cum_tokens <= 1000 ORDER BY doc_id""",
    "dedup_ngram_jaccard" -> """
      WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
      g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS g
            FROM d, UNNEST(range(1, length(text) - 1)) AS t(i)),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id)
      SELECT id_a, id_b, shared, na.ng AS n_a, nb.ng AS n_b
      FROM p JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
      WHERE CAST(shared AS DOUBLE) / (na.ng + nb.ng - shared) >= 0.8
      ORDER BY id_a, id_b""",
    "dedup_containment" -> """
      WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
      g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 8) AS g
            FROM d, UNNEST(range(1, length(text) - 6)) AS t(i)),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id)
      SELECT id_a, id_b, shared, n_a, n_b, cont_bp FROM (
        SELECT id_a, id_b, shared, na.ng AS n_a, nb.ng AS n_b,
               (10000 * shared) // least(na.ng, nb.ng) AS cont_bp
        FROM p JOIN n na ON na.doc_id = id_a
               JOIN n nb ON nb.doc_id = id_b) t
      WHERE cont_bp >= 9000 ORDER BY id_a, id_b""",
    "dedup_clusters" -> """
      WITH RECURSIVE
      d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
      g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS gr
            FROM d, UNNEST(range(1, length(text) - 1)) AS t(i)),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id),
      pairs AS (SELECT id_a, id_b
                FROM p JOIN n na ON na.doc_id = id_a
                       JOIN n nb ON nb.doc_id = id_b
                WHERE CAST(shared AS DOUBLE) / (na.ng + nb.ng - shared) >= 0.8),
      e AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT a AS node, a AS r FROM e
        UNION
        SELECT e.b AS node, reach.r FROM reach JOIN e ON e.a = reach.node)
      SELECT node AS doc_id, min(r) AS cluster_id
      FROM reach GROUP BY node ORDER BY doc_id""",
    "dedup_cluster_reps" -> """
      WITH RECURSIVE
      d AS (SELECT doc_id, text, n_chars FROM documents WHERE doc_id < 500),
      g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS gr
            FROM d, UNNEST(range(1, length(text) - 1)) AS t(i)),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id),
      pairs AS (SELECT id_a, id_b
                FROM p JOIN n na ON na.doc_id = id_a
                       JOIN n nb ON nb.doc_id = id_b
                WHERE CAST(shared AS DOUBLE) / (na.ng + nb.ng - shared) >= 0.8),
      e AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT a AS node, a AS r FROM e
        UNION
        SELECT e.b AS node, reach.r FROM reach JOIN e ON e.a = reach.node),
      cl AS (SELECT node AS doc_id, min(r) AS cluster_id
             FROM reach GROUP BY node),
      scored AS (SELECT d.doc_id, d.n_chars, cl.cluster_id
                 FROM d LEFT JOIN cl USING (doc_id)),
      reps AS (SELECT doc_id FROM (
                 SELECT doc_id, row_number() OVER (
                   PARTITION BY cluster_id
                   ORDER BY n_chars DESC, doc_id) AS rn
                 FROM scored WHERE cluster_id IS NOT NULL)
               WHERE rn = 1)
      SELECT doc_id FROM scored WHERE cluster_id IS NULL
      UNION ALL SELECT doc_id FROM reps
      ORDER BY doc_id""",
    "dedup_filtered" -> """
      WITH RECURSIVE
      d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
      g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS gr
            FROM d, UNNEST(range(1, length(text) - 1)) AS t(i)),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM g a JOIN g b ON a.gr = b.gr AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id),
      pairs AS (SELECT id_a, id_b
                FROM p JOIN n na ON na.doc_id = id_a
                       JOIN n nb ON nb.doc_id = id_b
                WHERE CAST(shared AS DOUBLE) / (na.ng + nb.ng - shared) >= 0.8),
      e AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT a AS node, a AS r FROM e
        UNION
        SELECT e.b AS node, reach.r FROM reach JOIN e ON e.a = reach.node),
      comp AS (SELECT node, min(r) AS root FROM reach GROUP BY node)
      SELECT doc_id FROM d
      WHERE doc_id NOT IN (SELECT node FROM comp WHERE node <> root)
      ORDER BY doc_id""",
    "decontam_semantic" -> s"""
      WITH $qEmbSql,
      d AS (SELECT a.vec_id AS cid, b.vec_id AS eid, sum(a.x * b.x) AS dot
            FROM e a JOIN e b ON a.i = b.i
                 AND a.vec_id >= 50 AND b.vec_id < 50
            GROUP BY 1, 2),
      bad AS (SELECT DISTINCT cid FROM d
              JOIN n na ON na.vec_id = cid JOIN n nb ON nb.vec_id = eid
              WHERE CAST(dot AS DOUBLE) /
                    sqrt(CAST(na.norm AS DOUBLE) * CAST(nb.norm AS DOUBLE))
                    >= 0.45)
      SELECT vec_id FROM embeddings
      WHERE vec_id >= 50 AND vec_id NOT IN (SELECT cid FROM bad)
      ORDER BY vec_id""",
    "dedup_embedding" -> s"""
      WITH $qEmbSql,
      d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2)
      SELECT id_a, id_b,
             CAST(dot AS DOUBLE) / sqrt(CAST(na.norm AS DOUBLE) * CAST(nb.norm AS DOUBLE)) AS cosine
      FROM d JOIN n na ON na.vec_id = id_a JOIN n nb ON nb.vec_id = id_b
      WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na.norm AS DOUBLE) * CAST(nb.norm AS DOUBLE)) >= 0.45
      ORDER BY id_a, id_b""",
    "sim_topk" -> s"""
      WITH $qEmbSql,
      s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   sum(a.x * b.x) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 10
                 AND b.vec_id <> a.vec_id
            GROUP BY 1, 2),
      c AS (SELECT query_id, neighbor_id,
                   CAST(dot AS DOUBLE) / sqrt(CAST(na.norm AS DOUBLE) * CAST(nb.norm AS DOUBLE)) AS cosine
            FROM s JOIN n na ON na.vec_id = query_id
                   JOIN n nb ON nb.vec_id = neighbor_id)
      SELECT query_id, rank, neighbor_id, cosine
      FROM (SELECT query_id, neighbor_id, cosine,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, neighbor_id) AS rank
            FROM c) rk
      WHERE rank <= 10 ORDER BY query_id, rank""",
    // top-3 nearest different-label per anchor (vec_id < 8)
    "sim_hard_negatives" -> s"""
      WITH $qEmbSql,
      lb AS (SELECT vec_id, label FROM embeddings),
      s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   sum(a.x * b.x) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 8
                 AND b.vec_id <> a.vec_id
            GROUP BY 1, 2),
      c AS (SELECT query_id, la.label AS query_label, neighbor_id,
                   lc.label AS neighbor_label,
                   CAST(dot AS DOUBLE)
                     / sqrt(CAST(na.norm AS DOUBLE) * CAST(nb.norm AS DOUBLE))
                     AS cosine
            FROM s JOIN n na ON na.vec_id = query_id
                   JOIN n nb ON nb.vec_id = neighbor_id
                   JOIN lb la ON la.vec_id = query_id
                   JOIN lb lc ON lc.vec_id = neighbor_id
            WHERE la.label <> lc.label)
      SELECT query_id, query_label, rank, neighbor_id, neighbor_label,
             cosine
      FROM (SELECT *, row_number() OVER (PARTITION BY query_id
              ORDER BY cosine DESC, neighbor_id) AS rank FROM c) rk
      WHERE rank <= 3 ORDER BY query_id, rank""",
    // batch-hard triplets for anchors vec_id < 16: farthest same-label
    // (cosine ASC, id ties) + nearest different-label (cosine DESC)
    "sim_triplets" -> s"""
      WITH $qEmbSql,
      lb AS (SELECT vec_id, label FROM embeddings),
      s AS (SELECT a.vec_id AS anchor_id, b.vec_id AS cid,
                   sum(a.x * b.x) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < 16
                 AND b.vec_id <> a.vec_id
            GROUP BY 1, 2),
      c AS (SELECT anchor_id, la.label AS anchor_label, cid,
                   lc.label = la.label AS same,
                   CAST(dot AS DOUBLE)
                     / sqrt(CAST(na.norm AS DOUBLE) * CAST(nb.norm AS DOUBLE))
                     AS cosine
            FROM s JOIN n na ON na.vec_id = anchor_id
                   JOIN n nb ON nb.vec_id = cid
                   JOIN lb la ON la.vec_id = anchor_id
                   JOIN lb lc ON lc.vec_id = cid),
      pos AS (SELECT anchor_id, anchor_label, cid AS pos_id,
                     cosine AS pos_cosine
              FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                      ORDER BY cosine ASC, cid) AS rk
                    FROM c WHERE same) p WHERE rk = 1),
      neg AS (SELECT anchor_id, cid AS neg_id, cosine AS neg_cosine
              FROM (SELECT *, row_number() OVER (PARTITION BY anchor_id
                      ORDER BY cosine DESC, cid) AS rk
                    FROM c WHERE NOT same) q WHERE rk = 1)
      SELECT p.anchor_id, p.anchor_label, pos_id, pos_cosine,
             neg_id, neg_cosine, neg_cosine - pos_cosine AS viol_margin
      FROM pos p JOIN neg USING (anchor_id) ORDER BY anchor_id""",
    "dedup_minhash_recall" -> s"""
      WITH $gtPairsCteSql,
      ${recallTailSql("dedup_minhash_recall", "id_a, id_b", 9500)}""",
    "dedup_simhash_recall" -> s"""
      WITH $gtPairsCteSql,
      ${recallTailSql("dedup_simhash_recall", "id_a, id_b", 9500)}""",
    "dedup_embedding_ann_recall" -> s"""
      WITH $qEmbSql,
      d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2),
      exact AS (SELECT id_a, id_b
                FROM d JOIN n na ON na.vec_id = id_a
                       JOIN n nb ON nb.vec_id = id_b
                WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na.norm AS DOUBLE) * CAST(nb.norm AS DOUBLE)) >= 0.45),
      ${recallTailSql("dedup_embedding_ann_recall", "id_a, id_b", 9000)}""",
    "sim_ann_lsh_recall" -> s"""
      WITH $qEmbSql,
      $exactTop5CteSql,
      ${recallTailSql("sim_ann_lsh_recall", "query_id, neighbor_id", 9000)}""",
    "sim_ann_ivf_recall" -> s"""
      WITH $qEmbSql,
      $exactTop5CteSql,
      ${recallTailSql("sim_ann_ivf_recall", "query_id, neighbor_id", 8000)}""",
    "sim_ann_pq_recall" -> s"""
      WITH $qEmbSql,
      $exactTop5CteSql,
      ${recallTailSql("sim_ann_pq_recall", "query_id, neighbor_id", 8000)}""",
    "dedup_incremental_near_recall" -> s"""
      WITH surv AS (SELECT doc_id
                    FROM read_parquet('$RecallDirToken/dedup_incremental_near_recall/*.parquet')),
      staged AS (SELECT doc_id + 10000 AS doc_id FROM documents
                 WHERE doc_id < 50),
      cnt AS (SELECT count(*) AS n_exact FROM staged),
      hit AS (SELECT count(*) AS n_hit FROM staged st
              WHERE NOT EXISTS (SELECT 1 FROM surv sv
                                WHERE sv.doc_id = st.doc_id))
      SELECT n_exact, n_hit,
             CASE WHEN n_exact = 0 THEN CAST(10000 AS BIGINT)
                  ELSE (10000 * n_hit) // n_exact END AS recall_bp,
             TRUE AS meets_floor
      FROM cnt, hit""",
    "dedup_semantic_recall" -> s"""
      WITH $qEmbSql,
      d AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.x * b.x) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
            GROUP BY 1, 2),
      exact AS (SELECT id_a, id_b
                FROM d JOIN n na ON na.vec_id = id_a
                       JOIN n nb ON nb.vec_id = id_b
                WHERE CAST(dot AS DOUBLE) / sqrt(CAST(na.norm AS DOUBLE) * CAST(nb.norm AS DOUBLE)) >= 0.45),
      ${recallTailSql("dedup_semantic_recall", "id_a, id_b", 4000)}""",
    // within_bound is the literal expected TRUE on the oracle side —
    // see recallTailSql's rationale: both-sides-computed booleans
    // would agree on a violation and stay green; the assertion makes
    // a bound breach a visible hash mismatch.
    "profile_sketch_lake_bounds" -> s"""
      WITH apx AS (SELECT event_type, est_users
                   FROM read_parquet('$RecallDirToken/profile_sketch_lake_bounds/*.parquet')),
      ex AS (SELECT event_type, count(DISTINCT user_id) AS exact_users
             FROM events GROUP BY event_type)
      SELECT a.event_type, a.est_users, e.exact_users,
             TRUE AS within_bound
      FROM apx a JOIN ex e USING (event_type)
      ORDER BY a.event_type""",
    "profile_kll_lake_bounds" -> s"""
      WITH apx AS (SELECT event_type, p50_est, p95_est
                   FROM read_parquet('$RecallDirToken/profile_kll_lake_bounds/*.parquet')),
      r AS (SELECT e.event_type, a.p50_est, a.p95_est, count(*) AS n,
              sum(CASE WHEN e.value <= a.p50_est THEN 1 ELSE 0 END)
                AS le50,
              sum(CASE WHEN e.value <= a.p95_est THEN 1 ELSE 0 END)
                AS le95
            FROM events e JOIN apx a USING (event_type)
            GROUP BY 1, 2, 3)
      SELECT event_type,
             CAST((10000 * le50) // n AS BIGINT) AS r50_bp,
             CAST((10000 * le95) // n AS BIGINT) AS r95_bp,
             TRUE AS p50_within, TRUE AS p95_within
      FROM r ORDER BY event_type""",
    "profile_sketch_overlap_bounds" -> s"""
      WITH apx AS (SELECT est_overlap
                   FROM read_parquet('$RecallDirToken/profile_sketch_overlap_bounds/*.parquet')),
      ex AS (SELECT count(*) AS exact_overlap FROM (
               SELECT user_id FROM events
               WHERE event_type IN ('click', 'purchase')
               GROUP BY user_id
               HAVING count(DISTINCT event_type) = 2))
      SELECT est_overlap, exact_overlap, TRUE AS within_bound
      FROM apx, ex""",
    "sqlfn_gate" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "doc_id", "text", "sg")},
      d AS (SELECT doc_id, h, n_shingles, n_distinct_shingles, self_shared
            FROM read_parquet('$RecallDirToken/sqlfn_gate/*.parquet'))
      SELECT count(*) AS n_rows,
             CAST(sum(CASE WHEN d.h = sg.hash THEN 1 ELSE 0 END)
               AS BIGINT) AS n_h_match,
             CAST(sum(CASE WHEN d.n_shingles =
                  greatest(len(string_split(doc.text, ' ')) - 2, 0)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_shingle_match,
             CAST(sum(CASE WHEN d.self_shared = d.n_distinct_shingles
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_selfshared_match,
             TRUE AS h_ok, TRUE AS shingle_ok, TRUE AS selfshared_ok
      FROM d JOIN documents doc ON d.doc_id = doc.doc_id
             JOIN sg ON sg.sid = d.doc_id""",
    "text_compression_bounds" -> s"""
      WITH apx AS (SELECT doc_id, deflate_len
                   FROM read_parquet('$RecallDirToken/text_compression_bounds/*.parquet')),
      ex AS (SELECT doc_id,
               CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT)
                 AS n_bytes
             FROM documents),
      j AS (SELECT a.doc_id, a.deflate_len, e.n_bytes
            FROM apx a JOIN ex e USING (doc_id))
      SELECT count(*) AS n_docs,
             CAST(sum(n_bytes) AS BIGINT) AS bytes_total,
             CAST(sum(deflate_len) AS BIGINT) AS deflate_total,
             (10000 * CAST(sum(deflate_len) AS BIGINT)) //
               CAST(sum(n_bytes) AS BIGINT) AS mean_ratio_bp,
             TRUE AS all_within_worstcase,
             TRUE AS ratio_plausible
      FROM j""",
    "profile_approx_bounds" -> s"""
      WITH apx AS (SELECT * FROM read_parquet('$RecallDirToken/profile_approx_bounds/*.parquet')),
      ex AS (${Seq("doc_id", "text", "lang", "source", "n_chars").map(c =>
        s"""SELECT '$c' AS col_name,
               count(DISTINCT $c) AS nd_exact FROM documents""")
        .mkString(" UNION ALL ")}),
      nums AS (SELECT 'doc_id' AS col_name, CAST(doc_id AS DOUBLE) AS v
               FROM documents WHERE doc_id IS NOT NULL
               UNION ALL
               SELECT 'n_chars', CAST(n_chars AS DOUBLE)
               FROM documents WHERE n_chars IS NOT NULL),
      rk AS (SELECT nm.col_name,
               CAST(sum(CASE WHEN v < a.p50 THEN 1 ELSE 0 END) AS BIGINT) AS r50_lt,
               CAST(sum(CASE WHEN v <= a.p50 THEN 1 ELSE 0 END) AS BIGINT) AS r50_le,
               CAST(sum(CASE WHEN v < a.p95 THEN 1 ELSE 0 END) AS BIGINT) AS r95_lt,
               CAST(sum(CASE WHEN v <= a.p95 THEN 1 ELSE 0 END) AS BIGINT) AS r95_le,
               CAST(sum(CASE WHEN v < a.p99 THEN 1 ELSE 0 END) AS BIGINT) AS r99_lt,
               CAST(sum(CASE WHEN v <= a.p99 THEN 1 ELSE 0 END) AS BIGINT) AS r99_le
             FROM nums nm JOIN apx a USING (col_name)
             GROUP BY nm.col_name)
      SELECT e.col_name, e.nd_exact,
             TRUE AS n_ok, TRUE AS nd_ok,
             coalesce(rk.r50_lt, CAST(0 AS BIGINT)) AS r50_lt,
             coalesce(rk.r50_le, CAST(0 AS BIGINT)) AS r50_le,
             coalesce(rk.r95_lt, CAST(0 AS BIGINT)) AS r95_lt,
             coalesce(rk.r95_le, CAST(0 AS BIGINT)) AS r95_le,
             coalesce(rk.r99_lt, CAST(0 AS BIGINT)) AS r99_lt,
             coalesce(rk.r99_le, CAST(0 AS BIGINT)) AS r99_le,
             TRUE AS p50_ok, TRUE AS p95_ok, TRUE AS p99_ok
      FROM ex e LEFT JOIN rk ON rk.col_name = e.col_name
      ORDER BY e.col_name""",
    "text_token_stats" -> """
      SELECT doc_id, length(text) AS n_chars_m,
             CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS n_tokens,
             CAST(length(replace(text, ' ', '')) AS DOUBLE) /
               nullif(CASE WHEN length(trim(text)) = 0 THEN 0
                           ELSE length(text) - length(replace(text, ' ', '')) + 1 END, 0) AS avg_token_len
      FROM documents ORDER BY doc_id""",
    "text_quality" -> s"""
      SELECT doc_id, n_chars_m, n_punct, stop_hits,
             (CAST(stop_hits AS DOUBLE) * 100.0 / CAST(nullif(n_chars_m, 0) AS DOUBLE) -
              CAST(n_punct AS DOUBLE) / CAST(nullif(n_chars_m, 0) AS DOUBLE)) AS quality
      FROM (SELECT doc_id, length(text) AS n_chars_m,
              length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_punct,
              ${Seq("the", "and", "of", "to").map(hitsSql).mkString(" + ")} AS stop_hits
            FROM (SELECT doc_id, text, ' ' || lower(text) || ' ' AS p
                  FROM documents))
      ORDER BY doc_id""",
    "text_langid" -> s"""
      SELECT doc_id, lang_label, s_en, s_de, s_fr, s_es,
             CASE WHEN s_en + s_de + s_fr + s_es IS NULL
                    OR s_en + s_de + s_fr + s_es = 0 THEN 'unknown'
                  WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
                  WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                  WHEN s_fr >= s_es THEN 'fr'
                  ELSE 'es' END AS pred_lang
      FROM (SELECT doc_id, lang AS lang_label,
              ${graft.operators.TextStats.LangProfiles.map { case (l, ws) =>
                ws.map(hitsSql).mkString(" + ") + s" AS s_$l"
              }.mkString(", ")}
            FROM (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p
                  FROM documents))
      ORDER BY doc_id""",
    "sample_packed" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0",
        "CAST(doc_id AS VARCHAR)")},
      b AS (SELECT d.doc_id,
              CAST((${bucketSql("s.hash")}) % 10 AS BIGINT) AS shard,
              CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE length(text) - length(replace(text, ' ', '')) + 1
                   END AS n_tokens
            FROM documents d JOIN sdbm s ON s.sid = d.doc_id),
      c AS (SELECT doc_id, shard, n_tokens,
              CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM b)
      SELECT doc_id, shard, n_tokens,
             (cum - n_tokens) // 512 AS bin,
             (cum - n_tokens) % 512 AS offset
      FROM c ORDER BY doc_id""",
    "sample_packed_text" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0",
        "CAST(doc_id AS VARCHAR)")},
      b AS (SELECT d.doc_id, d.text,
              CAST((${bucketSql("s.hash")}) % 10 AS BIGINT) AS shard,
              CASE WHEN length(trim(text)) = 0 THEN 0
                   ELSE length(text) - length(replace(text, ' ', '')) + 1
                   END AS n_tokens
            FROM documents d JOIN sdbm s ON s.sid = d.doc_id),
      c AS (SELECT doc_id, text, shard, n_tokens,
              CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
            FROM b)
      SELECT shard, (cum - n_tokens) // 512 AS bin,
             count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             string_agg(text, ' ' ORDER BY doc_id) AS text
      FROM c GROUP BY 1, 2 ORDER BY shard, bin""",
    "dedup_incremental" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0",
        "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))")},
      f AS (SELECT doc_id, s.hash AS fp
            FROM documents JOIN sdbm s ON s.sid = doc_id
            WHERE text IS NOT NULL),
      batch AS (SELECT doc_id, fp FROM f WHERE doc_id >= 400
                UNION ALL
                SELECT doc_id + 10000, fp FROM f WHERE doc_id < 50)
      SELECT min(doc_id) AS doc_id, fp
      FROM batch
      WHERE fp NOT IN (SELECT fp FROM f WHERE doc_id < 400)
      GROUP BY fp ORDER BY doc_id""",
    "profile_documents" -> (Seq("doc_id", "text", "lang", "source",
      "n_chars").map(c => s"""
      SELECT '$c' AS col_name, count(*) AS n,
             count(*) - count($c) AS n_null,
             count(DISTINCT $c) AS n_distinct,
             CAST(min($c) AS VARCHAR) AS min_s,
             CAST(max($c) AS VARCHAR) AS max_s
      FROM documents""").mkString(" UNION ALL ") + " ORDER BY col_name"),
    "profile_equidepth" -> """
      WITH bs AS (SELECT quantile_cont(CAST(n_chars AS DOUBLE),
                    [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS b
                  FROM documents),
      v AS (SELECT CAST(n_chars AS DOUBLE) AS v FROM documents
            WHERE n_chars IS NOT NULL)
      SELECT CAST(len(list_filter(b, x -> x <= v)) AS INT) AS bin,
             min(v) AS lo, max(v) AS hi, count(*) AS n_rows
      FROM v, bs GROUP BY 1 ORDER BY bin""",
    "profile_histogram" -> """
      WITH b AS (SELECT CAST(min(n_chars) AS BIGINT) AS blo,
                        CAST(max(n_chars) AS BIGINT) AS bhi
                 FROM documents),
      w AS (SELECT blo, greatest((bhi - blo + 10) // 10, 1) AS width
            FROM b),
      x AS (SELECT (n_chars - blo) // width AS bin, blo, width
            FROM documents, w)
      SELECT bin, min(blo + bin * width) AS lo,
             min(blo + (bin + 1) * width) AS hi, count(*) AS n_rows
      FROM x GROUP BY bin ORDER BY bin""",
    "profile_heavy_hitters" -> """
      SELECT CAST(user_id AS VARCHAR) AS value, count(*) AS n_rows
      FROM events GROUP BY 1 ORDER BY n_rows DESC, value LIMIT 10""",
    "profile_fk_orphans" -> """
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_custkey NOT IN
        (SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 0)
      ORDER BY o_orderkey""",
    "text_chunks" -> """
      WITH c AS (SELECT doc_id, text,
          greatest(1, (length(text) - 50 + 149) // 150) AS n_chunks
        FROM documents)
      SELECT doc_id, i AS chunk_id,
             substr(text, CAST(i * 150 + 1 AS INT), 200) AS chunk
      FROM c, UNNEST(range(0, n_chunks)) AS t(i)
      ORDER BY doc_id, chunk_id""",
    "text_chunks_tokens" -> """
      WITH c AS (SELECT doc_id, str_split(text, ' ') AS w,
          greatest(1, (len(str_split(text, ' ')) - 10 + 29) // 30)
            AS n_chunks
        FROM documents)
      SELECT doc_id, i AS chunk_id,
             array_to_string(w[CAST(i * 30 + 1 AS INT) :
                               CAST(i * 30 + 40 AS INT)], ' ') AS chunk
      FROM c, UNNEST(range(0, n_chunks)) AS t(i)
      ORDER BY doc_id, chunk_id""",
    "text_diversity" -> """
      WITH ch AS (SELECT doc_id, substr(text, CAST(i AS INT), 1) AS ch
                  FROM documents,
                       UNNEST(range(1, length(text) + 1)) AS t(i)),
      cc AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
      agg AS (SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS collision_num,
                     CAST(sum(c) AS BIGINT) AS n
              FROM cc GROUP BY 1)
      SELECT d.doc_id, coalesce(n, 0) AS n_chars_d,
             coalesce(collision_num, 0) AS collision_num,
             CASE WHEN coalesce(n, 0) = 0 THEN 0.0
                  ELSE CAST(collision_num AS DOUBLE) / (n * n)
                  END AS collision
      FROM documents d LEFT JOIN agg ON agg.doc_id = d.doc_id
      ORDER BY d.doc_id""",
    "text_vocab" -> """
      SELECT w AS value, count(*) AS n_rows
      FROM (SELECT w
            FROM documents, UNNEST(string_split(lower(text), ' ')) AS u(w)
            WHERE w <> '')
      GROUP BY w ORDER BY n_rows DESC, value LIMIT 100""",
    "text_bigrams" -> """
      WITH t AS (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS ws
                 FROM documents),
      p AS (SELECT ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1]
              AS pair
            FROM t, unnest(range(1, len(ws))) AS r(i))
      SELECT pair, count(*) AS n FROM p
      GROUP BY pair ORDER BY n DESC, pair LIMIT 100""",
    "text_lm_score" -> """
      WITH t AS (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS ws
                 FROM documents),
      bg AS (SELECT doc_id, ws[CAST(i AS INT)] AS w1,
                    ws[CAST(i AS INT)] || ' ' || ws[CAST(i AS INT) + 1]
                      AS pair
             FROM t, unnest(range(1, len(ws))) AS r(i)),
      pc AS (SELECT pair, count(*) AS n_pair FROM bg GROUP BY pair),
      wc AS (SELECT w1, count(*) AS n_w1 FROM bg GROUP BY w1),
      sc AS (SELECT bg.doc_id, (10000 * pc.n_pair) // wc.n_w1 AS pair_bp
             FROM bg JOIN pc USING (pair) JOIN wc USING (w1)),
      ag AS (SELECT doc_id, count(*) AS n_bigrams,
                    CAST(sum(pair_bp) AS BIGINT) AS bp_sum
             FROM sc GROUP BY doc_id)
      SELECT d.doc_id,
             coalesce(ag.n_bigrams, 0) AS n_bigrams,
             CASE WHEN coalesce(ag.n_bigrams, 0) = 0 THEN CAST(0 AS BIGINT)
                  ELSE ag.bp_sum // ag.n_bigrams END AS mean_bp
      FROM documents d LEFT JOIN ag USING (doc_id)
      ORDER BY d.doc_id""",
    "text_postings" -> """
      SELECT term, count(DISTINCT doc_id) AS df,
             array_to_string(list_sort(list(DISTINCT doc_id)), ',')
               AS postings
      FROM (SELECT doc_id, w AS term
            FROM documents, UNNEST(string_split(lower(text), ' ')) AS u(w)
            WHERE w <> '')
      GROUP BY term ORDER BY term""",
    "text_search" -> """
      WITH t AS (SELECT doc_id, w AS term
                 FROM documents, UNNEST(string_split(lower(text), ' ')) AS u(w)
                 WHERE w IN ('spark', 'window', 'merge')),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_corpus FROM documents)
      SELECT f.doc_id,
             CAST(sum(f.tf * ((1000000 * (n.n_corpus + 1)) // (d.df + 1)))
               AS BIGINT) AS score,
             count(*) AS n_terms
      FROM tf f JOIN df d USING (term) CROSS JOIN n
      GROUP BY f.doc_id
      ORDER BY score DESC, f.doc_id LIMIT 10""",
    // BM25 with k1=6/5, b=3/4 multiplied through by 10·L: per-term
    // contribution (w·22·L·tf) // (10·L·tf + 3·L + 9·N·dl)
    "text_bm25" -> """
      WITH toks AS (SELECT doc_id, w AS term
                    FROM documents,
                         UNNEST(string_split(lower(text), ' ')) AS u(w)
                    WHERE w <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      corpus AS (SELECT sum(dl) AS len_corpus FROM dl),
      n AS (SELECT count(*) AS n_corpus FROM documents),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
             WHERE term IN ('spark', 'window', 'merge') GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
      SELECT f.doc_id,
             CAST(sum((CAST((1000000 * (n.n_corpus + 1)) // (d.df + 1)
                        AS HUGEINT) * 22 * c.len_corpus * f.tf)
                      // (10 * c.len_corpus * f.tf + 3 * c.len_corpus
                          + 9 * n.n_corpus * l.dl))
               AS BIGINT) AS score,
             count(*) AS n_terms
      FROM tf f JOIN df d USING (term) JOIN dl l USING (doc_id)
      CROSS JOIN n CROSS JOIN corpus c
      GROUP BY f.doc_id
      ORDER BY score DESC, f.doc_id LIMIT 10""",
    // PRF: BM25 pass 1 → top-5 feedback docs → top-3 expansion terms
    // by tf_fb·idf (ties by term) → BM25 pass 2 over the union
    "text_prf_search" -> """
      WITH toks AS (SELECT doc_id, w AS term
                    FROM documents,
                         UNNEST(string_split(lower(text), ' ')) AS u(w)
                    WHERE w <> ''),
      dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
      corpus AS (SELECT sum(dl) AS len_corpus FROM dl),
      n AS (SELECT count(*) AS n_corpus FROM documents),
      q0 AS (SELECT * FROM (VALUES ('spark'), ('window'), ('merge'))
             t(term)),
      tf0 AS (SELECT doc_id, term, count(*) AS tf
              FROM toks JOIN q0 USING (term) GROUP BY 1, 2),
      df0 AS (SELECT term, count(*) AS df FROM tf0 GROUP BY 1),
      s0 AS (SELECT f.doc_id,
               sum((CAST((1000000 * (n.n_corpus + 1)) // (d.df + 1)
                     AS HUGEINT) * 22 * c.len_corpus * f.tf)
                   // (10 * c.len_corpus * f.tf + 3 * c.len_corpus
                       + 9 * n.n_corpus * l.dl)) AS score
             FROM tf0 f JOIN df0 d USING (term) JOIN dl l USING (doc_id)
             CROSS JOIN n CROSS JOIN corpus c
             GROUP BY 1),
      fb AS (SELECT doc_id FROM s0 ORDER BY score DESC, doc_id LIMIT 5),
      dfa AS (SELECT term, count(DISTINCT doc_id) AS dfc
              FROM toks GROUP BY 1),
      expc AS (SELECT t.term, count(*) AS tf_fb
               FROM toks t JOIN fb USING (doc_id)
               WHERE t.term NOT IN (SELECT term FROM q0)
               GROUP BY 1),
      exps AS (SELECT e.term,
                 e.tf_fb * ((1000000 * (n.n_corpus + 1)) // (d.dfc + 1))
                   AS escore
               FROM expc e JOIN dfa d USING (term) CROSS JOIN n),
      expt AS (SELECT term FROM exps ORDER BY escore DESC, term LIMIT 3),
      qf AS (SELECT term FROM q0 UNION SELECT term FROM expt),
      tf1 AS (SELECT doc_id, term, count(*) AS tf
              FROM toks JOIN qf USING (term) GROUP BY 1, 2),
      df1 AS (SELECT term, count(*) AS df FROM tf1 GROUP BY 1)
      SELECT f.doc_id,
             CAST(sum((CAST((1000000 * (n.n_corpus + 1)) // (d.df + 1)
                        AS HUGEINT) * 22 * c.len_corpus * f.tf)
                      // (10 * c.len_corpus * f.tf + 3 * c.len_corpus
                          + 9 * n.n_corpus * l.dl))
               AS BIGINT) AS score,
             count(*) AS n_terms
      FROM tf1 f JOIN df1 d USING (term) JOIN dl l USING (doc_id)
      CROSS JOIN n CROSS JOIN corpus c
      GROUP BY f.doc_id
      ORDER BY score DESC, f.doc_id LIMIT 10""",
    // χ² per (source, term) over document-level presence; single floor
    // division, df ∈ [3, N), top-3 per class with term-text ties
    "text_chisq" -> """
      WITH dt AS (SELECT doc_id, source AS cls, w AS term
                  FROM documents,
                       UNNEST(list_distinct(string_split(lower(text), ' ')))
                         AS u(w)
                  WHERE w <> ''),
      n AS (SELECT count(*) AS n_total FROM documents),
      cs AS (SELECT source AS cls, count(*) AS n_cls
             FROM documents GROUP BY 1),
      dfq AS (SELECT term, count(*) AS df FROM dt GROUP BY 1
              HAVING count(*) >= 3),
      ac AS (SELECT cls, term, count(*) AS a FROM dt GROUP BY 1, 2),
      grid AS (SELECT cs.cls, dfq.term, dfq.df, cs.n_cls,
                      coalesce(ac.a, 0) AS a
               FROM cs CROSS JOIN dfq
               LEFT JOIN ac ON ac.cls = cs.cls AND ac.term = dfq.term),
      tab AS (SELECT g.cls, g.term, g.df, g.a,
                     g.df - g.a AS b, g.n_cls - g.a AS c,
                     n.n_total - g.df - (g.n_cls - g.a) AS d,
                     n.n_total AS n_total
              FROM grid g CROSS JOIN n
              WHERE g.df < n.n_total),
      chi AS (SELECT cls, term, df, a,
                     CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c
                       AS det,
                     a + b AS s1, c + d AS s2, a + c AS s3, b + d AS s4,
                     n_total
              FROM tab),
      sc AS (SELECT cls, term, df, a AS in_class_df,
                    (1000000 * n_total * det * det)
                      // (CAST(s1 AS HUGEINT) * s2 * s3 * s4)
                      AS chi2_micro,
                    CASE WHEN det > 0 THEN 1 WHEN det < 0 THEN -1
                         ELSE 0 END AS direction
             FROM chi)
      SELECT cls, rank, term, df, in_class_df,
             CAST(chi2_micro AS BIGINT) AS chi2_micro, direction
      FROM (SELECT *, row_number() OVER (PARTITION BY cls
              ORDER BY chi2_micro DESC, term) AS rank FROM sc) r
      WHERE rank <= 3 ORDER BY cls, rank""",
    // text_search's lexical pool (poolK=20) + sim_topk's cosine pool
    // for query vector 0, fused: rrf = Σ 1e6 // (60 + rank), BIGINT
    "hybrid_search" -> s"""
      WITH $qEmbSql,
      toks AS (SELECT doc_id, w AS term
               FROM documents, UNNEST(string_split(lower(text), ' ')) AS u(w)
               WHERE w IN ('spark', 'window', 'merge')),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      nc AS (SELECT count(*) AS n_corpus FROM documents),
      lexpool AS (SELECT f.doc_id,
               CAST(sum(f.tf * ((1000000 * (nc.n_corpus + 1)) // (d.df + 1)))
                 AS BIGINT) AS score
             FROM tf f JOIN df d USING (term) CROSS JOIN nc
             GROUP BY f.doc_id
             ORDER BY score DESC, f.doc_id LIMIT 20),
      lex AS (SELECT doc_id,
               row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
              FROM lexpool),
      vs AS (SELECT b.vec_id AS neighbor_id, sum(a.x * b.x) AS dot
             FROM e a JOIN e b ON a.i = b.i
               AND a.vec_id = 0 AND b.vec_id <> 0
             GROUP BY 1),
      vc AS (SELECT neighbor_id,
               CAST(dot AS DOUBLE) /
                 sqrt(CAST(na.norm AS DOUBLE) * CAST(nb.norm AS DOUBLE))
                 AS cosine
             FROM vs JOIN n na ON na.vec_id = 0
                     JOIN n nb ON nb.vec_id = neighbor_id),
      vrk AS (SELECT neighbor_id, vec_rank FROM
               (SELECT neighbor_id, row_number() OVER
                  (ORDER BY cosine DESC, neighbor_id) AS vec_rank
                FROM vc) r
              WHERE vec_rank <= 20)
      SELECT coalesce(l.doc_id, v.neighbor_id) AS doc_id,
             l.lex_rank, v.vec_rank,
             coalesce(1000000 // (60 + l.lex_rank), 0) +
               coalesce(1000000 // (60 + v.vec_rank), 0) AS rrf_micros
      FROM lex l FULL JOIN vrk v ON l.doc_id = v.neighbor_id
      ORDER BY rrf_micros DESC, doc_id LIMIT 10""",
    "text_keywords" -> """
      WITH t AS (SELECT doc_id, w AS term
                 FROM documents, UNNEST(string_split(lower(text), ' ')) AS u(w)
                 WHERE w <> ''),
      tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT count(*) AS n_corpus FROM documents),
      sc AS (SELECT doc_id, tf.term, tf.tf, df.df,
               CAST(tf.tf * (n.n_corpus + 1) AS DOUBLE) / (df.df + 1)
                 AS score
             FROM tf JOIN df USING (term) CROSS JOIN n),
      r AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, term) AS BIGINT) AS rank
            FROM sc)
      SELECT doc_id, rank, term, tf, df, score
      FROM r WHERE rank <= 5 ORDER BY doc_id, rank""",
    "quality_filtered" -> qualityFilterSql,
    // identical rows by construction: the stream is the same operator
    // over the same table through a stateless append pipe
    "quality_filtered_stream" -> qualityFilterSql,
    "scrub_pseudonymize" -> s"""
      WITH RECURSIVE ${sdbmCte("events", "user_id", "0",
        "'s1' || CAST(user_id AS VARCHAR)")}
      SELECT event_id, 'u_' || CAST(s.hash AS VARCHAR) AS user_token
      FROM events JOIN sdbm s ON s.sid = user_id
      ORDER BY event_id""",
    "scrub_redacted" -> s"""
      WITH pii AS (SELECT doc_id, text AS t FROM $piiSql p),
      ${scrubChainSql("doc_id")}
      SELECT doc_id,
             ${Scrub.DefaultRules.map(r => s"n_${r.name}").mkString(", ")},
             t AS redacted
      FROM s${Scrub.DefaultRules.size} ORDER BY doc_id""",
    // mirrors Urls.canonicalizeUrl rule for rule (DuckDB backrefs are
    // \1-style where Spark's are $1; the oracle gate catches drift)
    "url_canonical" -> """
      WITH u AS (SELECT doc_id,
        'HTTP://WWW.' || source || '.Example.com:80//a//' || (doc_id % 7) ||
        '?utm_source=feed&id=' || doc_id || '&utm_campaign=x#sec' AS url
        FROM documents),
      c1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u FROM u),
      c2 AS (SELECT doc_id,
               regexp_replace(u, '&utm_[A-Za-z0-9_]*=[^&]*', '', 'g') AS u
             FROM c1),
      c3 AS (SELECT doc_id,
               regexp_replace(u, '\?utm_[A-Za-z0-9_]*=[^&]*&', '?') AS u
             FROM c2),
      c4 AS (SELECT doc_id,
               regexp_replace(u, '\?utm_[A-Za-z0-9_]*=[^&]*$', '') AS u
             FROM c3),
      c5 AS (SELECT doc_id,
               regexp_replace(u, '(?i)^(http://[^/:?#]+):80([/?]|$)',
                 '\1\2') AS u FROM c4),
      c6 AS (SELECT doc_id,
               regexp_replace(u, '(?i)^(https://[^/:?#]+):443([/?]|$)',
                 '\1\2') AS u FROM c5),
      sp AS (SELECT doc_id,
               lower(regexp_extract(u,
                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*')) AS head,
               regexp_replace(u,
                 '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS tail
             FROM c6),
      p AS (SELECT doc_id, head,
              regexp_extract(tail, '^[^?]*') AS path,
              regexp_extract(tail, '\?.*$') AS query FROM sp)
      SELECT doc_id,
             head ||
             regexp_replace(regexp_replace(path, '/{2,}', '/', 'g'),
               '/+$', '') || query AS url_canonical
      FROM p ORDER BY doc_id""",
    "url_domains" -> """
      SELECT lower(regexp_extract(
               'HTTP://user@WWW.' || source || '.Example.com:80/p',
               '^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/:?#@]*@)?([^/:?#]*)', 1))
               AS domain,
             count(*) AS n_docs
      FROM documents GROUP BY 1 ORDER BY domain""",
    "text_html_clean" -> s"""
      SELECT doc_id,
             ${htmlCleanSql(
               s"'${htmlWrapPrefix.replace("'", "''")}' || " +
               s"coalesce(text, '') || " +
               s"'${htmlWrapSuffix.replace("'", "''")}'")} AS clean_text
      FROM documents ORDER BY doc_id""",
    "scrub_counts" -> s"""
      WITH pii AS (SELECT source, text AS t FROM $piiSql p),
      ${scrubChainSql("source")}
      SELECT source, count(*) AS n_docs,
             CAST(sum(CASE WHEN ${Scrub.DefaultRules.map(r => s"n_${r.name}")
               .mkString(" + ")} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit,
             ${Scrub.DefaultRules.map(r =>
                s"CAST(sum(n_${r.name}) AS BIGINT) AS sum_${r.name}")
               .mkString(", ")}
      FROM s${Scrub.DefaultRules.size} GROUP BY source ORDER BY source""",
    "events_anomaly_robust" -> """
      WITH q AS (SELECT event_type,
                   quantile_cont(value, 0.25) AS q1,
                   quantile_cont(value, 0.75) AS q3
                 FROM events GROUP BY 1)
      SELECT event_id, e.event_type, value,
             (value < q1 - 0.9 * (q3 - q1)
              OR value > q3 + 0.9 * (q3 - q1)) AS is_outlier
      FROM events e JOIN q ON e.event_type = q.event_type
      ORDER BY event_id""",
    "events_tumbling" -> """
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_stream_tumbling" -> """
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // the state read-back after a complete-mode drain IS the final
    // aggregate — the plain GROUP BY checks the introspection path
    "events_state_inspect" -> """
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             count(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    // append-mode twin: identical final table once the sentinel closes
    // every real window
    "events_stream_tumbling_append" -> """
      SELECT date_trunc('hour', ts) AS window_start, event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_sliding" -> slidingSql,
    // streaming twins: same result tables as their batch/SQL
    // equivalents by construction, so the oracles are shared
    "events_stream_sliding" -> slidingSql,
    "events_stream_enrich_outer" -> """
      SELECT e.event_id, e.user_id, c.c_name AS cust_name
      FROM events e
      LEFT JOIN (SELECT c_custkey, c_name FROM customer
                 WHERE c_custkey % 10 <> 0) c
        ON e.user_id = c.c_custkey
      ORDER BY e.event_id""",
    "events_stream_enrich" -> """
      SELECT e.event_id, e.user_id, c.c_name AS cust_name,
             n.n_name AS nation_name
      FROM events e
      JOIN customer c ON e.user_id = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      ORDER BY e.event_id""",
    "q_cdc_merge" -> """
      WITH base AS (SELECT c_custkey, c_name, c_nationkey, c_acctbal,
                           c_mktsegment FROM customer),
      changes AS (
        SELECT c_custkey, c_name, c_nationkey,
               c_acctbal + 100.0 AS c_acctbal, c_mktsegment,
               'U' AS op, 1 AS version FROM base WHERE c_custkey < 50
        UNION ALL
        SELECT c_custkey, c_name, c_nationkey, c_acctbal + 500.0,
               c_mktsegment, 'U', 2 FROM base WHERE c_custkey < 20
        UNION ALL
        SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
               'D', 1 FROM base WHERE c_custkey >= 50 AND c_custkey < 60
        UNION ALL
        SELECT c_custkey + 100000, c_name, c_nationkey, c_acctbal,
               c_mktsegment, 'U', 1 FROM base WHERE c_custkey < 10),
      latest AS (SELECT * FROM (
          SELECT *, row_number() OVER (PARTITION BY c_custkey
            ORDER BY version DESC) AS rn FROM changes) WHERE rn = 1)
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM base WHERE c_custkey NOT IN (SELECT c_custkey FROM latest)
      UNION ALL
      SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      FROM latest WHERE op <> 'D'
      ORDER BY c_custkey""",
    "q_scd2" -> """
      WITH v AS (SELECT o_custkey,
                   epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS version,
                   max(o_totalprice) AS o_totalprice
                 FROM orders GROUP BY 1, 2)
      SELECT o_custkey, version, o_totalprice,
             version AS valid_from,
             lead(version) OVER w AS valid_to,
             lead(version) OVER w IS NULL AS is_current
      FROM v
      WINDOW w AS (PARTITION BY o_custkey ORDER BY version)
      ORDER BY o_custkey, valid_from""",
    "q_scd2_asof" -> """
      WITH v AS (SELECT o_custkey,
                   epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS version,
                   max(o_totalprice) AS o_totalprice
                 FROM orders GROUP BY 1, 2),
      h AS (SELECT o_custkey, version, o_totalprice,
              version AS valid_from,
              lead(version) OVER w AS valid_to,
              lead(version) OVER w IS NULL AS is_current
            FROM v
            WINDOW w AS (PARTITION BY o_custkey ORDER BY version))
      SELECT * FROM h
      WHERE valid_from <= 946684800000000
        AND (valid_to IS NULL OR valid_to > 946684800000000)
      ORDER BY o_custkey""",
    "q_nullsafe_join" -> """
      WITH a AS (SELECT n_nationkey AS ak,
                   CASE WHEN n_nationkey % 5 = 0 THEN NULL
                        ELSE n_regionkey END AS k FROM nation),
      b AS (SELECT n_nationkey AS bk,
              CASE WHEN n_nationkey % 3 = 0 THEN NULL
                   ELSE n_regionkey END AS k2 FROM nation)
      SELECT ak, bk, k FROM a JOIN b ON k IS NOT DISTINCT FROM k2
      ORDER BY ak, bk""",
    "q_lateral_join" -> """
      SELECT c.c_custkey, l.n_orders, l.max_price
      FROM customer c,
      LATERAL (SELECT count(*) AS n_orders,
                      max(o_totalprice) AS max_price
               FROM orders o WHERE o.o_custkey = c.c_custkey) l
      WHERE l.n_orders > 0
      ORDER BY c.c_custkey""",
    "q_exists_subquery" -> """
      SELECT c_custkey, c_name FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 100000)
        AND NOT EXISTS (SELECT 1 FROM orders o2
                        WHERE o2.o_custkey = c.c_custkey
                          AND o2.o_orderpriority = '1-URGENT')
      ORDER BY c_custkey""",
    "q_hof_arrays" -> """
      WITH g AS (SELECT l_orderkey,
                   list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
                 FROM lineitem GROUP BY 1)
      SELECT l_orderkey,
             CAST(len(qs) AS INT) AS n_items,
             CAST(len(list_filter(qs, q -> q > 25)) AS INT) AS n_big,
             CAST(list_sum(qs) AS BIGINT) AS total_qty,
             CAST(list_sum(list_transform(qs, q -> q * q)) AS BIGINT)
               AS sum_sq
      FROM g ORDER BY l_orderkey""",
    "q_json_extract" -> """
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS BIGINT) AS sum_k,
             min(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS min_k,
             max(CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS max_k
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q_zorder" -> """
      WITH e AS (SELECT event_id, user_id,
                   (epoch_us(ts) // 3600000000) & 65535 AS hr
                 FROM events),
      s1 AS (SELECT event_id, user_id, hr,
               (user_id & 65535) AS ax, (hr & 65535) AS bx FROM e),
      s2 AS (SELECT event_id, user_id, hr,
               ((ax | (ax << 8)) & 16711935) AS ax,
               ((bx | (bx << 8)) & 16711935) AS bx FROM s1),
      s3 AS (SELECT event_id, user_id, hr,
               ((ax | (ax << 4)) & 252645135) AS ax,
               ((bx | (bx << 4)) & 252645135) AS bx FROM s2),
      s4 AS (SELECT event_id, user_id, hr,
               ((ax | (ax << 2)) & 858993459) AS ax,
               ((bx | (bx << 2)) & 858993459) AS bx FROM s3),
      s5 AS (SELECT event_id, user_id, hr,
               ((ax | (ax << 1)) & 1431655765) AS ax,
               ((bx | (bx << 1)) & 1431655765) AS bx FROM s4)
      SELECT event_id, user_id, hr,
             CAST(ax | (bx << 1) AS BIGINT) AS z
      FROM s5 ORDER BY z, event_id""",
    "events_funnel" -> """
      WITH s AS (SELECT user_id, min(ts) AS signup_ts FROM events
                 WHERE event_type = 'signup' GROUP BY user_id),
      c AS (SELECT e.user_id, min(e.ts) AS click_ts
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'click' AND e.ts >= s.signup_ts
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
            GROUP BY e.user_id)
      SELECT s.user_id, s.signup_ts, c.click_ts, p.purchase_ts,
             CAST((CASE WHEN s.signup_ts IS NOT NULL THEN 1 ELSE 0 END)
                + (CASE WHEN c.click_ts IS NOT NULL THEN 1 ELSE 0 END)
                + (CASE WHEN p.purchase_ts IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS stage
      FROM s LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
      ORDER BY s.user_id""",
    "events_anomaly" -> """
      WITH b AS (SELECT event_id, user_id,
                   CAST(round(value * 10000) AS BIGINT) AS q
                 FROM events),
      a AS (SELECT user_id, count(*) AS n, sum(q) AS s,
                   sum(CAST(q AS HUGEINT) * q) AS qq
            FROM b GROUP BY user_id)
      SELECT event_id, b.user_id, q,
             (CAST(q AS HUGEINT) * n - s) * (CAST(q AS HUGEINT) * n - s)
               * 100 >
               225 * (CAST(n AS HUGEINT) * qq - CAST(s AS HUGEINT) * s)
               AS is_anomaly
      FROM b JOIN a USING (user_id) ORDER BY event_id""",
    // truncated EWMA, α=1/2 depth 8: explicit integer-weight lags,
    // floor-normalized over the weights actually present. Written in
    // DuckDB-version-stable primitives only: every operand is pinned
    // to BIGINT (no sum→HUGEINT leaking into the divide), and every
    // integer division — hour bucket and the final normalize alike —
    // is `(a - a % b) / b`: exact integers into a float divide whose
    // quotient is exactly representable, identical across engines and
    // versions (no `//`, whose result type/rounding has shifted
    // across DuckDB releases for mixed operands).
    "events_ewma" -> {
      val depth = 8
      val lagCols = (1 until depth)
        .map(j => s"lag(q, $j) OVER w AS q$j").mkString(", ")
      val wsum = (s"${1L << (depth - 1)} * q" +: (1 until depth)
        .map(j => s"coalesce(${1L << (depth - 1 - j)} * q$j, 0)"))
        .mkString(" + ")
      val wdiv = (s"${1L << (depth - 1)}" +: (1 until depth)
        .map(j =>
          s"CASE WHEN q$j IS NULL THEN 0 ELSE ${1L << (depth - 1 - j)} END"))
        .mkString(" + ")
      s"""
      WITH h AS (SELECT event_type,
                   CAST((epoch_us(ts) - (epoch_us(ts) % 3600000000))
                     / 3600000000 AS BIGINT)
                     AS hour,
                   CAST(sum(CAST(round(value * 10000) AS BIGINT))
                     AS BIGINT) AS q,
                   count(*) AS n
                 FROM events GROUP BY 1, 2),
      l AS (SELECT event_type, hour, n, q, $lagCols
            FROM h WINDOW w AS (PARTITION BY event_type ORDER BY hour)),
      f AS (SELECT event_type, hour, n, q,
              CAST($wsum AS BIGINT) AS ws, CAST($wdiv AS BIGINT) AS wd
            FROM l)
      SELECT event_type, hour, n, q,
             CAST((ws - (ws % wd)) / wd AS BIGINT) AS ewma_q
      FROM f ORDER BY event_type, hour"""
    },
    "events_ewma_hourly" -> """
      SELECT event_type,
             CAST((epoch_us(ts) - (epoch_us(ts) % 3600000000))
                     / 3600000000 AS BIGINT) AS hour,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT)
               AS q,
             count(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY event_type, hour""",
    "events_transitions" -> """
      WITH o AS (SELECT user_id, event_type AS prev_type,
                   lead(event_type) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS next_type
                 FROM events),
      p AS (SELECT prev_type, next_type, count(*) AS n FROM o
            WHERE next_type IS NOT NULL GROUP BY 1, 2),
      t AS (SELECT prev_type, sum(n) AS tot FROM p GROUP BY 1)
      SELECT p.prev_type, p.next_type, n,
             CAST((10000 * n) // tot AS BIGINT) AS p_bp
      FROM p JOIN t USING (prev_type)
      ORDER BY prev_type, next_type""",
    // both medians interpolate at worst to dyadic rationals — exact
    // doubles on both engines, so the flag comparison is deterministic
    "events_anomaly_mad" -> """
      WITH b AS (SELECT event_id, user_id,
                   CAST(round(value * 10000) AS BIGINT) AS q
                 FROM events),
      m AS (SELECT user_id, median(q) AS med FROM b GROUP BY 1),
      d AS (SELECT b.event_id, b.user_id, b.q,
              abs(b.q - m.med) AS adev
            FROM b JOIN m USING (user_id)),
      md AS (SELECT user_id, median(adev) AS mad FROM d GROUP BY 1)
      SELECT event_id, d.user_id, q, (adev * 10 > mad * 15) AS is_anomaly
      FROM d JOIN md USING (user_id) ORDER BY event_id""",
    "events_winsorize" -> """
      WITH b AS (SELECT event_id, event_type,
                   CAST(round(value * 10000) AS BIGINT) AS q
                 FROM events),
      r AS (SELECT *, row_number() OVER (PARTITION BY event_type
              ORDER BY q, event_id) AS rk,
              count(*) OVER (PARTITION BY event_type) AS n
            FROM b),
      bounds AS (SELECT event_type,
                   max(CASE WHEN rk = (n + 19) // 20 THEN q END) AS lo,
                   max(CASE WHEN rk = n + 1 - (n + 19) // 20 THEN q END)
                     AS hi
                 FROM r GROUP BY event_type)
      SELECT event_id, b.event_type, q,
             CASE WHEN q < lo THEN lo WHEN q > hi THEN hi
                  ELSE q END AS q_clip,
             (q < lo OR q > hi) AS clipped
      FROM b JOIN bounds USING (event_type) ORDER BY event_id""",
    "events_stream_attribution" -> """
      SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             epoch_us(p.ts) - epoch_us(c.ts) AS lag_us, p.value
      FROM events c JOIN events p ON c.user_id = p.user_id
        AND c.event_type = 'click' AND p.event_type = 'purchase'
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      ORDER BY click_id, purchase_id""",
    // NULLS FIRST matches Spark's ascending default (DuckDB defaults to
    // NULLS LAST) — the null purchase side of unmatched clicks must sort
    // identically or the row-order-sensitive hash diverges
    "events_stream_attribution_outer" -> """
      SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
             epoch_us(p.ts) - epoch_us(c.ts) AS lag_us, p.value
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      ORDER BY click_id, purchase_id NULLS FIRST""",
    // full outer adds the purchase-only rows: click_id is now nullable
    // too, so BOTH sort keys pin NULLS FIRST (Spark's asc default;
    // DuckDB defaults to NULLS LAST)
    "events_stream_attribution_full" -> """
      SELECT coalesce(c.user_id, p.user_id) AS user_id,
             c.event_id AS click_id, p.event_id AS purchase_id,
             epoch_us(p.ts) - epoch_us(c.ts) AS lag_us, p.value
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON c.user_id = p.user_id
        AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
      ORDER BY click_id NULLS FIRST, purchase_id NULLS FIRST""",
    // >= on the gap (session_window's [ts, ts+gap) semantics), where
    // events_sessionize uses >
    "events_session_window" -> sessionWindowSql,
    // streaming twin merges the same sessions across micro-batches
    "events_stream_session_window" -> sessionWindowSql,
    "q_window_dist" -> """
      SELECT c_custkey, c_mktsegment,
             ntile(4) OVER w AS quartile,
             percent_rank() OVER w AS pr,
             cume_dist() OVER w AS cd
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment
                   ORDER BY c_acctbal, c_custkey)
      ORDER BY c_custkey""",
    "events_sessionize" -> """
      WITH s AS (SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS brk
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      t AS (SELECT user_id, ts,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM s)
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events
      FROM t GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "multimodal_resize" -> """
      SELECT doc_id, width, height,
             CAST((width * 256) // greatest(width, height) AS INT) AS new_w,
             CAST((height * 256) // greatest(width, height) AS INT) AS new_h
      FROM (SELECT doc_id, CAST(16 + doc_id % 32 AS INT) AS width,
                   CAST(16 + (doc_id * 7) % 24 AS INT) AS height
            FROM documents)
      ORDER BY doc_id""",
    "multimodal_frames" -> """
      SELECT doc_id, CAST(i AS INT) AS frame_idx,
             CAST(i AS INT) * 40 AS pts_ms,
             (doc_id * 1000003 + CAST(i AS INT) * 7919) % 2147483647 AS frame_hash
      FROM (SELECT doc_id, octet_length(encode(coalesce(text, ''))) % 7 + 1 AS nf
            FROM documents), UNNEST(range(nf)) t(i)
      ORDER BY doc_id, frame_idx""",
    "q_cube" -> """
      SELECT n_name, c_mktsegment, count(*) AS n_cust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY CUBE (n_name, c_mktsegment)
      ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""",
    "q_grouping_sets" -> """
      SELECT n_name, c_mktsegment, count(*) AS n_cust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY GROUPING SETS ((n_name), (c_mktsegment), ())
      ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""",
    "q_intersect" -> """
      (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      INTERSECT
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      ORDER BY c_custkey""",
    "q_salted_join" -> """
      SELECT o_orderpriority,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "events_session_stats" -> """
      WITH s AS (SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS brk
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      t AS (SELECT user_id, ts,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM s),
      sess AS (SELECT user_id,
                 epoch_us(max(ts)) - epoch_us(min(ts)) AS dur_us,
                 count(*) AS n
               FROM t GROUP BY user_id, sid)
      SELECT user_id, count(*) AS n_sessions,
             CAST(sum(n) AS BIGINT) AS n_events,
             median(dur_us) AS median_dur_us,
             max(dur_us) AS max_dur_us
      FROM sess GROUP BY user_id ORDER BY user_id""",
    "q_range_join" -> """
      WITH s AS (SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS brk
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      t AS (SELECT user_id, ts,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM s),
      sess AS (SELECT user_id, min(ts) AS session_start,
                      max(ts) AS session_end
               FROM t GROUP BY user_id, sid)
      SELECT e.event_id, e.user_id, x.session_start
      FROM events e JOIN sess x ON e.user_id = x.user_id
        AND e.ts >= x.session_start AND e.ts <= x.session_end
      ORDER BY e.event_id""",
    "q_asof_join" -> """
      WITH ord AS (SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
                   FROM orders GROUP BY 1, 2)
      SELECT event_id, user_id, ts, o.o_orderkey, o.o_orderdate
      FROM events e ASOF LEFT JOIN ord o
           ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
      ORDER BY event_id""",
    "q_scalar_subquery" -> """
      SELECT c_custkey,
             (SELECT max(o_totalprice) FROM orders
              WHERE o_custkey = c_custkey) AS max_price
      FROM customer ORDER BY c_custkey""",
    "q_union_all" -> """
      SELECT c_custkey, count(*) AS n FROM (
        SELECT c_custkey FROM customer WHERE c_acctbal > 9000
        UNION ALL
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY') u
      GROUP BY c_custkey ORDER BY c_custkey""",
    "q_outer_join" -> """
      SELECT c_custkey, count(o_orderkey) AS n_big_orders,
             CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))),
                      CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS sum_big
      FROM customer LEFT JOIN (SELECT * FROM orders
                               WHERE o_totalprice > 350000) o
           ON c_custkey = o_custkey
      GROUP BY c_custkey ORDER BY c_custkey""",
    "text_bpe_tokens" -> """
      SELECT doc_id,
             len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_tokens
      FROM documents ORDER BY doc_id""",
    "events_stream_dedup" -> """
      SELECT event_type, count(DISTINCT event_id) AS n_unique
      FROM events GROUP BY event_type ORDER BY event_type""",
    "events_stream_fingerprint_dedup" -> s"""
      WITH RECURSIVE u AS (SELECT DISTINCT
          trim(regexp_replace(lower(coalesce(props, '')), '\\s+', ' ', 'g'))
            AS norm
        FROM events),
      ${sdbmCte("u", "norm", "0", "norm")}
      SELECT s.hash AS fingerprint, u.norm
      FROM u JOIN sdbm s ON s.sid = u.norm
      ORDER BY norm""",
    "events_stream_sessionize" -> """
      WITH s AS (SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS brk
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      t AS (SELECT user_id, ts,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM s)
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events
      FROM t GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "events_stream_type_profile" -> """
      SELECT user_id, count(DISTINCT event_type) AS n_types,
             count(*) AS n_events,
             string_agg(DISTINCT event_type, ',' ORDER BY event_type)
               AS types_csv
      FROM events GROUP BY user_id ORDER BY user_id""",
    // the warm-start cutover computes the identical sessions: batch
    // half + bootstrapped streaming half = the all-batch result
    "events_stream_sessionize_warm" -> """
      WITH s AS (SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS brk
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      t AS (SELECT user_id, ts,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM s)
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events
      FROM t GROUP BY user_id, sid ORDER BY user_id, session_start""",
    // the transformWithState twin computes the identical sessions —
    // one oracle, two stateful implementations
    "events_stream_sessionize_tws" -> """
      WITH s AS (SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS brk
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      t AS (SELECT user_id, ts,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM s)
      SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
             count(*) AS n_events
      FROM t GROUP BY user_id, sid ORDER BY user_id, session_start""",
    "multimodal_meta" -> """
      WITH m AS (SELECT doc_id, CAST(16 + doc_id % 32 AS INT) AS width,
                        CAST(16 + (doc_id * 7) % 24 AS INT) AS height,
                        CASE doc_id % 3 WHEN 0 THEN 'png'
                             WHEN 1 THEN 'bmp' ELSE 'gif' END AS format
                 FROM documents),
      px AS (SELECT doc_id,
                    CAST(sum((doc_id + xs.i + ys.i) % 256) AS BIGINT)
                      AS px_sum
             FROM m, UNNEST(range(width)) xs(i), UNNEST(range(height)) ys(i)
             GROUP BY doc_id)
      SELECT m.doc_id, width, height, format, px_sum
      FROM m JOIN px ON m.doc_id = px.doc_id
      ORDER BY m.doc_id""",
    "multimodal_phash" -> s"""
      WITH RECURSIVE $phashCteSql
      SELECT doc_id, width, height, ahash FROM ph ORDER BY doc_id""",
    "multimodal_phash_groups" -> s"""
      WITH RECURSIVE $phashCteSql
      SELECT ahash, count(*) AS n_docs, min(doc_id) AS min_doc
      FROM ph GROUP BY ahash HAVING count(*) >= 2
      ORDER BY ahash""",
    "docid_single" ->
      "SELECT CAST(doc_id AS BIGINT) AS id FROM documents ORDER BY id",
    "jsonl_documents" -> s"""
      SELECT doc_id,
             '{"doc_id":' || coalesce(CAST(doc_id AS VARCHAR), 'null') ||
             ',"source":' || CASE WHEN source IS NULL THEN 'null'
               ELSE '"' || ${jsonEscSql("source")} || '"' END ||
             ',"text":' || CASE WHEN text IS NULL THEN 'null'
               ELSE '"' || ${jsonEscSql("text")} || '"' END || '}' AS line
      FROM documents ORDER BY doc_id NULLS FIRST""",
    "jsonl_roundtrip" -> """
      SELECT doc_id, source, text FROM documents ORDER BY doc_id""",
    // the dirty corpus is composed FROM documents, so the audit row
    // (clean count, clean-id checksum, corrupt count) derives from it
    "jsonl_corrupt_audit" -> """
      SELECT count(*) AS n_clean,
             CAST(sum(doc_id) AS BIGINT) AS clean_id_sum,
             CAST(sum(CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_corrupt
      FROM documents""",
    "csv_roundtrip" -> """
      SELECT doc_id, source, text FROM documents ORDER BY doc_id""",
    "orc_roundtrip" -> """
      SELECT event_id, ts, user_id, event_type, value, props
      FROM events ORDER BY event_id""",
    "avro_roundtrip" -> """
      SELECT event_id, ts, user_id, event_type, value, props
      FROM events ORDER BY event_id""",
    "events_stream_foreach" -> """
      SELECT event_id, ts, user_id, event_type, value, props
      FROM events ORDER BY event_id""",
    "render_lineitem" -> """
      SELECT l_orderkey, l_linenumber,
             CAST(l_orderkey AS VARCHAR) AS r_orderkey,
             CAST(l_quantity AS VARCHAR) AS r_quantity,
             l_returnflag AS r_flag,
             strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS r_shipdate
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "render_arrays" -> """
      SELECT vec_id,
             array_to_string(list_transform(embedding,
               x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS VARCHAR)),
               ' ') AS r_embedding
      FROM embeddings ORDER BY vec_id""",
    "mem_markup_events" -> """
      SELECT event_id, props AS markup, FALSE AS is_mem
      FROM events ORDER BY event_id""",
    "mem_markup_matrix" -> """
      SELECT event_id,
             CASE e5 WHEN 0 THEN '<mem>' || u || ' ' || e || '</mem>'
                     WHEN 1 THEN '<mem>' || u || ' ' || e || '</mem>'
                     WHEN 2 THEN '<mem>' || u || '</mem><mem>' || e || ' 7</mem>'
                     WHEN 3 THEN '{"k":1}'
                     ELSE '[[1.5,' || u || ']]' END AS markup,
             e5 IN (0, 1, 2) AS is_mem
      FROM (SELECT event_id, event_id % 5 AS e5,
              CAST(user_id AS VARCHAR) AS u,
              CAST(event_id % 1000 AS VARCHAR) AS e
            FROM events)
      ORDER BY event_id""",
    "q_filter_project" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem WHERE l_quantity > 30 AND l_returnflag = 'R'
      ORDER BY l_orderkey, l_linenumber""",
    "q_topk" -> """
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q_in_range" -> """
      SELECT o_orderpriority, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_orderstatus IN ('O','F')
        AND o_orderdate >= TIMESTAMP '1995-01-01'
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q1_agg" -> """
      SELECT l_returnflag, l_linestatus,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
             count(*) AS count_order
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus""",
    "q_join_agg" -> """
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             count(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      GROUP BY n_name ORDER BY n_name""",
    "tpch_q3" -> """
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-01'
        AND l_shipdate  > TIMESTAMP '1998-06-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "tpch_q5" -> """
      SELECT n_name,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN supplier ON l_suppkey  = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "tpch_q8" -> """
      SELECT o_year, nation_rev_tc, total_rev_tc,
             (10000 * nation_rev_tc) // total_rev_tc AS share_bp
      FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(sum(CASE WHEN sn.n_name = 'NATION_7'
                             THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS nation_rev_tc,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_rev_tc
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region   ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
        GROUP BY 1) t
      ORDER BY o_year""",
    "tpch_q10" -> """
      SELECT c_custkey, c_name, c_acctbal, n_name,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1997-07-01'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "tpch_q7" -> """
      SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey  = c_custkey
      JOIN supplier ON l_suppkey  = s_suppkey
      JOIN nation cn ON c_nationkey = cn.n_nationkey
      JOIN nation sn ON s_nationkey = sn.n_nationkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
        AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2') OR
             (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
      GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""",
    "tpch_q9" -> """
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
      FROM lineitem
      JOIN part     ON l_partkey = p_partkey
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%'
      GROUP BY 1, 2 ORDER BY nation, o_year DESC""",
    "tpch_q12" -> """
      SELECT l_linestatus,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_linestatus ORDER BY l_linestatus""",
    "tpch_q14" -> """
      SELECT promo_rev_tc, total_rev_tc,
             (10000 * promo_rev_tc) // total_rev_tc AS promo_bp
      FROM (
        SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                             THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))
                             ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT) AS promo_rev_tc,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) * 10000 AS BIGINT) AS total_rev_tc
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate <  TIMESTAMP '1997-10-01') t""",
    "tpch_q17" -> """
      SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN (SELECT l_partkey AS ap_key,
                   sum(l_quantity) / count(l_quantity) AS avg_qty
            FROM lineitem GROUP BY 1) a ON l_partkey = ap_key
      WHERE p_brand = 'Brand#12' AND l_quantity < 0.2 * avg_qty""",
    "tpch_q18" -> """
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             total_qty
      FROM (SELECT l_orderkey AS bo_key,
                   CAST(sum(l_quantity) AS BIGINT) AS total_qty
            FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300) big
      JOIN orders   ON o_orderkey = bo_key
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q_window_rank" -> """
      SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders) t
      WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_window_range" -> """
      SELECT user_id, event_id,
             count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
               AS n_trailing_1h
      FROM events ORDER BY event_id""",
    "q_window_nav" -> """
      SELECT user_id, event_id,
             lag(event_id, 1) OVER w AS prev_id,
             lead(event_id, 1) OVER w AS next_id,
             first_value(event_id) OVER w AS first_id,
             CAST(ntile(4) OVER w AS BIGINT) AS quartile
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
      ORDER BY event_id""",
    "q_rollup" -> """
      SELECT n_name, c_mktsegment, count(*) AS n_cust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      GROUP BY ROLLUP (n_name, c_mktsegment)
      ORDER BY n_name NULLS FIRST, c_mktsegment NULLS FIRST""",
    "q_setops" -> """
      (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      EXCEPT
      (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      ORDER BY c_custkey""",
    "q_distinct_agg" -> """
      SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
             count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_map_funcs" -> """
      WITH c AS (SELECT user_id, event_type, count(*) AS n
                 FROM events GROUP BY 1, 2)
      SELECT user_id,
             count(*) AS n_types,
             coalesce(max(CASE WHEN event_type = 'click' THEN n END), 0)
               AS clicks,
             CAST(sum(CASE WHEN n >= 10 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_heavy,
             string_agg(event_type || ':' || n, ',' ORDER BY event_type)
               AS summary
      FROM c GROUP BY user_id ORDER BY user_id""",
    "q_percentiles" -> """
      SELECT o_orderpriority, count(*) AS n,
             quantile_cont(cents, 0.25) AS q1_cents,
             quantile_cont(cents, 0.5)  AS median_cents,
             quantile_cont(cents, 0.75) AS q3_cents
      FROM (SELECT o_orderpriority,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                AS cents
            FROM orders) t
      GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_window_ratio" -> """
      WITH c AS (SELECT l_orderkey, l_linenumber,
              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                AS cents
            FROM lineitem)
      SELECT l_orderkey, l_linenumber, cents,
             CAST((10000 * cents) //
               sum(cents) OVER (PARTITION BY l_orderkey) AS BIGINT)
               AS share_bp
      FROM c ORDER BY l_orderkey, l_linenumber""",
    "profile_benford" -> """
      WITH d AS (SELECT CAST(substr(CAST(CAST(CAST(o_totalprice
                   AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1)
                   AS INT) AS digit
                 FROM orders),
      g AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
      t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
      SELECT digit, n, CAST((10000 * n) // total AS BIGINT) AS obs_bp,
             CAST(CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761
               WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 792
               WHEN 6 THEN 669 WHEN 7 THEN 580 WHEN 8 THEN 512
               WHEN 9 THEN 458 ELSE 0 END AS BIGINT) AS exp_bp
      FROM g, t ORDER BY digit""",
    "q_window_ignore_nulls" -> """
      SELECT event_id, user_id,
             CASE WHEN event_type = 'purchase' THEN value END AS obs,
             last_value(CASE WHEN event_type = 'purchase' THEN value END
                 IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled,
             first_value(CASE WHEN event_type = 'purchase' THEN value END
                 IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                       AND UNBOUNDED FOLLOWING)
               AS first_obs
      FROM events ORDER BY event_id""",
    "q_mode" -> """
      WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS n
                 FROM lineitem GROUP BY 1, 2)
      SELECT l_returnflag, l_quantity AS mode_qty, n
      FROM (SELECT *, row_number() OVER (PARTITION BY l_returnflag
                        ORDER BY n DESC, l_quantity ASC) AS rk
            FROM c) t
      WHERE rk = 1 ORDER BY l_returnflag""",
    "q_stats_agg" -> """
      WITH q AS (SELECT l_returnflag,
              CAST(CAST(l_quantity AS DECIMAL(18,4)) * 10000 AS BIGINT)
                AS x,
              CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * 10000 AS BIGINT)
                AS y
            FROM lineitem),
      s AS (SELECT l_returnflag, count(*) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              sum(CAST(x AS HUGEINT) * y) AS sxy,
              sum(CAST(x AS HUGEINT) * x) AS sxx,
              sum(CAST(y AS HUGEINT) * y) AS syy
            FROM q GROUP BY 1),
      r AS (SELECT l_returnflag, n, sx, sy,
              CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
              CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
              CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS deny,
              CAST(sy AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sxy AS numi
            FROM s)
      SELECT l_returnflag, n, sx, sy,
             CAST(CAST(num AS VARCHAR) AS DOUBLE) /
               CAST(CAST(den AS VARCHAR) AS DOUBLE) AS slope,
             CAST(CAST(numi AS VARCHAR) AS DOUBLE) /
               CAST(CAST(den AS VARCHAR) AS DOUBLE) AS intercept,
             CAST(CAST(num AS VARCHAR) AS DOUBLE) *
               CAST(CAST(num AS VARCHAR) AS DOUBLE) /
               (CAST(CAST(den AS VARCHAR) AS DOUBLE) *
                CAST(CAST(deny AS VARCHAR) AS DOUBLE)) AS r2
      FROM r ORDER BY l_returnflag""",
    "events_retention" -> """
      WITH wk AS (SELECT user_id, epoch_us(ts) // 604800000000 AS w
                  FROM events),
      fw AS (SELECT user_id, min(w) AS cohort_week FROM wk GROUP BY 1),
      cells AS (SELECT cohort_week, w - cohort_week AS week_offset,
                       count(DISTINCT user_id) AS n_users
                FROM wk JOIN fw USING (user_id) GROUP BY 1, 2),
      base AS (SELECT cohort_week, n_users AS cohort_size
               FROM cells WHERE week_offset = 0)
      SELECT c.cohort_week, c.week_offset, c.n_users,
             (10000 * c.n_users) // b.cohort_size AS pct_bp
      FROM cells c JOIN base b USING (cohort_week)
      ORDER BY cohort_week, week_offset""",
    "events_gapfill" -> """
      WITH daily AS (SELECT event_type,
                       epoch_us(ts) // 86400000000 AS day,
                       count(*) AS n,
                       sum(CAST(value AS DECIMAL(18,4))) AS day_sum
                     FROM events GROUP BY 1, 2),
      span AS (SELECT event_type, min(day) AS d0, max(day) AS d1
               FROM daily GROUP BY 1),
      spine AS (SELECT event_type, d0 + u.i AS day
                FROM span, UNNEST(range(0, d1 - d0 + 1)) AS u(i))
      SELECT s.event_type, s.day, coalesce(d.n, 0) AS n,
             CAST(last_value(d.day_sum IGNORE NULLS) OVER (
                 PARTITION BY s.event_type ORDER BY s.day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS DOUBLE) AS filled
      FROM spine s LEFT JOIN daily d
        ON d.event_type = s.event_type AND d.day = s.day
      ORDER BY s.event_type, s.day""",
    "io_skipping" -> """
      SELECT l_orderkey, l_linenumber, l_quantity
      FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 2000
      ORDER BY l_orderkey, l_linenumber""",
    "io_compaction" -> """
      SELECT 64 AS files_before,
             (count(*) + 1999) // 2000 AS files_after,
             count(*) AS n_rows,
             count(DISTINCT event_id) AS nd_ids,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events""",
    "io_schema_evolution" -> """
      SELECT o_orderkey, o_totalprice,
             CASE WHEN o_orderkey % 2 = 1 THEN o_orderpriority END
               AS o_orderpriority,
             CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 2 END AS g
      FROM orders ORDER BY o_orderkey""",
    "graph_pagerank" -> s"""
      WITH e0 AS (SELECT DISTINCT o_custkey AS src,
                    100000 + l_suppkey AS dst
                  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      e2 AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      nodes AS (SELECT DISTINCT src AS node FROM e2),
      cnt AS (SELECT count(*) AS n FROM nodes),
      base AS (SELECT ((1000000000000 // n) * 15) // 100 AS b,
                      1000000000000 // n AS init FROM cnt),
      deg AS (SELECT src, count(*) AS deg FROM e2 GROUP BY src),
      r0 AS (SELECT node, init AS rank_micro FROM nodes CROSS JOIN base),
      ${Seq(("r0", "r1"), ("r1", "r2"), ("r2", "r3")).map {
        case (prev, nxt) => s"""
      $nxt AS (SELECT nodes.node,
          b + (coalesce(s.sc, 0) * 85) // 100 AS rank_micro
        FROM nodes CROSS JOIN base
        LEFT JOIN (SELECT e2.dst AS node,
                     sum(r.rank_micro // deg.deg) AS sc
                   FROM e2 JOIN deg USING (src)
                        JOIN $prev r ON r.node = e2.src
                   GROUP BY e2.dst) s USING (node))"""
      }.mkString(",")}
      SELECT node, CAST(rank_micro AS BIGINT) AS rank_micro
      FROM r3 ORDER BY node""",
    "graph_triangles" -> """
      WITH it AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                  FROM lineitem),
      e AS (SELECT DISTINCT i.p AS a, j.p AS b
            FROM it i JOIN it j ON i.o = j.o AND i.p < j.p),
      d AS (SELECT node, count(*) AS deg
            FROM (SELECT a AS node FROM e
                  UNION ALL SELECT b FROM e) n GROUP BY node),
      tr AS (SELECT e1.a AS n1, e1.b AS n2, e2.b AS n3
             FROM e e1
             JOIN e e2 ON e2.a = e1.b
             JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      pn AS (SELECT node, count(*) AS triangles
             FROM (SELECT n1 AS node FROM tr
                   UNION ALL SELECT n2 FROM tr
                   UNION ALL SELECT n3 FROM tr) x GROUP BY node)
      SELECT d.node, d.deg,
             COALESCE(pn.triangles, 0) AS triangles,
             CASE WHEN d.deg > 1
                  THEN (2000000 * COALESCE(pn.triangles, 0))
                         // (d.deg * (d.deg - 1))
                  ELSE 0 END AS cc_micro
      FROM d LEFT JOIN pn ON d.node = pn.node
      ORDER BY d.node""",
    // 2 synchronous LPA rounds unrolled; argmax(count) with min-label
    // ties via row_number — must mirror Graph.labelPropagation exactly
    "graph_communities" -> s"""
      $lpaCteSql
      SELECT node, label FROM l2 ORDER BY node""",
    "text_pmi" -> """
      WITH t AS (SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS ws
                 FROM documents),
      bg AS (SELECT ws[CAST(i AS INT)] AS w1,
                    ws[CAST(i AS INT) + 1] AS w2
             FROM t, unnest(range(1, len(ws))) AS r(i)),
      pc AS (SELECT w1, w2, count(*) AS n_ab FROM bg GROUP BY 1, 2),
      fc AS (SELECT w1, count(*) AS n_a FROM bg GROUP BY 1),
      sc AS (SELECT w2, count(*) AS n_b FROM bg GROUP BY 1),
      tot AS (SELECT count(*) AS n_total FROM bg)
      SELECT w1, w2, n_ab, n_a, n_b,
             (n_ab * n_total * 1000000) // (n_a * n_b) AS lift_micro
      FROM pc JOIN fc USING (w1) JOIN sc USING (w2), tot
      WHERE n_ab >= 3
      ORDER BY lift_micro DESC, w1, w2 LIMIT 50""",
    "dq_checks" -> """
      WITH rl AS (SELECT
          CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS v_notnull,
          CAST(sum(CASE WHEN n_chars IS NULL OR n_chars < 1
                         OR n_chars > 500 THEN 1 ELSE 0 END) AS BIGINT)
            AS v_range,
          CAST(sum(CASE WHEN source IS NULL
                         OR NOT regexp_matches(source, '^src[0-9]+$')
                        THEN 1 ELSE 0 END) AS BIGINT) AS v_match,
          CAST(sum(CASE WHEN lang IS NULL
                         OR lang NOT IN ('en','de','fr','es')
                        THEN 1 ELSE 0 END) AS BIGINT) AS v_set,
          CAST(sum(CASE WHEN length(text) = n_chars THEN 0 ELSE 1 END)
            AS BIGINT) AS v_pred
        FROM documents),
      u_id AS (SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS v
               FROM (SELECT count(*) AS n FROM documents
                     GROUP BY doc_id)),
      u_text AS (SELECT CAST(coalesce(sum(n - 1), 0) AS BIGINT) AS v
                 FROM (SELECT count(*) AS n FROM documents
                       GROUP BY text)),
      fk_o AS (SELECT CAST(count(*) AS BIGINT) AS v FROM orders
               WHERE o_custkey IS NULL OR NOT EXISTS
                 (SELECT 1 FROM customer WHERE c_custkey = o_custkey)),
      fk_e AS (SELECT CAST(count(*) AS BIGINT) AS v FROM events
               WHERE user_id IS NULL OR NOT EXISTS
                 (SELECT 1 FROM customer WHERE c_custkey = user_id)),
      rep AS (
        SELECT 'not_null' AS "check", 'text' AS detail,
               v_notnull AS violations FROM rl
        UNION ALL SELECT 'in_range', 'n_chars[1.0,500.0]', v_range FROM rl
        UNION ALL SELECT 'matches', 'source', v_match FROM rl
        UNION ALL SELECT 'in_set', 'lang', v_set FROM rl
        UNION ALL SELECT 'predicate', 'len_eq_n_chars', v_pred FROM rl
        UNION ALL SELECT 'unique', 'doc_id', v FROM u_id
        UNION ALL SELECT 'unique', 'text', v FROM u_text
        UNION ALL SELECT 'ref_integrity', 'o_custkey->c_custkey', v
          FROM fk_o
        UNION ALL SELECT 'ref_integrity', 'user_id->c_custkey', v
          FROM fk_e)
      SELECT "check", detail, violations, violations = 0 AS passed
      FROM rep ORDER BY "check", detail""",
    "dedup_jaccard_allpairs" -> """
      WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 500),
      g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS g
            FROM d, UNNEST(range(1, length(text) - 1)) AS t(i)),
      p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
            FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
            GROUP BY 1, 2),
      n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY doc_id)
      SELECT id_a, id_b, shared, na.ng AS n_a, nb.ng AS n_b
      FROM p JOIN n na ON na.doc_id = id_a JOIN n nb ON nb.doc_id = id_b
      WHERE CAST(shared AS DOUBLE) / (na.ng + nb.ng - shared) >= 0.8
      ORDER BY id_a, id_b""",
    "q_explode_outer" -> """
      SELECT o_orderkey, CAST(l.l_quantity AS BIGINT) AS big_qty
      FROM orders o LEFT JOIN
        (SELECT l_orderkey, l_quantity FROM lineitem
         WHERE l_quantity > 45) l
        ON l.l_orderkey = o.o_orderkey
      ORDER BY o_orderkey, big_qty NULLS FIRST""",
    "q_union_by_name" -> """
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_mktsegment = 'BUILDING'
      UNION ALL
      SELECT c_custkey, c_name, NULL FROM customer
      WHERE c_mktsegment = 'AUTOMOBILE'
      ORDER BY c_custkey""",
    "q_try_arith" -> """
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_linenumber = 1 THEN NULL
                  ELSE l_extendedprice / (l_linenumber - 1) END
               AS per_prior,
             CASE WHEN CAST(l_quantity AS BIGINT) = 1
                  THEN 9223372036854775807 ELSE NULL END
               AS overflow_null
      FROM lineitem ORDER BY l_orderkey, l_linenumber""",
    "q_bitwise_agg" -> """
      SELECT event_type,
             bit_and(user_id) AS b_and, bit_or(user_id) AS b_or,
             bit_xor(user_id) AS b_xor,
             CAST(sum(bit_count(user_id)) AS BIGINT) AS pop_sum
      FROM events GROUP BY event_type ORDER BY event_type""",
    "q_array_setops" -> """
      WITH s AS (SELECT l_returnflag,
              coalesce(list_sort(list_distinct(
                list(CAST(l_quantity AS BIGINT))
                  FILTER (WHERE l_linestatus = 'O'))), []) AS qo,
              coalesce(list_sort(list_distinct(
                list(CAST(l_quantity AS BIGINT))
                  FILTER (WHERE l_linestatus = 'F'))), []) AS qf
            FROM lineitem GROUP BY 1)
      SELECT l_returnflag,
             len(qo) AS n_o, len(qf) AS n_f,
             coalesce(array_to_string(list_sort(list_intersect(qo, qf)),
               ','), '') AS inter_s,
             coalesce(array_to_string(list_sort(list_distinct(qo || qf)),
               ','), '') AS union_s,
             coalesce(array_to_string(list_sort(list_filter(qo,
               x -> NOT list_contains(qf, x))), ','), '') AS except_s
      FROM s ORDER BY l_returnflag""",
    "q_string_funcs" -> """
      SELECT p_partkey,
             translate(p_name, 'aeiou', 'AEIOU') AS tr,
             lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded,
             reverse(p_brand) AS rev,
             strpos(p_type, 'a') AS pos_a,
             split_part(p_type, ' ', 1) AS first_word
      FROM part ORDER BY p_partkey""",
    "q_ivm_agg" -> """
      WITH o AS (SELECT o_orderkey, o_custkey,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                AS cents
            FROM orders),
      survivors AS (
        SELECT o_custkey, cents FROM o WHERE o_orderkey % 10 <> 0
        UNION ALL
        SELECT o_custkey, cents + 1 FROM o WHERE o_orderkey % 7 = 0)
      SELECT o_custkey, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s
      FROM survivors GROUP BY o_custkey ORDER BY o_custkey""",
    "ivm_stream" -> """
      WITH o AS (SELECT o_orderkey, o_custkey,
              CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                AS cents
            FROM orders),
      survivors AS (
        SELECT o_custkey, cents FROM o WHERE o_orderkey % 10 <> 0
        UNION ALL
        SELECT o_custkey, cents + 1 FROM o WHERE o_orderkey % 7 = 0)
      SELECT o_custkey, count(*) AS n, CAST(sum(cents) AS BIGINT) AS s
      FROM survivors GROUP BY o_custkey ORDER BY o_custkey""",
    "text_winnow_fp" -> s"""
      WITH $winnowCteSql
      SELECT doc_id, pos, gram FROM fp
      ORDER BY doc_id, pos, gram""",
    "dedup_winnow_pairs" -> s"""
      WITH $winnowCteSql,
      fpd AS (SELECT DISTINCT doc_id, gram FROM fp),
      rare AS (SELECT gram FROM fpd GROUP BY gram
               HAVING count(*) <= 20),
      k AS (SELECT fpd.doc_id, fpd.gram FROM fpd JOIN rare USING (gram))
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
      FROM k a JOIN k b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 8
      ORDER BY id_a, id_b""",
    "q_anti_join" -> """
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      ORDER BY c_custkey""",
    "q_semi_join" -> """
      SELECT c_custkey FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      ORDER BY c_custkey""",
    "q_scalar_funcs" -> """
      SELECT p_partkey, upper(p_brand) AS brand_u, length(p_name) AS name_len,
             substring(p_type, 1, 5) AS type5,
             concat_ws('-', p_brand, p_type) AS bt,
             CAST(floor(p_retailprice) AS BIGINT) AS price_fl,
             p_partkey % 7 AS pk_mod
      FROM part ORDER BY p_partkey""",
    "q_date_funcs" -> """
      SELECT year(o_orderdate) AS y, month(o_orderdate) AS m, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY 1, 2 ORDER BY y, m""",
    "q_case_bucket" -> """
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN 'neg'
                  WHEN c_acctbal < 3000 THEN 'low'
                  WHEN c_acctbal < 7000 THEN 'mid'
                  ELSE 'high' END AS bucket
      FROM customer ORDER BY c_custkey""",
    "q_pivot" -> """
      SELECT user_id,
             count(*) FILTER (event_type = 'click') AS click,
             count(*) FILTER (event_type = 'error') AS error,
             count(*) FILTER (event_type = 'purchase') AS purchase,
             count(*) FILTER (event_type = 'signup') AS signup,
             count(*) FILTER (event_type = 'view') AS view
      FROM events GROUP BY user_id ORDER BY user_id""",
    "q_unpivot" -> """
      SELECT c_custkey, 'c_acctbal' AS metric,
             CAST(c_acctbal AS DOUBLE) AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'c_nationkey' AS metric,
             CAST(c_nationkey AS DOUBLE) AS val FROM customer
      ORDER BY c_custkey, metric""",
    // exact-integer twin of the WeightedMean Aggregator: identical
    // quantization (round half-up of price*100 — positive values, both
    // engines agree), long sums, one final double division in the same
    // operation order as Udafs.WeightedMean.finish
    "q_udaf" -> """
      SELECT l_returnflag,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                      * CAST(l_quantity AS BIGINT)) AS DOUBLE)
               / CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)
               / 100.0 AS wmean_price,
             count(*) AS n
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    // stride = 120 - 30 = 90; n_chunks = ceil((len - overlap)/stride),
    // min 1 — the same closed form the generator and TextStats.chunk use
    "q_udtf" -> """
      WITH c AS (SELECT doc_id, text,
          greatest(1, (length(text) - 30 + 89) // 90) AS n_chunks
        FROM documents)
      SELECT doc_id, i AS chunk_id,
             substr(text, CAST(i * 90 + 1 AS INT), 120) AS chunk
      FROM c, UNNEST(range(0, n_chunks)) AS t(i)
      ORDER BY doc_id, chunk_id""",
    "q_listagg" -> """
      SELECT n_regionkey,
             string_agg(n_name, ',' ORDER BY n_name) AS names
      FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""",
    "q_recursive_cte" -> """
      WITH RECURSIVE e AS (
        SELECT c_custkey AS id, c_custkey // 10 AS parent FROM customer),
      walk(id, root, depth) AS (
        SELECT id, id, 0 FROM e WHERE id < 10
        UNION ALL
        SELECT e.id, w.root, w.depth + 1
        FROM e JOIN walk w ON e.parent = w.id
        WHERE e.id >= 10)
      SELECT id, root, depth FROM walk ORDER BY id""",
    // DuckDB groups by lower() — same partition as Spark's UTF8_LCASE
    // comparison on this ASCII domain; both emit the normalized key
    "q_collation" -> """
      SELECT lower(k) AS etype, count(*) AS n FROM (
        SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type)
                    ELSE event_type END AS k
        FROM events) t GROUP BY lower(k) ORDER BY etype""",
    // DuckDB's JSON path functions are the oracle twin of Spark's
    // VARIANT extraction; both engines see the identical composed doc
    "q_variant" -> """
      WITH j AS (SELECT event_id,
          concat('{"meta":{"type":"', event_type, '","uid":', user_id,
                 '},"payload":', coalesce(props, '{}'), '}') AS v FROM events)
      SELECT event_id,
             json_extract_string(v, '$.meta.type') AS etype,
             CAST(json_extract(v, '$.meta.uid') AS BIGINT) AS uid,
             CAST(json_extract(v, '$.payload.k') AS BIGINT) AS k,
             CAST(json_extract(v, '$.payload.missing') AS BIGINT) AS missing
      FROM j ORDER BY event_id""",
    "q_variant_agg" -> """
      WITH j AS (SELECT
          concat('{"meta":{"type":"', event_type, '","uid":', user_id,
                 '},"payload":', coalesce(props, '{}'), '}') AS v FROM events)
      SELECT json_extract_string(v, '$.meta.type') AS etype,
             CAST(sum(CAST(json_extract(v, '$.payload.k') AS BIGINT))
               AS BIGINT) AS k_sum,
             count(*) AS n
      FROM j GROUP BY 1 ORDER BY etype""",
    // chr(769)/chr(776) are the combining acute/diaeresis — DuckDB's
    // utf8proc implements the same UAX #15 tables as java.text.Normalizer.
    // (no line may START with || — oracleSql's stripMargin eats a
    // leading pipe)
    "text_normalize" -> """
      SELECT doc_id,
             nfc_normalize(concat(text, ' cafe', chr(769), ' No', chr(776),
               'el éøñüç')) AS nfc_text,
             strip_accents(concat(text, ' cafe', chr(769), ' No', chr(776),
               'el éøñüç')) AS plain_text
      FROM documents ORDER BY doc_id""",
    "xml_read_roundtrip" -> """
      SELECT doc_id AS id, CAST(doc_id AS VARCHAR) AS doc_id, lang,
             source, CAST(n_chars AS VARCHAR) AS n_chars
      FROM documents ORDER BY id""",
    "xml_dsv2_source" -> """
      SELECT doc_id AS id, CAST(doc_id AS VARCHAR) AS doc_id, lang,
             source, CAST(n_chars AS VARCHAR) AS n_chars
      FROM documents ORDER BY id""",
    "xml_parse_roundtrip" -> """
      SELECT doc_id AS id, doc_id, text, lang, source, n_chars
      FROM documents ORDER BY id""",
    "xml_dsv2_count" -> """
      SELECT count(*) AS n_docs, TRUE AS agg_pushed FROM documents""",
    "corpus_manifest" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0", "text")}
      SELECT d.source, count(*) AS n_docs,
             CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
             bit_xor(s.hash) AS content_fp
      FROM documents d JOIN sdbm s ON s.sid = d.doc_id
      GROUP BY d.source ORDER BY d.source""",
    // the composed hygiene chain, stage twins spliced end to end:
    // html-clean + scrub over NFC text -> quality reasons over the
    // REDACTED text -> fingerprint-dedup (sdbm of the normalized
    // text, min doc_id wins) -> span removal over the deduped set ->
    // hash split -> per-split manifest. Three sdbm instantiations
    // (content fingerprint, split key, manifest fingerprint) under
    // distinct CTE prefixes.
    "corpus_pipeline" -> s"""
      WITH RECURSIVE
      clean AS (SELECT doc_id, source,
                  ${htmlCleanSql("nfc_normalize(text)")} AS t0
                FROM documents),
      pii AS (SELECT doc_id, source, t0 AS t FROM clean),
      ${scrubChainSql("doc_id, source")},
      red AS (SELECT doc_id, source, t AS text
              FROM s${Scrub.DefaultRules.size}),
      ${qualityCtesSql("red")},
      kept AS (SELECT rd.doc_id, rd.source, rd.text
               FROM red rd JOIN r ON r.doc_id = rd.doc_id
               WHERE r.reason = 'ok'),
      ${sdbmCte("kept", "doc_id", "0",
        "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))", "fph")},
      win AS (SELECT min(sid) AS doc_id FROM fph GROUP BY hash),
      ded AS (SELECT k.doc_id, k.source, k.text
              FROM kept k JOIN win ON win.doc_id = k.doc_id),
      ${spanCteSqlOver("ded")},
      keepseg AS (
        SELECT doc_id, s, e FROM (
          SELECT doc_id,
                 coalesce(lag(span_end) OVER
                   (PARTITION BY doc_id ORDER BY span_start), 0) + 1 AS s,
                 span_start - 1 AS e
          FROM spans) WHERE s <= e
        UNION ALL
        SELECT sp.doc_id, sp.mx + 1 AS s, CAST(len(dd.text) AS BIGINT) AS e
        FROM (SELECT doc_id, max(span_end) AS mx FROM spans
              GROUP BY doc_id) sp
        JOIN ded dd ON dd.doc_id = sp.doc_id
        WHERE sp.mx + 1 <= len(dd.text)),
      scrubbed AS (SELECT a.doc_id,
                  coalesce(string_agg(
                    substr(dd.text, CAST(k.s AS INT),
                           CAST(k.e - k.s + 1 AS INT)),
                    '' ORDER BY k.s), '') AS clean_text
                FROM (SELECT DISTINCT doc_id FROM spans) a
                JOIN ded dd ON dd.doc_id = a.doc_id
                LEFT JOIN keepseg k ON k.doc_id = a.doc_id
                GROUP BY a.doc_id),
      fin AS (SELECT dd.doc_id, dd.source,
                coalesce(sc.clean_text, dd.text) AS text
              FROM ded dd LEFT JOIN scrubbed sc ON sc.doc_id = dd.doc_id),
      ${sdbmCte("documents", "doc_id", "0", "CAST(doc_id AS VARCHAR)",
        "sph")},
      assigned AS (SELECT f.doc_id, f.source, f.text,
            CASE WHEN ${bucketSql("sph.hash")} < 80 THEN 'train'
                 WHEN ${bucketSql("sph.hash")} < 90 THEN 'val'
                 ELSE 'test' END AS split
          FROM fin f JOIN sph ON sph.sid = f.doc_id),
      ${sdbmCte("assigned", "doc_id", "0", "text", "mfp")}
      SELECT a.split, count(*) AS n_docs,
             CAST(sum(len(a.text)) AS BIGINT) AS n_chars,
             bit_xor(m.hash) AS content_fp
      FROM assigned a JOIN mfp m ON m.sid = a.doc_id
      GROUP BY a.split ORDER BY a.split""",
    // the fixture file is written in doc_id order (verified), so the
    // physical row index equals the doc_id rank
    "io_provenance" -> """
      SELECT doc_id, 'documents.parquet' AS file_name,
             row_number() OVER (ORDER BY doc_id) - 1 AS row_idx
      FROM documents ORDER BY doc_id""",
    "io_partitioned" -> """
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events
      WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-14'
      GROUP BY event_type ORDER BY event_type""",
    // exact twin of the sketch-then-recount pipeline: the MG guarantee
    // (every key with freq > n/201 survives any merge tree) makes the
    // candidate superset lossless at the 0.5% threshold, so the
    // recounted output equals the plain GROUP BY / HAVING
    "profile_heavy_sketch" -> """
      SELECT user_id, count(*) AS n_rows FROM events GROUP BY user_id
      HAVING count(*) * 1000 >= (SELECT count(*) FROM events) * 5
      ORDER BY user_id""",
    // depth-capped recursive BFS; UNION (distinct) bounds the
    // recursion, min(d) per node = the hop distance
    "graph_bfs_levels" -> """
      WITH RECURSIVE e0 AS (SELECT DISTINCT o_custkey AS src,
                              100000 + l_suppkey AS dst
                            FROM orders
                            JOIN lineitem ON l_orderkey = o_orderkey),
      e2 AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      s AS (SELECT min(src) AS s0 FROM e2),
      bfs(node, d) AS (
        SELECT s0, 0 FROM s
        UNION
        SELECT e2.dst, bfs.d + 1 FROM bfs
        JOIN e2 ON e2.src = bfs.node WHERE bfs.d < 3)
      SELECT node, CAST(min(d) AS BIGINT) AS hop
      FROM bfs GROUP BY node ORDER BY node""",
    "basket_pairs" -> """
      WITH it AS (SELECT DISTINCT l_orderkey AS basket,
                    l_partkey AS item FROM lineitem),
      nb AS (SELECT count(DISTINCT basket) AS n_baskets FROM it),
      sup AS (SELECT item, count(*) AS n_i FROM it
              GROUP BY 1 HAVING count(*) >= 5),
      pr AS (SELECT it.basket, it.item, sup.n_i
             FROM it JOIN sup USING (item)),
      pairs AS (SELECT i.item AS p1, j.item AS p2,
                  i.n_i AS n_a, j.n_i AS n_b, count(*) AS n_ab
                FROM pr i JOIN pr j
                  ON i.basket = j.basket AND i.item < j.item
                GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2)
      SELECT p1, p2, n_ab, n_a, n_b,
             CAST((1000000 * CAST(n_ab AS HUGEINT) * n_baskets)
               // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS lift_micro,
             CAST((1000000 * CAST(n_ab AS HUGEINT) * n_ab)
               // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT) AS cos2_micro
      FROM pairs, nb
      ORDER BY n_ab DESC, p1, p2 LIMIT 100""",
    "basket_item_sim" -> """
      WITH it AS (SELECT DISTINCT l_orderkey AS basket,
                    l_partkey AS item FROM lineitem),
      sup AS (SELECT item, count(*) AS n_i FROM it
              GROUP BY 1 HAVING count(*) >= 5),
      pr AS (SELECT it.basket, it.item, sup.n_i
             FROM it JOIN sup USING (item)),
      pairs AS (SELECT i.item AS p1, j.item AS p2,
                  i.n_i AS n_a, j.n_i AS n_b, count(*) AS n_ab
                FROM pr i JOIN pr j
                  ON i.basket = j.basket AND i.item < j.item
                GROUP BY 1, 2, 3, 4 HAVING count(*) >= 2),
      scored AS (SELECT p1, p2, n_a, n_b, n_ab,
                   CAST((1000000 * CAST(n_ab AS HUGEINT) * n_ab)
                     // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
                     AS cos2_micro
                 FROM pairs),
      sym AS (SELECT p1 AS item, p2 AS neighbor, n_ab, cos2_micro
                FROM scored
              UNION ALL
              SELECT p2, p1, n_ab, cos2_micro FROM scored),
      rk AS (SELECT item, neighbor, n_ab, cos2_micro,
               CAST(row_number() OVER (PARTITION BY item
                 ORDER BY cos2_micro DESC, neighbor) AS INT) AS rk
             FROM sym)
      SELECT item, rk, neighbor, n_ab, cos2_micro
      FROM rk WHERE rk <= 3 ORDER BY item, rk""",
    // n-scaled centering (y = n·x − Σx) keeps the ACF ratio exact
    // integer arithmetic; HUGEINT mirrors the DECIMAL(38,0) sums
    "events_acf" -> """
      WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                   count(*) AS x FROM events GROUP BY 1),
      st AS (SELECT count(*) AS n, sum(x) AS sx FROM d),
      y AS (SELECT row_number() OVER (ORDER BY day) AS i,
              n * x - sx AS y FROM d, st),
      den AS (SELECT sum(CAST(y AS HUGEINT) * y) AS dd FROM y),
      lags AS (SELECT CAST(l AS INT) AS lag
               FROM unnest([1, 2, 3, 4, 5, 6, 7]) AS t(l))
      SELECT lag,
             CAST((1000000 * sum(CAST(a.y AS HUGEINT) * b.y)) // dd
               AS BIGINT) AS acf_micro
      FROM lags JOIN y a ON true JOIN y b ON b.i = a.i - lag, den
      GROUP BY lag, dd ORDER BY lag""",
    // prefix-sum closed form of the recursive CUSUM: S_t =
    // P_t − min(0, min_{j≤t} P_j) (mirror with max for the down side)
    "events_cusum" -> """
      WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                   count(*) AS x FROM events GROUP BY 1),
      st AS (SELECT count(*) AS n, sum(x) AS sx FROM d),
      p AS (SELECT day, x,
              sum(n * x - sx) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
            FROM d, st)
      SELECT day, x,
             CAST(p - least(0, min(p) OVER w) AS BIGINT) AS cusum_up,
             CAST(greatest(0, max(p) OVER w) - p AS BIGINT) AS cusum_down
      FROM p WINDOW w AS (ORDER BY day
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ORDER BY day""",
    // denominator-cleared Welch t²; HUGEINT → VARCHAR → DOUBLE is
    // correctly rounded like Spark's BigDecimal path (q_stats_agg)
    "q_welch_ttest" -> """
      WITH q AS (SELECT event_type,
              CAST(round(value * 100) AS BIGINT) AS x FROM events),
      st AS (SELECT event_type, count(*) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               sum(CAST(x AS HUGEINT) * x) AS qx
             FROM q GROUP BY 1),
      p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
              a.n AS n_a, b.n AS n_b,
              CAST(a.sx AS HUGEINT) * b.n
                - CAST(b.sx AS HUGEINT) * a.n AS aa,
              CAST(a.n AS HUGEINT) * a.qx
                - CAST(a.sx AS HUGEINT) * a.sx AS bb,
              CAST(b.n AS HUGEINT) * b.qx
                - CAST(b.sx AS HUGEINT) * b.sx AS cc
            FROM st a JOIN st b ON a.event_type < b.event_type)
      SELECT type_a, type_b, n_a, n_b,
             CAST(aa // (CAST(n_a AS HUGEINT) * n_b) AS BIGINT)
               AS mean_diff_centi,
             (CAST(CAST(aa AS VARCHAR) AS DOUBLE)
                * CAST(CAST(aa AS VARCHAR) AS DOUBLE)
                * CAST(n_a - 1 AS DOUBLE) * CAST(n_b - 1 AS DOUBLE)) /
               (CAST(CAST(bb AS VARCHAR) AS DOUBLE)
                  * CAST(n_b - 1 AS DOUBLE) * CAST(n_b AS DOUBLE)
                  * CAST(n_b AS DOUBLE)
                + CAST(CAST(cc AS VARCHAR) AS DOUBLE)
                  * CAST(n_a - 1 AS DOUBLE) * CAST(n_a AS DOUBLE)
                  * CAST(n_a AS DOUBLE))
               AS t2
      FROM p ORDER BY type_a, type_b""",
    "q_skyline" -> """
      WITH p AS (SELECT p_partkey AS id,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS cost,
                   CAST(p_size AS BIGINT) AS gain FROM part)
      SELECT id, cost, gain FROM p a
      WHERE NOT EXISTS (SELECT 1 FROM p b
        WHERE b.cost <= a.cost AND b.gain >= a.gain
          AND (b.cost < a.cost OR b.gain > a.gain))
      ORDER BY cost, id""",
    "text_zipf" -> """
      WITH tk AS (SELECT unnest(list_filter(
              string_split_regex(lower(text), '\s+'), x -> x <> ''))
              AS w FROM documents),
      vc AS (SELECT w, count(*) AS f FROM tk GROUP BY 1)
      SELECT CAST(sum(f) AS BIGINT) AS n_tokens,
             count(*) AS vocab,
             CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
             CAST(sum(CASE WHEN f = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS dis,
             CAST(max(f) AS BIGINT) AS f_max,
             (1000000 * count(*)) // CAST(sum(f) AS BIGINT) AS ttr_micro,
             (1000000 * CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END)
               AS BIGINT)) // count(*) AS hapax_vocab_micro
      FROM vc""",
    // 3 peel rounds unrolled; output = last round's degrees over the
    // surviving alive set
    "graph_kcore" -> s"""
      WITH e0 AS (SELECT DISTINCT o_custkey AS src,
                    100000 + l_suppkey AS dst
                  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      e2 AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      a0 AS (SELECT DISTINCT src AS node FROM e2),
      ${Seq(("a0", "d1", "a1"), ("a1", "d2", "a2"), ("a2", "d3", "a3"))
        .map { case (prev, dg, nxt) => s"""
      $dg AS (SELECT e2.src AS node, count(*) AS deg FROM e2
              JOIN $prev s ON s.node = e2.src
              JOIN $prev t ON t.node = e2.dst GROUP BY 1),
      $nxt AS (SELECT node FROM $dg WHERE deg >= 3)"""
        }.mkString(",")}
      SELECT node, CAST(deg AS BIGINT) AS deg
      FROM d3 WHERE deg >= 3 ORDER BY node""",
    "graph_assortativity" -> """
      WITH e0 AS (SELECT DISTINCT o_custkey AS src,
                    100000 + l_suppkey AS dst
                  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      e2 AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      deg AS (SELECT src AS node, count(*) AS deg FROM e2 GROUP BY 1),
      xy AS (SELECT dx.deg AS x, dy.deg AS y
             FROM e2 JOIN deg dx ON dx.node = e2.src
                     JOIN deg dy ON dy.node = e2.dst),
      s AS (SELECT count(*) AS n,
              CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              sum(CAST(x AS HUGEINT) * y) AS sxy,
              sum(CAST(x AS HUGEINT) * x) AS sxx,
              sum(CAST(y AS HUGEINT) * y) AS syy FROM xy),
      r AS (SELECT n, sx, sy,
              CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
              CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS den,
              CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS deny
            FROM s)
      SELECT n AS n_edges, sx, sy,
             CAST(CAST(num AS VARCHAR) AS DOUBLE) /
               CAST(CAST(den AS VARCHAR) AS DOUBLE) AS slope,
             CAST(CAST(num AS VARCHAR) AS DOUBLE) *
               CAST(CAST(num AS VARCHAR) AS DOUBLE) /
               (CAST(CAST(den AS VARCHAR) AS DOUBLE) *
                CAST(CAST(deny AS VARCHAR) AS DOUBLE)) AS r2
      FROM r""",
    "events_seasonal" -> """
      WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                   count(*) AS x FROM events GROUP BY 1),
      dw AS (SELECT day % 7 AS dow, count(*) AS dow_days,
               CAST(sum(x) AS BIGINT) AS dow_events FROM d GROUP BY 1),
      tot AS (SELECT count(*) AS n_days,
                CAST(sum(x) AS BIGINT) AS total FROM d)
      SELECT dow, dow_days, dow_events,
             (10000 * dow_events * n_days) // (dow_days * total)
               AS index_bp
      FROM dw, tot ORDER BY dow""",
    // global-window twin of the engine's two-stage prefix sum — same
    // values by associativity; RANGE frame gives peers one value
    "events_concurrency" -> """
      WITH s AS (SELECT user_id, ts, event_id,
                   CASE WHEN lag(ts) OVER w IS NULL
                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                            > 1800000000
                        THEN 1 ELSE 0 END AS brk
                 FROM events
                 WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts, event_id)),
      t AS (SELECT user_id, ts,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
            FROM s),
      sess AS (SELECT user_id, min(ts) AS st, max(ts) AS en
               FROM t GROUP BY user_id, sid),
      ep AS (SELECT epoch_us(st) AS t, 1 AS d FROM sess
             UNION ALL SELECT epoch_us(en) + 1, -1 FROM sess),
      e2 AS (SELECT t, d, t * 2 + (d + 1) // 2 AS ord FROM ep),
      c AS (SELECT t, d,
              sum(d) OVER (ORDER BY ord RANGE BETWEEN UNBOUNDED
                PRECEDING AND CURRENT ROW) AS conc FROM e2)
      SELECT t // 86400000000 AS day,
             CAST(max(conc) AS BIGINT) AS max_concurrency
      FROM c GROUP BY 1 ORDER BY day""",
    "events_paths" -> """
      WITH p AS (SELECT event_type AS t1,
               lead(event_type, 1) OVER w AS t2,
               lead(event_type, 2) OVER w AS t3
             FROM events
             WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      SELECT t1, t2, t3, count(*) AS n FROM p
      WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT 20""",
    "graph_landmarks" -> """
      WITH RECURSIVE e0 AS (SELECT DISTINCT o_custkey AS src,
                              100000 + l_suppkey AS dst
                            FROM orders
                            JOIN lineitem ON l_orderkey = o_orderkey),
      e2 AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      seeds AS (SELECT src FROM (
        SELECT DISTINCT src FROM e2 ORDER BY src LIMIT 3)),
      bfs(source, node, d) AS (
        SELECT src, src, 0 FROM seeds
        UNION
        SELECT bfs.source, e2.dst, bfs.d + 1 FROM bfs
        JOIN e2 ON e2.src = bfs.node WHERE bfs.d < 3)
      SELECT source, node, CAST(min(d) AS BIGINT) AS hop
      FROM bfs GROUP BY 1, 2 ORDER BY source, node""",
    "events_error_rate" -> """
      SELECT epoch_us(ts) // 86400000000 AS day, count(*) AS n,
             CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
               END) AS BIGINT) AS errors,
             (10000 * CAST(sum(CASE WHEN event_type = 'error' THEN 1
               ELSE 0 END) AS BIGINT)) // count(*) AS error_bp
      FROM events GROUP BY 1 ORDER BY day""",
    "profile_log2_hist" -> """
      WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT)
                   AS cents FROM orders)
      SELECT CAST(length(bin(cents)) - 1 AS BIGINT) AS log2_bucket,
             count(*) AS n, min(cents) AS min_cents,
             max(cents) AS max_cents
      FROM c GROUP BY 1 ORDER BY log2_bucket""",
    "events_dau_wau" -> """
      WITH ud AS (SELECT DISTINCT user_id,
                    epoch_us(ts) // 86400000000 AS day FROM events),
      dau AS (SELECT day, count(*) AS n_dau FROM ud GROUP BY 1),
      fan AS (SELECT DISTINCT user_id, ud.day + CAST(i AS BIGINT)
                AS day
              FROM ud, unnest(range(0, 7)) AS t(i)),
      wau AS (SELECT day, count(*) AS n_wau FROM fan GROUP BY 1)
      SELECT dau.day, n_dau AS dau, n_wau AS wau,
             (10000 * n_dau) // n_wau AS stickiness_bp
      FROM dau JOIN wau ON wau.day = dau.day ORDER BY dau.day""",
    "events_hourly_heatmap" -> """
      SELECT (epoch_us(ts) // 86400000000) % 7 AS dow,
             (epoch_us(ts) // 3600000000) % 24 AS hour,
             count(*) AS n
      FROM events GROUP BY 1, 2 ORDER BY dow, hour""",
    "sim_label_separation" -> s"""
      WITH $qEmbSql,
      lb AS (SELECT vec_id, label FROM embeddings),
      p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
              sum(a.x * b.x) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id < b.vec_id
              AND b.vec_id < 500
            GROUP BY 1, 2),
      c AS (SELECT la.label = lbb.label AS intra,
              (10000 * dot * abs(dot)) //
                (CAST(na.norm AS HUGEINT) * nb.norm) AS cos2_bp
            FROM p JOIN n na ON na.vec_id = ia
                 JOIN n nb ON nb.vec_id = ib
                 JOIN lb la ON la.vec_id = ia
                 JOIN lb lbb ON lbb.vec_id = ib)
      SELECT intra, count(*) AS n_pairs,
             CAST(sum(cos2_bp) // count(*) AS BIGINT) AS mean_cos2_bp
      FROM c GROUP BY 1 ORDER BY intra""",
    "text_zipf_by_source" -> """
      WITH tk AS (SELECT source, unnest(list_filter(
              string_split_regex(lower(text), '\s+'), x -> x <> ''))
              AS w FROM documents),
      vc AS (SELECT source, w, count(*) AS f FROM tk GROUP BY 1, 2)
      SELECT source, CAST(sum(f) AS BIGINT) AS n_tokens,
             count(*) AS vocab,
             CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS hapax,
             CAST(max(f) AS BIGINT) AS f_max,
             (1000000 * count(*)) // CAST(sum(f) AS BIGINT)
               AS ttr_micro
      FROM vc GROUP BY source ORDER BY source""",
    "graph_degree_dist" -> """
      WITH e0 AS (SELECT DISTINCT o_custkey AS src,
                    100000 + l_suppkey AS dst
                  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      e2 AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
      dg AS (SELECT src, count(*) AS deg FROM e2 GROUP BY 1)
      SELECT deg, count(*) AS n_nodes FROM dg
      GROUP BY deg ORDER BY deg""",
    "dedup_source_matrix" -> s"""
      WITH $gtPairsCteSql,
      src AS (SELECT doc_id, source FROM documents)
      SELECT least(sa.source, sb.source) AS src_a,
             greatest(sa.source, sb.source) AS src_b,
             count(*) AS n_pairs
      FROM exact JOIN src sa ON sa.doc_id = exact.id_a
                 JOIN src sb ON sb.doc_id = exact.id_b
      GROUP BY 1, 2 ORDER BY src_a, src_b""",
    "events_drift_tv" -> """
      WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                   event_type, count(*) AS n
                 FROM events GROUP BY 1, 2),
      tot AS (SELECT day, CAST(sum(n) AS BIGINT) AS nd
              FROM d GROUP BY 1),
      days AS (SELECT t1.day, t1.nd, t2.nd AS md
               FROM tot t1 JOIN tot t2 ON t2.day = t1.day - 1),
      cu AS (SELECT day, event_type, n FROM d),
      pv AS (SELECT day + 1 AS day, event_type, n AS m FROM d),
      fo AS (SELECT coalesce(cu.day, pv.day) AS day,
               coalesce(cu.event_type, pv.event_type) AS event_type,
               coalesce(cu.n, 0) AS n, coalesce(pv.m, 0) AS m
             FROM cu FULL OUTER JOIN pv
               ON cu.day = pv.day AND cu.event_type = pv.event_type)
      SELECT fo.day,
             (10000 * CAST(sum(abs(n * md - m * nd)) AS BIGINT))
               // (2 * nd * md) AS tv_bp
      FROM fo JOIN days ON days.day = fo.day
      GROUP BY fo.day, nd, md ORDER BY fo.day""",
    "events_wow_growth" -> """
      WITH wk AS (SELECT event_type,
                    epoch_us(ts) // 604800000000 AS week,
                    count(*) AS n
                  FROM events GROUP BY 1, 2),
      g AS (SELECT event_type, week, n,
              lag(n) OVER (PARTITION BY event_type ORDER BY week)
                AS prev_n
            FROM wk)
      SELECT event_type, week, n, prev_n,
             (10000 * (n - prev_n)) // prev_n AS growth_bp
      FROM g ORDER BY event_type, week""",
    // 5 greedy MMR rounds (λ = 1/2) over materialized pool CTEs
    "text_mmr_rerank" -> s"""
      WITH pool AS MATERIALIZED (SELECT doc_id AS id, n_chars AS rel,
             text FROM documents WHERE source = 'src0'
           ORDER BY n_chars DESC, doc_id LIMIT 10),
      gr AS MATERIALIZED (SELECT DISTINCT id,
             substr(text, CAST(i AS INT), 3) AS g
           FROM pool, UNNEST(range(1, length(text) - 1)) AS t(i)),
      ngt AS (SELECT id, count(*) AS ng FROM gr GROUP BY 1),
      mx AS (SELECT max(rel) AS mr FROM pool),
      base AS MATERIALIZED (SELECT pool.id,
             (10000 * rel) // mr AS rel_bp
           FROM pool JOIN ngt ON ngt.id = pool.id, mx),
      sims AS MATERIALIZED (SELECT s.aid AS ia, s.bid AS ib,
             (10000 * s.cnt) // (na.ng + nb.ng - s.cnt) AS sim_bp
           FROM (SELECT ga.id AS aid, gb.id AS bid, count(*) AS cnt
                 FROM gr ga JOIN gr gb
                   ON ga.g = gb.g AND ga.id <> gb.id
                 GROUP BY 1, 2) s
           JOIN ngt na ON na.id = s.aid
           JOIN ngt nb ON nb.id = s.bid),
      p1 AS MATERIALIZED (SELECT id, rel_bp * 5000 AS mmr FROM base
           ORDER BY mmr DESC, id LIMIT 1),
      sel1 AS (SELECT id FROM p1),
      ${(2 to 5).map { r => s"""
      m$r AS (SELECT b.id,
                b.rel_bp * 5000 - coalesce(ms.ms, 0) * 5000 AS mmr
              FROM base b LEFT JOIN (
                SELECT sims.ia AS id, max(sims.sim_bp) AS ms
                FROM sims JOIN sel${r - 1} s ON s.id = sims.ib
                GROUP BY 1) ms USING (id)
              WHERE b.id NOT IN (SELECT id FROM sel${r - 1})),
      p$r AS MATERIALIZED (SELECT id, mmr FROM m$r
           ORDER BY mmr DESC, id LIMIT 1),
      sel$r AS (SELECT id FROM sel${r - 1}
                UNION ALL SELECT id FROM p$r)"""
      }.mkString(",")}
      SELECT CAST(1 AS BIGINT) AS rank, id, CAST(mmr AS BIGINT) AS mmr
      FROM p1
      ${(2 to 5).map(r =>
        s"UNION ALL SELECT CAST($r AS BIGINT), id, CAST(mmr AS BIGINT) FROM p$r")
        .mkString(" ")}
      ORDER BY rank""",
    "events_funnel_windowed" -> """
      WITH s AS (SELECT user_id, min(ts) AS signup_ts FROM events
                 WHERE event_type = 'signup' GROUP BY user_id),
      c AS (SELECT e.user_id, min(e.ts) AS click_ts
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'click' AND e.ts >= s.signup_ts
              AND epoch_us(e.ts) - epoch_us(s.signup_ts)
                <= 86400000000
            GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
              AND epoch_us(e.ts) - epoch_us(c.click_ts)
                <= 86400000000
            GROUP BY e.user_id)
      SELECT s.user_id, s.signup_ts, c.click_ts, p.purchase_ts,
             CAST((CASE WHEN s.signup_ts IS NOT NULL THEN 1 ELSE 0 END)
                + (CASE WHEN c.click_ts IS NOT NULL THEN 1 ELSE 0 END)
                + (CASE WHEN p.purchase_ts IS NOT NULL THEN 1 ELSE 0
                   END) AS BIGINT) AS stage
      FROM s LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
      ORDER BY s.user_id""",
    "sim_knn_accuracy" -> s"""
      WITH $qEmbSql,
      lb AS (SELECT vec_id, label FROM embeddings),
      sdot AS (SELECT a.vec_id AS id, b.vec_id AS nid,
                 sum(a.x * b.x) AS dot
               FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
                 AND a.vec_id < 500 AND b.vec_id < 500
               GROUP BY 1, 2),
      c AS (SELECT id, nid,
              CAST(dot AS DOUBLE) /
                sqrt(CAST(na.norm AS DOUBLE) * CAST(nb.norm AS DOUBLE))
                AS cosine
            FROM sdot JOIN n na ON na.vec_id = id
                      JOIN n nb ON nb.vec_id = nid),
      b AS (SELECT id, nid FROM (
              SELECT id, nid, row_number() OVER (PARTITION BY id
                ORDER BY cosine DESC, nid) AS rk FROM c) t
            WHERE rk = 1),
      j AS (SELECT la.label AS lbl, lnb.label AS plbl
            FROM b JOIN lb la ON la.vec_id = b.id
                   JOIN lb lnb ON lnb.vec_id = b.nid)
      SELECT count(*) AS n,
             CAST(sum(CASE WHEN lbl = plbl THEN 1 ELSE 0 END)
               AS BIGINT) AS correct,
             (10000 * CAST(sum(CASE WHEN lbl = plbl THEN 1 ELSE 0 END)
               AS BIGINT)) // count(*) AS acc_bp
      FROM j""",
    "events_cumulative_users" -> """
      WITH f AS (SELECT user_id,
                   min(epoch_us(ts) // 86400000000) AS day
                 FROM events GROUP BY 1),
      d AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
      SELECT day, new_users,
             CAST(sum(new_users) OVER (ORDER BY day ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_users
      FROM d ORDER BY day""",
    "q_nearest_join" -> """
      WITH r0 AS (SELECT o_custkey AS k, epoch_us(o_orderdate) AS t0,
               min(o_orderkey) AS okey FROM orders GROUP BY 1, 2),
      l AS (SELECT event_id, user_id, user_id AS k, epoch_us(ts) AS t
            FROM events),
      u AS (SELECT k, t, 1 AS side, event_id, user_id,
              CAST(NULL AS BIGINT) AS rv, CAST(NULL AS BIGINT) AS rt
            FROM l
            UNION ALL
            SELECT k, t0, 0, NULL, NULL, okey, t0 FROM r0),
      w AS (SELECT u.*,
              last_value(rv IGNORE NULLS) OVER wb AS bv,
              last_value(rt IGNORE NULLS) OVER wb AS bt,
              first_value(rv IGNORE NULLS) OVER wf AS fv,
              first_value(rt IGNORE NULLS) OVER wf AS ft
            FROM u
            WINDOW wb AS (PARTITION BY k ORDER BY t, side
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   wf AS (PARTITION BY k ORDER BY t, side
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
      x AS (SELECT event_id, user_id, t,
              bt IS NOT NULL AND t - bt <= 259200000000 AS bok,
              ft IS NOT NULL AND ft - t <= 259200000000 AS fok,
              t - bt AS bg, ft - t AS fg, bv, fv
            FROM w WHERE side = 1)
      SELECT event_id, user_id, t,
             CASE WHEN bok AND (NOT fok OR bg <= fg) THEN bv
                  WHEN fok THEN fv END AS o_orderkey,
             CASE WHEN bok AND (NOT fok OR bg <= fg) THEN bg
                  WHEN fok THEN fg END AS gap_us
      FROM x ORDER BY event_id""",
    "text_code_score" -> """
      WITH b AS (SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[{}\[\]();]'))
                 AS BIGINT) AS syntax_chars,
               CAST(len(regexp_extract_all(text, '=')) AS BIGINT)
                 AS assigns,
               CAST(len(list_filter(string_split(text, chr(10)),
                 x -> x LIKE '  %')) AS BIGINT) AS indented_lines,
               greatest(1, length(text)) AS nc
             FROM documents)
      SELECT doc_id, syntax_chars, assigns, indented_lines,
             (10000 * (3 * syntax_chars + 2 * assigns +
               5 * indented_lines)) // nc AS code_bp
      FROM b ORDER BY doc_id""",
    "events_pareto" -> """
      WITH uc AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
      h AS (SELECT c, count(*) AS nu FROM uc GROUP BY 1),
      tot AS (SELECT count(*) AS n_users,
                CAST(sum(c) AS BIGINT) AS n_events FROM uc),
      cw AS (SELECT c, nu,
               CAST(sum(c * nu) OVER (ORDER BY c DESC ROWS BETWEEN
                 UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_ev,
               CAST(sum(nu) OVER (ORDER BY c DESC ROWS BETWEEN
                 UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_us
             FROM h),
      x AS (SELECT cw.c, cw.nu, cw.cum_ev, cw.cum_us, n_users,
              n_events, (4 * n_events + 4) // 5 AS target
            FROM cw, tot WHERE cum_ev >= (4 * n_events + 4) // 5
            ORDER BY c DESC LIMIT 1)
      SELECT n_users, n_events, target AS target_events, c AS cstar,
             cum_us - nu + (target - (cum_ev - c * nu) + c - 1) // c
               AS users_for_80pct,
             (10000 * (cum_us - nu +
               (target - (cum_ev - c * nu) + c - 1) // c)) // n_users
               AS share_bp
      FROM x""",
    // 5 greedy max-coverage rounds over materialized gram CTEs
    "sample_coverage" -> s"""
      WITH t AS (SELECT doc_id, list_filter(
               string_split_regex(lower(text), '\\s+'), x -> x <> '')
               AS ws FROM documents),
      g0 AS MATERIALIZED (SELECT DISTINCT doc_id,
             concat_ws(' ', ws[CAST(i AS INT)],
               ws[CAST(i AS INT) + 1], ws[CAST(i AS INT) + 2]) AS g
           FROM t, unnest(range(1, len(ws) - 1)) AS r(i)),
      p1 AS MATERIALIZED (SELECT doc_id, count(*) AS gain FROM g0
           GROUP BY 1 ORDER BY gain DESC, doc_id LIMIT 1),
      sel1 AS (SELECT doc_id FROM p1),
      cov1 AS MATERIALIZED (SELECT DISTINCT g FROM g0
           JOIN p1 USING (doc_id)),
      ${(2 to 5).map { r => s"""
      m$r AS (SELECT g0.doc_id, count(*) AS gain FROM g0
              WHERE g0.doc_id NOT IN (SELECT doc_id FROM sel${r - 1})
                AND g0.g NOT IN (SELECT g FROM cov${r - 1})
              GROUP BY 1),
      p$r AS MATERIALIZED (SELECT doc_id, gain FROM m$r
           ORDER BY gain DESC, doc_id LIMIT 1),
      sel$r AS (SELECT doc_id FROM sel${r - 1}
                UNION ALL SELECT doc_id FROM p$r),
      cov$r AS MATERIALIZED (SELECT g FROM cov${r - 1}
           UNION SELECT g0.g FROM g0 JOIN p$r USING (doc_id))"""
      }.mkString(",")}
      SELECT CAST(1 AS BIGINT) AS rank, doc_id, gain FROM p1
      ${(2 to 5).map(r =>
        s"UNION ALL SELECT CAST($r AS BIGINT), doc_id, gain FROM p$r")
        .mkString(" ")}
      ORDER BY rank""",
    "profile_fd" -> """
      WITH fds AS (
        SELECT 'o_orderkey->o_custkey' AS fd, count(*) AS n_keys,
               CAST(sum(ndv - 1) AS BIGINT) AS violations
        FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS ndv
              FROM orders GROUP BY 1)
        UNION ALL
        SELECT 'o_custkey->o_orderkey', count(*),
               CAST(sum(ndv - 1) AS BIGINT)
        FROM (SELECT o_custkey, count(DISTINCT o_orderkey) AS ndv
              FROM orders GROUP BY 1)
        UNION ALL
        SELECT 'l_orderkey->l_returnflag', count(*),
               CAST(sum(ndv - 1) AS BIGINT)
        FROM (SELECT l_orderkey, count(DISTINCT l_returnflag) AS ndv
              FROM lineitem GROUP BY 1)
        UNION ALL
        SELECT 'l_partkey->l_suppkey', count(*),
               CAST(sum(ndv - 1) AS BIGINT)
        FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS ndv
              FROM lineitem GROUP BY 1))
      SELECT fd, n_keys, violations, violations = 0 AS holds
      FROM fds ORDER BY fd""",
    "profile_skew" -> """
      WITH u AS (SELECT 'user_id' AS "column", count(*) AS ndv,
               CAST(sum(n) AS BIGINT) AS n_rows,
               CAST(max(n) AS BIGINT) AS top1_n
             FROM (SELECT user_id, count(*) AS n
                   FROM events GROUP BY 1)
             UNION ALL
             SELECT 'event_type', count(*), CAST(sum(n) AS BIGINT),
               CAST(max(n) AS BIGINT)
             FROM (SELECT event_type, count(*) AS n
                   FROM events GROUP BY 1))
      SELECT "column", n_rows, ndv, top1_n,
             (10000 * top1_n) // n_rows AS top1_share_bp
      FROM u ORDER BY "column"""",
    "text_boilerplate" -> """
      WITH s AS (SELECT DISTINCT doc_id, trim(lower(x)) AS sentence
                 FROM (SELECT doc_id,
                         unnest(string_split_regex(text, '[.!?]+')) AS x
                       FROM documents)
                 WHERE trim(lower(x)) <> '')
      SELECT sentence, count(DISTINCT doc_id) AS n_docs
      FROM s GROUP BY 1 HAVING count(DISTINCT doc_id) >= 3
      ORDER BY n_docs DESC, sentence LIMIT 20""",
    "text_langid_confusion" -> s"""
      SELECT lang_label, pred_lang, count(*) AS n FROM (
        SELECT lang_label,
               CASE WHEN s_en + s_de + s_fr + s_es IS NULL
                      OR s_en + s_de + s_fr + s_es = 0 THEN 'unknown'
                    WHEN s_en >= s_de AND s_en >= s_fr
                      AND s_en >= s_es THEN 'en'
                    WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
                    WHEN s_fr >= s_es THEN 'fr'
                    ELSE 'es' END AS pred_lang
        FROM (SELECT lang AS lang_label,
                ${graft.operators.TextStats.LangProfiles.map {
                  case (l, ws) =>
                    ws.map(hitsSql).mkString(" + ") + s" AS s_$l"
                }.mkString(", ")}
              FROM (SELECT lang, ' ' || lower(text) || ' ' AS p
                    FROM documents)))
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_anomaly_seasonal" -> """
      WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                   count(*) AS x FROM events GROUP BY 1),
      dd AS (SELECT day, day % 7 AS dow, x FROM d),
      st AS (SELECT dow, count(*) AS n, CAST(sum(x) AS BIGINT) AS s,
               sum(CAST(x AS HUGEINT) * x) AS qq FROM dd GROUP BY 1)
      SELECT day, dow, x,
             (CAST(dd.x AS HUGEINT) * n - s) *
               (CAST(dd.x AS HUGEINT) * n - s) * 100 >
               (CAST(n AS HUGEINT) * qq - CAST(s AS HUGEINT) * s) * 400
               AS is_anomaly
      FROM dd JOIN st USING (dow) ORDER BY day""",
    "events_attribution_position" -> """
      WITH conv AS (SELECT user_id, event_id AS conv_id,
                      epoch_us(ts) AS ct
                    FROM events WHERE event_type = 'purchase'),
      touch AS (SELECT user_id, event_type AS channel,
                  event_id AS touch_id, epoch_us(ts) AS tt
                FROM events WHERE event_type <> 'purchase'),
      j AS (SELECT t.channel, t.touch_id, t.tt, c.conv_id
            FROM touch t JOIN conv c ON c.user_id = t.user_id
              AND t.tt < c.ct),
      r AS (SELECT channel, conv_id,
              row_number() OVER (PARTITION BY conv_id
                ORDER BY tt, touch_id) AS rk,
              count(*) OVER (PARTITION BY conv_id) AS k FROM j),
      cr AS (SELECT channel,
               CASE WHEN k = 1 THEN 10000
                    WHEN rk = 1 OR rk = k THEN
                      CASE WHEN k = 2 THEN 5000 ELSE 4000 END
                    ELSE 2000 // (k - 2) END AS credit_bp FROM r)
      SELECT channel, count(*) AS n_touches,
             CAST(sum(credit_bp) AS BIGINT) AS credit_bp_sum
      FROM cr GROUP BY 1 ORDER BY channel""",
    "text_readability" -> """
      WITH b AS (SELECT doc_id,
               len(list_filter(string_split_regex(lower(text), '\s+'),
                 x -> x <> '')) AS words0,
               greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                 AS sentences,
               len(regexp_extract_all(lower(text), '[aeiouy]+'))
                 AS syllables
             FROM documents)
      SELECT doc_id, CAST(words0 AS BIGINT) AS words,
             CAST(sentences AS BIGINT) AS sentences,
             CAST(syllables AS BIGINT) AS syllables,
             206835000 - (1015000 * CAST(words0 AS BIGINT)) // sentences
               - (84600000 * CAST(syllables AS BIGINT)) // words0
               AS flesch_micro
      FROM b WHERE words0 > 0 ORDER BY doc_id""",
    // 7 farthest-point rounds unrolled over the all-pairs distance
    // table (oracle-scale only; the engine does k·N scans)
    "sample_coreset" -> s"""
      WITH $qEmbSql,
      q5 AS (SELECT vec_id FROM q WHERE vec_id < 500),
      dots AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib,
                 sum(a.x * b.x) AS dot
               FROM e a JOIN e b ON a.i = b.i
                 AND a.vec_id < 500 AND b.vec_id < 500
                 AND a.vec_id <> b.vec_id
               GROUP BY 1, 2),
      d2t AS MATERIALIZED (SELECT d.ia, d.ib,
                CAST(na.norm + nb.norm - 2 * d.dot AS BIGINT) AS d2
              FROM dots d JOIN n na ON na.vec_id = d.ia
                   JOIN n nb ON nb.vec_id = d.ib),
      ch1 AS MATERIALIZED (SELECT min(vec_id) AS id FROM q5),
      ${(2 to 8).map { r => s"""
      m$r AS (SELECT t.ia AS id, min(t.d2) AS mind
              FROM d2t t JOIN ch${r - 1} c ON t.ib = c.id
              WHERE t.ia NOT IN (SELECT id FROM ch${r - 1})
              GROUP BY 1),
      p$r AS MATERIALIZED (SELECT id, mind FROM m$r
               ORDER BY mind DESC, id LIMIT 1),
      ch$r AS MATERIALIZED (SELECT id FROM ch${r - 1}
               UNION ALL SELECT id FROM p$r)"""
      }.mkString(",")}
      SELECT CAST(1 AS BIGINT) AS rank, id AS vec_id,
             CAST(0 AS BIGINT) AS d2 FROM ch1
      ${(2 to 8).map(r =>
        s"UNION ALL SELECT CAST($r AS BIGINT), id, mind FROM p$r")
        .mkString(" ")}
      ORDER BY rank""",
    "events_trimmed_mean" -> """
      WITH b AS (SELECT event_type, event_id,
               CAST(round(value * 10000) AS BIGINT) AS q FROM events),
      r AS (SELECT event_type, q,
              row_number() OVER (PARTITION BY event_type
                ORDER BY q, event_id) AS rk,
              count(*) OVER (PARTITION BY event_type) AS n
            FROM b),
      k AS (SELECT event_type, q, rk, n, (n + 19) // 20 AS klo FROM r)
      SELECT event_type, count(*) AS n_kept,
             (100 * CAST(sum(q) AS BIGINT)) // count(*)
               AS trimmed_mean_micro
      FROM k WHERE rk > klo AND rk <= n - klo
      GROUP BY event_type ORDER BY event_type""",
    "q_did" -> """
      WITH ev AS (SELECT event_type = 'purchase' AS treat,
               epoch_us(ts) // 86400000000 AS day,
               CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      cut AS (SELECT min(day) + 15 AS cut FROM ev),
      a AS (SELECT
              count(CASE WHEN treat AND day >= cut THEN 1 END) AS n_tp,
              sum(CASE WHEN treat AND day >= cut THEN cents END) AS s_tp,
              count(CASE WHEN treat AND day < cut THEN 1 END) AS n_tr,
              sum(CASE WHEN treat AND day < cut THEN cents END) AS s_tr,
              count(CASE WHEN NOT treat AND day >= cut THEN 1 END)
                AS n_cp,
              sum(CASE WHEN NOT treat AND day >= cut THEN cents END)
                AS s_cp,
              count(CASE WHEN NOT treat AND day < cut THEN 1 END)
                AS n_cr,
              sum(CASE WHEN NOT treat AND day < cut THEN cents END)
                AS s_cr
            FROM ev, cut),
      m AS (SELECT n_tp, n_tr, n_cp, n_cr,
              CAST((1000000 * CAST(s_tp AS HUGEINT)) // n_tp AS BIGINT)
                AS m_tp,
              CAST((1000000 * CAST(s_tr AS HUGEINT)) // n_tr AS BIGINT)
                AS m_tr,
              CAST((1000000 * CAST(s_cp AS HUGEINT)) // n_cp AS BIGINT)
                AS m_cp,
              CAST((1000000 * CAST(s_cr AS HUGEINT)) // n_cr AS BIGINT)
                AS m_cr
            FROM a)
      SELECT n_tp, n_tr, n_cp, n_cr, m_tp, m_tr, m_cp, m_cr,
             m_tp - m_tr - m_cp + m_cr AS did_micro FROM m""",
    "sim_centroids" -> """
      WITH qe AS (SELECT label, list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))
               AS qv FROM embeddings),
      ee AS (SELECT label, CAST(i AS BIGINT) AS j, qv[CAST(i AS INT)] AS x
             FROM qe, UNNEST(range(1, len(qv) + 1)) AS t(i)),
      cent AS (SELECT label, j,
                 CAST(CAST(sum(x) AS BIGINT) // count(*) AS BIGINT) AS c
               FROM ee GROUP BY 1, 2),
      dots AS (SELECT a.label AS label_a, b.label AS label_b,
                 CAST(sum(a.c * b.c) AS BIGINT) AS dot
               FROM cent a JOIN cent b
                 ON a.j = b.j AND a.label < b.label GROUP BY 1, 2),
      nr AS (SELECT label, CAST(sum(c * c) AS BIGINT) AS nn
             FROM cent GROUP BY 1)
      SELECT label_a, label_b,
             CAST(dot AS DOUBLE) /
               sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE))
               AS cosine
      FROM dots JOIN nr na ON na.label = label_a
                JOIN nr nb ON nb.label = label_b
      ORDER BY label_a, label_b""",
    "sim_rbm" -> s"""
      WITH $qEmbSql,
      s AS (SELECT a.vec_id AS id, b.vec_id AS nid,
              sum(a.x * b.x) AS dot
            FROM e a JOIN e b ON a.i = b.i AND a.vec_id <> b.vec_id
              AND a.vec_id < 500 AND b.vec_id < 500
            GROUP BY 1, 2),
      c AS (SELECT id, nid,
              CAST(dot AS DOUBLE) /
                sqrt(CAST(na.norm AS DOUBLE) * CAST(nb.norm AS DOUBLE))
                AS cosine
            FROM s JOIN n na ON na.vec_id = id
                   JOIN n nb ON nb.vec_id = nid),
      best AS (SELECT id, nid AS best, cosine FROM (
                 SELECT id, nid, cosine,
                   row_number() OVER (PARTITION BY id
                     ORDER BY cosine DESC, nid) AS rk FROM c) t
               WHERE rk = 1)
      SELECT x.id AS id_a, y.id AS id_b, x.cosine
      FROM best x JOIN best y
        ON x.best = y.id AND y.best = x.id AND x.id < y.id
      ORDER BY id_a, id_b""",
    "sim_gram" -> s"""
      WITH $qEmbSql,
      p AS (SELECT CAST(a.i AS BIGINT) AS j, CAST(b.i AS BIGINT) AS k,
              sum(CAST(a.x AS HUGEINT) * b.x) AS g
            FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
            GROUP BY 1, 2)
      SELECT j, k, CAST(g AS VARCHAR) AS gram FROM p ORDER BY j, k""",
    // 3 power-iteration rounds unrolled: s = X·v (row dots), w = Xᵀs
    // (dim aggregation), L∞ renormalize to 2^20 by truncating division
    "sim_pca_pc1" -> s"""
      WITH $qEmbSql,
      v0 AS (SELECT DISTINCT i AS j, CAST(1048576 AS HUGEINT) AS v
             FROM e),
      ${Seq(("v0", "1"), ("v1", "2"), ("v2", "3")).map {
        case (prev, r) => s"""
      s$r AS (SELECT e.vec_id, sum(CAST(e.x AS HUGEINT) * v.v) AS s
              FROM e JOIN $prev v ON v.j = e.i GROUP BY 1),
      w$r AS (SELECT e.i AS j, sum(s$r.s * e.x) AS w
              FROM e JOIN s$r ON s$r.vec_id = e.vec_id GROUP BY 1),
      m$r AS (SELECT max(abs(w)) AS m FROM w$r),
      v$r AS (SELECT j, (w * 1048576) // m AS v FROM w$r, m$r)"""
      }.mkString(",")}
      SELECT CAST(j AS BIGINT) AS dim, CAST(v AS BIGINT) AS component
      FROM v3 ORDER BY dim""",
    "events_streaks" -> """
      WITH ud AS (SELECT DISTINCT user_id,
                    epoch_us(ts) // 86400000000 AS day FROM events),
      i AS (SELECT user_id, day,
              day - dense_rank() OVER (PARTITION BY user_id
                ORDER BY day) AS island FROM ud),
      st AS (SELECT user_id, island, count(*) AS len
             FROM i GROUP BY 1, 2)
      SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
             count(*) AS n_streaks,
             CAST(max(len) AS BIGINT) AS longest_streak
      FROM st GROUP BY 1 ORDER BY user_id""",
    "q_block_bootstrap" -> """
      WITH o AS (SELECT o_orderkey % 32 AS blk,
               CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             FROM orders),
      b AS (SELECT blk, count(*) AS n_b,
              CAST(sum(cents) AS BIGINT) AS s_b FROM o GROUP BY 1),
      m AS (SELECT blk, n_b, s_b,
              (1000000 * CAST(s_b AS HUGEINT)) // n_b AS mb FROM b),
      agg AS (SELECT count(*) AS n_blocks,
                CAST(sum(n_b) AS BIGINT) AS n_rows,
                CAST(sum(s_b) AS BIGINT) AS s_cents,
                CAST(sum(mb) AS HUGEINT) AS sm,
                sum(CAST(mb AS HUGEINT) * mb) AS smm FROM m),
      r AS (SELECT n_blocks, n_rows,
              (1000000 * CAST(s_cents AS HUGEINT)) // n_rows AS mean_micro,
              CAST(n_blocks AS HUGEINT) * smm - sm * sm AS vnum,
              CAST(n_blocks AS HUGEINT) * (n_blocks - 1) AS vden
            FROM agg)
      SELECT n_blocks, n_rows, CAST(mean_micro AS BIGINT) AS mean_micro,
             CAST(CAST(vnum AS VARCHAR) AS DOUBLE) /
               CAST(CAST(vden AS VARCHAR) AS DOUBLE) AS var_mb,
             CAST(CAST(vnum AS VARCHAR) AS DOUBLE) /
               CAST(CAST(vden * n_blocks AS VARCHAR) AS DOUBLE)
               AS se2_micro
      FROM r""",
    "q_cuped" -> """
      WITH ev AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
               CAST(round(value * 100) AS BIGINT) AS cents FROM events),
      cut AS (SELECT min(day) + 15 AS cut FROM ev),
      ux AS (SELECT user_id,
               CAST(sum(CASE WHEN day < cut THEN cents ELSE 0 END)
                 AS BIGINT) AS x,
               CAST(sum(CASE WHEN day >= cut THEN cents ELSE 0 END)
                 AS BIGINT) AS y
             FROM ev, cut GROUP BY 1),
      s AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
              CAST(sum(y) AS BIGINT) AS sy,
              sum(CAST(x AS HUGEINT) * y) AS sxy,
              sum(CAST(x AS HUGEINT) * x) AS sxx,
              sum(CAST(y AS HUGEINT) * y) AS syy FROM ux),
      r AS (SELECT n, sx, sy,
              CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
              CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS denx,
              CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS deny
            FROM s)
      SELECT n AS n_users, sx, sy,
             CAST(CAST(num AS VARCHAR) AS DOUBLE) /
               CAST(CAST(denx AS VARCHAR) AS DOUBLE) AS theta,
             CAST(CAST(num AS VARCHAR) AS DOUBLE) *
               CAST(CAST(num AS VARCHAR) AS DOUBLE) /
               (CAST(CAST(denx AS VARCHAR) AS DOUBLE) *
                CAST(CAST(deny AS VARCHAR) AS DOUBLE)) AS var_reduction
      FROM r""",
    "q_quantile_norm" -> """
      WITH d AS (SELECT doc_id AS id, source AS grp, n_chars AS v
                 FROM documents),
      rk AS (SELECT id, grp, v,
               row_number() OVER (PARTITION BY grp ORDER BY v, id) AS r
             FROM d),
      gn AS (SELECT grp, count(*) AS n FROM d GROUP BY 1),
      vc AS (SELECT v, count(*) AS c FROM d GROUP BY 1),
      cum AS (SELECT v AS pv,
                sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) - c AS cum_prev,
                sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                  PRECEDING AND CURRENT ROW) AS cum
              FROM vc),
      t AS (SELECT count(*) AS big_n FROM d),
      r2 AS (SELECT rk.id, rk.grp, rk.v,
               (rk.r * t.big_n + gn.n - 1) // gn.n AS rstar
             FROM rk JOIN gn USING (grp), t)
      SELECT r2.id AS doc_id, r2.grp AS source, r2.v AS n_chars,
             cum.pv AS norm_chars
      FROM r2 JOIN cum ON r2.rstar > cum.cum_prev
                      AND r2.rstar <= cum.cum
      ORDER BY doc_id""",
    // 3 Bellman–Ford relaxation rounds unrolled
    "graph_sssp" -> s"""
      WITH p AS (SELECT o_custkey AS src, 100000 + l_suppkey AS dst,
                   count(*) AS n
                 FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                 GROUP BY 1, 2),
      e AS (SELECT src, dst, 1000000 // n AS w FROM p
            UNION ALL SELECT dst, src, 1000000 // n FROM p),
      s AS (SELECT min(src) AS s0 FROM e),
      d0 AS (SELECT s0 AS node, CAST(0 AS BIGINT) AS dist FROM s),
      ${Seq(("d0", "d1"), ("d1", "d2"), ("d2", "d3")).map {
        case (prev, nxt) => s"""
      $nxt AS (SELECT node, min(d) AS dist FROM (
          SELECT node, dist AS d FROM $prev
          UNION ALL
          SELECT e.dst, $prev.dist + e.w FROM $prev
          JOIN e ON e.src = $prev.node) u GROUP BY 1)"""
      }.mkString(",")}
      SELECT node, CAST(dist AS BIGINT) AS dist
      FROM d3 ORDER BY node""",
    "q_bucket_recon" -> """
      WITH o AS (SELECT doc_id, n_chars FROM documents
                 WHERE doc_id <> 277),
      nw AS (SELECT doc_id, CASE WHEN doc_id = 421 THEN n_chars + 7
                              ELSE n_chars END AS n_chars
             FROM documents WHERE doc_id <> 137),
      of AS (SELECT doc_id, doc_id // 100 AS bucket,
               (doc_id * 1000003 + n_chars) % 1000000007 AS fp FROM o),
      nf AS (SELECT doc_id, doc_id // 100 AS bucket,
               (doc_id * 1000003 + n_chars) % 1000000007 AS fp FROM nw),
      dgo AS (SELECT bucket, count(*) AS n, sum(fp) AS s
              FROM of GROUP BY 1),
      dgn AS (SELECT bucket, count(*) AS n, sum(fp) AS s
              FROM nf GROUP BY 1),
      db AS (SELECT coalesce(dgo.bucket, dgn.bucket) AS bucket
             FROM dgo FULL OUTER JOIN dgn ON dgo.bucket = dgn.bucket
             WHERE dgo.n IS DISTINCT FROM dgn.n
                OR dgo.s IS DISTINCT FROM dgn.s),
      oo AS (SELECT of.bucket, of.doc_id, of.fp
             FROM of JOIN db USING (bucket)),
      nn AS (SELECT nf.bucket, nf.doc_id, nf.fp
             FROM nf JOIN db USING (bucket))
      SELECT bucket, doc_id, op, old_fp, new_fp FROM (
        SELECT coalesce(oo.bucket, nn.bucket) AS bucket,
               coalesce(oo.doc_id, nn.doc_id) AS doc_id,
               CASE WHEN oo.doc_id IS NULL THEN 'A'
                    WHEN nn.doc_id IS NULL THEN 'R'
                    WHEN oo.fp <> nn.fp THEN 'C' END AS op,
               oo.fp AS old_fp, nn.fp AS new_fp
        FROM oo FULL OUTER JOIN nn
          ON oo.bucket = nn.bucket AND oo.doc_id = nn.doc_id) q
      WHERE op IS NOT NULL ORDER BY doc_id""",
    "dedup_snm_clusters" -> """
      WITH RECURSIVE
      r AS (SELECT doc_id, source, text,
              row_number() OVER (PARTITION BY source
                ORDER BY text, doc_id) AS rk
            FROM documents),
      c AS (SELECT least(a.doc_id, b.doc_id) AS id_a,
              greatest(a.doc_id, b.doc_id) AS id_b
            FROM r a JOIN r b ON a.source = b.source
              AND b.rk > a.rk AND b.rk <= a.rk + 5),
      g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS gr
            FROM documents, UNNEST(range(1, length(text) - 1)) AS t(i)),
      n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY 1),
      sh AS (SELECT c.id_a, c.id_b, count(*) AS shared
             FROM c JOIN g ga ON ga.doc_id = c.id_a
                    JOIN g gb ON gb.doc_id = c.id_b AND gb.gr = ga.gr
             GROUP BY 1, 2),
      pairs AS (SELECT id_a, id_b FROM sh
                JOIN n na ON na.doc_id = id_a
                JOIN n nb ON nb.doc_id = id_b
                WHERE (10000 * shared) // (na.ng + nb.ng - shared)
                  >= 8000),
      e AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT a AS node, a AS lbl FROM e
        UNION
        SELECT e.b AS node, reach.lbl FROM reach JOIN e ON e.a = reach.node)
      SELECT node AS doc_id, min(lbl) AS cluster_id
      FROM reach GROUP BY node ORDER BY doc_id""",
    "dedup_sorted_neighborhood" -> """
      WITH r AS (SELECT doc_id, source, text,
               row_number() OVER (PARTITION BY source
                 ORDER BY text, doc_id) AS rk
             FROM documents),
      c AS (SELECT least(a.doc_id, b.doc_id) AS id_a,
              greatest(a.doc_id, b.doc_id) AS id_b
            FROM r a JOIN r b ON a.source = b.source
              AND b.rk > a.rk AND b.rk <= a.rk + 5),
      g AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS g
            FROM documents, UNNEST(range(1, length(text) - 1)) AS t(i)),
      n AS (SELECT doc_id, count(*) AS ng FROM g GROUP BY 1),
      sh AS (SELECT c.id_a, c.id_b, count(*) AS shared
             FROM c JOIN g ga ON ga.doc_id = c.id_a
                    JOIN g gb ON gb.doc_id = c.id_b AND gb.g = ga.g
             GROUP BY 1, 2)
      SELECT id_a, id_b, shared, n_a, n_b, jac_bp FROM (
        SELECT id_a, id_b, shared, na.ng AS n_a, nb.ng AS n_b,
               (10000 * shared) // (na.ng + nb.ng - shared) AS jac_bp
        FROM sh JOIN n na ON na.doc_id = id_a
                JOIN n nb ON nb.doc_id = id_b) q
      WHERE jac_bp >= 8000 ORDER BY id_a, id_b""",
    "text_novelty" -> """
      WITH t AS (SELECT doc_id, list_filter(
              string_split_regex(lower(text), '\s+'), x -> x <> '') AS ws
            FROM documents),
      g0 AS (SELECT DISTINCT doc_id,
               concat_ws(' ', ws[CAST(i AS INT)],
                 ws[CAST(i AS INT) + 1], ws[CAST(i AS INT) + 2]) AS g
             FROM t, unnest(range(1, len(ws) - 1)) AS r(i)),
      fd AS (SELECT g, min(doc_id) AS fd FROM g0 GROUP BY 1),
      agg AS (SELECT g0.doc_id, count(*) AS n_grams,
                CAST(sum(CASE WHEN fd.fd = g0.doc_id THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_novel
              FROM g0 JOIN fd USING (g) GROUP BY 1)
      SELECT doc_id, n_grams, n_novel,
             (1000000 * n_novel) // n_grams AS novelty_micro
      FROM agg ORDER BY doc_id""",
    "events_mann_whitney" -> """
      WITH b AS (SELECT event_type,
                   CAST(round(value * 10000) AS BIGINT) AS q
                 FROM events
                 WHERE event_type IN ('click', 'purchase')),
      d AS (SELECT q,
              CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                END) AS BIGINT) AS na,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS nb
            FROM b GROUP BY 1),
      c AS (SELECT na, nb,
              CAST(coalesce(sum(na) OVER (ORDER BY q
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS na_less,
              CAST(coalesce(sum(nb) OVER (ORDER BY q
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS nb_less
            FROM d)
      SELECT CAST(sum(na) AS BIGINT) AS n_a,
             CAST(sum(nb) AS BIGINT) AS n_b,
             CAST(sum(na * (2 * nb_less + nb)) AS BIGINT) AS u2_a,
             CAST(sum(nb * (2 * na_less + na)) AS BIGINT) AS u2_b
      FROM c""",
    "events_life_table" -> """
      WITH RECURSIVE days AS (SELECT user_id,
                   epoch_us(ts) // 86400000000 AS day FROM events),
      life AS (SELECT user_id, min(day) AS d0, max(day) AS d1
               FROM days GROUP BY 1),
      mx AS (SELECT max(day) AS dmax FROM days),
      obs AS (SELECT d1 - d0 AS t,
                CASE WHEN d1 < dmax - 7 THEN 1 ELSE 0 END AS dead
              FROM life, mx),
      tab AS (SELECT t, count(*) AS ended,
                CAST(sum(dead) AS BIGINT) AS deaths
              FROM obs GROUP BY 1),
      risk AS (SELECT t, ended, deaths,
                 CAST(sum(ended) OVER (ORDER BY t ROWS BETWEEN
                   CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
                   AS at_risk,
                 row_number() OVER (ORDER BY t) AS rn
               FROM tab),
      rec AS (SELECT rn, t, ended, deaths, at_risk,
                (1000000 * (at_risk - deaths)) // at_risk AS surv
              FROM risk WHERE rn = 1
              UNION ALL
              SELECT r.rn, r.t, r.ended, r.deaths, r.at_risk,
                (rec.surv * (r.at_risk - r.deaths)) // r.at_risk
              FROM risk r JOIN rec ON r.rn = rec.rn + 1)
      SELECT t, ended, deaths, at_risk, CAST(surv AS BIGINT)
               AS surv_micro
      FROM rec ORDER BY t""",
    "events_kendall" -> """
      WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                   CAST(sum(CASE WHEN event_type = 'click' THEN 1
                     ELSE 0 END) AS BIGINT) AS x,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
                     ELSE 0 END) AS BIGINT) AS y
                 FROM events
                 WHERE event_type IN ('click', 'purchase')
                 GROUP BY 1),
      p AS (SELECT a.x - b.x AS dx, a.y - b.y AS dy
            FROM d a JOIN d b ON a.day < b.day),
      s AS (SELECT count(*) AS n_pairs,
              CAST(sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS concordant,
              CAST(sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS discordant,
              CAST(sum(CASE WHEN dx = 0 AND dy <> 0 THEN 1 ELSE 0
                END) AS BIGINT) AS ties_x,
              CAST(sum(CASE WHEN dx <> 0 AND dy = 0 THEN 1 ELSE 0
                END) AS BIGINT) AS ties_y,
              CAST(sum(CASE WHEN dx = 0 AND dy = 0 THEN 1 ELSE 0
                END) AS BIGINT) AS ties_xy
            FROM p)
      SELECT (SELECT count(*) FROM d) AS n_days, n_pairs, concordant,
             discordant, ties_x, ties_y, ties_xy,
             concordant - discordant AS tau_num
      FROM s""",
    "events_theil_sen" -> """
      WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                   count(*) AS y
                 FROM events GROUP BY 1),
      p AS (SELECT (b.y - a.y) * 1000000 AS dy, b.day - a.day AS dx
            FROM d a JOIN d b ON a.day < b.day),
      sl AS (SELECT (dy - ((dy % dx) + dx) % dx) // dx AS slope
             FROM p),
      r AS (SELECT slope, row_number() OVER (ORDER BY slope) AS rk,
              count(*) OVER () AS m
            FROM sl)
      SELECT (SELECT count(*) FROM d) AS n_days,
             CAST(max(m) AS BIGINT) AS n_pairs,
             CAST((sum(slope) * 2) // count(*) AS BIGINT)
               AS median2_slope_micro
      FROM r WHERE rk = (m + 1) // 2 OR rk = (m + 2) // 2""",
    "graph_link_pred" -> """
      WITH p AS (SELECT DISTINCT o_custkey AS node, l_partkey AS via
                 FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      kv AS (SELECT via FROM p GROUP BY via HAVING count(*) <= 40),
      kept AS (SELECT p.node, p.via FROM p JOIN kv USING (via)),
      deg AS (SELECT node, count(*) AS deg FROM kept GROUP BY 1),
      w AS (SELECT x.node AS a, y.node AS b, count(*) AS cn
            FROM kept x JOIN kept y
              ON x.via = y.via AND x.node < y.node
            GROUP BY 1, 2)
      SELECT a, b, cn, da.deg AS da, db.deg AS db,
             (10000 * cn) // (da.deg + db.deg - cn) AS jaccard_bp
      FROM w JOIN deg da ON da.node = w.a
             JOIN deg db ON db.node = w.b
      ORDER BY cn DESC, jaccard_bp DESC, a, b LIMIT 50""",
    "text_textrank" -> s"""
      WITH t AS (SELECT list_filter(
              string_split_regex(lower(text), '\\s+'), x -> x <> '')
              AS ws
            FROM documents),
      bg AS (SELECT ws[CAST(i AS INT)] AS w1,
               ws[CAST(i AS INT) + 1] AS w2
             FROM t, unnest(range(1, len(ws))) AS r(i)),
      fb AS (SELECT w1, w2 FROM bg
             WHERE length(w1) >= 4 AND length(w2) >= 4 AND w1 <> w2),
      e0 AS (SELECT w1, w2 FROM fb GROUP BY 1, 2
             HAVING count(*) >= 2),
      e2 AS (SELECT w1 AS src, w2 AS dst FROM e0
             UNION SELECT w2, w1 FROM e0),
      nodes AS (SELECT DISTINCT src AS node FROM e2),
      cnt AS (SELECT count(*) AS n FROM nodes),
      base AS (SELECT ((1000000000000 // n) * 15) // 100 AS b,
                      1000000000000 // n AS init FROM cnt),
      deg AS (SELECT src, count(*) AS deg FROM e2 GROUP BY src),
      r0 AS (SELECT node, init AS rank_micro
             FROM nodes CROSS JOIN base),
      ${Seq(("r0", "r1"), ("r1", "r2"), ("r2", "r3")).map {
        case (prev, nxt) => s"""
      $nxt AS (SELECT nodes.node,
          b + (coalesce(s.sc, 0) * 85) // 100 AS rank_micro
        FROM nodes CROSS JOIN base
        LEFT JOIN (SELECT e2.dst AS node,
                     sum(r.rank_micro // deg.deg) AS sc
                   FROM e2 JOIN deg USING (src)
                        JOIN $prev r ON r.node = e2.src
                   GROUP BY e2.dst) s USING (node))"""
      }.mkString(",")}
      SELECT node AS token, CAST(rank_micro AS BIGINT) AS rank_micro
      FROM r3 ORDER BY rank_micro DESC, token LIMIT 30""",
    "events_ks" -> """
      WITH b AS (SELECT event_type,
                   CAST(round(value * 10000) AS BIGINT) AS q
                 FROM events
                 WHERE event_type IN ('click', 'purchase')),
      d AS (SELECT q,
              CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                END) AS BIGINT) AS na,
              CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                END) AS BIGINT) AS nb
            FROM b GROUP BY 1),
      c AS (SELECT sum(na) OVER (ORDER BY q) AS cum_a,
              sum(nb) OVER (ORDER BY q) AS cum_b,
              sum(na) OVER () AS n_a, sum(nb) OVER () AS n_b
            FROM d)
      SELECT CAST(max(n_a) AS BIGINT) AS n_a,
             CAST(max(n_b) AS BIGINT) AS n_b,
             CAST((1000000 * max(abs(cum_a * n_b - cum_b * n_a)))
               // (max(n_a) * max(n_b)) AS BIGINT) AS ks_micro
      FROM c""",
    "events_gini" -> """
      WITH u AS (SELECT user_id, count(*) AS c FROM events GROUP BY 1),
      cc AS (SELECT c, count(*) AS m FROM u GROUP BY 1),
      r AS (SELECT c, m, sum(m) OVER (ORDER BY c) AS b FROM cc),
      s AS (SELECT CAST(sum(m) AS BIGINT) AS n_users,
              CAST(sum(c * m) AS BIGINT) AS total_events,
              sum(CAST(c AS HUGEINT) * (2 * b - m + 1) * m) AS s2
            FROM r)
      SELECT n_users, total_events,
             CAST(((s2 - (CAST(n_users AS HUGEINT) + 1) * total_events)
                   * 1000000)
               // (CAST(n_users AS HUGEINT) * total_events) AS BIGINT)
               AS gini_micro
      FROM s""",
    "events_chi2_dow" -> """
      WITH cell AS (SELECT event_type,
                      (epoch_us(ts) // 86400000000) % 7 AS dw,
                      count(*) AS o
                    FROM events GROUP BY 1, 2),
      r AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS rt
            FROM cell GROUP BY 1),
      c AS (SELECT dw, CAST(sum(o) AS BIGINT) AS ct
            FROM cell GROUP BY 1),
      n AS (SELECT CAST(sum(o) AS BIGINT) AS nt FROM cell)
      SELECT cell.event_type, cell.dw, cell.o,
             CAST((1000 * CAST(rt AS HUGEINT) * ct) // nt AS BIGINT)
               AS exp_milli,
             CAST((1000000 *
                   (CAST(cell.o AS HUGEINT) * nt - rt * ct) *
                   (CAST(cell.o AS HUGEINT) * nt - rt * ct))
               // (CAST(nt AS HUGEINT) * rt * ct) AS BIGINT)
               AS chi2_micro
      FROM cell JOIN r USING (event_type) JOIN c USING (dw), n
      ORDER BY event_type, dw""",
    "events_holt" -> holtOracleSql,
    "text_bpe_merges" -> bpeOracleSql,
    "events_decompose" -> s"""
      $decomposeCteSql
      SELECT day, y, trend_milli, detr_milli, seasonal_milli,
             detr_milli - seasonal_milli AS resid_milli
      FROM tt JOIN ss ON ss.dw = tt.day % 7 ORDER BY day""",
    "events_decompose_strength" -> s"""
      $decomposeCteSql,
      j AS (SELECT detr_milli, seasonal_milli,
              detr_milli - seasonal_milli AS resid_milli
            FROM tt JOIN ss ON ss.dw = tt.day % 7),
      a AS (SELECT count(*) AS n_days,
              sum(CAST(seasonal_milli AS HUGEINT) * seasonal_milli)
                AS ss2,
              sum(CAST(resid_milli AS HUGEINT) * resid_milli) AS sr2,
              sum(CAST(detr_milli AS HUGEINT) * detr_milli) AS sd2
            FROM j)
      SELECT n_days,
             CAST(CASE WHEN sd2 <> 0 THEN (10000 * ss2) // sd2 END
               AS BIGINT) AS seasonal_share_bp,
             CAST(CASE WHEN sd2 <> 0 THEN (10000 * sr2) // sd2 END
               AS BIGINT) AS resid_share_bp
      FROM a""",
    "events_kpi_daily" -> """
      WITH a AS (SELECT epoch_us(ts) // 86400000000 AS day,
               count(DISTINCT user_id) AS dau,
               count(*) AS n_events,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0
                 END) AS BIGINT) AS errors,
               count(DISTINCT CASE WHEN event_type = 'purchase'
                 THEN user_id END) AS buyers,
               CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
                 THEN CAST(round(value * 10000) AS BIGINT) END), 0)
                 AS BIGINT) AS revenue_q
             FROM events GROUP BY 1)
      SELECT day, dau, n_events,
             (10000 * errors) // n_events AS error_bp,
             buyers, (10000 * buyers) // dau AS buyer_share_bp,
             revenue_q
      FROM a ORDER BY day""",
    "events_cohort_ltv" -> """
      WITH c AS (SELECT user_id,
               min(epoch_us(ts) // 604800000000) AS cohort_week
             FROM events GROUP BY 1),
      r AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week,
              CAST(round(value * 10000) AS BIGINT) AS q
            FROM events WHERE event_type = 'purchase'),
      g AS (SELECT cohort_week, week - cohort_week AS week_offset,
              CAST(sum(q) AS BIGINT) AS revenue_q
            FROM r JOIN c USING (user_id) GROUP BY 1, 2)
      SELECT cohort_week, week_offset, revenue_q,
             CAST(sum(revenue_q) OVER (PARTITION BY cohort_week
               ORDER BY week_offset ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS BIGINT) AS cum_revenue_q
      FROM g ORDER BY cohort_week, week_offset""",
    "sample_split_by_user" -> s"""
      WITH RECURSIVE ${sdbmCte("events", "user_id", "0",
        "CAST(user_id AS VARCHAR)")},
      b AS (SELECT e.user_id,
              CASE WHEN ${bucketSql("s.hash")} < 80 THEN 'train'
                   WHEN ${bucketSql("s.hash")} < 90 THEN 'val'
                   ELSE 'test' END AS split
            FROM events e JOIN sdbm s ON s.sid = e.user_id)
      SELECT split, count(*) AS n_events,
             count(DISTINCT user_id) AS n_users
      FROM b GROUP BY 1 ORDER BY 1""",
    "profile_basket_size" -> """
      WITH s AS (SELECT l_orderkey, count(*) AS k
                 FROM lineitem GROUP BY 1),
      cc AS (SELECT k, count(*) AS n_orders FROM s GROUP BY 1),
      t AS (SELECT k, n_orders, sum(n_orders) OVER () AS total
            FROM cc)
      SELECT k AS basket_size, n_orders,
             CAST((10000 * n_orders) // total AS BIGINT) AS share_bp
      FROM t ORDER BY basket_size""",
    "text_length_quartiles" -> """
      WITH cc AS (SELECT source, n_chars, count(*) AS m
                  FROM documents GROUP BY 1, 2),
      cw AS (SELECT source, n_chars,
               sum(m) OVER (PARTITION BY source ORDER BY n_chars
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cum,
               sum(m) OVER (PARTITION BY source) AS n
             FROM cc)
      SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
             min(CASE WHEN cum * 4 >= n THEN n_chars END) AS p25_chars,
             min(CASE WHEN cum * 4 >= n * 2 THEN n_chars END)
               AS p50_chars,
             min(CASE WHEN cum * 4 >= n * 3 THEN n_chars END)
               AS p75_chars
      FROM cw GROUP BY 1 ORDER BY 1""",
    "events_new_returning" -> """
      WITH f AS (SELECT user_id,
               min(epoch_us(ts) // 86400000000) AS fd
             FROM events GROUP BY 1),
      e AS (SELECT e.user_id, epoch_us(ts) // 86400000000 AS day, fd
            FROM events e JOIN f USING (user_id))
      SELECT day,
             count(DISTINCT CASE WHEN fd = day THEN user_id END)
               AS new_users,
             count(DISTINCT CASE WHEN fd < day THEN user_id END)
               AS returning_users,
             CAST(sum(CASE WHEN fd = day THEN 1 ELSE 0 END)
               AS BIGINT) AS new_events,
             CAST(sum(CASE WHEN fd < day THEN 1 ELSE 0 END)
               AS BIGINT) AS returning_events
      FROM e GROUP BY 1 ORDER BY 1""",
    "events_lorenz_deciles" -> """
      WITH uc AS (SELECT user_id, count(*) AS c
                  FROM events GROUP BY 1),
      hist AS (SELECT c, count(*) AS nu FROM uc GROUP BY 1),
      tot AS (SELECT CAST(count(*) AS BIGINT) AS total_users,
                CAST(sum(c) AS BIGINT) AS total_events FROM uc),
      spans AS (SELECT c, nu,
                  CAST(sum(nu) OVER (ORDER BY c DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS cum_us,
                  total_users, total_events
                FROM hist CROSS JOIN tot),
      sl AS (SELECT d, c, nu, cum_us, total_events,
               (d * total_users) // 10 + 1 AS lo_d,
               ((d + 1) * total_users) // 10 AS hi_d,
               cum_us - nu + 1 AS lo
             FROM spans
             CROSS JOIN (SELECT unnest(range(10)) AS d) ds),
      tk AS (SELECT d, c, total_events,
               least(hi_d, cum_us) - greatest(lo_d, lo) + 1 AS take
             FROM sl)
      SELECT d AS decile, CAST(sum(take) AS BIGINT) AS n_users,
             CAST(sum(take * c) AS BIGINT) AS n_events,
             CAST((10000 * sum(take * c)) // max(total_events)
               AS BIGINT) AS share_bp
      FROM tk WHERE take > 0 GROUP BY 1 ORDER BY 1""",
    "events_interarrival" -> """
      WITH g AS (SELECT event_type,
              (epoch_us(ts) - epoch_us(lag(ts) OVER
                (PARTITION BY user_id ORDER BY ts, event_id)))
                // 1000000 AS gap_s
            FROM events),
      cc AS (SELECT event_type, gap_s, count(*) AS m FROM g
             WHERE gap_s IS NOT NULL GROUP BY 1, 2),
      cw AS (SELECT event_type, gap_s,
               CAST(sum(m) OVER (PARTITION BY event_type
                 ORDER BY gap_s ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS BIGINT) AS cum,
               CAST(sum(m) OVER (PARTITION BY event_type)
                 AS BIGINT) AS n
             FROM cc)
      SELECT event_type, CAST(max(n) AS BIGINT) AS n_gaps,
             min(CASE WHEN cum * 4 >= n THEN gap_s END) AS p25_s,
             min(CASE WHEN cum * 4 >= n * 2 THEN gap_s END)
               AS p50_s,
             min(CASE WHEN cum * 4 >= n * 3 THEN gap_s END)
               AS p75_s
      FROM cw GROUP BY 1 ORDER BY 1""",
    "events_changepoint" -> """
      WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day,
                   count(*) AS y FROM events GROUP BY 1),
      spine AS (SELECT unnest(range((SELECT min(day) FROM d),
                  (SELECT max(day) FROM d) + 1)) AS day),
      f AS (SELECT spine.day, CAST(coalesce(d.y, 0) AS BIGINT) AS y
            FROM spine LEFT JOIN d USING (day)),
      c AS (SELECT day,
              CAST(sum(y) OVER (ORDER BY day) AS BIGINT) AS sl,
              CAST(count(*) OVER (ORDER BY day) AS BIGINT) AS nl,
              CAST(sum(y) OVER () AS BIGINT) AS s,
              CAST(count(*) OVER () AS BIGINT) AS n
            FROM f)
      SELECT day AS split_day, nl AS n_left, n - nl AS n_right,
             sl AS sum_left, s - sl AS sum_right,
             abs(sl * (n - nl) - (s - sl) * nl) AS contrast
      FROM c WHERE nl < n ORDER BY contrast DESC, split_day LIMIT 1""",
    "events_rfm" -> rfmOracleSql,
    "sample_kfold" -> s"""
      WITH RECURSIVE ${sdbmCte("documents", "doc_id", "0",
        "CAST(doc_id AS VARCHAR)")}
      SELECT ${bucketSql("s.hash", 5)} AS fold, d.source,
             count(*) AS n_docs,
             CAST(sum(d.n_chars) AS BIGINT) AS sum_chars
      FROM documents d JOIN sdbm s ON s.sid = d.doc_id
      GROUP BY 1, 2 ORDER BY 1, 2""",
    "events_funnel_latency" -> """
      WITH su AS (SELECT user_id, min(epoch_us(ts)) AS s_us
                  FROM events WHERE event_type = 'signup' GROUP BY 1),
      pu AS (SELECT user_id, epoch_us(ts) AS p_us
             FROM events WHERE event_type = 'purchase'),
      d AS (SELECT su.user_id, min(p_us - s_us) AS d_us
            FROM su JOIN pu ON pu.user_id = su.user_id
              AND p_us >= s_us
            GROUP BY 1),
      dm AS (SELECT d_us // 60000000 AS d_min FROM d),
      cc AS (SELECT d_min, count(*) AS m FROM dm GROUP BY 1),
      cw AS (SELECT d_min, sum(m) OVER (ORDER BY d_min) AS cum,
               sum(m) OVER () AS n
             FROM cc)
      SELECT CAST(max(n) AS BIGINT) AS n_converted,
             min(CASE WHEN cum * 4 >= n THEN d_min END) AS p25_min,
             min(CASE WHEN cum * 4 >= n * 2 THEN d_min END) AS p50_min,
             min(CASE WHEN cum * 4 >= n * 3 THEN d_min END) AS p75_min
      FROM cw""",
    "events_srm" -> """
      WITH u AS (SELECT DISTINCT user_id FROM events),
      a AS (SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0
                END) AS BIGINT) AS n0,
              CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0
                END) AS BIGINT) AS n1
            FROM u)
      SELECT n0 AS n_users_0, n1 AS n_users_1,
             (1000000 * (n0 - n1) * (n0 - n1)) // (n0 + n1)
               AS chi2_micro,
             (1000000 * (n0 - n1) * (n0 - n1)) // (n0 + n1) > 3841459
               AS srm_flag
      FROM a""",
    "events_coverage" -> """
      WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      m AS (SELECT user_id, us,
              CASE WHEN lag(us) OVER w IS NULL
                     OR us > lag(us) OVER w + 300000000
                   THEN 1 ELSE 0 END AS ni
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
      i AS (SELECT user_id, us,
              sum(ni) OVER (PARTITION BY user_id ORDER BY us
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS island
            FROM m),
      g AS (SELECT user_id, island, count(*) AS ne,
              max(us) + 300000000 - min(us) AS len_us
            FROM i GROUP BY 1, 2)
      SELECT user_id, CAST(sum(ne) AS BIGINT) AS n_events,
             count(*) AS n_islands,
             CAST(sum(len_us) AS BIGINT) // 1000000 AS covered_sec
      FROM g GROUP BY 1 ORDER BY 1""",
    "profile_corr_matrix" -> corrMatrixOracleSql,
    "sim_centroid_drift" -> s"""
      WITH $qEmbSql,
      h AS (SELECT vec_id % 2 AS half, label, i, x
            FROM e JOIN embeddings USING (vec_id)),
      s AS (SELECT label, i,
              CAST(sum(CASE WHEN half = 0 THEN x ELSE 0 END)
                AS BIGINT) AS sa,
              CAST(sum(CASE WHEN half = 1 THEN x ELSE 0 END)
                AS BIGINT) AS sb
            FROM h GROUP BY 1, 2),
      c AS (SELECT label, sum(CAST(sa AS HUGEINT) * sb) AS dot,
              sum(CAST(sa AS HUGEINT) * sa) AS na,
              sum(CAST(sb AS HUGEINT) * sb) AS nb
            FROM s GROUP BY 1),
      cnt AS (SELECT label,
                CAST(sum(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_a,
                CAST(sum(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_b
              FROM embeddings GROUP BY 1)
      SELECT label, n_a, n_b,
             CAST(dot AS DOUBLE) /
               sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
               AS drift_cos
      FROM c JOIN cnt USING (label) ORDER BY label""",
    "events_pattern_match" -> """
      WITH s AS (SELECT user_id,
               string_agg(lower(substr(event_type, 1, 1)), ''
                 ORDER BY epoch_us(ts), event_id) AS s
             FROM events GROUP BY 1)
      SELECT user_id, CAST(length(s) AS BIGINT) AS seq_len,
             CAST(len(regexp_extract_all(s, 'v+cp')) AS BIGINT)
               AS n_matches
      FROM s ORDER BY user_id""",
    "events_forecast_eval" -> s"""
      $holtRecCteSql,
      fc AS (SELECT day, y * 1000000 AS ym,
               lag(l + b) OVER (ORDER BY day) AS fc_holt,
               lag(y * 1000000) OVER (ORDER BY day) AS fc_naive
             FROM rec)
      SELECT count(*) AS n_scored,
             CAST(sum(abs(ym - fc_holt)) AS BIGINT) AS abs_err_holt,
             CAST(sum(abs(ym - fc_naive)) AS BIGINT) AS abs_err_naive
      FROM fc WHERE fc_holt IS NOT NULL""",
    "graph_modularity" -> s"""
      $lpaCteSql,
      m2f AS (SELECT CAST(count(*) AS BIGINT) AS m2 FROM e2),
      deg AS (SELECT src AS node, count(*) AS deg FROM e2 GROUP BY 1),
      dc AS (SELECT label, count(*) AS n_nodes,
               CAST(sum(coalesce(deg, 0)) AS BIGINT) AS deg_sum
             FROM l2 LEFT JOIN deg USING (node) GROUP BY 1),
      intra AS (SELECT la.label, count(*) AS intra2
                FROM e2 JOIN l2 la ON la.node = e2.src
                     JOIN l2 lb ON lb.node = e2.dst
                WHERE la.label = lb.label GROUP BY 1),
      j AS (SELECT dc.label, n_nodes,
              CAST(coalesce(intra2, 0) AS BIGINT) AS intra2,
              deg_sum, m2
            FROM dc LEFT JOIN intra USING (label), m2f),
      q AS (SELECT label, n_nodes, intra2, deg_sum,
              1000000 * (CAST(m2 AS HUGEINT) * intra2 -
                CAST(deg_sum AS HUGEINT) * deg_sum) AS qn,
              CAST(m2 AS HUGEINT) * m2 AS qd
            FROM j)
      SELECT label, n_nodes, intra2, deg_sum,
             CAST((qn - ((qn % qd) + qd) % qd) // qd AS BIGINT)
               AS q_term_micro
      FROM q ORDER BY label""",
    "text_source_overlap" -> s"""
      WITH t AS (SELECT source, list_filter(
              string_split_regex(lower(text), '\\s+'), x -> x <> '')
              AS ws
            FROM documents),
      g AS (SELECT DISTINCT source,
              ${(0 to 7).map(o => s"ws[CAST(i AS INT) + $o]")
                .mkString("concat_ws(' ', ", ", ", ")")} AS g
            FROM t, unnest(range(1, len(ws) - 6)) AS r(i)),
      sz AS (SELECT source, count(*) AS ng FROM g GROUP BY 1),
      p AS (SELECT a.source AS source_a, b.source AS source_b,
              count(*) AS inter
            FROM g a JOIN g b ON a.g = b.g AND a.source < b.source
            GROUP BY 1, 2)
      SELECT source_a, source_b, inter, na.ng AS na, nb.ng AS nb,
             (10000 * inter) // (na.ng + nb.ng - inter) AS jaccard_bp
      FROM p JOIN sz na ON na.source = source_a
             JOIN sz nb ON nb.source = source_b
      ORDER BY source_a, source_b""",
    "events_burst_rate" -> """
      WITH b AS (SELECT user_id,
               count(*) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(ts)
                 RANGE BETWEEN 60000000 PRECEDING AND CURRENT ROW)
                 AS burst
             FROM events)
      SELECT user_id, count(*) AS n_events,
             CAST(max(burst) AS BIGINT) AS max_burst
      FROM b GROUP BY 1 ORDER BY 1""",
    "profile_id_gaps" -> """
      SELECT epoch_us(ts) // 86400000000 AS grain,
             count(DISTINCT event_id) AS n_ids,
             min(event_id) AS id_min, max(event_id) AS id_max,
             max(event_id) - min(event_id) + 1 - count(DISTINCT event_id)
               AS missing_in_span
      FROM events GROUP BY 1 ORDER BY 1""",
    "events_conversion_curve" -> s"""
      WITH su AS (SELECT user_id, min(epoch_us(ts)) AS s_us
                  FROM events WHERE event_type = 'signup' GROUP BY 1),
      pu AS (SELECT user_id, epoch_us(ts) AS p_us
             FROM events WHERE event_type = 'purchase'),
      d AS (SELECT su.user_id, min(p_us - s_us) AS d_us
            FROM su JOIN pu ON pu.user_id = su.user_id
              AND p_us >= s_us
            GROUP BY 1),
      agg AS (SELECT count(*) AS n,
              ${Seq(60L, 360L, 1440L, 4320L).map(h =>
                s"CAST(coalesce(sum(CASE WHEN d_us <= ${h * 60000000L}" +
                s" THEN 1 ELSE 0 END), 0) AS BIGINT) AS h_$h")
                .mkString(", ")}
            FROM d)
      ${Seq(60L, 360L, 1440L, 4320L).map(h => s"""
      SELECT CAST($h AS BIGINT) AS horizon_min,
             CAST(n AS BIGINT) AS n_converted, h_$h AS n_within,
             (10000 * h_$h) // n AS share_bp
      FROM agg""").mkString(" UNION ALL ")}
      ORDER BY horizon_min""",
  ).map { case (k, v) => k -> v.stripMargin.trim.replaceAll("\\s+", " ") }
}
