package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene operator
  * that removes corpus documents overlapping an evaluation set
  * (extended north-star surface, SURVEY.md §2b): a document is
  * contaminated when it shares at least `minShared` distinct long
  * character n-grams with ANY benchmark document. Long grams
  * (default 30 chars) make incidental collisions vanish while exact
  * or near-copied benchmark spans always collide.
  *
  * 100 TB posture: the benchmark side is an eval suite — megabytes,
  * not terabytes — so its distinct gram set is `broadcast()`: the
  * corpus NEVER shuffles for the membership test; each scan partition
  * filters its exploded grams against the broadcast set, and the
  * per-document count partial-aggregates map-side. The corpus side is
  * the only big input and it streams through one narrow
  * explode→join→agg pipeline.
  */
object Decontaminate {

  /** Contaminated documents with their overlap evidence.
    * Output: (doc_id, shared_ngrams) — distinct n-grams of the
    * document also present anywhere in the benchmark.
    */
  def flagged(docs: DataFrame, bench: DataFrame, n: Int = 30,
      minShared: Int = 1, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 2 && minShared >= 1, "need n >= 2 and minShared >= 1")
    // charNgrams is already per-row distinct, and the benchmark set is
    // distinct'd below — one joined row per (doc, shared gram), so a
    // plain count is the distinct-overlap count without a second
    // dedup pass inside the aggregate.
    val cg = docs.select(col(idCol).as("doc_id"),
      explode(Dedup.charNgrams(col(textCol), n)).as("g"))
    // NO broadcast hint (r19 optimization): the classic decontam call
    // passes a small eval benchmark as `bench` — AQE broadcasts that
    // at runtime from its observed size anyway — but
    // sample_split_contamination passes the 80% TRAIN split here, and
    // a forced broadcast of a corpus-sized gram set is exactly the
    // single-threaded build + memory wall the guide's join section
    // warns about (at 100 TB it exceeds the 8 GB broadcast cap
    // outright). Leaving the strategy to AQE is correct at BOTH ends.
    val bg = bench
      .select(explode(Dedup.charNgrams(col(textCol), n)).as("g"))
      .distinct()
    cg.join(bg, "g")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("shared_ngrams"))
      .filter(col("shared_ngrams") >= minShared)
  }

  /** The corpus with contaminated documents removed (left_anti on the
    * flagged set).
    */
  def clean(docs: DataFrame, bench: DataFrame, n: Int = 30,
      minShared: Int = 1, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bad = flagged(docs, bench, n, minShared, idCol, textCol)
      .select(col("doc_id").as("__contaminated"))
    docs.join(bad, docs(idCol) === col("__contaminated"), "left_anti")
  }
}
