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
      textCol: String = "text", broadcastBench: Boolean = true): DataFrame = {
    require(n >= 2 && minShared >= 1, "need n >= 2 and minShared >= 1")
    // charNgrams is already per-row distinct, and the benchmark set is
    // distinct'd below — one joined row per (doc, shared gram), so a
    // plain count is the distinct-overlap count without a second
    // dedup pass inside the aggregate.
    val cg = docs.select(col(idCol).as("doc_id"),
      explode(Dedup.charNgrams(col(textCol), n)).as("g"))
    // The broadcast hint is CALLER-CONTROLLED (r19 optimization): the
    // classic decontam call passes a small eval benchmark — the
    // contract of the operation — and forcing the broadcast there
    // beats AQE's estimate-driven choice (post-explode size estimates
    // are garbage; measured 0.86 s hinted vs 1.63 s AQE-planned for
    // decontam_flagged). But sample_split_contamination reuses this
    // operator with the 80% TRAIN split as the bench side, where a
    // forced corpus-sized broadcast is the single-threaded build +
    // 8 GB-cap wall the guide's join section warns about — that
    // caller passes broadcastBench = false and lets AQE pick
    // (measured 2.11 -> 1.69 s, and the only shape that survives
    // 100 TB).
    val bg = bench
      .select(explode(Dedup.charNgrams(col(textCol), n)).as("g"))
      .distinct()
    cg.join(if (broadcastBench) broadcast(bg) else bg, "g")
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
