package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` (UDAF) surface — the custom-AGGREGATE extension
  * path, completing the function-extension matrix alongside the
  * config-injected scalar expressions ([[graft.GraftExtensions]]):
  * a user building corpus metrics hits "aggregate Spark doesn't have"
  * almost immediately (weighted means, mergeable sketches), and the
  * supported answer is `Aggregator[IN, BUF, OUT]` + `functions.udaf`,
  * NOT a driver-side collect.
  *
  * [[WeightedMean]] is an EXACT integer-weighted mean: inputs are
  * pre-quantized longs (value in integer units, e.g. cents; integer
  * weight), the buffer is the exact pair (Σ value·weight, Σ weight) in
  * long arithmetic, and only the FINAL division is floating-point —
  * one deterministic IEEE op, so results are bit-identical across
  * partitionings and merge orders (the same int64-quantization
  * discipline as [[VectorOps]]' cosine kernels). A double-accumulator
  * mean would be merge-order-dependent and hash-unstable vs the
  * oracle.
  *
  * The buffer is a flat pair of longs, so partial aggregation
  * (map-side combine) applies: each partition reduces to 16 bytes
  * before the exchange, and `merge` runs on the combiner outputs —
  * the 100 TB shape, proven by UdafSpec's two-phase plan assert.
  */
object Udafs {

  /** Exact weighted mean of pre-quantized integer inputs.
    * IN = (value: Long, weight: Long); OUT = value units scaled by
    * `scale` (e.g. cents → dollars with scale=100). Zero total weight
    * → None (null), matching SQL aggregate semantics on empty input.
    */
  class WeightedMean(scale: Double)
      extends Aggregator[(Long, Long), (Long, Long), Option[Double]] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(b1: (Long, Long), b2: (Long, Long)): (Long, Long) =
      (b1._1 + b2._1, b1._2 + b2._2)
    override def finish(r: (Long, Long)): Option[Double] =
      if (r._2 == 0L) None
      else Some(r._1.toDouble / r._2.toDouble / scale)
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** cents in → dollars out; the lineitem-price configuration. */
  val weightedMeanCents = new WeightedMean(100.0)

  /** Mergeable Misra–Gries heavy-hitter sketch: one pass, ≤ k
    * counters, with the classic deterministic guarantee — every key
    * with true frequency > n/(k+1) is present in the summary, under
    * ANY partitioning and merge tree (Agarwal et al., "Mergeable
    * Summaries", PODS 2012: pointwise-sum then subtract the (k+1)-st
    * largest count preserves the error bound). The 100 TB shape for
    * "which keys exceed x% of a table": the exact groupBy must
    * shuffle EVERY distinct key; the sketch reduces each partition to
    * ≤ k counters before the exchange, and an exact recount of the
    * ≤ k CANDIDATE keys (broadcast semi-join, map-side combinable)
    * restores exact deterministic output — sketch for candidates,
    * exact pass for truth, the same compose-then-verify shape as the
    * LSH dedup paths.
    *
    * The candidate SET itself is processing-order-dependent below the
    * guarantee threshold (inherent to MG) — which is why the public
    * query surface always recounts; only the guaranteed-superset
    * property is relied on. finish() sorts for a deterministic array
    * rendering. Buffer updates use persistent maps (O(k) rebuild on
    * miss-when-full) — fine at fixture scale; a production port at
    * extreme row rates would switch to a TypedImperativeAggregate
    * with a mutable open-addressing table and a lazy-decrement
    * offset, same math.
    */
  class HeavyHitterKeys(k: Int)
      extends Aggregator[Long, Map[Long, Long], Seq[Long]] {
    require(k >= 1, "k must be >= 1")
    override def zero: Map[Long, Long] = Map.empty
    override def reduce(b: Map[Long, Long], key: Long): Map[Long, Long] =
      b.get(key) match {
        case Some(c) => b.updated(key, c + 1)
        case None if b.size < k => b.updated(key, 1L)
        case None => // decrement-all; zeros vacate their counters
          b.view.mapValues(_ - 1).filter(_._2 > 0).toMap
      }
    override def merge(b1: Map[Long, Long],
        b2: Map[Long, Long]): Map[Long, Long] = {
      val sum = b2.foldLeft(b1) { case (m, (key, c)) =>
        m.updated(key, m.getOrElse(key, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-st largest count, drop non-positives
        val cut = sum.valuesIterator.toIndexedSeq.sorted(
          Ordering[Long].reverse)(k)
        sum.view.mapValues(_ - cut).filter(_._2 > 0).toMap
      }
    }
    override def finish(r: Map[Long, Long]): Seq[Long] = r.keys.toSeq.sorted
    override def bufferEncoder: Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** ε = 1/201 ≈ 0.4975% — strictly under the 0.5% query threshold,
    * so the candidate set provably contains every ≥0.5% key.
    */
  val heavyHitterKeys200 = new HeavyHitterKeys(200)

  /** Session-level registration (UDAFs bind to a session's function
    * registry, unlike the construction-time scalar injection in
    * [[graft.GraftExtensions]]). Idempotent — re-registering replaces
    * the same bindings.
    */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("weighted_mean_cents",
      org.apache.spark.sql.functions.udaf(weightedMeanCents))
    spark.udf.register("heavy_hitter_keys",
      org.apache.spark.sql.functions.udaf(heavyHitterKeys200))
  }
}
