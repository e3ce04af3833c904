package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigated equi-join: salt the skewed (large) side into
  * `saltFactor` sub-keys and replicate the small side once per salt,
  * so one hot key spreads over `saltFactor` reducers instead of
  * pinning a single straggler task. AQE's skew-join handles many
  * cases at runtime; explicit salting is the deterministic fallback
  * when one key dominates (e.g. a null-ish tenant id at 100 TB).
  *
  * Result is value-identical to `large.join(small, keys)`.
  */
object SkewJoin {

  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
      saltFactor: Int = 16): DataFrame = {
    require(saltFactor > 0)
    // Deterministic per-row salt on the large side (hash of the whole
    // row, not a RNG: stable under task retry).
    val salted = large.withColumn("__salt",
      pmod(xxhash64(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor))
        .cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}
