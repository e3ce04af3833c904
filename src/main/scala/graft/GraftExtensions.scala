package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` entry point: injects every graft SQL
  * function (sdbm_hash, minhash_shingled, simhash64, dot_long,
  * word_shingles, shingle_hashes, shared_count, sign_lsh,
  * char_ngrams) into a session at construction.
  *
  * Users on a stock Spark deployment enable the whole function
  * surface with configuration only — no code:
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  * [[Sessions.builder]] wires this in for every graft entry point
  * (CLI, Bench, Verify, tests), so `spark.sql` text queries can call
  * the codegen'd expressions without a prior `registerSql` call.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.sqlFunctions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
