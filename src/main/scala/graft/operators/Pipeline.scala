package graft.operators

import java.io.OutputStream

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** End-to-end reference-parity pipeline assembly (SURVEY.md §7 item 5):
  * source → optional projection/filter (the CQL SELECT-list / WHERE
  * equivalents, evaluated by Catalyst with pushdown instead of by a
  * Cassandra coordinator) → doc-id derivation → typed rendering →
  * xmlpipe2 formatting → docset sink.
  *
  * The source sits behind a minimal trait: parquet in this offline
  * environment; a Cassandra-connector source (`spark.read.format(
  * "org.apache.spark.sql.cassandra")` with `spark.cassandra.
  * connection.*` for the reference's host/port/credentials/timeout
  * surface — F1/F2, Query.java:127-143) plugs in with the same
  * contract in a connected deployment.
  */
trait DocSource {
  def load(spark: SparkSession): DataFrame
}

case class ParquetSource(dir: String, table: String) extends DocSource {
  def load(spark: SparkSession): DataFrame = Tables.load(spark, dir, table)
}

/** The reference CLI's semantic payload (F14): what to read, which
  * columns (CQL select-list), which predicate (CQL WHERE), which key
  * columns derive the Sphinx doc id. `strictParity` requests
  * bug-for-bug ids and renderings (see [[XmlPipe.formatDocs]]) for
  * migrations that must keep a reference-built index stable.
  */
case class ExportConfig(
    source: DocSource,
    keys: Seq[String],
    columns: Seq[String] = Nil,
    where: String = "",
    strictParity: Boolean = false)

object Pipeline {

  /** The formatted-documents DataFrame (columns: id, doc) — everything
    * before the sink edge; shuffle-free and whole-stage codegen'd.
    */
  def docs(spark: SparkSession, cfg: ExportConfig): DataFrame = {
    var df = cfg.source.load(spark)
    if (cfg.columns.nonEmpty) df = df.selectExpr(cfg.columns: _*)
    if (cfg.where.nonEmpty) df = df.filter(cfg.where)
    cfg.keys.find(k => !df.columns.contains(k)).foreach { k =>
      throw new IllegalArgumentException(
        s"key column '$k' is not in the result (have: ${df.columns.mkString(", ")})")
    }
    XmlPipe.formatDocs(df, cfg.keys, cfg.strictParity)
  }

  /** Single ordered docset to a stream (the reference's stdout edge). */
  def export(spark: SparkSession, cfg: ExportConfig, out: OutputStream): Unit =
    XmlPipe.writeDocset(docs(spark, cfg), out)

  /** Sharded docsets for distributed indexing (the 100 TB edge). */
  def exportSharded(spark: SparkSession, cfg: ExportConfig, path: String): Unit =
    XmlPipe.writeShardedDocsets(docs(spark, cfg), path)
}
