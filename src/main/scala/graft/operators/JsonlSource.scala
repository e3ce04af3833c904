package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL source — the read half of the training-data I/O pair
  * ([[JsonlExport]] is the write half; SURVEY.md §2b "sources"). A
  * corpus pipeline both emits and re-ingests JSONL between stages, so
  * the engine must round-trip its own sink byte-exactly.
  *
  * Design choices, Spark-first:
  *   - the built-in distributed `json` reader does the scanning (one
  *     task per shard group, no driver funnel); this wrapper pins the
  *     CONTRACT around it;
  *   - explicit schema, never inference: `spark.read.json` schema
  *     sampling is corpus-dependent — a dirty shard can silently flip
  *     a column to string between runs; training pipelines need the
  *     same types every run;
  *   - fail-loud by default (`FAILFAST`), mirroring the CLI error
  *     path: a malformed line in a curated corpus is a bug upstream,
  *     not something to paper over;
  *   - [[readWithCorrupt]] for ingest-of-unknown-provenance: bad lines
  *     land whole in a `_corrupt` column for quarantine instead of
  *     killing the job.
  */
object JsonlSource {

  /** Read JSONL shards under `dir` with an explicit schema; any
    * malformed line fails the job.
    */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.read.option("mode", "FAILFAST").schema(schema).json(dir)

  /** Permissive read: parsed columns where the line is valid JSON of
    * the expected shape, plus `_corrupt` holding the raw line where it
    * is not (null for good lines) — the quarantine pattern for
    * untrusted corpora.
    */
  def readWithCorrupt(spark: SparkSession, dir: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains("_corrupt"),
      "schema already has a _corrupt column")
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .schema(StructType(schema.fields :+ StructField("_corrupt", StringType)))
      .json(dir)
  }
}
