package graft.operators

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro interchange — the remaining lake-staple format beside parquet,
  * ORC, CSV and JSONL (row-oriented, schema'd, splittable: the classic
  * landing/streaming format that columnar lakes ingest from).
  *
  * The Spark distribution here bundles Avro itself (`avro`,
  * `avro-mapred`) but NOT the `spark-avro` DataFrame source, so this
  * operator uses the public pre-`spark-avro` route:
  * `AvroKeyOutputFormat` / `AvroKeyInputFormat` through the Hadoop
  * new-API RDD bridge. This is one of the rare justified RDD surfaces
  * in the engine (SURVEY §2b sinks): per-partition imperative IO glue
  * for a format with no Catalyst source on the classpath — each task
  * streams its partition through the Avro container codec, so the
  * write is exactly as distributed and shuffle-free as a parquet sink,
  * and the read splits on Avro sync markers like any Hadoop input.
  *
  * Schema mapping covers the engine's interchange types (long, int,
  * double, float, boolean, string, binary, timestamp-micros, date) with
  * nullability as `["null", T]` unions; anything else fails loud at
  * plan time rather than writing an unreadable file.
  */
object AvroIO {

  /** Spark StructType → Avro record schema (JSON). Timestamps map to
    * the `timestamp-micros` logical type — µs is exactly the engine's
    * timestamp resolution (Tables.load truncates parquet nanos to µs),
    * so the round-trip is lossless.
    */
  def avroSchemaJson(schema: StructType, name: String = "graft_record"): String = {
    def base(dt: DataType): String = dt match {
      case LongType => "\"long\""
      case IntegerType => "\"int\""
      case DoubleType => "\"double\""
      case FloatType => "\"float\""
      case BooleanType => "\"boolean\""
      case StringType => "\"string\""
      case BinaryType => "\"bytes\""
      case TimestampType =>
        """{"type":"long","logicalType":"timestamp-micros"}"""
      case DateType => """{"type":"int","logicalType":"date"}"""
      case other => throw new IllegalArgumentException(
        s"AvroIO: unsupported type ${other.sql} — extend the mapping " +
          "before writing (a silent fallback would corrupt the file)")
    }
    val fields = schema.fields.map { f =>
      val t = if (f.nullable) s"""["null",${base(f.dataType)}]"""
        else base(f.dataType)
      s"""{"name":"${f.name}","type":$t}"""
    }
    s"""{"type":"record","name":"$name","fields":[${fields.mkString(",")}]}"""
  }

  private def tsToMicros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def microsToTs(us: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
      Math.floorDiv(us, 1000000L), Math.floorMod(us, 1000000L) * 1000L))

  /** Distributed Avro container write: one `.avro` file per partition
    * (deflate-compressed), schema embedded in each container header.
    */
  def write(df: DataFrame, outDir: String): Unit = {
    val sparkSchema = df.schema
    val schemaJson = avroSchemaJson(sparkSchema)
    val job = Job.getInstance(
      df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    job.getConfiguration.set("mapreduce.output.fileoutputformat.compress",
      "true")
    job.getConfiguration.set("avro.output.codec", "deflate")
    // Avro Schema is not serializable: ship the JSON, re-parse per task
    val rdd = df.rdd.mapPartitions { it =>
      val avroSchema = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new GenericData.Record(avroSchema)
        var i = 0
        while (i < sparkSchema.length) {
          val f = sparkSchema(i)
          val v: AnyRef =
            if (row.isNullAt(i)) null
            else f.dataType match {
              case TimestampType =>
                java.lang.Long.valueOf(tsToMicros(row.getTimestamp(i)))
              case DateType => java.lang.Integer.valueOf(
                row.getDate(i).toLocalDate.toEpochDay.toInt)
              case BinaryType =>
                java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
              case _ => row.get(i).asInstanceOf[AnyRef]
            }
          rec.put(f.name, v)
          i += 1
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }
    rdd.saveAsNewAPIHadoopFile(outDir,
      classOf[AvroKey[GenericRecord]], classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]], job.getConfiguration)
  }

  /** Distributed Avro read back to a DataFrame with `schema`. The
    * expected schema is also set as the Avro READER schema, so field
    * reordering / defaulted evolution on the writer side resolves per
    * Avro rules instead of by position.
    *
    * Record-reuse note: Hadoop record readers reuse the key object;
    * every field is copied out of the datum into the Row before the
    * iterator advances, so the reuse never leaks into Spark.
    */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val schemaJson = avroSchemaJson(schema)
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    conf.set("avro.schema.input.key", schemaJson)
    val rdd = spark.sparkContext.newAPIHadoopFile(dir,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]], classOf[NullWritable], conf)
      .mapPartitions { it =>
        it.map { case (k, _) =>
          val rec = k.datum()
          Row.fromSeq(schema.fields.toSeq.map { f =>
            val v = rec.get(f.name)
            if (v == null) null
            else f.dataType match {
              case StringType => v.toString // Avro Utf8 → String
              case TimestampType => microsToTs(v.asInstanceOf[Long])
              case DateType => java.sql.Date.valueOf(
                java.time.LocalDate.ofEpochDay(
                  v.asInstanceOf[Int].toLong))
              case BinaryType =>
                val bb = v.asInstanceOf[java.nio.ByteBuffer]
                val out = new Array[Byte](bb.remaining())
                bb.duplicate().get(out)
                out
              case _ => v
            }
          })
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
