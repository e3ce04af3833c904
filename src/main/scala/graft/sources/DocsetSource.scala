package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the xmlpipe2 docset format:
  *
  *   spark.read.format("xmlpipe2").option("fields", "text,source")
  *     .load(shardDir)
  *
  * This is the engine's demonstration of the CONNECTOR extension
  * point — the same `TableProvider`/`Scan`/`PartitionReader` seam a
  * Cassandra source (F1/F2, Query.java:127-143) plugs into in a
  * connected deployment (this sandbox has no Cassandra, so the
  * machinery is proven on the engine's own interchange format
  * instead). Plan integration is real, not cosmetic: one input
  * partition per shard file (reader parallelism = shard count, the
  * write side's sharding contract), and column pruning pushes into
  * the scan via `SupportsPushDownRequiredColumns` — `select(one
  * field)` parses only that field per fragment, visible as the
  * BatchScan's pruned readSchema.
  *
  * Schema: `id` (long, from the document attribute) plus one string
  * column per requested field (absent field → empty string, the
  * xmlpipe2 convention; entities unescaped amp-last, the exact
  * inverse of the writer — same kernel as
  * [[graft.operators.XmlPipe.readDocset]]'s column formulation).
  * Each reader streams fragment-by-fragment from its shard; a shard
  * is one writer partition, so memory is bounded by the write-side
  * shard sizing.
  */
class DocsetSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "xmlpipe2"
  // writes carry the dataframe's own schema (the (id, doc) contract);
  // reads without one fall back to inferSchema from the fields option
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    DocsetSource.schemaFor(DocsetSource.fields(options))
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new DocsetTable(schema, new CaseInsensitiveStringMap(properties))
}

object DocsetSource {
  private[sources] def fields(options: CaseInsensitiveStringMap): Seq[String] =
    Option(options.get("fields")).toSeq
      .flatMap(_.split(",").map(_.trim).filter(_.nonEmpty))

  private[sources] def schemaFor(fields: Seq[String]): StructType =
    StructType(StructField("id", LongType, nullable = false) +:
      fields.map(f => StructField(f, StringType, nullable = false)))

  /** List shard files under `path` (skips hidden/_SUCCESS entries). */
  private[sources] def shardFiles(path: String): Seq[String] = {
    val f = new java.io.File(path)
    if (f.isFile) Seq(f.toString)
    else Option(f.listFiles()).fold(Seq.empty[String])(_.toSeq
      .filter(c => c.isFile && !c.getName.startsWith("_") &&
        !c.getName.startsWith("."))
      .map(_.toString).sorted)
  }
}

private[sources] class DocsetTable(tableSchema: StructType,
    options: CaseInsensitiveStringMap)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"xmlpipe2 ${options.get("path")}"
  override def schema(): StructType = tableSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  private def path: String = Option(options.get("path"))
    .getOrElse(throw new IllegalArgumentException(
      "xmlpipe2 source requires a path"))
  override def newScanBuilder(
      caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new DocsetScanBuilder(tableSchema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new DocsetWriteBuilder(info.schema(), path)
}

/** Write side of the connector: the input contract is the formatted
  * `(id, doc)` frame [[graft.operators.XmlPipe.formatDocs]] produces;
  * each task writes one individually-well-formed docset shard
  * (header + its partition's documents + footer) to a HIDDEN temp
  * file, and the JOB commit performs the swap — delete old shards,
  * rename every temp into its final name — so a job that dies with
  * some tasks committed leaves the OLD docset fully intact (task
  * failures never touch visible files; job abort deletes the temps).
  * Only `mode("overwrite")` is supported: shard names derive from
  * partition ids, so an append would collide with the prior write's
  * names — rejected loudly rather than silently replacing data.
  * (Renames run on the driver against the same filesystem; a
  * cluster deployment does the same through the Hadoop FileSystem
  * API — rename is the primitive that makes the swap near-atomic.)
  */
private[sources] class DocsetWriteBuilder(schema: StructType, path: String)
    extends WriteBuilder with SupportsTruncate {
  require(schema.fieldNames.contains("doc"),
    s"xmlpipe2 write expects the formatted (id, doc) frame, " +
      s"got ${schema.fieldNames.mkString(", ")}")
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = {
    if (!doTruncate)
      throw new IllegalArgumentException(
        "xmlpipe2 write supports mode(\"overwrite\") only: shard names " +
          "derive from partition ids, so append would silently replace " +
          "the prior write's shards")
    new Write {
      override def toBatch: BatchWrite = new DocsetBatchWrite(schema, path)
    }
  }
}

private[sources] class DocsetBatchWrite(schema: StructType, path: String)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    new java.io.File(path).mkdirs()
    new DocsetWriterFactory(schema.fieldIndex("doc"), path)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    // the swap runs only once EVERY task has succeeded, and its order
    // matters for crash atomicity: move each temp into its final name
    // FIRST (same-directory move, so each individual swap is atomic),
    // THEN delete only the stale shards a previous wider write left
    // behind. A driver crash mid-commit thus leaves every shard name
    // with a complete file (old or new) — delete-first left a window
    // where neither generation existed.
    val fresh = messages.map { case DocsetCommit(tmpPath, partitionId) =>
      val name = f"part-$partitionId%05d.xml"
      java.nio.file.Files.move(
        java.nio.file.Paths.get(tmpPath),
        new java.io.File(path, name).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      name
    }.toSet
    Option(new java.io.File(path).listFiles()).foreach(_.foreach { f =>
      if (f.isFile && f.getName.startsWith("part-") &&
          !fresh.contains(f.getName)) f.delete()
    })
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach { case DocsetCommit(tmpPath, _) =>
      new java.io.File(tmpPath).delete()
    }
}

private[sources] class DocsetWriterFactory(docIdx: Int, path: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] =
    new DocsetShardWriter(docIdx, path, partitionId)
}

private[sources] case class DocsetCommit(tmpPath: String, partitionId: Int)
    extends WriterCommitMessage

private[sources] class DocsetShardWriter(docIdx: Int, path: String,
    partitionId: Int) extends DataWriter[InternalRow] {
  private val tmp = java.io.File.createTempFile(
    s"_shard_$partitionId-", ".tmp", new java.io.File(path))
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    new java.io.FileOutputStream(tmp),
    java.nio.charset.StandardCharsets.UTF_8), 1 << 16)
  out.write(graft.operators.XmlPipe.Header)

  override def write(record: InternalRow): Unit =
    out.write(record.getUTF8String(docIdx).toString)
  override def commit(): WriterCommitMessage = {
    out.write(graft.operators.XmlPipe.Footer)
    out.close()
    // no rename here: visibility is the JOB commit's decision
    DocsetCommit(tmp.toString, partitionId)
  }
  override def abort(): Unit = { out.close(); tmp.delete() }
  override def close(): Unit = ()
}

/** Conjunctive bound on the document id, compiled from the pushed
  * filters. The id is the cheapest field in a fragment — it is parsed
  * from the fragment PREFIX before any element extraction or entity
  * unescaping — so a pushed id predicate lets the reader skip
  * non-matching documents at ~zero cost (the text-format analog of
  * parquet row-group skipping). Pushdown is advisory, parquet-style:
  * Spark re-evaluates every filter post-scan, so a bound here can
  * only skip rows the filter would drop anyway.
  */
private[graft] case class DocsetIdBound(lo: Long = Long.MinValue,
    hi: Long = Long.MaxValue, in: Option[Set[Long]] = None) {
  def matches(id: Long): Boolean =
    id >= lo && id <= hi && in.forall(_.contains(id))
  def isTrivial: Boolean =
    lo == Long.MinValue && hi == Long.MaxValue && in.isEmpty
  override def toString: String = {
    val parts =
      (if (lo != Long.MinValue) Seq(s"id >= $lo") else Nil) ++
      (if (hi != Long.MaxValue) Seq(s"id <= $hi") else Nil) ++
      in.map(s => s"id IN {${s.toSeq.sorted.mkString(",")}}").toSeq
    parts.mkString(" AND ")
  }
}

private[graft] object DocsetIdBound {
  import org.apache.spark.sql.sources._

  private def asLong(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None // non-integral comparands stay post-scan only
  }

  /** (bound, accepted) — filters not on `id` or not representable
    * stay unaccepted and are evaluated by Spark alone.
    */
  def compile(filters: Array[Filter]): (DocsetIdBound, Array[Filter]) =
    filters.foldLeft((DocsetIdBound(), Array.empty[Filter])) {
      case ((b, acc), f) =>
        val next = f match {
          case EqualTo("id", v) =>
            asLong(v).map(l => b.copy(lo = b.lo max l, hi = b.hi min l))
          case GreaterThan("id", v) =>
            // l+1 would wrap at MaxValue: id > MaxValue matches nothing
            asLong(v).map(l =>
              if (l == Long.MaxValue) b.copy(lo = Long.MaxValue, hi = Long.MinValue)
              else b.copy(lo = b.lo max (l + 1)))
          case GreaterThanOrEqual("id", v) =>
            asLong(v).map(l => b.copy(lo = b.lo max l))
          case LessThan("id", v) =>
            // l-1 would wrap at MinValue: id < MinValue matches nothing
            asLong(v).map(l =>
              if (l == Long.MinValue) b.copy(lo = Long.MaxValue, hi = Long.MinValue)
              else b.copy(hi = b.hi min (l - 1)))
          case LessThanOrEqual("id", v) =>
            asLong(v).map(l => b.copy(hi = b.hi min l))
          case In("id", vs) =>
            val ls = vs.flatMap(asLong)
            if (ls.length == vs.length)
              Some(b.copy(in = Some(b.in.fold(ls.toSet)(_ intersect ls.toSet))))
            else None
          case _ => None
        }
        next.fold((b, acc))(nb => (nb, acc :+ f))
    }
}

private[sources] class DocsetScanBuilder(full: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownAggregates {
  private var required: StructType = full
  private var bound: DocsetIdBound = DocsetIdBound()
  private var accepted: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  private var countPushed = false
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    val (b, acc) = DocsetIdBound.compile(filters)
    bound = b
    accepted = acc
    // return ALL filters as residual: the bound only skips rows the
    // filters would drop, so Spark's re-evaluation keeps every
    // non-representable predicate (and the accepted ones) exact
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    accepted
  /** Ungrouped COUNT(*) answered by counting fragment delimiters —
    * no per-field parse, no unescape, no UTF8String per row. PARTIAL
    * pushdown (one pre-counted row per shard, Spark sums them), so
    * the final aggregate stays engine-side and AQE-visible. Spark
    * only attempts this when every filter was fully consumed; this
    * builder keeps all filters residual (see pushFilters), so a scan
    * with any predicate never reaches here — belt and braces, the
    * trivial-bound check below would refuse it anyway.
    */
  override def supportCompletePushDown(agg: Aggregation): Boolean = false
  override def pushAggregation(agg: Aggregation): Boolean = {
    val ok = bound.isTrivial && agg.groupByExpressions.isEmpty &&
      agg.aggregateExpressions.length == 1 &&
      agg.aggregateExpressions()(0).isInstanceOf[CountStar]
    if (ok) countPushed = true
    ok
  }
  override def build(): Scan =
    if (countPushed) new DocsetCountScan(path)
    else new DocsetScan(required, path, bound)
}

/** COUNT(*)-pushdown scan: one long per shard file — the number of
  * fragment open tags — summed by Spark's final aggregate.
  */
private[sources] class DocsetCountScan(path: String) extends Scan with Batch {
  override def readSchema(): StructType =
    StructType(Seq(StructField("count(*)", LongType, nullable = false)))
  override def toBatch: Batch = this
  override def description(): String =
    s"xmlpipe2 $path PushedAggregation: [COUNT(*)]"
  override def planInputPartitions(): Array[InputPartition] =
    DocsetSource.shardFiles(path).map(DocsetPartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(
          partition: InputPartition): PartitionReader[InternalRow] =
        new DocsetCountReader(
          partition.asInstanceOf[DocsetPartition].file)
    }
}

/** Counts `\n<sphinx:document id="` delimiters in one shard with a
  * streamed byte match — the whole file is never materialized as a
  * String and no fragment is parsed.
  */
private[sources] class DocsetCountReader(file: String)
    extends PartitionReader[InternalRow] {
  private var done = false
  private var count = 0L
  override def next(): Boolean = {
    if (done) return false
    val delim = ("\n<sphinx:document id=\"")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val in = new java.io.BufferedInputStream(
      new java.io.FileInputStream(file), 1 << 16)
    try {
      var matched = 0
      var b = in.read()
      while (b >= 0) {
        if (b == delim(matched)) {
          matched += 1
          if (matched == delim.length) { count += 1; matched = 0 }
        } else if (matched > 0) {
          // the delimiter has no internal repeated prefix beyond a
          // restart at its own first byte, so the only fallback to
          // check is whether the mismatching byte re-opens it
          matched = if (b == delim(0)) 1 else 0
        }
        b = in.read()
      }
    } finally in.close()
    done = true
    true
  }
  override def get(): InternalRow = new GenericInternalRow(Array[Any](count))
  override def close(): Unit = ()
}

private[sources] class DocsetScan(required: StructType, path: String,
    bound: DocsetIdBound = DocsetIdBound()) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"xmlpipe2 $path ${required.fieldNames.mkString("[", ",", "]")}" +
      (if (bound.isTrivial) "" else s" PushedIdBound: [$bound]")
  override def planInputPartitions(): Array[InputPartition] =
    DocsetSource.shardFiles(path).map(DocsetPartition.apply).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new DocsetReaderFactory(required, bound)
  override def toMicroBatchStream(
      checkpointLocation: String): MicroBatchStream =
    new DocsetMicroBatchStream(required, path)
}

/** Streaming read — continuous docset ingestion (`readStream.format
  * ("xmlpipe2")`): each micro-batch picks up the shard files that
  * landed since the last one. The offset is the lexicographically
  * LARGEST file name processed so far; correctness therefore requires
  * producers to land files under lexicographically increasing names —
  * exactly what [[graft.operators.XmlPipe.writeStreamingDocsets]]'
  * `batch_<id>` naming and any timestamped landing convention give —
  * and files must be immutable once visible (land-then-rename, the
  * convention every writer in this engine follows). A file sorting
  * BELOW the watermark is never read; producers that cannot promise
  * ordered names should land through the batch connector instead.
  * The offset serializes as the plain name string, so checkpoints
  * are human-readable and restarts resume after the watermark.
  */
private[sources] case class DocsetNameOffset(name: String) extends Offset {
  override def json(): String = name
}

private[sources] class DocsetMicroBatchStream(required: StructType,
    path: String) extends MicroBatchStream {
  private def filesAfter(watermark: String): Seq[String] =
    DocsetSource.shardFiles(path)
      .filter(f => fileName(f) > watermark)
  private def fileName(f: String): String = new java.io.File(f).getName

  override def initialOffset(): Offset = DocsetNameOffset("")
  override def latestOffset(): Offset = {
    val fs = DocsetSource.shardFiles(path)
    DocsetNameOffset(if (fs.isEmpty) "" else fs.map(fileName).max)
  }
  override def deserializeOffset(json: String): Offset =
    DocsetNameOffset(json)
  override def planInputPartitions(start: Offset,
      end: Offset): Array[InputPartition] = {
    val lo = start.asInstanceOf[DocsetNameOffset].name
    val hi = end.asInstanceOf[DocsetNameOffset].name
    val files = DocsetSource.shardFiles(path)
      .filter(f => fileName(f) > lo && fileName(f) <= hi)
    // Recovery guard: an UNCOMMITTED batch replays through this exact
    // (lo, hi] range after a crash between sink commit and checkpoint
    // commit-log write. The offset is only the boundary NAME, so the
    // one deletion this source can detect — the shard that DEFINED
    // the end offset having vanished — must fail loud rather than
    // silently replay a smaller batch (the fail-loud discipline of
    // the batch reader's malformed-id path). Shards at or below `lo`
    // are committed and safe to retire (retention/TTL); interior
    // deletions inside an in-flight range are covered by the
    // land-then-rename immutability contract in the class scaladoc.
    if (hi.nonEmpty && hi > lo && !files.exists(f => fileName(f) == hi))
      throw new IllegalStateException(
        s"xmlpipe2 streaming recovery: offset shard '$hi' is missing " +
          s"from $path — it was deleted before its micro-batch " +
          "committed; shards may only be retired once their batch is " +
          "in the commit log")
    files.map(DocsetPartition.apply).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new DocsetReaderFactory(required)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class DocsetPartition(file: String)
    extends InputPartition

private[sources] class DocsetReaderFactory(required: StructType,
    bound: DocsetIdBound = DocsetIdBound())
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new DocsetPartitionReader(
      partition.asInstanceOf[DocsetPartition].file, required, bound)
}

/** Streams one shard: fragments split on the document open tag, one
  * row per fragment, parsing only the pruned columns.
  *
  * KEEP IN LOCKSTEP with [[graft.operators.XmlPipe.readDocset]]'s
  * column formulation: same fragment split, same absent-field →
  * empty-string convention, same amp-last unescape order. Two
  * mechanisms on purpose (JVM loop here for the connector's row
  * reader, codegen'd column exprs there) — a change to the escaping
  * contract must land in both.
  */
private[sources] class DocsetPartitionReader(file: String,
    required: StructType, bound: DocsetIdBound = DocsetIdBound())
    extends PartitionReader[InternalRow] {
  private val fragments: Iterator[String] = {
    val content = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file)),
      java.nio.charset.StandardCharsets.UTF_8)
    // index 0 is the docset header (before the first document)
    content.split("\n<sphinx:document id=\"").iterator.drop(1)
  }
  private var current: InternalRow = _

  // no bound pushed → don't even parse the id prefix per fragment
  private val trivialBound = bound.isTrivial

  override def next(): Boolean = {
    // pushed id bound: decide on the fragment PREFIX (the id
    // attribute) before paying element extraction + unescape for a
    // document the filter would drop anyway. The parsed id is handed
    // to parse() so accepted fragments never pay the prefix scan twice.
    while (fragments.hasNext) {
      val frag = fragments.next()
      val id: java.lang.Long =
        if (trivialBound) null else parseId(frag)
      if (trivialBound || bound.matches(id)) {
        current = parse(frag, id)
        return true
      }
    }
    false
  }

  private def parseId(frag: String): java.lang.Long = {
    // fail with the file and fragment named: a foreign/corrupt docset
    // whose id attribute is non-numeric should read as a data error,
    // not a bare NumberFormatException from a nameless task (the
    // column-expression twin readDocset drops such fragments via its
    // rlike guard; the row reader is strict by design — silent skips
    // in a CONNECTOR hide corruption)
    val prefix = frag.takeWhile(_ != '"')
    try java.lang.Long.valueOf(prefix)
    catch {
      case _: NumberFormatException =>
        throw new IllegalArgumentException(
          s"$file: malformed sphinx:document id attribute " +
            s"'${prefix.take(32)}' (expected a decimal long)")
    }
  }
  override def get(): InternalRow = current
  override def close(): Unit = ()

  private def parse(frag: String, preParsedId: java.lang.Long): InternalRow = {
    val values = required.fields.map { f =>
      if (f.name == "id") {
        if (preParsedId ne null) preParsedId else parseId(frag)
      } else {
        val open = s"<${f.name}>"
        val start = frag.indexOf(open)
        val raw =
          if (start < 0) ""
          else {
            val from = start + open.length
            val end = frag.indexOf(s"</${f.name}>", from)
            if (end < 0) "" else frag.substring(from, end)
          }
        // amp-last: the exact inverse of the writer's escape order
        UTF8String.fromString(raw.replace("&lt;", "<")
          .replace("&gt;", ">").replace("&amp;", "&"))
      }
    }
    new GenericInternalRow(values.asInstanceOf[Array[Any]])
  }
}
