package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the extended surface: media payloads
  * travel as opaque `binary` columns + typed metadata; decode /
  * feature-extraction runs per partition so a real codec would be
  * loaded once per task, not once per row (the Scala analogue of
  * arrow-batched `mapInPandas`).
  *
  * The decode step itself is a clearly-marked deterministic STUB
  * (image/audio codecs are not available in this environment). The
  * Spark-side contract — binary column, schema, partition-batched
  * execution, metadata struct — is real and oracle-tested.
  */
object Multimodal {

  /** Extracted media metadata (stub decode). */
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
      format: String)

  /** Attach a binary "media" payload (UTF-8 bytes of the text column —
    * a deterministic stand-in for image bytes). Null text → empty
    * payload (defined behavior, mirrored in the oracles).
    */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(coalesce(col("text"), lit("")), "UTF-8").as("media"))

  /** STUB decode: derives metadata arithmetically from the payload
    * bytes (a real implementation would decode image headers here —
    * same signature, same partition-batched shape).
    */
  private def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = if (bytes == null) 0 else bytes.length
    val fmt = n % 3 match {
      case 0 => "jpeg"
      case 1 => "png"
      case _ => "webp"
    }
    MediaMeta(id, n, 64 + n % 1024, 64 + (n * 7) % 768, fmt)
  }

  /** Frame sampling over a (stub-decoded) video-like payload: one row
    * per sampled frame with deterministic pts/fingerprint — the
    * explode-shaped plumbing a real frame sampler needs (schema,
    * per-frame rows, bounded fan-out), with arithmetic in place of the
    * codec. Output: (doc_id, frame_idx, pts_ms, frame_hash).
    */
  def frameSample(docs: DataFrame): DataFrame = {
    // null text → empty payload, same contract as withBinaryPayload
    val nBytes = octet_length(encode(coalesce(col("text"), lit("")), "UTF-8"))
    val nFrames = (nBytes % 7) + 1
    docs.select(col("doc_id"), nFrames.as("n_frames"))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        (col("frame_idx") * 40).as("pts_ms"),
        pmod(col("doc_id") * 1000003L + col("frame_idx") * 7919L,
          lit(2147483647L)).as("frame_hash"))
  }

  /** Resize planning over decoded metadata: fit into a `target`-sized
    * box preserving aspect ratio. All integer arithmetic
    * (`w*target // max(w,h)`), so the plan is exact and oracle-
    * checkable; a real resizer would consume (doc_id, new_w, new_h)
    * plus the binary payload in a partition-batched kernel like
    * [[decodeMeta]]. Output: (doc_id, width, height, new_w, new_h).
    */
  def resizePlan(docs: DataFrame, target: Int = 256): DataFrame = {
    val meta = decodeMeta(docs)
    val longSide = greatest(col("width"), col("height"))
    // int/int `/` promotes to double; cast-to-int truncation == floor
    // for positives, matching SQL integer division
    meta.select(col("doc_id"), col("width"), col("height"),
      floor(col("width") * target / longSide).cast("int").as("new_w"),
      floor(col("height") * target / longSide).cast("int").as("new_h"))
  }

  /** Decode/feature-extract over the binary column, partition-batched. */
  def decodeMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val payloads: Dataset[(Long, Array[Byte])] =
      withBinaryPayload(docs).as[(Long, Array[Byte])]
    payloads.mapPartitions { it =>
      // per-partition setup point (codec init in a real decoder)
      it.map { case (id, bytes) => stubDecode(id, bytes) }
    }.toDF()
  }
}
