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

  test("aHashNearPairs: the 4x16-bit banded join recovers EXACTLY the " +
      "all-pairs hamming<=3 set (pigeonhole losslessness), never more") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 120)
    val hashes = Multimodal.aHash(docs)
      .select("doc_id", "ahash").as[(Long, Long)].collect().toSeq
    val brute = (for {
      (a, ha) <- hashes; (b, hb) <- hashes if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (a, b, d)).sortBy(p => (p._1, p._2))
    val got = Multimodal.aHashNearPairs(docs, maxHamming = 3)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Int)].collect().toSeq.map(p => (p._1, p._2, p._3))
    assert(got == brute,
      s"banded join diverged from brute force: got ${got.size} pairs, " +
        s"expected ${brute.size}")
    assert(brute.nonEmpty, "fixture slice must contain near pairs")
    assert(brute.exists(_._3 > 0),
      "slice must exercise non-identical near pairs, not just hash ties")
  }

  test("bandedHammingPairs: seeded adversarial random hashes — " +
      "clustered bit-flips, cross-key decoys, thresholds 0..3 all " +
      "match brute force exactly") {
    import spark.implicits._
    // beyond the fixture's hash distribution: random base hashes with
    // 0-5 flipped bits (so distances straddle every threshold), and
    // the SAME hash under a different extra key as a must-not-pair
    // decoy. Seeded -> deterministic.
    val rnd = new scala.util.Random(20260815L)
    val rows = (0 until 40).flatMap { g =>
      val base = rnd.nextLong()
      (0 until 4).map { v =>
        var h = base
        (0 until rnd.nextInt(6)).foreach(_ => h ^= 1L << rnd.nextInt(64))
        (g * 10L + v, if (g % 7 == 0) 1 else 0, h)
      }
    }
    val df = rows.toDF("doc_id", "n_blocks", "fp")
    for (mh <- 0 to 3) {
      val brute = (for {
        (a, ka, ha) <- rows; (b, kb, hb) <- rows
        if a < b && ka == kb
        d = java.lang.Long.bitCount(ha ^ hb) if d <= mh
      } yield (a, b, d)).sortBy(p => (p._1, p._2))
      val got = Multimodal.bandedHammingPairs(df, "fp",
          Seq("n_blocks"), maxHamming = mh)
        .orderBy("id_a", "id_b")
        .as[(Long, Long, Int)].collect().toSeq
      assert(got == brute, s"maxHamming=$mh: got ${got.size} pairs, " +
        s"brute ${brute.size}")
      assert(brute.nonEmpty, s"seeded case must produce pairs at $mh")
    }
  }

  test("audioFingerprint packs the closed-form energy-delta sign bits; " +
      "identical signals (ids congruent mod 640) fingerprint equal") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 20)
      .select(col("doc_id"), col("text"))
      .union(Seq((641L, "x")).toDF("doc_id", "text"))
    val got = Multimodal.audioFingerprint(docs)
      .as[Multimodal.AudioFp].collect().sortBy(_.doc_id)
    got.foreach { r =>
      val n = (640 + (r.doc_id % 5) * 160).toInt
      val nb = n / Multimodal.AudioFpBlock
      assert(r.n_blocks == nb)
      val en = (0 until nb).map { b =>
        (b * 20 until (b + 1) * 20).map { t =>
          val g = (r.doc_id + t / 160) % 5
          val amp = if (g < 2) 0L else g
          val raw = ((r.doc_id * 7 + t.toLong * 31) % 128) - 64
          val v = math.max(-32768L, math.min(32767L, amp * raw * 300))
          v * v
        }.sum
      }
      var fp = 0L
      for (k <- 0 until nb - 1) if (en(k + 1) > en(k)) fp |= (1L << k)
      assert(r.fp == fp,
        s"doc ${r.doc_id}: fingerprint ${r.fp} != closed-form $fp")
      assert(r.fp >= 0L, "<=63 delta bits must stay in the positive range")
    }
    val byId = got.map(r => r.doc_id -> r.fp).toMap
    assert(byId(1L) == byId(641L),
      "mod-640-congruent ids write identical PCM, so fps must match")
  }

  test("audioFpNearPairs: banded join over (n_blocks, fp) recovers " +
      "EXACTLY the all-pairs hamming<=3 set within equal-length " +
      "signals, and never pairs different-length signals") {
    import spark.implicits._
    val docs = Tables.load(spark, dir, "documents")
      .filter(col("doc_id") < 150)
    val fps = Multimodal.audioFingerprint(docs)
      .as[Multimodal.AudioFp].collect().toSeq
    val brute = (for {
      a <- fps; b <- fps
      if a.doc_id < b.doc_id && a.n_blocks == b.n_blocks
      d = java.lang.Long.bitCount(a.fp ^ b.fp) if d <= 3
    } yield (a.doc_id, b.doc_id, d)).sortBy(p => (p._1, p._2))
    val got = Multimodal.audioFpNearPairs(docs, maxHamming = 3)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == brute,
      s"banded join diverged: got ${got.size}, expected ${brute.size}")
    assert(brute.nonEmpty && brute.exists(_._3 > 0),
      "slice must exercise identical AND near fingerprints")
  }

  test("audioFpGroups collapses identical-signal docs and keys groups " +
      "by (n_blocks, fp) so different-length signals never merge") {
    import spark.implicits._
    val docs = Seq((1L, "a"), (641L, "b"), (2L, "c"))
      .toDF("doc_id", "text")
    val got = Multimodal.audioFpGroups(docs)
      .select("n_docs", "min_doc").as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L)),
      "exactly the mod-640 pair groups; the odd doc stays out")
  }

  test("audio payloads are genuine RIFF/WAVE containers") {
    import spark.implicits._
    val payloads = Multimodal.audioPayload(
      Tables.load(spark, dir, "documents").filter(col("doc_id") < 20))
      .as[Multimodal.AudioPayload].collect()
    assert(payloads.length == 20)
    payloads.foreach { p =>
      assert(new String(p.audio.take(4), "US-ASCII") == "RIFF" &&
        new String(p.audio.slice(8, 12), "US-ASCII") == "WAVE",
        s"doc ${p.doc_id} lacks a RIFF/WAVE signature")
    }
  }

  test("audioMeta round-trips the deterministic PCM bit-exactly " +
      "through the WAV container") {
    import spark.implicits._
    val metas = Multimodal.audioMeta(
      Tables.load(spark, dir, "documents").filter(col("doc_id") < 20))
      .as[Multimodal.AudioMeta].collect().sortBy(_.doc_id)
    assert(metas.length == 20)
    metas.foreach { m =>
      assert(m.sample_rate == 8000 && m.bits == 16 && m.channels == 1)
      val n = (640 + (m.doc_id % 5) * 160).toInt
      assert(m.n_samples == n)
      var sumsq = 0L; var peak = 0
      for (t <- 0 until n) {
        val g = (m.doc_id + t / 160) % 5
        val amp = if (g < 2) 0L else g
        val raw = ((m.doc_id * 7 + t.toLong * 31) % 128) - 64
        val v = math.max(-32768L, math.min(32767L, amp * raw * 300)).toInt
        sumsq += v.toLong * v
        peak = math.max(peak, math.abs(v))
      }
      assert(m.sumsq == sumsq && m.peak == peak,
        s"doc ${m.doc_id}: decode does not return the written samples")
    }
  }

  test("audioSilence finds the 2-frame silent runs the amplitude " +
      "gate writes, and loud frames genuinely clip") {
    import spark.implicits._
    val rows = Multimodal.audioSilence(
      Tables.load(spark, dir, "documents").filter(col("doc_id") < 50))
      .orderBy("doc_id").collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val nFrames = r.getAs[Long]("n_frames")
      val silent = r.getAs[Long]("n_silent")
      assert(nFrames >= 4 && nFrames <= 8)
      assert(silent >= 1 && silent < nFrames)
      assert(r.getAs[Long]("longest_silence") >= 1 &&
        r.getAs[Long]("longest_silence") <= 2,
        "the (id+f)%5<2 gate silences at most 2 consecutive frames")
      assert(r.getAs[Long]("silence_bp") == 10000 * silent / nFrames)
    }
    // the m=3,4 frames exceed int16 full scale by construction
    assert(rows.map(_.getAs[Long]("clipped_n")).sum > 0,
      "loud frames must clip at full scale")
  }

  test("a corrupt audio payload fails loud with the doc named") {
    val docs = Multimodal.audioPayload(
      spark.range(1).toDF("doc_id").withColumn("text", lit("x")))
    // sanity: real payload decodes; then corrupt it
    val e = intercept[org.apache.spark.SparkException] {
      import spark.implicits._
      Seq(Multimodal.AudioPayload(7L, Array[Byte](1, 2, 3))).toDS()
        .mapPartitions { it =>
          it.map { p =>
            javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(p.audio))
            p.doc_id
          }
        }.collect()
    }
    assert(docs.count() == 1)
    assert(e.getMessage != null)
  }

  test("sceneCuts: segments open on the first frame and wherever the " +
      "consecutive hash hamming exceeds the threshold") {
    import spark.implicits._
    val far = -1L // hamming(0, -1) = 64: always a cut
    val hashes = Seq(
      (1L, 0L), (2L, 1L),       // s1: ham(0,1)=1 -> same shot
      (3L, far), (4L, far),     // s1: cut at 3, then identical
      (10L, 0L), (11L, far)     // s2: cut at 11
    ).toDF("doc_id", "ahash")
    val meta = Seq((1L, "s1"), (2L, "s1"), (3L, "s1"), (4L, "s1"),
      (10L, "s2"), (11L, "s2")).toDF("doc_id", "source")
    val got = graft.operators.Multimodal.sceneCuts(hashes, meta,
        maxHamming = 10)
      .orderBy("source", "seg_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", 1L, 2L, 1L, 2L), ("s1", 2L, 2L, 3L, 4L),
      ("s2", 1L, 1L, 10L, 10L), ("s2", 2L, 1L, 11L, 11L)))
    // at threshold 64 nothing cuts after the opener: one shot per source
    val loose = graft.operators.Multimodal.sceneCuts(hashes, meta,
        maxHamming = 64)
      .orderBy("source", "seg_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(loose == Seq(("s1", 1L, 4L, 1L, 4L), ("s2", 1L, 2L, 10L, 11L)))
  }

  test("audioCuts: segments open on the first signal, on a hamming " +
      "breach, and on ANY block-count change (incomparable fps)") {
    import spark.implicits._
    val fps = Seq(
      (1L, 32, 0L), (2L, 32, 3L),   // ham(0,3)=2 -> same segment
      (3L, 32, -1L),                // ham(3,-1)=62 -> cut
      (4L, 40, -1L),                // same fp but 32->40 blocks -> cut
      (10L, 32, 0L)                 // other source: its own opener
    ).toDF("doc_id", "n_blocks", "fp")
    val meta = Seq((1L, "s1"), (2L, "s1"), (3L, "s1"), (4L, "s1"),
      (10L, "s2")).toDF("doc_id", "source")
    val got = graft.operators.Multimodal.audioCuts(fps, meta,
        maxHamming = 2)
      .orderBy("source", "seg_id")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", 1L, 2L, 1L, 2L), ("s1", 2L, 1L, 3L, 3L),
      ("s1", 3L, 1L, 4L, 4L), ("s2", 1L, 1L, 10L, 10L)))
  }
}
