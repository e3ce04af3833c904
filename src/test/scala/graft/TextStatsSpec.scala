package graft

import graft.operators.TextStats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("tokenStats counts tokens and average length") {
    import spark.implicits._
    val got = TextStats.tokenStats(
      Seq((1L, "a bb ccc"), (2L, "")).toDF("doc_id", "text"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(got(0) == ((1L, 8L, 3L, Some(2.0))))
    assert(got(1) == ((2L, 0L, 0L, None)))
  }

  test("occurrences counts non-overlapping padded hits") {
    import spark.implicits._
    val got = Seq(" the cat the dog the ").toDF("s")
      .select(TextStats.occurrences(col("s"), " the ").as("n"))
      .as[Long].collect().head
    // three disjoint " the " occurrences
    assert(got == 3L)
    // adjacent words share the padding space: " the the " counts once
    // under non-overlapping replace semantics
    val adj = Seq(" the the ").toDF("s")
      .select(TextStats.occurrences(col("s"), " the ").as("n"))
      .as[Long].collect().head
    assert(adj == 1L)
  }

  test("langId picks the profile with most stopword hits") {
    import spark.implicits._
    val df = Seq(
      (1L, "xx", "der hund und die katze und das haus"),
      (2L, "xx", "the cat and the dog of the house"),
      (3L, "xx", "le chat et la maison et les chiens"),
      (4L, "xx", "zzz qqq www")).toDF("doc_id", "lang", "text")
    val got = TextStats.langId(df).orderBy("doc_id")
      .select("pred_lang").as[String].collect().toSeq
    assert(got == Seq("de", "en", "fr", "unknown"))
  }

  test("fingerprint is whitespace-normalized and case-insensitive") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello   World"),
      (2L, "hello world"),
      (3L, "hello  world "),
      (4L, "different text")).toDF("doc_id", "text")
    val fps = TextStats.fingerprint(df).orderBy("doc_id")
      .select("fp").as[Long].collect().toSeq
    assert(fps(0) == fps(1) && fps(1) == fps(2))
    assert(fps(3) != fps(0))
  }

  test("quality score favors stopword-rich prose over punctuation soup") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat and the dog of the mouse went to the store"),
      (2L, "$$$ ### !!! %%% @@@ &&& *** ((( ))) ___")).toDF("doc_id", "text")
    val got = TextStats.qualityScore(df).orderBy("doc_id")
      .select("quality").as[Double].collect().toSeq
    assert(got(0) > got(1))
  }

  test("repetition: boilerplate scores high, varied prose low, short " +
      "docs zero") {
    import spark.implicits._
    val repeated = "lorem ipsum " * 20                  // heavy repetition
    val varied = (0 until 240).map(i => ('a' + i % 26).toChar)
      .zipWithIndex.map { case (c, i) => s"$c$i" }.mkString(" ")
    val df = Seq((1L, repeated), (2L, varied), (3L, "tiny"))
      .toDF("doc_id", "text")
    val got = TextStats.repetition(df).orderBy("doc_id")
      .select("doc_id", "n_grams", "n_distinct", "rep_ratio")
      .as[(Long, Long, Long, Double)].collect()
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 > 0.8, s"boilerplate ratio ${byId(1L)._4}")
    assert(byId(2L)._4 < 0.2, s"varied ratio ${byId(2L)._4}")
    assert(byId(3L) == ((3L, 0L, 0L, 0.0)))
    // counts are consistent: distinct <= total, ratio = 1 - d/t
    for ((_, (_, t, d, r)) <- byId if t > 0)
      assert(d <= t && math.abs(r - (1.0 - d.toDouble / t)) < 1e-15)
  }

  test("chunk: overlapping windows cover the text, short docs one chunk") {
    import spark.implicits._
    val text = ('a' to 'z').mkString // 26 chars
    val df = Seq((1L, text), (2L, "tiny"), (3L, "")).toDF("doc_id", "text")
    val got = TextStats.chunk(df, size = 10, overlap = 4)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String)].collect().toSeq
    // stride 6, ceil((26-4)/6) = 4 chunks at offsets 0/6/12/18
    assert(got == Seq(
      (1L, 0L, "abcdefghij"), (1L, 1L, "ghijklmnop"),
      (1L, 2L, "mnopqrstuv"), (1L, 3L, "stuvwxyz"),
      (2L, 0L, "tiny"), (3L, 0L, "")))
    // consecutive chunks overlap by exactly `overlap` characters
    assert(got(0)._3.takeRight(4) == got(1)._3.take(4))
  }

  test("charDiversity: repetitive text collides, varied text doesn't, " +
      "empty is zero") {
    import spark.implicits._
    val df = Seq((1L, "aaaaaaaa"), (2L, "abcdefgh"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextStats.charDiversity(df).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 8L, 64L, 1.0),     // one char: certain collision
      (2L, 8L, 8L, 0.125),    // all distinct: 1/n
      (3L, 0L, 0L, 0.0)))     // empty: defined as zero
  }

  test("char_collision kernel matches a brute-force code-point count " +
      "(seeded unicode property run)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // valid-unicode generator: ascii, latin-1, CJK, and astral chars
    def randString(): String = {
      val cps = (0 until rnd.nextInt(60)).map { _ =>
        rnd.nextInt(4) match {
          case 0 => 'a' + rnd.nextInt(26)
          case 1 => 0xC0 + rnd.nextInt(0x100)
          case 2 => 0x4E00 + rnd.nextInt(0x100)
          case _ => 0x1F600 + rnd.nextInt(0x50) // astral (surrogate pair)
        }
      }
      cps.foldLeft(new java.lang.StringBuilder)(
        (b, cp) => b.appendCodePoint(cp)).toString
    }
    def brute(s: String): Long =
      s.codePoints().toArray.groupBy(identity).values
        .map(g => g.length.toLong * g.length).sum
    val cases = (0 until 200).map(i => (i.toLong, randString()))
    val got = cases.toDF("id", "s")
      .select(col("id"), graft.functions.char_collision(col("s")).as("c"))
      .as[(Long, Long)].collect().toMap
    for ((id, s) <- cases) assert(got(id) == brute(s), s"case $id: '$s'")
  }

  test("chunkTokens windows on token boundaries with token overlap") {
    import spark.implicits._
    val words = (1 to 12).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" ")), (2L, "just three words"))
      .toDF("doc_id", "text")
    val got = TextStats.chunkTokens(df, size = 5, overlap = 2)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, String)].collect().toSeq
    // stride 3, ceil((12-2)/3) = 4 chunks at word offsets 0/3/6/9
    assert(got == Seq(
      (1L, 0L, "w1 w2 w3 w4 w5"), (1L, 1L, "w4 w5 w6 w7 w8"),
      (1L, 2L, "w7 w8 w9 w10 w11"), (1L, 3L, "w10 w11 w12"),
      (2L, 0L, "just three words")))
    // words are never split: every chunk is a subsequence of tokens
    assert(got.forall { case (_, _, c) =>
      c.split(" ").forall(w => (words :+ "just" :+ "three" :+ "words")
        .contains(w)) })
  }

  test("tfidfKeywords ranks rare repeated terms above ubiquitous ones") {
    import spark.implicits._
    val df = Seq(
      (1L, "spark spark spark common"),
      (2L, "duck duck common"),
      (3L, "common goose goose")).toDF("doc_id", "text")
    val got = TextStats.tfidfKeywords(df, k = 2).orderBy("doc_id", "rank")
      .select("doc_id", "rank", "term")
      .as[(Long, Long, String)].collect().toSeq
    // 'common' appears in every doc (df=3) so doc-unique terms with
    // df=1 outrank it despite lower tf; within a doc ties are by term
    assert(got == Seq(
      (1L, 1L, "spark"), (1L, 2L, "common"),
      (2L, 1L, "duck"), (2L, 2L, "common"),
      (3L, 1L, "goose"), (3L, 2L, "common")))
  }

  test("compression signal: repetitive text compresses far below " +
      "prose; null and empty are total") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val prose = (1 to 120).map(_ =>
      ('a' + rnd.nextInt(26)).toChar.toString +
        ('a' + rnd.nextInt(26)).toChar).mkString(" ")
    val docs = Seq(
      (1L, "ab" * 300),                  // highly repetitive
      (2L, prose),                       // high-entropy
      (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = TextStats.compressionSignal(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 < 0.1, s"repetitive ratio ${byId(1L)._4}")
    assert(byId(2L)._4 > 0.5, s"prose ratio ${byId(2L)._4}")
    assert(byId(1L)._4 < byId(2L)._4 / 3)
    assert(byId(3L) == ((3L, 0L, 0L, 0.0)))
    assert(byId(4L) == ((4L, 0L, 0L, 0.0)))
    // deterministic across runs (fixed Deflater config)
    val again = TextStats.compressionSignal(docs).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(again == got)
  }

  test("deflate holders are reclaimed under thread churn: dead " +
      "threads' native Deflaters get end()'d by the Cleaner") {
    val before = graft.functions.Compress.cleaned.get()
    val sample = org.apache.spark.unsafe.types.UTF8String
      .fromString("thread churn probe " * 20)
    val threads = (1 to 8).map { _ =>
      val t = new Thread(() => {
        assert(graft.functions.Compress.deflateLen(sample) > 0)
      })
      t.start(); t
    }
    threads.foreach(_.join())
    // the holders are now unreachable (threads dead); the Cleaner runs
    // after GC notices — poll with repeated GC nudges
    val deadline = System.nanoTime() + 30L * 1000000000L
    while (graft.functions.Compress.cleaned.get() < before + 8 &&
        System.nanoTime() < deadline) {
      System.gc()
      Thread.sleep(100)
    }
    assert(graft.functions.Compress.cleaned.get() >= before + 8,
      s"cleaned ${graft.functions.Compress.cleaned.get() - before} of 8")
  }

  test("unicode normalization: NFC composes, strip_accents folds " +
      "diacritics, non-decomposables pass through, null is total") {
    import spark.implicits._
    // explicit escapes only: editors silently re-compose source text
    val decomposed = "cafe\u0301"  // e + combining acute
    val composed = "caf\u00e9"     // precomposed e-acute
    val exotic = "\u00f8\u00f1\u00fc\u00e7\u00df" // o-slash n-tilde u-uml c-ced sharp-s
    val rows = Seq(
      (1L, decomposed), (2L, composed), (3L, exotic),
      (4L, null.asInstanceOf[String]))
    val got = rows.toDF("id", "s")
      .select(col("id"), graft.functions.nfc_normalize(col("s")).as("n"),
        graft.functions.strip_accents(col("s")).as("p"))
      .orderBy("id").as[(Long, String, String)].collect().toSeq
    assert(got(0)._2 == composed && got(1)._2 == composed)
    // composition forms converge: the dedup-fingerprint property
    assert(got(0)._2 == got(1)._2 && got(0)._3 == got(1)._3)
    assert(got(0)._3 == "cafe")
    // n-tilde/u-umlaut/c-cedilla fold; o-slash and sharp-s have no
    // canonical decomposition and pass through
    assert(got(2)._3 == "\u00f8nuc\u00df")
    assert(got(3)._2 == null && got(3)._3 == null)
    // SQL surface (config-injected): same kernels by name
    val viaSql = spark.sql(
      s"SELECT nfc_normalize('$decomposed'), strip_accents('$decomposed')")
      .collect()(0)
    assert(viaSql.getString(0) == composed && viaSql.getString(1) == "cafe")
  }

  test("invertedIndex builds sorted distinct posting lists with df") {
    import spark.implicits._
    val docs = Seq((10L, "a b a"), (2L, "b c"), (3L, ""))
      .toDF("doc_id", "text")
    val got = TextStats.invertedIndex(docs).orderBy("term")
      .as[(String, Long, String)].collect().toSeq
    // postings sorted numerically (2 before 10), duplicates collapsed
    assert(got == Seq(("a", 1L, "10"), ("b", 2L, "2,10"),
      ("c", 1L, "2")))
  }

  test("searchTopK scores are exact integers: tf times floor-divided " +
      "rational idf, rarer terms weigh more") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b c")).toDF("doc_id", "text")
    val got = TextStats.searchTopK(docs, Seq("a", "b"), k = 2)
      .as[(Long, Long, Long)].collect().toSeq
    // N=2; w_a = (1e6*3) div (1+1) = 1500000, w_b = (1e6*3) div (2+1)
    // = 1000000; doc1 = 2*w_a + 1*w_b, doc2 = 1*w_b
    assert(got == Seq((1L, 4000000L, 2L), (2L, 1000000L, 1L)))
  }

  test("qualityFilter assigns the first failing reason in chain order") {
    import spark.implicits._
    // indexed words: every 10-char window carries a unique running
    // index, so rep_ratio stays ~0 where repetition must not fire
    def varied(n: Int): Seq[String] =
      (0 until n).map(i => s"${('a' + i % 26).toChar}$i")
    // stopword-dense prose; group-leading letters vary so the
    // recurring "and the" junction never yields identical 10-grams
    val ok = varied(12).grouped(2)
      .flatMap(g => Seq("the") ++ g ++ Seq("and")).mkString(" ")
    val df = Seq(
      (1L, "only three words"),                           // too few
      (2L, varied(95).mkString(" ")),                     // too many
      (3L, "der hund und die katze und das haus " * 3),   // lang (de)
      (4L, "the cat " * 15),                              // repetitive
      (5L, "the " + varied(60).mkString(" ")),            // low quality
      (6L, ok)).toDF("doc_id", "text")
    val got = TextStats.qualityFilter(df).orderBy("doc_id")
      .select("doc_id", "keep", "reason")
      .as[(Long, Boolean, String)].collect().toSeq
    assert(got == Seq(
      (1L, false, "too_few_tokens"), (2L, false, "too_many_tokens"),
      (3L, false, "lang"), (4L, false, "repetitive"),
      (5L, false, "low_quality"), (6L, true, "ok")))
    // null text drops — without the explicit check, null comparisons
    // would skip every threshold and keep the doc as 'ok'
    val withNull = TextStats.qualityFilter(
      Seq((7L, null.asInstanceOf[String])).toDF("doc_id", "text"))
      .select("keep", "reason").as[(Boolean, String)].collect().head
    assert(withNull == ((false, "null_text")))
  }

  test("lmScore: hand-computed bigram conditional probabilities, " +
      "total on short docs") {
    import spark.implicits._
    // corpus bigrams: "a b" ×2, "b a" ×1, "a c" ×1  →  starts:
    // a·=3, b·=1.  P(b|a)=2/3→6666bp, P(a|b)=1/1→10000bp,
    // P(c|a)=1/3→3333bp.
    val docs = Seq(
      (1L, "a b a c"),   // pairs: a b (6666), b a (10000), a c (3333)
      (2L, "a b"),       // pair:  a b (6666)
      (3L, "solo"),      // no bigram — scores (0, 0), still present
      (4L, "")           // empty — (0, 0)
    ).toDF("doc_id", "text")
    val got = TextStats.lmScore(docs).orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, (6666L + 10000L + 3333L) / 3),
      (2L, 1L, 6666L),
      (3L, 0L, 0L),
      (4L, 0L, 0L)))
  }

  test("winnowing: hand-computed fingerprints with rightmost min " +
      "tie-break") {
    import spark.implicits._
    // vocab ranks: a=1 b=2 c=3, V=4; 3-grams of "a b a b a c":
    //   pos1 (a,b,a)=(1*4+2)*4+1=25, pos2 (b,a,b)=38,
    //   pos3 (a,b,a)=25,             pos4 (b,a,c)=39
    // one full window of 4 grams -> min 25 at pos 1 AND 3: rightmost
    // wins -> fingerprint (pos 3, gram 25)
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = TextStats.winnowFingerprints(docs)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 25L)))
  }

  test("winnowing guarantee: docs sharing a run of >= w+k-1 words " +
      "share a selected gram; short docs fall back to a global min") {
    import spark.implicits._
    val noise1 = "u v w x y z u w y v"
    val noise2 = "z y u x v w z u y w"
    val shared = "p q r s t p q r"       // 8 >= w+k-1 = 6
    val docs = Seq(
      (1L, s"$noise1 $shared $noise2"),
      (2L, s"$noise2 $shared $noise1"),
      (3L, "a b")                        // < k words: no grams at all
    ).toDF("doc_id", "text")
    val fp = TextStats.winnowFingerprints(docs)
      .select(col("doc_id"), col("gram")).as[(Long, Long)]
      .collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(fp.getOrElse(3L, Set.empty).isEmpty)
    assert((fp(1L) intersect fp(2L)).nonEmpty,
      "shared 8-word run must yield a shared fingerprint")
    // a doc with >= k but < k+w-1 words has fewer than w grams: its
    // single anchor still selects exactly one global-min fingerprint
    val tiny = Seq((9L, "m n o p")).toDF("doc_id", "text") // 2 grams
    assert(TextStats.winnowFingerprints(tiny).count() == 1L)
  }

  test("winnowPairs: planted near-duplicates pair up; unrelated docs " +
      "with disjoint vocab do not") {
    import spark.implicits._
    val base = (1 to 40).map(i => s"w${i % 12} v${(i * 7) % 12}")
      .mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " tail tok"),   // near-dup of 1
      (5L, (1 to 40).map(i => s"q${i % 9} r${(i * 5) % 9}").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = TextStats.winnowPairs(docs, minShared = 4, maxDf = 20)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)))
  }

  test("bm25TopK: length normalization ranks the shorter doc above " +
      "an equal-tf longer one, at the hand-computed exact scores") {
    import spark.implicits._
    // equal tf("q")=2; flat tf·idf would tie them — BM25 must not.
    // N=2, L=11, df=2 → w = (1e6·3)//3 = 1e6; contribution =
    // (w·22·L·tf) // (10·L·tf + 3·L + 9·N·dl)
    val docs = Seq(
      (1L, "q q a"),                // dl 3 → 484e6 // 307 = 1576547
      (2L, "q q a b b b b b")       // dl 8 → 484e6 // 397 = 1219143
    ).toDF("doc_id", "text")
    val got = TextStats.bm25TopK(docs, Seq("q"), k = 10)
      .select(col("doc_id"), col("score")).as[(Long, Long)]
      .collect().toSeq
    assert(got == Seq((1L, 1576547L), (2L, 1219143L)))
  }

  test("chiSquareTerms: a class-exclusive term scores the exact χ², " +
      "an evenly-spread term scores zero, direction carries the sign") {
    import spark.implicits._
    val docs = Seq(
      (1L, "zz both filler1", "A"), (2L, "zz both filler2", "A"),
      (3L, "both other1 x", "B"), (4L, "both other2 y", "B")
    ).toDF("doc_id", "text", "source")
    val got = TextStats.chiSquareTerms(docs, "source", k = 2, minDf = 1)
      .select(col("cls"), col("rank"), col("term"), col("chi2_micro"),
        col("direction"))
      .as[(String, Int, String, Long, Int)].collect().toSeq
    // zz in A: a=2 b=0 c=0 d=2, det=4 → 1e6·4·16 // 16 = 4e6, over-
    // represented (+1); zz in B is the mirror table det=−4 → same χ²,
    // direction −1 (χ² is two-sided); 'both' is in every doc →
    // excluded by the df < N guard
    val a1 = got.find(r => r._1 == "A" && r._2 == 1).get
    assert(a1._3 == "zz" && a1._4 == 4000000L && a1._5 == 1)
    val b1 = got.find(r => r._1 == "B" && r._2 == 1).get
    assert(b1._3 == "zz" && b1._4 == 4000000L && b1._5 == -1)
    assert(!got.exists(_._3 == "both"))
    // singleton terms score 1333333 from BOTH sides (in-class: a=1
    // b=0 c=1 d=2, det=2; out-of-class: a=0 b=1 c=2 d=1, det=−2 —
    // same χ², opposite direction), so rank 2 ties at 1333333 and
    // breaks to the alphabetical min 'filler1': +1 seen from A (it
    // lives there), −1 seen from B
    val a2 = got.find(r => r._1 == "A" && r._2 == 2).get
    val b2 = got.find(r => r._1 == "B" && r._2 == 2).get
    assert(a2._3 == "filler1" && a2._4 == 1333333L && a2._5 == 1)
    assert(b2._3 == "filler1" && b2._4 == 1333333L && b2._5 == -1)
  }

  test("codeScore: syntax/assign/indent counts and the weighted " +
      "basis-point score, hand-computed") {
    import spark.implicits._
    // text: "x = f(y);\n  return x;" → syntax {(,),;,;}=4, '='=1,
    // indented lines 1, len 21 → (10000·(12+2+5)) div 21 = 9047
    val docs = Seq((1L, "x = f(y);\n  return x;")).toDF("doc_id", "text")
    val got = graft.operators.TextStats.codeScore(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, 1L, 1L, 9047L)))
  }

  test("boilerplateSentences: a footer shared by 3 docs is flagged; " +
      "within-doc repetition alone is not corpus boilerplate") {
    import spark.implicits._
    val footer = "All rights reserved"
    val docs = Seq(
      (1L, s"Unique alpha. $footer."),
      (2L, s"Unique beta! $footer."),
      (3L, s"Unique gamma? $footer."),
      // doc 4 repeats ITS OWN sentence 3× — must not count as spread
      (4L, "Same line. Same line. Same line.")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextStats
      .boilerplateSentences(docs, minDocs = 3L, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq((footer.toLowerCase, 3L)))
  }

  test("readability: hand-computed Flesch micro score — vowel-group " +
      "syllables, punctuation-run sentences, truncating divisions") {
    import spark.implicits._
    // words 5, sentences 2, vowel groups 6:
    // 206835000 − (1015000·5) div 2 − (84600000·6) div 5 = 102777500
    val docs = Seq((1L, "Hello world. It is good.")).toDF("doc_id", "text")
    val got = graft.operators.TextStats.readability(docs)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L, 2L, 6L, 102777500L)))
  }

  test("bpeMerges: hand-traced merge table — frequency argmax, " +
      "lexicographic tie-break, end-of-word sentinel participates") {
    import spark.implicits._
    // wf: aba×2 (' a b a _ '), ab×1 (' a b _ ').
    // r1: 'a b'=3 wins. r2: 'ab a'=2 ties 'a _'=2 → 'a _' (lex, the
    //     space sorts below 'b'). r3: 'ab a_'=2 wins.
    val docs = Seq((1L, "aba aba"), (2L, "ab")).toDF("doc_id", "text")
    val got = graft.operators.TextStats.bpeMerges(docs, rounds = 3)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((1L, "a b", 3L), (2L, "a _", 2L),
      (3L, "ab a_", 2L)))
  }

  test("bpeTrain: hand-traced final vocab after the same 3 merges — " +
      "weighted freqs, distinct-word spread, merged-symbol flag") {
    import spark.implicits._
    // continuing the bpeMerges trace: after merges (a b), (a _),
    // (ab a_) the word table is aba (cnt 2) → ' aba_ ' (r1 'ab a _',
    // r2 'ab a_', r3 'aba_') and ab (cnt 1) → ' ab _ ' (only r1
    // applies). Final vocab by (freq desc, symbol asc; '_' sorts
    // before 'a'): aba_ freq 2, then _ and ab at freq 1 each.
    val docs = Seq((1L, "aba aba"), (2L, "ab")).toDF("doc_id", "text")
    val got = graft.operators.TextStats.bpeTrain(docs, rounds = 3)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(("aba_", 1L, 2L, true), ("_", 1L, 1L, false),
      ("ab", 1L, 1L, true)))
  }

  test("bpeEncode: per-doc token counts from the trained table — " +
      "aba packs to one symbol, ab stays at two") {
    import spark.implicits._
    // same trace: aba → ' aba_ ' (1 symbol), ab → ' ab _ ' (2)
    val docs = Seq((1L, "aba aba"), (2L, "ab"), (3L, "ab aba"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextStats.bpeEncode(docs, rounds = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 10000L), (2L, 1L, 2L, 20000L),
      (3L, 2L, 3L, 15000L)))
  }

  test("bpeEncodeOovSafe: unseen words fall back to the per-character " +
      "base spelling (length+1 symbols) and are counted in n_oov") {
    import spark.implicits._
    // train on the aba/ab corpus (same trace as bpeEncode above),
    // encode a doc containing the unseen word 'xyz': 3 chars + the
    // '_' sentinel = 4 fallback symbols
    val train = Seq((1L, "aba aba"), (2L, "ab"), (3L, "ab aba"))
      .toDF("doc_id", "text")
    val fin = graft.operators.TextStats.bpeFinal(train, rounds = 3)
    val docs = Seq((10L, "aba xyz"), (11L, "ab"), (12L, "xyz q"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextStats.bpeEncodeOovSafe(docs, fin)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // doc 10: aba (in-vocab, 1 sym) + xyz (OOV, 4) = 5 over 2 words
    // doc 11: ab in-vocab at 2 syms, no OOV
    // doc 12: xyz (4) + q (OOV, 2) = 6 over 2 words
    assert(got == Seq((10L, 2L, 1L, 5L, 25000L),
      (11L, 1L, 0L, 2L, 20000L), (12L, 2L, 2L, 6L, 30000L)))
  }

  test("zipfSlope: bucketed least squares matches a BigInt replica " +
      "of the 3-gram spectrum; a zero-spread spectrum reports NULL") {
    import spark.implicits._
    val texts = Seq("the cat sat on the mat the cat", "the theme thesis",
      "aaa bbb aaa ccc aaa", "zq")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = graft.operators.TextStats.zipfSlope(docs).collect()(0)
    // replica: same 3-gram definition, same buckets, same formula
    val f = texts.flatMap(t => if (t.length < 3) Nil
      else (0 to t.length - 3).map(i => t.toLowerCase.substring(i, i + 3)))
      .groupBy(identity).map(_._2.size.toLong)
    val m = f.groupBy(x => 63 - java.lang.Long.numberOfLeadingZeros(x))
      .map { case (y, g) => y.toLong -> g.size.toLong }
    val maxY = m.keys.max
    val pts = (0L to maxY).map { y2 =>
      val rge = m.filter(_._1 >= y2).values.sum
      (63L - java.lang.Long.numberOfLeadingZeros(rge), y2)
    }
    val n = BigInt(pts.size)
    val sx = BigInt(pts.map(_._1).sum); val sy = BigInt(pts.map(_._2).sum)
    val sxy = pts.map { case (x, y) => BigInt(x) * y }.sum
    val sx2 = pts.map { case (x, _) => BigInt(x) * x }.sum
    val den = n * sx2 - sx * sx
    assert(den != 0, "fixture must have x-spread")
    assert(got.getAs[Long]("n_points") == pts.size &&
      got.getAs[Long]("slope_milli") ==
        ((BigInt(1000) * (n * sxy - sx * sy)) / den).toLong &&
      got.getAs[Long]("intercept_milli") ==
        ((BigInt(1000) * (sy * sx2 - sx * sxy)) / den).toLong)
    // degenerate: one gram repeated -> every rank bucket has x = 0
    val degen = graft.operators.TextStats.zipfSlope(
      Seq((1L, "aaaa")).toDF("doc_id", "text")).collect()(0)
    assert(degen.isNullAt(degen.fieldIndex("slope_milli")))
  }

  test("gopherRules: hand-built docs trip each rule independently") {
    import spark.implicits._
    val docs = Seq(
      // 60 normal-length words with stopword evidence, mean word
      // length 4.2 -> passes every rule
      ("s1", (("the quick brown foxes jumped over the lazy dogs and " * 6)
        .trim)),
      // same shape but only 10 words -> word-count violation alone
      ("s1", "the quick brown foxes jumped over the lazy dogs and"),
      // long rare words, no stopwords -> mwl + stopword violations
      ("s2", ("organizationally " * 60).trim),
      // digits -> alpha-share violation (plus stopword shortfall)
      ("s2", (("12345 67890 " * 30).trim))
    ).toDF("source", "text")
    val r = TextStats.gopherRules(docs).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    val s1 = r("s1"); val s2 = r("s2")
    assert(s1.getAs[Long]("n_docs") == 2 &&
      s1.getAs[Long]("viol_word_count") == 1 &&
      s1.getAs[Long]("viol_mean_word_len") == 0 &&
      s1.getAs[Long]("viol_stopwords") == 0 &&
      s1.getAs[Long]("viol_alpha_share") == 0 &&
      s1.getAs[Long]("n_pass") == 1 &&
      s1.getAs[Long]("pass_bp") == 5000)
    assert(s2.getAs[Long]("viol_mean_word_len") == 1 && // 17-char words
      s2.getAs[Long]("viol_stopwords") == 2 &&
      s2.getAs[Long]("viol_alpha_share") == 1 &&
      s2.getAs[Long]("n_pass") == 0)
  }

  test("lmBuckets: tercile cuts at the value domain; a uniform corpus " +
      "lands entirely in one bucket per source") {
    import spark.implicits._
    // identical docs -> identical mean_bp -> cum*3 >= n at the single
    // value -> everything is 'tail' by the <= c_tail rule
    val docs = (1L to 6L).map(i => (i, "alpha beta alpha beta", "s" + (i % 2)))
      .toDF("doc_id", "text", "source")
    val r = TextStats.lmBuckets(docs).collect()
    assert(r.length == 2 && r.forall(_.getAs[String]("bucket") == "tail"))
    assert(r.map(_.getAs[Long]("n_docs")).sum == 6)
  }

  test("lengthBands: p10/p50/p90 from a known distribution") {
    import spark.implicits._
    val docs = ((1 to 10).map(i => ("en", i.toLong * 10)) ++
      Seq(("fr", 7L))).toDF("lang", "n_chars")
    val r = TextStats.lengthBands(docs).collect()
      .map(x => x.getAs[String]("lang") -> x).toMap
    val en = r("en")
    // cum*10 >= n at the 1st value (10); cum*2 >= n at the 5th (50);
    // cum*10 >= 9n at the 9th (90)
    assert(en.getAs[Long]("n_docs") == 10 &&
      en.getAs[Long]("p10_chars") == 10 &&
      en.getAs[Long]("p50_chars") == 50 &&
      en.getAs[Long]("p90_chars") == 90)
    assert(r("fr").getAs[Long]("p50_chars") == 7)
  }

  test("rakePhrases: hand-computed deg/freq scores on a two-phrase doc") {
    import spark.implicits._
    // phrases: [red green] [red] — freq(red)=2, deg(red)=2+1=3;
    // freq(green)=1, deg(green)=2
    val docs = Seq((1L, "red green the red")).toDF("doc_id", "text")
    val r = TextStats.rakePhrases(docs).collect()
      .map(x => x.getAs[String]("phrase") -> x).toMap
    val sRed = (1000000L * 3) / 2   // 1500000
    val sGreen = (1000000L * 2) / 1 // 2000000
    assert(r("red green").getAs[Long]("score_micro") == sRed + sGreen)
    assert(r("red").getAs[Long]("score_micro") == sRed)
    assert(r("red green").getAs[Long]("n_words") == 2)
    assert(r("red").getAs[Long]("n_occ") == 1)
  }

  test("heapsLaw: first-seen-bucket accounting makes cum_vocab the " +
      "exact prefix vocabulary; repeated tokens add mass, not vocab") {
    import spark.implicits._
    // doc_ids 0..19 land one per bucket (20 buckets over [0,19]).
    // Doc 0: "a b", doc 10: "a c" (a repeats, c is new), doc 19: "a".
    val docs = Seq((0L, "a b"), (10L, "a c"), (19L, "a"))
      .toDF("doc_id", "text")
    val rows = graft.operators.TextStats.heapsLaw(docs).collect()
      .map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(rows(0L).getAs[Long]("n_docs") == 1 &&
      rows(0L).getAs[Long]("n_tokens") == 2 &&
      rows(0L).getAs[Long]("cum_vocab") == 2)
    assert(rows(10L).getAs[Long]("new_vocab") == 1 &&
      rows(10L).getAs[Long]("cum_vocab") == 3 &&
      rows(10L).getAs[Long]("cum_tokens") == 4)
    assert(rows(19L).getAs[Long]("new_vocab") == 0 &&
      rows(19L).getAs[Long]("cum_vocab") == 3 &&
      rows(19L).getAs[Long]("cum_docs") == 3)
    // only buckets with docs emit rows; cumulative columns still span
    assert(rows.size == 3)
  }

  test("featureHashing: repeated tokens pile into one bucket, token " +
      "totals conserve, norm2 bounds hold") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x x x"),            // one token type -> one bucket, c=3
      (2L, "a b c d e"),        // five types across <=5 buckets
      (3L, "")                  // no tokens -> no row
    ).toDF("doc_id", "text")
    val got = TextStats.featureHashing(docs, d = 64)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L), "empty doc must not emit")
    assert(got(0) == ((1L, 3L, 1L, 9L)))
    val (_, n2, nnz2, norm2) = got(1)
    assert(n2 == 5L && nnz2 >= 1L && nnz2 <= 5L)
    assert(norm2 >= n2 && norm2 <= n2 * n2,
      "norm2 must sit between the no-collision and all-collision bounds")
    val again = TextStats.featureHashing(docs.repartition(5), d = 64)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("vocabDrift: identical per-doc text reads zero TV distance; " +
      "token totals and shared vocab add up") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, "x x")).toDF("doc_id", "text")
    val r = TextStats.vocabDrift(docs).head()
    assert(r.getAs[Long]("n_tokens_a") > 0 &&
      r.getAs[Long]("n_tokens_b") > 0,
      "both scrambled halves must be populated")
    assert(r.getAs[Long]("n_tokens_a") + r.getAs[Long]("n_tokens_b") == 80L)
    assert(r.getAs[Long]("vocab_a") == 1L &&
      r.getAs[Long]("vocab_b") == 1L &&
      r.getAs[Long]("vocab_shared") == 1L)
    assert(r.getAs[Long]("tv_ppm") == 0L,
      "identical distributions must read zero drift")
  }

  test("sourceClassifier: separable vocabularies classify perfectly, " +
      "every held-out doc lands on the diagonal") {
    import spark.implicits._
    // disjoint vocabularies -> a held-out doc scores > 0 only for its
    // own source, so the confusion matrix must be purely diagonal
    val docs = ((0L until 50L).map(i => (i, "alpha", "xx yy xx zz")) ++
      (50L until 100L).map(i => (i, "beta", "qq rr qq ss")))
      .toDF("doc_id", "source", "text")
    val got = TextStats.sourceClassifier(docs)
      .orderBy("source", "predicted")
      .as[(String, String, Long)].collect().toSeq
    assert(got.forall(r => r._1 == r._2), got.mkString(","))
    // every held-out (bucket >= 80) doc is scored exactly once
    val nTest = docs.filter(
      graft.operators.Sampling.bucket(col("doc_id")) >= 80).count()
    assert(got.map(_._3).sum == nTest && nTest > 0)
  }

  test("sourceClassifier: ties break to the lexicographically first " +
      "source and scores are train-frequency ppm sums") {
    import spark.implicits._
    // identical vocabulary and frequencies in both sources -> every
    // test doc ties -> everything predicted as the first source name
    val docs = ((0L until 40L).map(i => (i, "s_b", "tok tok")) ++
      (40L until 80L).map(i => (i, "s_a", "tok tok")))
      .toDF("doc_id", "source", "text")
    val got = TextStats.sourceClassifier(docs)
      .as[(String, String, Long)].collect().toSeq
    assert(got.nonEmpty && got.forall(_._2 == "s_a"), got.mkString(","))
  }

  test("qualityCbp is quality() x 1e4 in exact integers, truncating " +
      "toward zero on punct-heavy (negative) text") {
    import spark.implicits._
    val got = Seq((1L, "the x"), (2L, "ab!"), (3L, "!!!"))
      .toDF("doc_id", "text")
      .select(TextStats.qualityCbp(col("text")).as("q")).orderBy("q")
      .as[Long].collect().toSeq
    // "the x": 1e6*1/5 = 200000; "ab!": -10000//3 = -3333 (toward
    // zero, not -3334); "!!!": -30000//3 = -10000
    assert(got == Seq(-10000L, -3333L, 200000L), got.mkString(","))
  }

  /** Stop-rich vs junk corpus: the distillation label is learnable
    * from the stopword-token feature, so 12 GD rounds must separate
    * it. Doc lengths vary so no feature is constant (sigma > 1).
    */
  private def lrCorpus = {
    import spark.implicits._
    val rich = (0L until 12L).map(i => (i,
      ("the cat and a dog of it to " * (1 + (i % 3).toInt)).trim))
    val junk = (12L until 24L).map(i => (i,
      ("zap qux blorp!!! wug??? " * (1 + (i % 3).toInt)).trim))
    (rich ++ junk).toDF("doc_id", "text")
  }

  test("lrQualityTrain: trajectory is rounds+1 rows from zero init, " +
      "deterministic, and the fit separates a separable corpus") {
    import spark.implicits._
    val traj = TextStats.lrQualityTrain(lrCorpus, rounds = 12)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(traj.size == 13 && traj.head == ((0L, 0L, 0L, 0L, 0L)))
    assert(traj.map(_._1) == (0L to 12L))
    // stopword weight learned positive: x1 is the separating feature
    assert(traj.last._3 > 0, traj.last.toString)
    // bit-exact determinism: a fresh run reproduces every round
    val again = TextStats.lrQualityTrain(lrCorpus, rounds = 12)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(again == traj)
    // the learned boundary classifies the training corpus perfectly
    // (it is linearly separable in x1 alone)
    val fin = TextStats.lrQualityTrain(lrCorpus, rounds = 12)
      .filter(col("r") === 12L)
    val scored = TextStats.lrQualityScoreFromWeights(
      TextStats.lrQualityStd(lrCorpus), fin)
    val (n, correct) = scored.agg(count(lit(1)),
      sum(when(col("pred") === col("y"), 1L).otherwise(0L)))
      .as[(Long, Long)].collect().head
    assert(n == 24L && correct == 24L, s"$correct/$n")
  }

  test("lrQualityScore: p_bp stays inside (0, 10000) and pred is the " +
      "sign of the margin") {
    import spark.implicits._
    val fin = TextStats.lrQualityTrain(lrCorpus, rounds = 12)
      .filter(col("r") === 12L)
    val rows = TextStats.lrQualityScoreFromWeights(
      TextStats.lrQualityStd(lrCorpus), fin)
      .select(col("z_bp"), col("p_bp"), col("pred"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, p, _) => p > 0L && p < 10000L })
    assert(rows.forall { case (z, _, pr) => pr == (if (z >= 0) 1L else 0L) })
  }

  test("lrQualityCalibration: bins partition the corpus and rates " +
      "are exact bp") {
    import spark.implicits._
    val fin = TextStats.lrQualityTrain(lrCorpus, rounds = 12)
      .filter(col("r") === 12L)
    val scored = TextStats.lrQualityScoreFromWeights(
      TextStats.lrQualityStd(lrCorpus), fin)
    val bins = TextStats.lrQualityCalibration(scored)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(bins.map(_._2).sum == 24L)
    assert(bins.forall { case (b, _, mp, emp, gap) =>
      b >= 0 && b <= 9 && mp >= b * 1000 && mp < (b + 1) * 1000 &&
        emp >= 0 && emp <= 10000 && gap == math.abs(mp - emp)
    }, bins.mkString(","))
  }

  test("lrQualityAgreement: exact Cohen's kappa incl. the negative " +
      "(worse-than-chance) branch and the pe=1 NULL guard") {
    import spark.implicits._
    // 2+1+1+2 confusion: po = 6666 bp, pe = 5000 bp, kappa = 3332 bp
    val mixed = Seq((0L, 0L), (0L, 0L), (0L, 1L), (1L, 0L),
      (1L, 1L), (1L, 1L)).toDF("y", "pred")
    val got = TextStats.lrQualityAgreement(mixed)
      .select("n00", "n01", "n10", "n11", "po_bp", "pe_bp", "kappa_bp")
      .as[(Long, Long, Long, Long, Long, Long, Option[Long])]
      .collect().head
    assert(got == ((2L, 1L, 1L, 2L, 6666L, 5000L, Some(3332L))),
      got.toString)
    // perfectly anti-correlated: kappa = -10000 (signed idiv path)
    val anti = Seq((0L, 1L), (0L, 1L), (1L, 0L), (1L, 0L))
      .toDF("y", "pred")
    val k2 = TextStats.lrQualityAgreement(anti)
      .select("kappa_bp").as[Option[Long]].collect().head
    assert(k2.contains(-10000L), k2.toString)
    // constant labeler pair: pe = 10000 -> NULL, not a throw
    val const = Seq((1L, 1L), (1L, 1L), (1L, 1L)).toDF("y", "pred")
    val k3 = TextStats.lrQualityAgreement(const)
      .select("kappa_bp").as[Option[Long]].collect().head
    assert(k3.isEmpty, k3.toString)
  }

  test("lrQualityTrain on an empty / zero-token corpus returns just " +
      "the zero init row and nothing throws") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val traj = TextStats.lrQualityTrain(empty, rounds = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(traj == Seq((0L, 0L, 0L, 0L, 0L)))
    // all-whitespace docs are dropped by the zero-token filter -> same
    val blank = Seq((1L, "   "), (2L, "\t")).toDF("doc_id", "text")
    val traj2 = TextStats.lrQualityTrain(blank, rounds = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(traj2 == Seq((0L, 0L, 0L, 0L, 0L)))
  }
}
