package graft

import graft.operators.Basket
import org.scalatest.funsuite.AnyFunSuite

class BasketSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // 4 baskets: items 10/20 co-occur in baskets 1 and 2; item 30 is a
  // singleton (Apriori-prunable); duplicate rows exercise the distinct
  private def baskets = {
    import spark.implicits._
    Seq((1L, 10L), (1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L),
      (3L, 10L), (4L, 20L)).toDF("basket", "item")
  }

  test("frequentPairs: exact support, lift and cosine² on a " +
      "hand-computed basket set; multiplicity ignored") {
    import spark.implicits._
    val got = Basket.frequentPairs(baskets, minItemSup = 2L,
        minPairSup = 2L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // supports: 10→3, 20→3, 30→1 (pruned); pair (10,20): n_ab=2, N=4
    // lift  = 10⁶·2·4 div 9 = 888888;  cos² = 10⁶·2² div 9 = 444444
    assert(got == Seq((10L, 20L, 2L, 3L, 3L, 888888L, 444444L)))
  }

  test("frequentPairs: the item-support floor prunes pairs even when " +
      "their pair support clears minPairSup (downward-closure floor " +
      "raised above the pair threshold)") {
    val strict = Basket.frequentPairs(baskets, minItemSup = 4L,
      minPairSup = 2L)
    // items 10/20 have support 3 < 4 — nothing survives the prefilter
    assert(strict.count() == 0)
  }

  test("rules: both directions scored by exact integer confidence; " +
      "the confidence floor prunes directionally") {
    import spark.implicits._
    // (10,20): n_ab=2, n_10=3, n_20=3 → conf both ways = 10⁴·2 div 3
    // = 6666; a floor of 6667 kills both, 6666 keeps both
    val got = Basket.rules(baskets, minItemSup = 2L, minPairSup = 2L,
        minConfBp = 6666L)
      .orderBy("ante")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((10L, 20L, 3L, 3L, 2L, 6666L, 888888L),
      (20L, 10L, 3L, 3L, 2L, 6666L, 888888L)))
    assert(Basket.rules(baskets, minItemSup = 2L, minPairSup = 2L,
      minConfBp = 6667L).count() == 0)
  }

  test("rules: asymmetric supports give asymmetric confidence — only " +
      "the rare→common direction clears a high floor") {
    import spark.implicits._
    // item 7 in 2 baskets, item 8 in 4; they co-occur twice:
    // 7→8 conf = 10000, 8→7 conf = 5000
    val b = Seq((1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L),
      (3L, 8L), (4L, 8L)).toDF("basket", "item")
    val got = Basket.rules(b, minItemSup = 2L, minPairSup = 2L,
        minConfBp = 7500L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._6)) == Seq((7L, 8L, 10000L)))
  }

  test("itemNeighbors: symmetrized per-item top-k with deterministic " +
      "tie-break") {
    import spark.implicits._
    val got = Basket.itemNeighbors(baskets, k = 1, minItemSup = 2L,
        minPairSup = 2L)
      .orderBy("item")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    assert(got == Seq((10L, 1, 20L, 2L, 444444L),
      (20L, 1, 10L, 2L, 444444L)))
  }
}
