package graft

import graft.functions.{sdbm_hash, SdbmHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** F6 fidelity (reference Query.java:303-316): the Catalyst expression
  * must agree bit-for-bit with the direct Scala port, which itself is
  * property-pinned against an independent fold on seeded-random
  * unicode strings.
  */
class SdbmHashSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** Independent fold for the oracle (mirrors Query.java literally). */
  private def oracle(seed: Long, s: String): Long = {
    if (s == null) return 0L
    var hash = seed
    for (c <- s.toCharArray) hash = c + (hash << 6) + (hash << 16) - hash
    if (hash > 0) hash else ~hash + 1
  }

  private def randomStrings(n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    (1 to n).map { _ =>
      val len = rnd.nextInt(40)
      val s = new String((0 until len).map { _ =>
        // valid UTF-8-round-trippable chars only: source strings come
        // from UTF-8 (Cassandra wire / parquet), so unpaired surrogates
        // cannot occur in real data.
        rnd.nextInt(3) match {
          case 0 => (32 + rnd.nextInt(95)).toChar            // ascii
          case 1 => (0x100 + rnd.nextInt(0x2000)).toChar     // latin/greek/cyrillic…
          case 2 => (0x4E00 + rnd.nextInt(0x1000)).toChar    // cjk
        }
      }.toArray)
      (rnd.nextLong(), s)
    }
  }

  test("known foldings") {
    // single char 'a' with seed 0: h = 97 + 0 + 0 - 0 = 97
    assert(SdbmHash.hash(0L, "a") == 97L)
    assert(SdbmHash.hash(0L, "") == 0L)
    assert(SdbmHash.hash(42L, "") == 42L)
    assert(SdbmHash.hash(0L, null) == 0L)
    assert(SdbmHash.hash(123L, null) == 0L)
  }

  test("matches oracle on 2000 random unicode strings and seeds") {
    for ((seed, s) <- randomStrings(2000)) {
      assert(SdbmHash.hash(seed, s) == oracle(seed, s), s"seed=$seed s=$s")
    }
  }

  test("non-negative except the MIN_VALUE edge") {
    for ((seed, s) <- randomStrings(2000)) {
      val h = SdbmHash.hash(seed, s)
      assert(h >= 0L || h == Long.MinValue)
    }
  }

  test("seed sensitivity") {
    assert(SdbmHash.hash(1L, "abc") != SdbmHash.hash(2L, "abc"))
  }

  test("catalyst expression (codegen path) agrees with the Scala impl") {
    import spark.implicits._
    val rows = Seq(
      (0L, "hello world"), (42L, ""), (-7L, "ünïcödé ☃ snowman"),
      (Long.MaxValue, "overflow"), (Long.MinValue, "x"),
      (17L, "[1,2,3]")) ++ randomStrings(200)
    val df = rows.toDF("seed", "s")
    val got = df.select(sdbm_hash(col("seed"), col("s")).as("h"))
      .as[Long].collect()
    val want = rows.map { case (b, s) => SdbmHash.hash(b, s) }
    assert(got.toSeq == want)
  }

  test("expression handles null strings as 0") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None)).toDF("seed", "s")
    val got = df.select(sdbm_hash(col("seed"), col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(got == Seq(SdbmHash.hash(1L, "a"), 0L))
  }
}
