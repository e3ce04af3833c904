package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-basket co-occurrence mining over (basket, item) pairs — the
  * association side of the catalog analytics family ([[Graph.triangles]]
  * already PROJECTS baskets to a co-purchase graph; this module keeps
  * the support/association statistics that projection throws away).
  *
  * The algorithmic spine is the Apriori downward-closure prefilter
  * (Agrawal & Srikant, VLDB 1994): a pair's support cannot exceed
  * either item's support, so items below `minItemSup` are pruned
  * BEFORE the within-basket pair expansion. At 100 TB that ordering is
  * the whole game — the expansion is quadratic in basket size and the
  * long tail of rare items is most of the item vocabulary, so pruning
  * first shrinks both the exploded frame and the pair aggregation's
  * key space. The expansion itself is a self-equi-join on the basket
  * key (bounded by basket size, never corpus size — the same bound
  * [[Graph.triangles]] relies on), followed by one hash aggregation on
  * the pair key. Item supports ride the pruned frame, so the pair
  * frame never re-joins the item-count table; the single-row basket
  * total attaches as a bounded 1-row broadcast.
  *
  * Association strength is reported as EXACT integer statistics, both
  * monotone in their real-valued versions, so cross-engine results are
  * bit-identical (truncating `div` on both sides):
  *   - `lift_micro`  = 10⁶·n_ab·N div (n_a·n_b)       (lift)
  *   - `cos2_micro`  = 10⁶·n_ab² div (n_a·n_b)        (cosine², the
  *     binarized item-item similarity of collaborative filtering)
  */
object Basket {

  /** Frequent co-occurring item pairs with support, lift and cosine².
    * `baskets`: (basket: long, item: long), multiplicity ignored.
    * Returns (p1, p2, n_ab, n_a, n_b, lift_micro, cos2_micro) for
    * pairs with pair support ≥ `minPairSup` and both item supports ≥
    * `minItemSup`, p1 < p2.
    */
  def frequentPairs(baskets: DataFrame, minItemSup: Long = 5L,
      minPairSup: Long = 2L): DataFrame = {
    require(minItemSup >= 1 && minPairSup >= 1)
    val it = baskets.select(col("basket"), col("item")).distinct()
    val nBaskets = it.select(col("basket")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    // Apriori prune: items too rare to ever reach minPairSup (or the
    // item-level floor) leave before the quadratic expansion
    val sup = it.groupBy(col("item"))
      .agg(count(lit(1)).as("n_i"))
      .filter(col("n_i") >= math.max(minItemSup, minPairSup))
    val pruned = it.join(sup, "item")
    val d = (c: Column) => c.cast("decimal(38,0)")
    val pairs = pruned.as("i").join(pruned.as("j"),
        col("i.basket") === col("j.basket") &&
          col("i.item") < col("j.item"))
      .groupBy(col("i.item").as("p1"), col("j.item").as("p2"),
        col("i.n_i").as("n_a"), col("j.n_i").as("n_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSup)
    pairs.crossJoin(nBaskets) // 1-row broadcast
      .withColumn("ln", lit(1000000L) * d(col("n_ab")) * d(col("n_baskets")))
      .withColumn("cn", lit(1000000L) * d(col("n_ab")) * d(col("n_ab")))
      .withColumn("dn", d(col("n_a")) * d(col("n_b")))
      .select(col("p1"), col("p2"), col("n_ab"), col("n_a"), col("n_b"),
        expr("ln div dn").as("lift_micro"),
        expr("cn div dn").as("cos2_micro"))
  }

  /** Directional association rules A → B from the frequent 2-itemsets
    * (the rule-generation step of Agrawal & Srikant 1994 restricted to
    * pair rules): each surviving pair yields both directions, scored
    * by exact integer confidence and lift, and the confidence floor
    * prunes the output. All inputs to `idiv`-style truncation are
    * non-negative counts, so both engines truncate identically.
    * Returns (ante, cons, n_ante, n_cons, n_ab, conf_bp, lift_micro)
    * with conf_bp = 10⁴·n_ab div n_ante.
    */
  def rules(baskets: DataFrame, minItemSup: Long = 5L,
      minPairSup: Long = 2L, minConfBp: Long = 1000L): DataFrame =
    rulesFromPairs(frequentPairs(baskets, minItemSup, minPairSup),
      minConfBp)

  /** [[rules]] over an already-materialized [[frequentPairs]] frame —
    * the memoized-pipeline entry point (pairs, neighbors, and rules
    * all derive from one pair materialization).
    */
  def rulesFromPairs(p: DataFrame, minConfBp: Long = 1000L): DataFrame = {
    val dirs = p.select(col("p1").as("ante"), col("p2").as("cons"),
        col("n_a").as("n_ante"), col("n_b").as("n_cons"), col("n_ab"),
        col("lift_micro"))
      .unionByName(p.select(col("p2").as("ante"), col("p1").as("cons"),
        col("n_b").as("n_ante"), col("n_a").as("n_cons"), col("n_ab"),
        col("lift_micro")))
    dirs.withColumn("conf_bp", expr("10000 * n_ab div n_ante"))
      .filter(col("conf_bp") >= minConfBp)
      .select(col("ante"), col("cons"), col("n_ante"), col("n_cons"),
        col("n_ab"), col("conf_bp"), col("lift_micro"))
  }

  /** Per-item nearest neighbors by binarized cosine: symmetrize
    * [[frequentPairs]] and keep each item's `k` strongest associates
    * (ties broken by neighbor id — deterministic). The per-item top-k
    * is a WindowGroupLimit-eligible rank window partitioned by item:
    * it shuffles on the item key once and truncates groups early, the
    * per-key-top-k shape that survives skew at catalog scale.
    */
  def itemNeighbors(baskets: DataFrame, k: Int = 3,
      minItemSup: Long = 5L, minPairSup: Long = 2L): DataFrame =
    neighborsFromPairs(frequentPairs(baskets, minItemSup, minPairSup), k)

  /** [[itemNeighbors]] over an already-materialized [[frequentPairs]]
    * frame.
    */
  def neighborsFromPairs(p: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1)
    val sym = p.select(col("p1").as("item"), col("p2").as("neighbor"),
        col("n_ab"), col("cos2_micro"))
      .unionByName(p.select(col("p2").as("item"), col("p1").as("neighbor"),
        col("n_ab"), col("cos2_micro")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("cos2_micro").desc, col("neighbor"))
    sym.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("item"), col("rk"), col("neighbor"), col("n_ab"),
        col("cos2_micro"))
  }
}
