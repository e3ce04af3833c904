package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("pageRank: hand-computed ranks on a two-node chain with a sink") {
    import spark.implicits._
    // 1 → 2 only. n=2, init=5e11, base=(5e11·15)//100=7.5e10.
    // r1(1)=base (no inflow); r1(2)=base+(5e11·85)//100=5e11
    // r2(2)=base+(7.5e10·85)//100=1.3875e11; r3 = r2 (fixed point of
    // the truncated recurrence for this chain)
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 75000000000L), (2L, 138750000000L)))
  }

  test("pageRank: symmetric two-cycle holds mass; determinism across " +
      "runs; hub outranks leaves on a star") {
    import spark.implicits._
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val c = Graph.pageRank(cyc, iters = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(c == Seq((1L, 500000000000L), (2L, 500000000000L)))
    // star: leaves 2..5 ↔ hub 1; the hub accumulates rank
    val star = (2L to 5L).flatMap(l => Seq((l, 1L), (1L, l)))
      .toDF("src", "dst")
    def run() = Graph.pageRank(star, iters = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val r = run()
    assert(r == run())
    val ranks = r.toMap
    assert((2L to 5L).forall(l => ranks(1L) > ranks(l)))
    assert((3L to 5L).forall(l => ranks(l) == ranks(2L)),
      "symmetric leaves must tie exactly")
  }

  test("pageRankConverged exits early at the truncated fixed point " +
      "and matches the fixed-iteration twin at its exit count") {
    import spark.implicits._
    // 1 → 2 reaches its fixed point at iteration 2 (GraphSpec above
    // hand-computes r3 = r2), so tol=0 must stop at 3: the iteration
    // that observes zero movement. maxIters=20 left untouched.
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val (ranks, iters) = Graph.pageRankConverged(edges, maxIters = 20,
      tolMicro = 0L)
    assert(iters < 20, "no early exit")
    val got = ranks.orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 75000000000L), (2L, 138750000000L)))
    // equivalence with the oracle-gated twin at the same depth
    val fixed = Graph.pageRank(edges, iters = iters)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == fixed)
    // a tolerance wider than the first step's movement stops at 1
    val (_, one) = Graph.pageRankConverged(edges, maxIters = 20,
      tolMicro = Long.MaxValue / 2)
    assert(one == 1)
  }

  test("triangles: hand-computed census on K4 + a path + an isolated " +
      "edge; duplicate/reversed input edges collapse") {
    import spark.implicits._
    // K4 on 1..4 (each unordered pair once, some reversed, one dup),
    // a 3-path 5-6-7 (no triangle), and an isolated edge 8-9
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (3L, 2L), (2L, 4L), (4L, 3L),
      (2L, 1L), // reversed duplicate
      (5L, 6L), (6L, 7L), (8L, 9L)).toDF("src", "dst")
    val got = Graph.triangles(edges).orderBy("node")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // K4: deg 3, C(3,2)=3 triangles per node, cc = 2·3/(3·2) = 1
    assert(got == Seq(
      (1L, 3L, 3L, 1000000L), (2L, 3L, 3L, 1000000L),
      (3L, 3L, 3L, 1000000L), (4L, 3L, 3L, 1000000L),
      (5L, 1L, 0L, 0L), (6L, 2L, 0L, 0L), (7L, 1L, 0L, 0L),
      (8L, 1L, 0L, 0L), (9L, 1L, 0L, 0L)))
  }

  test("labelPropagation: disjoint triangles converge to their min " +
      "node id in two rounds") {
    import spark.implicits._
    // round 1 on a triangle: each node ties between its two peers'
    // labels → min label; round 2: min id floods the component
    def tri(a: Long) =
      Seq((a, a + 1), (a + 1, a + 2), (a + 2, a)).flatMap {
        case (u, v) => Seq((u, v), (v, u))
      }
    val edges = (tri(1L) ++ tri(10L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (10L, 10L), (11L, 10L), (12L, 10L)))
  }

  test("labelPropagation: a source-only node keeps its own label; " +
      "the documented synchronous oscillation on a 2-cycle is " +
      "deterministic") {
    import spark.implicits._
    // 1 → 2 directed only: node 1 has no in-edges, keeps label 1
    val chain = Seq((1L, 2L)).toDF("src", "dst")
    val g1 = Graph.labelPropagation(chain, iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(g1 == Seq((1L, 1L), (2L, 1L)))
    // undirected pair: synchronous swap each round — after an even
    // round count every node is back to its own label, exactly as the
    // scaladoc warns for bipartite structure
    val pair = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val even = Graph.labelPropagation(pair, iters = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(even == Seq((1L, 1L), (2L, 2L)))
    val odd = Graph.labelPropagation(pair, iters = 1)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(odd == Seq((1L, 2L), (2L, 1L)))
  }

  test("sssp: weighted shortcut loses to the multi-hop path once " +
      "rounds admit it — exact Bellman–Ford semantics at each depth") {
    import spark.implicits._
    // chain 1→2→3→4→5 at w=1 each, plus a direct 1→5 at w=10
    val edges = (Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .map { case (a, b) => (a, b, 1L) } :+ (1L, 5L, 10L))
      .toDF("src", "dst", "w")
    val r3 = Graph.sssp(edges, rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // ≤3-edge paths: node 5 still rides the w=10 shortcut
    assert(r3 == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 10L)))
    val r4 = Graph.sssp(edges, rounds = 4)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // the 4-edge chain (cost 4) now undercuts the shortcut
    assert(r4 == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L)))
  }

  test("kCore: pendant nodes peel off, the triangle survives as the " +
      "2-core, and extra rounds are a no-op once converged") {
    import spark.implicits._
    // triangle 1-2-3 plus pendant 4 hanging off 1, both directions
    val und = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = Graph.kCore(edges, k = 2, rounds = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    val converged = Graph.kCore(edges, k = 2, rounds = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(converged == got, "peel had converged by round 2")
    // k above the max degree empties the core
    assert(Graph.kCore(edges, k = 4, rounds = 2).count() == 0)
  }

  test("assortativity: a star is perfectly disassortative " +
      "(slope −1, r² 1) — exact rationals, no drift") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
      .toDF("src", "dst")
    val row = Graph.assortativity(edges).collect().head
    assert(row.getAs[Long]("n_edges") == 4L)
    assert(row.getAs[Long]("sx") == 6L && row.getAs[Long]("sy") == 6L)
    assert(row.getAs[Double]("slope") == -1.0)
    assert(row.getAs[Double]("r2") == 1.0)
  }

  test("bfsLevels: exact hop distances on a path from the minimal " +
      "source, capped at maxHops, unreachable component absent") {
    import spark.implicits._
    // path 1→2→3→4→5 plus a disconnected edge 8→9; source = min src = 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (8L, 9L))
      .toDF("src", "dst")
    val got = Graph.bfsLevels(edges, maxHops = 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    // node 5 is 4 hops away (cut by the cap); 8/9 unreachable
    assert(got == Seq((1L, 0L), (2L, 1L), (3L, 2L), (4L, 3L)))
  }

  test("multiSourceBfsLevels: landmarks expand simultaneously in one " +
      "composite-keyed frame, each with its own distances") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("src", "dst")
    val got = Graph.multiSourceBfsLevels(edges, nSources = 2,
        maxHops = 3)
      .orderBy("source", "node")
      .as[(Long, Long, Long)].collect().toSeq
    // sources = two smallest srcs {1, 2}
    assert(got == Seq((1L, 1L, 0L), (1L, 2L, 1L), (1L, 3L, 2L),
      (2L, 2L, 0L), (2L, 3L, 1L)))
  }

  test("bfsLevels keeps the MINIMAL hop when multiple paths reach a " +
      "node (anti-join settles nodes at first discovery)") {
    import spark.implicits._
    // diamond 1→{2,3}→4 plus the shortcut 1→4: hop(4) must be 1
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (1L, 4L))
      .toDF("src", "dst")
    val got = Graph.bfsLevels(edges, maxHops = 3)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("pageRank contribution join under hub skew: AQE splits the hot " +
      "source partition at runtime, ranks bit-identical across configs") {
    // the straggler regime graph_degree_dist documents, amplified: one
    // hub emits ~97% of all edges, so the source-keyed contribution
    // join parks nearly every edge in one static shuffle partition.
    // Child session scales the AQE skew thresholds to fixture size
    // (production differs only in the numbers: 256 MB / factor 5) and
    // forces SMJ, the at-scale shape where the rank frame is
    // node-count-sized and not broadcastable.
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    ss.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.shuffle.partitions", "8")
    def mkEdges(s: org.apache.spark.sql.SparkSession) = {
      val hub = s.range(1, 60001)
        .select(lit(0L).as("src"), col("id").as("dst"))
      val tail = s.range(1, 2001)
        .select(col("id").as("src"), (col("id") + 1).as("dst"))
      hub.unionByName(tail)
    }
    val edges = mkEdges(ss).localCheckpoint()
    // execute the EXACT frame pageRank iterates (shared builder), with
    // the round-0 inputs pageRank would hand it
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val r0 = nodes.withColumn("rank_micro",
      lit(1000000000000L / nodes.count()))
    val contrib = Graph.pageRankContrib(edges, outdeg, r0)
    assert(contrib.collect().nonEmpty)
    val p = contrib.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(400))
    assert(p.contains("skew=true"),
      s"AQE did not split the hub partition:\n${p.take(2000)}")
    // output invariance: the full operator under the skew-splitting
    // config equals the default session's run on the same edge set
    val skewRanks = Graph.pageRank(edges, iters = 2)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val defRanks = Graph.pageRank(mkEdges(spark), iters = 2)
      .orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(skewRanks == defRanks)
  }

  test("linkPrediction: hand-computed common-neighbor/Jaccard scores; " +
      "the hub via is dropped before wedging and its exclusive node " +
      "vanishes with it") {
    import spark.implicits._
    // vias 10:{1,2}, 11:{1,2,3}, 12:{3}; hub 99:{1,2,3,4} exceeds
    // maxHubDeg=3 → dropped, so node 4 (hub-only) never appears and
    // degrees are computed in the capped universe (all = 2)
    val inc = Seq((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L),
      (3L, 11L), (3L, 12L), (1L, 99L), (2L, 99L), (3L, 99L),
      (4L, 99L), (1L, 10L)) // dup incidence must collapse
      .toDF("node", "via")
    val got = Graph.linkPrediction(inc, maxHubDeg = 3, k = 10)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 2L, 2L, 10000L),
      (1L, 3L, 1L, 2L, 2L, 3333L),
      (2L, 3L, 1L, 2L, 2L, 3333L)))
  }

  test("modularity: hand-computed terms on two triangles — an " +
      "edgeless community floors its NEGATIVE term (not truncates)") {
    import spark.implicits._
    // triangles 1-2-3 and 4-5-6, symmetrized → |E₂| = 12; labels put
    // the unconnected pair {1,4} in community 9: its term is
    // floor(−16e6/144) = −111112 (truncation would give −111111)
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val labels = Seq((1L, 9L), (4L, 9L), (2L, 2L), (3L, 2L),
      (5L, 5L), (6L, 5L)).toDF("node", "label")
    val got = Graph.modularity(edges, labels)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 2L, 2L, 4L, 55555L),
      (5L, 2L, 2L, 4L, 55555L), (9L, 2L, 0L, 4L, -111112L)))
  }

  test("randomWalks: every hop follows an edge, no walk strands on a " +
      "symmetrized graph, corpus is partitioning-stable") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.randomWalks(edges, maxStartId = 20L, steps = 3)
      .orderBy("start", "step")
      .as[(Long, Long, Long)].collect().toSeq
    // 4 starts x steps 0..3, none strand
    assert(got.size == 16, got.mkString(","))
    assert(got.count(_._2 == 0L) == 4 && got.count(_._2 == 3L) == 4)
    // step 0 is the start itself; every later hop is a real edge
    val edgeSet = (und ++ und.map(_.swap)).toSet
    val byStart = got.groupBy(_._1).values
    byStart.foreach { w =>
      val path = w.sortBy(_._2).map(_._3)
      assert(path.head == w.head._1)
      path.sliding(2).foreach { case Seq(a, b) =>
        assert(edgeSet.contains((a, b)), s"hop $a->$b is not an edge")
      }
    }
    val again = Graph.randomWalks(edges.repartition(7), 20L, 3)
      .orderBy("start", "step")
      .as[(Long, Long, Long)].collect().toSeq
    assert(again == got)
  }

  test("personalizedPageRank: teleport mass stays with the seeds — " +
      "unreachable components read exactly zero, seed symmetry holds") {
    import spark.implicits._
    val und = Seq((1L, 2L), (50L, 51L)) // two components; seeds = {1,2}
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.personalizedPageRank(edges, seedMax = 10L)
      .orderBy("node").as[(Long, Long)].collect().toMap
    assert(got(50L) == 0L && got(51L) == 0L,
      "non-seed component must carry zero personalized mass")
    assert(got(1L) > 0L && got(1L) == got(2L),
      "symmetric seeds must tie exactly")
    // global variant gives the far component mass — the distinction
    // personalized ranking exists for
    val global = Graph.pageRank(edges).orderBy("node")
      .as[(Long, Long)].collect().toMap
    assert(global(50L) > 0L)
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, seedMax = 0L)
    }
  }

  test("walkSkipGrams: pair counts are symmetric and total exactly " +
      "the per-walk window combinatorics") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.walkSkipGrams(edges, maxStartId = 20L,
        steps = 3, window = 2)
      .as[(Long, Long, Long)].collect().toSeq
    // 4 walks of 4 positions; ordered in-window pairs per walk:
    // |i-j| in {1,2} -> 2*(3+2) = 10; total = 40
    assert(got.map(_._3).sum == 40L, got.mkString(","))
    val m = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(m.forall { case ((a, b), n) => m.get((b, a)).contains(n) },
      "skip-gram matrix must be symmetric")
  }

  test("hits: hand-traced two-round alternation with max " +
      "renormalization and truncating division") {
    import spark.implicits._
    // edges 1->10, 1->11, 2->10.
    // r1: auth raw 10:2000, 11:1000 -> 1000/500.
    //     hub raw 1:1500, 2:1000 -> 1000/666.
    // r2: auth raw 10:1666, 11:1000 -> 1000/600.
    //     hub raw 1:1600, 2:1000 -> 1000/625.
    val e = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val got = graft.operators.Graph.hits(e, iters = 2)
      .orderBy(col("kind"), col("node"))
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((10L, "auth", 1000L), (11L, "auth", 600L),
      (1L, "hub", 1000L), (2L, "hub", 625L)))
  }
}
