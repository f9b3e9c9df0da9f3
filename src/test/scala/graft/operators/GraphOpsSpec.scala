package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class GraphOpsSpec extends SparkTestBase {

  test("triangleCount: hand-checked graphs — K4, a pendant edge, a triangle-free star") {
    import spark.implicits._
    // K4 + pendant edge 4-5: every K4 node sits in C(3,2)=3 triangles,
    // the pendant endpoints gain none
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = GraphOps.triangleCount((k4 :+ (4L, 5L)).toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
    // star K1,5 is bipartite: zero triangles everywhere
    val star = (2L to 6L).map(b => (1L, b)).toDF("src", "dst")
    val starGot = GraphOps.triangleCount(star).collect()
    assert(starGot.length === 6 && starGot.forall(_.getLong(1) === 0L))
  }

  test("triangleCount: canonicalization — direction, duplicates and self-loops don't change counts") {
    import spark.implicits._
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (2L, 2L))
      .toDF("src", "dst")
    val a = GraphOps.triangleCount(tri).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = GraphOps.triangleCount(messy).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === Set((1L, 1L), (2L, 1L), (3L, 1L)))
    assert(b === a)
  }

  test("triangleCount matches a brute-force closure on a pseudorandom graph, at any parallelism") {
    import spark.implicits._
    // deterministic sparse graph on 40 nodes
    val raw = (0L until 200L).map { i =>
      (i * 13 % 40, (i * i * 7 + i) % 40)
    }
    val canon = raw.map { case (a, b) => (a min b, a max b) }
      .filter { case (a, b) => a != b }.distinct
    val eset = canon.toSet
    val nodes = canon.flatMap { case (a, b) => Seq(a, b) }.distinct
    val expected = nodes.map { n =>
      val tris = (for {
        (a, b) <- canon if a != n && b != n
        if eset.contains((a min n) -> (a max n)) && eset.contains((b min n) -> (b max n))
      } yield 1).size
      n -> tris.toLong
    }.toMap
    for (parts <- Seq(1, 7)) {
      val got = GraphOps.triangleCount(raw.toDF("src", "dst").repartition(parts))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"parts=$parts")
    }
  }

  test("labelPropagation: two cliques joined by a bridge keep their own min labels") {
    import spark.implicits._
    // cliques {1,2,3} and {10,11,12}, bridge 3-10
    val und = (for (a <- Seq(1L, 2L, 3L); b <- Seq(1L, 2L, 3L) if a < b) yield (a, b)) ++
      (for (a <- Seq(10L, 11L, 12L); b <- Seq(10L, 11L, 12L) if a < b) yield (a, b)) :+
      (3L, 10L)
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val got = GraphOps.labelPropagation(edges, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique converges to ONE label (community structure), and the
    // label the cliques settle on differs — the bridge doesn't merge them
    assert(Set(got(1L), got(2L), got(3L)) === Set(1L))
    assert(Set(got(10L), got(11L), got(12L)).size === 1)
    assert(got(10L) !== 1L)
  }

  test("labelPropagation is deterministic and parallelism-invariant (tie-break = min label)") {
    import spark.implicits._
    val und = (0L until 30L).map(i => (i, (i * i + 1) % 30)).filter(p => p._1 != p._2)
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val runs = Seq(1, 5).map { parts =>
      GraphOps.labelPropagation(edges.toDF("src", "dst").repartition(parts), iters = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    assert(runs(0) === runs(1))
    // one synchronous round on the identity labeling IS the neighborhood
    // mode with min tie-break: replay it locally as the oracle does
    val adj = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1) }
    var labels = (edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> n)).toMap
    for (_ <- 1 to 2) {
      labels = labels.map { case (n, old) =>
        adj.get(n) match {
          case None => n -> old
          case Some(ns) =>
            val counts = ns.map(labels).groupBy(identity).map { case (l, xs) => (l, xs.size) }
            n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
        }
      }
    }
    assert(runs(0).toMap === labels)
  }

  test("labelPropagation stopWhenStable halts once a round changes nothing") {
    import spark.implicits._
    // two disjoint bidirected triangles: labels settle within a few
    // rounds, then every further round is a no-op
    val und = (for (a <- Seq(1L, 2L, 3L); b <- Seq(1L, 2L, 3L) if a < b) yield (a, b)) ++
      (for (a <- Seq(10L, 11L, 12L); b <- Seq(10L, 11L, 12L) if a < b) yield (a, b))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val (stable, rounds) =
      GraphOps.labelPropagationCounted(edges, iters = 20, stopWhenStable = true)
    assert(rounds < 20, s"expected early stop, ran all $rounds rounds")
    val gotStable = stable.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val gotFull = GraphOps.labelPropagation(edges, iters = 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(gotStable === gotFull,
      "early-stopped labels must equal the capped fixed-iter labels")
    // default stays exactly-iters (the oracle-replayable mode)
    assert(GraphOps.labelPropagationCounted(edges, iters = 5)._2 == 5)
  }

  test("weightedShortestPaths matches local Dijkstra; hop-capped mode; negative rejection") {
    import spark.implicits._
    // pseudorandom positive-weighted digraph on 20 nodes
    val raw = (0L until 80L).map(i =>
      ((i * 13) % 20, (i * i * 7 + 3) % 20, (i % 9) + 1.0))
      .filter(e => e._1 != e._2).distinct
    val sources = Seq(0L, 5L)
    // local Dijkstra over the min-weight multigraph
    val adj = raw.groupBy(_._1).map { case (s, es) =>
      s -> es.groupBy(_._2).map { case (d, ws) => d -> ws.map(_._3).min }.toSeq
    }
    val dist = scala.collection.mutable.Map(sources.map(_ -> 0.0): _*)
    val pq = scala.collection.mutable.PriorityQueue(
      sources.map(s => (-0.0, s)): _*)(Ordering.by(_._1))
    while (pq.nonEmpty) {
      val (nd, n) = pq.dequeue()
      if (-nd <= dist(n) + 1e-12)
        adj.getOrElse(n, Nil).foreach { case (m, w) =>
          if (dist.get(m).forall(_ > -nd + w)) {
            dist(m) = -nd + w; pq.enqueue((nd - w, m))
          }
        }
    }
    val (got, rounds) = GraphOps.weightedShortestPathsCounted(
      raw.toDF("src", "dst", "w"), sources.toDF("node"), maxIters = 30)
    val gm = got.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(rounds < 30, s"expected convergence, ran $rounds")
    assert(gm.keySet === dist.keySet)
    gm.foreach { case (n, dv) => assert(math.abs(dv - dist(n)) < 1e-9, s"node $n") }
    // hop-capped mode: 1 round = direct edges only
    val one = GraphOps.weightedShortestPaths(raw.toDF("src", "dst", "w"),
        Seq(0L).toDF("node"), maxIters = 1, requireConverged = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = adj.getOrElse(0L, Nil).toMap
    assert(one === direct.map { case (d, w) => d -> w } + (0L -> 0.0))
    // negative weights fail loudly
    val err = intercept[IllegalArgumentException] {
      GraphOps.weightedShortestPaths(
        Seq((1L, 2L, -1.0)).toDF("src", "dst", "w"), Seq(1L).toDF("node"))
    }
    assert(err.getMessage.contains("negative edge weight"))
  }

  test("hits: hand-computed hubs/authorities on a 4-node DAG") {
    import spark.implicits._
    // 1→3, 2→3, 2→4. Round 1: auth ∝ indegree → 3=1, 4=.5;
    // hubs: 1 gets 1.0, 2 gets 1.5 → 1=2/3, 2=1. Round 2: auth raw
    // 3=5/3, 4=1 → 3=1, 4=.6; hub raw 1=1, 2=1.6 → 1=.625, 2=1.
    val edges = Seq((1L, 3L), (2L, 3L), (2L, 4L)).toDF("src", "dst")
    val got = GraphOps.hits(edges, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got === Map(
      1L -> ((0.625, 0.0)), 2L -> ((1.0, 0.0)),
      3L -> ((0.0, 1.0)), 4L -> ((0.0, 0.6))))
  }

  test("hits matches a local replay on a pseudorandom digraph, at any parallelism") {
    import spark.implicits._
    val raw = (0L until 120L).map(i => ((i * 17) % 25, (i * i * 3 + 5) % 25))
      .filter(p => p._1 != p._2).distinct
    // local replay of the max-normalized recursion
    val nodes = raw.flatMap(e => Seq(e._1, e._2)).distinct
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = nodes.map(_ -> 0.0).toMap
    for (_ <- 1 to 2) {
      val ar = raw.groupBy(_._2).map { case (n, es) => n -> es.map(e => hub(e._1)).sum }
      val am = ar.values.max
      auth = nodes.map(n => n -> ar.get(n).map(_ / am).getOrElse(0.0)).toMap
      val hr = raw.groupBy(_._1).map { case (n, es) => n -> es.map(e => auth(e._2)).sum }
      val hm = hr.values.max
      hub = nodes.map(n => n -> hr.get(n).map(_ / hm).getOrElse(0.0)).toMap
    }
    for (parts <- Seq(1, 7)) {
      val got = GraphOps.hits(raw.toDF("src", "dst").repartition(parts), iters = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
      got.foreach { case (n, h, a) =>
        assert(math.abs(h - hub(n)) < 1e-6 && math.abs(a - auth(n)) < 1e-6,
          s"node $n parts=$parts: got ($h,$a) want (${hub(n)},${auth(n)})")
      }
      assert(got.length === nodes.size)
    }
  }

  test("shortestHops: multi-source BFS distances, drained frontier, unreached absent") {
    import spark.implicits._
    // path 1→2→3→4 plus a disconnected pair 10↔11; sources {1, 10}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }.toDF("src", "dst")
    val sources = Seq(1L, 10L).toDF("node")
    val (dist, rounds) = GraphOps.shortestHopsCounted(edges, sources, maxIters = 20)
    val got = dist.collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 10L -> 0, 11L -> 1))
    assert(rounds < 20, s"frontier must drain before the cap, ran $rounds")
    // two-source shadowing: a second source inside the path truncates dists
    val got2 = GraphOps.shortestHops(edges, Seq(1L, 3L).toDF("node"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got2(4L) == 1 && got2(2L) == 1 && got2(3L) == 0)
  }
}
