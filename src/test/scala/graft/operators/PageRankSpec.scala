package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PageRankSpec extends SparkTestBase {

  test("hand-computed on the 2-node cycle and a 3-node chain graph") {
    import spark.implicits._
    // 2-cycle: symmetric — pr stays 0.5/0.5 at every iteration
    val cyc = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = PageRank.run(cyc, iters = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got === Map(1L -> 0.5, 2L -> 0.5))
    // bidirected chain 1-2-3: middle node accumulates rank
    val chain = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    // replay locally: pr0 = 1/3 each; out: 1→{2}, 2→{1,3}, 3→{2}
    var pr = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    for (_ <- 1 to 3) {
      val m2 = pr(1L) / 1 + pr(3L) / 1
      val m1 = pr(2L) / 2
      pr = Map(
        1L -> ((1.0 - 0.85) / 3 + 0.85 * m1),
        2L -> ((1.0 - 0.85) / 3 + 0.85 * m2),
        3L -> ((1.0 - 0.85) / 3 + 0.85 * m1))
    }
    val gotChain = PageRank.run(chain, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pr.foreach { case (k, v) =>
      assert(gotChain(k) ===
        BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"node $k")
    }
    assert(gotChain(2L) > gotChain(1L))
  }

  test("rank mass conserves (no dangling) and is parallelism-invariant") {
    import spark.implicits._
    val edges = (for (i <- 0L until 60L) yield {
      val a = i % 12
      val b = (i * 7 + 3) % 12
      if (a == b) Seq.empty else Seq((a, b), (b, a))
    }).flatten.distinct.toDF("src", "dst")
    val a = PageRank.run(edges, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = PageRank.run(edges.repartition(7), iters = 4).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b, "parallelism must not change ranks at 6 dp")
    assert(math.abs(a.values.sum - 1.0) < 1e-4, s"mass leaked: ${a.values.sum}")
  }

  test("dangling nodes are rejected loudly") {
    import spark.implicits._
    val dangling = Seq((1L, 2L)).toDF("src", "dst") // node 2 has no out-edge
    val e = intercept[IllegalArgumentException] {
      PageRank.run(dangling, iters = 1)
    }
    assert(e.getMessage.contains("dangling"))
  }

  test("tol stops early on a fast-converging graph, matching the full fixed-iter run") {
    import spark.implicits._
    // bidirected 6-node star: bipartite, so the error contracts by the
    // damping factor per round — at d=0.5 the L1 delta crosses 1e-6
    // around round ~20, comfortably inside the 60-round cap
    val edges = (1L to 5L).flatMap(i => Seq((0L, i), (i, 0L))).toDF("src", "dst")
    val (converged, rounds) =
      PageRank.runCounted(edges, iters = 60, damping = 0.5, scale = 8, tol = 1e-6)
    assert(rounds < 60, s"expected early stop, ran all $rounds rounds")
    assert(rounds > 3, s"a star is not THAT fast: $rounds")
    val full = PageRank.run(edges, iters = 60, damping = 0.5, scale = 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    converged.collect().foreach { r =>
      // stopping at delta<1e-6 leaves at most delta·d/(1−d) ≈ 5.7e-6
      assert(math.abs(r.getDouble(1) - full(r.getLong(0))) < 1e-4,
        s"node ${r.getLong(0)}: ${r.getDouble(1)} vs ${full(r.getLong(0))}")
    }
    // tol=0 (the default) must still run exactly the cap
    assert(PageRank.runCounted(edges, iters = 4)._2 == 4)
  }
}
