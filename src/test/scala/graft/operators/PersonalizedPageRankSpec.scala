package graft.operators

import graft.SparkTestBase

class PersonalizedPageRankSpec extends SparkTestBase {

  test("hand-replayed on the bidirected 3-chain with seed {1}") {
    import spark.implicits._
    val chain = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("node")
    // r = (1, 0, 0); pr0 = r; out: 1→{2}, 2→{1,3}, 3→{2}
    var pr = Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0)
    val r = Map(1L -> 1.0, 2L -> 0.0, 3L -> 0.0)
    for (_ <- 1 to 3) {
      val m1 = pr(2L) / 2
      val m2 = pr(1L) + pr(3L)
      val m3 = pr(2L) / 2
      pr = Map(
        1L -> (0.15 * r(1L) + 0.85 * m1),
        2L -> (0.15 * r(2L) + 0.85 * m2),
        3L -> (0.15 * r(3L) + 0.85 * m3))
    }
    val got = PageRank.runPersonalized(chain, seeds, iters = 3).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    pr.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-6, s"node $k: got ${got(k)} want $v")
    }
    // mass concentrates near the seed: node 1 outranks node 3 strictly
    assert(got(1L) > got(3L))
  }

  test("uniform seed set over all nodes reduces to standard PageRank") {
    import spark.implicits._
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L)).toDF("src", "dst")
    val all = Seq(1L, 2L, 3L).toDF("node")
    val ppr = PageRank.runPersonalized(g, all, iters = 4).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val pr = PageRank.run(g, iters = 4).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(ppr == pr)
  }

  test("seeds outside the graph fail loudly") {
    import spark.implicits._
    val g = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      PageRank.runPersonalized(g, Seq(99L).toDF("node"))
    }
    assert(ex.getMessage.contains("seeds not in graph"))
  }
}
