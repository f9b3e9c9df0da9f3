package graft.operators

import graft.SparkTestBase

class LinkPredictionSpec extends SparkTestBase {

  test("hand-computed Jaccard on the square-with-diagonal graph") {
    import spark.implicits._
    // square 1-2-3-4-1 plus diagonal 1-3:
    //   N(1)={2,3,4} N(2)={1,3} N(3)={1,2,4} N(4)={1,3}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val got = GraphOps.linkPredictionJaccard(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    // (2,4): N∩={1,3} N∪={1,3} → 1.0, NOT an edge — the predicted link
    assert(got((2L, 4L)) == (1.0, false))
    // (1,3): N∩={2,4} N∪={2,4,1,3} → 0.5, existing edge
    assert(got((1L, 3L)) == (0.5, true))
    // (1,2): N∩={3} N∪={1,2,3,4} → 0.25, existing edge
    assert(got((1L, 2L)) == (0.25, true))
    // all candidate pairs share >= 1 neighbor
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
  }

  test("threshold filters and isolated edges produce no candidates") {
    import spark.implicits._
    // two disjoint edges: no shared neighbors anywhere
    val e = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    assert(GraphOps.linkPredictionJaccard(e).count() == 0L)
    // triangle: every pair shares exactly the third node
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val all = GraphOps.linkPredictionJaccard(tri).collect()
    assert(all.length == 3 && all.forall(r => r.getDouble(2) == 0.333333)) // 6dp-rounded 1/3
    assert(GraphOps.linkPredictionJaccard(tri, threshold = 0.5).count() == 0L)
  }

  test("hand-computed Adamic-Adar on the square-with-diagonal graph") {
    import spark.implicits._
    // square 1-2-3-4-1 plus diagonal 1-3:
    //   deg(1)=3 deg(2)=2 deg(3)=3 deg(4)=2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val got = GraphOps.adamicAdar(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .toMap
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // (2,4): common {1,3}, both deg 3 → 2/ln3, predicted (not an edge)
    assert(got((2L, 4L)) == (2L, r6(2.0 / math.log(3.0)), false))
    // (1,3): common {2,4}, both deg 2 → 2/ln2, existing edge
    assert(got((1L, 3L)) == (2L, r6(2.0 / math.log(2.0)), true))
    // (1,2): common {3}, deg 3 → 1/ln3
    assert(got((1L, 2L)) == (1L, r6(1.0 / math.log(3.0)), true))
    assert(got.keySet == Set((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)))
    // minScore keeps only the strong pairs: 2/ln2 ≈ 2.885 is the max
    assert(GraphOps.adamicAdar(edges, minScore = 2.5).count() == 1L)
  }
}
