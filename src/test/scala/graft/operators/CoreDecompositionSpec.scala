package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CoreDecompositionSpec extends SparkTestBase {

  private def bidirect(pairs: Seq[(Long, Long)]) = {
    import spark.implicits._
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")
  }

  private def cores(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    GraphOps.coreDecomposition(bidirect(pairs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("clique K5 with a pendant path: clique is 4-core, path is 1-core") {
    val clique = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j)
    val path = Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val got = cores(clique ++ path)
    for (v <- 0L until 5L) assert(got(v) == 4L, s"clique node $v")
    for (v <- Seq(10L, 11L, 12L)) assert(got(v) == 1L, s"path node $v")
  }

  test("two triangles joined by a bridge: all six nodes are 2-core") {
    val t1 = Seq((0L, 1L), (1L, 2L), (2L, 0L))
    val t2 = Seq((5L, 6L), (6L, 7L), (7L, 5L))
    val got = cores(t1 ++ t2 :+ (2L, 5L))
    assert(got.values.forall(_ == 2L), got.toString)
  }

  test("star graph: hub and leaves are all 1-core") {
    val star = (1L to 8L).map(i => (0L, i))
    val got = cores(star)
    assert(got.values.forall(_ == 1L), got.toString)
  }

  test("book graph (triangles sharing an edge) keeps the shared edge at core 2") {
    // pages {2,3,4} each form a triangle with the spine (0,1)
    val book = Seq((0L, 1L)) ++ (2L to 4L).flatMap(p => Seq((0L, p), (1L, p)))
    val got = cores(book)
    assert(got(0L) == 2L && got(1L) == 2L)
    for (p <- 2L to 4L) assert(got(p) == 2L)
  }

  test("matches a local peeling oracle on a pseudo-random graph") {
    val rnd = new scala.util.Random(42)
    val n = 60
    val pairs = (0 until 220).map { _ =>
      val a = rnd.nextInt(n).toLong
      val b = rnd.nextInt(n).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val got = cores(pairs)
    // exact peeling reference: repeatedly remove min-degree nodes
    val adj = scala.collection.mutable.Map.empty[Long, scala.collection.mutable.Set[Long]]
    for ((a, b) <- pairs) {
      adj.getOrElseUpdate(a, scala.collection.mutable.Set.empty) += b
      adj.getOrElseUpdate(b, scala.collection.mutable.Set.empty) += a
    }
    val core = scala.collection.mutable.Map.empty[Long, Long]
    val alive = scala.collection.mutable.Set(adj.keys.toSeq: _*)
    var k = 0L
    while (alive.nonEmpty) {
      val deg = alive.map(v => v -> adj(v).count(alive)).toMap
      val minDeg = deg.values.min
      if (minDeg > k) k = minDeg
      val drop = alive.filter(v => deg(v) <= k).toSeq
      for (v <- drop) { core(v) = k; alive -= v }
    }
    assert(got == core.toMap, s"mismatch: ${got.toSet.diff(core.toSet)}")
  }
}
