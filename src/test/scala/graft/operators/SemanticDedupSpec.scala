package graft.operators

import org.apache.spark.sql.functions._

/** SemDeDup router quality on the REAL testdata corpora at every SF the
  * driver can gate on — the continuous enforcement behind q_semantic_dedup's
  * SF-independent oracle booleans (recall ≥ 0.95 of the true cos≥0.99 pair
  * set; zero false pairs), same pattern as KnnRecallSpec. */
class SemanticDedupSpec extends graft.SparkTestBase {

  private def planted(dir: String) = {
    val e = graft.queries.Relational.embeddings(spark, dir)
      .select(col("vec_id"), col("vec"))
    e.unionAll(e.select((col("vec_id") + 100000L).as("vec_id"),
      transform(col("vec"), (x, i) =>
        x * (lit(1.0) + lit(0.01) * ((col("vec_id") + i) % 7 - 3))).as("vec")))
  }

  test("cluster router finds every planted jitter pair at every SF, no false pairs") {
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val pl = planted(sf(d))
      val n = graft.queries.Relational.embeddings(spark, sf(d)).count()
      // same nCentroids as q_semantic_dedup — this spec backs its oracle claim
      val found = Dedup.semanticNearDup(pl, nCentroids = 32, threshold = 0.99)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // true pair set = exactly the planted (i, i+100000) pairs: jitter cos
      // ≈ 0.9995, natural pairs ≤ 0.52 (measured over all SF corpora)
      val truth = (0L until n).map(i => (i, i + 100000L)).toSet
      val hit = found.count(truth.contains)
      val extra = found.filterNot(truth.contains)
      info(s"$d: n=$n recall=${hit.toDouble / n} extra=${extra.length}")
      assert(extra.isEmpty, s"$d: non-planted pairs emitted: ${extra.take(5).toSeq}")
      assert(hit.toDouble / n >= 0.95, s"$d: recall ${hit.toDouble / n} below floor")
    }
  }

  test("identical-vector groups collapse to chain pairs, not quadratic pairs") {
    import spark.implicits._
    // 40 copies of one vector + isolated others: the mega-group must emit
    // exactly 39 chain pairs (cos 1.0), never 40·39/2 within-bucket pairs
    val base = Seq.tabulate(8)(j => math.sin(j + 1).abs + 0.1)
    val rows = (0L until 40L).map(i => (i, base)) ++
      Seq((100L, Seq.fill(8)(0.9) ++ Seq.empty), (101L, base.map(-_)))
        .map { case (id, v) => (id, v.toSeq) }
    val emb = rows.toDF("vec_id", "vec")
    val out = Dedup.semanticNearDup(emb, nCentroids = 4, threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val chain = (0L until 39L).map(i => (i, i + 1L)).toSet
    assert(out.map(p => (p._1, p._2)).toSet === chain)
    assert(out.forall(_._3 === 1.0))
  }
}
