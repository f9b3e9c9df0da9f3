package graft.operators

import org.apache.spark.sql.functions._

/** Measures the q_knn_ivf recall claim (mean recall@10 >= 0.7 at probe
  * fraction 8/16) on the REAL testdata corpora at every SF the driver can
  * gate on — including sf0.1, whose 2000-row embeddings table is a
  * different corpus than the sf0.001/0.01 ones the original calibration
  * used (ADVICE r7). Keeps the SF-independent oracle claim continuously
  * enforced instead of resting on a one-off note.
  */
class KnnRecallSpec extends graft.SparkTestBase {

  private def meanRecall(dir: String): Double = {
    val e = graft.queries.Relational.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("vec").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("vec").as("cv"))
    val ivf = Similarity.ivfTopK(q, c, nProbe = 8).select(col("qid"), col("cid"))
    val bf = Similarity.bruteForceTopK(q, c, 10).select(col("qid"), col("cid"))
    val hits = bf.join(ivf, Seq("qid", "cid")).count().toDouble
    hits / bf.count()
  }

  test("IVF mean recall@10 >= 0.7 at probe fraction 0.5 on every SF corpus") {
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val r = meanRecall(sf(d))
      info(f"$d: mean recall@10 = $r%.4f")
      assert(r >= 0.7, f"$d: recall $r%.4f below the oracle claim 0.7")
    }
  }
}
