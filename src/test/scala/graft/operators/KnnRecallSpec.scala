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

  private def pqRecall(dir: String, shortlist: Int): Double = {
    val e = graft.queries.Relational.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("vec").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("vec").as("cv"))
    val pq = Similarity.pqTopK(q, c, shortlist = shortlist).select(col("qid"), col("cid"))
    val bf = Similarity.bruteForceTopK(q, c, 10).select(col("qid"), col("cid"))
    val hits = bf.join(pq, Seq("qid", "cid")).count().toDouble
    hits / bf.count()
  }

  test("PQ encode: codes are parallelism-invariant, in-range, 16x smaller") {
    import spark.implicits._
    val e = graft.queries.Relational.embeddings(spark, sf("sf0.01"))
      .select(col("vec_id").as("cid"), col("vec").as("cv"))
    val model = Similarity.trainPq(e, m = 16, ks = 16)
    assert(model.dsub === 4)
    val a = Similarity.pqEncode(e, model)
      .as[(Long, Array[Int])].collect().sortBy(_._1)
    val b = Similarity.pqEncode(e.repartition(11), model)
      .as[(Long, Array[Int])].collect().sortBy(_._1)
    assert(a.length === b.length)
    a.zip(b).foreach { case ((ida, ca), (idb, cb)) =>
      assert(ida === idb && ca.sameElements(cb))
    }
    a.foreach { case (_, codes) =>
      assert(codes.length === 16)
      assert(codes.forall(c => c >= 0 && c < 16)) // 16 codes of 4 bits: 8 B vs 256 B of floats
    }
  }

  private def ivfPqRecall(dir: String): Double = {
    val e = graft.queries.Relational.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("vec").as("qv"))
    val c = e.select(col("vec_id").as("cid"), col("vec").as("cv"))
    val got = Similarity.ivfPqSearch(q, c).select(col("qid"), col("cid"))
    val bf = Similarity.bruteForceTopK(q, c, 10).select(col("qid"), col("cid"))
    val hits = bf.join(got, Seq("qid", "cid")).count().toDouble
    hits / bf.count()
  }

  test("IVF-PQ composed recall@10 on every SF corpus (calibration + floor)") {
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val r = ivfPqRecall(sf(d))
      info(f"$d: mean recall@10 = $r%.4f")
      assert(r >= 0.6, f"$d: recall $r%.4f below the composed-tier floor 0.6")
    }
  }

  test("PQ+rerank mean recall@10 >= 0.75 at shortlist 100 on every SF corpus") {
    // calibration (this suite, this session): shortlist=100 measures
    // 0.965 / 0.965 / 0.850 at sf0.001/0.01/0.1 — the 0.75 floor keeps a
    // 0.10 margin at the worst corpus, the q_knn_ivf convention
    for (d <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val r = pqRecall(sf(d), shortlist = 100)
      info(f"$d: mean recall@10 = $r%.4f")
      assert(r >= 0.75, f"$d: recall $r%.4f below the oracle claim 0.75")
    }
  }

  test("distributed Lloyd tol: early stop on separated blobs, fixed-iter default intact") {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    // four well-separated direction clusters on the sphere: Lloyd settles
    // in 2-3 rounds, so a 20-round budget must early-stop under tol
    val dirs = Seq(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0),
      Array(0, 0, 1.0, 0), Array(0, 0, 0, 1.0))
    val corpus = (0 until 400).map { i =>
      val d0 = dirs(i % 4)
      (i.toLong, d0.map(_ * 10 + rng.nextGaussian() * 0.05))
    }.toDF("cid", "cv")
    val (tolCents, tolRounds) =
      Similarity.kmeansCentroidsDistributedCounted(corpus, 4, iters = 20, tol = 1e-9)
    val (fixed, fixedRounds) =
      Similarity.kmeansCentroidsDistributedCounted(corpus, 4, iters = 20)
    // default tol=0 stops only at the bit-exact fixpoint, where further
    // rounds are provably no-ops — so both runs must agree exactly
    assert(tolCents.map(_.toSeq).toSet == fixed.map(_.toSeq).toSet,
      "tol-stopped centroids must equal the tol=0 fixpoint")
    assert(tolRounds < 20 && fixedRounds < 20,
      s"separated blobs must converge early (tol=$tolRounds, fixpoint=$fixedRounds rounds)")
    assert(tolRounds <= fixedRounds,
      "a positive tol can only stop at or before the bit-exact fixpoint")
  }
}
