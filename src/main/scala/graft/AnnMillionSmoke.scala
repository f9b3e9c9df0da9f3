package graft

import org.apache.spark.sql.functions._

/** Synthetic 1M-vector ANN smoke — the similarity-search member of the
  * scale-demo family ([[MillionSmoke]] clustering, [[DedupMillionSmoke]]
  * dedup). 50 seeded Gaussian blobs in 32 dimensions generated distributed;
  * 100 query vectors; exact brute-force top-10 as ground truth. The IVF
  * path fits its centroids with the fully distributed Lloyd fitter
  * (no driver-side sample), then probes nProbe buckets per query. Reports
  * build/search wall times and recall@10 against the exact answer.
  */
object AnnMillionSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.localBuilder("graft-ann-million", 32)
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, n)
    spark.stop()
  }

  /** Body shared by [[main]] and the opt-in SmokeSuite. */
  def run(spark: org.apache.spark.sql.SparkSession, n: Long): Unit = {
    import spark.implicits._

    val dims = 32
    val blobs = 50
    val id = col("id")
    val feat = array((0 until dims).map { d =>
      val u1 = (pmod(xxhash64(id, lit(d * 2)), lit(1000000L)) + 1).cast("double") / 1000001.0
      val u2 = pmod(xxhash64(id, lit(d * 2 + 1)), lit(1000000L)).cast("double") / 1000000.0
      val gauss = sqrt(lit(-2.0) * log(u1)) * cos(lit(2 * math.Pi) * u2)
      val center = (pmod(xxhash64(pmod(xxhash64(id), lit(blobs.toLong)), lit(100 + d)),
        lit(21L)) - 10).cast("double") * 3.0
      (center + gauss).as(s"f$d")
    }: _*)
    val corpus = spark.range(n).select(id.as("cid"), feat.as("cv"))
      .repartition(64).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"generated ${corpus.count()} vectors, $blobs blobs, $dims dims")
    val queries = corpus.filter(col("cid") % lit(math.max(1L, n / 100)) === 0)
      .select(col("cid").as("qid"), col("cv").as("qv")).persist()
    val nQ = queries.count()

    val t0 = System.nanoTime()
    val exact = Similarity_exact(queries, corpus)
    val tExact = (System.nanoTime() - t0) / 1e9
    println(f"[brute-force] $nQ queries × $n corpus in $tExact%.1f s")

    // the index (centroids + bucketed corpus) is built once and persists;
    // a query batch then touches only its probed buckets — time the phases
    // separately (build amortizes; per-batch search is what scales)
    val t1 = System.nanoTime()
    val built = operators.Similarity
      .buildIvfIndex(corpus, nCentroids = 64, distributedFit = true)
    val index = built.copy(assigned = built.assigned
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    index.assigned.count()
    val tBuild = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val ivf = operators.Similarity.ivfSearch(queries, index, nProbe = 8, k = 10)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val tIvf = (System.nanoTime() - t2) / 1e9
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    println(f"[ivf dist-fit] index build $tBuild%.1f s one-time (distributed Lloyd + " +
      f"corpus bucketing), search $tIvf%.1f s (${tExact / tIvf}%.1fx vs exact), " +
      f"recall@10 $recall%.4f")
    assert(recall >= 0.9, s"recall $recall < 0.9")
    index.assigned.unpersist(blocking = false)
    queries.unpersist(blocking = false); corpus.unpersist(blocking = false)
  }

  private def Similarity_exact(queries: org.apache.spark.sql.DataFrame,
      corpus: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    import queries.sparkSession.implicits._
    operators.Similarity.bruteForceTopK(queries, corpus, 10)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
  }
}
