package graft

import org.apache.spark.sql.functions._
import graft.hdbscan.Hdbscan

/** Synthetic 1M-point clustering smoke: 20 seeded Gaussian blobs in 8
  * dimensions, generated distributed (no driver materialization), pushed
  * through the multi-level CF-bubble path with a sketch budget that forces
  * several split levels — the regime the 100 TB design runs in, at 4× the
  * largest dataset the reference ships. Reports wall time, cluster count,
  * and purity against the generating blob id.
  */
object MillionSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.localBuilder("graft-million-smoke", 32)
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, n)
    spark.stop()
  }

  /** Body shared by [[main]] and the opt-in SmokeSuite (asserts the
    * BASELINE.md invariants: purity vs the generating blobs ≥ 0.99 at 1M,
    * cluster count in the blob ballpark, >90% of points labeled). */
  def run(spark: org.apache.spark.sql.SparkSession, n: Long): Unit = {
    val dims = 8
    val blobs = 20
    // deterministic per-row gaussians: xxhash64-seeded uniforms → Box-Muller.
    // blob centers sit on a seeded lattice scaled to separation 30σ.
    val id = col("id")
    val blob = pmod(xxhash64(id), lit(blobs.toLong)).as("blob")
    val feat = array((0 until dims).map { d =>
      val u1 = (pmod(xxhash64(id, lit(d * 2)), lit(1000000L)) + 1).cast("double") / 1000001.0
      val u2 = pmod(xxhash64(id, lit(d * 2 + 1)), lit(1000000L)).cast("double") / 1000000.0
      val gauss = sqrt(lit(-2.0) * log(u1)) * cos(lit(2 * math.Pi) * u2)
      val center = (pmod(xxhash64(pmod(xxhash64(id), lit(blobs.toLong)), lit(100 + d)),
        lit(21L)) - 10).cast("double") * 3.0
      (center + gauss).as(s"f$d")
    }: _*).as("features")
    val pts = spark.range(n).select(id, blob, feat)
      .repartition(64).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"generated ${pts.count()} points, $blobs blobs, $dims dims")

    val t0 = System.nanoTime()
    val res = Hdbscan(minPts = 4, minClusterSize = 500, maxLocalSize = 4000,
      maxExactPoints = 200000, sampleCap = 2000)
      .fit(pts.select(col("id"), col("features"))).persist()
    val nClusters = res.filter(col("label") =!= 0).select("label").distinct().count()
    println(f"[bubbles] clustered $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s; $nClusters clusters")

    val joined = res.join(pts.select(col("id"), col("blob")), "id").filter(col("label") =!= 0)
    val purity = joined.groupBy("label", "blob").count()
      .groupBy("label").agg(max("count").as("maj"), sum("count").as("tot"))
      .agg((sum("maj") / sum("tot")).as("purity")).collect()(0).getDouble(0)
    val covered = joined.count()
    println(f"[bubbles] purity vs generating blob: $purity%.4f over $covered labeled points")
    // BASELINE.md invariants (r4: purity 1.0 at 1M over 20 well-separated
    // blobs; the sketch may split/halo a blob, so the count bound is loose)
    assert(purity >= 0.99, s"purity $purity < 0.99 vs generating blobs")
    assert(nClusters >= 10 && nClusters <= 60, s"implausible cluster count $nClusters for 20 blobs")
    assert(covered >= (n * 9) / 10, s"only $covered/$n points labeled non-noise")
    res.unpersist(blocking = false)

    // ---- raised-sampleCap leg (VERDICT r10 #7): ~10× the default sketch
    // granularity pushes the bubble count past bubbleMatrixCap (4096), so
    // the hierarchy runs MATRIX-FREE (BubbleSketchGraph: distributed E11
    // scan + Borůvka over the implicit MRD graph + distributed G8) —
    // driver state O(#bubbles), never the O(m²) = 3.2 GB matrix this m
    // would need. Same quality gates as the default sketch. ----
    val capHi = math.min(20000L, math.max(4097L, n / 50)).toInt
    val t1 = System.nanoTime()
    val resHi = Hdbscan(minPts = 4, minClusterSize = 500, maxLocalSize = 4000,
      maxExactPoints = 200000, sampleCap = capHi)
      .fit(pts.select(col("id"), col("features"))).persist()
    val nClustersHi = resHi.filter(col("label") =!= 0).select("label").distinct().count()
    println(f"[bubbles-hi] sampleCap=$capHi%d (matrix-free hierarchy): " +
      f"clustered $n rows in ${(System.nanoTime() - t1) / 1e9}%.1f s; $nClustersHi clusters")
    val joinedHi = resHi.join(pts.select(col("id"), col("blob")), "id")
      .filter(col("label") =!= 0)
    val purityHi = joinedHi.groupBy("label", "blob").count()
      .groupBy("label").agg(max("count").as("maj"), sum("count").as("tot"))
      .agg((sum("maj") / sum("tot")).as("purity")).collect()(0).getDouble(0)
    val coveredHi = joinedHi.count()
    println(f"[bubbles-hi] purity vs generating blob: $purityHi%.4f over $coveredHi labeled points")
    assert(purityHi >= 0.99, s"hi-cap purity $purityHi < 0.99 vs generating blobs")
    assert(coveredHi >= (n * 9) / 10, s"only $coveredHi/$n points labeled non-noise at hi cap")

    // ---- constrained leg (VERDICT r11 #7): constraints steer at SKETCH
    // granularity (point ids → containing bubbles through the assignment
    // frame, Hdbscan.setConstraints) — proven here at 1M points on the
    // matrix-free route, the way the unconstrained path is. Two planted
    // must-links across two blob pairs: constraint-driven extraction must
    // flip selection to each pair's merge parent, so both endpoints of
    // each must-link share one label while the two pairs stay apart. ----
    // pairs must be DENDROGRAM-ADJACENT (mutually nearest blobs): a
    // must-link across an arbitrary pair is satisfied only by a high
    // ancestor that can swallow unrelated blobs. Centers via one 20-row agg.
    val centers = pts.groupBy("blob")
      .agg(array((0 until dims).map(d => avg(col("features")(d))): _*).as("c"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cDist(a: Long, b: Long): Double =
      math.sqrt(centers(a).zip(centers(b)).map { case (x, y) => (x - y) * (x - y) }.sum)
    val blobIds = centers.keys.toSeq.sorted
    val allPairs = (for { a <- blobIds; b <- blobIds if a < b } yield (a, b, cDist(a, b)))
      .sortBy(_._3)
    val (pa, pb, _) = allPairs.head
    // the second pair must be MUTUALLY nearest GLOBALLY (each endpoint's
    // nearest blob is the other — like (pa,pb), which is the closest pair
    // overall): single linkage then merges them directly, so the must-link
    // is satisfiable at their own merge parent. The closest pair merely
    // DISJOINT from {pa,pb} can have an endpoint whose true nearest blob
    // is pa or pb, pushing satisfaction to a high ancestor that swallows
    // unrelated blobs and breaks the pairs-stay-separate assertion
    // (ADVICE r12 — previously stable only because the generator is seeded)
    def nearestBlob(b: Long): Long = blobIds.filter(_ != b).minBy(cDist(b, _))
    val (pc, pd, _) = allPairs
      .find { case (c, d, _) =>
        !Set(c, d).exists(Set(pa, pb)) && nearestBlob(c) == d && nearestBlob(d) == c
      }
      .getOrElse(sys.error(
        "no globally mutual-nearest blob pair disjoint from the closest pair"))
    val four = Seq(pa, pb, pc, pd)
    val reps = pts.filter(col("blob").isInCollection(four))
      .groupBy("blob").agg(min("id").as("rid"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val unconLabels = resHi.filter(col("id").isInCollection(reps.values.toSeq))
      .select("id", "label").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    resHi.unpersist(blocking = false)
    val cons = Seq((reps(pa), reps(pb), true), (reps(pc), reps(pd), true))
    val t2 = System.nanoTime()
    val resCon = Hdbscan(minPts = 4, minClusterSize = 500, maxLocalSize = 4000,
      maxExactPoints = 200000, sampleCap = capHi, constraints = cons)
      .fit(pts.select(col("id"), col("features"))).persist()
    val conLabels = resCon.filter(col("id").isInCollection(reps.values.toSeq))
      .select("id", "label").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    val nClustersCon = resCon.filter(col("label") =!= 0).select("label").distinct().count()
    println(f"[bubbles-con] sampleCap=$capHi%d + 2 must-links: clustered $n rows " +
      f"in ${(System.nanoTime() - t2) / 1e9}%.1f s; $nClustersCon clusters; " +
      s"pair($pa,$pb)=${conLabels(reps(pa))}/${conLabels(reps(pb))} " +
      s"pair($pc,$pd)=${conLabels(reps(pc))}/${conLabels(reps(pd))}")
    // unconstrained: the four blobs are distinct clusters
    assert(four.map(b => unconLabels(reps(b))).distinct.size == 4,
      s"unconstrained blobs $four not distinct: $unconLabels")
    // constrained: each must-link pair shares a non-noise label...
    assert(conLabels(reps(pa)) != 0 && conLabels(reps(pa)) == conLabels(reps(pb)),
      s"must-link (blob$pa, blob$pb) unsatisfied: $conLabels")
    assert(conLabels(reps(pc)) != 0 && conLabels(reps(pc)) == conLabels(reps(pd)),
      s"must-link (blob$pc, blob$pd) unsatisfied: $conLabels")
    // ...and the two pairs stay separate clusters
    assert(conLabels(reps(pa)) != conLabels(reps(pc)),
      s"pairs ($pa,$pb) and ($pc,$pd) collapsed into one cluster: $conLabels")
    resCon.unpersist(blocking = false); pts.unpersist(blocking = false)
  }
}
