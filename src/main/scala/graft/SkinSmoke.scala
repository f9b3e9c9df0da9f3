package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.hdbscan.Hdbscan
import graft.io.PointsIO

/** Large clustering smoke: the UCI Skin/NonSkin matrix (245,057 x 3 + label)
  * through the partitioned-exact pipeline — the dataset the reference ships
  * but cannot parse (tab-separated vs its `split(" ")`). Prints cluster
  * sizes, timing, and agreement of the binary ground truth with the two
  * largest clusters.
  */
object SkinSmoke {
  def main(args: Array[String]): Unit = {
    val input = args.headOption.getOrElse("/root/reference/数据集/Skin_NonSkin.txt")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.localBuilder("graft-skin-smoke", cpus.toInt)
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val pts = PointsIO.readPointsText(spark, input, labelCol = Some("truth")).cache()
    val n = pts.count()
    println(f"loaded $n rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def report(mode: String, clusterer: Hdbscan): Unit = {
      val t1 = System.nanoTime()
      val res = clusterer.fit(pts.select("id", "features")).cache()
      val sizes = res.groupBy("label").count().orderBy(col("count").desc)
      val top = sizes.collect()
      println(f"[$mode] clustered $n rows in ${(System.nanoTime() - t1) / 1e9}%.1f s; " +
        s"${top.count(_.getAs[Int]("label") != 0)} clusters")
      top.take(8).foreach(r => println(s"  label=${r.get(0)} size=${r.get(1)}"))

      // purity of found clusters vs the binary skin/non-skin truth
      val joined = res.join(pts.select("id", "truth"), "id").filter(col("label") =!= 0)
      val purity = joined.groupBy("label", "truth").count()
        .groupBy("label").agg(max("count").as("maj"), sum("count").as("tot"))
        .agg((sum("maj") / sum("tot")).as("purity")).collect()(0).getDouble(0)
      println(f"[$mode] cluster purity vs ground truth: $purity%.4f")
      res.unpersist()
      SessionHygiene.sweep(spark)
    }

    // partitioned-exact: the ≤ maxExactPoints path (Voronoi split + driver Kruskal)
    report("partitioned-exact", Hdbscan(minPts = 4, minClusterSize = 100,
      maxLocalSize = 4000, maxExactPoints = 300000))
    // multi-level CF-bubble sketch: the 100 TB path — sampleCap bubbles over
    // 245k points forces ~3 split levels; driver state O(#bubbles)
    report("bubbles", Hdbscan(minPts = 4, minClusterSize = 100,
      maxLocalSize = 4000, maxExactPoints = 100000, sampleCap = 2000))
    // unbounded exact: maxExactPoints below n forces the distributed
    // Borůvka global merge (the reference's Phase-2 completed) — candidate
    // edges never reach the driver, only the 245k-row final MST does
    report("exact-boruvka", Hdbscan(minPts = 4, minClusterSize = 100,
      maxLocalSize = 4000, maxExactPoints = 100000).setMode("exact"))
    spark.stop()
  }
}
