package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Dev profiling main: stage-by-stage timings for hotspot hunting. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }

    time("charShingles only") {
      docs.select(TextOps.charShingles(col("text"), 3).as("sh")).selectExpr("size(sh)").count()
    }
    time("+ xxhash transform") {
      docs.select(transform(TextOps.charShingles(col("text"), 3), s => xxhash64(s)).as("sh"))
        .selectExpr("size(sh)").count()
    }
    time("+ array_distinct") {
      docs.select(array_distinct(transform(TextOps.charShingles(col("text"), 3),
        s => xxhash64(s))).as("sh")).selectExpr("size(sh)").count()
    }
    time("explode+distinct variant") {
      docs.select(col("doc_id"), explode(transform(TextOps.charShingles(col("text"), 3),
        s => xxhash64(s))).as("h")).distinct().count()
    }
    time("full ngramJaccardPairs") {
      graft.operators.Dedup.ngramJaccardPairs(docs, "source").count()
    }
    spark.stop()
  }
}
