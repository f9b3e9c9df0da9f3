package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Dev profiling main: interleaved same-session A/B of the fingerprint
  * variants (VERDICT r2 "what's wrong" #1 — the committed q_fingerprint
  * number did not reproduce in the driver bench). A = the shipped md5
  * oracle-checkable pair, B = the xxhash64 production pair; alternating
  * rounds isolate hash cost from machine load. */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.localBuilder("graft-prof", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      SessionHygiene.sweep(spark)
    }

    // ranking-stage A/B for the prefix-AllPairs join (VERDICT r2 wrong #3):
    // aggregate (sort_array(collect_list)) vs window (row_number) plans,
    // proven output-identical in OperatorsSpec
    for (round <- 1 to 2) {
      time(s"ngram agg-rank  #$round") {
        graft.operators.Dedup.ngramJaccardPairsPrefix(docs, "source")
          .write.format("noop").mode("overwrite").save()
      }
      time(s"ngram win-rank  #$round") {
        graft.operators.Dedup.ngramJaccardPairsPrefix(docs, "source", windowRanking = true)
          .write.format("noop").mode("overwrite").save()
      }
    }

    // ObjectHashAggregate sort-fallback hypothesis for q_adjacency_list:
    // default fallbackThreshold=128 distinct keys per partition vs raised
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def adjacency(): Unit = orders.groupBy(col("o_custkey"))
      .agg(array_join(sort_array(collect_list(col("o_orderkey"))), ",").as("orderkeys"),
        count(lit(1)).as("degree"))
      .orderBy(col("o_custkey"))
      .write.format("noop").mode("overwrite").save()
    for (round <- 1 to 3) {
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "128")
      time(s"adjacency fb=128  #$round")(adjacency())
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      time(s"adjacency fb=1M   #$round")(adjacency())
      spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    }

    for (round <- 1 to 3) {
      time(s"md5 pair      #$round") {
        docs.select(col("doc_id"),
            TextOps.fullMd5(col("text")).as("full_md5"),
            TextOps.minShingleMd5(col("text")).as("min_shingle_md5"))
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"xxhash64 pair #$round") {
        docs.select(col("doc_id"),
            TextOps.fullHash(col("text")).as("full_hash"),
            TextOps.minShingleHash(col("text")).as("min_shingle_hash"))
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
