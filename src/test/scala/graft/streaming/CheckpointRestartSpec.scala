package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkTestBase

/** Checkpointed restart — the durability contract every production stream
  * depends on: stop the query, restart with the SAME checkpointLocation,
  * and (a) committed input files are not reprocessed, (b) aggregation state
  * resumes where it left off. The memory-sink streams in StreamingOps run
  * checkpoint-free by design (one-shot AvailableNow replays); this spec
  * pins that the state-store + file-source-log machinery works when a
  * checkpoint IS configured. */
class CheckpointRestartSpec extends SparkTestBase {

  test("stateful aggregation resumes from its checkpoint; committed files never reprocess") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    new java.io.File(s"$dir/in").mkdirs()
    def addFile(name: String, rows: Seq[(Long, Double)]): Unit =
      rows.toDF("user_id", "value").coalesce(1)
        .write.mode("overwrite").parquet(s"$dir/in/$name")
    def runOnce(tag: String): Map[Long, Long] = {
      val schema = org.apache.spark.sql.types.StructType.fromDDL(
        "user_id LONG, value DOUBLE")
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true").parquet(s"$dir/in")
      // memory sink refuses checkpoint recovery; foreachBatch is the
      // recoverable production sink for update-mode aggregations
      val buf = new java.util.concurrent.ConcurrentHashMap[Long, Long]()
      val q = stream.groupBy(col("user_id")).count()
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          df.collect().foreach(r => buf.put(r.getLong(0), r.getLong(1)))
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      buf.asScala.toMap.map { case (k, v) => (k: Long, v: Long) }
    }
    addFile("b1", Seq((1L, 1.0), (1L, 2.0), (1L, 3.0), (2L, 9.0)))
    val first = runOnce("r1")
    assert(first == Map(1L -> 3L, 2L -> 1L), s"first run: $first")
    // delete the committed file: a restart that tried to reprocess it would
    // fail or drop user 1's history — the file-source log must skip it
    val b1 = new java.io.File(s"$dir/in/b1")
    b1.listFiles().foreach(_.delete()); b1.delete()
    addFile("b2", Seq((1L, 4.0), (1L, 5.0)))
    val second = runOnce("r2")
    // only user 1 appears (update mode emits touched keys), and its count
    // must INCLUDE the pre-restart state: 3 committed + 2 new = 5
    assert(second == Map(1L -> 5L),
      s"state did not survive the restart (expected user 1 -> 5): $second")
  }
}
