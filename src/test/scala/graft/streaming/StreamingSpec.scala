package graft.streaming

import graft.SparkTestBase
import graft.queries.Relational

class StreamingSpec extends SparkTestBase {
  test("streamed hourly aggregation equals batch aggregation") {
    val streamRes = StreamingOps.eventsHourlyStream(spark, sf()).collect()
    val batchRes = Relational.eventsHourly(spark, sf()).collect()
    assert(streamRes.length == batchRes.length && streamRes.nonEmpty)
    assert(streamRes.map(_.toString).sorted.sameElements(batchRes.map(_.toString).sorted))
  }

  test("running max: cross-batch state, change-only emission over real micro-batches") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("runmax").toString
    // two files = two micro-batches (maxFilesPerTrigger=1). Batch 2 brings
    // no improvement for user 1 (4 < 5) and an improvement for user 2.
    Seq((1L, 5.0), (1L, 3.0), (2L, 10.0)).toDF("user_id", "value")
      .coalesce(1).write.parquet(s"$dir/b1")
    Seq((1L, 4.0), (2L, 11.0)).toDF("user_id", "value")
      .coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
      .as[(Long, Double)]
    val name = s"runmax_test_${System.nanoTime()}"
    val q = StreamingOps.runningMaxChanges(stream).toDF("user_id", "run_max")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.table(name).as[(Long, Double)].collect().toSeq
    spark.catalog.dropTempView(name)
    // exactly three emissions: (1,5) and (2,10) in batch 1, (2,11) in
    // batch 2 — and crucially NO (1,4): state survived the batch boundary
    assert(emitted.sorted == Seq((1L, 5.0), (2L, 10.0), (2L, 11.0)),
      s"got $emitted")
  }

  test("streaming dedup state spans micro-batches: repeats in batch 2 emit nothing") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dedup").toString
    Seq("alpha", "beta").toDF("text").coalesce(1).write.parquet(s"$dir/b1")
    Seq("alpha", "gamma").toDF("text").coalesce(1).write.parquet(s"$dir/b2")
    val schema = spark.read.parquet(s"$dir/b1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("recursiveFileLookup", "true").format("parquet").load(dir)
      .select(md5(col("text")).as("content_hash"))
      .dropDuplicates("content_hash")
    val name = s"dedup_test_${System.nanoTime()}"
    val q = stream.writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val emitted = spark.table(name).as[String].collect().toSeq
    spark.catalog.dropTempView(name)
    // "alpha" reappears in batch 2 but the state store already has it:
    // exactly 3 distinct hashes emitted, no duplicates
    assert(emitted.length == 3 && emitted.distinct.length == 3, s"got $emitted")
  }

  test("stateful streaming sessionization matches batch session counts") {
    import org.apache.spark.sql.functions._
    val streamed = StreamingOps.sessionizeStream(spark, sf()).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val batch = Relational.sessionize(spark, sf())
      .groupBy(col("user_id")).agg(max(col("session_idx")).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
