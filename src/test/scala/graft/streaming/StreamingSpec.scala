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
