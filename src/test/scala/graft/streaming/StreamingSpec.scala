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
}
