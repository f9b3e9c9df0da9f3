package graft.operators

import graft.SparkTestBase

class MergeSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  private def snap = {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "name", "bal")
  }

  test("applyCdc: upsert/delete/pass-through in one pass") {
    import spark.implicits._
    val delta = Seq(
      (2L, "b2", 21.0, "U", 1L),  // update existing
      (3L, "c", 30.0, "D", 1L),   // delete existing
      (9L, "i", 90.0, "I", 1L))   // insert new key
      .toDF("k", "name", "bal", "op", "seq")
    val out = Merge.applyCdc(snap, delta, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "a", 10.0),    // untouched
      (2L, "b2", 21.0),   // updated
      (4L, "d", 40.0),    // untouched
      (9L, "i", 90.0)))   // inserted (3 deleted)
  }

  test("applyCdc: latest-wins per key, including delete-then-reinsert") {
    import spark.implicits._
    val delta = Seq(
      (2L, "old", 0.0, "U", 1L),
      (2L, "new", 22.0, "U", 5L),  // newest for k=2 wins
      (4L, "d", 40.0, "D", 1L),
      (4L, "d4", 44.0, "I", 2L),   // reinsert AFTER the delete → lands
      (1L, "x", 0.0, "U", 3L),
      (1L, "x", 0.0, "D", 7L))     // delete AFTER the update → key gone
      .toDF("k", "name", "bal", "op", "seq")
    val out = Merge.applyCdc(snap, delta, Seq("k"))
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (2L, "new", 22.0),
      (3L, "c", 30.0),
      (4L, "d4", 44.0)))
  }

  test("applyCdc: empty delta is identity; insert-only delta appends") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String, Double, String, Long)]
      .toDF("k", "name", "bal", "op", "seq")
    assert(Merge.applyCdc(snap, empty, Seq("k")).count() == 4)
    val ins = Seq((9L, "i", 90.0, "I", 1L)).toDF("k", "name", "bal", "op", "seq")
    assert(Merge.applyCdc(snap, ins, Seq("k")).count() == 5)
  }

  test("applyCdc: delta side reuses one key exchange for window + join") {
    import spark.implicits._
    val delta = Seq((2L, "b2", 21.0, "U", 1L)).toDF("k", "name", "bal", "op", "seq")
    val plan = Merge.applyCdc(snap, delta, Seq("k"))
      .queryExecution.executedPlan.toString
    // the latest-wins window's hash partitioning on k must satisfy the
    // join's requirement: no second exchange between window and join
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected one exchange per side, got $exchanges:\n$plan")
  }
}
