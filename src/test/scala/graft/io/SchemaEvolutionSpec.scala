package graft.io

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Schema evolution on read — the append-only table whose newer files carry
  * an extra column. `mergeSchema` must union the file schemas (old rows
  * null-filled), and the default fast path (first-file schema) must stay
  * cheap — both behaviors a 100 TB table with years of appended files
  * relies on. */
class SchemaEvolutionSpec extends SparkTestBase {

  test("mergeSchema unions evolving file schemas; old rows null-fill the new column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/p1")
    Seq((3L, "c", 30.0), (4L, "d", 40.0)).toDF("id", "v", "score")
      .write.mode("overwrite").parquet(s"$dir/p2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/p1", s"$dir/p2")
    assert(merged.schema.fieldNames.sorted.toSeq == Seq("id", "score", "v"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(rows.toSeq == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(30.0)), (4L, "d", Some(40.0))))
    // selecting only the evolved column still prunes: old files contribute
    // nulls without materializing their full rows
    val s2 = merged.agg(sum(col("score"))).collect()(0).getDouble(0)
    assert(s2 == 70.0)
  }
}
