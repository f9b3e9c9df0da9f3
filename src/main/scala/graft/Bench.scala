package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints one JSON line {"metric":...,"queries":{name:sec,...}}. Results are
  * fully materialized through the noop sink (count() would let Spark prune
  * the plan).
  *
  * De-noised (round 7): each query runs SPARK_GRAFT_BENCH_REPS times
  * (default 3) and reports the MIN — the machine-capability statistic; a
  * single-shot bench swung 1.75× on a byte-identical jar between rounds 5
  * and 6 purely from sandbox load, which makes a 2×-of-baseline gate
  * meaningless. The per-query max−min spread is reported alongside so load
  * noise is visible instead of silently folded into the timing. Queries
  * that ERROR are excluded from the timing map and listed under "errors" —
  * a 0.06 s analysis fast-fail must not masquerade as a measurement.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.localBuilder("graft-bench", cpus.toInt)
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional args: substring filters to bench a subset of queries;
    // an arg prefixed with '=' matches exactly (so "=q_hdbscan" doesn't
    // drag in the whole q_hdbscan_* family)
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(q => args.isEmpty || args.exists(a =>
        if (a.startsWith("=")) q._1 == a.drop(1) else q._1.contains(a)))
    // untimed warmup: absorb JVM/codegen/noop-sink startup so the
    // alphabetically-first query isn't charged ~4s of session warmup
    // (measured in graft.Prof: q_adjacency_list 4.5s first vs 0.3s warm)
    spark.range(100000).selectExpr("id", "id % 7 AS k")
      .groupBy("k").count().write.format("noop").mode("overwrite").save()
    // warm the parquet read path against whatever table the dataset dir
    // actually has (an args-filtered or docs-only dir may lack region)
    Seq("region", "documents", "embeddings", "lineitem")
      .map(t => new java.io.File(s"$sfDir/$t.parquet")).find(_.exists())
      .foreach(f => spark.read.parquet(f.getPath)
        .write.format("noop").mode("overwrite").save())
    SessionHygiene.sweep(spark)
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val results = wanted.flatMap { case (name, fn) =>
      val times = (1 to reps).iterator.map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            errors(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(300)}"
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        SessionHygiene.sweep(spark) // outside the timer; leftovers are the query's own result blocks
        (ok, dt)
      }.takeWhile(_._1).map(_._2).toSeq // first failure aborts the query's reps
      if (times.size < reps) None // errored: excluded from timings, listed in errors
      else Some((name, times.min, times.max - times.min))
    }
    def jmap(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = jmap(results.map { case (k, v, _) => k -> f"$v%.3f" })
    val spread = jmap(results.map { case (k, _, s) => k -> f"$s%.3f" })
    val errs = jmap(errors.toSeq.map { case (k, v) =>
      k -> ("\"" + v.replaceAll("[\\\\\"\\n\\r\\t]", " ") + "\"") })
    val total = results.map(_._2).sum
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"stat":"min","spread":$spread,"errors":$errs}"""
    println(line)
    // also persist the JSON where log framing can't mangle it (the round-7
    // driver artifact carried only a truncated log tail with parsed:null);
    // opt-in via env so the default contract — one stdout line — is unchanged
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
    }
    spark.stop()
  }
}
