package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-evidence data generator (VERDICT r10 #4): synthesizes an sf1-ish
  * dataset (default 10× sf0.1) by replicating the driver tables with
  * DISJOINT key spaces per replica and deterministic content perturbation,
  * so the heavy-family queries can be timed one decade past the committed
  * gate without regenerating driver data (read-only) or changing workload
  * GEOMETRY:
  *
  *   - every key column (doc/vec/order/cust/supp/part/user ids) shifts by
  *     `replica × (max_key + 1)` — joins stay consistent, and graph
  *     queries see `factor` disjoint copies of the purchase graph (nodes
  *     AND edges ×factor ⇒ the linear-scaling shape the baseline table
  *     expects, instead of a densified graph whose distinct-pair count
  *     saturates);
  *   - `documents.text` gets a replica-salt token spliced after every 4th
  *     token (replica 0 verbatim), collapsing cross-replica shingle
  *     Jaccard below every dedup threshold — near-dup structure stays
  *     INTRA-replica, so candidate/output volume scales ~linearly instead
  *     of exploding on factor² cross-replica twins;
  *   - `embeddings.embedding` gets hash-seeded jitter (±0.05 per dim,
  *     replica 0 verbatim) so ANN/clustering geometry replicates without
  *     exact-duplicate vectors;
  *   - `events` shifts each replica by 97 s (windows keep their hourly
  *     density, rows per window ×factor) on a disjoint user population.
  *
  * Usage: runMain graft.tools.ScaleTestdata [srcDir] [dstDir] [factor]
  * Defaults: /root/testdata/sf0.1 → /tmp/testdata/sf1 ×10.
  */
object ScaleTestdata {

  def main(args: Array[String]): Unit = {
    val src = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/testdata/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.local("graft-scale-testdata",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, dst, factor)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    val reps = broadcast(spark.range(factor.toLong)
      .select(col("id").cast("long").as("r")))

    def tbl(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    // Flat SINGLE-FILE layout, exactly like the driver testdata
    // (`<dir>/<table>.parquet` is a file, not a directory): the streaming
    // sources select input via `pathGlobFilter` on leaf FILE names
    // (StreamingOps / EventsReader), so a directory-shaped table would
    // stream zero files and silently hand every q_stream_* query an empty
    // frame (ADVICE r11 medium). The upstream plan stays parallel; only
    // the final write funnels through one task (seconds at sf1 sizes).
    def write(df: DataFrame, name: String): Unit = {
      import org.apache.hadoop.fs.Path
      val tmp = s"$dst/_tmp_$name"
      df.repartition(1).write.mode("overwrite").parquet(tmp)
      val fs = new Path(dst).getFileSystem(spark.sparkContext.hadoopConfiguration)
      // globStatus returns null (not empty) when the dir vanished or the
      // writer produced no part files — normalize before matching so the
      // failure is the descriptive sys.error, not a MatchError (ADVICE r12)
      val part = Option(fs.globStatus(new Path(s"$tmp/part-*.parquet")))
          .getOrElse(Array.empty) match {
        case Array(one) => one.getPath
        case other => sys.error(s"expected one part file for $name, got ${other.length}")
      }
      val dest = new Path(s"$dst/$name.parquet")
      // stage next to the destination first, so the non-atomic window
      // (raw FileSystem has no atomic replace) is delete→rename of two
      // sibling entries, not delete→cross-directory move; a crash inside
      // it leaves `<name>.parquet.new` as the recovery artifact
      val staged = new Path(s"$dst/$name.parquet.new")
      fs.delete(staged, true)
      if (!fs.rename(part, staged)) sys.error(s"stage rename failed for $name")
      fs.delete(dest, true)
      if (!fs.rename(staged, dest)) sys.error(s"rename failed for $name")
      fs.delete(new Path(tmp), true)
      Console.err.println(s"[scale-testdata] wrote $name")
    }
    /** max(key)+1 — the per-replica key offset (keeps replicas disjoint). */
    def cap(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L

    val docs = tbl("documents")
    val docCap = cap(docs, "doc_id")
    // every token carries a per-replica suffix (replica 0 verbatim): each
    // replica's pair/similarity structure is ISOMORPHIC to the source
    // corpus while replicas share zero vocabulary — so dedup CANDIDATE
    // volume scales with the data, not factor² (the first cut spliced
    // salt tokens BETWEEN originals, which killed cross-replica output
    // but left every rare prefix token shared across a doc's 9 twins:
    // candidates grew ×100 while output grew ×10, and the inverted-index
    // dedup rows read 15–26× instead of their true linear shape)
    val suffixed = expr(
      """array_join(transform(split(text, ' '),
        |  t -> CASE WHEN t = '' THEN t ELSE concat(t, 'q', r, 'z') END),
        |  ' ')""".stripMargin)
    write(docs.crossJoin(reps)
      .select((col("doc_id") + col("r") * docCap).as("doc_id"),
        when(col("r") === 0, col("text")).otherwise(suffixed).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long")),
      "documents")

    val emb = tbl("embeddings")
    val vecCap = cap(emb, "vec_id")
    // circular dimension rotation per replica: an ISOMETRY (euclidean AND
    // cosine geometry preserved exactly), so every replica's neighbor/
    // cluster structure equals the source's, while a vector and its
    // rotated twins are generically unrelated — no cross-replica
    // near-dup twins (the first cut's ±0.05 jitter left each vector 9
    // near-identical copies, inflating cluster-routed candidate volume
    // ×100 over the true linear shape)
    val rotated = expr(
      """transform(embedding,
        |  (v, i) -> element_at(embedding,
        |    CAST(pmod(i + r, size(embedding)) + 1 AS INT)))""".stripMargin)
    write(emb.crossJoin(reps)
      .select((col("vec_id") + col("r") * vecCap).as("vec_id"),
        when(col("r") === 0, col("embedding")).otherwise(rotated).as("embedding"),
        col("label")),
      "embeddings")

    val ev = graft.io.EventsReader.batch(spark, src)
    val evCap = cap(ev, "event_id")
    val userCap = cap(ev, "user_id")
    write(ev.crossJoin(reps)
      .select((col("event_id") + col("r") * evCap).as("event_id"),
        timestamp_add("SECOND", col("r") * lit(97), col("ts")).as("ts"),
        (col("user_id") + col("r") * userCap).as("user_id"),
        col("event_type"), col("value"), col("props")),
      "events")

    val orders = tbl("orders")
    val orderCap = cap(orders, "o_orderkey")
    val custCap = cap(orders, "o_custkey")
    write(orders.crossJoin(reps)
      .select((col("o_orderkey") + col("r") * orderCap).as("o_orderkey"),
        (col("o_custkey") + col("r") * custCap).as("o_custkey"),
        col("o_orderstatus"), col("o_totalprice"), col("o_orderdate"),
        col("o_orderpriority")),
      "orders")

    val li = tbl("lineitem")
    val suppCap = cap(li, "l_suppkey")
    val partCap = cap(li, "l_partkey")
    write(li.crossJoin(reps)
      .select((col("l_orderkey") + col("r") * orderCap).as("l_orderkey"),
        (col("l_partkey") + col("r") * partCap).as("l_partkey"),
        (col("l_suppkey") + col("r") * suppCap).as("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"), col("l_shipdate")),
      "lineitem")

    write(tbl("customer").crossJoin(reps)
      .select((col("c_custkey") + col("r") * custCap).as("c_custkey"),
        col("c_name"), col("c_nationkey"), col("c_acctbal"), col("c_mktsegment")),
      "customer")
    write(tbl("supplier").crossJoin(reps)
      .select((col("s_suppkey") + col("r") * suppCap).as("s_suppkey"),
        col("s_name"), col("s_nationkey"), col("s_acctbal")),
      "supplier")
    write(tbl("part").crossJoin(reps)
      .select((col("p_partkey") + col("r") * partCap).as("p_partkey"),
        col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
        col("p_retailprice")),
      "part")
    // dimension leaves replicate as-is (nationkeys unchanged above)
    write(tbl("nation"), "nation")
    write(tbl("region"), "region")
  }
}
