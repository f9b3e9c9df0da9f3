package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Synthetic 1M-document near-dup smoke for the dedup/LSH family — the
  * text-pipeline analogue of [[MillionSmoke]]. Documents are deterministic
  * 40-token sequences generated distributed (no driver materialization,
  * ~200× the sf0.1 documents table); every 10th doc is followed by a
  * planted near-duplicate (one token substituted → word-3-shingle jaccard
  * ≈ 0.85), giving ~n/10 known true pairs. Runs the production
  * MinHash+LSH → exact-verify → transitive-group pipeline end to end and
  * reports wall time, recall on the planted pairs, and the count of
  * unplanted survivors (random 50k-vocab docs should produce none).
  */
object DedupMillionSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.localBuilder("graft-dedup-million", 32)
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocab = 50000L
    val id = col("doc_id")
    val isDup = pmod(id, lit(10L)) === 1
    val base = when(isDup, id - 1).otherwise(id)
    val swapPos = pmod(xxhash64(id), lit(40L))
    val tok = (p: Column) =>
      when(isDup && p === swapPos,
        concat(lit("x"), pmod(xxhash64(id, p), lit(vocab))))
        .otherwise(concat(lit("t"), pmod(xxhash64(base, p), lit(vocab))))
    val docs = spark.range(n).select(col("id").as("doc_id"))
      .select(id, concat_ws(" ", transform(sequence(lit(0L), lit(39L)), tok)).as("text"))
      .repartition(64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"generated ${docs.count()} docs (vocab $vocab, 40 tokens, dups every 10th)")

    val t0 = System.nanoTime()
    val pairs = operators.Dedup.minhashNearDup(docs).persist()
    val nPairs = pairs.count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    println(f"[minhash+lsh+verify] $nPairs pairs in $tPairs%.1f s")

    val planted = spark.range(n - 1).filter(pmod(col("id"), lit(10L)) === 0)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val nPlanted = planted.count()
    val hit = pairs.join(planted, Seq("id_a", "id_b"), "left_semi").count()
    println(f"[recall] $hit/$nPlanted planted pairs found (${hit.toDouble / nPlanted}%.4f); " +
      s"unplanted survivors: ${nPairs - hit}")

    val t1 = System.nanoTime()
    val groups = operators.Dedup.dedupClusters(spark, pairs).persist()
    val nGroups = groups.filter(col("is_keeper")).count()
    val nMembers = groups.count()
    println(f"[groups] $nMembers members in $nGroups groups, " +
      f"${(System.nanoTime() - t1) / 1e9}%.1f s (log-round star contraction)")

    assert(hit.toDouble / nPlanted >= 0.95, s"recall ${hit.toDouble / nPlanted} < 0.95")
    spark.stop()
  }
}
