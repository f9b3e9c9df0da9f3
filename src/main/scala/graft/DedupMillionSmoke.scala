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
  *
  * Additionally plants ONE mega-cluster of `megaK` (default 50,000) byte-
  * identical documents (ids n..n+megaK-1) — the boilerplate-duplicated-10⁵×
  * shape that is the normal case in web corpora. Under the pre-round-5
  * within-bucket all-pairs formulation this cluster alone would emit
  * megaK(megaK−1)/2 ≈ 1.25e9 candidate pairs from every band bucket
  * (job-killing); the identical-signature spanning chain must instead emit
  * exactly megaK−1 pairs, all jaccard 1.0, and dedupClusters must still
  * resolve the full cluster into one group of size megaK.
  */
object DedupMillionSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val megaK = if (args.length > 1) args(1).toLong else 50000L
    val spark = GraftSession.localBuilder("graft-dedup-million", 32)
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, n, megaK)
    spark.stop()
  }

  /** Body shared by [[main]] and the opt-in SmokeSuite. */
  def run(spark: org.apache.spark.sql.SparkSession, n: Long, megaK: Long = 50000L): Unit = {
    val vocab = 50000L
    val id = col("doc_id")
    val isDup = pmod(id, lit(10L)) === 1
    val base = when(isDup, id - 1).otherwise(id)
    val swapPos = pmod(xxhash64(id), lit(40L))
    val tok = (p: Column) =>
      when(isDup && p === swapPos,
        concat(lit("x"), pmod(xxhash64(id, p), lit(vocab))))
        .otherwise(concat(lit("t"), pmod(xxhash64(base, p), lit(vocab))))
    val baseDocs = spark.range(n).select(col("id").as("doc_id"))
      .select(id, concat_ws(" ", transform(sequence(lit(0L), lit(39L)), tok)).as("text"))
    // the mega-cluster: megaK identical docs on a vocabulary ("m<p>") disjoint
    // from the base corpus, so its only true neighbors are its own copies
    val megaText = (0 until 40).map(p => s"m$p").mkString(" ")
    val mega = spark.range(n, n + megaK).select(col("id").as("doc_id"), lit(megaText).as("text"))
    val docs = baseDocs.unionAll(mega)
      .repartition(64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"generated ${docs.count()} docs (vocab $vocab, 40 tokens, dups every 10th; " +
      s"+$megaK identical mega-cluster docs)")

    val t0 = System.nanoTime()
    val pairs = operators.Dedup.minhashNearDup(docs).persist()
    val nPairs = pairs.count()
    val tPairs = (System.nanoTime() - t0) / 1e9
    println(f"[minhash+lsh+verify] $nPairs pairs in $tPairs%.1f s")

    val planted = spark.range(n - 1).filter(pmod(col("id"), lit(10L)) === 0)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val nPlanted = planted.count()
    val hit = pairs.join(planted, Seq("id_a", "id_b"), "left_semi").count()
    // mega-cluster pair volume: linear (the spanning chain), NOT quadratic.
    // All-pairs would be megaK(megaK-1)/2 ≈ 1.25e9 rows; the chain is megaK-1.
    val megaPairs = pairs.filter(col("id_a") >= n || col("id_b") >= n)
    val nMega = megaPairs.count()
    val nMegaExact = megaPairs.filter(col("jaccard") === 1.0).count()
    println(f"[recall] $hit/$nPlanted planted pairs found (${hit.toDouble / nPlanted}%.4f); " +
      s"unplanted survivors: ${nPairs - hit - nMega}")
    println(s"[mega] $nMega pairs from the $megaK-identical-doc cluster " +
      s"(expected ${megaK - 1} chain pairs; all-pairs would be ${megaK * (megaK - 1) / 2})")

    val t1 = System.nanoTime()
    val groups = operators.Dedup.dedupClusters(spark, pairs).persist()
    val nGroups = groups.filter(col("is_keeper")).count()
    val nMembers = groups.count()
    val megaGroup = groups.filter(col("doc_id") >= n)
      .groupBy(col("group_id")).agg(count(lit(1)).as("sz"))
    val megaGroups = megaGroup.count()
    val megaSize = groups.filter(col("group_id") === n).count()
    println(f"[groups] $nMembers members in $nGroups groups, " +
      f"${(System.nanoTime() - t1) / 1e9}%.1f s (log-round star contraction); " +
      s"mega cluster: $megaGroups group(s), size-of-group(n)=$megaSize")

    assert(hit.toDouble / nPlanted >= 0.95, s"recall ${hit.toDouble / nPlanted} < 0.95")
    assert(nMega == megaK - 1, s"mega-cluster pair volume $nMega != linear ${megaK - 1}")
    assert(nMegaExact == megaK - 1, s"mega chain pairs not all jaccard=1.0 ($nMegaExact)")
    assert(megaGroups == 1 && megaSize == megaK,
      s"mega cluster not resolved into one group of $megaK ($megaGroups groups, size $megaSize)")
    assert(nPairs - hit - nMega == 0,
      s"${nPairs - hit - nMega} unplanted survivors (random 50k-vocab docs should produce none)")
    groups.unpersist(blocking = false); pairs.unpersist(blocking = false)
    docs.unpersist(blocking = false)
  }
}
