package graft.operators

import org.apache.spark.sql.DataFrame

/** P1 — stratified sampling, in both the approximate and EXACT flavors the
  * reference pipeline uses (`源代码/main/Main.java:132-141` calls
  * `JavaPairRDD.sampleByKeyExact(false, fractions)` inside its split loop).
  *
  * The hash-Bernoulli variant (q_sample_stratified) is one seeded codegen
  * pass — the 100 TB default. This wrapper is the exact-size companion:
  * per-stratum sample of EXACTLY ⌈f_k · n_k⌉ rows, delegating to Spark's
  * RDD-level `sampleByKeyExact` (acceptance/rejection with per-key count
  * passes — more expensive than Bernoulli by design, which is why the
  * reference only applies it to the seed-selection stratum, not the corpus).
  * The per-key output SIZE is deterministic at any parallelism, which is
  * what q_sample_exact puts on the oracle gate; WHICH rows are kept is
  * seed-dependent.
  */
object Sampling {

  def sampleByKeyExact(df: DataFrame, keyCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    val spark = df.sparkSession
    val keyIdx = df.schema.fieldIndex(keyCol)
    val sampled = df.rdd.keyBy(r => String.valueOf(r.get(keyIdx)))
      .sampleByKeyExact(withReplacement = false, fractions, seed)
      .values
    spark.createDataFrame(sampled, df.schema)
  }
}
