package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Weighted sampling without replacement — Efraimidis & Spirakis (2006)
    * A-ES: each row draws a uniform u and is ranked by ln(u)/w (the
    * monotone log form of u^(1/w)); the global top-k by that key is an
    * exact weighted sample. One codegen pass + a distributed partial top-k
    * (`orderBy.limit` → TakeOrdered, per-partition heaps, no full-sort
    * shuffle) — the 100 TB shape for "sample 10M docs proportional to
    * quality score".
    *
    * The uniform is NOT `rand()`: it is md5(id:seed)'s leading 52 bits
    * scaled to [0,1) — deterministic at any parallelism, identical in any
    * engine with md5 (the q_train_split trick), so the SELECTED SET itself
    * sits on the DuckDB oracle gate, not just its size. The only
    * cross-engine float risk is ln() ulp noise at the k-th/(k+1)-th
    * boundary; SamplingSpec asserts the boundary gap is orders of
    * magnitude above ulp on every SF corpus.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, seed: Long = 42L): DataFrame = {
    // leading 13 hex chars = 52 bits — exactly representable in a double
    val u = conv(substring(md5(concat(col(idCol).cast("string"),
        lit(":" + seed))), 1, 13), 16, 10)
      .cast("double") / lit(4503599627370496.0) // 2^52
    df.filter(col(weightCol) > 0)
      .withColumn("aes_key", log(u) / col(weightCol))
      .orderBy(col("aes_key").desc, col(idCol))
      .limit(k)
      .drop("aes_key")
  }
}
