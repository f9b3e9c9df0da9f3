package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-prefiltered exact joins — the decontamination shape for key sets
  * too large to broadcast as rows but whose BLOOM FILTER fits.
  *
  * Built from Spark's own runtime-filter machinery (the codegen'd
  * `BloomFilterAggregate` / `BloomFilterMightContain` expression pair that
  * Catalyst injects for shuffle-join pruning) — no Scala UDF in the probe
  * path, so the membership test runs inside whole-stage codegen on the
  * corpus scan.
  *
  * Semantics are EXACT: the bloom filter only prunes. Its one-sided error
  * (no false negatives) means a row failing the probe is definitely absent
  * from the key set; rows passing it ("candidates", the true matches plus
  * an fpp-bounded sliver of the corpus) are confirmed with an ordinary
  * semi/anti join. At 100 TB the difference is the shuffle: a plain
  * semi-join shuffles the whole corpus by key; here only the candidate
  * sliver shuffles — the corpus-side cost is one scan plus ~10 bits per
  * key of broadcast state (1% fpp), e.g. ~1.2 GB for 10⁹ keys where raw
  * keys would be 10–100× that.
  */
object BloomJoin {

  private val hashSeed = 42L

  private def keyHash(c: Column): Column =
    GraftShim.column(XxHash64(Seq(GraftShim.expression(c)), hashSeed))

  /** Build a bloom filter over `keys.keyCol` as one distributed aggregate
    * (partial filters OR-merge map-side; driver state is the filter bytes,
    * never the keys). Returns null when `keys` is empty — the aggregate
    * has no rows to fold, and the join entry points treat null as the
    * empty set rather than probing it. */
  def buildFilter(keys: DataFrame, keyCol: String,
      expectedKeys: Long, fpp: Double = 0.01): Array[Byte] = {
    val numBits = org.apache.spark.util.sketch.BloomFilter
      .optimalNumOfBits(expectedKeys, fpp)
    val agg = new BloomFilterAggregate(
      GraftShim.expression(keyHash(col(keyCol))),
      Literal(expectedKeys), Literal(numBits))
    keys.select(GraftShim.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen membership probe of `c` against a built filter. */
  def mightContain(filter: Array[Byte], c: Column): Column =
    GraftShim.column(BloomFilterMightContain(
      Literal(filter, BinaryType), GraftShim.expression(keyHash(c))))

  /** Exact semi-join: rows of `big` whose `keyCol` appears in `keys`,
    * bloom-pruned before the confirming shuffle. */
  def bloomSemiJoin(big: DataFrame, keys: DataFrame, keyCol: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = buildFilter(keys, keyCol, expectedKeys, fpp)
    if (bf == null) return big.limit(0) // empty key set: nothing matches
    big.filter(mightContain(bf, col(keyCol)))
      .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
      // a USING join emits the key column FIRST — restore the caller's
      // column order (see bloomAntiJoin for why this is load-bearing)
      .select(big.columns.map(col).toIndexedSeq: _*)
  }

  /** Exact anti-join: rows of `big` whose `keyCol` does NOT appear in
    * `keys` — the decontamination keep-side. Rows failing the bloom probe
    * are provably clean and never shuffle; only candidates pay the
    * confirming anti-join. */
  def bloomAntiJoin(big: DataFrame, keys: DataFrame, keyCol: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bf = buildFilter(keys, keyCol, expectedKeys, fpp)
    if (bf == null) return big // empty key set: everything is clean
    val probe = mightContain(bf, col(keyCol))
    val clean = big.filter(!probe)
    // a USING join emits the key column FIRST, so the survivor frame's
    // column order differs from `clean`'s whenever keyCol isn't already
    // big's first column — and unionAll is POSITIONAL, so the misaligned
    // columns union under implicit ANSI casts that only detonate when a
    // survivor row actually materializes. Survivors are bloom FALSE
    // POSITIVES: zero on a generously-sized filter (every small-SF run),
    // present the moment the key count outgrows expectedKeys — the sf1
    // full bench was the first run to produce one (r12). Restore big's
    // column order before the union; a spec now overloads the filter to
    // force survivors and pins exactness.
    val survivors = big.filter(probe)
      .join(keys.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .select(big.columns.map(col).toIndexedSeq: _*)
    clean.unionAll(survivors)
  }
}
