package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Parity: the single-pass codegen text kernels must be bit-identical to
  * the interpreted-HOF Spark-expression forms they replaced (the HOF forms
  * define the semantics; they were just O(L²)/5-pass slow — VERDICT r1).
  */
class TextKernelsSpec extends SparkTestBase {

  private def corpus = spark.read.parquet(s"${sf()}/documents.parquet")

  test("minShingleHash codegen == HOF form on the sf0.001 corpus + edge cases") {
    import spark.implicits._
    val edge = Seq(
      (9001L, ""), (9002L, "   "), (9003L, "one"), (9004L, "one two three four"),
      (9005L, "one two three four five"), (9006L, "  MIXED Case\ttabs\nand lines  "),
      (9007L, "的 是 在 了 和 有 我 不 这 上")).toDF("doc_id", "text")
    val df = corpus.select($"doc_id", $"text").unionAll(edge)
    val bad = df.select($"doc_id",
        TextOps.minShingleHash($"text").as("fast"),
        TextOps.minShingleHashHof($"text").as("slow"))
      .filter($"fast" =!= $"slow")
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("minShingleMd5 codegen == HOF md5-argmin form") {
    import spark.implicits._
    val edge = Seq(
      (9001L, ""), (9002L, "   "), (9003L, "one"), (9004L, "one two three four"),
      (9005L, "one two three four five"), (9006L, "  MIXED Case\ttabs\nand lines  "),
      (9007L, "的 是 在 了 和 有 我 不 这 上")).toDF("doc_id", "text")
    val df = corpus.select($"doc_id", $"text").unionAll(edge)
    val bad = df.select($"doc_id",
        TextOps.minShingleMd5($"text").as("fast"),
        array_min(transform(TextOps.wordShingles($"text", 5), s => md5(s))).as("slow"))
      .filter($"fast" =!= $"slow")
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("langId codegen == HOF form on the sf0.001 corpus + edge cases") {
    import spark.implicits._
    val edge = Seq(
      (9001L, ""), (9002L, "xyzzy plugh"), (9003L, "the der el le 的"),
      (9004L, "la la la"), (9005L, "que que"), // overlapping es/fr markers
      (9006L, "THE The the")).toDF("doc_id", "text")
    val df = corpus.select($"doc_id", $"text").unionAll(edge)
    val bad = df.select($"doc_id",
        TextOps.langId($"text").as("fast"),
        TextOps.langIdHof($"text").as("slow"))
      .filter($"fast" =!= $"slow")
    assert(bad.isEmpty, s"mismatches: ${bad.take(5).mkString(", ")}")
  }

  test("word/char shingle hashes + minhash sig + simhash: codegen == HOF forms") {
    import spark.implicits._
    val edge = Seq(
      (9001L, ""), (9002L, "one two"), (9003L, "a b c d e f g h"),
      (9004L, "  Tabs\tand  RUNS   of space "), (9005L, "的 是 在 了"))
      .toDF("doc_id", "text")
    val df = corpus.select($"doc_id", $"text").limit(200).unionAll(edge)
    val badWord = df.select(
        graft.expr.TextExpressions.wordShingleHashes($"text", 3).as("fast"),
        array_distinct(transform(TextOps.wordShingles($"text", 3), s => xxhash64(s))).as("slow"))
      .filter($"fast" =!= $"slow")
    assert(badWord.isEmpty, s"word-shingle mismatches: ${badWord.take(3).mkString}")
    val badChar = df.select(
        graft.expr.TextExpressions.charShingleHashes($"text", 3).as("fast"),
        array_distinct(transform(TextOps.charShingles($"text", 3), s => xxhash64(s))).as("slow"))
      .filter($"fast" =!= $"slow")
    assert(badChar.isEmpty, s"char-shingle mismatches: ${badChar.take(3).mkString}")
    val badSig = df
      .select(graft.expr.TextExpressions.wordShingleHashes($"text", 3).as("sh"))
      .select(Dedup.minhashSignature($"sh", 32).as("fast"),
        Dedup.minhashSignatureHof($"sh", 32).as("slow"))
      .filter($"fast" =!= $"slow")
    assert(badSig.isEmpty, s"minhash-sig mismatches: ${badSig.take(3).mkString}")
    val badSim = df.select(Dedup.simhash($"text").as("fast"), Dedup.simhashHof($"text").as("slow"))
      .filter($"fast" =!= $"slow")
    assert(badSim.isEmpty, s"simhash mismatches: ${badSim.take(3).mkString}")
  }

  test("ngram jaccard hot-shingle pruning: identity above max-df, subset below") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s", "the quick brown fox jumps"), (2L, "s", "the quick brown fox leaps"),
      (3L, "s", "the slow red turtle walks"), (4L, "s", "unrelated zebra content"))
      .toDF("doc_id", "source", "text")
    def pairs(maxDf: Long) =
      Dedup.ngramJaccardPairs(docs, "source", threshold = 0.1, maxDf = maxDf)
        .select($"id_a", $"id_b", $"jaccard").as[(Long, Long, Double)].collect().toSet
    val exact = pairs(Long.MaxValue)
    assert(exact == pairs(4L)) // max possible df = 4 docs → no pruning
    val pruned = pairs(2L)
    // pruning only lowers jaccard: every surviving pair exists in exact with ≥ value
    assert(pruned.forall { case (a, b, j) =>
      exact.exists { case (ea, eb, ej) => ea == a && eb == b && ej >= j } })
    assert(pruned.size <= exact.size)
  }

  test("textStats kernel == per-column HOF forms on the sf0.001 corpus + edge cases") {
    import spark.implicits._
    val corpus = spark.read.parquet(s"${sf()}/documents.parquet")
      .select($"doc_id", $"text")
      .unionAll(Seq((90001L, ""), (90002L, "   "), (90003L, "\n\n"),
        (90004L, "the the the"), (90005L, "ALL CAPS 123 !!!")).toDF("doc_id", "text"))
    val t = col("text")
    val st = graft.expr.TextExpressions.textStats(t)
    val rows = corpus.select($"doc_id",
      st.getField("n_tokens").as("k_tok"), TextOps.tokenCount(t).as("h_tok"),
      st.getField("n_subwords").as("k_sub"), TextOps.subwordCountEstimate(t).as("h_sub"),
      round(st.getField("alpha_ratio"), 6).as("k_al"), TextOps.alphaRatio(t).as("h_al"),
      round(st.getField("digit_ratio"), 6).as("k_dg"), TextOps.digitRatio(t).as("h_dg"),
      round(st.getField("mean_tok_len"), 6).as("k_mt"), TextOps.meanTokenLength(t).as("h_mt"),
      round(st.getField("stopword_ratio"), 6).as("k_sw"), TextOps.stopwordRatio(t).as("h_sw"),
      round(st.getField("quality"), 6).as("k_q"), TextOps.qualityScore(t).as("h_q"))
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == r.getInt(2), s"n_tokens@$id")
      assert(r.getLong(3) == r.getLong(4), s"n_subwords@$id")
      for ((k, h, nm) <- Seq((5, 6, "alpha"), (7, 8, "digit"), (9, 10, "mean_tok"),
        (11, 12, "stopword"), (13, 14, "quality")))
        assert(r.getDouble(k) == r.getDouble(h), s"$nm@$id: ${r.getDouble(k)} vs ${r.getDouble(h)}")
    }
  }

  test("bpeTokenCount: greedy longest-match, hand-computed") {
    import spark.implicits._
    val vocab = Seq("the", "ing", "in", "er", "an", "a", "e", "i", "o", "u",
      "t", "h", "n", "g", "r", "s", "d")
    val docs = Seq(
      (1L, "The thing  sang"), // the=1; t,h,ing=3; s,an,g=3 → 7
      (2L, ""),                // empty → 0
      (3L, "zz!"),             // all unknown chars → 3 (consume-1 rule)
      (4L, "thethe"),          // the,the → 2 (longest-match repeats)
      (5L, "  inger ")         // ing,er → 2 (longest wins over in+g+er)
    ).toDF("doc_id", "text")
    val got = docs.select($"doc_id", TextOps.bpeTokenCount($"text", vocab).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 7L, 2L -> 0L, 3L -> 3L, 4L -> 2L, 5L -> 2L), s"$got")
  }

  test("collocations: PMI matches the hand formula; minCount gates membership") {
    import spark.implicits._
    val docs = (
      (1 to 10).map(i => (i.toLong, "new york is big")) ++
      (11 to 15).map(i => (i.toLong, "the cat the dog"))).toDF("doc_id", "text")
    val got = TextOps.collocations(docs, minCount = 5L)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // Nu=60 tokens, Nb=45 bigrams; (new,york): c2=10, cu=10/10 →
    // ln(10·60²/(45·10·10)) = ln 8
    assert(got.keySet === Set(("new", "york"), ("york", "is"), ("is", "big"),
      ("the", "cat"), ("cat", "the"), ("the", "dog")))
    assert(got(("new", "york")) === ((10L,
      BigDecimal(math.log(8.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // raising minCount drops the 5-count pairs
    val strict = TextOps.collocations(docs, minCount = 6L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(strict === Set(("new", "york"), ("york", "is"), ("is", "big")))
  }

  test("normalizeText: NFC composes, controls strip, whitespace collapses, idempotent") {
    import spark.implicits._
    val docs = Seq(
      (1L, "cafe\u0301 latte"),     // decomposed accent -> e-acute
      (2L, "caf\u00e9 latte"),      // precomposed - must hash identically to 1
      (3L, "a\u0007b\tc\r\nd"),  // BEL stripped, tab/CRLF collapse
      (4L, "  already   clean  "),
      (5L, "")).toDF("doc_id", "text")
    val got = docs.select($"doc_id", TextOps.normalizeText($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "caf\u00e9 latte")
    assert(got(1L) === got(2L))
    assert(got(3L) === "a b c d")
    assert(got(4L) === "already clean")
    assert(got(5L) === "")
    // idempotence: normalizing normalized output is a fixpoint
    val again = docs.select($"doc_id",
        TextOps.normalizeText(TextOps.normalizeText($"text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === got)
  }

  test("contaminationScore: appended eval text flags; disjoint text does not") {
    import spark.implicits._
    val evalDocs = Seq((1L, "the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val clean = "completely unrelated prose about spark partitions and shuffles in production here"
    val corpus = Seq(
      (10L, clean),
      (11L, clean + " the quick brown fox jumps over the lazy dog tonight")).toDF("doc_id", "text")
    val got = TextOps.contaminationScore(corpus, evalDocs, n = 8, threshold = 0.2)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(got(10L) === ((0L, false)))
    assert(got(11L)._1 > 0L && got(11L)._2, s"planted doc must flag: ${got(11L)}")
  }

  test("kneserNeyLogProb: hand-computed on 'a b a b a c'") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val r = TextOps.kneserNeyLogProb(docs).collect()
    assert(r.length === 1)
    assert(r(0).getLong(1) === 5L) // 5 bigrams
    // c2: (a,b)=2 (b,a)=2 (a,c)=1; c(a)=3 T(a)=2; c(b)=2 T(b)=1;
    // cont: a=b=c=1; ntypes=3; D=0.75
    val pBgivenA = (2 - 0.75) / 3 + 0.75 * 2 / 3 * (1.0 / 3)
    val pAgivenB = (2 - 0.75) / 2 + 0.75 * 1 / 2 * (1.0 / 3)
    val pCgivenA = (1 - 0.75) / 3 + 0.75 * 2 / 3 * (1.0 / 3)
    val want = (2 * math.log(pBgivenA) + 2 * math.log(pAgivenB) + math.log(pCgivenA)) / 5
    assert(r(0).getDouble(2) ===
      BigDecimal(want).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("fingerprint equality tracks normalized-text equality on duplicates") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "  Alpha   beta GAMMA delta\tepsilon zeta "), // same after normalize
      (3L, "totally different content here right now")).toDF("doc_id", "text")
    val fp = docs.select($"doc_id",
      TextOps.fullHash($"text").as("fh"), TextOps.minShingleHash($"text").as("msh"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }
}
