package graft.expr

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text kernels behind native codegen Expressions.
  *
  * The round-1 HOF forms in [[graft.operators.TextOps]] hit the interpreted
  * higher-order-function trap: inside `transform(...)` the `tokens(text)`
  * subtree is re-evaluated PER SHINGLE, so `minShingleHash` cost
  * tokens × retokenize = O(L²) per document (measured 139 s for 5,000 docs
  * at sf0.1), and `langId` re-tokenized the document once per language.
  * These kernels tokenize exactly once per row and stay inside whole-stage
  * codegen via static-call `doGenCode`.
  *
  * Tokenization semantics are bit-identical to the Spark-expression form
  * `split(trim(lower(text)), "\\s+")`: lowercase via `UTF8String.toLowerCase`
  * (what `lower()` runs), trim of 0x20 spaces only (what `trim()` strips —
  * NOT Java's `String.trim`, which also eats control chars), and
  * `Pattern.split(..., -1)` (what `split()` with its default limit does).
  * Hashes are seed-42 xxhash64 over UTF-8 bytes — identical to `xxhash64()`.
  */
object TextKernels {

  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** `split(trim(lower(text)), "\\s+")`, evaluated once. */
  def tokensOf(text: UTF8String): Array[String] = {
    val lowered = text.toLowerCase.toString
    var st = 0
    var en = lowered.length
    while (st < en && lowered.charAt(st) == ' ') st += 1
    while (en > st && lowered.charAt(en - 1) == ' ') en -= 1
    WS.split(lowered.substring(st, en), -1)
  }

  private def hash(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)

  /** Unicode NFC canonical composition (java.text.Normalizer — the same
    * UAX #15 algorithm DuckDB's nfc_normalize implements, which is what
    * lets the oracle replay it). The fast path skips allocation entirely:
    * Normalizer.isNormalized is O(n) with no copy, and real-world text is
    * overwhelmingly already NFC. */
  def nfcNormalize(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  /** min(xxhash64(shingle)) over word `n`-shingles; a document shorter than
    * `n` tokens contributes its whole token stream as one shingle
    * (`TextOps.wordShingles` semantics). One tokenize + one O(L·n) pass. */
  def minShingleHash(text: UTF8String, n: Int): Long = {
    val toks = tokensOf(text)
    if (toks.length < n) return hash(toks.mkString(" "))
    var min = Long.MaxValue
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val h = hash(sb.toString)
      if (h < min) min = h
      i += 1
    }
    min
  }

  // ---- language ID: one tokenize, one hash-map probe per token ----

  private val langNames: Array[String] =
    graft.operators.TextOps.langMarkers.keys.toArray.sorted

  /** marker token → indices of every language claiming it (markers overlap:
    * e.g. "la"/"que" are both es and fr). */
  private val markerIndex: java.util.HashMap[String, Array[Int]] = {
    val m = new java.util.HashMap[String, Array[Int]]()
    langNames.zipWithIndex.foreach { case (lang, i) =>
      graft.operators.TextOps.langMarkers(lang).foreach { tok =>
        val cur = m.get(tok)
        m.put(tok, if (cur == null) Array(i) else cur :+ i)
      }
    }
    m
  }

  private val UND = UTF8String.fromString("und")
  private val langU8: Array[UTF8String] = langNames.map(UTF8String.fromString)

  /** Argmax-vote language ID; ties break to the lexicographically LARGEST
    * language name (the round-1 `array_max` over (hits, lang) structs did
    * exactly this); zero marker hits → "und". */
  def langId(text: UTF8String): UTF8String = {
    val toks = tokensOf(text)
    val counts = new Array[Int](langNames.length)
    var i = 0
    while (i < toks.length) {
      val hit = markerIndex.get(toks(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    var best = 0
    var k = 1
    while (k < counts.length) {
      if (counts(k) >= counts(best)) best = k // ascending scan: later (larger) name wins ties
      k += 1
    }
    if (counts(best) == 0) UND else langU8(best)
  }


  // ---- single-pass per-doc text statistics (q_text_stats hot path) ----

  private val stopSet: java.util.HashSet[String] = {
    val h = new java.util.HashSet[String]()
    graft.operators.TextOps.englishStopwords.foreach(h.add)
    h
  }

  /** One tokenize + one code-point scan computing every `TextOps.analyze`
    * numeric column at once — the HOF form re-tokenized per column and ran
    * interpreted lambdas. Values are UNROUNDED; callers apply Spark
    * `round()` so rounding semantics are bit-identical to the old plan.
    * Fields: (n_tokens int, n_subwords long, alpha_ratio, digit_ratio,
    * mean_tok_len, stopword_ratio, quality). */
  def textStats(text: UTF8String): InternalRow = {
    val raw = text.toString
    var cp = 0; var alpha = 0; var digit = 0
    var i = 0
    while (i < raw.length) {
      val c = raw.codePointAt(i)
      cp += 1
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha += 1
      else if (c >= '0' && c <= '9') digit += 1
      i += Character.charCount(c)
    }
    val toks = tokensOf(text)
    var sumLen = 0L; var subw = 0L; var stop = 0
    var j = 0
    while (j < toks.length) {
      val t = toks(j)
      val tl = t.codePointCount(0, t.length)
      sumLen += tl
      subw += (tl + 3) / 4 // ceil(len/4)
      if (stopSet.contains(t)) stop += 1
      j += 1
    }
    // `when(length(trim(text)) === 0, 0)`: trim strips 0x20 only
    var st = 0; var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    val nTokens = if (en == st) 0 else toks.length
    val n = toks.length.toDouble // split(-1) never yields an empty array
    val alphaR = if (cp == 0) 0.0 else alpha.toDouble / cp
    val digitR = if (cp == 0) 0.0 else digit.toDouble / cp
    val stopR = stop / n
    val quality = 0.4 * math.min(cp / 500.0, 1.0) +
      0.4 * (alpha.toDouble / math.max(cp.toDouble, 1.0)) +
      0.2 * math.min(stopR * 5.0, 1.0)
    new GenericInternalRow(Array[Any](nTokens, subw, alphaR, digitR, sumLen / n, stopR, quality))
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HEX = "0123456789abcdef".toCharArray

  private def md5Hex(s: String): String = {
    val d = md5Digest.get()
    d.reset()
    val bytes = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** The minimum (lexicographic) md5 hex digest over the word `n`-shingles —
    * a winnowing-style fingerprint whose selector (md5) exists identically
    * in DuckDB, so the oracle can reproduce the VALUE (xxhash64's argmin
    * cannot be replicated there). Same single-tokenize discipline as
    * [[minShingleHash]]. */
  def minShingleMd5(text: UTF8String, n: Int): UTF8String = {
    val toks = tokensOf(text)
    if (toks.length < n) return UTF8String.fromString(md5Hex(toks.mkString(" ")))
    var min: String = null
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val h = md5Hex(sb.toString)
      if (min == null || h.compareTo(min) < 0) min = h
      i += 1
    }
    UTF8String.fromString(min)
  }

  // ---- shingle-set hashing (the dedup family's common first stage) ----

  /** Distinct xxhash64 values of the word `n`-shingles, first-occurrence
    * order — the single-pass form of
    * `array_distinct(transform(wordShingles(text, n), xxhash64))`. */
  def wordShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val toks = tokensOf(text)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (toks.length < n) seen.add(hash(toks.mkString(" ")))
    else {
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(hash(sb.toString))
        i += 1
      }
    }
    toArray(seen)
  }

  /** Distinct xxhash64 values of the character `n`-shingles of the
    * whitespace-normalized text — single-pass form of
    * `array_distinct(transform(charShingles(text, n), xxhash64))`.
    * Windows are code-point based (`UTF8String.substringSQL`), matching
    * Spark's `substring`. */
  def charShingleHashes(text: UTF8String, n: Int): ArrayData = {
    val lowered = text.toLowerCase.toString
    var st = 0
    var en = lowered.length
    while (st < en && lowered.charAt(st) == ' ') st += 1
    while (en > st && lowered.charAt(en - 1) == ' ') en -= 1
    val norm = UTF8String.fromString(
      WS.matcher(lowered.substring(st, en)).replaceAll(" "))
    val len = norm.numChars()
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (len < n) seen.add(XxHash64Function.hash(norm, StringType, 42L))
    else {
      var i = 1
      while (i <= len - n + 1) {
        seen.add(XxHash64Function.hash(norm.substringSQL(i, n), StringType, 42L))
        i += 1
      }
    }
    toArray(seen)
  }

  private def toArray(seen: java.util.LinkedHashSet[java.lang.Long]): ArrayData = {
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  /** Intersection size of two ASCENDING-SORTED distinct long arrays: one
    * merge pass, zero allocation — the verify-stage replacement for
    * `size(array_intersect(a, b))`, which builds a hash set AND materializes
    * the intersection array just to take its length. Caller contract: both
    * inputs sorted ascending and duplicate-free (e.g. `sort_array` over the
    * shingle-hash sets). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val la = a.numElements()
    val lb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < la && j < lb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Word `n`-gram shingles as STRINGS, occurrences included — the
    * single-tokenize form of `TextOps.wordShingles` (whose `slice` lambda
    * re-runs the split per element: O(L²) interpreted). Used where the
    * shingle TEXT matters (decontamination joins against an eval set the
    * oracle must reproduce), unlike [[wordShingleHashes]] which hashes and
    * dedups. */
  def wordShingleStrings(text: UTF8String, n: Int): ArrayData = {
    val toks = tokensOf(text)
    if (toks.length < n)
      return new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass repetition signals (Gopher-style quality filters):
    * `[n_tokens, dup_token_ratio, top_token_ratio, dup_trigram_ratio]`,
    * unrounded; a whitespace-only document is all zeros (the
    * `len(trim(text)) = 0` convention of the token-count oracle). One
    * tokenize, one hash-map pass for token counts, one sliding window for
    * the `n`-gram distinct set. */
  def repetitionSignals(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    var st = 0
    var en = s.length
    while (st < en && s.charAt(st) == ' ') st += 1
    while (en > st && s.charAt(en - 1) == ' ') en -= 1
    if (en == st) return new GenericArrayData(Array(0.0, 0.0, 0.0, 0.0))
    val toks = tokensOf(text)
    val counts = new java.util.HashMap[String, Int]()
    var maxCount = 0
    var i = 0
    while (i < toks.length) {
      val c = counts.merge(toks(i), 1, Integer.sum)
      if (c > maxCount) maxCount = c
      i += 1
    }
    val nTok = toks.length
    val dupTok = 1.0 - counts.size.toDouble / nTok
    val topTok = maxCount.toDouble / nTok
    var dupTri = 0.0
    if (toks.length >= n) {
      val seen = new java.util.HashSet[String]()
      val total = toks.length - n + 1
      val sb = new java.lang.StringBuilder(64)
      i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      dupTri = 1.0 - seen.size.toDouble / total
    }
    new GenericArrayData(Array(nTok.toDouble, dupTok, topTok, dupTri))
  }

  /** All `numHashes` MinHash lanes in ONE pass over the shingle hashes.
    * Lane k of shingle s is `xxhash64(s, k)` exactly as the HOF form
    * computed it: XxHash64 folds its children, so the lane value is
    * `hashInt(k, hashLong(s, 42))`. */
  def minhashSignature(sh: ArrayData, numHashes: Int): ArrayData = {
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val inner = XXH64.hashLong(sh.getLong(i), 42L)
      var k = 0
      while (k < numHashes) {
        val v = XXH64.hashInt(k, inner)
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash: per-bit majority vote of seed-42 xxhash64 token hashes
    * — single-pass form of the `aggregate`/`zip_with` fold in
    * `Dedup.simhashHof`. */
  def simhash64(text: UTF8String): Long = {
    val toks = tokensOf(text)
    val counters = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = hash(toks(i))
      var b = 0
      while (b < 64) {
        if ((h & (1L << b)) != 0L) counters(b) += 1 else counters(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Codegen'd `TextKernels.minShingleHash` (fingerprint hot path). */
case class MinShingleHashExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_min_shingle_hash"
  override def nullSafeEval(t: Any): Any =
    TextKernels.minShingleHash(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.minShingleHash($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd `TextKernels.minShingleMd5` (oracle-reproducible fingerprint). */
case class MinShingleMd5Expr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_min_shingle_md5"
  override def nullSafeEval(t: Any): Any =
    TextKernels.minShingleMd5(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.minShingleMd5($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd `TextKernels.langId`. */
case class LangIdExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_lang_id"
  override def nullSafeEval(t: Any): Any =
    TextKernels.langId(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.langId($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}


/** Codegen'd `TextKernels.nfcNormalize` (Unicode NFC composition). */
case class NfcNormalizeExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc_normalize"
  override def nullSafeEval(t: Any): Any =
    TextKernels.nfcNormalize(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.nfcNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd single-pass `TextKernels.textStats` struct. */
case class TextStatsExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_subwords", LongType, nullable = false),
    StructField("alpha_ratio", DoubleType, nullable = false),
    StructField("digit_ratio", DoubleType, nullable = false),
    StructField("mean_tok_len", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))
  override def prettyName: String = "graft_text_stats"
  override def nullSafeEval(t: Any): Any =
    TextKernels.textStats(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.textStats($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd greedy longest-match BPE-style token count over a fixed vocab.
  * The table is attached via `addReferenceObj`, so generated code calls a
  * pre-built per-executor object — the vocab is never re-parsed per row. */
  // ---- BPE-style subword counting: greedy longest-match against a vocab ----

/** Greedy longest-match subword tokenizer table (WordPiece-style count,
  * no continuation markers): at each position consume the LONGEST vocab
  * piece that prefixes the remainder, else one (unknown) character; each
  * consumption is one token. Deterministic, order-free.
  *
  * Ships inside the Expression as a codegen reference object, so it rides
  * Spark's task-binary BROADCAST — one copy per executor, never per row
  * or per task, even for a real ~50k-piece vocab. */
final class BpeTable(vocab: Seq[String]) extends Serializable {
  private val byLen: Array[java.util.HashSet[String]] = {
    val maxLen = if (vocab.isEmpty) 0 else vocab.map(_.length).max
    val arr = Array.fill[java.util.HashSet[String]](maxLen + 1)(null)
    vocab.foreach { p =>
      if (p.nonEmpty) {
        if (arr(p.length) == null) arr(p.length) = new java.util.HashSet[String]()
        arr(p.length).add(p)
      }
    }
    arr
  }

  private def countWord(w: String): Long = {
    var p = 0
    var n = 0L
    while (p < w.length) {
      var l = math.min(byLen.length - 1, w.length - p)
      var consumed = 1
      var found = false
      while (l >= 1 && !found) {
        if (byLen(l) != null && byLen(l).contains(w.substring(p, p + l))) {
          consumed = l; found = true
        }
        l -= 1
      }
      n += 1
      p += consumed
    }
    n
  }

  /** Total subword tokens of a doc under `tokensOf` whitespace splitting. */
  def count(text: UTF8String): Long = {
    val toks = TextKernels.tokensOf(text)
    var total = 0L
    var i = 0
    while (i < toks.length) { total += countWord(toks(i)); i += 1 }
    total
  }
}

case class BpeCountExpr(child: Expression, vocab: Seq[String])
    extends UnaryExpression with ImplicitCastInputTypes {
  @transient private lazy val tableEval = new BpeTable(vocab)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_count"
  override def nullSafeEval(t: Any): Any =
    tableEval.count(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", new BpeTable(vocab),
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd `TextKernels.wordShingleHashes` (MinHash first stage). */
case class WordShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_word_shingle_hashes"
  override def nullSafeEval(t: Any): Any =
    TextKernels.wordShingleHashes(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.wordShingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd `TextKernels.charShingleHashes` (n-gram Jaccard first stage). */
case class CharShingleHashesExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_shingle_hashes"
  override def nullSafeEval(t: Any): Any =
    TextKernels.charShingleHashes(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.charShingleHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd `TextKernels.wordShingleStrings` (decontamination first stage). */
case class WordShingleStringsExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_word_shingles"
  override def nullSafeEval(t: Any): Any =
    TextKernels.wordShingleStrings(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.wordShingleStrings($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd one-pass repetition signals (ARRAY<DOUBLE> of 4). */
case class RepetitionSignalsExpr(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.DoubleType,
    containsNull = false)
  override def prettyName: String = "graft_repetition_signals"
  override def nullSafeEval(t: Any): Any =
    TextKernels.repetitionSignals(t.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.repetitionSignals($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd one-pass MinHash signature over BIGINT shingle hashes. */
case class MinHashSigExpr(child: Expression, numHashes: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"
  override def nullSafeEval(t: Any): Any =
    TextKernels.minhashSignature(t.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.minhashSignature($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd merge-count over two sorted distinct long arrays — see
  * `TextKernels.sortedIntersectCount` for the caller contract. */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.TextKernels.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Codegen'd one-pass 64-bit SimHash. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override def nullSafeEval(t: Any): Any =
    TextKernels.simhash64(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextExpressions {
  def minShingleHash(text: Column, n: Int = 5): Column =
    GraftShim.column(MinShingleHashExpr(GraftShim.expression(text), n))
  def minShingleMd5(text: Column, n: Int = 5): Column =
    GraftShim.column(MinShingleMd5Expr(GraftShim.expression(text), n))
  def langId(text: Column): Column =
    GraftShim.column(LangIdExpr(GraftShim.expression(text)))
  def nfcNormalize(text: Column): Column =
    GraftShim.column(NfcNormalizeExpr(GraftShim.expression(text)))
  def bpeCount(text: Column, vocab: Seq[String]): Column =
    GraftShim.column(BpeCountExpr(GraftShim.expression(text), vocab))
  def textStats(text: Column): Column =
    GraftShim.column(TextStatsExpr(GraftShim.expression(text)))
  def wordShingleHashes(text: Column, n: Int): Column =
    GraftShim.column(WordShingleHashesExpr(GraftShim.expression(text), n))
  def wordShingleStrings(text: Column, n: Int): Column =
    GraftShim.column(WordShingleStringsExpr(GraftShim.expression(text), n))
  def repetitionSignals(text: Column, n: Int = 3): Column =
    GraftShim.column(RepetitionSignalsExpr(GraftShim.expression(text), n))
  def charShingleHashes(text: Column, n: Int): Column =
    GraftShim.column(CharShingleHashesExpr(GraftShim.expression(text), n))
  def minhashSignature(shingleHashes: Column, numHashes: Int): Column =
    GraftShim.column(MinHashSigExpr(GraftShim.expression(shingleHashes), numHashes))
  def simhash64(text: Column): Column =
    GraftShim.column(SimHash64Expr(GraftShim.expression(text)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftShim.column(SortedIntersectCountExpr(
      GraftShim.expression(a), GraftShim.expression(b)))
}
