package graft.expr

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity and information-theoretic kernels behind native
  * codegen Expressions — the entity-resolution / quality-scoring scalar
  * layer (reference has no counterpart; its only string op is the line
  * split in `DataProcessing.java`). Semantics are pinned to DuckDB's
  * implementations so the oracle replays them verbatim:
  *
  *  - [[StringSimKernels.jaroWinkler]] — the standard Winkler variant
  *    (match window ⌊max/2⌋−1, half-transpositions, prefix bonus capped
  *    at 4 chars with p = 0.1 applied only when Jaro > 0.7, empty input
  *    → 0.0) — verified equal to DuckDB `jaro_winkler_similarity` on
  *    textbook pairs (martha/marhta 0.9611…, dixon/dicksonx 0.8133…)
  *    and on the boost-threshold edge (abcdefgh/abzzzzzz stays at the
  *    0.5 Jaro: no bonus at ≤ 0.7).
  *  - [[StringSimKernels.charEntropy]] — Shannon entropy (log₂) of the
  *    code-point frequency distribution, the one-pass equivalent of
  *    DuckDB `entropy(unnest(string_split(text, '')))`. A low-entropy
  *    document is boilerplate/padding; an extreme-high one is noise —
  *    the classic cheap quality gate a curation funnel runs before any
  *    model-based scoring.
  *
  * Both run inside whole-stage codegen via static-call `doGenCode`
  * (same pattern as [[TextKernels]]): one pass per row, zero per-row
  * allocation beyond the count table.
  */
object StringSimKernels {

  /** Jaro similarity of two code-point arrays (helper for jaroWinkler). */
  private def jaro(s1: Array[Int], s2: Array[Int]): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var matches = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1(i) == s2(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    // transpositions: walk the matched subsequences in order
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1(i) != s2(k)) t += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / l1 + m / l2 + (m - t / 2) / m) / 3.0
  }

  private def codePoints(s: UTF8String): Array[Int] = {
    val str = s.toString
    val out = new Array[Int](str.codePointCount(0, str.length))
    var ci = 0
    var oi = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      out(oi) = cp
      oi += 1
      ci += Character.charCount(cp)
    }
    out
  }

  /** Jaro-Winkler similarity in [0, 1]: Jaro plus a prefix bonus
    * `ℓ·0.1·(1−jaro)` (ℓ = common prefix length capped at 4) applied only
    * when the Jaro score exceeds the standard 0.7 boost threshold. */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    val s1 = codePoints(a)
    val s2 = codePoints(b)
    val j = jaro(s1, s2)
    if (j <= 0.7) return j
    var l = 0
    val cap = math.min(4, math.min(s1.length, s2.length))
    while (l < cap && s1(l) == s2(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }

  private val LOG2 = math.log(2.0)

  /** Shannon entropy (bits) of the code-point distribution of `s`;
    * 0.0 for the empty string. Computed as log₂n − (Σ c·log₂c)/n so the
    * inner loop is one log per DISTINCT character, not per character. */
  def charEntropy(s: UTF8String): Double = {
    val cps = codePoints(s)
    val n = cps.length
    if (n == 0) return 0.0
    val counts = new java.util.HashMap[Integer, Array[Int]](64)
    var i = 0
    while (i < n) {
      val c = counts.get(cps(i))
      if (c == null) counts.put(cps(i), Array(1)) else c(0) += 1
      i += 1
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()(0).toDouble
      acc += c * math.log(c)
    }
    (math.log(n.toDouble) - acc / n) / LOG2
  }
}

/** Codegen'd `StringSimKernels.jaroWinkler`. */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"
  override def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernels.jaroWinkler(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.StringSimKernels.jaroWinkler($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd `StringSimKernels.charEntropy`. */
case class CharEntropyExpr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_char_entropy"
  override def nullSafeEval(t: Any): Any =
    StringSimKernels.charEntropy(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.StringSimKernels.charEntropy($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringSimExpressions {
  def jaroWinkler(a: Column, b: Column): Column =
    GraftShim.column(JaroWinklerExpr(GraftShim.expression(a), GraftShim.expression(b)))
  def charEntropy(text: Column): Column =
    GraftShim.column(CharEntropyExpr(GraftShim.expression(text)))
}
