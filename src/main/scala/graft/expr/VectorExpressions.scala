package graft.expr

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions (with `doGenCode`) for the hot vector
  * kernels. The `functions`-composed forms in [[graft.functions.Distances]]
  * are semantically identical but interpreted (higher-order functions don't
  * participate in whole-stage codegen); these generate a tight primitive
  * loop instead — BENCH showed the HOF forms dominating the argmin-join and
  * kNN paths. Float inputs are implicitly cast to ARRAY<DOUBLE>.
  *
  * Null elements inside the vectors are not supported (engine-wide
  * invariant: `features ARRAY<DOUBLE> NOT NULL`, SURVEY §1.3).
  */
abstract class VectorFoldExpression extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType

  /** Java statements: given array vars `a`, `b` and length `n`, assign the
    * result to `result` (a declared double). Every local the loop declares
    * MUST derive from the fresh `i`/`tmp` names: outside whole-stage codegen
    * (e.g. when a CodegenFallback expression shares the projection) the
    * generated method's input-row parameter is literally named `i`, and a
    * bare `int i` loop variable is a compile-breaking redefinition. */
  protected def javaLoop(a: String, b: String, n: String, result: String,
      i: String, tmp: String): String
  protected def scalaFold(x: ArrayData, y: ArrayData, n: Int): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    scalaFold(x, y, math.min(x.numElements(), y.numElements()))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val res = ctx.freshName("res")
      val i = ctx.freshName("idx")
      val tmp = ctx.freshName("t")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $res = 0.0;
         |${javaLoop(a, b, n, res, i, tmp)}
         |${ev.value} = $res;
       """.stripMargin
    })
}

/** sqrt(sum((x-y)^2)) — E1. */
case class EuclideanDistExpr(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "graft_euclidean"
  protected def javaLoop(a: String, b: String, n: String, res: String,
      i: String, tmp: String): String =
    s"""for (int $i = 0; $i < $n; $i++) {
       |  double $tmp = $a.getDouble($i) - $b.getDouble($i); $res += $tmp * $tmp;
       |}
       |$res = java.lang.Math.sqrt($res);""".stripMargin
  protected def scalaFold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { val d = x.getDouble(i) - y.getDouble(i); s += d * d; i += 1 }
    math.sqrt(s)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** sum(|x-y|) — E2. */
case class ManhattanDistExpr(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "graft_manhattan"
  protected def javaLoop(a: String, b: String, n: String, res: String,
      i: String, tmp: String): String =
    s"for (int $i = 0; $i < $n; $i++) { $res += java.lang.Math.abs($a.getDouble($i) - $b.getDouble($i)); }"
  protected def scalaFold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += math.abs(x.getDouble(i) - y.getDouble(i)); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** max(|x-y|) — E3 (supremum / Chebyshev). */
case class ChebyshevDistExpr(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "graft_chebyshev"
  protected def javaLoop(a: String, b: String, n: String, res: String,
      i: String, tmp: String): String =
    s"""for (int $i = 0; $i < $n; $i++) {
       |  double $tmp = java.lang.Math.abs($a.getDouble($i) - $b.getDouble($i));
       |  if ($tmp > $res) $res = $tmp;
       |}""".stripMargin
  protected def scalaFold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var m = 0.0; var i = 0
    while (i < n) { val d = math.abs(x.getDouble(i) - y.getDouble(i)); if (d > m) m = d; i += 1 }
    m
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** x . y — dot product. */
case class DotProductExpr(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "graft_dot"
  protected def javaLoop(a: String, b: String, n: String, res: String,
      i: String, tmp: String): String =
    s"for (int $i = 0; $i < $n; $i++) { $res += $a.getDouble($i) * $b.getDouble($i); }"
  protected def scalaFold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var s = 0.0; var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** x.y/(|x||y|) — cosine similarity in one pass. */
case class CosineSimExpr(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "graft_cosine_sim"
  protected def javaLoop(a: String, b: String, n: String, res: String,
      i: String, tmp: String): String =
    s"""double ${tmp}_dot = 0.0, ${tmp}_na = 0.0, ${tmp}_nb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double ${tmp}_xa = $a.getDouble($i), ${tmp}_xb = $b.getDouble($i);
       |  ${tmp}_dot += ${tmp}_xa * ${tmp}_xb; ${tmp}_na += ${tmp}_xa * ${tmp}_xa; ${tmp}_nb += ${tmp}_xb * ${tmp}_xb;
       |}
       |$res = ${tmp}_dot / (java.lang.Math.sqrt(${tmp}_na) * java.lang.Math.sqrt(${tmp}_nb));""".stripMargin
  protected def scalaFold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val xa = x.getDouble(i); val xb = y.getDouble(i)
      dot += xa * xb; na += xa * xa; nb += xb * xb; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

/** 1 - cov(x,y)/(sd(x)·sd(y)) — the reference's pearson "distance" (E5),
  * two-pass (means, then centered sums) with the same left-to-right
  * summation order as the interpreted `Distances.pearsonDistanceHof` and
  * the DuckDB oracle, so 6dp-rounded values agree bit-for-bit. */
case class PearsonDistExpr(left: Expression, right: Expression) extends VectorFoldExpression {
  override def prettyName: String = "graft_pearson_dist"
  protected def javaLoop(a: String, b: String, n: String, res: String,
      i: String, tmp: String): String =
    s"""double ${tmp}_sa = 0.0, ${tmp}_sb = 0.0;
       |for (int $i = 0; $i < $n; $i++) { ${tmp}_sa += $a.getDouble($i); ${tmp}_sb += $b.getDouble($i); }
       |double ${tmp}_ma = ${tmp}_sa / $n, ${tmp}_mb = ${tmp}_sb / $n;
       |double ${tmp}_cov = 0.0, ${tmp}_va = 0.0, ${tmp}_vb = 0.0;
       |for (int $i = 0; $i < $n; $i++) {
       |  double ${tmp}_xa = $a.getDouble($i) - ${tmp}_ma, ${tmp}_xb = $b.getDouble($i) - ${tmp}_mb;
       |  ${tmp}_cov += ${tmp}_xa * ${tmp}_xb; ${tmp}_va += ${tmp}_xa * ${tmp}_xa; ${tmp}_vb += ${tmp}_xb * ${tmp}_xb;
       |}
       |$res = 1.0 - ${tmp}_cov / (java.lang.Math.sqrt(${tmp}_va) * java.lang.Math.sqrt(${tmp}_vb));""".stripMargin
  protected def scalaFold(x: ArrayData, y: ArrayData, n: Int): Double = {
    var sa = 0.0; var sb = 0.0; var i = 0
    while (i < n) { sa += x.getDouble(i); sb += y.getDouble(i); i += 1 }
    val ma = sa / n; val mb = sb / n
    var cov = 0.0; var va = 0.0; var vb = 0.0
    i = 0
    while (i < n) {
      val xa = x.getDouble(i) - ma; val xb = y.getDouble(i) - mb
      cov += xa * xb; va += xa * xa; vb += xb * xb; i += 1
    }
    1.0 - cov / (math.sqrt(va) * math.sqrt(vb))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}

object VectorExpressions {
  private def bin(f: (Expression, Expression) => Expression)(a: Column, b: Column): Column =
    GraftShim.column(f(GraftShim.expression(a), GraftShim.expression(b)))

  val euclidean: (Column, Column) => Column = bin(EuclideanDistExpr)
  val manhattan: (Column, Column) => Column = bin(ManhattanDistExpr)
  val chebyshev: (Column, Column) => Column = bin(ChebyshevDistExpr)
  val dot: (Column, Column) => Column = bin(DotProductExpr)
  val cosineSim: (Column, Column) => Column = bin(CosineSimExpr)
  val pearsonDist: (Column, Column) => Column = bin(PearsonDistExpr)
}
