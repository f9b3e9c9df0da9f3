package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expr._

/** `SparkSessionExtensions` injector: registers the engine's native codegen
  * expressions as named SQL functions, so the whole surface is reachable
  * from pure `spark.sql(...)` — a user can `SELECT
  * graft_euclidean(a.vec, b.vec)` with no Scala imports. Enable with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`; functions resolve through the
  * normal FunctionRegistry, so they fold, prune and codegen exactly like
  * built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def binary(ext: SparkSessionExtensions, name: String, usage: String,
      build: (Expression, Expression) => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects 2 arguments, got ${args.length}")
        build(args(0), args(1))
      }: Expression))

  private def unary(ext: SparkSessionExtensions, name: String, usage: String,
      build: Expression => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name), info(name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
        build(args(0))
      }: Expression))

  override def apply(ext: SparkSessionExtensions): Unit = {
    binary(ext, "graft_euclidean", "euclidean distance of two double arrays",
      EuclideanDistExpr(_, _))
    binary(ext, "graft_manhattan", "manhattan distance of two double arrays",
      ManhattanDistExpr(_, _))
    binary(ext, "graft_chebyshev", "chebyshev distance of two double arrays",
      ChebyshevDistExpr(_, _))
    binary(ext, "graft_dot", "dot product of two double arrays",
      DotProductExpr(_, _))
    binary(ext, "graft_cosine_sim", "cosine similarity of two double arrays",
      CosineSimExpr(_, _))
    unary(ext, "graft_simhash64", "64-bit simhash of whitespace tokens",
      SimHash64Expr(_))
    unary(ext, "graft_langid", "marker-vote language id ('und' if no hits)",
      LangIdExpr(_))
    unary(ext, "graft_min_shingle_hash", "winnowing min xxhash64 of 5-word shingles",
      MinShingleHashExpr(_, 5))
    binary(ext, "graft_pearson", "pearson distance (1 - correlation) of two double arrays",
      PearsonDistExpr(_, _))
    unary(ext, "graft_text_stats",
      "struct(n_tokens, n_subwords, alpha_ratio, digit_ratio, mean_tok_len, stopword_ratio, quality)",
      TextStatsExpr(_))
    binary(ext, "graft_jaro_winkler",
      "Jaro-Winkler similarity in [0,1] (DuckDB-compatible: 0.7 boost threshold)",
      JaroWinklerExpr(_, _))
    unary(ext, "graft_char_entropy",
      "Shannon entropy (bits) of the code-point distribution",
      CharEntropyExpr(_))
  }
}
