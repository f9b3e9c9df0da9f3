package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance functions over `ARRAY<DOUBLE>` columns — the engine's
  * scalar-expression surface for density clustering and similarity search.
  *
  * Reference semantics (re-expressed, not ported):
  *   - euclidean  `distance/EuclideanDistance.java:28-36`
  *   - manhattan  `distance/ManhattanDistance.java:28-37`
  *   - supremum   `distance/SupremumDistance.java:28-39`
  *   - cosine     `distance/CosineSimilarity.java:28-40`
  *   - pearson    `distance/PearsonCorrelation.java:28-51`
  *   - mutual reachability `hdbscanstar/HDBSCANStar.java:162-168`
  *   - bubble distance     `databubbles/HdbscanDataBubbles.java:592-600`
  *
  * All are built from Spark's codegen'd higher-order functions
  * (`zip_with`/`aggregate`/`transform`) — no UDFs, so the expressions stay
  * inside whole-stage codegen and push through Catalyst untouched. Each is
  * O(d) per row and shuffles nothing by itself.
  */
object Distances {

  /** Elementwise fold: sum of f(x, y) over zipped vectors. */
  private def zipSum(a: Column, b: Column)(f: (Column, Column) => Column): Column =
    aggregate(zip_with(a, b, f), lit(0.0), (acc, v) => acc + v)

  // Hot kernels delegate to native codegen Expressions
  // (graft.expr.VectorExpressions) — the composed higher-order-function
  // forms below (kept as *Hof for cross-checking) are interpreted and
  // measured ~5-20x slower in the argmin-join / kNN hot paths.

  /** sqrt(sum((x-y)^2)) */
  def euclidean(a: Column, b: Column): Column = graft.expr.VectorExpressions.euclidean(a, b)

  /** sum(|x-y|) */
  def manhattan(a: Column, b: Column): Column = graft.expr.VectorExpressions.manhattan(a, b)

  /** max(|x-y|) — Chebyshev / L-infinity. */
  def supremum(a: Column, b: Column): Column = graft.expr.VectorExpressions.chebyshev(a, b)

  /** Dot product of two vectors. */
  def dot(a: Column, b: Column): Column = graft.expr.VectorExpressions.dot(a, b)

  /** cos similarity in [-1, 1]. */
  def cosineSimilarity(a: Column, b: Column): Column = graft.expr.VectorExpressions.cosineSim(a, b)

  /** Interpreted HOF reference forms (oracle cross-checks + SQL parity). */
  def euclideanHof(a: Column, b: Column): Column =
    sqrt(zipSum(a, b)((x, y) => (x - y) * (x - y)))
  def manhattanHof(a: Column, b: Column): Column = zipSum(a, b)((x, y) => abs(x - y))
  def supremumHof(a: Column, b: Column): Column = array_max(zip_with(a, b, (x, y) => abs(x - y)))
  def dotHof(a: Column, b: Column): Column = zipSum(a, b)(_ * _)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(aggregate(a, lit(0.0), (s, x) => s + x * x))

  /** 1 - x.y/(|x||y|) */
  def cosineDistance(a: Column, b: Column): Column = lit(1.0) - cosineSimilarity(a, b)

  /** 1 - cov(x,y)/(sd(x) sd(y)) — reference's pearson "distance". */
  def pearsonDistance(a: Column, b: Column): Column =
    graft.expr.VectorExpressions.pearsonDist(a, b)

  /** Interpreted-HOF reference form of [[pearsonDistance]] (parity-tested;
    * not for hot paths — CollapseProject re-inlines `meanA`/`meanB` into the
    * element lambdas, so each mean is recomputed PER ELEMENT: O(d²) per row,
    * interpreted, and the CodegenFallback knocks every sibling column out of
    * whole-stage codegen — measured 0.3 s → 6.0 s on q_distance_pairs). */
  def pearsonDistanceHof(a: Column, b: Column): Column = {
    val n = size(a).cast("double")
    val meanA = aggregate(a, lit(0.0), _ + _) / n
    val meanB = aggregate(b, lit(0.0), _ + _) / n
    val cov = zipSum(a, b)((x, y) => (x - meanA) * (y - meanB))
    val sdA = sqrt(aggregate(a, lit(0.0), (s, x) => s + (x - meanA) * (x - meanA)))
    val sdB = sqrt(aggregate(b, lit(0.0), (s, x) => s + (x - meanB) * (x - meanB)))
    lit(1.0) - cov / (sdA * sdB)
  }

  /** max(d(a,b), core(a), core(b)) — HDBSCAN* mutual reachability. */
  def mutualReachability(dist: Column, coreA: Column, coreB: Column): Column =
    greatest(dist, coreA, coreB)

  /** Data-bubble distance: repDist - (extentA+extentB) >= 0
    *   ? repDist - (extentA+extentB) + (nnA+nnB)
    *   : max(nnA, nnB)
    */
  def bubbleDistance(repDist: Column, extentA: Column, extentB: Column,
                     nnA: Column, nnB: Column): Column = {
    // gap + (nnA + nnB): symmetric under operand swap (IEEE addition is
    // commutative but not associative) — mirrored in the DuckDB oracle
    val gap = repDist - (extentA + extentB)
    when(gap >= 0, gap + (nnA + nnB)).otherwise(greatest(nnA, nnB))
  }

  /** Dispatch by name — mirrors the reference's distance vtable
    * (`main/Main.java:417-528` checkInputParameters). */
  def byName(name: String): (Column, Column) => Column = name match {
    case "euclidean" => euclidean
    case "manhattan" => manhattan
    case "supremum" | "chebyshev" => supremum
    case "cosine"    => cosineDistance
    case "pearson"   => pearsonDistance
    case other => throw new IllegalArgumentException(s"unknown distance: $other")
  }
}
