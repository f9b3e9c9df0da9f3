package graft.hdbscan

import graft.SparkTestBase

/** Independent cross-validation of the pinned clustering oracles (ADVICE r4
  * medium): the q_cluster_tree / q_hierarchy_levels / q_outliers_topk /
  * q_mst_distributed pins were captured from the engine's own output, which
  * detects regressions but not present-day errors. This spec recomputes every
  * pinned quantity on the reference's 150-point dataset from FIRST PRINCIPLES
  * (Campello et al. 2013/2015 definitions) with a deliberately different
  * algorithm shape than the engine kernel:
  *
  *   - naive O(n^2) distance matrix + insertion-free full-sort core distances
  *     (engine: bounded insertion buffer, `HdbscanKernel.coreDistances`)
  *   - per-set Kruskal over the full mutual-reachability matrix
  *     (engine: Prim over the implicit graph + one global merge-tree pass)
  *   - condensed tree by RECURSIVE THRESHOLD COMPONENTS: each cluster finds
  *     its split level by re-running Kruskal on its induced subgraph and
  *     taking components under `w < split` (engine: bottom-up union-find
  *     merge tree + top-down condensation with tied-edge flattening)
  *
  * If the engine queries match this implementation AND the pins match the
  * engine (the oracle gate), the pins are independently derived, not merely
  * self-captured.
  */
class RefPinsCrossValidationSpec extends SparkTestBase {

  private val MinPts = 4
  private val MinClusterSize = 4

  // ---- independent data load: plain file read, whitespace split ----
  private lazy val pts: Array[Array[Double]] = {
    val src = scala.io.Source.fromFile(graft.SparkEntry.refDatasetPath())
    try src.getLines().map(_.trim).filter(_.nonEmpty)
      .map(_.split("\\s+").map(_.toDouble)).toArray
    finally src.close()
  }
  private lazy val n = pts.length

  private def euclid(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  // core distance: (minPts-1)-th nearest OTHER point, by full sort
  private lazy val core: Array[Double] = Array.tabulate(n) { i =>
    val ds = (0 until n).filter(_ != i).map(j => euclid(pts(i), pts(j))).sorted
    ds(MinPts - 2)
  }

  private lazy val mr: Array[Array[Double]] = Array.tabulate(n, n) { (i, j) =>
    if (i == j) 0.0
    else math.max(euclid(pts(i), pts(j)), math.max(core(i), core(j)))
  }

  // ---- tiny standalone union-find (not the engine's) ----
  private final class Uf(m: Int) {
    private val p = Array.tabulate(m)(identity)
    def find(x: Int): Int = { var r = x; while (p(r) != r) { p(r) = p(p(r)); r = p(r) }; r }
    def union(a: Int, b: Int): Boolean = {
      val ra = find(a); val rb = find(b)
      if (ra == rb) false else { p(ra) = rb; true }
    }
  }

  /** Minimal eps at which `set` is one component under mreach <= eps:
    * Kruskal on the induced subgraph; the weight of the edge that performs
    * the final union. */
  private def splitLevel(set: Array[Int]): Double = {
    val edges = (for (ai <- set.indices.iterator; bi <- (ai + 1) until set.length)
      yield (mr(set(ai))(set(bi)), ai, bi)).toArray.sortBy(_._1)
    val uf = new Uf(set.length)
    var remaining = set.length - 1
    var i = 0
    while (remaining > 0) {
      val (w, a, b) = edges(i)
      if (uf.union(a, b)) { remaining -= 1; if (remaining == 0) return w }
      i += 1
    }
    0.0 // |set| == 1
  }

  /** Components of the induced subgraph under mreach < eps (strict). */
  private def strictComponents(set: Array[Int], eps: Double): List[Array[Int]] = {
    val uf = new Uf(set.length)
    for (ai <- set.indices; bi <- (ai + 1) until set.length)
      if (mr(set(ai))(set(bi)) < eps) uf.union(ai, bi)
    set.indices.groupBy(uf.find).values.map(_.map(set).toArray).toList
  }

  private final case class Node(id: Int, parent: Int, birth: Double, size: Int) {
    var death: Double = birth
    var stability: Double = 0.0
    var kids: List[Int] = Nil
  }

  private lazy val (nodes, fallout, deepCluster): (Vector[Node], Array[Double], Array[Int]) = {
    val ns = scala.collection.mutable.ArrayBuffer[Node]()
    val fo = new Array[Double](n)
    val dc = new Array[Int](n)
    def lam(eps: Double): Double = if (eps > 0) 1.0 / eps else Double.PositiveInfinity

    def build(set0: Array[Int], birth: Double, parent: Int): Int = {
      val id = ns.length
      ns += Node(id, parent, birth, set0.length)
      val node = ns(id)
      var cur = set0
      var continue = true
      while (continue) {
        val split = splitLevel(cur)
        val comps = strictComponents(cur, split)
        val (big, small) = comps.partition(_.length >= MinClusterSize)
        for (c <- small; p <- c) {
          fo(p) = split; dc(p) = id
          node.stability += lam(split) - lam(node.birth)
        }
        big match {
          case Nil =>
            node.death = split; continue = false
          case one :: Nil =>
            cur = one // same cluster continues below the shedding level
          case many =>
            many.foreach { k =>
              val c = build(k, split, id)
              node.kids ::= c
              node.stability += k.length * (lam(split) - lam(node.birth))
            }
            node.death = split; continue = false
        }
      }
      id
    }
    build(Array.range(0, n), splitLevel(Array.range(0, n)), -1)
    (ns.toVector, fo, dc)
  }

  // excess-of-mass flat extraction; the root is never selectable
  private lazy val selectedClusters: Set[Int] = {
    def propagate(id: Int): (Double, List[Int]) = {
      val node = nodes(id)
      if (node.kids.isEmpty) (node.stability, List(id))
      else {
        val sub = node.kids.map(propagate)
        val childSum = sub.map(_._1).sum
        if (id != 0 && node.stability > childSum) (node.stability, List(id))
        else (childSum, sub.flatMap(_._2))
      }
    }
    propagate(0)._2.filter(_ != 0).toSet
  }

  private lazy val glosh: Array[Double] = {
    val epsMin = Array.fill(nodes.length)(Double.PositiveInfinity)
    for (c <- nodes) epsMin(c.id) = c.death
    for (p <- 0 until n) epsMin(deepCluster(p)) = math.min(epsMin(deepCluster(p)), fallout(p))
    // subtree min, children have larger ids than parents by construction
    for (c <- nodes.reverseIterator if c.parent >= 0)
      epsMin(c.parent) = math.min(epsMin(c.parent), epsMin(c.id))
    Array.tabulate(n)(p => if (fallout(p) <= 0) 0.0 else 1.0 - epsMin(deepCluster(p)) / fallout(p))
  }

  private def approx(a: Double, b: Double, tol: Double = 1.5e-6): Boolean = math.abs(a - b) <= tol

  /** Debug view of the independent tree (id, parent, birth, death, size, stability). */
  def debugNodes: Seq[String] = nodes.map(c =>
    f"${c.id}%d parent=${c.parent}%d birth=${c.birth}%.6f death=${c.death}%.6f " +
      f"size=${c.size}%d stab=${c.stability}%.5f flat=${selectedClusters.contains(c.id)}")

  test("dataset loads 150 points (wc -l shows 149: no trailing newline)") {
    assert(n == 150 && pts.forall(_.length == 4))
  }

  test("q_mst_distributed edges are genuine distances forming an optimal spanning tree") {
    // q_mst_distributed demonstrates distributed Boruvka on the EUCLIDEAN
    // pair graph (not mutual reachability — that path is q_cluster_tree's)
    val rows = graft.SparkEntry.queries("q_mst_distributed")(spark, sf())
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(2)))
    assert(rows.length == n - 1)
    // every engine edge's weight is the true pair distance
    rows.foreach { case (s, d, w) =>
      assert(approx(w, euclid(pts(s), pts(d))), s"edge ($s,$d) weight $w != ${euclid(pts(s), pts(d))}") }
    // the engine edge set spans all 150 points
    val uf = new Uf(n)
    var united = 0
    rows.foreach { case (s, d, _) => if (uf.union(s, d)) united += 1 }
    assert(united == n - 1, "engine MST does not span the dataset")
    // total weight is MST-optimal (ties make the edge SET non-unique, the
    // weight multiset and total are invariant)
    val mine = {
      val edges = (for (a <- (0 until n).iterator; b <- (a + 1) until n)
        yield (euclid(pts(a), pts(b)), a, b)).toArray.sortBy(_._1)
      val u2 = new Uf(n)
      edges.iterator.filter { case (_, a, b) => u2.union(a, b) }.take(n - 1).map(_._1).toArray
    }
    assert(approx(rows.map(_._3).sum, mine.sum, 1e-4),
      s"total MST weight ${rows.map(_._3).sum} != independent ${mine.sum}")
    val a = rows.map(_._3).sorted; val b = mine.sorted
    a.indices.foreach(i => assert(approx(a(i), b(i)), s"weight multiset differs at $i: ${a(i)} vs ${b(i)}"))
  }

  test("q_cluster_tree matches the independent condensed tree (birth/death/size/stability/flat)") {
    val engine = graft.SparkEntry.queries("q_cluster_tree")(spark, sf())
      .collect().map(r => (r.getDouble(2), r.getDouble(3), r.getDouble(5), r.getDouble(4), r.getInt(6) != 0))
    // columns: label, parent, birth_eps, death_eps, stability, size, flat_label
    // quantize sort keys to the query's 6dp rounding: mathematically-equal
    // split levels can differ at the ulp level between the two
    // implementations (summation order), which would interleave the sorted
    // groups differently even though every value agrees to 6dp
    def q6(x: Double): Double = math.rint(x * 1e6) / 1e6
    val mine = nodes.map(c => (q6(c.birth), q6(c.death), c.size.toDouble, c.stability,
      selectedClusters.contains(c.id)))
    assert(engine.length == mine.length, s"cluster count ${engine.length} != ${mine.length}")
    val se = engine.sortBy(t => (t._1, t._2, t._3, q6(t._4)))
    val sm = mine.sortBy(t => (t._1, t._2, t._3, q6(t._4))).toArray
    se.indices.foreach { i =>
      val (eb, ed, es, est, ef) = se(i); val (mb, md, ms, mst, mf) = sm(i)
      assert(approx(eb, mb) && approx(ed, md) && es == ms, s"row $i shape: $eb/$ed/$es vs $mb/$md/$ms")
      assert(approx(est, mst, 1e-4), s"row $i stability $est != $mst")
      assert(ef == mf, s"row $i flat selection $ef != $mf")
    }
  }

  test("q_hierarchy_levels partitions equal strict threshold components at every level") {
    val engine = graft.SparkEntry.queries("q_hierarchy_levels")(spark, sf())
      .collect().map(r => (r.getDouble(0), r.getString(1)))
    assert(engine.length > 50, s"unexpected level count ${engine.length}")
    // the query rounds level_eps to 6dp; thresholding at the ROUNDED value
    // can land on the wrong side of an exact event, so resolve each row to
    // the nearest TRUE mutual-reachability value(s) and accept the row if
    // any of them reproduces the partition (two true events can round to
    // the same 6dp string — the pinned data has duplicate level values)
    val trueVals = (for (a <- (0 until n).iterator; b <- (a + 1) until n)
      yield mr(a)(b)).toArray.distinct.sorted
    engine.foreach { case (eps, csv) =>
      val labels = csv.split(",").map(_.toInt)
      assert(labels.length == n)
      val engineClusters = labels.zipWithIndex.filter(_._1 != 0)
        .groupBy(_._1).values.map(_.map(_._2).toSet).toSet
      val engineNoise = labels.zipWithIndex.filter(_._1 == 0).map(_._2).toSet
      val candidates = trueVals.filter(v => math.abs(v - eps) <= 1e-6)
      assert(candidates.nonEmpty, s"no true MR value near level $eps")
      val ok = candidates.exists { v =>
        val comps = strictComponents(Array.range(0, n), v)
        comps.filter(_.length >= MinClusterSize).map(_.toSet).toSet == engineClusters &&
          comps.filter(_.length < MinClusterSize).flatten.toSet == engineNoise
      }
      assert(ok, s"no true level near eps=$eps reproduces the engine partition")
    }
  }

  test("q_outliers_topk GLOSH scores and core distances match the independent computation") {
    val engine = graft.SparkEntry.queries("q_outliers_topk")(spark, sf())
      .collect().map(r => (r.getLong(0).toInt, r.getDouble(1), r.getDouble(2)))
    assert(engine.length == 50)
    engine.foreach { case (id, score, cd) =>
      assert(approx(cd, core(id)), s"core_dist($id): $cd != ${core(id)}")
      assert(approx(score, glosh(id)), s"glosh($id): $score != ${glosh(id)}")
    }
    // the engine's top-50 is the true top-50 (modulo the tie-break ordering)
    val cut = engine.map(_._2).min
    val better = glosh.count(s => s > cut + 1.5e-6)
    assert(better <= 50, s"$better points score strictly above the engine's cutoff $cut")
  }
}
