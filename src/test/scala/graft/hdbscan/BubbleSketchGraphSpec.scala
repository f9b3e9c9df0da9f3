package graft.hdbscan

import graft.SparkTestBase
import graft.kernel.HdbscanKernel

/** Cross-route equality for the matrix-free bubble-graph kernels: every
  * [[BubbleSketchGraph]] result must equal the driver-matrix kernel it
  * replaces (`bubbleDistanceMatrix` + `bubbleCoreDistances` +
  * `primMstMatrix` + `reattachNoise`), including tie order. */
class BubbleSketchGraphSpec extends SparkTestBase {

  private val dist = HdbscanKernel.euclidean

  /** Random sketch with gap ≥ 0 for every pair (reps ≥ ~10 apart on a
    * jittered grid, extents ≤ 0.5) so E7 lands in the continuous
    * gap + nn_i + nn_j branch and MRD weights are generically tie-free. */
  private def separatedSketch(m: Int, seedv: Int): BubbleSketchGraph.Sketch = {
    val rng = new scala.util.Random(seedv)
    val side = math.ceil(math.cbrt(m.toDouble)).toInt
    val reps = Array.tabulate(m) { i =>
      Array((i % side) * 10.0 + rng.nextDouble(),
        ((i / side) % side) * 10.0 + rng.nextDouble(),
        (i / (side * side)) * 10.0 + rng.nextDouble())
    }
    BubbleSketchGraph.Sketch(reps,
      extents = Array.fill(m)(rng.nextDouble() * 0.5),
      nnDists = Array.fill(m)(rng.nextDouble() * 0.3 + 0.01),
      mass = Array.fill(m)(1.0 + rng.nextInt(3)))
  }

  /** Overlapping sketch (tight reps, big extents): exercises the
    * gap < 0 → max(nn_i, nn_j) branch and its distance TIES. */
  private def overlappingSketch(m: Int, seedv: Int): BubbleSketchGraph.Sketch = {
    val rng = new scala.util.Random(seedv)
    val reps = Array.tabulate(m)(_ => Array.fill(3)(rng.nextDouble() * 2.0))
    BubbleSketchGraph.Sketch(reps,
      extents = Array.fill(m)(1.0 + rng.nextDouble()),
      nnDists = Array.fill(m)(rng.nextDouble() * 0.5),
      mass = Array.fill(m)(1.0 + rng.nextInt(3)))
  }

  test("coreDistances: matrix-free equals the E11 matrix walk (incl. tie order)") {
    for ((sk, tag) <- Seq((separatedSketch(83, 1), "separated"),
        (overlappingSketch(83, 2), "overlapping"))) {
      val minPts = 6.0
      val bd = HdbscanKernel.bubbleDistanceMatrix(sk.reps, sk.extents, sk.nnDists, dist)
      val exp = HdbscanKernel.bubbleCoreDistances(bd, sk.mass, sk.nnDists, minPts)
      val got = BubbleSketchGraph.coreDistances(spark, sk, minPts, dist)
      assert(got.length == exp.length)
      exp.indices.foreach(i => assert(got(i) == exp(i),
        s"[$tag] core($i): matrix ${exp(i)} vs matrix-free ${got(i)}"))
    }
  }

  test("coreDistances: self-sufficient bubbles (mass >= minPts) short-circuit to nnDist") {
    val sk0 = separatedSketch(30, 3)
    val sk = sk0.copy(mass = sk0.mass.zipWithIndex.map {
      case (m0, i) => if (i % 3 == 0) 10.0 else m0 })
    val bd = HdbscanKernel.bubbleDistanceMatrix(sk.reps, sk.extents, sk.nnDists, dist)
    val exp = HdbscanKernel.bubbleCoreDistances(bd, sk.mass, sk.nnDists, 6.0)
    val got = BubbleSketchGraph.coreDistances(spark, sk, 6.0, dist)
    exp.indices.foreach(i => assert(got(i) == exp(i)))
    (0 until 30 by 3).foreach(i => assert(got(i) == sk.nnDists(i)))
  }

  test("mst: matrix-free Borůvka equals Prim over the MRD matrix on tie-free weights") {
    val sk = separatedSketch(64, 4)
    // minPts = 1: every bubble is self-sufficient, so core = nnDist < any
    // pair distance and MRD = the continuous E7 branch — generically
    // tie-free. (Core-DOMINATED mrd has inherent ties — max(core_i, ·)
    // repeats across i's pairs — where Prim and Borůvka legitimately pick
    // different equal-weight trees; partition-level equality under ties is
    // covered by the bubble-route e2e test in HdbscanSpec.)
    val minPts = 1.0
    val bd = HdbscanKernel.bubbleDistanceMatrix(sk.reps, sk.extents, sk.nnDists, dist)
    val core = HdbscanKernel.bubbleCoreDistances(bd, sk.mass, sk.nnDists, minPts)
    val mrd = Array.tabulate(sk.m, sk.m)((i, j) =>
      if (i == j) 0.0 else math.max(bd(i)(j), math.max(core(i), core(j))))
    // tie-free precondition: with ties Prim and Borůvka may legitimately
    // pick different (equal-weight) trees — that case is covered by the
    // partition-level equality test in HdbscanSpec
    val offDiag = for (i <- 0 until sk.m; j <- i + 1 until sk.m) yield mrd(i)(j)
    assert(offDiag.distinct.size == offDiag.size, "test data produced tied MRD weights")
    def canon(es: Array[HdbscanKernel.Edge]): Seq[(Int, Int, Double)] =
      es.map(e => (math.min(e.src, e.dst), math.max(e.src, e.dst), e.weight))
        .sortBy(t => (t._1, t._2)).toSeq
    val exp = canon(HdbscanKernel.primMstMatrix(mrd))
    val got = canon(BubbleSketchGraph.mst(spark, sk, core, dist))
    assert(got == exp)
  }

  test("mst: tied MRD weights — same weight multiset as Prim, spanning, acyclic") {
    // overlapping bubbles tie constantly (gap < 0 → max(nn_i, nn_j)
    // repeats across pairs; core caps repeat across a bubble's pairs).
    // Under ties Borůvka and Prim may pick different trees, but every MST
    // of a graph has the SAME sorted weight multiset — and single-linkage
    // structure (what the hierarchy consumes) is weight-multiset-determined
    // per level. Property-checked across seeds.
    for (seedv <- 20 to 24) {
      val sk = overlappingSketch(50, seedv)
      val minPts = 6.0
      val bd = HdbscanKernel.bubbleDistanceMatrix(sk.reps, sk.extents, sk.nnDists, dist)
      val core = HdbscanKernel.bubbleCoreDistances(bd, sk.mass, sk.nnDists, minPts)
      val mrd = Array.tabulate(sk.m, sk.m)((i, j) =>
        if (i == j) 0.0 else math.max(bd(i)(j), math.max(core(i), core(j))))
      val prim = HdbscanKernel.primMstMatrix(mrd)
      val got = BubbleSketchGraph.mst(spark, sk, core, dist)
      assert(got.length == sk.m - 1, s"[seed $seedv] not spanning: ${got.length} edges")
      val uf = new graft.kernel.UnionFind(sk.m)
      got.foreach { e =>
        assert(uf.find(e.src) != uf.find(e.dst), s"[seed $seedv] cycle at $e")
        uf.union(e.src, e.dst)
      }
      assert(got.map(_.weight).sorted.toSeq == prim.map(_.weight).sorted.toSeq,
        s"[seed $seedv] MST weight multiset differs from Prim")
      // complete graph ⇒ components at least halve per round
      val (_, rounds) = BubbleSketchGraph.mstCounted(spark, sk, core, dist)
      val logBound = math.ceil(math.log(sk.m.toDouble) / math.log(2.0)).toInt
      assert(rounds <= logBound, s"[seed $seedv] $rounds Borůvka rounds > log₂ bound $logBound")
      // each Borůvka edge must carry its true MRD weight
      got.foreach(e => assert(e.weight == mrd(e.src)(e.dst),
        s"[seed $seedv] edge $e weight != mrd"))
    }
  }

  test("mst: degenerate sizes (m = 1, m = 2)") {
    val sk1 = separatedSketch(1, 5)
    assert(BubbleSketchGraph.mst(spark, sk1, Array(0.1), dist).isEmpty)
    val sk2 = separatedSketch(2, 6)
    val es = BubbleSketchGraph.mst(spark, sk2, Array(0.1, 0.2), dist)
    assert(es.length == 1 && math.min(es(0).src, es(0).dst) == 0
      && math.max(es(0).src, es(0).dst) == 1)
  }

  test("reattachNoise: matrix-free equals the G8 matrix argmin (ties -> lowest index)") {
    for ((sk, tag) <- Seq((separatedSketch(60, 7), "separated"),
        (overlappingSketch(60, 8), "overlapping"))) {
      val rng = new scala.util.Random(9)
      val labels = Array.fill(sk.m)(if (rng.nextDouble() < 0.3) 0 else 1 + rng.nextInt(3))
      val bd = HdbscanKernel.bubbleDistanceMatrix(sk.reps, sk.extents, sk.nnDists, dist)
      val exp = HdbscanKernel.reattachNoise(labels, bd)
      val got = BubbleSketchGraph.reattachNoise(spark, labels, sk, dist)
      assert(got.toSeq == exp.toSeq, s"[$tag] reattachment differs")
    }
  }

  test("reattachNoise: all-noise and no-noise inputs pass through") {
    val sk = separatedSketch(10, 10)
    val allNoise = Array.fill(sk.m)(0)
    assert(BubbleSketchGraph.reattachNoise(spark, allNoise, sk, dist).toSeq
      == allNoise.toSeq)
    val noNoise = Array.tabulate(sk.m)(i => 1 + i % 2)
    assert(BubbleSketchGraph.reattachNoise(spark, noNoise, sk, dist).toSeq
      == noNoise.toSeq)
  }
}
