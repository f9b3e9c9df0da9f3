package graft.hdbscan

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.kernel.HdbscanKernel
import graft.kernel.HdbscanKernel.{Dist, Edge}

/** Matrix-free distributed form of the bubble-sketch graph kernels (E7
  * bubble distance, E11 bubble core distance, the bubble MRD MST, and G8
  * noise reattachment) — the scale path `bubbleGlobal` routes through when
  * `sampleCap` is raised past [[Hdbscan.bubbleMatrixCap]].
  *
  * The driver-matrix route (`HdbscanKernel.bubbleDistanceMatrix` + Prim)
  * is O(m²) DRIVER MEMORY in the bubble count m — fine at the default
  * sampleCap ≈ 2000 (32 MB), fatal when a 100 TB run raises the sketch
  * granularity to m ≈ 10⁵–10⁶. Here driver state stays O(m): the collected
  * CF sketch arrays (which the caller already holds) are broadcast once —
  * the same O(m·dim) bound as the split loop's seed broadcasts — and every
  * m×m quantity is computed as a scan-side fold:
  *
  *   - [[coreDistances]]: one distributed pass; each bubble scans the
  *     broadcast sketch keeping the ⌈minPts⌉ nearest candidates in a
  *     bounded heap (every bubble holds ≥ 1 point of mass, so the mass
  *     walk can never need more than ⌈minPts⌉ bubbles), then replays the
  *     E11 cumulative-mass walk over that bounded prefix. Per-task memory
  *     O(⌈minPts⌉); identical tie order to the matrix walk (distance, then
  *     ascending bubble index — the matrix version's stable sort).
  *   - [[mst]]: distributed Borůvka over the IMPLICIT complete MRD graph.
  *     Per round, each bubble scans the broadcast sketch for its minimum
  *     cross-component edge under the total order (weight, lo, hi); a
  *     narrow groupBy reduces per component; the driver union-finds the
  *     O(#components) picks. The graph is complete, so components at
  *     least halve per round ⇒ ≤ log₂ m rounds of O(m²/parallelism)
  *     scan work. Total compute is O(m² log m) distance evaluations —
  *     a log factor over the one-shot matrix build — traded for never
  *     materializing m² anywhere and distributing every scan; at the
  *     default gate (m ≤ 4096) the matrix route remains the fast path.
  *   - [[reattachNoise]]: one distributed argmin pass over noise bubbles
  *     (nearest LABELED bubble by E7; ties to the lowest index — the
  *     matrix version's strict-< scan order).
  *
  * MST caveat (documented, deliberate): Borůvka under the (weight, lo, hi)
  * total order returns THE unique MST of the tie-broken weights — the same
  * tree Kruskal picks under that order — while the matrix route's Prim
  * breaks genuine weight ties by traversal order. On tie-free weights the
  * two routes are byte-identical (spec-pinned); on tied weights both are
  * valid HDBSCAN* MSTs of equal weight. */
private[hdbscan] object BubbleSketchGraph {

  /** Broadcast-friendly bundle of the collected bubble sketch columns. */
  final case class Sketch(reps: Array[Array[Double]], extents: Array[Double],
      nnDists: Array[Double], mass: Array[Double]) {
    def m: Int = reps.length
  }

  /** E11 bubble core distances, matrix-free. Exact-equal to
    * `HdbscanKernel.bubbleCoreDistances(bubbleDistanceMatrix(...), ...)`
    * whenever every bubble's mass ≥ 1 (always true: cells are nonempty by
    * construction), including tie order and the total-mass-< minPts
    * degenerate (then m ≤ ⌈minPts⌉ and the scan is complete). */
  def coreDistances(spark: SparkSession, sk: Sketch, minPts: Double,
      dist: Dist): Array[Double] = {
    import spark.implicits._
    val m = sk.m
    val kCap = math.max(1, math.ceil(minPts).toInt)
    val b = spark.sparkContext.broadcast(sk)
    val localDist = dist
    val rows = Hdbscan.tagged(spark, Hdbscan.BoundedCollectTag) {
      spark.range(m.toLong).mapPartitions { it =>
        val s = b.value
        it.map { iL =>
          val i = iL.toInt
          if (s.mass(i) >= minPts) (i, s.nnDists(i))
          else {
            // bounded max-heap of the kCap nearest (bd, j) candidates;
            // self (bd = 0) always survives, mirroring the matrix walk
            val heapD = new Array[Double](kCap)
            val heapJ = new Array[Int](kCap)
            var size = 0
            def less(d1: Double, j1: Int, d2: Double, j2: Int): Boolean =
              d1 < d2 || (d1 == d2 && j1 < j2)
            def siftUp(c0: Int): Unit = {
              var c = c0
              while (c > 0 && less(heapD((c - 1) / 2), heapJ((c - 1) / 2),
                  heapD(c), heapJ(c))) {
                val p = (c - 1) / 2
                val td = heapD(p); val tj = heapJ(p)
                heapD(p) = heapD(c); heapJ(p) = heapJ(c)
                heapD(c) = td; heapJ(c) = tj
                c = p
              }
            }
            def siftDown(): Unit = {
              var p = 0
              var done = false
              while (!done) {
                val l = 2 * p + 1; val r = l + 1
                var big = p
                if (l < size && less(heapD(big), heapJ(big), heapD(l), heapJ(l))) big = l
                if (r < size && less(heapD(big), heapJ(big), heapD(r), heapJ(r))) big = r
                if (big == p) done = true
                else {
                  val td = heapD(p); val tj = heapJ(p)
                  heapD(p) = heapD(big); heapJ(p) = heapJ(big)
                  heapD(big) = td; heapJ(big) = tj
                  p = big
                }
              }
            }
            var j = 0
            while (j < s.m) {
              val d = if (j == i) 0.0
                else HdbscanKernel.bubbleDistance(s.reps(i), s.extents(i),
                  s.nnDists(i), s.reps(j), s.extents(j), s.nnDists(j), localDist)
              if (size < kCap) {
                heapD(size) = d; heapJ(size) = j; size += 1; siftUp(size - 1)
              } else if (less(d, j, heapD(0), heapJ(0))) {
                heapD(0) = d; heapJ(0) = j; siftDown()
              }
              j += 1
            }
            // replay the E11 walk over the bounded prefix in (bd, j) order
            val order = (0 until size).sortBy(k => (heapD(k), heapJ(k)))
            var cum = 0.0; var cd = 0.0; var k = 0
            while (k < size && cum < minPts) {
              cum += s.mass(heapJ(order(k))); cd = heapD(order(k)); k += 1
            }
            (i, cd)
          }
        }
      }.collect() // O(#bubbles)
    }
    b.unpersist(blocking = false)
    val out = new Array[Double](m)
    rows.foreach { case (i, cd) => out(i) = cd }
    out
  }

  /** Bubble MRD MST, matrix-free distributed Borůvka. Edge weights are
    * max(bubbleDistance(i,j), core(i), core(j)); ties broken by the total
    * order (weight, lo, hi). Driver state O(m) (union-find + forest). */
  def mst(spark: SparkSession, sk: Sketch, core: Array[Double],
      dist: Dist): Array[Edge] = mstCounted(spark, sk, core, dist)._1

  /** As [[mst]], also returning the Borůvka round count — the graph is
    * complete, so components at least halve per round and the spec pins
    * rounds ≤ ⌈log₂ m⌉. */
  def mstCounted(spark: SparkSession, sk: Sketch, core: Array[Double],
      dist: Dist): (Array[Edge], Int) = {
    import spark.implicits._
    val m = sk.m
    if (m <= 1) return (Array.empty, 0)
    val bSk = spark.sparkContext.broadcast((sk, core))
    val localDist = dist
    val uf = new graft.kernel.UnionFind(m)
    val edges = scala.collection.mutable.ArrayBuffer.empty[Edge]
    var rounds = 0
    while (edges.length < m - 1 && rounds < 64) {
      val compArr = Array.tabulate(m)(uf.find)
      val bComp = spark.sparkContext.broadcast(compArr)
      val picks = Hdbscan.tagged(spark, Hdbscan.BoundedCollectTag) {
        spark.range(m.toLong).mapPartitions { it =>
          val (s, c) = bSk.value
          val comp = bComp.value
          it.flatMap { iL =>
            val i = iL.toInt
            val ci = comp(i)
            var bestW = Double.MaxValue
            var bestLo = -1; var bestHi = -1
            var j = 0
            while (j < s.m) {
              if (comp(j) != ci) {
                val bd = HdbscanKernel.bubbleDistance(s.reps(i), s.extents(i),
                  s.nnDists(i), s.reps(j), s.extents(j), s.nnDists(j), localDist)
                val w = math.max(bd, math.max(c(i), c(j)))
                val lo = math.min(i, j); val hi = math.max(i, j)
                if (w < bestW || (w == bestW &&
                    (lo < bestLo || (lo == bestLo && hi < bestHi)))) {
                  bestW = w; bestLo = lo; bestHi = hi
                }
              }
              j += 1
            }
            if (bestLo >= 0) Iterator.single((ci, bestW, bestLo, bestHi))
            else Iterator.empty
          }
        }.toDF("comp", "w", "lo", "hi")
          .groupBy(col("comp"))
          .agg(min(struct(col("w"), col("lo"), col("hi"))).as("e"))
          .select(col("e.w"), col("e.lo"), col("e.hi"))
          .as[(Double, Int, Int)]
          .collect() // O(#components) ≤ O(#bubbles)
      }
      bComp.unpersist(blocking = false)
      if (picks.isEmpty) {
        // The graph is complete, so with finite weights every component has
        // an outgoing pick — an empty round means non-finite bubble
        // distances (NaN/Inf reps in a caller-supplied sketch defeat the
        // strict `w < bestW` comparison). No caller bridges a short forest
        // (sketchHierarchy feeds HdbscanKernel.hierarchy, whose n-1
        // require would fail with an unrelated message), so fail fast
        // here with the actual cause (ADVICE r11). fitSketch also rejects
        // non-finite sketches up front.
        bSk.unpersist(blocking = false)
        throw new IllegalStateException(
          s"BubbleSketchGraph.mst: no cross-component pick with " +
            s"${edges.length}/${m - 1} edges after $rounds rounds — " +
            "non-finite bubble distances in the sketch (NaN/Inf rep, " +
            "extent, or nnDist)?")
      } else {
        picks.foreach { case (w, lo, hi) =>
          if (uf.find(lo) != uf.find(hi)) { uf.union(lo, hi); edges += Edge(lo, hi, w) }
        }
        rounds += 1
      }
    }
    bSk.unpersist(blocking = false)
    (edges.toArray, rounds)
  }

  /** G8 noise reattachment, matrix-free: every noise bubble (label 0)
    * takes the label of its nearest LABELED bubble by E7 bubble distance
    * (strict argmin — lowest index on ties, the matrix scan's order).
    * Assignments read the original labels only (no chaining). */
  def reattachNoise(spark: SparkSession, labels: Array[Int], sk: Sketch,
      dist: Dist): Array[Int] = {
    import spark.implicits._
    val out = labels.clone()
    if (!labels.exists(_ != 0) || !labels.contains(0)) return out
    val b = spark.sparkContext.broadcast((sk, labels))
    val localDist = dist
    val noiseIdx = labels.indices.filter(labels(_) == 0).toArray
    val bNoise = spark.sparkContext.broadcast(noiseIdx)
    val rows = Hdbscan.tagged(spark, Hdbscan.BoundedCollectTag) {
      spark.range(noiseIdx.length.toLong).mapPartitions { it =>
        val (s, ls) = b.value
        val ns = bNoise.value
        it.map { kL =>
          val i = ns(kL.toInt)
          var bestJ = -1; var bestD = Double.MaxValue
          var j = 0
          while (j < s.m) {
            if (ls(j) != 0) { // i itself is noise, so j != i here
              val d = HdbscanKernel.bubbleDistance(s.reps(i), s.extents(i),
                s.nnDists(i), s.reps(j), s.extents(j), s.nnDists(j), localDist)
              if (d < bestD) { bestD = d; bestJ = j }
            }
            j += 1
          }
          (i, if (bestJ >= 0) ls(bestJ) else 0)
        }
      }.collect() // O(#noise bubbles)
    }
    b.unpersist(blocking = false); bNoise.unpersist(blocking = false)
    rows.foreach { case (i, l) => if (l != 0) out(i) = l }
    out
  }
}
