package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import HdbscanKernel._

class HdbscanKernelSpec extends AnyFunSuite {

  // two tight blobs + one far outlier
  private def blobs: Array[Array[Double]] = {
    val a = Array.tabulate(10)(i => Array(0.0 + i * 0.01, 0.0 + (i % 3) * 0.01))
    val b = Array.tabulate(10)(i => Array(10.0 + i * 0.01, 10.0 + (i % 3) * 0.01))
    val outlier = Array(Array(50.0, 50.0))
    a ++ b ++ outlier
  }

  test("coreDistances: k-th nearest other point, hand-checked") {
    val pts = Array(Array(0.0), Array(1.0), Array(3.0), Array(6.0))
    // k=2 → distance to 1st nearest other point
    val c2 = coreDistances(pts, 2, euclidean)
    assert(c2.toSeq == Seq(1.0, 1.0, 2.0, 3.0))
    // k=3 → 2nd nearest
    val c3 = coreDistances(pts, 3, euclidean)
    assert(c3.toSeq == Seq(3.0, 2.0, 3.0, 5.0))
    // k=1 → all zero
    assert(coreDistances(pts, 1, euclidean).forall(_ == 0.0))
  }

  test("primMst: n-1 edges, spanning, minimal total weight vs Kruskal") {
    val pts = blobs
    val core = coreDistances(pts, 3, euclidean)
    val mst = primMst(pts, core, euclidean)
    assert(mst.length == pts.length - 1)
    // spanning
    val uf = new UnionFind(pts.length)
    mst.foreach(e => uf.union(e.src, e.dst))
    assert((1 until pts.length).forall(i => uf.connected(0, i)))
    // weight-minimal: compare against brute-force Kruskal over all pairs
    val allPairs = for {
      i <- pts.indices; j <- pts.indices if i < j
    } yield Edge(i, j, math.max(euclidean(pts(i), pts(j)), math.max(core(i), core(j))))
    val uf2 = new UnionFind(pts.length)
    val kruskalW = allPairs.sortBy(_.weight)
      .filter(e => uf2.find(e.src) != uf2.find(e.dst) && { uf2.union(e.src, e.dst); true })
      .map(_.weight).sum
    assert(math.abs(mst.map(_.weight).sum - kruskalW) < 1e-9)
  }

  test("fitLocal: two blobs cluster separately, outlier is noise with high score") {
    val res = fitLocal(blobs, minPts = 3, minClusterSize = 3)
    val labels = res.map(_._1)
    val blobA = labels.slice(0, 10).toSet
    val blobB = labels.slice(10, 20).toSet
    assert(blobA.size == 1 && !blobA.contains(0), s"blob A labels: $blobA")
    assert(blobB.size == 1 && !blobB.contains(0), s"blob B labels: $blobB")
    assert(blobA != blobB, "blobs must get distinct labels")
    assert(labels(20) == 0, "far outlier must be noise")
    val scores = res.map(_._2)
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(20) > 0.9, s"outlier score was ${scores(20)}")
    // dense interior points score low
    assert(scores.slice(0, 10).min < 0.2)
  }

  test("fitLocal: uniform line — noise by default, one cluster when allowed") {
    // equal spacing everywhere → tied-edge shatter at one level → the root
    // never splits into ≥2 clusters. Reference semantics (default): the root
    // is NOT selectable (Cluster.propagate() no-ops at parent==null,
    // HDBSCANStar.java:505-540), so everything is noise. With
    // allowSingleCluster the root wins and the line is one cluster.
    val pts = Array.tabulate(30)(i => Array(i * 0.01, 0.0))
    val strict = fitLocal(pts, minPts = 3, minClusterSize = 3)
    assert(strict.map(_._1).toSet == Set(0), s"labels: ${strict.map(_._1).toSet}")
    val single = fitLocal(pts, minPts = 3, minClusterSize = 3, allowSingleCluster = true)
    assert(single.map(_._1).toSet == Set(1), s"labels: ${single.map(_._1).toSet}")
  }

  test("fitLocal: sawtooth of 6 runs splits into exactly 6 clusters of 5") {
    // (i*0.01, (i%5)*0.01) = six diagonal runs of 5 points (intra-run spacing
    // 0.0141) separated by 0.0412 gaps — geometry dictates 6 clusters
    val pts = Array.tabulate(30)(i => Array(i * 0.01, (i % 5) * 0.01))
    val res = fitLocal(pts, minPts = 3, minClusterSize = 3)
    val groups = res.map(_._1).zipWithIndex.groupBy(_._1)
    assert(!groups.contains(0), "no noise expected")
    assert(groups.size == 6, s"got ${groups.size} clusters")
    assert(groups.values.forall(_.length == 5))
    // each run i*5..i*5+4 is one cluster
    (0 until 6).foreach { r =>
      val ls = (0 until 5).map(j => res(r * 5 + j)._1).toSet
      assert(ls.size == 1, s"run $r labels $ls")
    }
  }

  test("hierarchy: invariant to vertex permutation (same partition sizes)") {
    val pts = blobs
    val perm = scala.util.Random.shuffle(pts.indices.toList).toArray
    val permuted = perm.map(pts)
    val r1 = fitLocal(pts, 3, 3)
    val r2 = fitLocal(permuted, 3, 3)
    def sizes(r: Array[(Int, Double, Double)]) =
      r.map(_._1).filter(_ != 0).groupBy(identity).values.map(_.length).toList.sorted
    assert(sizes(r1) == sizes(r2))
    assert(r1.count(_._1 == 0) == r2.count(_._1 == 0))
  }

  test("hierarchy: degenerate inputs") {
    assert(fitLocal(Array.empty, 4, 4).isEmpty)
    assert(fitLocal(Array(Array(1.0, 2.0)), 4, 4).toSeq == Seq((0, 0.0, 0.0)))
    // duplicate points: all-zero distances must not crash
    val dup = Array.fill(6)(Array(1.0, 1.0))
    val res = fitLocal(dup, 2, 2)
    assert(res.length == 6)
  }

  test("mass-weighted hierarchy (bubble mode): pair mass clears minClusterSize") {
    // 4 vertices in two pairs; vertex mass 3 (< mcs 5), pair mass 6 (>= 5)
    // → the two pairs are the flat clusters
    val edges = Array(Edge(0, 1, 1.0), Edge(2, 3, 1.0), Edge(1, 2, 100.0))
    val core = Array(0.5, 0.5, 0.5, 0.5)
    val h = hierarchy(4, edges, core, minClusterSize = 5.0, mass = Array(3.0, 3.0, 3.0, 3.0))
    val l = h.labels
    assert(l(0) == l(1) && l(2) == l(3) && l(0) != l(2))
    assert(l.forall(_ != 0))
  }

  test("heavy single bubble >= minClusterSize is itself a valid cluster") {
    val edges = Array(Edge(0, 1, 1.0), Edge(2, 3, 1.0), Edge(1, 2, 100.0))
    val core = Array(0.5, 0.5, 0.5, 0.5)
    val h = hierarchy(4, edges, core, minClusterSize = 5.0, mass = Array(10.0, 10.0, 10.0, 10.0))
    // each vertex carries mass 10 >= 5: excess-of-mass picks the four
    // singleton bubbles (leaf stability 10*(1/0.5-1/1) = 10 each > pair's)
    assert(h.labels.toSet.size == 4)
    assert(h.labels.forall(_ != 0))
  }

  test("constraint-driven extraction: must-link flips selection to the merged parent") {
    // blobs A and B adjacent (their merge parent is a real condensed
    // cluster), blob C far away so the parent of A+B is not the root
    val a = Array.tabulate(8)(i => Array(0.0 + i * 0.1))
    val b = Array.tabulate(8)(i => Array(3.0 + i * 0.1))
    val c = Array.tabulate(8)(i => Array(100.0 + i * 0.1))
    val pts = a ++ b ++ c
    def labelsWith(cons: Array[(Int, Int, Boolean)]): Array[Int] =
      fitLocal(pts, 3, 3, euclidean, allowSingleCluster = false, cons).map(_._1)

    val plain = labelsWith(Array.empty)
    // unconstrained: A and B are separate clusters
    assert(plain(0) != 0 && plain(8) != 0 && plain(0) != plain(8),
      s"expected A/B split, got ${plain.toSeq}")

    // one must-link across A and B: only their common parent satisfies it,
    // so the parent (A∪B merged) wins the propagation
    val ml = labelsWith(Array((0, 8, true)))
    assert(ml(0) != 0 && ml(0) == ml(8), s"expected A/B merged, got ${ml.toSeq}")
    assert(ml(16) != 0 && ml(16) != ml(0), "C stays its own cluster")

    // a cannot-link across A and B is satisfied by the split children, so
    // selection stays as the unconstrained one
    val cl = labelsWith(Array((0, 8, false)))
    assert(cl(0) != 0 && cl(8) != 0 && cl(0) != cl(8),
      s"cannot-link must keep A/B apart, got ${cl.toSeq}")
  }

  test("reattachNoise: planted boundary bubble flips to its nearest cluster") {
    // vertices 0,1 labeled 1; 2,3 labeled 2; 4 is noise nearest to vertex 3
    val labels = Array(1, 1, 2, 2, 0)
    val d = Array(
      Array(0.0, 1.0, 9.0, 9.0, 8.0),
      Array(1.0, 0.0, 9.0, 9.0, 7.0),
      Array(9.0, 9.0, 0.0, 1.0, 3.0),
      Array(9.0, 9.0, 1.0, 0.0, 2.0),
      Array(8.0, 7.0, 3.0, 2.0, 0.0))
    val out = reattachNoise(labels, d)
    assert(out.toSeq == Seq(1, 1, 2, 2, 2))
    // all-noise input stays noise (nothing to attach to)
    assert(reattachNoise(Array(0, 0), Array(Array(0.0, 1.0), Array(1.0, 0.0))).toSeq == Seq(0, 0))
    // no chaining: a noise vertex nearest to ANOTHER noise vertex still
    // attaches to the nearest ORIGINALLY labeled one
    val labels2 = Array(1, 0, 0)
    val d2 = Array(Array(0.0, 5.0, 9.0), Array(5.0, 0.0, 1.0), Array(9.0, 1.0, 0.0))
    assert(reattachNoise(labels2, d2).toSeq == Seq(1, 1, 1))
  }
}
