package graft.operators

import graft.SparkTestBase

class DistributedDendrogramSpec extends SparkTestBase {
  import org.apache.spark.sql.functions._

  /** Driver replay: Kruskal union-find over (weight, src, dst)-sorted
    * edges, reps = component min — the ground truth the distributed block
    * pipeline must reproduce event for event. */
  private def replay(edges: Seq[(Long, Long, Double)]): Seq[MergeEvent] = {
    val sorted = edges.sortBy(e => (e._3, e._1, e._2))
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    val size = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    sorted.zipWithIndex.map { case ((s, d, w), rank) =>
      val ra = find(s); val rb = find(d)
      val sa = size.getOrElse(ra, 1L); val sb = size.getOrElse(rb, 1L)
      val rep = math.min(ra, rb)
      parent(math.max(ra, rb)) = rep
      size(rep) = sa + sb
      MergeEvent(rank.toLong, w, ra, rb, sa, sb)
    }
  }

  /** Random spanning tree over n nodes with some duplicate weights. */
  private def randomTree(n: Int, seed: Long): Seq[(Long, Long, Double)] = {
    val rnd = new scala.util.Random(seed)
    (1 until n).map { i =>
      val j = rnd.nextInt(i)
      // coarse weights force ties; (src,dst) tie-break must decide
      (j.toLong, i.toLong, (rnd.nextInt(20) + 1).toDouble)
    }
  }

  private def check(edges: Seq[(Long, Long, Double)], blockSize: Int): Unit = {
    import spark.implicits._
    val got = DistributedDendrogram
      .mergeEvents(spark, edges.toDF("src", "dst", "weight"), blockSize, driverCap = 0)
      .collect().sortBy(_.rank).toSeq
    val want = replay(edges)
    assert(got.size == want.size, s"event count: ${got.size} vs ${want.size}")
    got.zip(want).foreach { case (g, e) =>
      // side order within one event is union-find-internal; compare as sets
      val gs = Set((g.rep_a, g.size_a), (g.rep_b, g.size_b))
      val es = Set((e.rep_a, e.size_a), (e.rep_b, e.size_b))
      assert(g.rank == e.rank && g.weight == e.weight && gs == es,
        s"event ${e.rank}: got $g want $e")
    }
  }

  test("merge events equal the driver Kruskal replay on random trees, any block size") {
    for (seed <- Seq(1L, 7L, 42L)) {
      val edges = randomTree(120, seed)
      check(edges, blockSize = 1000000) // single block
      check(edges, blockSize = 13)      // many blocks: cross-block state must carry
    }
  }

  test("a sorted-weight chain (worst-case dendrogram depth) crosses blocks correctly") {
    // path 0-1-2-...-n with strictly increasing weights: every merge grows
    // ONE component — maximal cross-block dependence
    val n = 90
    val chain = (0 until n).map(i => (i.toLong, (i + 1).toLong, (i + 1).toDouble))
    check(chain, blockSize = 7)
    // sizes must be the running prefix: event k merges size (k+1) with 1
    import spark.implicits._
    val evs = DistributedDendrogram
      .mergeEvents(spark, chain.toDF("src", "dst", "weight"), 7, driverCap = 0)
      .collect().sortBy(_.rank)
    evs.zipWithIndex.foreach { case (e, k) =>
      assert(Set(e.size_a, e.size_b) == Set(k + 1L, 1L) ||
        (k == 0 && e.size_a == 1L && e.size_b == 1L), s"event $k: $e")
    }
  }

  /** Driver replay of pointDeaths — TIE-AWARE, like the reference kernel:
    * simulate Kruskal keeping explicit member lists; record each vertex's
    * first ≥m event (per-rank — the death WEIGHT/level is unaffected by
    * ties); then resolve anchors over LEVEL GROUPS: a group = a maximal
    * run of equal-weight merges of one component, a true split = a group
    * entered by ≥ 2 fragments (strictly-lower-weight components) of size
    * ≥ m, and a death anchors to the nearest true-split group STRICTLY
    * above its own group, entered via its lineage's fragment rep. */
  private def replayDeaths(edges: Seq[(Long, Long, Double)], m: Long)
      : Map[Long, (Option[Long], Option[(Option[Long], Option[Long])])] = {
    val events = replay(edges)
    val comp = scala.collection.mutable.HashMap.empty[Long, scala.collection.mutable.Set[Long]]
    def members(r: Long): scala.collection.mutable.Set[Long] =
      comp.getOrElseUpdate(r, scala.collection.mutable.Set(r))
    val death = scala.collection.mutable.HashMap.empty[Long, Long] // vertex -> event rank
    val parentOf = scala.collection.mutable.HashMap.empty[Long, (Long, Long)] // event -> (parent event, entry side rep)
    // per event side: the child event it merged in (None = leaf fragment)
    val childEvent = scala.collection.mutable.HashMap.empty[(Long, Long), Option[Long]]
    val lastEventOfRep = scala.collection.mutable.HashMap.empty[Long, Long]
    events.foreach { e =>
      val a = members(e.rep_a); val b = members(e.rep_b)
      childEvent((e.rank, e.rep_a)) = lastEventOfRep.get(e.rep_a)
      childEvent((e.rank, e.rep_b)) = lastEventOfRep.get(e.rep_b)
      lastEventOfRep.get(e.rep_a).foreach(pe => parentOf(pe) = (e.rank, e.rep_a))
      lastEventOfRep.get(e.rep_b).foreach(pe => parentOf(pe) = (e.rank, e.rep_b))
      val merged = a ++ b
      val rep = math.min(e.rep_a, e.rep_b)
      comp(rep) = merged
      if (rep != e.rep_a) comp.remove(e.rep_a)
      if (rep != e.rep_b) comp.remove(e.rep_b)
      lastEventOfRep -= e.rep_a; lastEventOfRep -= e.rep_b
      lastEventOfRep(rep) = e.rank
      if (merged.size >= m)
        merged.foreach(v => if (!death.contains(v)) death(v) = e.rank)
    }
    def w(r: Long) = events(r.toInt).weight
    def levelTop(r: Long): Long = parentOf.get(r) match {
      case Some((p, _)) if w(p) == w(r) => levelTop(p)
      case _ => r
    }
    // fragments ≥ m per group top
    val geFrags = scala.collection.mutable.HashMap.empty[Long, Int]
    events.foreach { e =>
      val t = levelTop(e.rank)
      def frag(rep: Long, size: Long): Unit = {
        val isFrag = childEvent((e.rank, rep)) match {
          case None => true
          case Some(c) => w(c) < e.weight
        }
        if (isFrag && size >= m) geFrags(t) = geFrags.getOrElse(t, 0) + 1
      }
      frag(e.rep_a, e.size_a); frag(e.rep_b, e.size_b)
    }
    def trueSplitGroup(t: Long) = geFrags.getOrElse(t, 0) >= 2
    def mergedRep(r: Long) = {
      val e = events(r.toInt); math.min(e.rep_a, e.rep_b)
    }
    def anchor(deathRank: Long): (Option[Long], Option[Long]) = {
      var cur = levelTop(deathRank)
      while (true) {
        parentOf.get(cur) match {
          case None => return (None, None)
          case Some((p, _)) =>
            val t = levelTop(p)
            if (trueSplitGroup(t)) return (Some(t), Some(mergedRep(cur)))
            cur = t
        }
      }
      (None, None)
    }
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    verts.map { v =>
      death.get(v) match {
        case None => v -> (None, None)
        case Some(d) => v -> (Some(d), Some(anchor(d)))
      }
    }.toMap
  }

  test("pointDeaths: death events and condensed-cluster anchors match the replay") {
    import spark.implicits._
    for (seed <- Seq(3L, 11L); m <- Seq(2L, 5L, 20L)) {
      val edges = randomTree(150, seed)
      val events = DistributedDendrogram
        .mergeEvents(spark, edges.toDF("src", "dst", "weight"), blockSize = 17, driverCap = 0)
      val got = DistributedDendrogram.pointDeaths(events, m)
        .collect().map { r =>
          val v = r.getLong(r.fieldIndex("vertex"))
          val d = if (r.isNullAt(r.fieldIndex("death_rank"))) None
            else Some(r.getLong(r.fieldIndex("death_rank")))
          val ar = if (r.isNullAt(r.fieldIndex("anchor_rank"))) None
            else Some(r.getLong(r.fieldIndex("anchor_rank")))
          val as = if (r.isNullAt(r.fieldIndex("anchor_side"))) None
            else Some(r.getLong(r.fieldIndex("anchor_side")))
          v -> (d, ar, as)
        }.toMap
      val want = replayDeaths(edges, m)
      assert(got.keySet == want.keySet, s"seed=$seed m=$m vertex sets differ")
      want.foreach { case (v, (d, anch)) =>
        val (gd, gar, gas) = got(v)
        assert(gd == d, s"seed=$seed m=$m vertex $v death: got $gd want $d")
        anch.foreach { case (ar, as) =>
          assert(gar == ar && gas == as,
            s"seed=$seed m=$m vertex $v anchor: got ($gar,$gas) want ($ar,$as)")
        }
      }
    }
  }

  test("pointDeaths: sub-threshold components are global noise (null death)") {
    import spark.implicits._
    // a 3-node tree with m=5: the whole component never reaches 5
    val tiny = Seq((0L, 1L, 1.0), (1L, 2L, 2.0))
    val events = DistributedDendrogram.mergeEvents(spark, tiny.toDF("src", "dst", "weight"), driverCap = 0)
    val deaths = DistributedDendrogram.pointDeaths(events, 5L).collect()
    assert(deaths.length == 3)
    assert(deaths.forall(_.isNullAt(1)), "all three vertices must be noise")
  }

  /** Independent condensed-tree replay built the OPPOSITE way (recursive
    * descending edge removal with BFS connectivity, vs the operator's
    * ascending block union-find) — TIE-AWARE like the reference kernel:
    * each step removes ALL edges at the current maximum weight LEVEL at
    * once; a split happens only when that leaves ≥ 2 parts of size ≥ m
    * (possibly MORE than 2 — k-ary). Clusters keyed (level-group top
    * rank = max removed rank, part min), Campello stabilities in λ=1/w,
    * FOSC with the same ≥ rule. */
  private def replayCondensed(edges: Seq[(Long, Long, Double)], m: Long) = {
    val asc = edges.sortBy(e => (e._3, e._1, e._2)).zipWithIndex
      .map { case ((s, d, w), r) => (r.toLong, s, d, w) }
    final case class RCluster(key: (Long, Long), birthLam: Double,
        var stability: Double = 0.0, var parent: Option[(Long, Long)] = None,
        var children: Seq[(Long, Long)] = Nil)
    val clusters = scala.collection.mutable.LinkedHashMap.empty[(Long, Long), RCluster]
    val pointCluster = scala.collection.mutable.HashMap.empty[Long, (Long, Long)]
    def comps(edgeSet: Seq[(Long, Long, Long, Double)], nodes: Set[Long]): Seq[Set[Long]] = {
      val adj = scala.collection.mutable.HashMap.empty[Long, List[Long]]
      edgeSet.foreach { case (_, s, d, _) =>
        adj(s) = d :: adj.getOrElse(s, Nil); adj(d) = s :: adj.getOrElse(d, Nil)
      }
      val seen = scala.collection.mutable.HashSet.empty[Long]
      nodes.toSeq.sorted.flatMap { v =>
        if (seen(v)) None else {
          val q = scala.collection.mutable.Queue(v)
          val c = scala.collection.mutable.Set.empty[Long]
          while (q.nonEmpty) {
            val x = q.dequeue()
            if (!seen(x)) { seen += x; c += x; adj.getOrElse(x, Nil).foreach(q.enqueue) }
          }
          Some(c.toSet)
        }
      }
    }
    def run(key: (Long, Long), members: Set[Long],
        inEdges: Seq[(Long, Long, Long, Double)], birthLam: Double): Unit = {
      val cl = RCluster(key, birthLam)
      clusters(key) = cl
      var cur = members
      var curEdges = inEdges.sortBy(-_._1) // descending rank
      var open = true
      while (open) {
        if (curEdges.isEmpty) { // singletons can't happen while cur ≥ m ≥ 2 unless cur size 1
          cur.foreach(pointCluster(_) = key); open = false
        } else {
          // remove the whole max-weight LEVEL at once (tie-aware)
          val wMax = curEdges.head._4
          val (level, rest) = curEdges.partition(_._4 == wMax)
          val topRank = level.map(_._1).max
          val parts = comps(rest, cur)
          val lam = 1.0 / wMax
          val big = parts.filter(_.size >= m)
          if (big.size >= 2) {
            cl.stability += cur.size * (lam - birthLam)
            val shed = parts.filterNot(_.size >= m)
            shed.flatten.foreach(pointCluster(_) = key)
            val keys = big.map(p => (topRank, p.min))
            cl.children = keys
            big.zip(keys).foreach { case (p, k) =>
              run(k, p, rest.filter(x => p(x._2)), lam)
              clusters(k).parent = Some(key)
            }
            open = false
          } else if (big.size == 1) {
            val keep = big.head
            val shedSize = cur.size - keep.size
            cl.stability += shedSize * (lam - birthLam)
            parts.filterNot(_ == keep).flatten.foreach(pointCluster(_) = key)
            cur = keep
            curEdges = rest.filter(x => keep(x._2))
          } else { // every part below m: everyone dies here
            cl.stability += cur.size * (lam - birthLam)
            cur.foreach(pointCluster(_) = key)
            open = false
          }
        }
      }
    }
    val allNodes = edges.flatMap(e => Seq(e._1, e._2)).toSet
    val rootKey = (-1L, -1L)
    if (allNodes.size >= m) run(rootKey, allNodes, asc, 0.0)
    // FOSC, same ≥ rule, root excluded
    val selected = scala.collection.mutable.HashSet.empty[(Long, Long)]
    def visit(k: (Long, Long)): Double = {
      val cl = clusters(k)
      val cs = cl.children.map(visit).sum
      if (k != rootKey && cl.stability >= cs) {
        def clear(x: (Long, Long)): Unit =
          clusters(x).children.foreach { c => selected -= c; clear(c) }
        clear(k); selected += k
        cl.stability
      } else math.max(cl.stability, cs)
    }
    if (clusters.contains(rootKey)) visit(rootKey)
    val labelsByVertex = allNodes.map { v =>
      pointCluster.get(v) match {
        case None => v -> None
        case Some(k0) =>
          var k: Option[(Long, Long)] = Some(k0)
          while (k.isDefined && !selected(k.get)) k = clusters(k.get).parent
          v -> k
      }
    }.toMap
    (clusters.toMap.map { case (k, c) => k -> c.stability }, labelsByVertex)
  }

  test("condensedTree: stabilities and FOSC labels match the descending-removal replay") {
    import spark.implicits._
    for (seed <- Seq(5L, 23L); m <- Seq(2L, 6L, 15L)) {
      val edges = randomTree(140, seed)
      val events = DistributedDendrogram
        .mergeEvents(spark, edges.toDF("src", "dst", "weight"), blockSize = 19, driverCap = 0)
      val (nodes, labelsDf) = DistributedDendrogram.condensedTree(events, m, driverCap = 0)
      val (wantStab, wantLabels) = replayCondensed(edges, m)
      // cluster key sets agree (root keyed (-1,-1) both sides)
      val gotKeys = nodes.map(nd =>
        if (nd.parent_id == -1L) (-1L, -1L) else (nd.birth_rank, nd.anchor_side)).toSet
      assert(gotKeys == wantStab.keySet, s"seed=$seed m=$m cluster keys:\n" +
        s"got ${gotKeys.toSeq.sorted}\nwant ${wantStab.keySet.toSeq.sorted}")
      nodes.foreach { nd =>
        val key = if (nd.parent_id == -1L) (-1L, -1L) else (nd.birth_rank, nd.anchor_side)
        assert(math.abs(nd.stability - wantStab(key)) < 1e-9,
          s"seed=$seed m=$m cluster $key stability ${nd.stability} vs ${wantStab(key)}")
      }
      // flat labels: compare as partitions (ids are internal numbering)
      val gotLabels = labelsDf.select("vertex", "label")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotParts = gotLabels.groupBy(_._2).map { case (l, vs) => l -> vs.keySet }
      val wantParts = wantLabels.groupBy(_._2).map { case (l, vs) => l -> vs.keySet }
      val gotNoise = gotParts.getOrElse(-1L, Set.empty[Long])
      val wantNoise = wantLabels.collect { case (v, None) => v }.toSet
      assert(gotNoise == wantNoise,
        s"seed=$seed m=$m noise sets differ: ${gotNoise.size} vs ${wantNoise.size}")
      val gotSets = gotParts.filterNot(_._1 == -1L).values.toSet
      val wantSets = wantParts.collect {
        case (Some(_), vs) => vs
      }.toSet
      assert(gotSets == wantSets, s"seed=$seed m=$m cluster partitions differ: " +
        s"got ${gotSets.map(_.size).toSeq.sorted} want ${wantSets.map(_.size).toSeq.sorted}")
    }
  }

  test("size-gated driver fast path is byte-identical to the forced-distributed route") {
    // VERDICT r10 #2: below driverCap the events come from a tagged driver
    // Kruskal replay and the condensed tree from a driver structural
    // replay — same semantics, none of the small-job floor. Equality is
    // the contract: events byte-for-byte, labels frame cell-for-cell
    // (stability compared to 1e-9 — the only Σ-order difference allowed).
    import spark.implicits._
    for (seed <- Seq(2L, 31L); m <- Seq(2L, 6L, 15L)) {
      val edges = randomTree(160, seed)
      val df = edges.toDF("src", "dst", "weight")
      val fastEv = DistributedDendrogram.mergeEvents(spark, df) // default cap
      val distEv = DistributedDendrogram
        .mergeEvents(spark, df, blockSize = 23, driverCap = 0)
      assert(fastEv.collect().sortBy(_.rank).toSeq ==
        distEv.collect().sortBy(_.rank).toSeq, s"seed=$seed events differ")
      val (fastNodes, fastLabels) = DistributedDendrogram.condensedTree(fastEv, m)
      val (distNodes, distLabels) =
        DistributedDendrogram.condensedTree(distEv, m, driverCap = 0)
      assert(fastNodes.size == distNodes.size, s"seed=$seed m=$m node count")
      fastNodes.zip(distNodes).foreach { case (f, d) =>
        // NaN-canonical (root birth_weight is NaN; NaN != NaN in ==)
        def canon(n: DistributedDendrogram.CondensedNode) =
          n.copy(stability = 0.0,
            birth_weight = if (n.birth_weight.isNaN) -999.0 else n.birth_weight)
        assert(canon(f) == canon(d),
          s"seed=$seed m=$m node differs:\n  fast $f\n  dist $d")
        assert(math.abs(f.stability - d.stability) < 1e-9,
          s"seed=$seed m=$m stability ${f.stability} vs ${d.stability}")
      }
      def cells(l: org.apache.spark.sql.DataFrame) =
        l.select("vertex", "label", "death_weight", "outlier_score")
          .collect().map(r => (r.getLong(0), r.getLong(1),
            if (r.isNullAt(2)) None else Some(r.getDouble(2)),
            if (r.isNullAt(3)) None else Some(r.getDouble(3))))
          .sortBy(_._1).toSeq
      assert(cells(fastLabels) == cells(distLabels),
        s"seed=$seed m=$m labels frame differs")
    }
  }

  test("forests never merge across components; duplicate weights stay deterministic") {
    // two disjoint trees with heavily tied weights
    val t1 = Seq((0L, 1L, 5.0), (1L, 2L, 5.0), (2L, 3L, 5.0))
    val t2 = Seq((10L, 11L, 5.0), (11L, 12L, 5.0))
    check(t1 ++ t2, blockSize = 2)
    import spark.implicits._
    val evs = DistributedDendrogram
      .mergeEvents(spark, (t1 ++ t2).toDF("src", "dst", "weight"), 2, driverCap = 0)
      .collect()
    assert(evs.length == 5)
    // components keep their own min reps: nothing bridges 0-tree and 10-tree
    assert(evs.forall(e => (e.rep_a < 10 && e.rep_b < 10) ||
      (e.rep_a >= 10 && e.rep_b >= 10)))
  }
}
