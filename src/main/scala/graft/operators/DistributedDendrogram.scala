package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One single-linkage merge event: at `rank` (global Kruskal order) the
  * components represented by `rep_a`/`rep_b` (sizes `size_a`/`size_b`)
  * merge at `weight` into a component represented by min(rep_a, rep_b).
  * The n−1 events ARE the dendrogram, with cut sizes attached — what the
  * condensed-tree extraction needs and what a driver union-find would
  * otherwise have to replay over collected edges. */
final case class MergeEvent(rank: Long, weight: Double,
    rep_a: Long, rep_b: Long, size_a: Long, size_b: Long)

/** Distributed single-linkage dendrogram extraction from an MST/forest —
  * the scale path for HDBSCAN*'s Phase-3 hierarchy (VERDICT r8 #8: the
  * last driver-O(n) surface of exact mode). The reference collects the
  * whole tree and replays Kruskal on the driver
  * (`hdbscanstar/HDBSCANStar.java` works on in-memory arrays); here the
  * merge order is reconstructed distributively by RANK-RANGE DIVIDE AND
  * CONQUER (VERDICT r9 #3 — replaces the sequential per-block chain whose
  * every round re-scanned the O(n) label frame, O(n²/blockSize) total):
  *
  *  1. edges rank-sorted by (weight, src, dst) — ONE range sort;
  *  2. recursion on the rank range: a range of ≤ `blockSize` edges is
  *     contracted by its inherited (vertex → label, size) state and run
  *     through a SINGLE-task union-find emitting its merge events plus a
  *     label-shaped relabel map (old label → new label, new size);
  *  3. an internal range splits in half, recurses left, applies the
  *     left's relabel map to the right half's state (one join, sized to
  *     the right half — never to n), recurses right, and composes the two
  *     relabel maps (labels are component minima, so composition is a
  *     join on new = old).
  *
  * Every state/relabel frame a node touches is bounded by ITS OWN range's
  * vertex count, so each vertex row is re-joined O(log B) times total
  * (B = ceil(E/blockSize)) — total row-work O(E log B), vs the old
  * chain's O(E·B). Task peak state stays O(blockSize) (a declared knob,
  * NOT O(n)); the left→right data dependence is inherent to exact Kruskal
  * replay, but the serial chain now carries log-depth COMPOSITION work
  * only. λ-ancestor resolution over the resulting event tree
  * ([[nearestQualifyingAncestor]]) is pointer-doubling — O(log n)
  * self-joins regardless of dendrogram depth (a sorted-weight chain makes
  * the tree O(n) deep; per-level walking would be a scale-killer).
  */
object DistributedDendrogram {

  /** Encoder row emitted by the block task (private[operators], not
    * private: the Dataset encoder's generated code needs JVM-public
    * access). kind 0 = merge event, kind 1 = relabel (old label → new
    * label), kind 2 = size update (label → size after this block). */
  private[operators] final case class BlockOut(kind: Int, rank: Long, weight: Double,
      a: Long, b: Long, sa: Long, sb: Long)

  /** Driver Kruskal replay — the SAME event semantics as the distributed
    * block pipeline (rank = (weight, src, dst) order, reps = component
    * minima, sizes at merge time), proven equal event-for-event by
    * DistributedDendrogramSpec. Runs in O(E α(E)) on the driver. */
  private[operators] def kruskalReplay(
      edges: Array[(Long, Long, Double)]): Array[MergeEvent] = {
    java.util.Arrays.sort(edges, Ordering.by[(Long, Long, Double), (Double, Long, Long)](
      e => (e._3, e._1, e._2)))
    val parent = new java.util.HashMap[Long, Long]
    val size = new java.util.HashMap[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrDefault(r, r) != r) r = parent.get(r)
      var c = x
      while (parent.getOrDefault(c, c) != c) { val nx = parent.get(c); parent.put(c, r); c = nx }
      r
    }
    val out = new Array[MergeEvent](edges.length)
    var i = 0
    while (i < edges.length) {
      val (s, d, w) = edges(i)
      val ra = find(s); val rb = find(d)
      require(ra != rb, s"cycle in MST input at rank $i")
      val sa = size.getOrDefault(ra, 1L); val sb = size.getOrDefault(rb, 1L)
      val rep = math.min(ra, rb)
      parent.put(math.max(ra, rb), rep)
      size.put(rep, sa + sb)
      size.remove(math.max(ra, rb))
      out(i) = MergeEvent(i.toLong, w, ra, rb, sa, sb)
      i += 1
    }
    out
  }

  /** Compute all n−1 merge events of the single-linkage dendrogram of
    * `edges` (an MST or forest: (src, dst, weight); src≠dst, acyclic).
    * Ties broken by (weight, src, dst) — deterministic at any
    * parallelism. Representatives are component-min node ids.
    *
    * Size gate (VERDICT r10 #2): at or below `driverCap` edges the events
    * come from a tagged driver Kruskal replay (microseconds at gate scale
    * vs ~100 small jobs; byte-identical by spec) — the distributed
    * rank-range divide and conquer is the ABOVE-cap path. `driverCap = 0`
    * forces the distributed path (specs, smokes). */
  def mergeEvents(spark: SparkSession, edges: DataFrame,
      blockSize: Int = 500000, driverCap: Long = 500000): Dataset[MergeEvent] = {
    import spark.implicits._
    import org.apache.spark.sql.GraftShim
    val edgeCols = edges.select(col("src").cast("long"), col("dst").cast("long"),
      col("weight").cast("double"))
    // gate probe: LIMIT cap+1 early-terminates, so the above-cap path pays
    // a bounded prefix scan, not a full extra pass over the edge plan
    val probeCap = math.min(driverCap, Int.MaxValue - 1L).toInt
    if (driverCap > 0 &&
        edgeCols.limit(probeCap + 1).count() <= driverCap) {
      val rows = graft.GraftTags.tagged(spark, graft.GraftTags.DriverCollectTag) {
        edgeCols.as[(Long, Long, Double)].collect()
      }
      return spark.createDataset(kruskalReplay(rows).toSeq)
    }
    // 1. global Kruskal rank: one range sort + zipWithIndex
    val ranked = edgeCols
      .orderBy(col("weight"), col("src"), col("dst"))
      .as[(Long, Long, Double)].rdd
      .zipWithIndex()
      .map { case ((s, d, w), r) => (r, s, d, w) }
      .toDF("rank", "src", "dst", "weight")
    val (rankedCk, rankedRdd) = GraftShim.materialize(ranked)
    val total = rankedCk.count()

    // cached leaf outputs live until the final events checkpoint — the
    // ADVICE-r9 fix: never unpersist a frame a later read recomputes
    // through (each frame gets its own retention, no shared rotator)
    val retained = scala.collection.mutable.ListBuffer.empty[org.apache.spark.rdd.RDD[_]]
    def mat(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) =
      GraftShim.materialize(df)

    def slice(lo: Long, hi: Long): DataFrame =
      rankedCk.filter(col("rank") >= lo && col("rank") < hi)
    def verticesOf(lo: Long, hi: Long): DataFrame =
      slice(lo, hi).select(col("src").as("vertex"))
        .unionAll(slice(lo, hi).select(col("dst").as("vertex"))).distinct()

    /** Recurse over rank range [lo, hi). `m` is the inherited state —
      * (vertex, label, size) rows for the range's vertices whose
      * component is non-trivial as of rank `lo` (missing row = label
      * self, size 1) — OWNED by this call (freed here). Returns the
      * range's event frames (cached; retention registered in `retained`)
      * and its relabel map (old label at lo → new label, new size) for
      * every label touched in the range, cached and owned by the caller. */
    def go(lo: Long, hi: Long, m: (DataFrame, org.apache.spark.rdd.RDD[_]))
        : (Vector[DataFrame], (DataFrame, org.apache.spark.rdd.RDD[_])) = {
      val nb = (hi - lo + blockSize - 1) / blockSize
      if (nb <= 1) {
        // leaf: contract the ≤ blockSize edges by the inherited state and
        // run a single-task union-find over them in rank order
        val contracted = slice(lo, hi)
          .join(m._1.select(col("vertex").as("src"), col("label").as("la0"),
            col("size").as("sa0")), Seq("src"), "left")
          .join(m._1.select(col("vertex").as("dst"), col("label").as("lb0"),
            col("size").as("sb0")), Seq("dst"), "left")
          .select(col("rank"), col("weight"),
            coalesce(col("la0"), col("src")).as("la"),
            coalesce(col("sa0"), lit(1L)).as("sa"),
            coalesce(col("lb0"), col("dst")).as("lb"),
            coalesce(col("sb0"), lit(1L)).as("sb"))
        // kind 0 = edge; kind 2 = base size of a touched label (distinct:
        // every occurrence of a label carries the same inherited size)
        val inRows = contracted
          .select(lit(0).as("kind"), col("rank"), col("weight"),
            col("la").as("a"), col("lb").as("b"), lit(0L).as("sa"), lit(0L).as("sb"))
          .unionAll(contracted.select(col("la").as("label"), col("sa").as("size"))
            .unionAll(contracted.select(col("lb").as("label"), col("sb").as("size")))
            .distinct()
            .select(lit(2).as("kind"), lit(0L).as("rank"), lit(0.0).as("weight"),
              col("label").as("a"), lit(0L).as("b"), col("size").as("sa"), lit(0L).as("sb")))
          .as[BlockOut]
        val out = inRows.repartition(1).mapPartitions { it =>
          val rows = it.toArray
          val baseSize = scala.collection.mutable.HashMap.empty[Long, Long]
          rows.iterator.filter(_.kind == 2).foreach(r => baseSize(r.a) = r.sa)
          // union-find over base labels, rep = min id, size tracked
          val parent = scala.collection.mutable.HashMap.empty[Long, Long]
          val compSize = scala.collection.mutable.HashMap.empty[Long, Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x
            while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
            r
          }
          val evs = Array.newBuilder[BlockOut]
          rows.filter(_.kind == 0).sortBy(_.rank).foreach { e =>
            val ra = find(e.a); val rb = find(e.b)
            require(ra != rb, s"cycle in MST input at rank ${e.rank}")
            val sa = compSize.getOrElse(ra, baseSize(ra))
            val sb = compSize.getOrElse(rb, baseSize(rb))
            // event reps are the MERGE-TIME component reps (min ids)
            val rep = math.min(ra, rb)
            val other = math.max(ra, rb)
            parent(other) = rep
            compSize(rep) = sa + sb
            compSize.remove(other)
            evs += BlockOut(0, e.rank, e.weight, ra, rb, sa, sb)
          }
          // one relabel row per touched label (identity included — makes
          // the parent's composition total over touched labels), carrying
          // the new rep's post-range size
          val upd = Array.newBuilder[BlockOut]
          baseSize.keysIterator.foreach { l =>
            val r = find(l)
            upd += BlockOut(1, 0L, 0.0, l, r, compSize.getOrElse(r, baseSize(r)), 0L)
          }
          (evs.result() ++ upd.result()).iterator
        }
        val (outCk, outRdd) = mat(out.toDF())
        retained += outRdd // events read from this cache until the end
        val events = outCk.filter(col("kind") === 0)
          .select(col("rank"), col("weight"), col("a").as("rep_a"),
            col("b").as("rep_b"), col("sa").as("size_a"), col("sb").as("size_b"))
        val rel = mat(outCk.filter(col("kind") === 1)
          .select(col("a").as("old"), col("b").as("new"), col("sa").as("nsize")))
        m._2.unpersist(blocking = false)
        (Vector(events), rel)
      } else {
        val mid = lo + (nb / 2) * blockSize
        // restrict the inherited state to each half's own vertices —
        // every join below is sized to the SUBRANGE, never to n
        val m1 = mat(m._1.join(verticesOf(lo, mid), Seq("vertex")))
        val (ev1, r1) = go(lo, mid, m1)
        val v2 = verticesOf(mid, hi)
        val m2base = m._1.join(v2, Seq("vertex"))
        // right state = inherited rows updated by the left's relabels,
        // plus identity vertices the left absorbed (their identity label
        // is in the left's relabel domain)
        val upd = m2base
          .join(r1._1, m2base("label") === r1._1("old"), "left")
          .select(m2base("vertex"),
            coalesce(r1._1("new"), m2base("label")).as("label"),
            coalesce(r1._1("nsize"), m2base("size")).as("size"))
        val newly = v2.join(m._1.select(col("vertex")), Seq("vertex"), "left_anti")
          .join(r1._1, col("vertex") === r1._1("old"))
          .select(col("vertex"), col("new").as("label"), col("nsize").as("size"))
        val m2 = mat(upd.unionAll(newly))
        m._2.unpersist(blocking = false)
        val (ev2, r2) = go(mid, hi, m2)
        // compose: r1 chained through r2 (labels are component minima, so
        // new-of-left joins old-of-right), plus right relabels of labels
        // the left never touched
        val r1u = r1._1.join(r2._1, r1._1("new") === r2._1("old"), "left")
          .select(r1._1("old").as("old"),
            coalesce(r2._1("new"), r1._1("new")).as("new"),
            coalesce(r2._1("nsize"), r1._1("nsize")).as("nsize"))
        val r2only = r2._1.join(r1._1.select(col("new").as("old")).distinct(),
          Seq("old"), "left_anti")
        val r = mat(r1u.unionAll(r2only))
        r1._2.unpersist(blocking = false)
        r2._2.unpersist(blocking = false)
        (ev1 ++ ev2, r)
      }
    }

    val result =
      if (total == 0) spark.emptyDataset[MergeEvent]
      else {
        val emptyM = mat(Seq.empty[(Long, Long, Long)].toDF("vertex", "label", "size"))
        val (eventFrames, rFinal) = go(0L, total, emptyM)
        val all = eventFrames.reduce(_ unionAll _).as[MergeEvent]
        val ck = all.localCheckpoint(true).as[MergeEvent]
        rFinal._2.unpersist(blocking = false)
        ck
      }
    retained.foreach(_.unpersist(blocking = false))
    rankedRdd.unpersist(blocking = false)
    result
  }

  /** Parent linkage of the event tree, distilled from the merge events
    * alone: for every entity (leaf vertex or event) the event it next
    * participates in, plus WHICH side rep carried it in. One window over
    * (rep, rank)-interleaved occurrence rows — representatives are
    * component minima, so a component's occurrences form a chain per rep
    * and `lag(1)` reads each side's child entity directly.
    *
    * Output columns: child_kind (0 leaf / 1 event), child_id (vertex id /
    * event rank), parent_rank, side_rep. Roots (final components) emit no
    * row. */
  def parentEdges(events: Dataset[MergeEvent]): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.toDF()
    // occurrence rows: kindOrd 0 = side (state BEFORE the event), 1 =
    // merged/leaf (state FROM the event on). At equal rank a side sorts
    // before the merged row, so lag(1) for a side row is always the
    // nearest earlier merged-or-leaf occurrence of the same rep.
    val sides = ev.select(col("rep_a").as("rep"), col("rank"), lit(0).as("kindOrd"),
        lit(1).as("entity_kind"), col("rank").as("entity_id"))
      .unionAll(ev.select(col("rep_b").as("rep"), col("rank"), lit(0).as("kindOrd"),
        lit(1).as("entity_kind"), col("rank").as("entity_id")))
    val mergeds = ev.select(least(col("rep_a"), col("rep_b")).as("rep"), col("rank"),
      lit(1).as("kindOrd"), lit(1).as("entity_kind"), col("rank").as("entity_id"))
    val leaves = ev.select(col("rep_a").as("rep"))
      .unionAll(ev.select(col("rep_b").as("rep"))).distinct()
      .select(col("rep"), lit(-1L).as("rank"), lit(1).as("kindOrd"),
        lit(0).as("entity_kind"), col("rep").as("entity_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("rep")).orderBy(col("rank"), col("kindOrd"))
    sides.unionAll(mergeds).unionAll(leaves)
      .select(col("rep"), col("rank"), col("kindOrd"),
        lag(col("entity_kind"), 1).over(w).as("child_kind"),
        lag(col("entity_id"), 1).over(w).as("child_id"),
        lag(col("kindOrd"), 1).over(w).as("child_kindOrd"))
      .filter(col("kindOrd") === 0) // side rows carry the linkage
      .select(col("child_kind"), col("child_id"),
        col("rank").as("parent_rank"), col("rep").as("side_rep"))
  }

  /** Pointer-doubling nearest-qualifying-ancestor over an ARBITRARY
    * parent relation — O(log depth) self-joins, never a per-level walk.
    * `base`: (node, q); `parents`: (node, parent, side). With
    * `strict = false` the target may be the node itself (side null);
    * with `strict = true` the walk starts at the parent (side = the
    * side through which the chain entered it). Nodes with no qualifying
    * (strict) ancestor resolve to null. Returns (node, target,
    * target_side). */
  private def resolveAncestor(spark: SparkSession, base: DataFrame,
      parents: DataFrame, strict: Boolean): DataFrame = {
    val rot = new graft.CheckpointRotator
    var state = rot.rotate(base
      .join(parents, Seq("node"), "left")
      .select(col("node"), col("q"),
        (if (strict) lit(null).cast("long")
         else when(col("q"), col("node"))).as("target"),
        lit(null).cast("long").as("target_side"),
        (if (strict) col("parent")
         else when(col("q"), lit(null).cast("long"))
           .otherwise(col("parent"))).as("ptr"),
        (if (strict) col("side")
         else when(col("q"), lit(null).cast("long"))
           .otherwise(col("side"))).as("ptr_side")))
    // examine ptr: if it qualifies (or already resolved), adopt; else
    // jump to ptr's ptr — classic doubling, each step at least halves
    // the unresolved chain length
    def step(st: DataFrame): DataFrame = {
      val ptrState = st.select(col("node").as("ptr"),
        col("q").as("p_q"), col("target").as("p_target"),
        col("target_side").as("p_target_side"),
        col("ptr").as("p_ptr"), col("ptr_side").as("p_ptr_side"))
      st.join(ptrState, Seq("ptr"), "left")
        .select(col("node"), col("q"),
          when(col("target").isNotNull, col("target"))
            .when(col("ptr").isNotNull && col("p_q"), col("ptr"))
            .when(col("ptr").isNotNull, col("p_target")).as("target"),
          when(col("target").isNotNull, col("target_side"))
            .when(col("ptr").isNotNull && col("p_q"), col("ptr_side"))
            .when(col("ptr").isNotNull && col("p_target").isNotNull,
              col("p_target_side")).as("target_side"),
          when(col("target").isNotNull || col("p_q"),
            lit(null).cast("long")).otherwise(col("p_ptr")).as("ptr"),
          when(col("target").isNotNull || col("p_q"),
            lit(null).cast("long")).otherwise(col("p_ptr_side")).as("ptr_side"))
    }
    var remaining = state.filter(col("target").isNull && col("ptr").isNotNull).count()
    var iter = 0
    while (remaining > 0 && iter < 32) {
      // TWO doubling steps per materialization/convergence check — the
      // loop is job-count-bound at gate scale, and the second step rides
      // the first's cached input for free
      state = rot.rotate(step(step(state)))
      remaining = state.filter(col("target").isNull && col("ptr").isNotNull).count()
      iter += 1
    }
    require(remaining == 0, s"ancestor resolution did not converge in $iter rounds")
    val out = state.select(col("node"), col("target"), col("target_side"))
      .localCheckpoint(true)
    rot.close()
    out
  }

  /** For every event, the nearest ancestor-or-self satisfying `qualifies`
    * (a boolean Column over the MergeEvent columns). Returns (rank,
    * target_rank nullable, target_side nullable — the side_rep through
    * which the chain ENTERED the target event; null when the target is
    * the event itself). */
  def nearestQualifyingAncestor(events: Dataset[MergeEvent],
      qualifies: org.apache.spark.sql.Column,
      precomputedParents: Option[DataFrame] = None): DataFrame = {
    val spark = events.sparkSession
    val parents = precomputedParents.getOrElse(parentEdges(events))
      .filter(col("child_kind") === 1)
      .select(col("child_id").as("node"), col("parent_rank").as("parent"),
        col("side_rep").as("side"))
    val base = events.toDF().select(col("rank").as("node"), qualifies.as("q"))
    resolveAncestor(spark, base, parents, strict = false)
      .select(col("node").as("rank"), col("target").as("target_rank"),
        col("target_side"))
  }

  /** Tie-aware LEVEL-GROUP structure over the event tree. The reference's
    * hierarchy walks ε LEVELS, not single edges (HDBSCANStar.java's
    * descending level loop): all equal-weight merges assembling one
    * component act simultaneously, so a cluster splits only when a level
    * leaves ≥ 2 FRAGMENTS (components formed strictly below the level's
    * weight) of size ≥ minClusterSize. Per-rank split semantics disagree
    * with the kernel whenever weights tie — and mutual-reachability
    * weights tie constantly (core distances clip many edges to the same
    * value).
    *
    * Returns:
    *  - tops: (rank, top) — every event's group top (the highest
    *    same-weight ancestor; one group = one maximal run of equal-weight
    *    merges of one component);
    *  - groupParents: (node=top, parent=parent group's top, side=rep of
    *    this group's merged component) — the group-level parent relation;
    *  - fragments: (top, frag_rep, frag_size) — each group's entering
    *    fragments (sides that are leaves or lower-weight events). */
  private[operators] def levelStructure(events: Dataset[MergeEvent],
      parents: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val spark = events.sparkSession
    val ev = events.toDF()
    val evParents = parents.filter(col("child_kind") === 1)
      .select(col("child_id").as("node"), col("parent_rank").as("parent"),
        col("side_rep").as("side"))
    val topQ = ev.select(col("rank").as("node"), col("weight"))
      .join(evParents, Seq("node"), "left")
      .join(ev.select(col("rank").as("parent"), col("weight").as("pweight")),
        Seq("parent"), "left")
      .select(col("node"),
        (col("parent").isNull || col("pweight") =!= col("weight")).as("q"))
    val tops = resolveAncestor(spark, topQ, evParents, strict = false)
      .select(col("node").as("rank"), col("target").as("top"))
    // fragment census: event sides whose child entity entered from
    // strictly below the level weight
    val sides = ev.select(col("rank"), col("weight"),
        col("rep_a").as("rep"), col("size_a").as("fsize"))
      .unionAll(ev.select(col("rank"), col("weight"),
        col("rep_b").as("rep"), col("size_b").as("fsize")))
    val childOf = parents.select(col("parent_rank").as("rank"),
      col("side_rep").as("rep"), col("child_kind"), col("child_id"))
    val fragments = sides.join(childOf, Seq("rank", "rep"))
      .join(ev.select(col("rank").as("child_id"), col("weight").as("cweight")),
        Seq("child_id"), "left") // null for leaf children
      .filter(col("child_kind") === 0 || col("cweight") < col("weight"))
      .join(tops, Seq("rank"))
      .select(col("top"), col("rep").as("frag_rep"), col("fsize").as("frag_size"))
    val groupParents = tops.filter(col("rank") === col("top"))
      .select(col("top").as("node"))
      .join(evParents, Seq("node"))
      .join(tops.select(col("rank").as("parent"), col("top").as("ptop")),
        Seq("parent"))
      .select(col("node"), col("ptop").as("parent"), col("side"))
    (tops.localCheckpoint(true), groupParents.localCheckpoint(true),
      fragments.localCheckpoint(true))
  }

  /** Per-point death resolution: the event at which each vertex's
    * component FIRST reaches size ≥ `minClusterSize` (ascending) — in the
    * descending HDBSCAN* view, the weight at which the point falls out of
    * its cluster. Output: (vertex, death_rank, death_weight, anchor_rank,
    * anchor_side) where the anchor names the condensed cluster the point
    * died in — TIE-AWARE: the nearest true-split LEVEL GROUP (≥ 2
    * fragments ≥ m) STRICTLY ABOVE the death event's own group, keyed
    * (group top rank, entering fragment rep); null anchor = the root
    * cluster. Vertices whose final component stays below m resolve to
    * null death (global noise). */
  def pointDeaths(events: Dataset[MergeEvent], minClusterSize: Long,
      precomputedParents: Option[DataFrame] = None): DataFrame = {
    val spark = events.sparkSession
    require(minClusterSize >= 2, "minClusterSize must be >= 2")
    // the parent-linkage window runs ONCE; every pass reads the same frame
    val parents = precomputedParents
      .getOrElse(parentEdges(events).localCheckpoint(true))
    // tie-aware anchors: death group top → nearest true-split group
    // strictly above, entered via the fragment containing this lineage
    val (tops, groupParents, fragments) = levelStructure(events, parents)
    val groupAnchor = groupAnchors(spark, tops, groupParents, fragments, minClusterSize)
    deathsFrame(events, minClusterSize, parents, tops, groupAnchor)
  }

  /** The (vertex, death_rank, death_weight, anchor_rank, anchor_side)
    * frame from precomputed structure — shared by [[pointDeaths]] and
    * [[condensedTree]] so the level-group resolution runs once. */
  private def deathsFrame(events: Dataset[MergeEvent], minClusterSize: Long,
      parents: DataFrame, tops: DataFrame, groupAnchor: DataFrame): DataFrame = {
    val qualifies = (col("size_a") + col("size_b")) >= minClusterSize
    val ev = events.toDF()
    val leafParents = parents
      .filter(col("child_kind") === 0)
      .select(col("child_id").as("vertex"), col("parent_rank"))
    val qual = nearestQualifyingAncestor(events, qualifies, Some(parents))
      .select(col("rank").as("parent_rank"), col("target_rank").as("death_rank"))
    val anchors = tops.select(col("rank").as("death_rank"), col("top"))
      .join(groupAnchor, Seq("top"))
      .select(col("death_rank"), col("anchor_rank"), col("anchor_side"))
    leafParents
      .join(qual, Seq("parent_rank"), "left")
      .join(ev.select(col("rank").as("death_rank"), col("weight").as("death_weight")),
        Seq("death_rank"), "left")
      .join(anchors, Seq("death_rank"), "left")
      .select(col("vertex"), col("death_rank"), col("death_weight"),
        col("anchor_rank"), col("anchor_side"))
  }

  /** Per level group: the nearest TRUE-SPLIT group (≥ 2 fragments ≥ m)
    * STRICTLY ABOVE it, plus the entering fragment rep — the tie-aware
    * condensed-cluster key of everything shed at that group. Null target
    * = root cluster. Returns (top, anchor_rank, anchor_side). */
  private def groupAnchors(spark: SparkSession, tops: DataFrame,
      groupParents: DataFrame, fragments: DataFrame,
      minClusterSize: Long): DataFrame = {
    val geCounts = fragments.filter(col("frag_size") >= minClusterSize)
      .groupBy(col("top")).agg(count(lit(1)).as("n_ge"))
    val groupQ = tops.select(col("top").as("node")).distinct()
      .join(geCounts.select(col("top").as("node"), col("n_ge")), Seq("node"), "left")
      .select(col("node"), (coalesce(col("n_ge"), lit(0L)) >= 2).as("q"))
    resolveAncestor(spark, groupQ, groupParents, strict = true)
      .select(col("node").as("top"), col("target").as("anchor_rank"),
        col("target_side").as("anchor_side"))
  }

  /** One node of the condensed tree. cluster_id 0 = the root cluster;
    * parent_id −1 marks the root. birth_weight = the true split that
    * created the cluster (NaN for the root = born at λ=0);
    * child_split_rank = the true split that ends it (−1 for leaf
    * clusters). Stability is the standard Campello sum in λ = 1/w. */
  final case class CondensedNode(cluster_id: Long, parent_id: Long,
      birth_rank: Long, birth_weight: Double, anchor_side: Long,
      size_at_birth: Long, child_split_rank: Long, n_deaths: Long,
      stability: Double, selected: Boolean)

  /** Distributed condensed-tree extraction + FOSC flat labels — the full
    * HDBSCAN* Phase-3 with driver state bounded by the number of TRUE
    * SPLITS (≤ n/minClusterSize), never O(n): events stay distributed,
    * per-cluster death aggregates come back as one row per cluster, and
    * the point-label assignment is a broadcast map join. Edge weights
    * must be > 0 (mutual-reachability distances are).
    *
    * @return (condensed nodes incl. stabilities + FOSC selection,
    *         labels frame (vertex, label, death_weight, outlier_score) —
    *         label is the selected cluster_id or −1 for noise;
    *         outlier_score is the GLOSH score 1 − ε_max/ε(p) computed
    *         from the same distributed death frame)
    */
  /** Distributed condensed-tree + FOSC + GLOSH (see overload doc). At or
    * below `driverCap` events the whole structural resolution runs as a
    * tagged driver replay ([[condensedTreeDriver]]) — identical semantics,
    * none of the ~100 small pointer-doubling jobs; `driverCap = 0` forces
    * the distributed frames (specs, smokes).
    *
    * `constraints` (vertexA, vertexB, isMustLink) switches flat extraction
    * from FOSC to the reference's constraint-driven propagateTree
    * (VERDICT r10 #3 — the semantics of `HdbscanKernel.hierarchy`'s
    * constrained branch, see its scaladoc): cluster membership is resolved
    * from each endpoint's anchor cluster — a collect bounded by
    * 2·|constraints|, never by n — and the selection itself runs on the
    * driver-bounded cluster tree. */
  def condensedTree(events: Dataset[MergeEvent], minClusterSize: Long,
      allowSingleCluster: Boolean = false, driverCap: Long = 500000,
      constraints: Seq[(Long, Long, Boolean)] = Nil)
      : (Seq[CondensedNode], DataFrame) = {
    val spark = events.sparkSession
    import spark.implicits._
    if (driverCap > 0 &&
        events.limit(math.min(driverCap, Int.MaxValue - 1L).toInt + 1).count() <= driverCap)
      return condensedTreeDriver(events, minClusterSize, allowSingleCluster, constraints)
    val ev = events.toDF().persist()
    val parents = parentEdges(events).localCheckpoint(true)
    val (tops, groupParents, fragments) = levelStructure(events, parents)
    val groupAnchor = groupAnchors(spark, tops, groupParents, fragments,
      minClusterSize)
    val deaths = deathsFrame(events, minClusterSize, parents, tops, groupAnchor)
      .persist()
    deaths.count()

    // bounded collects, all ≤ 2n/m rows: one row per (true split, ≥ m
    // fragment) = one per non-root cluster; one anchor row per true split;
    // one aggregate row per cluster
    val fragGe = fragments.filter(col("frag_size") >= minClusterSize)
    val trueTops = fragGe.groupBy(col("top")).agg(count(lit(1)).as("n_ge"))
      .filter(col("n_ge") >= 2).select(col("top"))
    val splitRows = graft.GraftTags.bounded(spark) {
      fragGe.join(trueTops, Seq("top"))
        .join(ev.select(col("rank").as("top"), col("weight")), Seq("top"))
        .select(col("top"), col("weight"), col("frag_rep"), col("frag_size"))
        .collect()
    }.map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3))).toSeq
    val tsAnchorRows = graft.GraftTags.bounded(spark) {
      groupAnchor.join(trueTops, Seq("top")).collect()
    }.map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toSeq
    val deathAgg = graft.GraftTags.bounded(spark) {
      deaths.filter(col("death_rank").isNotNull)
        .groupBy(col("anchor_rank"), col("anchor_side"))
        .agg(count(lit(1)).as("n"), sum(lit(1.0) / col("death_weight")).as("sum_lambda"),
          min(col("death_weight")).as("min_death"))
        .collect()
    }.map(r => (if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1))),
      r.getLong(2), r.getDouble(3), r.getDouble(4))).toSeq

    // constraint endpoints → anchor cluster keys: ONE collect bounded by
    // 2·|constraints| (constraints are a driver-provided Seq by contract)
    val consKeys = if (constraints.isEmpty) Nil else {
      val vs = constraints.flatMap(c => Seq(c._1, c._2)).distinct
      val keyOf = graft.GraftTags.bounded(spark) {
        deaths.filter(col("vertex").isin(vs: _*))
          .select(col("vertex"), col("death_rank"), col("anchor_rank"),
            col("anchor_side")).collect()
      }.map { r =>
        r.getLong(0) -> (if (r.isNullAt(1) || r.isNullAt(2)) (-1L, -1L)
          else (r.getLong(2), r.getLong(3)))
      }.toMap
      constraints.map { case (a, b, ml) =>
        (keyOf.getOrElse(a, (-1L, -1L)), keyOf.getOrElse(b, (-1L, -1L)), ml)
      }
    }
    val (finalNodes, labelRows) =
      buildCondensed(splitRows, tsAnchorRows, deathAgg, allowSingleCluster, consKeys)
    val labelMap = labelRows
      .toDF("anchor_rank_k", "anchor_side_k", "label_k", "eps_min_k")
    val labels = deaths
      .withColumn("ar", coalesce(col("anchor_rank"), lit(-1L)))
      .withColumn("as", coalesce(col("anchor_side"), lit(-1L)))
      .join(broadcast(labelMap),
        col("ar") === col("anchor_rank_k") && col("as") === col("anchor_side_k"),
        "left")
      .select(col("vertex"),
        when(col("death_rank").isNull, lit(-1L))
          .otherwise(coalesce(col("label_k"), lit(-1L))).as("label"),
        col("death_weight"),
        // GLOSH: 1 − ε_max(anchor cluster subtree)/ε(p); points that never
        // reach a ≥m component (null death) score 0, like the kernel path
        when(col("death_weight").isNull || col("death_weight") <= 0.0, lit(0.0))
          .otherwise(lit(1.0) - col("eps_min_k") / col("death_weight"))
          .as("outlier_score"))
    val out = labels.localCheckpoint(true)
    deaths.unpersist(blocking = false)
    ev.unpersist(blocking = false)
    (finalNodes, out)
  }

  /** The driver tree over bounded rows — FOSC selection, stability, GLOSH
    * ε_max, flat-label resolution. Shared verbatim by the distributed
    * path (inputs collected from frames) and the size-gated driver path
    * (inputs replayed locally), so the two routes cannot diverge here.
    *
    * @param splitRows  (true-split top rank, weight, frag rep, frag size)
    *                   — one row per ≥ m fragment of each true split
    * @param tsAnchorRows (true-split top rank, parent cluster key or None)
    * @param deathAgg   (cluster key or None = root, n deaths, Σ 1/w,
    *                   min death w)
    * @param consKeys   constraints with endpoints already resolved to their
    *                   anchor cluster keys ((−1,−1) = root); non-empty
    *                   switches selection from FOSC to the reference's
    *                   constraint-driven propagateTree
    * @return (condensed nodes, labelMap rows (anchor_rank, anchor_side,
    *         label, eps_min) with (−1,−1) encoding the root key)
    */
  private def buildCondensed(
      splitRows: Seq[(Long, Double, Long, Long)],
      tsAnchorRows: Seq[(Long, Option[(Long, Long)])],
      deathAgg: Seq[(Option[(Long, Long)], Long, Double, Double)],
      allowSingleCluster: Boolean,
      consKeys: Seq[((Long, Long), (Long, Long), Boolean)] = Nil)
      : (Seq[CondensedNode], Seq[(Long, Long, Long, Double)]) = {
    // cluster key: (split group top rank, fragment rep) with (-1,-1) = root
    val RootKey = (-1L, -1L)
    // per true split: weight + its ≥ m fragments (the K-ARY children the
    // tie-aware semantics allow — one ε level can shatter a cluster into
    // any number of surviving fragments)
    val splitFrags: Map[Long, Seq[(Long, Long)]] = splitRows
      .groupBy(_._1)
      .map { case (t, rows) =>
        t -> rows.map(r => (r._3, r._4)).sortBy(_._1).toSeq
      }
    val splitWeight: Map[Long, Double] =
      splitRows.map(r => r._1 -> r._2).toMap
    // points surviving INTO children at the split = Σ ≥m fragment sizes
    // (shed points die AT the split and are counted via their deaths)
    val splitSurvivors: Map[Long, Long] =
      splitFrags.map { case (t, fs) => t -> fs.map(_._2).sum }
    val ids = scala.collection.mutable.LinkedHashMap[(Long, Long), Long](RootKey -> 0L)
    splitFrags.keys.toSeq.sorted.foreach { t =>
      splitFrags(t).foreach { case (rep, _) => ids((t, rep)) = ids.size.toLong }
    }
    // parent cluster of each true split (the cluster the split ENDS) =
    // its own strict group anchor
    val clusterOfSplit: Map[Long, (Long, Long)] = tsAnchorRows.map { r =>
      r._1 -> r._2.getOrElse(RootKey)
    }.toMap
    val endedBy: Map[(Long, Long), Long] = // cluster key -> its child split
      splitFrags.keys.map(t => clusterOfSplit.getOrElse(t, RootKey) -> t).toMap
    val deathByKey = deathAgg.map { r =>
      r._1.getOrElse(RootKey) -> (r._2, r._3)
    }.toMap
    // per-cluster min death weight, for GLOSH's subtree minimum (ε_max)
    val minDeathByKey = deathAgg.map { r =>
      r._1.getOrElse(RootKey) -> r._4
    }.toMap

    val fragSize: Map[(Long, Long), Long] = splitFrags.flatMap {
      case (t, fs) => fs.map { case (rep, sz) => (t, rep) -> sz }
    }
    val nodes = ids.map { case (key, id) =>
      val (birthRank, birthW, sideSize, parentId) =
        if (key == RootKey) (-1L, Double.NaN, -1L, -1L)
        else {
          val pk = clusterOfSplit.getOrElse(key._1, RootKey)
          (key._1, splitWeight(key._1), fragSize(key), ids(pk))
        }
      val (nD, sumLam) = deathByKey.getOrElse(key, (0L, 0.0))
      val childSplit = endedBy.getOrElse(key, -1L)
      val lamBirth = if (key == RootKey) 0.0 else 1.0 / birthW
      val survivorTerm = if (childSplit < 0) 0.0 else
        splitSurvivors(childSplit) * (1.0 / splitWeight(childSplit) - lamBirth)
      val stability = (sumLam - nD * lamBirth) + survivorTerm
      id -> CondensedNode(id, parentId, birthRank, birthW,
        if (key == RootKey) -1L else key._2, sideSize, childSplit, nD,
        stability, selected = false)
    }.toMap

    // ---- flat selection: FOSC, or constraint-driven propagateTree ----
    val children: Map[Long, Seq[Long]] = nodes.values
      .filter(_.parent_id >= 0).toSeq.groupBy(_.parent_id)
      .map { case (p, cs) => p -> cs.map(_.cluster_id).sorted }
    val selected = scala.collection.mutable.HashSet.empty[Long]
    if (consKeys.isEmpty) {
      val propagated = scala.collection.mutable.HashMap.empty[Long, Double]
      def visit(id: Long): Double = {
        val cs = children.getOrElse(id, Nil)
        val childSum = cs.map(visit).sum
        val own = nodes(id).stability
        // the root is only selectable under allowSingleCluster — otherwise a
        // split-free tree yields ALL NOISE, the standard HDBSCAN* convention
        if ((id != 0L || allowSingleCluster) && own >= childSum) {
          // select this node; deselect descendants
          def clear(x: Long): Unit = children.getOrElse(x, Nil).foreach { c =>
            selected -= c; clear(c)
          }
          clear(id)
          selected += id
          propagated(id) = own
          own
        } else {
          propagated(id) = math.max(own, childSum)
          math.max(own, childSum)
        }
      }
      visit(0L)
    } else {
      // constraint-driven propagateTree (the HdbscanKernel.hierarchy
      // constrained branch — Cluster.java:98-142 semantics): each cluster
      // credited once, at birth — +2 per must-link whose endpoints are
      // both inside, +1 per cannot-link endpoint inside whose partner is
      // outside; selection prefers more satisfied constraints, ties by
      // stability (self wins stability ties, reference `>=`); the root
      // never competes.
      val satisfied = scala.collection.mutable.HashMap.empty[Long, Long]
        .withDefaultValue(0L)
      def ancestorIds(key: (Long, Long)): Set[Long] = {
        var k = key
        val out = scala.collection.mutable.Set.empty[Long]
        var guard = 0
        while (guard < ids.size + 2) {
          out += ids.getOrElse(k, 0L)
          if (k == RootKey) return out.toSet
          k = clusterOfSplit.getOrElse(k._1, RootKey)
          guard += 1
        }
        out.toSet
      }
      consKeys.foreach { case (ka, kb, isMl) =>
        val ancA = ancestorIds(ka); val ancB = ancestorIds(kb)
        if (isMl) (ancA & ancB).foreach(satisfied(_) += 2L)
        else {
          (ancA -- ancB).foreach(satisfied(_) += 1L)
          (ancB -- ancA).foreach(satisfied(_) += 1L)
        }
      }
      def prop(id: Long): (Long, Double, List[Long]) = {
        val cs = children.getOrElse(id, Nil)
        if (cs.isEmpty) (satisfied(id), nodes(id).stability, List(id))
        else {
          val kid = cs.map(prop)
          val childSat = kid.map(_._1).sum
          val childStab = kid.map(_._2).sum
          val selfWins = id != 0L &&
            (satisfied(id) > childSat ||
              (satisfied(id) == childSat && nodes(id).stability >= childStab))
          if (selfWins) (satisfied(id), nodes(id).stability, List(id))
          else (childSat, childStab, kid.flatMap(_._3).toList)
        }
      }
      prop(0L)._3.filter(_ != 0L).foreach(selected += _)
    }
    val finalNodes = ids.values.toSeq.sorted
      .map(id => nodes(id).copy(selected = selected.contains(id)))

    // ---- GLOSH ε_max per cluster: the subtree minimum of point death
    // weights (HDBSCANStar.java:653-686 semantics, distributed — the
    // per-cluster minima arrived in the same bounded deathAgg rows; the
    // cluster tree itself is driver-bounded, so the propagation is) ----
    val keyOfId = ids.map(_.swap)
    val epsMinSub = scala.collection.mutable.HashMap.empty[Long, Double]
    def epsVisit(id: Long): Double = {
      val own = minDeathByKey.getOrElse(keyOfId(id), Double.PositiveInfinity)
      val v = (own +: children.getOrElse(id, Nil).map(epsVisit)).min
      epsMinSub(id) = v
      v
    }
    epsVisit(0L)

    // ---- flat labels: nearest selected ancestor-or-self of each point's
    // anchor cluster; none → noise ----
    val labelOfKey = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
    ids.foreach { case (key, id) =>
      var cur = id
      var lab = -1L
      while (cur >= 0 && lab < 0) {
        if (selected.contains(cur)) lab = cur
        else cur = nodes(cur).parent_id
      }
      labelOfKey(key) = lab
    }
    val labelRows = labelOfKey.toSeq.map { case ((ar, as), lab) =>
      (ar, as, lab, epsMinSub(ids((ar, as))))
    }.sortBy(r => (r._1, r._2))
    (finalNodes, labelRows)
  }

  /** Size-gated driver replay of the whole condensed-tree structural
    * resolution (VERDICT r10 #2): parent linkage, tie-aware level groups,
    * fragments, strict anchors and per-point deaths computed in O(E) on
    * the collected events, then the SAME [[buildCondensed]] driver tree
    * the distributed path uses. Output frame and semantics are identical
    * to the distributed route (spec: fast-vs-forced equality on random
    * trees); what disappears is the ~100-small-job pointer-doubling floor
    * at gate scale. */
  private def condensedTreeDriver(events: Dataset[MergeEvent], minClusterSize: Long,
      allowSingleCluster: Boolean,
      constraints: Seq[(Long, Long, Boolean)] = Nil): (Seq[CondensedNode], DataFrame) = {
    val spark = events.sparkSession
    require(minClusterSize >= 2, "minClusterSize must be >= 2")
    val evs = graft.GraftTags.tagged(spark, graft.GraftTags.DriverCollectTag) {
      events.collect()
    }.sortBy(_.rank)
    val E = evs.length
    val idxOf = evs.iterator.map(_.rank).zipWithIndex.toMap

    // ---- parent linkage (the parentEdges window, replayed in rank
    // order): per event side, the child entity = the side rep's nearest
    // earlier merged-or-leaf occurrence ----
    val lastOcc = new java.util.HashMap[Long, Int] // rep -> event idx (merged)
    val childKindA = new Array[Int](E); val childIdA = new Array[Long](E)
    val childKindB = new Array[Int](E); val childIdB = new Array[Long](E)
    val leafParent = new java.util.HashMap[Long, Int] // vertex -> event idx
    val eventParent = new Array[Int](E) // parent event idx, −1 = root
    val eventParentSide = new Array[Long](E)
    java.util.Arrays.fill(eventParent, -1)
    var i = 0
    while (i < E) {
      val e = evs(i)
      def side(rep: Long): (Int, Long) = {
        val prev = lastOcc.getOrDefault(rep, -1)
        if (prev < 0) { leafParent.put(rep, i); (0, rep) }
        else { eventParent(prev) = i; eventParentSide(prev) = rep; (1, evs(prev).rank) }
      }
      val (ka, ia) = side(e.rep_a); childKindA(i) = ka; childIdA(i) = ia
      val (kb, ib) = side(e.rep_b); childKindB(i) = kb; childIdB(i) = ib
      lastOcc.put(math.min(e.rep_a, e.rep_b), i)
      i += 1
    }

    // ---- tie-aware level-group tops (descending: parent idx > own) ----
    val top = new Array[Int](E)
    i = E - 1
    while (i >= 0) {
      val p = eventParent(i)
      top(i) = if (p >= 0 && evs(p).weight == evs(i).weight) top(p) else i
      i -= 1
    }

    // ---- fragment census: sides entering from strictly below the level ----
    val frags = scala.collection.mutable.HashMap
      .empty[Int, scala.collection.mutable.ListBuffer[(Long, Long)]]
    def addFrag(t: Int, rep: Long, size: Long): Unit =
      frags.getOrElseUpdate(t, scala.collection.mutable.ListBuffer.empty) += ((rep, size))
    i = 0
    while (i < E) {
      val e = evs(i)
      if (childKindA(i) == 0 || evs(idxOf(childIdA(i))).weight < e.weight)
        addFrag(top(i), e.rep_a, e.size_a)
      if (childKindB(i) == 0 || evs(idxOf(childIdB(i))).weight < e.weight)
        addFrag(top(i), e.rep_b, e.size_b)
      i += 1
    }
    val nGe: Int => Int = t => frags.get(t).map(_.count(_._2 >= minClusterSize)).getOrElse(0)
    def isTrueSplit(t: Int): Boolean = nGe(t) >= 2

    // ---- strict group anchors (descending: parent top idx > own) ----
    // anchor(top) = nearest true-split group strictly above, plus the
    // side rep via which the chain ENTERS it
    val anchorOf = new java.util.HashMap[Int, (Long, Long)] // topIdx -> (rank, side); absent = root
    i = E - 1
    while (i >= 0) {
      if (top(i) == i) {
        val p = eventParent(i)
        if (p >= 0) {
          val pt = top(p)
          val side = eventParentSide(i)
          if (isTrueSplit(pt)) anchorOf.put(i, (evs(pt).rank, side))
          else {
            val up = anchorOf.get(pt) // computed already (pt > i)
            if (up != null) anchorOf.put(i, up)
          }
        }
      }
      i -= 1
    }

    // ---- per-event nearest qualifying ancestor-or-self (descending) ----
    val deathIdx = new Array[Int](E) // −1 = none (component never reaches m)
    i = E - 1
    while (i >= 0) {
      val e = evs(i)
      deathIdx(i) =
        if (e.size_a + e.size_b >= minClusterSize) i
        else if (eventParent(i) >= 0) deathIdx(eventParent(i))
        else -1
      i -= 1
    }

    // ---- per-vertex deaths, in vertex order (deterministic Σ 1/w) ----
    final case class DeathRow(vertex: Long, deathRank: Long, deathWeight: Double,
        anchorRank: Long, anchorSide: Long, hasDeath: Boolean, hasAnchor: Boolean)
    val vertices = {
      val it = leafParent.keySet().iterator()
      val b = Array.newBuilder[Long]
      while (it.hasNext) b += it.next()
      val arr = b.result(); java.util.Arrays.sort(arr); arr
    }
    val deathRows = vertices.map { v =>
      val lp = leafParent.get(v)
      val d = deathIdx(lp)
      if (d < 0) DeathRow(v, -1L, 0.0, -1L, -1L, hasDeath = false, hasAnchor = false)
      else {
        val a = anchorOf.get(top(d))
        if (a == null)
          DeathRow(v, evs(d).rank, evs(d).weight, -1L, -1L, hasDeath = true, hasAnchor = false)
        else
          DeathRow(v, evs(d).rank, evs(d).weight, a._1, a._2, hasDeath = true, hasAnchor = true)
      }
    }

    // ---- bounded aggregates, same shapes as the distributed collects ----
    val splitRows = frags.keysIterator.filter(isTrueSplit).toSeq.sorted.flatMap { t =>
      frags(t).toSeq.filter(_._2 >= minClusterSize).map { case (rep, sz) =>
        (evs(t).rank, evs(t).weight, rep, sz)
      }
    }
    val tsAnchorRows = frags.keysIterator.filter(isTrueSplit).toSeq.sorted.map { t =>
      (evs(t).rank, Option(anchorOf.get(t)))
    }
    val deathAgg = deathRows.filter(_.hasDeath)
      .groupBy(r => if (r.hasAnchor) Some((r.anchorRank, r.anchorSide)) else None)
      .toSeq.sortBy(_._1)
      .map { case (key, rows) =>
        (key, rows.length.toLong, rows.map(1.0 / _.deathWeight).sum,
          rows.map(_.deathWeight).min)
      }

    val deathKeyOf: Map[Long, (Long, Long)] = if (constraints.isEmpty) Map.empty
      else deathRows.iterator.map(r => r.vertex ->
        (if (r.hasDeath && r.hasAnchor) (r.anchorRank, r.anchorSide)
         else (-1L, -1L))).toMap
    val consKeys = constraints.map { case (a, b, ml) =>
      (deathKeyOf.getOrElse(a, (-1L, -1L)), deathKeyOf.getOrElse(b, (-1L, -1L)), ml)
    }
    val (finalNodes, labelRows) =
      buildCondensed(splitRows, tsAnchorRows, deathAgg, allowSingleCluster, consKeys)
    val labelOf = labelRows.map(r => (r._1, r._2) -> (r._3, r._4)).toMap

    // ---- labels frame, replicating the distributed left-join semantics
    // cell for cell (unmatched anchor → label −1, null outlier) ----
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("vertex",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("label",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("death_weight",
        org.apache.spark.sql.types.DoubleType, nullable = true),
      org.apache.spark.sql.types.StructField("outlier_score",
        org.apache.spark.sql.types.DoubleType, nullable = true)))
    val rows: java.util.List[org.apache.spark.sql.Row] = new java.util.ArrayList(deathRows.length)
    deathRows.foreach { r =>
      val keyed = labelOf.get((if (r.hasAnchor) r.anchorRank else -1L,
        if (r.hasAnchor) r.anchorSide else -1L))
      val label: Long =
        if (!r.hasDeath) -1L else keyed.fold(-1L)(_._1)
      val dw: java.lang.Double = if (r.hasDeath) r.deathWeight else null
      val outlier: java.lang.Double =
        if (!r.hasDeath || r.deathWeight <= 0.0) 0.0
        else keyed.map(k => 1.0 - k._2 / r.deathWeight)
          .map(java.lang.Double.valueOf).orNull
      rows.add(org.apache.spark.sql.Row(r.vertex, label, dw, outlier))
    }
    (finalNodes, spark.createDataFrame(rows, schema))
  }
}
