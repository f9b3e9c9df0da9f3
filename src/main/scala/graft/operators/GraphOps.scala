package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Triangle counting and label propagation — the local-structure and
  * community-detection members of the graph family, beside PageRank,
  * connected components and Borůvka MST.
  *
  * Both are expressed as joins + aggregations over edge frames so Catalyst
  * picks the physical join (shuffled hash at scale) and every aggregation
  * is map-side combinable; no driver state beyond a rank-frame checkpoint
  * per LPA round.
  */
object GraphOps {

  /** Per-node triangle counts of an undirected graph.
    *
    * Input edges may be directed, duplicated, or contain self-loops; they
    * are canonicalized to the distinct undirected a<b form first.
    *
    * Scale shape: the classic degree-ordered orientation (a.k.a.
    * compact-forward). Each undirected edge is oriented from the
    * lower-(degree, id) endpoint to the higher one, so a node's oriented
    * out-degree is bounded by O(sqrt(|E|)) on any graph — the wedge
    * self-join (the quadratic step) is quadratic in the ORIENTED degree,
    * never in the raw degree of a hub. Each triangle {a,b,c} with rank
    * a<b<c is generated exactly once, as the wedge (b,c) hanging off a,
    * then confirmed by one semi-join against the oriented edge set. The
    * per-node counts are a graph property, independent of the internal
    * orientation, which is what lets an id-ordered SQL oracle replay them.
    *
    * @return (node, n_tri) over ALL nodes of the graph, zeros included
    */
  def triangleCount(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true) // degrees + orientation + closure all read it
    val deg = canon.select(col("a").as("node"))
      .unionAll(canon.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient by (deg, id): lo → hi, hi's rank key kept for wedge ordering
    val da = deg.select(col("node").as("a"), col("deg").as("dega"))
    val db = deg.select(col("node").as("b"), col("deg").as("degb"))
    val oriented = canon.join(da, Seq("a")).join(db, Seq("b"))
      .select(
        when(struct(col("dega"), col("a")) < struct(col("degb"), col("b")),
          struct(col("a").as("lo"), col("b").as("hi"),
            col("degb").as("deghi")))
          .otherwise(struct(col("b").as("lo"), col("a").as("hi"),
            col("dega").as("deghi"))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"), col("e.deghi").as("deghi"))
      .localCheckpoint(true) // wedge join reads it twice + closure probe
    // wedges off the lowest-ranked corner: unordered pair {v,w} generated
    // once by ranking the two hi endpoints
    val e1 = oriented.select(col("lo"), col("hi").as("v"), col("deghi").as("dv"))
    val e2 = oriented.select(col("lo"), col("hi").as("w"), col("deghi").as("dw"))
    val wedges = e1.join(e2, Seq("lo"))
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
      .select(col("lo").as("u"), col("v"), col("w"))
    // close the wedge: (v,w) must be an edge; it is oriented v→w because
    // (dv,v) < (dw,w) is the same total order the orientation used
    val closing = oriented.select(col("lo").as("v"), col("hi").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"), "left_semi")
    val perNode = tris.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_tri"))
    deg.select(col("node"))
      .join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) — `iters` full
    * rounds from the identity labeling. Each round every node adopts the
    * most frequent label among its in-neighbors, ties broken by the
    * SMALLEST label, so the result is a pure function of the graph — what
    * lets an unrolled SQL oracle replay it. Nodes with no in-edges keep
    * their current label.
    *
    * Scale shape: one contribution shuffle keyed by (dst, label) + a
    * map-side-combinable count + one argmax aggregation per round — the
    * PageRank plan with a mode instead of a sum. The label frame is
    * node-shaped and eagerly checkpointed per round (constant plan depth).
    *
    * @param edges directed edge list (src, dst); pass both directions for
    *              an undirected graph
    * @param stopWhenStable when true, iteration stops early once a round
    *              changes NO label (checked with a limit-1 existence
    *              probe, not a full count); `iters` stays the hard cap.
    *              False = run exactly `iters` rounds (the
    *              oracle-replayable mode).
    * @return (node, label)
    */
  def labelPropagation(edges: DataFrame, iters: Int = 2,
      stopWhenStable: Boolean = false): DataFrame =
    labelPropagationCounted(edges, iters, stopWhenStable)._1

  /** [[labelPropagation]] plus the number of rounds actually executed —
    * convergence-terminated community detection for graphs where the
    * right round count isn't knowable up front. */
  def labelPropagationCounted(edges: DataFrame, iters: Int = 2,
      stopWhenStable: Boolean = false): (DataFrame, Int) = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct()
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    var it = 0
    var stable = false
    while (it < iters && !stable) {
      val counts = e.join(labels, e("src") === labels("node"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      // argmax by (cnt desc, label asc) in ONE aggregation: max of
      // (cnt, -label) picks the highest count, then the smallest label
      val winner = counts
        .groupBy(col("dst").as("node"))
        .agg(max(struct(col("cnt"), (-col("label")).as("neg"))).as("m"))
        .select(col("node"), (-col("m.neg")).as("new_label"))
      val next = labels.join(winner, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("label")).as("label"))
        .localCheckpoint(true)
      if (stopWhenStable) {
        // any-change probe: limit(1) short-circuits the scan, so a stable
        // round costs one node-shaped join, not a full count
        val changed = next
          .join(labels.select(col("node"), col("label").as("old")), Seq("node"))
          .filter(col("label") =!= col("old"))
          .limit(1).count()
        stable = changed == 0L
      }
      labels.unpersist(blocking = false)
      labels = next
      it += 1
    }
    (labels, it)
  }

  /** Multi-source BFS shortest hop counts (unweighted SSSP) — the
    * reachability/radius primitive beside PageRank's centrality and LPA's
    * communities. Frontier-based: each round joins ONLY the
    * newly-discovered frontier against the edge frame (one equi-join
    * shuffle + one min-dedup aggregation + one anti-join against the
    * settled set), so total work is O(edges reached) summed over all
    * rounds — never O(edges × diameter). Unweighted level order means
    * first discovery IS the shortest distance, so settled nodes never
    * revisit; the anti-join is the whole correctness argument.
    * Terminates when the frontier drains (convergence, like the
    * tol-stopped PageRank/LPA); `maxIters` caps pathological diameters.
    * Unreached nodes are absent from the result (no infinity sentinel).
    *
    * @return ((node, dist) for every reached node, rounds executed)
    */
  def shortestHopsCounted(edges: DataFrame, sources: DataFrame,
      maxIters: Int = 20): (DataFrame, Int) = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst")).localCheckpoint(true)
    var dist = sources.select(col("node").cast("long").as("node"), lit(0).as("dist"))
      .distinct().localCheckpoint(true)
    var frontier = dist
    var it = 0
    var drained = false
    while (it < maxIters && !drained) {
      val next = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"), (col("dist") + 1).as("dist"))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .localCheckpoint(true)
      if (next.isEmpty) drained = true
      else {
        val merged = dist.unionAll(next).localCheckpoint(true)
        if (frontier ne dist) frontier.unpersist(blocking = false)
        dist.unpersist(blocking = false)
        dist = merged
        frontier = next
      }
      it += 1
    }
    (dist, it)
  }

  /** [[shortestHopsCounted]] without the round count. */
  def shortestHops(edges: DataFrame, sources: DataFrame, maxIters: Int = 20): DataFrame =
    shortestHopsCounted(edges, sources, maxIters)._1

  /** Full k-core decomposition (core number per node) by distributed
    * h-index iteration (Montresor/Lü: c₀(v) = deg(v), then
    * c_{t+1}(v) = min(c_t(v), H({c_t(u) : u ∈ N(v)})) until fixpoint —
    * the fixpoint IS the coreness). The h-index of the neighbor multiset
    * is order-invariant (count of desc-sorted values with value ≥ rank),
    * so any tie order inside the window produces the same number and a
    * SQL oracle can replay each round verbatim.
    *
    * Scale shape per round: ONE dst-keyed equi-join (core values onto
    * edges), ONE src-partitioned window (the desc sort is bounded by the
    * node's degree; hub skew is the same shape AQE splits for the salted
    * joins), ONE map-side-combinable count aggregation, and a node-shaped
    * checkpoint. Empirical rounds to fixpoint are O(log n)-small (4 on
    * the sf0.01 purchase graph); `maxIters` caps it and non-convergence
    * fails loudly rather than returning a partial decomposition.
    *
    * @param edges directed edge list; pass both directions for an
    *              undirected graph (every node must appear as a src)
    * @return ((node, core) with core = its k-core number, rounds run)
    */
  def coreDecompositionCounted(edges: DataFrame, maxIters: Int = 20): (DataFrame, Int) = {
    import org.apache.spark.sql.expressions.Window
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    var core = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core")).localCheckpoint(true)
    var it = 0
    var stable = false
    while (it < maxIters && !stable) {
      val nb = e.join(core.select(col("node").as("nbr"), col("core").as("nval")),
          e("dst") === col("nbr"))
        .select(e("src").as("v"), col("nval"))
      // h-index from per-(v, value) COUNTS, not a per-neighbor sort: the
      // largest h with ≥ h neighbors of value ≥ h equals
      // max over distinct values t of min(t, #{neighbors ≥ t}) — min(t,·)
      // is maximized inside each constant-count run at its top value, so
      // distinct-value thresholds suffice. The groupBy is map-side
      // combinable and the window sorts only distinct (v, nval) rows
      // (≪ E on hub nodes), vs the old row_number over every neighbor row.
      val h = nb.groupBy(col("v"), col("nval")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.partitionBy(col("v")).orderBy(col("nval").desc)))
        .groupBy(col("v").as("node"))
        .agg(max(least(col("nval"), col("cum"))).as("h"))
      val next = core.join(h, Seq("node"))
        .select(col("node"), least(col("core"), col("h")).as("core"))
        .localCheckpoint(true)
      val changed = next
        .join(core.select(col("node"), col("core").as("old")), Seq("node"))
        .filter(col("core") =!= col("old"))
        .limit(1).count()
      stable = changed == 0L
      core.unpersist(blocking = false)
      core = next
      it += 1
    }
    require(stable, s"coreDecomposition: no fixpoint after $maxIters rounds")
    (core, it)
  }

  /** [[coreDecompositionCounted]] without the round count. */
  def coreDecomposition(edges: DataFrame, maxIters: Int = 20): DataFrame =
    coreDecompositionCounted(edges, maxIters)._1

  /** Newman modularity of a labeling over a DIRECTED edge list (pass both
    * directions for an undirected graph): Q = Σ_c (e_c/2m − (deg_c/2m)²)
    * with e_c the intra-community directed edge count and deg_c the
    * community's directed degree mass. One labels-onto-edges join pair +
    * two map-side-combinable aggregations; every input is an integer, so
    * a SQL oracle replays the closed form. On `nCliq` disjoint k-cliques
    * labeled per-clique, Q = 1 − 1/nCliq exactly — the 1M smoke's oracle.
    *
    * @param labels (node, label) — every edge endpoint must be labeled
    * @return single row (n_communities, modularity rounded to 6 dp)
    */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val l = labels.select(col("node"), col("label")).localCheckpoint(true)
    val m2 = e.count().toDouble
    val lsrc = l.select(col("node").as("src"), col("label").as("lsrc"))
    val ldst = l.select(col("node").as("dst"), col("label").as("ldst"))
    val ec = e.join(lsrc, Seq("src")).join(ldst, Seq("dst"))
      .filter(col("lsrc") === col("ldst"))
      .groupBy(col("lsrc").as("label")).agg(count(lit(1)).as("ec"))
    val degc = e.join(lsrc, Seq("src"))
      .groupBy(col("lsrc").as("label")).agg(count(lit(1)).as("degc"))
    degc.join(ec, Seq("label"), "left")
      .select((coalesce(col("ec"), lit(0L)) / lit(m2) -
        (col("degc") / lit(m2)) * (col("degc") / lit(m2))).as("q"))
      .agg(count(lit(1)).as("n_communities"),
        round(sum(col("q")), 6).as("modularity"))
  }

  /** Common-neighbor Jaccard link prediction: for every node pair sharing
    * at least one neighbor, J(u,v) = |N(u)∩N(v)| / |N(u)∪N(v)|, with an
    * `is_edge` flag so callers can split "explains existing edges" from
    * "predicts missing ones". Candidate pairs come from the wedge join
    * (two-hop paths through a shared center), so the quadratic step is
    * per-CENTER-degree — on a kNN graph the degree is capped by k and the
    * whole computation is O(k²·n); on a general graph pre-drop hub
    * centers the way triangleCount's orientation does.
    *
    * @param edges undirected edge list, any direction/duplication
    * @return (a, b, jaccard, is_edge) with a < b, jaccard ≥ `threshold` */
  def linkPredictionJaccard(edges: DataFrame, threshold: Double = 0.0): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true) // read by wedges (twice), degrees and the flag join
    val und = canon.select(col("a").as("ctr"), col("b").as("nbr"))
      .unionAll(canon.select(col("b").as("ctr"), col("a").as("nbr")))
    val deg = und.groupBy(col("nbr").as("node")).agg(count(lit(1)).as("deg"))
    val wedges = und.select(col("ctr"), col("nbr").as("u"))
      .join(und.select(col("ctr"), col("nbr").as("v")), Seq("ctr"))
      .filter(col("u") < col("v"))
    val common = wedges.groupBy(col("u"), col("v")).agg(count(lit(1)).as("cn"))
    common
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
      .join(canon.select(col("a").as("u"), col("b").as("v"), lit(true).as("e")),
        Seq("u", "v"), "left")
      .select(col("u").as("a"), col("v").as("b"),
        round(col("cn").cast("double") / (col("du") + col("dv") - col("cn")), 6)
          .as("jaccard"),
        coalesce(col("e"), lit(false)).as("is_edge"))
      .filter(col("jaccard") >= threshold)
  }

  /** Multi-source WEIGHTED shortest paths by synchronous Bellman-Ford
    * relaxation — the weighted sibling of [[shortestHops]]. Each round
    * relaxes only the frontier of nodes whose distance IMPROVED last
    * round (delta-propagation): one frontier⋈edges equi-join, one
    * min-combine, one compare-join against the settled table — so work
    * per round is proportional to the improving region, and a converged
    * subgraph costs nothing. Stops when a round improves no node
    * (`maxIters` caps it; hitting the cap fails loudly rather than
    * returning partial distances — a Bellman-Ford that didn't converge
    * has no shortest-path semantics). Negative weights are rejected
    * up front for the same reason. Pass `maxIters = k` with
    * `requireConverged = false` to get the exact "shortest path using
    * ≤ k hops" semantics an unrolled SQL oracle replays.
    *
    * @param edges (src, dst, w) directed weighted edges, w ≥ 0
    * @return ((node, dist) for every reached node, rounds executed)
    */
  def weightedShortestPathsCounted(edges: DataFrame, sources: DataFrame,
      maxIters: Int = 20, requireConverged: Boolean = true): (DataFrame, Int) = {
    val e = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"), col("w").cast("double").as("w"))
      .localCheckpoint(true)
    require(e.filter(col("w") < 0).limit(1).isEmpty,
      "weightedShortestPaths: negative edge weight")
    var dist = sources.select(col("node").cast("long").as("node"),
      lit(0.0).as("dist")).distinct().localCheckpoint(true)
    var frontier = dist
    var it = 0
    var converged = false
    while (it < maxIters && !converged) {
      val cand = frontier.join(e, frontier("node") === e("src"))
        .select(e("dst").as("node"), (col("dist") + col("w")).as("nd"))
        .groupBy(col("node")).agg(min(col("nd")).as("nd"))
      val improved = cand
        .join(dist.select(col("node"), col("dist").as("old")), Seq("node"), "left")
        .filter(col("old").isNull || col("nd") < col("old"))
        .select(col("node"), col("nd").as("dist"))
        .localCheckpoint(true)
      if (improved.isEmpty) converged = true
      else {
        val merged = dist.join(improved.select(col("node")), Seq("node"), "left_anti")
          .unionAll(improved).localCheckpoint(true)
        if (frontier ne dist) frontier.unpersist(blocking = false)
        dist.unpersist(blocking = false)
        dist = merged
        frontier = improved
      }
      it += 1
    }
    require(converged || !requireConverged,
      s"weightedShortestPaths: no fixpoint after $maxIters rounds")
    (dist, it)
  }

  /** [[weightedShortestPathsCounted]] without the round count. */
  def weightedShortestPaths(edges: DataFrame, sources: DataFrame,
      maxIters: Int = 20, requireConverged: Boolean = true): DataFrame =
    weightedShortestPathsCounted(edges, sources, maxIters, requireConverged)._1

  /** HITS hubs & authorities (Kleinberg 1999): `iters` mutual-reinforcement
    * rounds over a DIRECTED edge list. Each round: authority(v) = Σ hub(u)
    * over in-neighbors u, then hub(u) = Σ authority(v) over out-neighbors,
    * each side max-normalized so scores stay in [0,1] without the usual
    * L2 norm (max of a frame of exact integer-ratios is itself exact and
    * order-invariant, which is what lets an unrolled SQL oracle replay the
    * rounds to 6 dp — an L2 norm would square-sum doubles in engine order).
    * Nodes missing from a side (no in-edges / no out-edges) score 0 there.
    *
    * Scale shape per round: two edge-keyed equi-join shuffles with
    * map-side-combinable sums (the PageRank plan run twice), two
    * single-row max frames broadcast back onto node-shaped frames, and a
    * node-shaped checkpoint bounding plan depth.
    *
    * @param edges directed edge list (src, dst)
    * @return (node, hub, auth), both rounded to 6 dp
    */
  def hits(edges: DataFrame, iters: Int = 2): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    var hub = nodes.select(col("node"), lit(1.0).as("hub"))
    var auth = nodes.select(col("node"), lit(0.0).as("auth"))
    var it = 0
    while (it < iters) {
      val araw = e.join(hub.select(col("node").as("s"), col("hub")), e("src") === col("s"))
        .groupBy(e("dst").as("node")).agg(sum(col("hub")).as("raw"))
      val amax = araw.agg(max(col("raw")).as("am"))
      auth = nodes.join(araw, Seq("node"), "left")
        .crossJoin(broadcast(amax)) // single-row max normalizer
        .select(col("node"),
          coalesce(col("raw") / col("am"), lit(0.0)).as("auth"))
        .localCheckpoint(true)
      val hraw = e.join(auth.select(col("node").as("t"), col("auth")), e("dst") === col("t"))
        .groupBy(e("src").as("node")).agg(sum(col("auth")).as("raw"))
      val hmax = hraw.agg(max(col("raw")).as("hm"))
      hub = nodes.join(hraw, Seq("node"), "left")
        .crossJoin(broadcast(hmax)) // single-row max normalizer
        .select(col("node"),
          coalesce(col("raw") / col("hm"), lit(0.0)).as("hub"))
        .localCheckpoint(true)
      it += 1
    }
    hub.join(auth, Seq("node"))
      .select(col("node"), round(col("hub"), 6).as("hub"),
        round(col("auth"), 6).as("auth"))
  }

  /** Adamic-Adar link prediction: AA(u,v) = Σ_{z ∈ N(u)∩N(v)} 1/ln(deg z) —
    * the common-neighbor score that discounts hub centers, beside
    * [[linkPredictionJaccard]]'s set-overlap flavor. The wedge join already
    * carries the common neighbor as the wedge CENTER, so the score is one
    * weighted aggregate over the same wedge frame (a center needs two
    * neighbors to form a wedge, so deg ≥ 2 and ln(deg) > 0 by
    * construction). Same canonical-edge / is_edge contract as Jaccard. */
  def adamicAdar(edges: DataFrame, minScore: Double = 0.0): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true) // read by wedges (twice), degrees and the flag join
    val und = canon.select(col("a").as("ctr"), col("b").as("nbr"))
      .unionAll(canon.select(col("b").as("ctr"), col("a").as("nbr")))
    val deg = und.groupBy(col("ctr")).agg(count(lit(1)).as("degc"))
    val wedges = und.join(deg, Seq("ctr"))
      .select(col("ctr"), col("nbr").as("u"), col("degc"))
      .join(und.select(col("ctr"), col("nbr").as("v")), Seq("ctr"))
      .filter(col("u") < col("v"))
    wedges.groupBy(col("u"), col("v"))
      .agg(round(sum(lit(1.0) / log(col("degc"))), 6).as("aa"),
        count(lit(1)).as("cn"))
      .join(canon.select(col("a").as("u"), col("b").as("v"), lit(true).as("e")),
        Seq("u", "v"), "left")
      .select(col("u").as("a"), col("v").as("b"), col("cn"), col("aa"),
        coalesce(col("e"), lit(false)).as("is_edge"))
      .filter(col("aa") >= minScore)
  }
}
