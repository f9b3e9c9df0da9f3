package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank (Page et al. 1999) — the canonical iterative graph operator,
  * joining the engine's graph family beside connected components and
  * Borůvka MST. Standard damped form over a directed edge list:
  *
  *   pr'(v) = (1−d)/N + d · Σ_{u→v} pr(u)/outdeg(u)
  *
  * Callers pass a graph with no dangling nodes (every node has at least
  * one out-edge — e.g. feed an undirected graph as both directions, as
  * q_pagerank does); `run` requires it rather than silently leaking rank
  * mass.
  *
  * Scale shape: the edge frame (with per-source out-degrees pre-joined
  * ONCE) persists across iterations and every round is a single
  * contribution shuffle keyed by dst + a map-side-combinable sum — the
  * textbook Spark PageRank plan. The rank frame is node-shaped; each
  * round eagerly localCheckpoints it, truncating lineage so plan depth
  * stays constant no matter the iteration count (the BpeTrain lesson).
  * Driver state: none — ranks never leave the cluster.
  */
object PageRank {

  /** @param edges directed edge list (src: long, dst: long), each src
    *              having ≥ 1 out-edge overall
    * @param tol   L1 convergence threshold: when > 0, iteration stops as
    *              soon as Σ|pr' − pr| < tol (one scalar aggregate per
    *              round — the rank frame itself never reaches the
    *              driver); `iters` stays the hard cap. 0 = run exactly
    *              `iters` rounds (the oracle-replayable mode).
    * @return (node, pr) after the damped iterations from uniform 1/N,
    *         pr rounded to `scale` decimals */
  def run(edges: DataFrame, iters: Int = 3, damping: Double = 0.85,
      scale: Int = 6, tol: Double = 0.0): DataFrame =
    runCounted(edges, iters, damping, scale, tol)._1

  /** [[run]] plus the number of rounds actually executed — the product
    * knob a real 100 TB graph job needs (`tol` stops on the measured L1
    * rank delta instead of trusting a guessed round count). */
  def runCounted(edges: DataFrame, iters: Int = 3, damping: Double = 0.85,
      scale: Int = 6, tol: Double = 0.0): (DataFrame, Int) = {
    // materialize the edge list FIRST: nodes, the dangling check and the
    // degree join all read it, and an expensive upstream plan (a big join
    // feeding the graph) must run once, not three times
    val edgesCk = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = edgesCk.select(col("src").as("node"))
      .union(edgesCk.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val n = nodes.count()
    require(n > 0, "empty graph")
    val outDeg = edgesCk.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val dangling = nodes.join(outDeg, nodes("node") === outDeg("src"), "left_anti")
    require(dangling.isEmpty,
      s"dangling nodes (no out-edges) leak rank mass: ${dangling.take(5).mkString(",")}")
    // out-degrees ride the persisted edge frame: joined once, not per round
    val contribEdges = edgesCk.join(outDeg, Seq("src"))
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint(true)
    var pr = nodes.select(col("node"), (lit(1.0) / n).as("pr"))
      .localCheckpoint(true)
    var it = 0
    var converged = false
    while (it < iters && !converged) {
      val mass = contribEdges
        .join(pr, contribEdges("src") === pr("node"))
        .select(col("dst").as("node"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("mass"))
      // left join from the full node set: a node with out-edges but no
      // IN-edges still holds its teleport share, it must not vanish
      val next = pr.select(col("node")).join(mass, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n)
            + lit(damping) * coalesce(col("mass"), lit(0.0))).as("pr"))
        .localCheckpoint(true) // truncate lineage: constant plan depth per round
      if (tol > 0.0) {
        // L1 delta as ONE scalar aggregate over the node-shaped join of
        // consecutive rank frames — the only row the driver ever sees
        val delta = next.join(pr.select(col("node"), col("pr").as("prev")), Seq("node"))
          .agg(sum(abs(col("pr") - col("prev"))).as("d"))
          .head.getDouble(0)
        converged = delta < tol
      }
      pr.unpersist(blocking = false)
      pr = next
      it += 1
    }
    (pr.select(col("node"), round(col("pr"), scale).as("pr")), it)
  }

  /** Personalized PageRank: the teleport mass restarts to the SEED set
    * instead of uniformly — the similarity-to-a-query-set ranking that
    * drives graph-based recommendation and dedup-cluster expansion:
    *
    *   pr'(v) = (1−d)·r(v) + d · Σ_{u→v} pr(u)/outdeg(u),
    *   r(v) = 1/|S| for v ∈ S, else 0;  pr₀ = r.
    *
    * Same contract and scale shape as [[run]] (no dangling nodes, one
    * dst-keyed contribution shuffle per round, node-shaped checkpointed
    * rank frame); the restart vector is a node-shaped left join computed
    * once. Seeds not in the graph fail loudly — silently dropping them
    * would renormalize the restart mass to a different query set.
    *
    * @param seeds one column `node`; duplicates ignored */
  def runPersonalized(edges: DataFrame, seeds: DataFrame, iters: Int = 3,
      damping: Double = 0.85, scale: Int = 6): DataFrame = {
    val edgesCk = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = edgesCk.select(col("src").as("node"))
      .union(edgesCk.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val sd = seeds.select(col("node")).distinct().localCheckpoint(true)
    val nSeeds = sd.count()
    require(nSeeds > 0, "empty seed set")
    val unknown = sd.join(nodes, Seq("node"), "left_anti")
    require(unknown.isEmpty,
      s"seeds not in graph: ${unknown.take(5).mkString(",")}")
    val outDeg = edgesCk.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val dangling = nodes.join(outDeg, nodes("node") === outDeg("src"), "left_anti")
    require(dangling.isEmpty,
      s"dangling nodes (no out-edges) leak rank mass: ${dangling.take(5).mkString(",")}")
    val contribEdges = edgesCk.join(outDeg, Seq("src"))
      .select(col("src"), col("dst"), col("outdeg"))
      .localCheckpoint(true)
    // restart vector: node-shaped, computed once, reused every round
    val restart = nodes
      .join(sd.select(col("node"), lit(1.0).as("is_seed")), Seq("node"), "left")
      .select(col("node"),
        (coalesce(col("is_seed"), lit(0.0)) / nSeeds).as("r"))
      .localCheckpoint(true)
    var pr = restart.select(col("node"), col("r").as("pr")).localCheckpoint(true)
    var it = 0
    while (it < iters) {
      val mass = contribEdges
        .join(pr, contribEdges("src") === pr("node"))
        .select(col("dst").as("node"), (col("pr") / col("outdeg")).as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("mass"))
      val next = restart.join(mass, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) * col("r")
            + lit(damping) * coalesce(col("mass"), lit(0.0))).as("pr"))
        .localCheckpoint(true)
      pr.unpersist(blocking = false)
      pr = next
      it += 1
    }
    pr.select(col("node"), round(col("pr"), scale).as("ppr"))
  }
}
