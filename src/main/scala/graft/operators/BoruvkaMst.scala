package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed Borůvka minimum-spanning-tree/forest over an edge DataFrame —
  * the unbounded form of the engine's global MST merge (the paper's Phase-2
  * shape; the reference aborted its global phase at `Main.java:408`, and our
  * `Hdbscan.exactGlobal` merges with a driver-side Kruskal bounded by
  * `maxExactPoints`).
  *
  * Per round, every component selects its minimum outgoing edge under the
  * TOTAL order (weight, lo, hi) — a total order makes each component's
  * choice unique, so the selected set is acyclic apart from mutual picks
  * (removed by distinct) — then components contract via
  * [[ConnectedComponents]] (log-round star contraction). Component count at
  * least halves per round ⇒ O(log V) Borůvka rounds, each a constant number
  * of shuffles over narrow (lo, hi, weight, comp) rows. Nothing is ever
  * collected to the driver; per-round state (the surviving cross-component
  * edges, the vertex labels, the accumulated forest) is rotated through
  * eagerly-materialized frames so no blocks outlive their round.
  */
object BoruvkaMst {

  /** @param edges (src: long, dst: long, weight: double), undirected; self
    *              loops and duplicate edges tolerated (min weight wins)
    * @return minimum spanning forest (src, dst, weight), src < dst — one
    *         tree per connected component, exactly the Kruskal result under
    *         the same (weight, lo, hi) tie order
    */
  def run(spark: SparkSession, edges: DataFrame, maxRounds: Int = 40): DataFrame = {
    val eRot = new graft.CheckpointRotator
    val labelRot = new graft.CheckpointRotator
    val forestRot = new graft.CheckpointRotator
    // normalize to lo < hi once; (weight, lo, hi) is the total edge order.
    // Carry each endpoint's current component alongside (identity at start).
    var e = eRot.rotate(edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"), col("weight"))
      .filter(col("lo") =!= col("hi"))
      .groupBy(col("lo"), col("hi")).agg(min(col("weight")).as("weight"))
      .select(col("lo"), col("hi"), col("weight"),
        col("lo").as("ca"), col("hi").as("cb")))

    var labels: DataFrame = null // (vertex, comp); lazily created in round 1
    var forest: DataFrame = null
    var rounds = 0
    var done = e.isEmpty
    while (rounds < maxRounds && !done) {
      // min outgoing edge per component under the total order — narrow
      // min_by aggregate with map-side combine, seen from both endpoints.
      // Materialized once per round: both `picked` and `parent0` consume it,
      // and without the rotate the union+groupBy over the full edge frame
      // (the heaviest per-round shuffle) would run twice.
      val jumpRot = new graft.CheckpointRotator
      val pick = struct(col("weight"), col("lo"), col("hi"),
        col("ca"), col("cb")).as("e")
      val minPick = jumpRot.rotate(e.select(col("ca").as("comp"), pick)
        .unionAll(e.select(col("cb").as("comp"), pick))
        .groupBy(col("comp")).agg(min(col("e")).as("e")))
      val picked = minPick
        .select(col("e.lo").as("lo"), col("e.hi").as("hi"),
          col("e.weight").as("weight"), col("e.ca").as("ca"), col("e.cb").as("cb"))
        .distinct() // an edge picked by both its components appears twice

      forest = forestRot.rotate(
        if (forest == null) picked.select(col("lo"), col("hi"), col("weight"))
        else forest.unionAll(picked.select(col("lo"), col("hi"), col("weight"))))

      // contract the pick graph. It is FUNCTIONAL (each component has
      // exactly one outgoing pick, and mutual picks are always the same
      // edge under the total order — if c's min to d and d's min to c
      // differed, the lighter one would be incident to both and win both),
      // so instead of the general star-contraction CC we root each 2-cycle
      // at its min member and pointer-jump: parent ← parent(parent),
      // ceil(log2 #comps)+1 rounds — one narrow self-join per round, no
      // convergence detection needed (the bound is deterministic).
      val parent0 = minPick.select(col("comp"),
        when(col("e.ca") === col("comp"), col("e.cb"))
          .otherwise(col("e.ca")).as("parent"))
      var p = jumpRot.rotate(parent0.as("x")
        .join(parent0.as("y"), col("x.parent") === col("y.comp"))
        .select(col("x.comp").as("comp"),
          when(col("y.parent") === col("x.comp"),
            least(col("x.comp"), col("x.parent")))
            .otherwise(col("x.parent")).as("parent")))
      val nComps = p.count()
      val jumps = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, nComps - 1)) + 1
      for (_ <- 1L to jumps) {
        p = jumpRot.rotate(p.as("a")
          .join(p.as("b"), col("a.parent") === col("b.comp"))
          .select(col("a.comp").as("comp"), col("b.parent").as("parent")))
      }
      val contracted = p.select(col("comp").as("old_comp"), col("parent").as("new_comp"))
      val base =
        if (labels == null)
          e.select(col("lo").as("vertex"), col("ca").as("comp"))
            .unionAll(e.select(col("hi").as("vertex"), col("cb").as("comp")))
            .distinct()
        else labels
      labels = labelRot.rotate(base
        .join(contracted, col("comp") === col("old_comp"), "left")
        .select(col("vertex"), coalesce(col("new_comp"), col("comp")).as("comp")))
      jumpRot.close() // labels is materialized; the jump frames are consumed

      // relabel surviving edges, dropping the ones now inside a component
      e = eRot.rotate(e.select(col("lo"), col("hi"), col("weight"))
        .join(labels.withColumnRenamed("vertex", "lo").withColumnRenamed("comp", "ca"), "lo")
        .join(labels.withColumnRenamed("vertex", "hi").withColumnRenamed("comp", "cb"), "hi")
        .filter(col("ca") =!= col("cb"))
        .select(col("lo"), col("hi"), col("weight"), col("ca"), col("cb")))
      done = e.isEmpty
      rounds += 1
    }
    val out = forest match {
      case null =>
        import spark.implicits._
        Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
      case f =>
        val (materialized, _) = org.apache.spark.sql.GraftShim.materialize(
          f.select(col("lo").as("src"), col("hi").as("dst"), col("weight")))
        materialized
    }
    eRot.close(); labelRot.close(); forestRot.close()
    out
  }
}
