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
  * edges, the accumulated forest) is rotated through eagerly-materialized
  * frames so no blocks outlive their round. Edges carry their endpoints'
  * current component ids, so contraction relabels the edge frame directly —
  * no O(V) vertex-label frame exists at any point.
  */
object BoruvkaMst {

  /** @param edges (src: long, dst: long, weight: double), undirected; self
    *              loops and duplicate edges tolerated (min weight wins)
    * @return minimum spanning forest (src, dst, weight), src < dst — one
    *         tree per connected component, exactly the Kruskal result under
    *         the same (weight, lo, hi) tie order
    */
  def run(spark: SparkSession, edges: DataFrame, maxRounds: Int = 40,
      driverCap: Long = 500000): DataFrame =
    runCounted(spark, edges, maxRounds, driverCap)._1

  /** As [[run]], also returning the number of contraction rounds executed —
    * plan-regression tests assert the O(log V) bound with it (0 on the
    * below-cap driver path).
    *
    * Size gate (VERDICT r11 #3, mirroring `DistributedDendrogram
    * .mergeEvents`' driverCap probe): at or below `driverCap` candidate
    * edges the forest comes from a tagged driver Kruskal under the SAME
    * (weight, lo, hi) total order — identical output by construction
    * (BoruvkaPropertySpec pins distributed == driver Kruskal on
    * duplicate-weight multigraphs), but milliseconds instead of
    * ~log V × 5 shuffle-stage jobs at gate-scale inputs. `driverCap = 0`
    * forces the distributed path (specs, smokes). The probe's LIMIT cap+1
    * early-terminates, so the above-cap path pays a bounded prefix scan,
    * not a full extra pass. */
  def runCounted(spark: SparkSession, edges: DataFrame, maxRounds: Int = 40,
      driverCap: Long = 500000): (DataFrame, Int) = {
    val eRot = new graft.CheckpointRotator
    val forestRot = new graft.CheckpointRotator
    // normalize to lo < hi once; (weight, lo, hi) is the total edge order.
    // Materialized eagerly so the gate probe and whichever path wins read
    // cached blocks instead of recomputing the caller's candidate plan
    // (per-cell kernels + boundary joins in the HDBSCAN caller) per action.
    val normalized = eRot.rotate(edges
      .select(least(col("src"), col("dst")).as("lo"),
        greatest(col("src"), col("dst")).as("hi"), col("weight"))
      .filter(col("lo") =!= col("hi"))
      .groupBy(col("lo"), col("hi")).agg(min(col("weight")).as("weight")))
    val probeCap = math.min(driverCap, Int.MaxValue - 1L).toInt
    if (driverCap > 0 && normalized.limit(probeCap + 1).count() <= driverCap) {
      import spark.implicits._
      val rows = graft.GraftTags.tagged(spark, graft.GraftTags.DriverCollectTag) {
        normalized.as[(Long, Long, Double)].collect()
      }
      eRot.close(); forestRot.close()
      return (spark.createDataset(driverKruskal(rows).toSeq)
        .toDF("src", "dst", "weight"), 0)
    }
    // Carry each endpoint's current component alongside (identity at start).
    var e = eRot.rotate(normalized
      .select(col("lo"), col("hi"), col("weight"),
        col("lo").as("ca"), col("hi").as("cb")))

    var forest: DataFrame = null
    var rounds = 0
    var done = e.isEmpty
    while (rounds < maxRounds && !done) {
      // min outgoing edge per component under the total order — narrow
      // min_by aggregate with map-side combine, seen from both endpoints.
      // Materialized once per round: both `picked` and `parent0` consume it,
      // and without the rotate the union+groupBy over the full edge frame
      // (the heaviest per-round shuffle) would run twice. Its row count
      // doubles as the round's liveness check (0 picks ⟺ no cross edges).
      val jumpRot = new graft.CheckpointRotator
      val pick = struct(col("weight"), col("lo"), col("hi"),
        col("ca"), col("cb")).as("e")
      val minPick = jumpRot.rotate(e.select(col("ca").as("comp"), pick)
        .unionAll(e.select(col("cb").as("comp"), pick))
        .groupBy(col("comp")).agg(min(col("e")).as("e")))
      val nComps = minPick.count()
      if (nComps == 0) { done = true; jumpRot.close() }
      else {
        val picked = minPick
          .select(col("e.lo").as("lo"), col("e.hi").as("hi"),
            col("e.weight").as("weight"))
          .distinct() // an edge picked by both its components appears twice

        forest = forestRot.rotate(
          if (forest == null) picked else forest.unionAll(picked))

        // contract the pick graph. It is FUNCTIONAL (each component has
        // exactly one outgoing pick, and mutual picks are always the same
        // edge under the total order — if c's min to d and d's min to c
        // differed, the lighter one would be incident to both and win both),
        // so instead of the general star-contraction CC we root each 2-cycle
        // at its min member and pointer-jump. Each materialized step squares
        // the (already-squared) pointer, and the loop exits at the observed
        // fixpoint — NN-pick chains are short on real data, so this is
        // usually 1-2 materializations — with the deterministic
        // ceil(log2 #comps) worst-case bound as a backstop.
        def step(d: DataFrame): DataFrame = d.as("a")
          .join(d.as("b"), col("a.parent") === col("b.comp"))
          .select(col("a.comp").as("comp"), col("b.parent").as("parent"))
        val parent0 = minPick.select(col("comp"),
          when(col("e.ca") === col("comp"), col("e.cb"))
            .otherwise(col("e.ca")).as("parent"))
        var p = jumpRot.rotate(parent0.as("x")
          .join(parent0.as("y"), col("x.parent") === col("y.comp"))
          .select(col("x.comp").as("comp"),
            when(col("y.parent") === col("x.comp"),
              least(col("x.comp"), col("x.parent")))
              .otherwise(col("x.parent")).as("parent")))
        val jumps = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, nComps - 1)) + 1
        var converged = false
        var j = 1L
        while (!converged && j <= jumps) {
          val next = jumpRot.rotate(step(step(p)))
          converged = next.as("x").join(p.as("y"), col("x.comp") === col("y.comp"))
            .filter(col("x.parent") =!= col("y.parent")).isEmpty
          p = next
          j += 2
        }
        val contracted = p
          .select(col("comp").as("old_comp"), col("parent").as("new_comp"))

        // relabel surviving edges directly through the contraction map and
        // drop the ones now inside a component. A vertex-level label frame
        // is unnecessary (and its build was a full-edge-frame distinct):
        // any endpoint component with a surviving cross edge had an
        // outgoing edge this round, so it appears in the contraction map;
        // components that finished keep their id via the left-join coalesce.
        e = eRot.rotate(e
          .join(contracted.withColumnRenamed("old_comp", "ca")
            .withColumnRenamed("new_comp", "na"), Seq("ca"), "left")
          .join(contracted.withColumnRenamed("old_comp", "cb")
            .withColumnRenamed("new_comp", "nb"), Seq("cb"), "left")
          .select(col("lo"), col("hi"), col("weight"),
            coalesce(col("na"), col("ca")).as("ca"),
            coalesce(col("nb"), col("cb")).as("cb"))
          .filter(col("ca") =!= col("cb")))
        jumpRot.close()
        rounds += 1
      }
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
    eRot.close(); forestRot.close()
    (out, rounds)
  }

  /** Driver Kruskal over pre-normalized (lo, hi, weight) rows under the
    * (weight, lo, hi) total order — the below-cap fast path's kernel.
    * Sparse ids are index-mapped so the union-find is O(V) not O(max id). */
  private def driverKruskal(rows: Array[(Long, Long, Double)])
      : Array[(Long, Long, Double)] = {
    val ids = scala.collection.mutable.HashMap.empty[Long, Int]
    def idx(v: Long): Int = ids.getOrElseUpdate(v, ids.size)
    val triples = rows.map { case (lo, hi, w) => (idx(lo), idx(hi), lo, hi, w) }
    java.util.Arrays.sort(triples, Ordering.by[(Int, Int, Long, Long, Double), (Double, Long, Long)](t => (t._5, t._3, t._4)))
    val uf = new graft.kernel.UnionFind(ids.size)
    triples.iterator.collect {
      case (a, b, lo, hi, w) if uf.find(a) != uf.find(b) =>
        uf.union(a, b); (lo, hi, w)
    }.toArray
  }
}
