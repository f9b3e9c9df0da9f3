package graft

import org.apache.spark.sql.functions._

/** Scale smoke for the round-8 operator families: PageRank on a 1M-edge
  * graph, count-min over a 10M-token stream, A-ES weighted sampling
  * over 10M rows, triangle counting on a 1.4M-edge graph with a provably
  * exact planted count (disjoint K3s + matching noise + a 50k-degree hub
  * the orientation must neutralize), and 2-round label propagation over
  * 10k disjoint 20-cliques with an exact expected labeling — the same
  * env-gated pattern as the other Million smokes, asserting the
  * invariants that must survive scale (rank-mass conservation and hub
  * dominance; sketch guarantees at a vocabulary the gate corpus never
  * reaches; deterministic selection at TakeOrdered scale; exact closure
  * counts under skew).
  */
object ScaleOpsMillionSmoke {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.localBuilder("graft-scaleops-million", 32)
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, n)
    spark.stop()
  }

  /** Body shared by [[main]] and the opt-in SmokeSuite. */
  def run(spark: org.apache.spark.sql.SparkSession, n: Long): Unit = {
    // ---- PageRank: n random edges over n/5 nodes + a planted hub ----
    val nNodes = math.max(n / 5, 100L)
    var t0 = System.nanoTime()
    val raw = spark.range(n).select(
      pmod(xxhash64(col("id"), lit(1L)), lit(nNodes)).as("src"),
      pmod(xxhash64(col("id"), lit(2L)), lit(nNodes)).as("dst"))
      .filter(col("src") =!= col("dst"))
    // planted hub: the first 10k ids also point at node 0
    val hub = spark.range(1L, 10001L)
      .select(pmod(xxhash64(col("id"), lit(3L)), lit(nNodes - 1) ).+(1L).as("src"),
        lit(0L).as("dst"))
      .filter(col("src") =!= col("dst"))
    val pairs = raw.unionAll(hub)
    val edges = pairs.unionAll(pairs.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val pr = graft.operators.PageRank.run(edges, iters = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nRanked = pr.count()
    val prSecs = (System.nanoTime() - t0) / 1e9
    val mass = pr.agg(sum(col("pr"))).head().getDouble(0)
    val hubPr = pr.filter(col("node") === 0L).head().getDouble(1)
    val medianPr = pr.stat.approxQuantile("pr", Array(0.5), 0.01)(0)
    println(f"[smoke] pagerank: $nRanked nodes ranked in $prSecs%.1f s; " +
      f"mass=$mass%.6f hub=$hubPr%.2e median=$medianPr%.2e")
    // mass is conserved exactly pre-rounding (no dangling nodes); the
    // visible drift is the 6 dp output rounding × nNodes (≤ 5e-7 each)
    assert(math.abs(mass - 1.0) < 5e-3, s"rank mass leaked: $mass")
    assert(hubPr > 20 * medianPr, s"planted hub not dominant: $hubPr vs median $medianPr")
    pr.unpersist(blocking = false)

    // ---- count-min over 10×n zipf-ish tokens, 100k-word vocabulary ----
    t0 = System.nanoTime()
    import spark.implicits._
    val vocab = 100000L
    // rank r appears ∝ 1/(r+1): r = floor(vocab / (1 + uniform(0, vocab)))
    val toks = spark.range(n * 10).select(
      concat(lit("w"), floor(lit(vocab.toDouble) /
        (pmod(xxhash64(col("id")), lit(vocab)).cast("double") + 1.0)).cast("long"))
        .as("tok"))
    val depth = 4
    val width = 8192
    val sketch = toks.as[String]
      .select(new graft.operators.Sketches.CountMin(depth, width).toColumn).head()
    val cmsSecs = (System.nanoTime() - t0) / 1e9
    val total = sketch(depth * width)
    val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(20).collect()
    val bound = math.ceil(math.E * total / width).toLong
    top.foreach { r =>
      val est = graft.operators.Sketches.CountMin.estimate(sketch, depth, width, r.getString(0))
      assert(est >= r.getLong(1), s"${r.getString(0)} undercounted")
      assert(est <= r.getLong(1) + bound, s"${r.getString(0)} overshot: $est vs ${r.getLong(1)}")
    }
    println(f"[smoke] count-min: ${n * 10} tokens sketched in $cmsSecs%.1f s; " +
      f"total=$total top-20 within ceil(eN/w)=$bound")

    // ---- A-ES weighted sample over 10×n rows ----
    t0 = System.nanoTime()
    val rows = spark.range(n * 10).select(col("id"),
      (pmod(xxhash64(col("id"), lit(9L)), lit(1000L)) + 1L).as("w"))
    val sel1 = graft.operators.Sampling.weightedSample(rows, "id", "w", k = 1000)
      .select(col("id")).as[Long].collect().sorted
    val wsSecs = (System.nanoTime() - t0) / 1e9
    val sel2 = graft.operators.Sampling.weightedSample(rows.repartition(97), "id", "w", k = 1000)
      .select(col("id")).as[Long].collect().sorted
    assert(sel1.sameElements(sel2), "weighted selection must not depend on partitioning")
    // weight bias: mean weight of the sample well above the population mean (~500)
    val meanW = rows.join(sel1.toSeq.toDF("id"), Seq("id"))
      .agg(avg(col("w"))).head().getDouble(0)
    assert(meanW > 600, s"weight bias too weak: mean sampled w = $meanW")
    println(f"[smoke] weighted-sample: top-1000 of ${n * 10} rows in $wsSecs%.1f s; " +
      f"mean sampled weight $meanW%.0f (population ~500)")

    // ---- triangle counting: n/10 planted K3s + n matching edges + a hub ----
    // The construction keeps the exact count provable at any scale:
    // disjoint K3 blocks (nodes 3i,3i+1,3i+2) contribute exactly one
    // triangle each; the noise is a MATCHING from n fresh degree-1 nodes
    // (no two noise edges share a fresh endpoint → no triangle can route
    // through one); the planted hub (degree n/20) fans out to node 3i of
    // DISTINCT K3s (no two hub-neighbors adjacent → zero new triangles,
    // and the degree-ordered orientation gives the hub out-degree 0 — the
    // wedge join never quadratic in the hub's raw degree).
    t0 = System.nanoTime()
    val nTri = math.max(n / 10, 1000L)
    val k3 = spark.range(nTri).select(
      explode(array(
        struct((col("id") * 3).as("src"), (col("id") * 3 + 1).as("dst")),
        struct((col("id") * 3 + 1).as("src"), (col("id") * 3 + 2).as("dst")),
        struct((col("id") * 3).as("src"), (col("id") * 3 + 2).as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
    val fresh = 1000000000L
    val matching = spark.range(n).select(
      (col("id") + fresh).as("src"), pmod(col("id"), lit(nTri * 3)).as("dst"))
    val hubId = fresh - 1
    val hubEdges = spark.range(math.min(nTri, n / 20)).select(
      lit(hubId).as("src"), (col("id") * 3).as("dst"))
    val triIn = k3.unionAll(matching).unionAll(hubEdges)
    val tc = graft.operators.GraphOps.triangleCount(triIn)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val triTotal = tc.agg(sum(col("n_tri"))).head().getLong(0)
    val triSecs = (System.nanoTime() - t0) / 1e9
    val k3Wrong = tc.filter(col("node") < nTri * 3 && col("n_tri") =!= 1L).count()
    val otherWrong = tc.filter(col("node") >= nTri * 3 && col("n_tri") =!= 0L).count()
    println(f"[smoke] triangles: ${nTri * 3 + n} edges (+hub) closed in $triSecs%.1f s; " +
      f"sum=$triTotal (expect ${3 * nTri}) wrong-k3=$k3Wrong wrong-noise=$otherWrong")
    assert(triTotal == 3 * nTri, s"triangle mass: $triTotal vs ${3 * nTri}")
    assert(k3Wrong == 0L && otherWrong == 0L, "per-node triangle counts off")
    tc.unpersist(blocking = false)

    // ---- label propagation: n/100 disjoint 20-cliques, 2 sync rounds ----
    // On a clique, round 1 sends every non-min node to the min label and
    // the min node to the second-min; round 2 returns everyone (min node
    // included) to the min — so 2 rounds must label EVERY node with its
    // clique's min, exactly, at any clique count.
    t0 = System.nanoTime()
    val nCliq = math.max(n / 100, 100L)
    val pairsUnd = spark.range(nCliq * 400).select(
      (col("id") / 400).cast("long").as("c"),
      ((col("id") / 20) % 20).cast("long").as("a"),
      (col("id") % 20).cast("long").as("b"))
      .filter(col("a") < col("b"))
      .select((col("c") * 20 + col("a")).as("src"), (col("c") * 20 + col("b")).as("dst"))
    val lpaEdges = pairsUnd.unionAll(pairsUnd.select(col("dst").as("src"), col("src").as("dst")))
    val lpa = graft.operators.GraphOps.labelPropagation(lpaEdges, iters = 2)
    val lpaWrong = lpa.filter(col("label") =!= (col("node") - pmod(col("node"), lit(20L)))).count()
    val lpaN = lpa.count()
    val lpaSecs = (System.nanoTime() - t0) / 1e9
    println(f"[smoke] lpa: $lpaN nodes / ${nCliq * 190 * 2} directed edges, 2 rounds in " +
      f"$lpaSecs%.1f s; off-min labels=$lpaWrong")
    assert(lpaN == nCliq * 20, s"node count: $lpaN")
    assert(lpaWrong == 0L, s"$lpaWrong nodes not on their clique min")

    // modularity of that labeling has the exact closed form 1 − 1/nCliq
    // (all edges intra, every community holding 1/nCliq of the degree mass)
    t0 = System.nanoTime()
    val modRow = graft.operators.GraphOps.modularity(lpaEdges, lpa).head()
    val modSecs = (System.nanoTime() - t0) / 1e9
    val wantQ = 1.0 - 1.0 / nCliq
    println(f"[smoke] modularity: ${modRow.getLong(0)} communities, " +
      f"Q=${modRow.getDouble(1)}%.6f (closed form $wantQ%.6f) in $modSecs%.1f s")
    assert(modRow.getLong(0) == nCliq, s"community count: ${modRow.getLong(0)}")
    assert(math.abs(modRow.getDouble(1) - wantQ) < 1e-4,
      s"modularity off the clique closed form: ${modRow.getDouble(1)} vs $wantQ")

    // ---- skew join, MEASURED: salted vs AQE-split vs naked shuffle ----
    // §9's skew strategy claims get wall-clock numbers here instead of
    // plan pins alone: a 4n-row fact with ONE key holding 60% of the rows
    // joins a 100k-key dim, merge-hinted both ways (the dim WOULD
    // broadcast at this size; at 100 TB it wouldn't — the hint replays
    // the big-dim regime). Unsalted, the hot key lands on a single
    // sort-merge task; salted it spreads over 16; AQE's skew split (with
    // thresholds lowered into this data size's range) recovers most of
    // the same win without rewriting the query. Run order puts SALTED
    // first so it pays the codegen warmup — the comparison is biased
    // against the claim being proven.
    val nKeys = 100000L
    // wide-ish rows: a 100 TB fact's skew pain is byte-bound, not
    // row-bound — the 64-char payload puts the hot partition in the
    // hundreds of MB at the 1M smoke size
    val skewFact = spark.range(4 * n).select(
      when(pmod(xxhash64(col("id"), lit(11L)), lit(10L)) < 6, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(12L)), lit(nKeys))).as("k"),
      col("id").as("v"),
      concat(lit("p" * 64), col("id")).as("pad"))
    val skewDim = spark.range(nKeys).select(col("id").as("k"),
      pmod(col("id"), lit(997L)).as("dv"))
    def joinRun(salted: Boolean, slice: Long = 0L): (Double, Long, Long) = {
      val f0 = if (slice > 0) skewFact.filter(col("v") < slice) else skewFact
      val t = System.nanoTime()
      val res =
        if (!salted)
          f0.join(skewDim.hint("merge"), Seq("k"))
            .agg(count(lit(1)).as("cnt"), sum(col("dv")).as("s"),
              max(length(col("pad")))).head()
        else {
          val saltN = 16
          val f2 = f0.withColumn("salt", pmod(xxhash64(col("v")), lit(saltN.toLong)))
          val d2 = skewDim.withColumn("salt",
            explode(array((0 until saltN).map(i => lit(i.toLong)): _*)))
          f2.join(d2.hint("merge"), Seq("k", "salt"))
            .agg(count(lit(1)).as("cnt"), sum(col("dv")).as("s"),
              max(length(col("pad")))).head()
        }
      ((System.nanoTime() - t) / 1e9, res.getLong(0), res.getLong(1))
    }
    def withConfs(kvs: (String, String)*)(body: => (Double, Long, Long)) = {
      val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      kvs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    // codegen/JIT warmup on a 1% slice so no measured path pays it
    withConfs("spark.sql.adaptive.skewJoin.enabled" -> "false") {
      joinRun(salted = false, slice = math.max(n / 25, 1000L))
      joinRun(salted = true, slice = math.max(n / 25, 1000L))
    }
    val (saltedS, cS, sS) =
      withConfs("spark.sql.adaptive.skewJoin.enabled" -> "false")(joinRun(salted = true))
    val (aqeS, cA, sA) = withConfs(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16m",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8m")(joinRun(salted = false))
    val (nakedS, cN, sN) =
      withConfs("spark.sql.adaptive.skewJoin.enabled" -> "false")(joinRun(salted = false))
    println(f"[smoke] skew-join (${4 * n} rows, hot key 60%%): " +
      f"salted=$saltedS%.1f s aqe-split=$aqeS%.1f s naked=$nakedS%.1f s")
    assert(cS == cN && sS == sN, s"salted join changed the result: ($cS,$sS) vs ($cN,$sN)")
    assert(cA == cN && sA == sN, s"AQE split changed the result: ($cA,$sA) vs ($cN,$sN)")
    // the wall-clock claim is asserted at the real smoke size — below it
    // the straggler doesn't dominate constant costs and the numbers are
    // printed for information only
    if (n >= 500000L)
      assert(saltedS < nakedS,
        f"salting must beat the naked shuffle on the planted hot key: $saltedS%.1f vs $nakedS%.1f")

    // ---- multi-source BFS: n-node 10-ary planted tree, closed-form levels ----
    // node v>0 has parent (v-1)/10, so dist(v) = tree depth — the level
    // histogram is exactly 10^d for full levels and the frontier drains in
    // ~log10(n) rounds: an exact global oracle for the convergence path.
    t0 = System.nanoTime()
    val treeEdges0 = spark.range(1L, n)
      .select(floor((col("id") - 1) / 10L).cast("long"), col("id")).toDF("src", "dst")
    val treeEdges = treeEdges0
      .unionAll(treeEdges0.select(col("dst").as("src"), col("src").as("dst"))) // bidirect
    val (bfsDist, bfsRounds) = graft.operators.GraphOps.shortestHopsCounted(
      treeEdges, spark.range(1).select(lit(0L).as("node")), maxIters = 15)
    val levels = bfsDist.groupBy(col("dist")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("dist"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
    val bfsSecs = (System.nanoTime() - t0) / 1e9
    println(f"[smoke] bfs: $n-node 10-ary tree in $bfsSecs%.1f s, $bfsRounds rounds; " +
      s"levels=${levels.take(8).mkString(",")}")
    assert(levels.map(_._2).sum == n, "every tree node must be reached")
    var expectStart = 0L
    levels.foreach { case (d, cnt) =>
      // level d spans ids [(10^d - 1)/9, (10^(d+1) - 1)/9) ∩ [0, n)
      val lo = expectStart
      val hi = math.min(lo * 10 + 1, n)
      assert(cnt == hi - lo, s"level $d: got $cnt nodes, closed form says ${hi - lo}")
      expectStart = hi
    }
    assert(bfsRounds <= levels.length + 1,
      s"frontier must drain in depth+1 rounds, ran $bfsRounds for ${levels.length} levels")

    // ---- CDC chunking: n/5 docs + shifted copies, boundary-alignment law ----
    // every chunk of the original EXCEPT possibly the first must reappear
    // verbatim in the 4-char-shifted copy (trailing-window boundaries are
    // content-anchored), and chunks must tile each doc exactly.
    t0 = System.nanoTime()
    val nDocs = math.max(n / 5, 1000L)
    val syn = spark.range(nDocs).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 30).map(k =>
        substring(base64(sha2(concat(col("id").cast("string"), lit(s"-$k")), 256)), 1, 7)): _*)
        .as("text"))
    val shifted = syn.select((col("doc_id") + nDocs).as("doc_id"),
      concat(lit("PFX "), col("text")).as("text"))
    val chunks = graft.operators.TextOps.cdcChunks(syn.unionAll(shifted))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tiling = chunks.groupBy(col("doc_id"))
      .agg(sum(col("chunk_len")).as("covered"), count(lit(1)).as("k"))
      .join(syn.unionAll(shifted).select(col("doc_id"), length(col("text")).as("len")), Seq("doc_id"))
      .filter(col("covered") =!= col("len")).count()
    assert(tiling == 0L, s"$tiling docs where CDC chunks do not tile the text")
    val origChunks = chunks.filter(col("doc_id") < nDocs)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_text"))
    val shiftChunks = chunks.filter(col("doc_id") >= nDocs)
      .select((col("doc_id") - nDocs).as("doc_id"), col("chunk_text").as("sh_text"))
    val unshared = origChunks.filter(col("chunk_idx") > 0)
      .join(shiftChunks, origChunks("doc_id") === shiftChunks("doc_id") &&
        origChunks("chunk_text") === shiftChunks("sh_text"), "left_anti")
      .count()
    val cdcSecs = (System.nanoTime() - t0) / 1e9
    val totalChunks = chunks.count()
    chunks.unpersist(blocking = false)
    println(f"[smoke] cdc: ${2 * nDocs} docs → $totalChunks chunks in $cdcSecs%.1f s; " +
      s"non-first chunks missing from shifted copy: $unshared")
    assert(unshared == 0L,
      s"$unshared non-first chunks failed the shift-alignment law — boundaries not content-anchored")

    // ---- k-core + personalized PageRank on a planted ~1M-edge graph ----
    // disjoint K6s (core 5), K11s (core 10) and 10-leaf stars (core 1):
    // the decomposition histogram is EXACT and the h-index iteration must
    // hit its fixpoint in a handful of rounds (each component's values
    // stabilize locally — no long decay chains planted; a bare path would
    // instead converge end-inward in O(length) rounds, which is the
    // documented worst case the maxIters guard exists for).
    t0 = System.nanoTime()
    val nC6 = math.max(n / 50, 100L)
    val nC11 = math.max(n / 100, 100L)
    val nStar = math.max(n / 100, 100L)
    import spark.implicits._
    def cliquePairs(k: Int) =
      (for (i <- 0 until k; j <- (i + 1) until k) yield (i, j)).toDF("a", "b")
    val base11 = nC6 * 6
    val baseStar = base11 + nC11 * 11
    val e6 = spark.range(nC6).crossJoin(broadcast(cliquePairs(6)))
      .select((col("id") * 6 + col("a")).as("src"), (col("id") * 6 + col("b")).as("dst"))
    val e11 = spark.range(nC11).crossJoin(broadcast(cliquePairs(11)))
      .select((lit(base11) + col("id") * 11 + col("a")).as("src"),
        (lit(base11) + col("id") * 11 + col("b")).as("dst"))
    val eStar = spark.range(nStar).crossJoin(broadcast(
        (0 until 10).map(l => Tuple1(l + 1)).toDF("leaf")))
      .select((lit(baseStar) + col("id") * 11).as("src"),
        (lit(baseStar) + col("id") * 11 + col("leaf")).as("dst"))
    val und = e6.unionAll(e11).unionAll(eStar)
    val bidir = und.unionAll(und.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val (coresDf, coreRounds) =
      graft.operators.GraphOps.coreDecompositionCounted(bidir, maxIters = 10)
    val hist = coresDf.groupBy(col("core")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kcSecs = (System.nanoTime() - t0) / 1e9
    val nUndirected = nC6 * 15 + nC11 * 55 + nStar * 10
    println(f"[smoke] kcore: $nUndirected undirected edges in $kcSecs%.1f s, " +
      s"$coreRounds rounds; hist=$hist")
    assert(hist == Map(5L -> nC6 * 6, 10L -> nC11 * 11, 1L -> nStar * 11),
      s"planted decomposition mismatch: $hist")
    assert(coreRounds <= 5, s"h-index iteration took $coreRounds rounds on planted components")

    // PPR from one K11's nodes: restart mass must stay inside the clique
    // (it is a connected component), split evenly by symmetry
    t0 = System.nanoTime()
    val seedClique = spark.range(11).select((lit(base11) + col("id")).as("node"))
    val ppr = graft.operators.PageRank.runPersonalized(bidir, seedClique, iters = 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inClique = ppr.filter(col("node") >= base11 && col("node") < base11 + 11)
      .agg(sum(col("ppr"))).head().getDouble(0)
    val outMax = ppr.filter(col("node") < base11 || col("node") >= base11 + 11)
      .agg(max(col("ppr"))).head().getDouble(0)
    val pprSecs = (System.nanoTime() - t0) / 1e9
    ppr.unpersist(blocking = false)
    println(f"[smoke] ppr: seeded K11 holds $inClique%.6f of the mass in $pprSecs%.1f s; " +
      f"max outside = $outMax%.2e")
    assert(math.abs(inClique - 1.0) < 1e-3, s"restart mass leaked the component: $inClique")
    assert(outMax == 0.0, s"PPR mass reached a disconnected component: $outMax")

    // ---- weighted SSSP: n-node 10-ary tree, uniform weight 7, planted
    // decoy shortcuts the relaxation must OVERWRITE ----
    // Every 1000th node gets a direct 0→v edge costing 7·depth(v)+5: it
    // arrives in round 1 (cheap-looking), then the true tree path must
    // improve it — exercising the improvement anti-join + frontier
    // re-expansion at scale, with the exact closed form dist(v) = 7·depth(v).
    t0 = System.nanoTime()
    val starts = Iterator.iterate(0L)(_ * 10 + 1).takeWhile(_ < n).toSeq
    val depthExpr = starts.tail.foldLeft(lit(0L)) { (acc, s) =>
      when(col("id") >= s, acc + 1L).otherwise(acc)
    }
    val down = spark.range(1L, n)
      .select(floor((col("id") - 1) / 10L).cast("long").as("src"),
        col("id").as("dst"), lit(7.0).as("w"))
    val decoys = spark.range(1L, n).filter(col("id") % 1000 === 0)
      .select(lit(0L).as("src"), col("id").as("dst"),
        (depthExpr * 7.0 + 5.0).as("w"))
    val (ssspDist, ssspRounds) = graft.operators.GraphOps.weightedShortestPathsCounted(
      down.unionAll(decoys), spark.range(1).select(lit(0L).as("node")), maxIters = 15)
    val badRows = ssspDist.select(col("node").as("id"), col("dist"))
      .filter(col("dist") =!= depthExpr * 7.0).limit(1).count()
    val nReached = ssspDist.count()
    val ssspSecs = (System.nanoTime() - t0) / 1e9
    println(f"[smoke] sssp: $n-node weighted tree + ${n / 1000} decoy shortcuts in " +
      f"$ssspSecs%.1f s, $ssspRounds rounds; reached=$nReached")
    assert(nReached == n, s"every node must be reached: $nReached of $n")
    assert(badRows == 0L, "a decoy shortcut survived — improvement overwrite failed")

    // ---- sliding-window DISTINCT users (stickiness shape) at scale ----
    // 700k users, each active on exactly the 4 days ≡ −u (mod 7) of a
    // 28-day span → every 7-day window holds exactly one active day per
    // user, so WAU(d) = ALL users for every full window d ∈ [6, 27] and
    // DAU(d) = n/7 — an exact global oracle for the explode-to-window +
    // groupBy-distinct plan (2.8M user-days → 19.6M WAU contributions →
    // one distinct aggregation; never a per-day user-set window).
    t0 = System.nanoTime()
    val nu = 700000L
    val active = spark.range(0, nu)
      .select(col("id").as("u"), explode(expr("sequence(0L, 27L)")).as("day"))
      .filter((col("u") + col("day")) % 7 === 0)
    val dauBad = active.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      .filter(col("dau") =!= nu / 7).count()
    val wau = active.select(col("u"), explode(expr("sequence(day, day + 6)")).as("wd"))
      .groupBy(col("wd")).agg(countDistinct(col("u")).as("wau"))
    val wauBad = wau.filter(col("wd").between(6, 27) && col("wau") =!= nu).count()
    val stickSecs = (System.nanoTime() - t0) / 1e9
    println(f"[smoke] stickiness: ${nu * 4} user-days → 7-day sliding distinct in " +
      f"$stickSecs%.1f s; dau-off=$dauBad wau-off=$wauBad")
    assert(dauBad == 0L, "a planted day missed its exact DAU")
    assert(wauBad == 0L, "a full 7-day window missed the exact all-users WAU")
  }
}
