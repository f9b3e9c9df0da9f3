package graft.operators

import org.apache.spark.sql.functions._

/** Misra-Gries mergeable-summary guarantees (Agarwal et al., PODS'12):
  * whatever the partitioning, every item with true frequency > n/(k+1) is
  * present, and every estimate undercounts by at most n/(k+1). */
class SketchesSpec extends graft.SparkTestBase {

  private def mgSketch(items: Seq[String], k: Int, parts: Int): Map[String, Long] = {
    import spark.implicits._
    spark.createDataset(items).repartition(parts)
      .select(new Sketches.MisraGries(k).toColumn).head()
  }

  // deterministic zipf-ish stream: item i appears ~N/(i+1) times
  private def zipfStream(nItems: Int, scale: Int): Seq[String] =
    (0 until nItems).flatMap(i => Seq.fill(scale / (i + 1))(s"tok$i"))

  test("every item over the n/(k+1) threshold survives, at any parallelism") {
    val k = 8
    val items = zipfStream(50, 1200)
    val n = items.size.toLong
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val mustKeep = exact.filter(_._2 > n / (k + 1)).keySet
    assert(mustKeep.nonEmpty, "test stream must have true heavy hitters")
    for (parts <- Seq(1, 3, 7)) {
      // shuffled order per-parallelism: the guarantee is order-independent
      val sketch = mgSketch(scala.util.Random.shuffle(items), k, parts)
      assert(sketch.size <= k)
      val missing = mustKeep -- sketch.keySet
      assert(missing.isEmpty, s"parts=$parts lost heavy hitters $missing")
      // estimates never overcount, and undercount by at most n/(k+1)
      sketch.foreach { case (t, est) =>
        val truth = exact(t)
        assert(est <= truth, s"$t overcounted: est $est > true $truth")
        assert(truth - est <= n / (k + 1), s"$t undercounted past the bound")
      }
    }
  }

  test("streams smaller than k are counted exactly") {
    val items = Seq("a", "a", "b", "c", "c", "c")
    assert(mgSketch(items, 10, 2) === Map("a" -> 2L, "b" -> 1L, "c" -> 3L))
  }

  test("count-min: linear merge — identical matrix at any parallelism") {
    import spark.implicits._
    val depth = 4
    val width = 256
    val items = zipfStream(40, 800)
    val sketches = Seq(1, 3, 8).map { parts =>
      spark.createDataset(scala.util.Random.shuffle(items)).repartition(parts)
        .select(new Sketches.CountMin(depth, width).toColumn).head()
    }
    // a linear sketch is partition-INVARIANT, not just bound-preserving:
    // every parallelism must produce the byte-identical counter matrix
    assert(sketches.forall(_.sameElements(sketches.head)))
  }

  test("count-min: never undercounts; overshoot within e*N/width") {
    import spark.implicits._
    val depth = 4
    val width = 512
    val items = zipfStream(60, 1500)
    val exact = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sketch = spark.createDataset(items).repartition(5)
      .select(new Sketches.CountMin(depth, width).toColumn).head()
    val total = sketch(depth * width)
    assert(total === items.size.toLong)
    val bound = math.ceil(math.E * total / width).toLong
    exact.foreach { case (t, n) =>
      val est = Sketches.CountMin.estimate(sketch, depth, width, t)
      assert(est >= n, s"$t undercounted: est $est < true $n")
      assert(est <= n + bound, s"$t overshoot ${est - n} past bound $bound")
    }
    // absent items estimate at most the collision bound
    val ghost = Sketches.CountMin.estimate(sketch, depth, width, "never-seen")
    assert(ghost <= bound)
  }

  test("countMinCheck frame on all SF corpora: both guarantee booleans hold") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val toks = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
      val out = Sketches.countMinCheck(toks, depth = 4, width = 2048).collect()
      assert(out.length === 20, s"$sf probe set")
      out.foreach { r =>
        assert(r.getBoolean(2), s"$sf ${r.getString(0)} undercounted")
        assert(r.getBoolean(3), s"$sf ${r.getString(0)} overshot the eps bound")
      }
    }
  }

  test("heavyHitters frame: exact counts, all flagged in-sketch") {
    import spark.implicits._
    val toks = zipfStream(30, 600).toDF("tok")
    val out = Sketches.heavyHitters(toks, k = 10).collect()
    assert(out.nonEmpty)
    val exact = zipfStream(30, 600).groupBy(identity).view.mapValues(_.size.toLong).toMap
    out.foreach { r =>
      assert(r.getLong(1) === exact(r.getString(0)))
      assert(r.getBoolean(2), s"${r.getString(0)} above n/k but not in sketch")
    }
  }
}
