package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in runner for the four 1M-row scale smokes, so their BASELINE.md
  * invariants live under `sbt test` tooling instead of rotting as manual
  * mains (VERDICT r7 next-round #6). Each test drives the same `run(...)`
  * body the standalone main runs — generation, pipeline, and assertions
  * included — at the full 1M default size.
  *
  * Gated on GRAFT_RUN_SMOKES because the four together need ~32 cores and
  * several minutes; without it every test cancels (visibly, not silently).
  * Run as:
  * {{{
  *   GRAFT_RUN_SMOKES=1 sbt "testOnly graft.SmokeSuite"
  * }}}
  * (testOnly, not plain test: the smokes size their shuffles for a
  * dedicated local[32] JVM — sharing it with the toy-SF suites' local[4]
  * session would run them under that session's 4 shuffle partitions).
  */
class SmokeSuite extends AnyFunSuite with BeforeAndAfterAll {

  private val enabled = sys.env.contains("GRAFT_RUN_SMOKES")

  private lazy val spark: SparkSession = GraftSession
    .localBuilder("graft-smoke-suite", 32)
    .config("spark.driver.maxResultSize", "4g")
    .getOrCreate()

  private def smoke(name: String)(body: SparkSession => Unit): Unit =
    test(name) {
      if (!enabled) cancel("set GRAFT_RUN_SMOKES=1 to run the 1M smokes")
      spark.sparkContext.setLogLevel("WARN")
      body(spark)
    }

  smoke("MillionSmoke: 1M-point bubble clustering, purity vs generating blobs") {
    MillionSmoke.run(_, 1000000L)
  }

  smoke("DedupMillionSmoke: 1M-doc LSH recall + 50k identical-doc chain contract") {
    DedupMillionSmoke.run(_, 1000000L)
  }

  smoke("NearDupIndexMillionSmoke: recurring ingest — per-step flat, " +
      "policy rebuild fires, fold == one-shot truth") {
    // 400k in-suite: the bloom partial-aggregate buffers size with the
    // delta, and the shared 8g suite JVM carries other smokes' residue;
    // the standalone main runs the full 1M under SPARK_DRIVER_MEM=24g,
    // and BASELINE.md records that run's numbers
    NearDupIndexMillionSmoke.run(_, 400000L)
  }

  smoke("AnnMillionSmoke: 1M-vector IVF recall@10 vs exact") {
    AnnMillionSmoke.run(_, 1000000L)
  }

  smoke("TextCurationMillionSmoke: 1M-doc curation + AQE broadcast fallback plans") {
    TextCurationMillionSmoke.run(_, 1000000L)
  }

  smoke("StreamingMillionSmoke: 1M-event stateful streams vs batch oracles") {
    StreamingMillionSmoke.run(_, 1000000L)
  }

  smoke("ScaleOpsMillionSmoke: 1M-edge PageRank, 10M-token CMS, 10M-row weighted sample, " +
      "1.4M-edge exact triangles, 10k-clique LPA, skew join, 1M-node BFS + weighted SSSP, " +
      "400k-doc CDC, kcore, PPR") {
    ScaleOpsMillionSmoke.run(_, 1000000L)
  }

  smoke("DendrogramMillionSmoke: 6M-edge D&C merge events, ≥20 blocks, " +
      "1M byte-identity vs driver replay") {
    // 6M in-suite: this smoke runs LAST in a JVM already carrying six
    // smokes' heap residue (10M OOMed the shared 8g heap once); the
    // standalone main defaults to the full 10M, and BASELINE.md records
    // that run's numbers
    DendrogramMillionSmoke.run(_, 6000000L)
  }

  override def afterAll(): Unit = if (enabled) spark.stop()
}
