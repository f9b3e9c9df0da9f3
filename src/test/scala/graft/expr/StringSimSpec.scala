package graft.expr

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class StringSimSpec extends SparkTestBase {

  private def jw(a: String, b: String): Double =
    StringSimKernels.jaroWinkler(UTF8String.fromString(a), UTF8String.fromString(b))
  private def ent(s: String): Double =
    StringSimKernels.charEntropy(UTF8String.fromString(s))

  test("jaroWinkler matches the textbook values DuckDB reproduces") {
    // all five pinned against `SELECT jaro_winkler_similarity(...)`
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.8400000000000001) < 1e-12)
    assert(jw("abc", "abc") == 1.0)
    assert(math.abs(jw("crate", "trace") - 0.7333333333333334) < 1e-12)
  }

  test("boost threshold: no prefix bonus at jaro <= 0.7 (DuckDB semantics)") {
    // jaro('abcdefgh','abzzzzzz') = 0.5 with common prefix 'ab' — DuckDB
    // leaves it at 0.5, so the Winkler bonus must be threshold-gated
    assert(jw("abcdefgh", "abzzzzzz") == 0.5)
    assert(math.abs(jw("abcvwxyz", "abcdefgh") - 0.5833333333333334) < 1e-12)
  }

  test("odd transposition counts truncate (integer half-transpositions)") {
    // matched sequences abcxyz vs bcaxyz have 3 mismatched pairs; DuckDB
    // computes t = 3/2 = 1 (truncated), giving 0.9444..., not 0.9167
    assert(math.abs(jw("abcxyz", "bcaxyz") - 0.9444444444444445) < 1e-12)
  }

  test("jaroWinkler edge cases: empty input is 0.0, window-0 disorder is 0.0") {
    assert(jw("", "") == 0.0)
    assert(jw("ab", "") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window = 0, no same-position match
    assert(jw("aa", "ab") == 0.6666666666666666)
  }

  test("charEntropy matches the closed form (and DuckDB's entropy())") {
    // 'aabbbcd': n=7, counts 2/3/1/1 → 1.842371 at 6dp (pinned vs DuckDB)
    assert(math.abs(ent("aabbbcd") - 1.8423709931771084) < 1e-9)
    assert(ent("") == 0.0)
    assert(ent("aaaa") == 0.0)
    assert(math.abs(ent("ab") - 1.0) < 1e-12)
    assert(math.abs(ent("abcd") - 2.0) < 1e-12)
  }

  test("codegen path agrees with interpreted eval through a DataFrame") {
    import spark.implicits._
    val df = Seq(("martha", "marhta"), ("abcdefgh", "abzzzzzz"), ("", ""),
      ("crate", "trace")).toDF("a", "b")
    val got = df.select(
      StringSimExpressions.jaroWinkler(col("a"), col("b")).as("jw"),
      StringSimExpressions.charEntropy(col("a")).as("e")).collect()
    assert(math.abs(got(0).getDouble(0) - 0.9611111111111111) < 1e-12)
    assert(got(1).getDouble(0) == 0.5)
    assert(got(2).getDouble(0) == 0.0)
    assert(got(2).getDouble(1) == 0.0)
    // entropy('crate') = log2(5): 5 distinct chars
    assert(math.abs(got(3).getDouble(1) - (math.log(5.0) / math.log(2.0))) < 1e-12)
  }
}
