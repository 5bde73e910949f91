package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics pins for graft_jaro_winkler (oracle-engine-probed cases:
  * byte-level comparison, 0.7 boost threshold, floored transpositions,
  * empty → 0), plus interpreted-vs-codegen equality.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.sim(a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("classic textbook values") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-15)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-15)
  }

  test("edge semantics: empty, identical, disjoint, boost threshold") {
    assert(jw("", "") == 0.0) // oracle-engine convention, not the 1.0 of some libs
    assert(jw("a", "") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("x", "y") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window 0 at these lengths
    // jaro = 0.5 <= 0.7: prefix bonus must NOT apply
    assert(math.abs(jw("abcdefgh", "abxxxxxx") - 0.5) < 1e-15)
  }

  test("byte-level comparison (multi-byte chars count as bytes)") {
    // 'é' is two UTF-8 bytes: lengths 6 vs 5, not 5 vs 5
    assert(math.abs(jw("héllo", "hello") - 0.8400000000000001) < 1e-15)
  }

  test("expression evaluates through codegen and matches the kernel") {
    val df = Seq(("martha", "marhta"), ("crate", "trace"), ("", ""))
      .toDF("a", "b")
      .select(call_function("graft_jaro_winkler", col("a"), col("b")).as("jw"))
    assert(df.as[Double].collect().toSeq ==
      Seq(jw("martha", "marhta"), jw("crate", "trace"), 0.0))
  }

  test("null inputs yield null") {
    val df = Seq((Some("a"), None: Option[String])).toDF("a", "b")
      .select(call_function("graft_jaro_winkler", col("a"), col("b")).as("jw"))
    assert(df.collect().head.isNullAt(0))
  }
}
