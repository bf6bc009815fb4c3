package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.JaroWinkler.jaroWinkler

class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  // expected values probed from DuckDB 1.0 jaro_winkler_similarity —
  // the oracle this expression must agree with bit-for-bit
  private val cases = Seq(
    ("martha", "marhta", 0.9611111111111111),
    ("dixon", "dicksonx", 0.8133333333333332),
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("duane", "dwayne", 0.8400000000000001),
    ("CRATE", "TRACE", 0.7333333333333334), // jaro > 0.7 but no prefix
    ("abcdefgh", "abzzzzzz", 0.5),          // prefix but jaro ≤ 0.7: no boost
    ("aaaaaabc", "aaaaaacb", 0.975),        // prefix capped at 4
    ("abcdefgh", "abcdefgh", 1.0),
    ("ab", "ba", 0.0),                      // window 0: no cross-position match
    ("abcdef", "bcadef", 0.9444444444444445), // odd mismatch count: floor halving
    ("az", "a", 0.8500000000000001),
    ("", "", 0.0),                          // DuckDB convention: empty → 0
    ("a", "", 0.0),
  )

  test("matches DuckDB-probed values exactly") {
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b")).as("jw"))
    val got = df.collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b, exp), g) =>
      assert(g == exp, s"jw('$a','$b') = $g, expected $exp")
    }
  }

  test("symmetric") {
    val df = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
    val fwd = df.select(jaroWinkler(col("a"), col("b"))).collect().map(_.getDouble(0))
    val rev = df.select(jaroWinkler(col("b"), col("a"))).collect().map(_.getDouble(0))
    assert(fwd.toSeq == rev.toSeq)
  }

  test("null propagates") {
    val rows = Seq((Some("x"), None: Option[String]), (None: Option[String], Some("y")))
      .toDF("a", "b").select(jaroWinkler(col("a"), col("b"))).collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("interpreted eval equals codegen result") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    cases.foreach { case (a, b, exp) =>
      val interpreted = JaroWinkler(Literal(a), Literal(b)).eval(null)
      assert(interpreted == exp, s"interpreted jw('$a','$b')")
    }
  }

  test("non-ASCII pins UTF-16 code-unit semantics (documented DuckDB divergence)") {
    // "café" is 4 UTF-16 code units but 5 UTF-8 bytes; DuckDB's
    // jaro_winkler_similarity works on bytes, so this pair is where
    // the class doc's divergence claim becomes observable:
    //   code-unit semantics: m=3 over |a|=|b|=4 → 0.8833333333333334
    //   byte semantics:      m=3 over |a|=5,|b|=4 → 0.8483333333333334
    // Both numbers are IEEE-exact replays of the same formula; a
    // silent switch to byte semantics (or any other regression in the
    // claim) flips the value across the gap and fails this test.
    val charExpected = 0.8833333333333334
    val byteExpected = 0.8483333333333334
    assert(charExpected != byteExpected)
    val got = Seq(("café", "cafe")).toDF("a", "b")
      .select(jaroWinkler(col("a"), col("b"))).head.getDouble(0)
    assert(got == charExpected,
      s"jw('café','cafe') = $got — expected the UTF-16 value $charExpected, " +
        s"not DuckDB's byte-level $byteExpected")
  }

  test("rejects non-string input") {
    val e = JaroWinkler(
      org.apache.spark.sql.catalyst.expressions.Literal(1),
      org.apache.spark.sql.catalyst.expressions.Literal("x"))
    assert(!e.checkInputDataTypes().isSuccess)
  }
}
