package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.RollingHashes.rollingHashes

class RollingHashesSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def reference(s: String, k: Int, b: Long, p: Long): Seq[Long] =
    (0 to s.length - k).map { i =>
      s.substring(i, i + k).foldLeft(0L)((acc, c) => (acc * b + c.toInt) % p)
    }

  test("matches the direct per-window fold on sample strings") {
    val samples = Seq("the quick brown fox", "aaaaaaaaaa", "abcdefgh", "spark sql rolling")
    val df = samples.toDF("t")
      .select(col("t"), rollingHashes(col("t"), 8, 257L, 1000003L).as("hs"))
    df.collect().foreach { r =>
      assert(r.getSeq[Long](1) == reference(r.getString(0), 8, 257L, 1000003L),
        s"mismatch for '${r.getString(0)}'")
    }
  }

  test("short input yields empty array; null propagates") {
    val df = Seq(Some("short"), None).toDF("t")
      .select(rollingHashes(col("t"), 8, 257L, 1000003L).as("hs"))
    val rows = df.collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).isNullAt(0))
  }

  test("interpreted eval equals codegen result") {
    val e = RollingHashes(
      org.apache.spark.sql.catalyst.expressions.Literal("rolling hash parity check"),
      8, 257L, 1000003L)
    val interpreted = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    val viaDf = Seq("rolling hash parity check").toDF("t")
      .select(rollingHashes(col("t"), 8, 257L, 1000003L)).head().getSeq[Long](0)
    assert(interpreted == viaDf)
    assert(interpreted == reference("rolling hash parity check", 8, 257L, 1000003L))
  }

  test("values stay within [0, mod)") {
    val df = Seq.fill(50)(scala.util.Random.alphanumeric.take(100).mkString).toDF("t")
      .select(explode(rollingHashes(col("t"), 8, 257L, 1000003L)).as("h"))
    val mm = df.agg(min("h"), max("h")).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < 1000003L)
  }
}
