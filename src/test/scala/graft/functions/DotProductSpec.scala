package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.VectorFunctions.{dot, dotHof}

class DotProductSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  test("native dot is bit-identical to the HOF formulation on random floats") {
    val rng = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Seq.fill(64)(rng.nextFloat() * 2 - 1), Seq.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = rows.toDF("a", "b")
      .select(dot(col("a"), col("b")).as("nat"), dotHof(col("a"), col("b")).as("hof"))
    assert(df.filter(col("nat") =!= col("hof")).count() == 0)
  }

  test("matches a driver-side left-assoc fold exactly") {
    val a = Seq(1.5f, -2.25f, 3.0f, 0.125f)
    val b = Seq(0.5f, 4.0f, -1.0f, 8.0f)
    val expected = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }
      .foldLeft(0.0)(_ + _)
    val got = Seq((a, b)).toDF("a", "b").select(dot(col("a"), col("b"))).head.getDouble(0)
    assert(got == expected)
  }

  test("null array propagates null; shorter array zips") {
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f))),
      (None: Option[Seq[Float]], Some(Seq(1.0f)))
    ).toDF("a", "b").select(dot(col("a"), col("b")).as("d"))
    val rows = df.collect()
    assert(rows(0).getDouble(0) == 3.0)
    assert(rows(1).isNullAt(0))
  }

  test("works on long arrays too (widened to double)") {
    val got = Seq((Seq(2L, 3L), Seq(10L, 100L))).toDF("a", "b")
      .select(dot(col("a"), col("b"))).head.getDouble(0)
    assert(got == 320.0)
  }
}
