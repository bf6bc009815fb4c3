package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parity spec for the native [[LshBandSigs]] expression against the
  * expression form it replaced in `SimilarityOps.lshBandKeys` (96
  * separate DotProduct trees + struct constructors): same band order,
  * same bit order, same dot association, same ≥ 0 sign rule, same
  * null propagation — on real fixture vectors and adversarial ones. */
class LshBandSigsSpec extends AnyFunSuite {

  private lazy val spark = graft.SparkTestSession.spark

  private val bands = 6
  private val rpb = 4

  private def referenceSigs(vec: Seq[Float], planes: Seq[Array[Double]]): Seq[Int] = {
    // the OLD formulation, reproduced literally: left-to-right double
    // dot, bit = (dot >= 0) with Spark double semantics, sig = Σ bit·2^r
    (0 until bands).map { b =>
      (0 until rpb).map { r =>
        val h = planes(b * rpb + r)
        var acc = 0.0
        var i = 0
        val n = math.min(vec.length, h.length)
        while (i < n) { acc += vec(i).toDouble * h(i); i += 1 }
        val bit =
          if (java.lang.Double.isNaN(acc)) 1
          else if (java.lang.Double.compare(acc, 0.0) >= 0) 1 else 0
        bit << r
      }.sum
    }
  }

  test("matches the expression-form signatures on fixture embeddings") {
    val planes = graft.ops.SimilarityOps.lshPlanes(bands * rpb)
    val e = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), col("embedding")).limit(200)
    val got = e.select(col("vec_id"),
        LshBandSigs.lshBandSigs(col("embedding"),
          typedLit(planes.map(_.toSeq)), lit(rpb)).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val vecs = e.collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(got.nonEmpty)
    vecs.foreach { case (id, v) =>
      assert(got(id) == referenceSigs(v, planes), s"vec $id")
    }
  }

  test("adversarial values: zeros, exact-boundary, sign flips") {
    val planes = graft.ops.SimilarityOps.lshPlanes(bands * rpb)
    val dim = planes.head.length
    val rows = Seq(
      Array.fill(dim)(0.0f),                  // all-zero → every dot 0.0 → all bits set
      Array.fill(dim)(1.0f),
      Array.fill(dim)(-1.0f),
      Array.tabulate(dim)(i => if (i % 2 == 0) 1.0f else -1.0f))
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      rows.zipWithIndex.map { case (v, i) =>
        org.apache.spark.sql.Row(i.toLong, v.toSeq) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType)))))
    val got = df.select(col("id"),
        LshBandSigs.lshBandSigs(col("v"),
          typedLit(planes.map(_.toSeq)), lit(rpb)).as("sigs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong) == referenceSigs(v.toSeq, planes), s"row $i")
    }
    // all-zero vector: 0.0 >= 0 → every bit 1 → sig = 2^rpb − 1
    assert(got(0L) == Seq.fill(bands)((1 << rpb) - 1))
  }

  test("null vector and null element yield null") {
    val planes = graft.ops.SimilarityOps.lshPlanes(bands * rpb)
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true),
        nullable = true)))
    val df = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(null),
      org.apache.spark.sql.Row(Seq[Any](1.0f, null) ++
        Seq.fill[Any](planes.head.length - 2)(0.0f))).asJava, schema)
    val got = df.select(LshBandSigs.lshBandSigs(col("v"),
      typedLit(planes.map(_.toSeq)), lit(rpb)).as("sigs")).collect()
    assert(got.forall(_.isNullAt(0)))
  }
}
