package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[PqEncode]] against an independent driver-side replay on random
  * vectors and codebooks — the same parity discipline as the other
  * native expressions ([[DotProductSpec]] et al.), plus the
  * lexicographic tie-break and degenerate shapes. */
class PqEncodeSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  import spark.implicits._

  private def replay(v: Seq[Float], books: Seq[Seq[(Int, Array[Double])]],
                     subDim: Int): Seq[Int] =
    books.indices.map { j =>
      val slice = v.slice(j * subDim, (j + 1) * subDim).map(_.toDouble)
      books(j).minBy { case (id, c) =>
        val d = slice.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
        (d, id)
      }._1
    }

  test("random vectors and codebooks: expression matches the driver replay") {
    val rng = new scala.util.Random(11)
    val (sub, subDim, k) = (4, 3, 7)
    val books: Seq[Seq[(Int, Array[Double])]] = Seq.fill(sub)(
      Seq.tabulate(k)(i => i -> Array.fill(subDim)(rng.nextDouble() * 4 - 2)))
    val vecs = Seq.fill(300)(Seq.fill(sub * subDim)(rng.nextFloat() * 4 - 2))
    val got = vecs.toDF("v")
      .select(PqEncode.pqEncode(col("v"), books).as("c"))
      .collect().map(_.getSeq[Int](0).toSeq)
    val exp = vecs.map(replay(_, books, subDim))
    assert(got.toSeq == exp)
  }

  test("exact distance ties pick the lower codebook id") {
    // two identical entries at different ids: min must be the lower id
    val books: Seq[Seq[(Int, Array[Double])]] = Seq(
      Seq(0 -> Array(1.0, 1.0), 1 -> Array(0.0, 0.0), 2 -> Array(0.0, 0.0)))
    val got = Seq(Seq(0.0f, 0.0f)).toDF("v")
      .select(PqEncode.pqEncode(col("v"), books)).head.getSeq[Int](0)
    assert(got == Seq(1))
  }

  test("interpreted eval agrees with the codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val rng = new scala.util.Random(13)
    val (sub, subDim, k) = (3, 2, 5)
    val books: Seq[Seq[Seq[Double]]] = Seq.fill(sub)(
      Seq.fill(k)(Seq.fill(subDim)(rng.nextDouble() * 2 - 1)))
    val booksIdx = books.map(_.zipWithIndex.map { case (c, i) => i -> c.toArray })
    val vecs = Seq.fill(50)(Seq.fill(sub * subDim)(rng.nextFloat() * 2 - 1))
    // interpreted: direct eval over a literal child (no codegen involved)
    val interp = vecs.map { v =>
      PqEncode(Literal.create(v, ArrayType(FloatType)), books)
        .eval(null).asInstanceOf[ArrayData].toIntArray.toSeq
    }
    // codegen: through the whole-stage-compiled projection
    val gen = vecs.toDF("v")
      .select(PqEncode.pqEncode(col("v"), booksIdx).as("c"))
      .collect().map(_.getSeq[Int](0).toSeq)
    assert(interp == gen.toSeq)
    // interpreted null handling: short vector and null element -> null
    assert(PqEncode(Literal.create(Seq(1.0f), ArrayType(FloatType)), books).eval(null) == null)
    assert(PqEncode(Literal.create(null, ArrayType(FloatType)), books).eval(null) == null)
  }

  test("extra trailing dims are ignored; exact-length vectors encode") {
    val books: Seq[Seq[(Int, Array[Double])]] = Seq(
      Seq(0 -> Array(0.0), 1 -> Array(10.0)),
      Seq(0 -> Array(0.0), 1 -> Array(10.0)))
    val df = Seq(Seq(9.0f, 1.0f, 777.0f), Seq(1.0f, 9.0f)).toDF("v")
      .select(PqEncode.pqEncode(col("v"), books).as("c"))
    assert(df.collect().map(_.getSeq[Int](0).toSeq).toSeq == Seq(Seq(1, 0), Seq(0, 1)))
  }
}
