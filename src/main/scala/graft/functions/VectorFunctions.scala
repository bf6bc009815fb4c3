package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType(FloatType)` columns, built on the
  * native codegen'd [[DotProduct]] expression — NO UDFs.
  *
  * Accumulation is STRICTLY left-to-right from index 0, matching
  * [[oracleDotSql]]'s unrolled left-assoc DuckDB expression
  * bit-for-bit (the implicit 0.0 seed is exact: 0.0+x == x for every
  * non-zero product, and a ±0.0 difference dies in the e6
  * integerization every consumer applies).
  */
object VectorFunctions {

  /** Dot product — the native codegen'd [[DotProduct]] expression
    * (tight loop, no per-row intermediate array). Same left-to-right
    * accumulation as [[dotHof]] and [[oracleDotSql]]. */
  def dot(a: Column, b: Column): Column = DotProduct.dotNative(a, b)

  /** Higher-order-function formulation of the same dot product —
    * kept as the pure-builtin reference implementation (parity with
    * the native expression is asserted in DotProductSpec). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column = dot(a, a)

  // ---- matching DuckDB SQL (left-assoc, same order of operations) ----

  /** `(CAST(a[1] AS DOUBLE)*CAST(b[1] AS DOUBLE) + ...)` — DuckDB lists
    * are 1-indexed like element_at. */
  def oracleDotSql(a: String, b: String, dim: Int): String =
    (1 to dim).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")

  def oracleNormSqSql(a: String, dim: Int): String = oracleDotSql(a, a, dim)

  /** Dot product of two length-`n` SLICES (`a[offA+1..offA+n]` ·
    * `b[offB+1..offB+n]`) — the late-interaction sub-vector twin of
    * [[oracleDotSql]], same left-assoc accumulation as Spark's
    * `dot(slice(a, offA+1, n), slice(b, offB+1, n))`. */
  def oracleDotSliceSql(a: String, offA: Int, b: String, offB: Int, n: Int): String =
    (1 to n).map(k => s"CAST($a[${offA + k}] AS DOUBLE)*CAST($b[${offB + k}] AS DOUBLE)")
      .mkString("(", " + ", ")")

  /** Cosine of two equal-offset slices, matching the Spark-side
    * slice-then-cosine arithmetic bit-for-bit. */
  def oracleCosineSliceSql(a: String, offA: Int, b: String, offB: Int, n: Int): String =
    s"(${oracleDotSliceSql(a, offA, b, offB, n)} / " +
      s"(sqrt(${oracleDotSliceSql(a, offA, a, offA, n)}) * " +
      s"sqrt(${oracleDotSliceSql(b, offB, b, offB, n)})))"

  def oracleCosineSql(a: String, b: String, dim: Int): String =
    s"(${oracleDotSql(a, b, dim)} / (sqrt(${oracleNormSqSql(a, dim)}) * sqrt(${oracleNormSqSql(b, dim)})))"
}
