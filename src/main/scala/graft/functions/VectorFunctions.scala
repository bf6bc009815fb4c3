package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType(FloatType)` columns, built from
  * codegen'd Catalyst expressions — NO UDFs, so the 64
  * multiply-adds of a dot product inline into whole-stage codegen.
  *
  * Two families:
  *   - `*Fold` variants unroll an explicit left-associated fold over a
  *     statically-known dimension. Float addition is order-sensitive,
  *     so a fixed association makes results BIT-REPRODUCIBLE across
  *     engines — [[oracleDotSql]] emits the same left-assoc expression
  *     for DuckDB, giving exact (not approximate) oracle matches.
  *   - higher-order variants (`zip_with` + `aggregate`) for dynamic
  *     dimensions; same left-to-right accumulation order.
  */
object VectorFunctions {

  /** element_at(a,i)·element_at(b,i) summed, left-assoc, i=1..dim. */
  def dotFold(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduceLeft(_ + _)

  def normSqFold(a: Column, dim: Int): Column = dotFold(a, a, dim)

  def cosineFold(a: Column, b: Column, dim: Int): Column =
    dotFold(a, b, dim) / (sqrt(normSqFold(a, dim)) * sqrt(normSqFold(b, dim)))

  /** Dynamic-dimension dot product: zip_with multiply, then a
    * left-to-right double aggregate. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def normSq(a: Column): Column = dot(a, a)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  def l2Sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  // ---- matching DuckDB SQL (left-assoc, same order of operations) ----

  /** `(CAST(a[1] AS DOUBLE)*CAST(b[1] AS DOUBLE) + ...)` — DuckDB lists
    * are 1-indexed like element_at. */
  def oracleDotSql(a: String, b: String, dim: Int): String =
    (1 to dim).map(i => s"CAST($a[$i] AS DOUBLE)*CAST($b[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")

  def oracleNormSqSql(a: String, dim: Int): String = oracleDotSql(a, a, dim)

  def oracleCosineSql(a: String, b: String, dim: Int): String =
    s"(${oracleDotSql(a, b, dim)} / (sqrt(${oracleNormSqSql(a, dim)}) * sqrt(${oracleNormSqSql(b, dim)})))"
}
