package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `ArrayType(FloatType)` columns, built from
  * codegen'd Catalyst expressions — NO UDFs.
  *
  * Two families with IDENTICAL left-to-right accumulation order, so
  * either matches [[oracleDotSql]]'s unrolled left-assoc DuckDB
  * expression bit-for-bit (the `aggregate` seed 0.0 is exact: 0.0+x==x
  * for every non-zero product, and a ±0.0 difference dies in the e6
  * integerization):
  *   - higher-order variants (`zip_with` + `aggregate`) — PREFER these:
  *     compact codegen that survives join consume paths (a 64-dim
  *     unrolled fold inside a BroadcastNestedLoopJoin overflows
  *     janino's method limit and falls back to interpreted eval);
  *   - `*Fold` variants unroll the fold over a statically-known
  *     dimension — kept for projection contexts and as the reference
  *     formulation the oracle SQL mirrors.
  */
object VectorFunctions {

  /** element_at(a,i)·element_at(b,i) summed, left-assoc, i=1..dim. */
  def dotFold(a: Column, b: Column, dim: Int): Column =
    (1 to dim).map(i => element_at(a, i).cast("double") * element_at(b, i).cast("double"))
      .reduceLeft(_ + _)

  def normSqFold(a: Column, dim: Int): Column = dotFold(a, a, dim)

  def cosineFold(a: Column, b: Column, dim: Int): Column =
    dotFold(a, b, dim) / (sqrt(normSqFold(a, dim)) * sqrt(normSqFold(b, dim)))

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
