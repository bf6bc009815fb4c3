package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native top-`nprobe` nearest-centroid selection: for a vector `v`
  * and a FOLDABLE centroid matrix, returns the POSITIONS of the
  * `nprobe` centroids with the smallest (dist², position) — dist² =
  * |v|² − 2·v·cᵢ + |cᵢ|², every term in the exact association of the
  * expression form it replaces, so the selected set is bit-identical.
  *
  * Why a native expression (the IVF assignment's round-15 rewrite):
  * the higher-order form — `array_sort` over a per-row
  * `transform(centsLit, …)` array of (dist, id) structs — evaluates
  * the sort through `InterpretedOrdering` on a k-element struct array
  * PER ROW: measured at nlist ≈ 800 over 200k vectors as the entire
  * cost of the index build (all 32 workers pinned in
  * `InterpretedOrdering.compare`; 811 s vs ~30 s). Here the matrix
  * rides the plan as ONE boxed reference (`addReferenceObj`, not k
  * struct literals — plan size is O(1) in nlist), the distance loop is
  * a tight primitive loop, and the selection is an insertion pass into
  * an nprobe-sized buffer: O(k·(dim + nprobe)) with no allocation
  * beyond the output array, codegen'd and interpreted identically.
  *
  * Semantics faithful to `slice(array_sort(…), 1, nprobe)`:
  * ascending (dist², position) lexicographic, ties by position;
  * −0.0 distances normalize to +0.0 (Spark's SQL ordering treats them
  * equal, `Double.compare` does not); NaN sorts last; a null vector
  * or a null vector ELEMENT yields null (the HOF form's null dist
  * propagation). Positions are into the matrix as passed — callers
  * that carry non-positional centroid ids order the matrix by id so
  * position ties ARE id ties. */
case class NearestCentroids(vec: Expression, cents: Expression, nprobe: Expression)
  extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = cents
  override def third: Expression = nprobe

  private def vecElemType: DataType = vec.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vecElemType match {
      case FloatType | DoubleType | LongType | IntegerType | ShortType => true
      case _ => false
    }
    val centsOk = cents.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => cents.foldable
      case _ => false
    }
    val npOk = nprobe.dataType == IntegerType && nprobe.foldable
    if (vecOk && centsOk && npOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_centroids expects (numeric array, foldable array<array<double>>, " +
        s"foldable int), got ${vec.dataType.catalogString} / " +
        s"${cents.dataType.catalogString} / ${nprobe.dataType.catalogString}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  // a null vector OR a null element yields null (HOF-form parity)
  override def nullable: Boolean = vec.nullable || (vec.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  })

  /** The folded centroid matrix, flattened row-major, plus per-row
    * squared norms — computed once per (executor, expression). */
  @transient private lazy val k: Int = matrixAndNorms._3
  @transient private lazy val dim: Int = matrixAndNorms._4
  @transient private lazy val flat: Array[Double] = matrixAndNorms._1
  @transient private lazy val c2: Array[Double] = matrixAndNorms._2
  @transient private lazy val matrixAndNorms: (Array[Double], Array[Double], Int, Int) = {
    val m = cents.eval(null).asInstanceOf[ArrayData]
    val kk = m.numElements()
    require(kk > 0, "nearest_centroids: empty centroid matrix")
    val first = m.getArray(0)
    val d = first.numElements()
    val f = new Array[Double](kk * d)
    val n2 = new Array[Double](kk)
    var i = 0
    while (i < kk) {
      val row = m.getArray(i)
      require(row.numElements() == d,
        s"nearest_centroids: ragged centroid matrix (row $i has ${row.numElements()} != $d)")
      var j = 0
      var acc = 0.0
      while (j < d) {
        val x = row.getDouble(j)
        f(i * d + j) = x
        acc += x * x
        j += 1
      }
      n2(i) = acc
      i += 1
    }
    (f, n2, kk, d)
  }
  @transient private lazy val np: Int =
    math.max(1, nprobe.eval(null).asInstanceOf[Int])

  /** The whole per-row algorithm as a reusable static-shaped method —
    * codegen calls back into it through a reference object, so the
    * interpreted and generated paths are ONE implementation (the
    * per-row work is a primitive loop either way; what codegen must
    * avoid is the interpreted ordering of the HOF form, not this
    * call). Returns null on a null vector element. */
  @transient private lazy val etTag: Int = vecElemType match {
    case FloatType => 0; case DoubleType => 1; case LongType => 2
    case IntegerType => 3; case ShortType => 4
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  def select(a: ArrayData): GenericArrayData = {
    val n = a.numElements()
    val tag = etTag
    val v = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      v(i) = tag match {
        case 0 => a.getFloat(i).toDouble
        case 1 => a.getDouble(i)
        case 2 => a.getLong(i).toDouble
        case 3 => a.getInt(i).toDouble
        case _ => a.getShort(i).toDouble
      }
      i += 1
    }
    // |v|² with the dot-product loop's exact association (index 0 up)
    var vn2 = 0.0
    i = 0
    while (i < n) { vn2 += v(i) * v(i); i += 1 }

    val take = math.min(np, k)
    val dists = new Array[Double](take)
    val idxs = new Array[Int](take)
    var size = 0
    val lim = math.min(n, dim) // zip semantics: shorter side decides
    var c = 0
    while (c < k) {
      var dot = 0.0
      var j = 0
      val base = c * dim
      while (j < lim) { dot += v(j) * flat(base + j); j += 1 }
      var d = vn2 - 2.0 * dot + c2(c)
      // normalize -0.0 → +0.0 so Double.compare below orders exactly
      // like Spark SQL's double ordering (±0.0 equal, NaN greatest);
      // position ties then resolve to the earlier c because positions
      // scan ascending and equals insert strictly after
      d = d + 0.0
      if (size < take ||
          java.lang.Double.compare(d, dists(size - 1)) < 0) {
        var p = if (size < take) size else size - 1
        while (p > 0 && java.lang.Double.compare(dists(p - 1), d) > 0) {
          if (p < take) { dists(p) = dists(p - 1); idxs(p) = idxs(p - 1) }
          p -= 1
        }
        if (p < take) { dists(p) = d; idxs(p) = c }
        if (size < take) size += 1
      }
      c += 1
    }
    val out = new Array[Int](size)
    i = 0
    while (i < size) { out(i) = idxs(i); i += 1 }
    new GenericArrayData(out)
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) null else select(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    // the whole algorithm runs through ONE implementation (select):
    // codegen's job here is only to stay inside whole-stage codegen —
    // the reference-object call per row replaces the HOF form's
    // per-row interpreted struct-array sort
    val self = ctx.addReferenceObj("nearestCentroids", this)
    val vecCode = vec.genCode(ctx)
    val result = ctx.freshName("ncResult")
    ev.copy(code =
      code"""
        |${vecCode.code}
        |boolean ${ev.isNull} = true;
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |if (!${vecCode.isNull}) {
        |  org.apache.spark.sql.catalyst.util.GenericArrayData $result =
        |    $self.select(${vecCode.value});
        |  if ($result != null) { ${ev.isNull} = false; ${ev.value} = $result; }
        |}
      """.stripMargin)
  }

  override def prettyName: String = "nearest_centroids"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NearestCentroids =
    copy(vec = newFirst, cents = newSecond, nprobe = newThird)
}

object NearestCentroids {
  def nearestCentroids(vec: Column, cents: Column, nprobe: Column): Column =
    GraftColumnBridge.column(NearestCentroids(
      GraftColumnBridge.expression(vec),
      GraftColumnBridge.expression(cents),
      GraftColumnBridge.expression(nprobe)))
}
