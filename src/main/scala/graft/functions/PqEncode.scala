package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst product-quantization encoder: one pass over a
  * numeric vector producing, for each of `sub` contiguous subspaces of
  * `subDim` dims, the id of the nearest codebook entry (squared
  * euclidean, ties to the LOWER id). Output is an `array<int>` of
  * length `sub` — the PQ code word.
  *
  * Why a custom expression: the Column-algebra formulation (per
  * subspace: `slice` + an `array` of k dist/id structs + argmin) builds
  * an expression tree of k × sub struct constructors; after projection
  * collapse the optimizer re-inlines the slice and norm sub-expressions
  * into every struct entry, janino compiles megabytes of generated
  * code, and the encode pass runs ~3× the arithmetic with per-entry
  * allocations. This expression is the FAISS encode loop: O(sub · k ·
  * subDim) flops per row, zero allocations beyond the k · subDim
  * codebook (shipped once per task as a reference object), fully
  * inside whole-stage codegen.
  *
  * The codebook rides in the expression as immutable Seqs (structural
  * equality keeps expression canonicalization sound) and is flattened
  * to one `double[]` — entry c of subspace j starts at
  * `(j·k + c) · subDim`.
  */
case class PqEncode(child: Expression, books: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private def elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case FloatType | DoubleType | LongType | IntegerType | ShortType =>
      // every book must have the SAME entry count (k) and every entry
      // the same subDim: the flat (j·k + c)·subDim layout silently
      // mis-indexes later books if an earlier one is shorter
      if (books.nonEmpty &&
          books.forall(b => b.length == books.head.length &&
            b.nonEmpty && b.forall(_.length == books.head.head.length)))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        "pq_encode: ragged or empty codebooks (every subspace needs the same " +
          "entry count and every entry the same sub-dimension)")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects a numeric array, got ${child.dataType.catalogString}")
  }

  @transient private lazy val sub = books.length
  @transient private lazy val k = books.head.length
  @transient private lazy val subDim = books.head.head.length
  @transient private lazy val flat: Array[Double] = {
    val a = new Array[Double](sub * k * subDim)
    var p = 0
    for (b <- books; c <- b; x <- c) { a(p) = x; p += 1 }
    a
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  /** Null for a null input, a vector shorter than sub·subDim, or a
    * null element — mirrored exactly in codegen. */
  override def nullable: Boolean = true

  private def readDouble(a: ArrayData, i: Int): Double = elemType match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case LongType    => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    if (arr.numElements() < sub * subDim) return null
    val codes = new Array[Int](sub)
    var j = 0
    while (j < sub) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var d = 0.0
        var t = 0
        val base = (j * k + c) * subDim
        while (t < subDim) {
          val idx = j * subDim + t
          if (arr.isNullAt(idx)) return null
          val diff = readDouble(arr, idx) - flat(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  private def getter(arr: String, i: String): String = elemType match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val booksRef = ctx.addReferenceObj("pqBooks", flat, "double[]")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val done = ctx.freshName("done")
      s"""
         |boolean $done = false;
         |if ($v.numElements() < ${sub * subDim}) { ${ev.isNull} = true; $done = true; }
         |int[] $codes = new int[$sub];
         |for (int $j = 0; $j < $sub && !$done; $j++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k && !$done; $c++) {
         |    double $d = 0.0;
         |    for (int $t = 0; $t < $subDim; $t++) {
         |      if ($v.isNullAt($j * $subDim + $t)) { ${ev.isNull} = true; $done = true; break; }
         |      double $diff = ${getter(v, s"($j * $subDim + $t)")} - $booksRef[($j * $k + $c) * $subDim + $t];
         |      $d += $diff * $diff;
         |    }
         |    if (!$done && $d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$j] = $best;
         |}
         |${ev.value} = $done ? null : new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Encode `vec` against per-subspace codebooks given as
    * (id, centroid) seqs ordered by id. */
  def pqEncode(vec: Column, books: Seq[Seq[(Int, Array[Double])]]): Column =
    GraftColumnBridge.column(
      PqEncode(GraftColumnBridge.expression(vec),
        books.map(_.sortBy(_._1).map(_._2.toSeq))))
}
