package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric arrays: each element is
  * widened to double and the products accumulate STRICTLY left-to-right
  * from index 0 — the same association as `VectorFunctions.dot`'s
  * `zip_with`+`aggregate` formulation and as the unrolled left-assoc
  * SQL `oracleDotSql` emits for DuckDB, so results stay bit-identical
  * across all three.
  *
  * Why it exists (and not just the higher-order form): inside a join
  * consume path the HOF tree allocates an intermediate array per pair
  * (`zip_with`) and interprets two lambdas; this expression is a tight
  * codegen'd loop over the two `ArrayData` — the difference is ~10× on
  * the all-pairs embedding dedup. Shorter array decides the length
  * (zip semantics); null input or null element propagates null. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => elemType(e) match {
      case FloatType | DoubleType | LongType | IntegerType | ShortType => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product expects numeric arrays, got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  /** Null can arise from a null INPUT or from a null ELEMENT (zip
    * semantics propagate it), so nullability must account for
    * `containsNull` of either array — inheriting only child nullability
    * would let the planner mark this non-nullable over two non-null
    * array columns while eval can still return null (and codegen would
    * assign into a constant-false isNull — a janino compile error). */
  override def nullable: Boolean =
    left.nullable || right.nullable ||
      Seq(left, right).exists(_.dataType match {
        case ArrayType(_, cn) => cn
        case _ => true
      })

  private def getter(et: DataType, arr: String, i: String): String = et match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  private def readDouble(et: DataType, a: ArrayData, i: Int): Double = et match {
    case FloatType   => a.getFloat(i).toDouble
    case DoubleType  => a.getDouble(i)
    case LongType    => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (lt, rt) = (elemType(left), elemType(right))
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var acc = 0.0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += readDouble(lt, a, i) * readDouble(rt, b, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val (lt, rt) = (elemType(left), elemType(right))
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  $acc += ${getter(lt, a, i)} * ${getter(rt, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dotNative(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      DotProduct(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
