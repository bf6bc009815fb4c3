package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the DISTINCT word n-gram shingles of a
  * string, split on single spaces — semantically identical to the
  * higher-order formulation
  * `array_distinct(transform(sequence(1, size(w)-n+1), i ->
  * concat_ws(' ', element_at(w,i), …)))` over `split(text, ' ')`, but
  * one tight byte-level pass instead of per-element interpreted
  * lambdas (the HOF tree costs ~0.7 ms/doc — it was the single largest
  * line in the dedup bench; this is ~50× cheaper and keeps the
  * projection inside whole-stage codegen via a single static-shaped
  * call).
  *
  * Key observation making the byte pass exact: words are the segments
  * between single spaces, and the shingle joins consecutive words with
  * single spaces — so shingle i is EXACTLY the byte slice of the input
  * from the start of word i to the end of word i+n−1 (runs of spaces
  * reproduce themselves through empty words). Deduplication preserves
  * first-occurrence order like `array_distinct`.
  *
  * Returns an empty array when the input has fewer than n words; null
  * input propagates null.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be at least 1 word")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string input, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    // word start offsets (a word starts at 0 and after every space)
    val starts = mutable.ArrayBuffer(0)
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) starts += i + 1
      i += 1
    }
    val nWords = starts.length
    if (nWords < n) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new mutable.HashSet[UTF8String]
      val out = new mutable.ArrayBuffer[Any]
      var w = 0
      while (w <= nWords - n) {
        val from = starts(w)
        // end of word w+n-1: next start minus the separator, or EOS
        val until = if (w + n < nWords) starts(w + n) - 1 else bytes.length
        val sh = UTF8String.fromBytes(bytes, from, until - from)
        if (seen.add(sh)) out += sh
        w += 1
      }
      new GenericArrayData(out.toArray)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def wordShingles(c: Column, n: Int): Column =
    GraftColumnBridge.column(
      WordShingles(GraftColumnBridge.expression(c), n))
}
