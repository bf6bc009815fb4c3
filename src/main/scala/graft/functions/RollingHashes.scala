package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Karp-Rabin rolling hashes of every
  * k-byte window of a string — `h_i = (Σ_j b_{i+j}·B^{k-1-j}) mod P`,
  * maintained INCREMENTALLY (subtract the outgoing byte's B^{k-1}
  * term, shift, add the incoming byte), so one row costs O(len)
  * instead of the O(len·k) of the equivalent
  * `transform(sequence(...), i -> aggregate(sequence(0,k-1), ...))`
  * higher-order formulation — and the whole loop participates in
  * whole-stage codegen via [[doGenCode]] instead of interpreting a
  * nested lambda tree per position.
  *
  * This is the engine's custom-`Expression` capability proof (builder
  * brief preference (b): codegen'd Catalyst expression over UDF).
  * Semantics match the DuckDB oracle in `TextOps` exactly for ASCII
  * input (both walk one unit per character; the oracle's
  * `ascii(substr(...))` equals the byte value there). `B` and `P` are
  * small enough that every intermediate stays below 2^31 — no Long
  * overflow under ANSI arithmetic.
  *
  * Returns an empty array when the input is shorter than k bytes;
  * null input propagates null.
  */
case class RollingHashes(child: Expression, k: Int, base: Long, mod: Long)
    extends UnaryExpression {
  require(k >= 1, "window must be at least 1 byte")
  // Two products must stay below 2^62: h*base (h < mod) in the append
  // step, and (byte & 0xFF)*topWeight (topWeight < mod) in the rolling
  // subtract — so the bound is mod * max(base, 255), not mod * base.
  require(mod > 1 && base > 1 && mod * math.max(base, 255L) < (1L << 62),
    "P*max(B,255) must fit in a Long")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hashes expects a string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  /** B^(k-1) mod P — the outgoing byte's positional weight. */
  private lazy val topWeight: Long = {
    var w = 1L
    var i = 1
    while (i < k) { w = w * base % mod; i += 1 }
    w
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length - k + 1
    if (n <= 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](n)
      var h = 0L
      var j = 0
      while (j < k) { h = (h * base + (bytes(j) & 0xFF)) % mod; j += 1 }
      out(0) = h
      var i = 1
      while (i < n) {
        h = ((h + mod - (bytes(i - 1) & 0xFF) * topWeight % mod) % mod * base +
          (bytes(i + k - 1) & 0xFF)) % mod
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = $bytes.length - $k + 1;
         |if ($n <= 0) {
         |  ${ev.value} = new ${classOf[GenericArrayData].getName}(new long[0]);
         |} else {
         |  long[] $out = new long[$n];
         |  long $h = 0L;
         |  for (int $j = 0; $j < $k; $j++) {
         |    $h = ($h * ${base}L + ($bytes[$j] & 0xFF)) % ${mod}L;
         |  }
         |  $out[0] = $h;
         |  for (int $i = 1; $i < $n; $i++) {
         |    $h = (($h + ${mod}L - ($bytes[$i - 1] & 0xFF) * ${topWeight}L % ${mod}L)
         |            % ${mod}L * ${base}L + ($bytes[$i + $k - 1] & 0xFF)) % ${mod}L;
         |    $out[$i] = $h;
         |  }
         |  ${ev.value} = new ${classOf[GenericArrayData].getName}($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}

object RollingHashes {
  /** Column-API entry point. */
  def rollingHashes(c: Column, k: Int, base: Long, mod: Long): Column =
    GraftColumnBridge.column(
      RollingHashes(GraftColumnBridge.expression(c), k, base, mod))
}
