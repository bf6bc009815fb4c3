package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the full MinHash signature of a shingle
  * array in ONE pass — for each of the `a.length` affine hash functions
  * h_i(u) = (a_i·u + b_i) mod p over u = xxhash64(shingle, seed 42)
  * masked to 32 bits, the minimum over all shingles.
  *
  * Replaces the explode → per-shingle 64-hash `transform` →
  * element-wise-min UDAF pipeline: that shape needed a SHUFFLE to
  * reassemble per-doc signatures and evaluated 64 interpreted lambda
  * hashes per (doc, shingle) row (~10 s of the sf0.1 bench on its
  * own). This is a narrow per-row loop — no shuffle at all, signatures
  * stay with their row — and whole-stage codegen keeps the surrounding
  * projection fused (single call via a reference object).
  *
  * The affine ranges must satisfy a_i < 2^30, b_i < 2^30 so
  * a_i·u + b_i < 2^63 for u < 2^32 (no Long overflow); the modulus p
  * must exceed 2^32 so distinct u values stay distinguishable.
  * Empty input → empty array (docs with no shingles produce no
  * signature, mirroring what explode did); null propagates null. */
case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long], p: Long)
    extends UnaryExpression {
  require(a.nonEmpty && a.length == b.length, "need matched hash coefficient vectors")
  require(p > (1L << 32), "modulus must exceed 2^32")
  require(a.forall(x => x > 0 && x < (1L << 30)) && b.forall(x => x >= 0 && x < (1L << 30)),
    "coefficients must fit the overflow-free range")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray

  def compute(shingles: ArrayData): ArrayData = {
    val k = aArr.length
    val n = shingles.numElements()
    if (n == 0) new GenericArrayData(Array.emptyLongArray)
    else {
      val sig = Array.fill(k)(Long.MaxValue)
      var j = 0
      while (j < n) {
        val s = shingles.getUTF8String(j)
        val u = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L) &
          0xFFFFFFFFL
        var i = 0
        while (i < k) {
          val h = (aArr(i) * u + bArr(i)) % p
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        j += 1
      }
      new GenericArrayData(sig)
    }
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("minhashSig", this, classOf[MinHashSignature].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  def minhashSignature(c: Column, a: Seq[Long], b: Seq[Long], p: Long): Column =
    GraftColumnBridge.column(
      MinHashSignature(GraftColumnBridge.expression(c), a, b, p))

  /** The library's CANONICAL 64-hash universal family h_i(u) =
    * (a_i·u + b_i) mod p over the 32-bit image of xxhash64 — one
    * deterministic derivation shared by the dedup pipeline
    * ([[graft.ops.DedupOps]]), the durable index, and the SQL
    * registration ([[GraftFunctions]]), so a signature computed
    * through any surface buckets identically. p is the smallest prime
    * > 2^32 (the modulus breaks the affine map's monotonicity —
    * without it every h_i elects the same min-u shingle); coefficient
    * ranges keep ANSI Long arithmetic overflow-free (a_i < 2^30,
    * u < 2^32 ⇒ a_i·u + b_i < 2^63). */
  val StdP = 4294967311L
  val (stdA, stdB): (Seq[Long], Seq[Long]) = {
    val rng = new scala.util.Random(42)
    val a = Seq.fill(64)((rng.nextLong() & ((1L << 30) - 1)) | 1L)
    val b = Seq.fill(64)(rng.nextLong() & ((1L << 30) - 1))
    (a, b)
  }
}
