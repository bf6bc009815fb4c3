package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native IVF assignment must agree EXACTLY with the declarative
  * higher-order formulation it replaced — same distances, same
  * (dist, id) tie-break — at every nlist, in both interpreted and
  * whole-stage-codegen evaluation. The HOF form lives on here as the
  * test oracle (it was correct, just catastrophically slow at large
  * nlist: InterpretedOrdering per row). ONE deliberate divergence:
  * null vectors / null elements DROP from the index (null array →
  * explode drops the row) where the HOF form emitted null-distance
  * rows into arbitrary cells — pinned by its own test below. */
class NearestCentroidsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark

  import graft.functions.VectorFunctions.{dot, normSq}

  /** The replaced array_sort(transform(...)) formulation, verbatim. */
  private def hofAssign(vecs: org.apache.spark.sql.DataFrame,
                        cents: Seq[(Int, Array[Double])],
                        vecCol: String, outCol: String, nprobe: Int) = {
    val centsLit = typedLit(cents.map(_._2.toSeq))
    val idsLit = typedLit(cents.map(_._1))
    val c2Lit = typedLit(cents.map { case (_, c) => c.map(x => x * x).sum })
    val scored = transform(centsLit, (c, i) =>
      struct(
        (col("_vn2") - lit(2.0) * dot(col(vecCol), c) + get(c2Lit, i)).as("dist"),
        get(idsLit, i).as("cent_id")))
    vecs.withColumn("_vn2", normSq(col(vecCol)))
      .withColumn(outCol,
        explode(transform(slice(array_sort(scored), 1, nprobe), s => s.getField("cent_id"))))
      .drop("_vn2")
  }

  /** Deterministic pseudo-random doubles (no Math.random in tests). */
  private def vec(seed: Int, dim: Int): Array[Double] =
    Array.tabulate(dim)(j => ((seed * 2654435761L + j * 40503L) % 1000L) / 250.0 - 2.0)

  private def run(vecs: Seq[(Long, Array[Float])],
                  cents: Seq[(Int, Array[Double])], nprobe: Int,
                  codegen: Boolean): Seq[(Long, Int)] = {
    val s = spark
    import s.implicits._
    val factory = if (codegen) "CODEGEN_ONLY" else "NO_CODEGEN"
    s.conf.set("spark.sql.codegen.factoryMode", factory)
    try {
      val df = vecs.toDF("id", "v")
      graft.ops.SimilarityOps.assignNearest(df, cents, "v", "cell", nprobe)
        .select(col("id"), col("cell"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
    } finally s.conf.unset("spark.sql.codegen.factoryMode")
  }

  test("agrees with the HOF oracle at several nlist/nprobe shapes, interpreted and codegen") {
    val s = spark
    import s.implicits._
    val dim = 16
    val vecs = (0 until 64).map(i => (i.toLong, vec(i, dim).map(_.toFloat)))
    for (k <- Seq(3, 17, 80); nprobe <- Seq(1, 5, 9)) {
      // non-contiguous, unsorted ids: the tie-break must be BY ID
      val cents = (0 until k).map(i => ((i * 7 + 3) % (k * 7), vec(1000 + i, dim)))
      val expected = hofAssign(vecs.toDF("id", "v"), cents.sortBy(_._1), "v", "cell", nprobe)
        .select(col("id"), col("cell"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toSeq
      assert(run(vecs, cents, nprobe, codegen = false) == expected,
        s"interpreted diverged at k=$k nprobe=$nprobe")
      assert(run(vecs, cents, nprobe, codegen = true) == expected,
        s"codegen diverged at k=$k nprobe=$nprobe")
    }
  }

  test("distance ties break by centroid id; nprobe > nlist returns all cells") {
    // two IDENTICAL centroids under ids 9 and 4: every vector is
    // equidistant — id 4 must always rank first
    val c = vec(7, 8)
    val cents = Seq(9 -> c, 4 -> c.clone())
    val vecs = (0 until 8).map(i => (i.toLong, vec(i, 8).map(_.toFloat)))
    val got = run(vecs, cents, nprobe = 1, codegen = true)
    assert(got.forall(_._2 == 4), s"tie must break to the lower id: $got")
    // nprobe beyond nlist: all cells, still (dist, id)-ordered
    val all = run(vecs.take(1), cents, nprobe = 5, codegen = false)
    assert(all.map(_._2) == Seq(4, 9))
  }

  test("exact-match vector assigns exactly; null element / null vector DROP (intentional divergence from the HOF oracle)") {
    val s = spark
    import s.implicits._
    val cents = Seq(0 -> vec(1, 4), 1 -> vec(2, 4), 2 -> vec(3, 4))
    // a vector EQUAL to centroid 1: dist 0 (possibly -0.0 by rounding)
    val exact = Seq((0L, cents(1)._2.map(_.toFloat)))
    assert(run(exact, cents, 1, codegen = true).head._2 == 1)
    // null element and null vector: the native expression returns a
    // NULL array and explode drops the row from the index. The HOF
    // form it replaced emitted rows with null distances (landing in
    // arbitrary-but-deterministic cells) — an INTENTIONAL divergence:
    // a vector with no defined distance has no meaningful cell, and
    // indexing it under a garbage cell could never serve a correct
    // neighbor. This test pins the drop semantics on the serve path.
    val withNulls = Seq(
      (0L, Array[java.lang.Float](1.0f, null, 2.0f, 3.0f)),
      (1L, null.asInstanceOf[Array[java.lang.Float]]),
      (2L, Array[java.lang.Float](1.0f, 2.0f, 3.0f, 4.0f)))
    val df = withNulls.toDF("id", "v")
    val out = graft.ops.SimilarityOps.assignNearest(df, cents, "v", "cell", 2)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(2L, 2L), s"null vec/element rows must drop, got $out")
  }

  test("expression TREE is O(1) in nlist, and no sort evaluates per row") {
    val s = spark
    import s.implicits._
    val vecs = Seq((0L, vec(0, 8).map(_.toFloat))).toDF("id", "v")
    def shape(k: Int) = {
      val cents = (0 until k).map(i => (i, vec(i, 8)))
      val plan = graft.ops.SimilarityOps.assignNearest(vecs, cents, "v", "cell", 5)
        .queryExecution.executedPlan
      // count expression NODES (a typedLit matrix is ONE Literal node
      // however many centroids it holds — the thing that exploded in
      // the replaced forms was node count / per-row sort work)
      val nodes = plan.flatMap(p => p.expressions.flatMap(e =>
        e.collect { case x => x })).size
      (nodes, plan.toString)
    }
    val ((nSmall, _), (nBig, planBig)) = (shape(4), shape(1024))
    assert(nBig == nSmall,
      s"expression tree grew with nlist: $nSmall nodes at k=4 vs $nBig at k=1024")
    assert(!planBig.contains("array_sort"),
      "the assignment must not plan a per-row array_sort")
    assert(planBig.contains("nearest_centroids"),
      "the native expression must be in the plan")
  }
}
