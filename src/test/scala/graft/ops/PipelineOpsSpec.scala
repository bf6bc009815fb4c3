package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("decontaminate: covers every doc; probe docs are contaminated by construction") {
    val r = PipelineOps.p_decontaminate(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(r.length == total)
    val probes = r.filter(_.getBoolean(1))
    assert(probes.nonEmpty)
    // every probe doc with >=8 words overlaps itself
    probes.foreach { p => assert(p.getBoolean(3), s"probe ${p.getLong(0)} not flagged") }
    // n_hits is bounded by the doc's own distinct-shingle count
    assert(r.forall(_.getLong(2) >= 0))
  }

  test("mixture sample: per-source keep rates honor the quota ordering") {
    val docs = Tables.documents(spark, sf)
    val kept = PipelineOps.p_mixture_sample(spark, sf)
    val rates = docs.groupBy("source").count().as("t")
      .join(kept.groupBy("source").count().withColumnRenamed("count", "k"), "source")
      .select(col("source"), (col("k") / col("count")).as("rate"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val hiSrc = Set("src0", "src1", "src2", "src3", "src4")
    val midSrc = Set("src5", "src6", "src7", "src8", "src9")
    val hi = rates.collect { case (k, v) if hiSrc(k) => v }
    val lo = rates.collect { case (k, v) if !hiSrc(k) && !midSrc(k) => v }
    assert(hi.nonEmpty && lo.nonEmpty)
    assert(hi.sum / hi.size > lo.sum / lo.size,
      s"high-quota sources must keep more: hi=$hi lo=$lo")
    // determinism: same rows on a second run
    assert(kept.collect().toSeq == PipelineOps.p_mixture_sample(spark, sf).collect().toSeq)
  }

  test("mixture bucket survives huge doc_ids under ANSI (no Long overflow)") {
    import spark.implicits._
    // doc_id = 10^10 would overflow doc_id * 2654435761 (> Long.MaxValue);
    // the mod-before-multiply form must evaluate without an ANSI error
    // and stay congruent to the mathematical value.
    val ids = Seq(10000000000L, Long.MaxValue / 2, 3500000001L, 7L).toDF("doc_id")
    val buckets = ids
      .withColumn("bucket",
        (col("doc_id") % 1000003L) * lit(2654435761L) % 1000003L % 1000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    buckets.foreach { case (id, b) =>
      val expect = (BigInt(id) * BigInt(2654435761L)) % 1000003 % 1000
      assert(BigInt(b) == expect, s"doc_id=$id")
      assert(b >= 0 && b < 1000)
    }
  }

  test("stratified sample: exactly min(|source|, 30) docs per source, rank contiguous") {
    val got = PipelineOps.p_stratified_sample(spark, sf).collect()
      .groupBy(_.getString(1))
    val sizes = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == sizes.keySet.filter(sizes(_) > 0))
    got.foreach { case (src, rows) =>
      assert(rows.length == math.min(sizes(src), 30L), s"source $src")
      assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to rows.length), s"ranks for $src")
    }
    // deterministic across runs
    val again = PipelineOps.p_stratified_sample(spark, sf).collect()
    assert(again.map(r => (r.getLong(0), r.getInt(2))).toSeq ==
      PipelineOps.p_stratified_sample(spark, sf).collect()
        .map(r => (r.getLong(0), r.getInt(2))).toSeq)
  }

  test("pii scrub: exactly the two planted emails per doc are found and removed") {
    val r = PipelineOps.p_pii_scrub(spark, sf).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getInt(1) == 2), "each doc carries exactly 2 planted addresses")
    // scrubbed text must contain no residual email-shaped tokens
    val residual = Tables.documents(spark, sf)
      .withColumn("text2", concat(col("text"),
        lit(" contact u"), col("doc_id"), lit("@mail.example.com or adm"),
        col("doc_id"), lit("@corp.net thanks")))
      .select(regexp_count(
        regexp_replace(col("text2"), "[a-z0-9]+@[a-z0-9.]+[a-z0-9]", "[EMAIL]"),
        lit("[a-z0-9]+@[a-z0-9.]+[a-z0-9]")).as("n"))
      .agg(sum("n")).head.getLong(0)
    assert(residual == 0L)
  }
}
