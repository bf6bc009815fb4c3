package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (ArrayType(FloatType),
  * 64-dim).
  *
  *   - [[bruteForceTopK]]: exact cosine top-k — the correctness
  *     baseline. The query side is tiny and BROADCAST; the candidate
  *     scan is a single codegen'd pass (the 64-term dot product unrolls
  *     into whole-stage codegen, no UDF). Per-query top-k via window,
  *     never a global sort.
  *   - [[ivfTopK]]: the scale path — IVF-style coarse quantization.
  *     Centroids (here: per-label mean vectors, deterministic) are
  *     broadcast; every vector is assigned to its nearest centroid ONCE
  *     (narrow map), queries probe the `nprobe` nearest centroids, and
  *     exact reranking touches only those buckets. At 100 TB the
  *     candidate join shuffles on centroid id, pruning the scan to
  *     ~nprobe/ncentroids of the data.
  */
object SimilarityOps {
  val Dim = 64

  /** (qid, qe) × (cid, ce) exact cosine, integerized to e6 for exact
    * cross-engine comparison, top-k per query. Norms are precomputed
    * ONCE per vector (narrow pass before the join), so each pair costs
    * one compact `aggregate` dot product — the join-side expression
    * stays small enough for whole-stage codegen (the unrolled 64-term
    * fold overflowed janino inside the join consume and fell back to
    * interpreted eval). Same accumulation order ⇒ same oracle. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val q = queries.withColumn("qn", sqrt(normSq(col("qe"))))
    val c = candidates.withColumn("cn", sqrt(normSq(col("ce"))))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cos_e6",
        round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")) * 1e6).cast("long"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos_e6"), col("cid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("cid"), col("cos_e6"))
  }

  /** Deterministic centroids: element-wise mean embedding per label. */
  def labelCentroids(e: DataFrame): DataFrame =
    e.select(col("label"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos")).agg(avg(col("v")).as("m"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label").as("cent_id"), expr("transform(pm, x -> x.m)").as("cvec"))

  /** Nearest-`nprobe` centroid assignment as a NARROW map: the (tiny)
    * centroid set is folded into one array-of-structs row, broadcast,
    * and each vector ranks it with per-row array ops (`transform` →
    * `array_sort` → `slice`). No shuffle, no window — at 100 TB this is
    * a single codegen'd pass over the candidates, vs the row_number
    * formulation which sorts the whole table. Ties break on cent_id
    * (struct sort order: dist, then cent_id). */
  private def assignNearest(vecs: DataFrame, cents: DataFrame, vecCol: String,
                            outCol: String, nprobe: Int): DataFrame = {
    val centArr = cents.agg(collect_list(struct(col("cent_id"), col("cvec"))).as("cents"))
    val ranked =
      s"""transform(
         |  slice(
         |    array_sort(transform(cents, c -> struct(
         |      aggregate(zip_with(CAST($vecCol AS array<double>), c.cvec,
         |                         (x, y) -> (x - y) * (x - y)),
         |                0.0D, (acc, v) -> acc + v) AS dist,
         |      c.cent_id AS cent_id))),
         |    1, $nprobe),
         |  s -> s.cent_id)""".stripMargin
    vecs.crossJoin(broadcast(centArr))
      .withColumn(outCol, explode(expr(ranked)))
      .drop("cents")
  }

  /** IVF: assign candidates to 1 centroid, probe `nprobe` centroids per
    * query, exact-rerank inside the probed buckets. */
  def ivfTopK(e: DataFrame, queries: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val cents = labelCentroids(e)
    val cands = e.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val assigned = assignNearest(cands, cents, "ce", "cent", 1)
    val probed = assignNearest(queries, cents, "qe", "cent", nprobe)
    val scored = assigned.withColumn("cn", sqrt(normSq(col("ce"))))
      .join(probed.withColumn("qn", sqrt(normSq(col("qe")))), "cent")
      .withColumn("cos_e6",
        round(dot(col("qe"), col("ce")) / (col("qn") * col("cn")) * 1e6).cast("long"))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cos_e6"), col("cid"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("qid"), col("rk"), col("cid"), col("cos_e6"), col("cent"))
  }

  // ------------------------------------------------------------ queries

  type Q = (SparkSession, String) => DataFrame

  private def querySide(e: DataFrame): DataFrame =
    e.filter(col("vec_id") < 8).select(col("vec_id").as("qid"), col("embedding").as("qe"))
  private def candSide(e: DataFrame): DataFrame =
    e.filter(col("vec_id") >= 8).select(col("vec_id").as("cid"), col("embedding").as("ce"))

  val s_cosine_topk: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    bruteForceTopK(querySide(e), candSide(e), k = 5)
      .orderBy(col("qid"), col("rk"))
  }

  val s_ann_ivf: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    ivfTopK(e, querySide(e), k = 5, nprobe = 5)
      .orderBy(col("qid"), col("rk"))
  }

  val queries: Map[String, Q] = Map(
    "s_cosine_topk" -> s_cosine_topk,
    "s_ann_ivf" -> s_ann_ivf,
  )

  val oracles: Map[String, String] = {
    val cos = oracleCosineSql("qe", "ce", Dim)
    Map(
      "s_cosine_topk" ->
        s"""WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 8),
           |     c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id >= 8),
           |     s AS (SELECT qid, cid,
           |             CAST(ROUND($cos * 1000000) AS BIGINT) AS cos_e6
           |           FROM c CROSS JOIN q)
           |SELECT qid, rk, cid, cos_e6 FROM (
           |  SELECT qid, cid, cos_e6,
           |    CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos_e6 DESC, cid) AS INTEGER) AS rk
           |  FROM s) t
           |WHERE rk <= 5 ORDER BY qid, rk""".stripMargin,
      // s_ann_ivf: approximate path, no SQL oracle — recall vs the
      // brute-force baseline is asserted in SimilarityOpsSpec instead.
    )
  }
}
