package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.WordShingles.wordShingles

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between dedup and training — decontamination, mixture sampling, PII
  * scrubbing. Like the dedup family, fixtures that lack the target
  * phenomenon get it PLANTED deterministically (both engines replay the
  * construction), so every query is non-vacuous and DuckDB-hash-checked.
  *
  *   - [[p_decontaminate]]: benchmark-overlap decontamination — count
  *     the 8-gram shingles each document shares with a probe set (the
  *     stand-in "benchmark" = the `doc_id % 97 == 0` slice of the
  *     corpus). One shingle shuffle + a broadcast of the (small) probe
  *     set; at 100 TB the probe side is benchmark suites (MMLU, GSM8K,
  *     …) — a few MB, always broadcastable.
  *   - [[p_mixture_sample]]: deterministic hash-based mixture sampling
  *     with per-source quotas — the "data mixing" step that up/down
  *     weights sources. A pure narrow filter: no shuffle, no RNG state,
  *     reproducible across engines and retries (sampling by hash, not
  *     by `rand()`, is the only correct choice under task retry).
  *   - [[p_stratified_sample]]: exact fixed-n per-source sampling via
  *     salted two-phase windows — the "n examples per stratum" eval-set
  *     constructor, de-skewed like q_topk_per_group.
  *   - [[p_pii_scrub]]: PII detection + redaction over text with
  *     planted contact strings; counts and scrubbed-content hashes are
  *     compared cross-engine. Narrow single-scan projection.
  */
object PipelineOps {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------- decontamination

  private val ProbeMod = 97
  private val ShingleN = 8

  /** Overlap of each doc's 8-gram shingles with the probe slice. Probe
    * docs trivially overlap themselves and stay in the output with
    * `is_probe = true` (a real run would filter them — one line — but
    * keeping them makes the check non-vacuous by construction);
    * contamination of non-probe docs comes from planted near-dups. */
  val p_decontaminate: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val sh = docs.select(col("doc_id"),
      explode(wordShingles(col("text"), ShingleN)).as("s8"))
    val probe = sh.filter(col("doc_id") % ProbeMod === 0).select("s8").distinct()
    val hits = sh.join(broadcast(probe), "s8")
      .groupBy("doc_id").agg(countDistinct(col("s8")).as("n_hits"))
    docs.select(col("doc_id"), (col("doc_id") % ProbeMod === 0).as("is_probe"))
      .join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("is_probe"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------- mixture sampling

  /** Per-source keep-quota out of 1000. */
  private def quota = // CASE over the source name: a tiny literal table
    when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 900L)
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 500L)
      .otherwise(200L)

  /** Deterministic mixture sample: keep a doc iff
    * ((doc_id·2654435761) mod 1000003) mod 1000 < quota(source).
    * The Knuth multiplier + prime mod mixes sequential ids; everything
    * is exact BIGINT arithmetic both engines replay. doc_id is reduced
    * mod 1000003 BEFORE the multiply — congruent (mod-multiplication
    * commutes with reduction), but the raw product would exceed
    * Long.MaxValue for doc_id ≳ 3.5×10⁹ and under ANSI mode that is a
    * runtime ERROR, not a wrap; the reduced product stays < 2.7×10¹⁵. */
  val p_mixture_sample: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("bucket",
        (col("doc_id") % 1000003L) * lit(2654435761L) % 1000003L % 1000L)
      .filter(col("bucket") < quota)
      .select(col("doc_id"), col("source"), col("bucket"))
      .orderBy(col("doc_id"))

  // -------------------------------------------- stratified sampling

  /** Per-source sample size. */
  private val StratN = 30

  /** Exact fixed-n stratified sample: the smallest `StratN` docs per
    * source by Knuth-mixed hash order — deterministic, retry-safe, and
    * exactly n per stratum (vs the RATE quotas of
    * [[p_mixture_sample]]). Scale shape: `source` has only ~10 values,
    * so a single window over it would sort each stratum in one task —
    * instead phase 1 takes a salted local top-n per (source, salt) and
    * phase 2 re-ranks the ≤ sources·salts·n survivors (tiny), the same
    * de-skew shape as `q_topk_per_group`. The mix reduces doc_id mod
    * 1000003 BEFORE the multiply (same ANSI-overflow-safe congruence
    * as the mixture sampler). */
  val p_stratified_sample: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val key = (col("doc_id") % 1000003L) * lit(2654435761L) % 1000003L
    val salted = Tables.documents(s, d)
      .withColumn("k", key)
      .withColumn("salt", pmod(col("doc_id"), lit(16)))
    val w1 = Window.partitionBy(col("source"), col("salt")).orderBy(col("k"), col("doc_id"))
    val survivors = salted
      .withColumn("rk1", row_number().over(w1))
      .filter(col("rk1") <= StratN)
    val w2 = Window.partitionBy(col("source")).orderBy(col("k"), col("doc_id"))
    survivors
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= StratN)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------ token budget fill

  /** Character budget per source and the key-range bucket count of the
    * distributed prefix sum. */
  private val BudgetChars = 3000L
  private val BudgetBuckets = 16

  /** Budget-fill sampling — the step that assembles a fixed-size
    * training mixture: walk each source's documents in deterministic
    * Knuth-mixed hash order and keep documents until the source's
    * character budget is spent (a doc is kept iff the budget was not
    * yet exhausted BEFORE it). The running total is a
    * TWO-PHASE DISTRIBUTED PREFIX SUM, the textbook scan: phase 1
    * computes local running sums inside (source, key-range bucket) —
    * range bucketing by the SAME key that orders the walk keeps bucket
    * order consistent with global order; phase 2 computes each
    * bucket's offset from the per-bucket totals (a `sources ×
    * buckets` relation — tiny, broadcast back). No single task ever
    * scans a whole source: a one-window-per-source formulation would
    * put a 10 TB source's full sort in one straggler task, the exact
    * shape `p_stratified_sample` de-skews for top-n. The oracle
    * replays the plain per-source window — a hash match proves the
    * two-phase scan equals the sequential prefix sum. */
  val p_token_budget: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val key = (col("doc_id") % 1000003L) * lit(2654435761L) % 1000003L
    val bucketed = Tables.documents(s, d)
      .withColumn("k", key)
      .withColumn("bkt", expr(s"(k * $BudgetBuckets) div 1000003").cast("int"))
    val wLocal = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("cum_local",
      coalesce(sum(col("n_chars")).over(wLocal), lit(0L)))
    val wOff = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("source"), col("bkt"))
      .agg(sum(col("n_chars")).as("bt"))
      .withColumn("off", coalesce(sum(col("bt")).over(wOff), lit(0L)))
      .select(col("source"), col("bkt"), col("off"))
    local.join(broadcast(offsets), Seq("source", "bkt"))
      .withColumn("cum_before", col("cum_local") + col("off"))
      .filter(col("cum_before") < lit(BudgetChars))
      .select(col("doc_id"), col("source"), col("n_chars"), col("cum_before"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------- PII scrub

  private val EmailRe = "[a-z0-9]+@[a-z0-9.]+[a-z0-9]"

  /** Detection + redaction over text with two planted contact strings
    * per doc (the corpus itself is email-free, so counts are exactly
    * 2·docs and the scrubbed hash is fully determined). */
  val p_pii_scrub: Q = (s, d) =>
    Tables.documents(s, d)
      .withColumn("text2", concat(col("text"),
        lit(" contact u"), col("doc_id"), lit("@mail.example.com or adm"),
        col("doc_id"), lit("@corp.net thanks")))
      .select(col("doc_id"),
        regexp_count(col("text2"), lit(EmailRe)).as("n_pii"),
        substring(sha2(regexp_replace(col("text2"), EmailRe, "[EMAIL]"), 256), 1, 16)
          .as("scrubbed_hash16"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------ registry

  val queries: Map[String, Q] = Map(
    "p_decontaminate" -> p_decontaminate,
    "p_mixture_sample" -> p_mixture_sample,
    "p_stratified_sample" -> p_stratified_sample,
    "p_token_budget" -> p_token_budget,
    "p_pii_scrub" -> p_pii_scrub,
  )

  val oracles: Map[String, String] = Map(
    "p_decontaminate" ->
      s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${ShingleN - 1})) AS i FROM words),
         |sh AS (SELECT DISTINCT doc_id,
         |         ${(0 until ShingleN).map(j => s"w[i+$j]").mkString(" || ' ' || ")} AS s8
         |       FROM idx),
         |probe AS (SELECT DISTINCT s8 FROM sh WHERE doc_id % $ProbeMod = 0),
         |hits AS (SELECT doc_id, count(DISTINCT sh.s8) AS n_hits
         |         FROM sh JOIN probe ON sh.s8 = probe.s8 GROUP BY doc_id)
         |SELECT d.doc_id, d.doc_id % $ProbeMod = 0 AS is_probe,
         |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  COALESCE(h.n_hits, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
         |ORDER BY d.doc_id""".stripMargin,
    "p_mixture_sample" ->
      """SELECT doc_id, source,
        |  (((doc_id % 1000003) * 2654435761) % 1000003) % 1000 AS bucket
        |FROM documents
        |WHERE (((doc_id % 1000003) * 2654435761) % 1000003) % 1000 <
        |  CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 900
        |       WHEN source IN ('src5','src6','src7','src8','src9') THEN 500
        |       ELSE 200 END
        |ORDER BY doc_id""".stripMargin,
    "p_stratified_sample" ->
      s"""SELECT doc_id, source, rk FROM (
         |  SELECT doc_id, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY ((doc_id % 1000003) * 2654435761) % 1000003, doc_id)
         |      AS INTEGER) AS rk
         |  FROM documents) t
         |WHERE rk <= $StratN ORDER BY doc_id""".stripMargin,
    "p_token_budget" ->
      s"""WITH c AS (
         |  SELECT doc_id, source, n_chars,
         |    COALESCE(SUM(n_chars) OVER (PARTITION BY source
         |      ORDER BY ((doc_id % 1000003) * 2654435761) % 1000003, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM documents)
         |SELECT doc_id, source, n_chars, CAST(cum_before AS BIGINT) AS cum_before
         |FROM c WHERE cum_before < $BudgetChars ORDER BY doc_id""".stripMargin,
    "p_pii_scrub" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    text || ' contact u' || doc_id || '@mail.example.com or adm' ||
        |      doc_id || '@corp.net thanks' AS text2
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(text2, '[a-z0-9]+@[a-z0-9.]+[a-z0-9]')) AS INTEGER) AS n_pii,
        |  substr(sha256(regexp_replace(text2, '[a-z0-9]+@[a-z0-9.]+[a-z0-9]', '[EMAIL]', 'g')), 1, 16)
        |    AS scrubbed_hash16
        |FROM t ORDER BY doc_id""".stripMargin,
  )
}
