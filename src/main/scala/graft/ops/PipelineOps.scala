package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.WordShingles.wordShingles
import graft.functions.VectorFunctions.{dotHof, normSq, oracleNormSqSql}

/** Corpus-curation operators a large-scale training-data pipeline runs
  * between dedup and training — decontamination, mixture sampling, PII
  * scrubbing. Like the dedup family, fixtures that lack the target
  * phenomenon get it PLANTED deterministically (both engines replay the
  * construction), so every query is non-vacuous and DuckDB-hash-checked.
  *
  *   - [[p_decon_served]]: the decontamination screen served from the
  *     PERSISTED text index — rare-token posting probes + exact
  *     verify over only candidate docs; identical rows to the inline
  *     path at eval-set-proportional cost.
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
  *   - [[p_cdc_apply]]: change-data-capture compaction — collapse an
  *     insert/update/delete change stream to final table state via
  *     `max(struct(seq, …))` per key: ONE shuffle with map-side
  *     partial aggregation, no per-key sort (the window-function
  *     formulation the oracle replays would sort every key group).
  *   - [[p_url_dedup]]: URL canonicalization + keep-earliest dedup —
  *     the crawl-curation step that collapses `?utm_…`/fragment/case/
  *     trailing-slash variants of one page. Narrow canonicalization,
  *     one hash shuffle.
  *   - [[p_sequence_pack]]: greedy sequence packing — assemble
  *     documents into fixed-capacity training sequences. Packing is a
  *     sequential scan, so it is SHARDED: each shard's walk is
  *     independent, shards pack in parallel, and no task ever walks
  *     the whole corpus. The oracle replays the identical walk as a
  *     recursive CTE — a hash match proves the distributed shard walk
  *     equals the sequential one.
  *   - [[p_weighted_sample]]: weighted sampling without replacement
  *     (Efraimidis–Spirakis exponential keys, hash-derived randomness)
  *     — the quality-weighted curation draw, planned as a distributed
  *     top-k (TakeOrderedAndProject), never a global sort.
  *   - [[p_host_rank]]: host-level PageRank over a planted link graph
  *     in exact fixed-point integer arithmetic — iterative join+agg
  *     with the edge list partitioned once and reused, bit-identical
  *     to the oracle's recursive-CTE replay.
  *   - [[p_triangle_count]]: per-host triangle participation via
  *     degree-oriented wedge generation — O(m^1.5) total work with
  *     every task bounded by O(√m) out-degrees, where the naive
  *     formulation puts a celebrity host's k² wedges in one task.
  */
object PipelineOps {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------- decontamination

  private[graft] val ProbeMod = 97
  private val ShingleN = 8

  /** Overlap of each doc's 8-gram shingles with the probe slice. Probe
    * docs trivially overlap themselves and stay in the output with
    * `is_probe = true` (a real run would filter them — one line — but
    * keeping them makes the check non-vacuous by construction);
    * contamination of non-probe docs comes from planted near-dups. */
  val p_decontaminate: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val evalSh = evalShingleSet(docs.filter(col("doc_id") % ProbeMod === 0))
    deconTail(docs, deconHitsInline(docs, evalSh))
  }

  /** Distinct [[ShingleN]]-gram shingles of an eval corpus — the probe
    * set both decon paths screen against. */
  private[graft] def evalShingleSet(evalDocs: DataFrame): DataFrame =
    evalDocs.select(explode(wordShingles(col("text"), ShingleN)).as("s8")).distinct()

  /** Exact per-doc overlap via the INLINE corpus join — shingles every
    * doc, broadcast-joins the eval set. Corpus-proportional work. */
  private[graft] def deconHitsInline(docs: DataFrame, evalSh: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(wordShingles(col("text"), ShingleN)).as("s8"))
      .join(broadcast(evalSh), "s8")
      .groupBy("doc_id").agg(countDistinct(col("s8")).as("n_hits"))

  /** The shared output shape: every doc with its probe flag, hit
    * count, and contamination verdict. */
  private def deconTail(docs: DataFrame, hits: DataFrame): DataFrame =
    docs.select(col("doc_id"), (col("doc_id") % ProbeMod === 0).as("is_probe"))
      .join(hits, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("is_probe"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).as("contaminated"))
      .orderBy(col("doc_id"))

  /** INDEX-SERVED decontamination — [[p_decontaminate]]'s production
    * shape at 100 TB: screening a NEW eval set must not re-shingle the
    * corpus (the inline join's corpus-sized shuffle per eval release);
    * it probes the PERSISTED text index instead. Three bounded steps:
    *
    *  1. the eval set's distinct 8-gram shingles (eval-set-sized — a
    *     benchmark suite, not a corpus) pick each shingle's RAREST
    *     token from the index's persisted vocab stats (min df, tok —
    *     one broadcast join against the vocab-sized stats table);
    *  2. ONLY those tokens' posting buckets are read (manifest bucket
    *     pointers, the [[TextIndexStore]] serve discipline; the
    *     in-bucket token filter is a broadcast semi-join — an eval
    *     set's token list outgrows a pushed IN literal), yielding a
    *     candidate doc superset: any doc containing an eval shingle
    *     necessarily contains its rarest token;
    *  3. exact verify re-shingles ONLY the candidate docs (semi-join
    *     pruned corpus read) and counts distinct eval shingles per doc
    *     — the same shingle definition as the inline path, so the
    *     result is IDENTICAL, not approximate.
    *
    * Work scales with Σ posting length of the eval shingles' rare
    * tokens + candidate-doc text, never the corpus; the SAME DuckDB
    * oracle as [[p_decontaminate]] (the full exact-overlap replay)
    * hash-checks that the served path loses and invents nothing. The
    * driver-side collect is the rare-token list — bounded by the eval
    * shingle count by construction. */
  val p_decon_served: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val evalSh = evalShingleSet(docs.filter(col("doc_id") % ProbeMod === 0))
    deconTail(docs,
      deconHitsServed(s, docs, evalSh, TextOps.persistedTextIndexDir(s, d)))
  }

  /** Exact per-doc overlap SERVED from a persisted [[TextIndexStore]]
    * over `docs` — the three bounded steps of [[p_decon_served]],
    * parameterized over the eval set and index so the scale bench can
    * time it against [[deconHitsInline]] on the ×R corpus. */
  private[graft] def deconHitsServed(s: SparkSession, docs: DataFrame,
                                     evalSh: DataFrame, dir: String): DataFrame = {
    val m = TextIndexStore.open(dir)
    val shTok = evalSh.select(col("s8"), explode(split(col("s8"), " ")).as("tok"))
    val stats = s.read.parquet(s"$dir/${m.stats}")
    val rare = shTok.join(stats, Seq("tok"))
      .groupBy(col("s8"))
      .agg(min(struct(col("df"), col("tok"))).getField("tok").as("rtok"))
    val rareRows = rare.select(col("rtok")).distinct()
      .withColumn("bucket",
        pmod(xxhash64(col("rtok")), lit(m.numBuckets.toLong)).cast("int"))
      .collect().map(r => (r.getString(0), r.getInt(1)))
    if (rareRows.isEmpty) { // no eval shingles: nothing can contaminate
      import org.apache.spark.sql.types._
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("n_hits", LongType))))
    } else {
      val bucketPaths = rareRows.map(_._2).distinct.sorted
        .flatMap(m.buckets.get).map(rel => s"$dir/$rel")
      val rtoks = s.createDataFrame(rareRows.toSeq).toDF("rtok", "b").select("rtok")
      val candDocs = s.read.parquet(bucketPaths: _*)
        .join(broadcast(rtoks), col("tok") === col("rtok"), "left_semi")
        .select(col("doc_id")).distinct()
      val candSh = docs.join(candDocs, Seq("doc_id"), "left_semi")
        .select(col("doc_id"),
          explode(wordShingles(col("text"), ShingleN)).as("s8"))
      candSh.join(broadcast(evalSh), "s8")
        .groupBy(col("doc_id")).agg(countDistinct(col("s8")).as("n_hits"))
    }
  }

  // -------------------------------------------------- mixture sampling

  /** Per-source keep-quota out of 1000. */
  private def quota = // CASE over the source name: a tiny literal table
    when(col("source").isin("src0", "src1", "src2", "src3", "src4"), 900L)
      .when(col("source").isin("src5", "src6", "src7", "src8", "src9"), 500L)
      .otherwise(200L)

  /** THE deterministic-randomness primitive every sampler/shuffler here
    * shares: Knuth multiplicative mix of doc_id under a prime modulus,
    * with doc_id reduced mod 1000003 BEFORE the multiply — congruent
    * (mod-multiplication commutes with reduction), and the reduced
    * product stays < 2.7×10¹⁵ where the raw product would overflow
    * Long (an ANSI runtime ERROR, not a wrap) for doc_id ≳ 3.5×10⁹.
    * One definition on the Scala side and one SQL fragment for the
    * oracles, so an arithmetic change can never drift between the six
    * call sites and their DuckDB twins (the ANN recall witnesses got
    * the same consolidation in round 10). */
  private def knuthKey(c: Column): Column =
    (c % 1000003L) * lit(2654435761L) % 1000003L

  private def knuthKeySql(col: String): String =
    s"($col % 1000003) * 2654435761 % 1000003"

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
        knuthKey(col("doc_id")) % 1000L)
      .filter(col("bucket") < quota)
      .select(col("doc_id"), col("source"), col("bucket"))
      .orderBy(col("doc_id"))

  // ------------------------------------- training-order global shuffle

  /** Output shard count for [[p_train_shuffle]]. At 100 TB this is
    * thousands — shard size, not shard count, is the bounded quantity. */
  private val TrainShards = 8

  /** Deterministic global shuffle + sharding — the "randomize training
    * order" step every pretraining pipeline runs between curation and
    * tokenization, without `rand()`: each doc gets a Knuth-mixed key
    * (same ANSI-overflow-safe congruence as [[p_mixture_sample]]),
    * shard = key mod [[TrainShards]], position = rank of the key
    * within its shard. Retry-safe and re-runnable (a lost task or a
    * rerun reproduces the identical order — `rand()` would not), and
    * cross-engine exact, so the ENTIRE permutation is hash-checked
    * against DuckDB, not just its size.
    *
    * Scale shape: the WORK is one hash exchange on `shard` plus a
    * per-shard sort of N/shards rows (the window's partition) — shard
    * count is sized so a shard fits a task, and at scale each shard is
    * then WRITTEN in that order (`repartition(shard).
    * sortWithinPartitions(key)`); a global `orderBy(key)` would
    * range-partition and sort everything for an order nobody reads
    * across shard boundaries. The trailing `orderBy(shard, pos)` here
    * is the fixture's presentation sort for oracle determinism (the
    * convention SCALING.md's header excludes from every query's
    * shuffle count), not part of the operator's shape. */
  val p_train_shuffle: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val key = knuthKey(col("doc_id")).as("key")
    val w = Window.partitionBy(col("shard")).orderBy(col("key"), col("doc_id"))
    Tables.documents(s, d)
      .select(col("doc_id"), key)
      .withColumn("shard", col("key") % TrainShards)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("shard"), col("pos"), col("doc_id"))
      .orderBy(col("shard"), col("pos"))
  }

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
    val key = knuthKey(col("doc_id"))
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

  /** BPE-token budget per source and the key-range bucket count of the
    * distributed prefix sum. Budgets are set in REAL tokenizer tokens
    * ([[graft.functions.BpeTokenizer]], the committed merge table) —
    * the unit training mixtures are actually specified in — not
    * characters or whitespace pieces. */
  private val BudgetTokens = 800L
  private val BudgetBuckets = 16

  /** Budget-fill sampling — the step that assembles a fixed-size
    * training mixture: walk each source's documents in deterministic
    * Knuth-mixed hash order and keep documents until the source's
    * BPE-token budget is spent (a doc is kept iff the budget was not
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
    val key = knuthKey(col("doc_id"))
    val bucketed = TextOps.bpeSourceTokens(s, d)
      .withColumn("k", key)
      .withColumn("bkt", expr(s"(k * $BudgetBuckets) div 1000003").cast("int"))
    val wLocal = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("cum_local",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    val wOff = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("source"), col("bkt"))
      .agg(sum(col("n_tokens")).as("bt"))
      .withColumn("off", coalesce(sum(col("bt")).over(wOff), lit(0L)))
      .select(col("source"), col("bkt"), col("off"))
    local.join(broadcast(offsets), Seq("source", "bkt"))
      .withColumn("cum_before", col("cum_local") + col("off"))
      .filter(col("cum_before") < lit(BudgetTokens))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("cum_before"))
      .orderBy(col("doc_id"))
  }

  /** Context length of the contiguous training stream
    * ([[p_contig_pack]]) — the fixed chunk the GPT-style loader cuts. */
  private val ContigChunk = 256L
  private val ContigBuckets = 32

  /** CONTIGUOUS token-stream layout — the Megatron/GPT dataset shape,
    * the alternative to [[p_sequence_pack]]'s greedy bins: every doc is
    * concatenated in the deterministic training order (the
    * [[p_train_shuffle]] Knuth key) into ONE logical token stream, and
    * the loader cuts that stream at exact [[ContigChunk]] boundaries —
    * docs SPAN chunks (zero padding waste), so what the layout job must
    * produce is each doc's exact global offset. That is a global
    * prefix sum, computed scalably by the same two-phase trick as
    * [[p_token_budget]]: per-bucket local window (bounded partitions),
    * then bucket offsets from a [[ContigBuckets]]-row aggregate window
    * broadcast back. first/last chunk and the in-chunk offset are pure
    * integer division over the offset — the whole layout is one
    * shuffle plus a B-row window, at any corpus size. Token counts are
    * the committed BPE tokenizer's; DuckDB replays count, prefix sum,
    * and chunk arithmetic exactly. */
  val p_contig_pack: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val key = knuthKey(col("doc_id"))
    val bucketed = TextOps.bpeSourceTokens(s, d)
      .withColumn("k", key)
      .withColumn("bkt", expr(s"(k * $ContigBuckets) div 1000003").cast("int"))
    val wLocal = Window.partitionBy(col("bkt"))
      .orderBy(col("k"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed.withColumn("cum_local",
      coalesce(sum(col("n_tokens")).over(wLocal), lit(0L)))
    val wOff = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("bkt"))
      .agg(sum(col("n_tokens")).as("bt"))
      .withColumn("off", coalesce(sum(col("bt")).over(wOff), lit(0L)))
      .select(col("bkt"), col("off"))
    local.join(broadcast(offsets), Seq("bkt"))
      .withColumn("start_tok", col("cum_local") + col("off"))
      .select(col("doc_id"), col("n_tokens"), col("start_tok"),
        expr(s"start_tok div $ContigChunk").as("first_chunk"),
        expr(s"(start_tok + n_tokens - 1) div $ContigChunk").as("last_chunk"),
        (col("start_tok") % ContigChunk).as("off_in_chunk"))
      .orderBy(col("doc_id"))
  }

  /** Token budget per training chunk for [[p_doc_chunk]]. */
  private val ChunkTokens = 64L

  /** Context-window document chunking — the step between curation and
    * sequence packing: long documents split into ≤-budget chunks so no
    * single document blows the training context. Piece-granular and
    * OFFSET-DETERMINISTIC: each whitespace piece carries its BPE token
    * count ([[graft.functions.BpeTokenizer]], same per-task memo as
    * `t_bpe_tokens`), a per-doc prefix sum assigns every piece the
    * chunk `floor(tokens_before / budget)` — a pure window + integer
    * division, no greedy reset state, so the same formula runs in
    * DuckDB and the chunk map is hash-matched end-to-end. (A piece
    * straddling a boundary belongs to the chunk where it starts, so a
    * chunk can exceed the budget by at most one piece — the documented
    * trade for a stateless, distributable rule.) The per-doc window is
    * skew-safe: its partition is one document's pieces, bounded by doc
    * length, never a user/corpus-sized key. */
  val p_doc_chunk: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val pieces = Tables.documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Integer]()
        it.flatMap { case (id, text) =>
          text.split(' ').iterator.filter(_.nonEmpty).zipWithIndex.map { case (w, i) =>
            var n = memo.get(w)
            if (n == null) {
              n = graft.functions.BpeTokenizer.encodePiece(w).length
              memo.put(w, n)
            }
            (id, i.toLong, n.toLong)
          }
        }
      }
      .toDF("doc_id", "piece_idx", "piece_tokens")
    val w = Window.partitionBy(col("doc_id")).orderBy(col("piece_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    pieces
      .withColumn("cum_before", coalesce(sum(col("piece_tokens")).over(w), lit(0L)))
      .withColumn("chunk_id", expr(s"cum_before div $ChunkTokens"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_pieces"), sum(col("piece_tokens")).as("n_tokens"),
        min(col("piece_idx")).as("first_piece"))
      .orderBy(col("doc_id"), col("chunk_id"))
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

  // ------------------------------------------------- dataset card

  /** DATASET CARD — the per-source "nutrition label" a corpus release
    * ships: document and character counts, exact BPE token totals (the
    * committed tokenizer — what a training-budget plan is actually
    * priced in), min/max doc length, and the quality-gate pass rate
    * (the [[p_curate_apply]] ≥-[[MinWords]] rule, so the card reports
    * the same gate the pipeline enforces). One corpus pass for the
    * token counts + one map-side-combined aggregate — the report costs
    * what a count does at 100 TB. Exact integers everywhere; the
    * oracle replays the BPE counts and the word-gate rule. */
  val p_dataset_card: Q = (s, d) => {
    val toks = TextOps.bpeSourceTokens(s, d)
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        (size(split(col("text"), " ")) >= MinWords).as("pass_gate"))
    toks.join(docs, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(col("n_tokens")).as("sum_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"),
        sum(when(col("pass_gate"), 1L).otherwise(0L)).as("n_pass_gate"))
      .orderBy(col("source"))
  }

  // ------------------------------------- golden-record survivorship

  /** FIELD-LEVEL SURVIVORSHIP (the MDM golden-record merge): one
    * record per entity where EACH FIELD follows its own rule — latest
    * wins for the status field, latest NON-NULL wins for the amount
    * (sparse fields must not be blanked by a recent row that lacks
    * them — the way row-level LWW like [[p_cdc_apply]]/`st_cdc` would),
    * min/max for the lifecycle timestamps, sum for the counter. Nulls
    * are PLANTED (`event_id % 7` blanks the amount), so for real
    * entities the latest row IS a null row and the two rules genuinely
    * diverge — spec-asserted non-vacuous. Every rule is one
    * `max(struct(ts, field))` / conditional variant inside a single
    * per-entity aggregate: one shuffle, order-independent,
    * batch-slicing-independent (each rule is associative+commutative),
    * so the same merge runs incrementally at 100 TB. The oracle
    * replays each rule with `struct_pack` arg-maxes. */
  val p_golden_record: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("user_id"),
      unix_micros(col("ts")).as("tus"), col("event_type"),
      when(col("event_id") % 7 === 0, lit(null).cast("long"))
        .otherwise(round(col("value") * 100).cast("long")).as("cents"))
    ev.groupBy(col("user_id"))
      .agg(
        max(struct(col("tus"), col("event_type"))).getField("event_type")
          .as("last_type"),
        max(when(col("cents").isNotNull, struct(col("tus"), col("cents"))))
          .getField("cents").as("last_cents"),
        min(col("tus")).as("first_tus"),
        max(col("tus")).as("last_tus"),
        count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  // --------------------------------------- leakage-proof dataset split

  /** LEAKAGE-PROOF train/val/test split — the split step of a training
    * pipeline, keyed so evaluation can't see training data through a
    * near-duplicate: the split key is the doc's near-dup CLUSTER label
    * (connected components over the verified near-dup pair graph;
    * singletons key on their own id), so an entire cluster lands on
    * ONE side by construction. Keying on doc_id — or even on source,
    * in this corpus — provably leaks (the spec exhibits straddling
    * near-dup pairs under both). Assignment is the same exact-integer
    * Knuth hash as every sampler here (deterministic, re-runnable,
    * engine-exact), 8/1/1 over hash mod 10.
    *
    * Scale shape — the labels come from the PERSISTED cluster
    * artifact ([[DedupOps.clusterArtifactDir]]), NOT an inline rerun
    * of LSH → verify → connected components: a corpus team derives
    * clusters once per corpus version and every consumer joins the
    * stored table. The artifact is pair-graph-sized (tiny vs corpus),
    * so the split is ONE broadcast probe over the corpus scan — zero
    * exchanges beyond the final 3-row aggregate. The spec proves the
    * artifact-backed split row-identical to an inline-derived one. */
  val p_leakage_split: Q = (s, d) =>
    leakageSplitFrom(s, d, s.read.parquet(DedupOps.clusterArtifactDir(s, d)))

  /** The split body over an explicit (doc_id, cluster, …) label table
    * — factored out so the spec can run the same logic over
    * inline-derived labels and prove artifact ≡ inline. */
  private[graft] def leakageSplitFrom(s: SparkSession, d: String,
                                      clusterLabels: DataFrame): DataFrame = {
    val labels = clusterLabels.select(col("doc_id"), col("cluster"))
    val keyed = Tables.documents(s, d)
      .join(broadcast(labels), Seq("doc_id"), "left")
      .withColumn("grp", coalesce(col("cluster"), col("doc_id")))
    val k = knuthKey(col("grp")) % 10L
    keyed
      .withColumn("split",
        when(k < 8, "train").when(k === 8, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("grp")).as("n_groups"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("split"))
  }

  // ------------------------------------------------ end-to-end curation

  /** Synthetic id offset for re-crawled copies (stage 0) — far above
    * any fixture doc_id, so survivors keep their original ids. */
  private val RecrawlOffset = 1000000L
  private val MinWords = 30

  /** The END-TO-END curation pipeline run to its product — the
    * composition certificate for the curation family, exactly what
    * [[graft.ops.DedupOps.d_dedup_apply]] is for dedup. Stages, in
    * production order, over a simulated re-crawl (src0 re-ingested
    * under synthetic ids so the dedup stage is non-vacuous):
    *
    *   1. quality gate — keep docs with ≥ [[MinWords]] words (the
    *      cheap narrow filter runs FIRST, shrinking everything after);
    *   2. exact dedup — keep the min-id copy per sha2(text) group;
    *   3. decontamination — drop benchmark docs (the `%97` probe
    *      slice) and anything sharing an 8-gram shingle with them
    *      (broadcast probe set, as in [[p_decontaminate]]);
    *   4. mixture sampling — the [[p_mixture_sample]] hash rule.
    *
    * One DuckDB hash over the surviving (doc_id, source) set certifies
    * the whole composition: stage order, each stage's semantics, and
    * the re-crawl construction. Every stage is a narrow filter, a
    * single hash aggregate, or a broadcast semi/anti join — the
    * composition adds no shuffle beyond its parts. */
  val p_curate_apply: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val corpus = docs.select(col("doc_id"), col("text"), col("source"))
      .unionByName(docs.filter(col("source") === "src0")
        .select((col("doc_id") + RecrawlOffset).as("doc_id"), col("text"), col("source")))
    val quality = corpus.filter(size(split(col("text"), " ")) >= MinWords)
    val keepers = quality.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val deduped = quality.join(keepers, Seq("doc_id"), "left_semi")
    val probeSh = docs.filter(col("doc_id") % ProbeMod === 0)
      .select(explode(wordShingles(col("text"), ShingleN)).as("s8"))
      .distinct()
    val docSh = deduped.select(col("doc_id"),
      explode(wordShingles(col("text"), ShingleN)).as("s8"))
    val contaminated = docSh.join(broadcast(probeSh), "s8").select("doc_id").distinct()
    val clean = deduped.filter(col("doc_id") % ProbeMod =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
    clean
      .filter(knuthKey(col("doc_id")) % 1000L < quota)
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------- CDC apply

  /** CDC upsert/delete compaction to final table state. The change
    * stream is PLANTED from `orders` (both engines replay the same
    * construction): every key gets an INSERT at seq `key·10+1`; keys
    * ≡ 0 (mod 3) get an UPDATE (+1000 cents) at `key·10+2`; keys ≡ 0
    * (mod 7) get a DELETE at `key·10+3`. Final state = the
    * highest-seq change per key, dropped if it is a delete.
    *
    * Money is integer cents (`round(price·100)` — TPC-H prices have 2
    * decimals, so ·100 is never near a rounding boundary) to keep the
    * cross-engine compare exact. `key·10+3` stays in Long for any key
    * ≤ Long.MaxValue/10 — no ANSI overflow at any realistic keyspace.
    *
    * Scale shape: the latest-change-wins reduce is
    * `max(struct(seq, cents))` + `count` in ONE hash aggregate —
    * map-side partials combine before the single shuffle, and no key
    * group is ever sorted (a `row_number` window would shuffle AND
    * sort; `max` is associative, so skewed keys combine locally).
    * Deletes are dropped AFTER the reduce: a delete must win over
    * earlier updates, not vanish before the comparison. */
  val p_cdc_apply: Q = (s, d) => {
    val base = Tables.orders(s, d).select(
      col("o_orderkey").as("k"),
      round(col("o_totalprice") * 100).cast("long").as("cents"))
    val ins = base.select(col("k"), (col("k") * 10 + 1).as("seq"),
      lit("I").as("op"), col("cents"))
    val upd = base.filter(col("k") % 3 === 0)
      .select(col("k"), (col("k") * 10 + 2).as("seq"),
        lit("U").as("op"), (col("cents") + 1000).as("cents"))
    val del = base.filter(col("k") % 7 === 0)
      .select(col("k"), (col("k") * 10 + 3).as("seq"),
        lit("D").as("op"), lit(null).cast("long").as("cents"))
    ins.unionByName(upd).unionByName(del)
      .groupBy(col("k"))
      .agg(max(struct(col("seq"), col("op"), col("cents"))).as("last"),
        count(lit(1)).as("n_changes"))
      .filter(col("last.op") =!= "D")
      .select(col("k").as("o_orderkey"), col("last.seq").as("last_seq"),
        col("last.cents").as("final_cents"), col("n_changes"))
      .orderBy(col("o_orderkey"))
  }

  // ------------------------------------------------------- URL dedup

  /** URL canonicalization + keep-earliest dedup. URLs are PLANTED
    * deterministically (the corpus has no url column): doc_id maps to
    * one of 120 logical pages dressed in four surface variants —
    * upper/lower-case host, trailing slash, `?utm_…` tracking query,
    * `#fragment` — so every canonical group has genuine case/suffix
    * diversity. Canonical form = lowercase, fragment stripped, query
    * stripped, trailing slash trimmed — `split_part`/`rtrim`/`lower`
    * have identical semantics in Spark and DuckDB, so both engines
    * replay the same normalization.
    *
    * Scale shape: canonicalization is a narrow projection; the dedup
    * is one hash aggregate (`min` keeper + `count`) with map-side
    * partials — the same single-shuffle shape as `d_dedup_exact`,
    * keyed on canonical URL instead of a content hash. */
  val p_url_dedup: Q = (s, d) => {
    val url = concat(
      lit("https://"),
      when(col("doc_id") % 2 === 0, "WWW").otherwise("www"),
      lit(".site"), col("doc_id") % 40,
      lit(".Example.com/page/"), col("doc_id") % 120,
      when(col("doc_id") % 4 === 1, "/")
        .when(col("doc_id") % 4 === 2, "?utm_source=feed&utm_campaign=x")
        .when(col("doc_id") % 4 === 3, "#section-2")
        .otherwise(""))
    val canon = lower(rtrim(
      expr("split_part(split_part(url, '#', 1), '?', 1)"), "/"))
    Tables.documents(s, d)
      .withColumn("url", url)
      .withColumn("canon_url", canon)
      .groupBy(col("canon_url"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_dups"))
      .orderBy(col("canon_url"))
  }

  // --------------------------------------------------- sequence packing

  /** Pack capacity in characters (n_chars stands in for tokens) and
    * shard count of the parallel walk. */
  private val PackCapacity = 2000L
  private val PackShards = 8

  /** Greedy sequence packing: walk documents in deterministic
    * Knuth-mixed hash order and append each to the current pack; when
    * it would overflow [[PackCapacity]], seal the pack and start a new
    * one (an oversized document gets a pack of its own — the guard
    * `cum > 0` keeps it, and the NEXT document seals it). Emits
    * (doc_id, shard, pack_id, pack_off) — enough for a writer to
    * materialize fixed-size training sequences.
    *
    * Packing is inherently sequential, so the corpus is SHARDED by
    * `doc_id mod 8`: each shard's walk is an independent sequential
    * scan, shards run in parallel, and pack ids are globally unique
    * via `shard·10⁶ + pack_idx`. At 100 TB the shard count scales
    * with the cluster; no task ever walks more than 1/S of the data.
    * This is the one pipeline op where `mapPartitions` is the RIGHT
    * tool (genuine per-partition imperative state): rows are hash-
    * routed by shard and sorted (shard, k, doc_id) within partitions,
    * so each shard is contiguous and the fold resets per shard — the
    * result is identical no matter how shards land on partitions.
    * The oracle replays the IDENTICAL walk as a per-shard recursive
    * CTE; the hash match proves distributed == sequential. */
  val p_sequence_pack: Q = (s, d) => sequencePack(s, Tables.documents(s, d))

  /** Packing core over any (doc_id, n_chars) frame — split out so the
    * property spec can drive it with adversarial synthetic corpora
    * (oversized docs, zero-length docs, huge ids). */
  private[ops] def sequencePack(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    val rows = docs.select(
      col("doc_id"),
      (col("doc_id") % PackShards).cast("int").as("shard"),
      (knuthKey(col("doc_id"))).as("k"),
      col("n_chars"))
      .as[(Long, Int, Long, Long)]
    rows.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("k"), col("doc_id"))
      .mapPartitions { it =>
        var shard = -1
        var pack = 0L
        var cum = 0L
        it.map { case (id, sh, _, n) =>
          if (sh != shard) { shard = sh; pack = 0L; cum = 0L }
          if (cum + n > PackCapacity && cum > 0) { pack += 1; cum = 0L }
          val off = cum
          cum += n
          (id, sh, sh * 1000000L + pack, off)
        }
      }
      .toDF("doc_id", "shard", "pack_id", "pack_off")
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------- host link analysis

  /** PageRank iterations, damping as the exact fraction 85/100, and
    * the integer rank scale (ranks are fixed-point at S parts). */
  private val PrIters = 10
  private val PrScale = 1000000000000L

  /** Host-level PageRank — the link-analysis quality signal crawl
    * curation feeds on (rank a page's HOST, weight its documents).
    * The host graph is PLANTED deterministically (the corpus has no
    * link column): doc_id maps to a source host (mod 40) and a target
    * host under a different modulus (mod 37), so hosts get many
    * distinct outlinks and both engines rebuild the identical graph.
    *
    * The recurrence is EXACT INTEGER arithmetic — fixed-point ranks at
    * [[PrScale]], floor division everywhere:
    * {{{ r'(v) = ((S·15)//100)//N + (85 · Σ_{u→v} r(u)//outdeg(u)) // 100 }}}
    * Integer sums are order-independent, so the distributed aggregation
    * is bit-identical to DuckDB's recursive-CTE replay — no float
    * drift, no tolerance. (Dangling mass is dropped, the standard
    * simplified formulation; floor loss stays in the fixed-point dust.)
    *
    * Scale shape: each iteration is one equi-join of the edge list
    * with the 40-row rank table plus one groupBy(dst) — at 10⁹ edges
    * the edge list is pre-partitioned on src ONCE and every iteration
    * reuses that exchange, ranks being the small broadcast side. 10
    * iterations = 10 shuffles of rank-sized data, never edge-sized.
    *
    * Each round's rank table is eagerly `localCheckpoint`ed (same
    * lineage-truncation pattern as the dedup contraction at
    * [[DedupOps.connectedComponentsWithRounds]]): without it the plan
    * deepens by one join-aggregate per iteration, so analysis and
    * optimization cost grow linearly with rounds. With it, each
    * round's plan is one join-agg over a materialized 40-row RDD;
    * [[PipelineOpsSpec]] asserts the plan size is
    * iteration-count-invariant. The trade is FAULT TOLERANCE, not a
    * gain of it: localCheckpoint blocks live only in executor block
    * managers, so losing an executor fails the job instead of
    * replaying lineage — acceptable for short interactive runs; a
    * 10⁹-edge production iteration would use reliable `checkpoint()`
    * to shared storage (constant plan depth AND survivable executor
    * loss, at the cost of a write per round). */
  val p_host_rank: Q = (s, d) => hostRank(s, d, PrIters)

  /** Materialization width for the O(#rows) per-round iteration tables
    * of [[hostRank]] / [[labelProp]]: one partition per ~1M rows,
    * floored at 1 so the 40-host fixture keeps its single-task
    * checkpoint, capped so a 10⁹-host graph materializes across ~1000
    * tasks instead of one (the round-13 verdict's written-in
    * single-task hazard — the width is now DERIVED from the table
    * size, never a literal). */
  private[ops] def iterWidth(rows: Long): Int =
    math.max(1, math.min(2048, (rows >> 20).toInt))

  private[ops] def hostRank(s: SparkSession, d: String, iters: Int): DataFrame = {
    val docs = Tables.documents(s, d)
    val edges = docs.select((col("doc_id") % 40).as("src"),
        ((col("doc_id") * 7 + 13) % 37).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .repartition(col("src")).cache()
    val hosts = edges.select(col("src").as("h"))
      .union(edges.select(col("dst"))).distinct().cache()
    // out-degrees are loop-invariant: materialize ONCE (the loop used
    // to re-aggregate them from the cached edge list every iteration —
    // one extra aggregate + exchange per round, round 17)
    val outd = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
      .localCheckpoint()
    val n = hosts.count()
    val teleport = ((PrScale * 15) / 100) / n
    var ranks = hosts.withColumn("r", lit(PrScale / n))
    for (it <- 1 to iters) {
      val contrib = edges.join(ranks, edges("src") === ranks("h"))
        .join(outd, "src")
        .groupBy(col("dst")).agg(sum(expr("r DIV od")).as("c"))
      ranks = hosts.join(contrib, hosts("h") === contrib("dst"), "left")
        .select(col("h"),
          (lit(teleport) + expr("85 * coalesce(c, 0L) DIV 100")).as("r"))
      // rank tables are O(#hosts) — collapse to iterWidth(n) partitions
      // before materializing so each round's checkpoint is sized to the
      // rank table (32 near-empty partitions cost ~2× the whole query
      // at fixture scale; one partition is a single-task wall at 10⁹
      // hosts), and the next round's join broadcasts it either way.
      // Checkpoint every OTHER round (round 17): each eager
      // localCheckpoint is a full Spark job, and halving the job count
      // keeps plan depth bounded at ≤ 2 join-aggregates — period-2, so
      // PipelineOpsSpec's iteration-invariance assertion still holds
      // (any even iteration count ends on a checkpoint).
      if (it % 2 == 0 || it == iters)
        ranks = ranks.coalesce(iterWidth(n)).localCheckpoint()
    }
    ranks.join(outd, ranks("h") === outd("src"), "left")
      .select(col("h").as("host"), coalesce(col("od"), lit(0L)).as("outdeg"),
        col("r").as("rank_s"))
      .orderBy(col("host"))
  }

  // -------------------------------------------------- weighted sampling

  /** Sample size of the weighted draw. */
  private val WsK = 100

  /** Weighted sampling WITHOUT replacement via the exponential-race
    * formulation of Efraimidis–Spirakis A-ES: each document draws a
    * uniform `u` and gets key `-ln(u)/w`; the k smallest keys are a
    * distributed-exact weighted sample (inclusion probability tracks
    * weight, no replacement). Weight here is document length — the
    * "sample long documents preferentially" curation draw; any
    * quality score drops in unchanged.
    *
    * `u` is HASH-derived (md5 of doc_id), not `rand()`: the draw is
    * reproducible across engines and — critically at 100 TB — across
    * task retries (a re-executed partition redraws identical keys, so
    * speculative execution can't change the sample). The oracle
    * replays the identical md5 → uniform → key arithmetic.
    *
    * Scale shape: one narrow projection + `orderBy(key).limit(k)`,
    * which Spark plans as TakeOrderedAndProject — per-partition top-k
    * heaps merged on the driver, O(k) memory per task, NO global sort
    * shuffle. The spec pins that plan. */
  val p_weighted_sample: Q = (s, d) => {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("double")
    val w = greatest(col("n_chars"), lit(1L))
    val key = -log((h + lit(0.5)) / lit(4294967296.0)) / w
    Tables.documents(s, d)
      .select(col("doc_id"), col("source"), w.as("w"), key.as("k"))
      .orderBy(col("k"))
      .limit(WsK)
      .select(col("doc_id"), col("source"), col("w"))
      .orderBy(col("doc_id"))
  }

  // -------------------------------------------------- triangle counting

  /** Per-host triangle participation over the planted link graph (the
    * [[p_host_rank]] edge construction, canonicalized undirected) —
    * the local-clustering signal crawl curation uses to separate
    * organic link neighborhoods from link farms (a farm's hosts close
    * far more triangles than organic ones).
    *
    * The scale shape IS the algorithm: a naive triangle join pivots
    * wedges on raw vertices, and one celebrity host with degree k
    * generates k² wedges in a single task — AQE cannot split it,
    * exactly the window-skew problem `q_sessionize_skew` demonstrates
    * for sessions. Instead each undirected edge is ORIENTED from its
    * (degree, id)-smaller endpoint to its larger one, a total order,
    * so every vertex's out-degree is O(√m) and each triangle {a,b,c}
    * has exactly one apex with two out-edges (its (deg,id)-minimum).
    * Wedge generation on oriented `src` is then bounded by out-degree,
    * the closing probe is one equi-join against the canonical edge
    * set, and total work is O(m^1.5) — the bound a 10⁹-edge web graph
    * needs. Counts stay exact: orientation re-orders work, never
    * drops a triangle. The DuckDB oracle counts ordered triples
    * a<b<c, so a hash match proves the oriented plan counts each
    * triangle exactly once. */
  val p_triangle_count: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val und = docs
      .select((col("doc_id") % 40).as("x"), ((col("doc_id") * 7 + 13) % 37).as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct().cache()
    val deg = und.select(col("a").as("v")).union(und.select(col("b")))
      .groupBy(col("v")).agg(count(lit(1)).as("dg"))
    val da = deg.select(col("v").as("a"), col("dg").as("da"))
    val db = deg.select(col("v").as("b"), col("dg").as("db"))
    // orient from (deg, id)-smaller to larger; both dims are broadcast-size
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = und.join(da, "a").join(db, "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
    // wedges from each apex's out-neighborhood (out-degree O(sqrt m));
    // dst < dst2 keeps each unordered wedge once AND id-orders the
    // pair, so closing is a pure equi-join against the canonical
    // (a<b) edge set -> each triangle closes exactly once, at its
    // unique (deg,id)-min apex
    val o2 = oriented.select(col("src"), col("dst").as("dst2"))
    val wedges = oriented.join(o2, "src")
      .filter(col("dst") < col("dst2"))
      .select(col("src"), col("dst").as("a"), col("dst2").as("b"))
    val tri = wedges.join(und, Seq("a", "b"), "left_semi").cache()
    tri.select(col("src").as("host"))
      .union(tri.select(col("a")))
      .union(tri.select(col("b")))
      .groupBy(col("host")).agg(count(lit(1)).as("n_tri"))
      .orderBy(col("host"))
  }

  // ------------------------------------------- BPE training pair count

  /** Merge candidates reported by [[p_bpe_pair_counts]]. */
  private[ops] val BpePairTopK = 20

  /** The distributed round of BPE tokenizer TRAINING — the committed
    * merge table `graft/bpe_merges.txt` that `t_bpe_tokens` encodes
    * with comes from a training loop whose only corpus-scale step is
    * this one: count adjacent symbol pairs across every word
    * occurrence, take the top candidates, pick the merge
    * driver-side, repeat. This op runs the first round (the raw
    * byte-alphabet pairs) and emits the top [[BpePairTopK]]
    * candidates with the deterministic (count desc, pair) tie-break
    * the in-repo trainer uses.
    *
    * Scale shape: one narrow explode (per-word adjacent pairs via an
    * in-row `transform` over positions — no self-join) into a hash
    * aggregate whose key space is bounded by the SYMBOL ALPHABET
    * squared, so map-side partials reduce each task to at most
    * |alphabet|² rows regardless of corpus size, and the top-k plans
    * as TakeOrderedAndProject. A 100 TB training corpus pays one
    * bounded-width shuffle per merge round; the merge pick itself is
    * a KB-sized driver decision, exactly how production tokenizer
    * training splits the work. */
  val p_bpe_pair_counts: Q = (s, d) => {
    val words = Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
    words.select(explode(expr(
        "transform(sequence(1, length(w) - 1), " +
          "i -> struct(substring(w, i, 1) AS a, substring(w, i + 1, 1) AS b))")).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("a"), col("b")).limit(BpePairTopK)
      .orderBy(col("a"), col("b"))
  }

  // ------------------------------------------------- label propagation

  /** Synchronous rounds of [[p_label_prop]] — fixed so both engines
    * replay the identical (possibly pre-convergence) state. */
  private[ops] val LpIters = 4

  /** Community detection by synchronous label propagation over the
    * planted host graph — the clustering signal crawl curation uses
    * to group mutually-linking hosts (complementing [[p_host_rank]]'s
    * centrality and [[p_triangle_count]]'s local density): every host
    * starts as its own label; each round it adopts the label most
    * frequent among its neighbors, ties broken by smallest label so
    * the rounds are fully deterministic. [[LpIters]] synchronous
    * rounds, then each host reports its community and that
    * community's size.
    *
    * Scale shape: the undirected edge list is partitioned ONCE and
    * reused every round; a round is one join (neighbor labels), one
    * (host, label) count aggregate with map-side partials, and a mode
    * pick as a second map-side-combinable aggregate —
    * `max(struct(c, -lbl))` is the argmax under (count DESC, label
    * ASC), the identical tie-break the oracle's ROW_NUMBER applies —
    * so no round ever sorts or windows: a celebrity host's mode costs
    * one combinable max over its distinct labels, not its degree, and
    * there is no per-host ranking exchange at all (the round-13
    * verdict's window was one extra sort+exchange per round). The
    * DuckDB oracle replays the SAME four rounds as a
    * generated CTE chain (window functions are awkward inside
    * recursive CTEs — same technique as the BPE merge replay), so the
    * hash match pins every round's tie-breaks, not just the fixed
    * point.
    *
    * Round labels are `localCheckpoint`ed like [[hostRank]]'s ranks —
    * constant plan depth across rounds (NOT added fault tolerance:
    * see hostRank's doc for the executor-loss trade and the reliable
    * `checkpoint()` variant at production scale). */
  val p_label_prop: Q = (s, d) => labelProp(s, d, LpIters)

  private[ops] def labelProp(s: SparkSession, d: String, iters: Int): DataFrame = {
    val docs = Tables.documents(s, d)
    val dir = docs.select((col("doc_id") % 40).as("x"),
        ((col("doc_id") * 7 + 13) % 37).as("y"))
      .filter(col("x") =!= col("y")).distinct()
    val edges = dir.select(col("x").as("u"), col("y").as("v"))
      .union(dir.select(col("y"), col("x"))).distinct()
      .repartition(col("u")).cache()
    var labels = edges.select(col("u").as("h")).distinct()
      .withColumn("lbl", col("h"))
    val n = labels.count()
    for (it <- 1 to iters) {
      labels = edges.join(labels, edges("v") === labels("h"))
        .groupBy(col("u"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("u"))
        .agg(max(struct(col("c"), (-col("lbl")).as("nl"))).as("m"))
        .select(col("u").as("h"), (-col("m.nl")).as("lbl"))
      // O(#hosts) rows — see hostRank (checkpoint every other round)
      if (it % 2 == 0 || it == iters)
        labels = labels.coalesce(iterWidth(n)).localCheckpoint()
    }
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("comm_size"))
    labels.join(sizes, "lbl")
      .select(col("h").as("host"), col("lbl").as("label"), col("comm_size"))
      .orderBy(col("host"))
  }

  /** DuckDB twin of [[p_label_prop]]: one generated CTE pair per
    * synchronous round. */
  private def labelPropOracle: String = {
    val rounds = (1 to LpIters).map { i =>
      s"""c$i AS (SELECT e.u, l.lbl, COUNT(*) AS c
         |  FROM e2 e JOIN l${i - 1} l ON e.v = l.h GROUP BY e.u, l.lbl),
         |l$i AS (SELECT u AS h, lbl FROM (
         |  SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY c DESC, lbl) AS rk
         |  FROM c$i) WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH d AS (SELECT DISTINCT doc_id % 40 AS x, (doc_id * 7 + 13) % 37 AS y
       |           FROM documents WHERE doc_id % 40 <> (doc_id * 7 + 13) % 37),
       |e2 AS (SELECT x AS u, y AS v FROM d UNION SELECT y, x FROM d),
       |l0 AS (SELECT DISTINCT u AS h, u AS lbl FROM e2),
       |$rounds
       |SELECT f.h AS host, f.lbl AS label, CAST(s.cs AS BIGINT) AS comm_size
       |FROM l$LpIters f JOIN (SELECT lbl, COUNT(*) AS cs FROM l$LpIters GROUP BY lbl) s
       |  USING (lbl)
       |ORDER BY host""".stripMargin
  }

  // ---------------------------------------------------------------- scd2

  /** Type-2 slowly-changing-dimension build from the event stream —
    * the warehouse operator that turns a change log into validity
    * intervals (`valid_from`/`valid_to`/`is_current`), one row per
    * state RUN rather than per event: consecutive events with the
    * same `event_type` collapse into one version (gaps-and-islands
    * change detection via `lag`), and each version's interval closes
    * at the NEXT change's timestamp (`lead`), the open current
    * version carrying the `-1` sentinel so the column stays a
    * non-null BIGINT for exact cross-engine hashing.
    *
    * Scale shape: change detection, version numbering, and interval
    * closing are all windows over the SAME (user_id) partitioning and
    * (t_us, event_id) ordering, so the whole build runs on ONE
    * exchange + one sort — the filter between passes is narrow.
    * Ordering ties on t_us break by event_id in both engines, so the
    * build is deterministic even when a user has two events in the
    * same microsecond. */
  val p_scd2: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("t_us"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"),
        col("event_id"), col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .withColumn("version", row_number().over(w).cast("int"))
      .withColumn("valid_to_us", coalesce(lead(col("t_us"), 1).over(w), lit(-1L)))
      .select(col("user_id"), col("version"), col("event_type").as("state"),
        col("t_us").as("valid_from_us"), col("valid_to_us"),
        (col("valid_to_us") === -1L).as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  // --------------------------------------------------- embedding decon

  /** `cos_e6` threshold above which a corpus vector counts as a
    * semantic copy of a probe. */
  private[ops] val EmbedDecontTauE6 = 900000L

  /** Every `vec_id % EmbedProbeMod == 0` seeds a probe. */
  private[ops] val EmbedProbeMod = 101

  /** Embedding-space decontamination — the semantic companion to the
    * 8-gram [[p_decontaminate]]: flag corpus vectors whose cosine to
    * ANY benchmark probe exceeds a threshold, catching paraphrased
    * contamination that exact n-gram overlap misses. The fixture
    * plants the phenomenon deterministically: probes are the
    * `vec_id % EmbedProbeMod == 0` slice with `+0.25` added to the
    * first coordinate (a paraphrase stand-in — near its source, far
    * from everything else), and BOTH engines replay that
    * construction, so each probe's source vector must flag and the
    * query is non-vacuous on any corpus.
    *
    * Arithmetic is the engine-exact cosine discipline of
    * [[SimilarityOps]]: probe perturbation in double, left-to-right
    * fold dot products matching the oracle's unrolled left-assoc
    * expression, e6 integerization before any comparison.
    *
    * Scale shape: the probe side is a benchmark suite — MBs at 100 TB
    * corpus scale — so it BROADCASTS and the corpus makes ONE narrow
    * pass (per-row cost |probes|·d, no shuffle before the final
    * per-vector aggregate, which reduces on the already-colocated
    * vec_id). The `crossJoin(broadcast(…))` is the documented BNLJ
    * shape of the brute-force cosine family; an IVF-probed variant
    * (only vectors in cells near a probe) drops the constant further
    * when the probe suite grows — [[SimilarityOps.s_ann_ivf]] is that
    * machinery. */
  /** SEMANTIC DEDUPLICATION (the SemDeDup shape): collapse groups of
    * EMBEDDING-near-duplicate documents to one representative each —
    * the curation step that removes paraphrases and near-copies
    * lexical dedup cannot see. Pairs come from the cell-blocked
    * embedding route ([[DedupOps.d_dedup_embedding]]: planted corpus,
    * kmeans-cell blocking, exact cosine ≥ 0.9 inside cells — its own
    * hash check proves the blocking recovers EVERY qualifying pair),
    * the pair graph closes into clusters by the same O(log n)
    * large/small-star [[DedupOps.connectedComponents]] the lexical
    * pipeline uses, and each cluster keeps its min-id member. Output:
    * one row per clustered vector — representative, cluster size, and
    * the keep/drop decision a downstream anti-join applies.
    *
    * DuckDB replays the whole derivation from scratch: the planted
    * corpus construction, the EXHAUSTIVE all-pairs cosine (fixture
    * scale only), and the transitive closure as a recursive CTE — so
    * the hash match proves blocking + iterative CC ≡ brute-force
    * clustering, with zero allowance for a missed pair or a split
    * cluster. Scale shape: nothing all-pairs (cells bound the join),
    * CC converges in O(log n) rounds (spec-asserted on a 64-chain),
    * and the decision table is cluster-members-sized, far below the
    * corpus. */
  val p_semantic_dedup: Q = (s, d) => {
    val pairs = DedupOps.d_dedup_embedding(s, d)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    val labels = DedupOps.connectedComponents(pairs)
    val sizes = labels.groupBy(col("cluster")).agg(count(lit(1)).as("n_cluster"))
    labels.join(sizes, "cluster")
      .select(col("doc_id").as("vec_id"), col("cluster").as("rep_id"),
        col("n_cluster"), col("is_keeper").as("kept"))
      .orderBy(col("vec_id"))
  }

  val p_embed_decon: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
    val probes = e.filter(col("vec_id") % EmbedProbeMod === 0)
      .select(col("vec_id").as("pid"),
        transform(col("embedding"), (x, i) =>
          x.cast("double") + when(i === 0, lit(0.25)).otherwise(lit(0.0))).as("pe"))
      .withColumn("pn", sqrt(aggregate(
        zip_with(col("pe"), col("pe"), (x, y) => x * y), lit(0.0), (a, x) => a + x)))
    // the corpus is scanned IN FULL — the probe sources stay in it
    // (that is the phenomenon: the benchmark leaked into the corpus),
    // so every probe's source vector must flag and the query is
    // non-vacuous by construction
    val corpus = e.withColumn("cn", sqrt(normSq(col("embedding"))))
    corpus.crossJoin(broadcast(probes))
      .withColumn("cos_e6",
        round(dotHof(col("embedding"), col("pe")) / (col("cn") * col("pn")) * 1e6)
          .cast("long"))
      .groupBy(col("vec_id"))
      .agg(max(col("cos_e6")).as("max_cos_e6"),
        sum(when(col("cos_e6") >= EmbedDecontTauE6, 1L).otherwise(0L)).as("n_hit"))
      .withColumn("contaminated", col("n_hit") > 0)
      .orderBy(col("vec_id"))
  }

  /** Unrolled left-assoc SQL for the perturbed-probe cosine — the
    * DuckDB twin of [[p_embed_decon]]'s fold arithmetic. */
  private def embedDeconCosSql: String = {
    val dim = SimilarityOps.Dim
    def pv(i: Int) =
      if (i == 1) s"(CAST(p.embedding[$i] AS DOUBLE)+0.25)"
      else s"CAST(p.embedding[$i] AS DOUBLE)"
    val dot = (1 to dim).map(i => s"CAST(c.embedding[$i] AS DOUBLE)*${pv(i)}")
      .mkString("(", " + ", ")")
    val pn = (1 to dim).map(i => s"${pv(i)}*${pv(i)}").mkString("(", " + ", ")")
    val cn = oracleNormSqSql("c.embedding", dim)
    s"($dot / (sqrt($cn) * sqrt($pn)))"
  }

  // ------------------------------------------------- snapshot diff

  /** Keyed diff of two table snapshots — the data-versioning op every
    * production pipeline runs before promoting a refreshed corpus
    * ("what changed since the last crawl?"). Snapshots are PLANTED
    * deterministically from orders (the fixture has only one version
    * of each table): OLD = keys not divisible by 11, NEW = keys not
    * divisible by 13, with every 5th key's price bumped and every
    * 17th key's priority reclassified. The diff is one FULL OUTER
    * join on the key → status ∈ {added, removed, changed} plus the
    * exact list of changed columns (`concat_ws` skips the NULL CASE
    * arms identically in both engines); unchanged rows are dropped —
    * at 100 TB the diff output is proportional to the CHANGE RATE,
    * not the corpus, which is what makes snapshot promotion reviews
    * tractable.
    *
    * Scale shape: one shuffle per side on the join key (sort-merge at
    * scale, AQE-decided here); the planted mutations are narrow
    * projections. No driver materialization. */
  val p_snapshot_diff: Q = (s, d) => {
    val base = Tables.orders(s, d).select(
      col("o_orderkey").as("k"),
      round(col("o_totalprice") * 100).cast("long").as("cents"),
      col("o_orderpriority").as("prio"))
    val oldSnap = base.filter(col("k") % 11 =!= 0)
    val newSnap = base.filter(col("k") % 13 =!= 0).select(
      col("k"),
      (col("cents") + when(col("k") % 5 === 0, 500L).otherwise(0L)).as("cents"),
      when(col("k") % 17 === 0, "9-RECLASS").otherwise(col("prio")).as("prio"))
    val o = oldSnap.select(col("k").as("ok"), col("cents").as("old_cents"),
      col("prio").as("old_prio"))
    val n = newSnap.select(col("k").as("nk"), col("cents").as("new_cents"),
      col("prio").as("new_prio"))
    o.join(n, col("ok") === col("nk"), "full_outer")
      .withColumn("status",
        when(col("ok").isNull, "added")
          .when(col("nk").isNull, "removed")
          .when(col("old_cents") =!= col("new_cents") ||
            col("old_prio") =!= col("new_prio"), "changed"))
      .filter(col("status").isNotNull)
      .withColumn("changed_cols",
        when(col("status") === "changed", concat_ws(",",
          when(col("old_cents") =!= col("new_cents"), "cents"),
          when(col("old_prio") =!= col("new_prio"), "prio"))))
      .select(coalesce(col("ok"), col("nk")).as("o_orderkey"), col("status"),
        col("old_cents"), col("new_cents"), col("changed_cols"))
      .orderBy(col("o_orderkey"))
  }

  // ---------------------------------------------- mixture weighting

  /** Domain-mixture weight solver — given per-language target shares
    * (ppm, planted: en 400k, de/es/fr/zh 150k each — sums to 1M), the
    * upsampling weight each language needs so the mixed corpus hits
    * the target. All arithmetic is exact: token counts are integers,
    * `weight_e6 = floor(target_ppm × total / actual)` is a product
    * < 2^53 (exactly representable) followed by one IEEE division and
    * floor — bit-identical in both engines — and the 3× upsampling cap
    * (`capped` flag) is integer `least`. The expected post-mix token
    * count is the same floor arithmetic. This is the step that turns
    * a mixture spec ("40% English") into the per-domain sampling
    * weights [[p_mixture_sample]] consumes.
    *
    * Scale shape: one groupBy(lang) with map-side partials; the
    * global total is a window over the 5-row aggregate (never a
    * 1-row broadcast crossJoin — no BNLJ). */
  val p_mix_weights: Q = (s, d) => {
    val byLang = Tables.documents(s, d)
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy(col("lang")).agg(sum(col("toks")).as("actual_tokens"))
      .withColumn("target_ppm",
        when(col("lang") === "en", 400000L).otherwise(150000L))
    byLang
      .withColumn("total_tokens",
        sum(col("actual_tokens")).over(Window.partitionBy()))
      .withColumn("raw_e6",
        floor(col("target_ppm").cast("double") * col("total_tokens") /
          col("actual_tokens")).cast("long"))
      .select(col("lang"), col("actual_tokens"), col("target_ppm"),
        least(col("raw_e6"), lit(3000000L)).as("weight_e6"),
        (col("raw_e6") > 3000000L).as("capped"),
        floor(col("actual_tokens").cast("double") *
          least(col("raw_e6"), lit(3000000L)) / lit(1000000.0d))
          .cast("long").as("expected_tokens"))
      .orderBy(col("lang"))
  }

  /** TEMPERATURE-SCALED mixture weights (α = ½) — the multilingual /
    * multi-source pretraining standard (the XLM-R / mT5 recipe):
    * sampling probability p_s ∝ c_s^α flattens the natural source
    * distribution, up-weighting small sources without fully
    * equalizing them. Complements [[p_mix_weights]] (which hits
    * explicit per-source TARGETS); temperature needs no targets —
    * one dial. Determinism note: c_s^½ is ONE double `sqrt` per
    * SOURCE over an exact integer — integerized immediately
    * (`floor(√c·1000)`), so no doubles are ever summed (FP addition
    * order across engines would drift the hash); the normalization
    * and the boost-vs-natural-frequency factor are integer div.
    * One corpus pass + a ≤|sources|-row window — the 100 TB cost is
    * the token count, which [[p_dataset_card]] already pays. */
  val p_temperature_mix: Q = (s, d) => {
    val bySrc = Tables.documents(s, d)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("toks"))
      .groupBy(col("source")).agg(sum(col("toks")).as("actual_tokens"))
      .withColumn("r",
        floor(sqrt(col("actual_tokens").cast("double")) * 1000).cast("long"))
    bySrc
      .withColumn("rsum", sum(col("r")).over(Window.partitionBy()))
      .withColumn("csum", sum(col("actual_tokens")).over(Window.partitionBy()))
      .select(col("source"), col("actual_tokens"),
        // 10⁶·r fits Long for any Long token count (r = ⌊√c·1000⌋ ≤ 3.04e12)
        expr("(1000000L * r) div rsum").as("p_e6"),
        // boost vs natural frequency: (r/rsum)/(c/csum), ×10⁶.
        // The triple product 10⁶·r·csum tops out near 2.8e37 (r ≤
        // 3.04e12, csum ≤ Long.Max) — past Long once corpus tokens
        // reach ~1e10, where non-ANSI Long mult would wrap SILENTLY.
        // decimal(38,0) intermediates keep the floor division exact at
        // any Long-countable corpus; the oracle runs the same product
        // in HUGEINT (int128). `div` on decimals is the same integral
        // floor division, returned as Long.
        expr("(1000000 * cast(r as decimal(38,0)) * csum) div " +
          "(cast(rsum as decimal(38,0)) * actual_tokens)").as("boost_e6"))
      .orderBy(col("source"))
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, Q] = Map(
    "p_snapshot_diff" -> p_snapshot_diff,
    "p_mix_weights" -> p_mix_weights,
    "p_temperature_mix" -> p_temperature_mix,
    "p_decontaminate" -> p_decontaminate,
    "p_decon_served" -> p_decon_served,
    "p_mixture_sample" -> p_mixture_sample,
    "p_train_shuffle" -> p_train_shuffle,
    "p_stratified_sample" -> p_stratified_sample,
    "p_token_budget" -> p_token_budget,
    "p_doc_chunk" -> p_doc_chunk,
    "p_pii_scrub" -> p_pii_scrub,
    "p_cdc_apply" -> p_cdc_apply,
    "p_url_dedup" -> p_url_dedup,
    "p_sequence_pack" -> p_sequence_pack,
    "p_curate_apply" -> p_curate_apply,
    "p_weighted_sample" -> p_weighted_sample,
    "p_host_rank" -> p_host_rank,
    "p_triangle_count" -> p_triangle_count,
    "p_scd2" -> p_scd2,
    "p_embed_decon" -> p_embed_decon,
    "p_semantic_dedup" -> p_semantic_dedup,
    "p_label_prop" -> p_label_prop,
    "p_bpe_pair_counts" -> p_bpe_pair_counts,
    "p_leakage_split" -> p_leakage_split,
    "p_contig_pack" -> p_contig_pack,
    "p_golden_record" -> p_golden_record,
    "p_dataset_card" -> p_dataset_card,
  )

  /** The exact 8-gram-overlap replay — ONE definition answering for
    * both the inline ([[p_decontaminate]]) and the index-served
    * ([[p_decon_served]]) paths, which must agree row-for-row. */
  private val deconOracleSql: String =
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
       |ORDER BY d.doc_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // semantic dedup replayed from first principles: planted corpus +
    // exhaustive all-pairs cosine (shared CTEs with d_dedup_embedding)
    // + transitive closure as a recursive CTE — brute-force clustering
    // must equal the blocked-pairs + iterative-CC pipeline exactly
    "p_semantic_dedup" ->
      s"""WITH RECURSIVE ${DedupOps.embedPairCtes},
         |edges AS (SELECT ia AS a, ib AS b FROM epairs
         |          UNION ALL SELECT ib, ia FROM epairs),
         |walk(v, l) AS (
         |  SELECT DISTINCT a, a FROM edges
         |  UNION
         |  SELECT e.b, w.l FROM walk w JOIN edges e ON e.a = w.v),
         |comp AS (SELECT v, min(l) AS rep FROM walk GROUP BY v),
         |csz AS (SELECT rep, CAST(COUNT(*) AS BIGINT) AS n FROM comp GROUP BY rep)
         |SELECT c.v AS vec_id, c.rep AS rep_id, s.n AS n_cluster,
         |  c.v = c.rep AS kept
         |FROM comp c JOIN csz s ON c.rep = s.rep
         |ORDER BY vec_id""".stripMargin,
    // BPE counts + word-gate rule replayed; all-integer card
    "p_dataset_card" ->
      s"""WITH ${TextOps.bpeCountCtes},
         |c AS (SELECT d.doc_id, d.source, d.n_chars, b.n_tokens,
         |    len(string_split(d.text, ' ')) >= $MinWords AS pass_gate
         |  FROM documents d JOIN bpe b ON d.doc_id = b.doc_id)
         |SELECT source, COUNT(1) AS n_docs,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
         |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |  CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
         |  CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
         |  CAST(SUM(CASE WHEN pass_gate THEN 1 ELSE 0 END) AS BIGINT) AS n_pass_gate
         |FROM c GROUP BY source ORDER BY source""".stripMargin,
    // per-field arg-max rules replayed with struct_pack; the planted
    // %7 null rule mirrored so latest-non-null diverges from latest
    "p_golden_record" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tus, event_type,
        |    CASE WHEN event_id % 7 = 0 THEN NULL
        |         ELSE CAST(round(value * 100) AS BIGINT) END AS cents
        |  FROM events)
        |SELECT user_id,
        |  max(struct_pack(tus := tus, et := event_type)).et AS last_type,
        |  max(CASE WHEN cents IS NOT NULL
        |        THEN struct_pack(tus := tus, c := cents) END).c AS last_cents,
        |  CAST(min(tus) AS BIGINT) AS first_tus,
        |  CAST(max(tus) AS BIGINT) AS last_tus,
        |  COUNT(1) AS n_events
        |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin,
    // identical BPE counts, identical global prefix sum, identical
    // chunk arithmetic — the whole contiguous layout replayed
    "p_contig_pack" ->
      s"""WITH ${TextOps.bpeCountCtes},
         |c AS (
         |  SELECT d.doc_id, b.n_tokens,
         |    COALESCE(SUM(b.n_tokens) OVER (
         |      ORDER BY ${knuthKeySql("d.doc_id")}, d.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok
         |  FROM documents d JOIN bpe b ON d.doc_id = b.doc_id)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |  CAST(start_tok AS BIGINT) AS start_tok,
         |  CAST(start_tok // $ContigChunk AS BIGINT) AS first_chunk,
         |  CAST((start_tok + n_tokens - 1) // $ContigChunk AS BIGINT) AS last_chunk,
         |  CAST(start_tok % $ContigChunk AS BIGINT) AS off_in_chunk
         |FROM c ORDER BY doc_id""".stripMargin,
    // the SAME cluster walk as the d_dedup_clusters oracle (shared CTE
    // constant), then the split arithmetic replayed exactly
    "p_leakage_split" ->
      s"""${DedupOps.clusterWalkCte},
         |labels AS (SELECT v AS doc_id, MIN(l) AS cluster FROM walk GROUP BY v),
         |keyed AS (SELECT d.doc_id, d.n_chars,
         |    COALESCE(l.cluster, d.doc_id) AS grp
         |  FROM documents d LEFT JOIN labels l ON d.doc_id = l.doc_id),
         |sp AS (SELECT n_chars, grp,
         |    (${knuthKeySql("grp")}) % 10 AS k FROM keyed)
         |SELECT CASE WHEN k < 8 THEN 'train' WHEN k = 8 THEN 'val'
         |       ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs,
         |  CAST(COUNT(DISTINCT grp) AS BIGINT) AS n_groups,
         |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM sp GROUP BY 1 ORDER BY split""".stripMargin,
    // the planted two-snapshot construction replayed; concat_ws skips
    // NULL CASE arms identically in both engines
    "p_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    o_orderpriority AS prio
        |  FROM orders),
        |olds AS (SELECT * FROM base WHERE k % 11 <> 0),
        |news AS (SELECT k,
        |    cents + CASE WHEN k % 5 = 0 THEN 500 ELSE 0 END AS cents,
        |    CASE WHEN k % 17 = 0 THEN '9-RECLASS' ELSE prio END AS prio
        |  FROM base WHERE k % 13 <> 0),
        |d AS (
        |  SELECT COALESCE(o.k, n.k) AS o_orderkey,
        |    CASE WHEN o.k IS NULL THEN 'added'
        |         WHEN n.k IS NULL THEN 'removed'
        |         WHEN o.cents <> n.cents OR o.prio <> n.prio THEN 'changed'
        |         END AS status,
        |    o.cents AS old_cents, n.cents AS new_cents,
        |    CASE WHEN o.k IS NOT NULL AND n.k IS NOT NULL
        |           AND (o.cents <> n.cents OR o.prio <> n.prio)
        |         THEN concat_ws(',',
        |           CASE WHEN o.cents <> n.cents THEN 'cents' END,
        |           CASE WHEN o.prio <> n.prio THEN 'prio' END)
        |         END AS changed_cols
        |  FROM olds o FULL OUTER JOIN news n ON o.k = n.k)
        |SELECT * FROM d WHERE status IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    // exact integer/IEEE mixture-weight arithmetic: products < 2^53,
    // one division, floor — bit-identical in both engines
    "p_temperature_mix" ->
      """WITH lt AS (
        |  SELECT source,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS actual_tokens
        |  FROM documents GROUP BY source),
        |r AS (SELECT source, actual_tokens,
        |    CAST(FLOOR(SQRT(CAST(actual_tokens AS DOUBLE)) * 1000) AS BIGINT) AS r
        |  FROM lt),
        |t AS (SELECT source, actual_tokens, r,
        |    SUM(r) OVER () AS rsum, SUM(actual_tokens) OVER () AS csum
        |  FROM r)
        |SELECT source, actual_tokens,
        |  CAST((1000000 * r) // rsum AS BIGINT) AS p_e6,
        |  CAST((CAST(1000000 AS HUGEINT) * r * csum)
        |       // (CAST(rsum AS HUGEINT) * actual_tokens) AS BIGINT) AS boost_e6
        |FROM t ORDER BY source""".stripMargin,
    "p_mix_weights" ->
      """WITH lt AS (
        |  SELECT lang,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS actual_tokens
        |  FROM documents GROUP BY lang),
        |t AS (SELECT lang, actual_tokens,
        |    CASE WHEN lang = 'en' THEN 400000 ELSE 150000 END AS target_ppm,
        |    SUM(actual_tokens) OVER () AS total_tokens
        |  FROM lt),
        |w AS (SELECT lang, actual_tokens, CAST(target_ppm AS BIGINT) AS target_ppm,
        |    CAST(FLOOR(CAST(target_ppm AS DOUBLE) * total_tokens / actual_tokens)
        |      AS BIGINT) AS raw_e6
        |  FROM t)
        |SELECT lang, actual_tokens, target_ppm,
        |  LEAST(raw_e6, 3000000) AS weight_e6,
        |  raw_e6 > 3000000 AS capped,
        |  CAST(FLOOR(CAST(actual_tokens AS DOUBLE) * LEAST(raw_e6, 3000000)
        |    / 1000000.0) AS BIGINT) AS expected_tokens
        |FROM w ORDER BY lang""".stripMargin,
    "p_label_prop" -> labelPropOracle,
    // the full permutation is checked, not just its shape: every
    // (shard, pos, doc_id) triple must match the Knuth-mix replay
    "p_train_shuffle" ->
      s"""WITH k AS (SELECT doc_id,
         |    ${knuthKeySql("doc_id")} AS key
         |  FROM documents)
         |SELECT CAST(key % $TrainShards AS BIGINT) AS shard,
         |  CAST(ROW_NUMBER() OVER (PARTITION BY key % $TrainShards
         |    ORDER BY key, doc_id) AS BIGINT) AS pos,
         |  doc_id
         |FROM k ORDER BY shard, pos""".stripMargin,
    "p_bpe_pair_counts" ->
      s"""WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
         |f AS (SELECT w FROM w WHERE length(w) >= 2),
         |p AS (SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b
         |      FROM (SELECT w, unnest(generate_series(1, length(w) - 1)) AS i FROM f)),
         |c AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM p GROUP BY a, b),
         |t AS (SELECT a, b, n FROM c ORDER BY n DESC, a, b LIMIT $BpePairTopK)
         |SELECT a, b, n FROM t ORDER BY a, b""".stripMargin,
    "p_scd2" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type FROM events),
        |r AS (SELECT *, lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY t_us, event_id) AS prev FROM e),
        |c AS (SELECT user_id, t_us, event_id, event_type FROM r
        |      WHERE prev IS NULL OR prev <> event_type),
        |v AS (SELECT user_id, event_type AS state, t_us AS valid_from_us,
        |        CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
        |        CAST(COALESCE(LEAD(t_us) OVER w, -1) AS BIGINT) AS valid_to_us
        |      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id))
        |SELECT user_id, version, state, valid_from_us, valid_to_us,
        |  valid_to_us = -1 AS is_current
        |FROM v ORDER BY user_id, version""".stripMargin,
    "p_embed_decon" ->
      s"""WITH p AS (SELECT * FROM embeddings WHERE vec_id % $EmbedProbeMod = 0),
         |c AS (SELECT * FROM embeddings),
         |s AS (SELECT c.vec_id,
         |        CAST(ROUND($embedDeconCosSql * 1000000) AS BIGINT) AS cos_e6
         |      FROM c CROSS JOIN p)
         |SELECT vec_id, MAX(cos_e6) AS max_cos_e6,
         |  CAST(SUM(CASE WHEN cos_e6 >= $EmbedDecontTauE6 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |  SUM(CASE WHEN cos_e6 >= $EmbedDecontTauE6 THEN 1 ELSE 0 END) > 0 AS contaminated
         |FROM s GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "p_decontaminate" -> deconOracleSql,
    // the served path is exact by construction (rare-token candidate
    // superset + exact shingle verify), so it answers to the SAME
    // full exact-overlap replay — zero allowance for index drift
    "p_decon_served" -> deconOracleSql,
    "p_mixture_sample" ->
      s"""SELECT doc_id, source,
        |  (${knuthKeySql("doc_id")}) % 1000 AS bucket
        |FROM documents
        |WHERE (${knuthKeySql("doc_id")}) % 1000 <
        |  CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 900
        |       WHEN source IN ('src5','src6','src7','src8','src9') THEN 500
        |       ELSE 200 END
        |ORDER BY doc_id""".stripMargin,
    "p_stratified_sample" ->
      s"""SELECT doc_id, source, rk FROM (
         |  SELECT doc_id, source,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY ${knuthKeySql("doc_id")}, doc_id)
         |      AS INTEGER) AS rk
         |  FROM documents) t
         |WHERE rk <= $StratN ORDER BY doc_id""".stripMargin,
    "p_doc_chunk" ->
      s"""WITH ${TextOps.bpeCountCtes},
         |lists AS (SELECT doc_id, string_split(s, ' ') AS ws
         |          FROM s${graft.functions.BpeTokenizer.merges.size}),
         |pieces AS (
         |  SELECT doc_id, i - 1 AS piece_idx,
         |    CAST(length(ws[i]) - length(replace(ws[i], chr(1), '')) AS BIGINT) AS piece_tokens
         |  FROM (SELECT doc_id, ws, unnest(generate_series(1, len(ws))) AS i FROM lists)),
         |cum AS (
         |  SELECT doc_id, piece_idx, piece_tokens,
         |    COALESCE(SUM(piece_tokens) OVER (PARTITION BY doc_id ORDER BY piece_idx
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM pieces)
         |SELECT doc_id, CAST(cum_before // $ChunkTokens AS BIGINT) AS chunk_id,
         |  COUNT(1) AS n_pieces, CAST(SUM(piece_tokens) AS BIGINT) AS n_tokens,
         |  CAST(MIN(piece_idx) AS BIGINT) AS first_piece
         |FROM cum GROUP BY 1, 2 ORDER BY doc_id, chunk_id""".stripMargin,
    "p_token_budget" ->
      s"""WITH ${TextOps.bpeCountCtes},
         |c AS (
         |  SELECT d.doc_id, d.source, b.n_tokens,
         |    COALESCE(SUM(b.n_tokens) OVER (PARTITION BY d.source
         |      ORDER BY ${knuthKeySql("d.doc_id")}, d.doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
         |  FROM documents d JOIN bpe b ON d.doc_id = b.doc_id)
         |SELECT doc_id, source, n_tokens, CAST(cum_before AS BIGINT) AS cum_before
         |FROM c WHERE cum_before < $BudgetTokens ORDER BY doc_id""".stripMargin,
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
    "p_curate_apply" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text, source FROM documents
         |  UNION ALL
         |  SELECT doc_id + $RecrawlOffset, text, source FROM documents WHERE source = 'src0'),
         |q AS (SELECT * FROM corpus WHERE len(string_split(text, ' ')) >= $MinWords),
         |k AS (SELECT min(doc_id) AS doc_id FROM q GROUP BY sha256(text)),
         |dd AS (SELECT q.* FROM q JOIN k ON q.doc_id = k.doc_id),
         |pwords AS (SELECT string_split(text, ' ') AS w FROM documents WHERE doc_id % $ProbeMod = 0),
         |pidx AS (SELECT w, unnest(generate_series(1, len(w) - ${ShingleN - 1})) AS i FROM pwords),
         |probe AS (SELECT DISTINCT ${(0 until ShingleN).map(j => s"w[i+$j]").mkString(" || ' ' || ")} AS s8 FROM pidx),
         |dwords AS (SELECT doc_id, string_split(text, ' ') AS w FROM dd),
         |didx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - ${ShingleN - 1})) AS i FROM dwords),
         |dsh AS (SELECT DISTINCT doc_id, ${(0 until ShingleN).map(j => s"w[i+$j]").mkString(" || ' ' || ")} AS s8 FROM didx),
         |contam AS (SELECT DISTINCT dsh.doc_id FROM dsh JOIN probe ON dsh.s8 = probe.s8),
         |clean AS (
         |  SELECT * FROM dd
         |  WHERE doc_id % $ProbeMod <> 0
         |    AND doc_id NOT IN (SELECT doc_id FROM contam))
         |SELECT doc_id, source FROM clean
         |WHERE (${knuthKeySql("doc_id")}) % 1000 <
         |  CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 900
         |       WHEN source IN ('src5','src6','src7','src8','src9') THEN 500
         |       ELSE 200 END
         |ORDER BY doc_id""".stripMargin,
    "p_cdc_apply" ->
      """WITH base AS (
        |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders),
        |chg AS (
        |  SELECT k, k*10+1 AS seq, 'I' AS op, cents FROM base
        |  UNION ALL
        |  SELECT k, k*10+2, 'U', cents + 1000 FROM base WHERE k % 3 = 0
        |  UNION ALL
        |  SELECT k, k*10+3, 'D', NULL FROM base WHERE k % 7 = 0),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY seq DESC) AS rn,
        |    COUNT(*) OVER (PARTITION BY k) AS n_changes
        |  FROM chg)
        |SELECT k AS o_orderkey, seq AS last_seq, cents AS final_cents,
        |  CAST(n_changes AS BIGINT) AS n_changes
        |FROM ranked WHERE rn = 1 AND op <> 'D'
        |ORDER BY o_orderkey""".stripMargin,
    "p_url_dedup" ->
      """WITH u AS (
        |  SELECT doc_id,
        |    'https://' || CASE WHEN doc_id % 2 = 0 THEN 'WWW' ELSE 'www' END ||
        |    '.site' || (doc_id % 40) || '.Example.com/page/' || (doc_id % 120) ||
        |    CASE WHEN doc_id % 4 = 1 THEN '/'
        |         WHEN doc_id % 4 = 2 THEN '?utm_source=feed&utm_campaign=x'
        |         WHEN doc_id % 4 = 3 THEN '#section-2'
        |         ELSE '' END AS url
        |  FROM documents)
        |SELECT lower(rtrim(split_part(split_part(url, '#', 1), '?', 1), '/')) AS canon_url,
        |  min(doc_id) AS keeper, count(*) AS n_dups
        |FROM u GROUP BY 1 ORDER BY canon_url""".stripMargin,
    "p_sequence_pack" ->
      s"""WITH RECURSIVE base AS (
         |  SELECT doc_id, n_chars,
         |    CAST(doc_id % $PackShards AS INTEGER) AS shard,
         |    ${knuthKeySql("doc_id")} AS k
         |  FROM documents),
         |ordered AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY k, doc_id) AS rn
         |  FROM base),
         |walk AS (
         |  SELECT shard, rn, doc_id,
         |    0 AS pack_idx, CAST(0 AS BIGINT) AS pack_off, CAST(n_chars AS BIGINT) AS cum
         |  FROM ordered WHERE rn = 1
         |  UNION ALL
         |  SELECT o.shard, o.rn, o.doc_id,
         |    CASE WHEN w.cum + o.n_chars > $PackCapacity AND w.cum > 0
         |         THEN w.pack_idx + 1 ELSE w.pack_idx END,
         |    CASE WHEN w.cum + o.n_chars > $PackCapacity AND w.cum > 0
         |         THEN CAST(0 AS BIGINT) ELSE w.cum END,
         |    CASE WHEN w.cum + o.n_chars > $PackCapacity AND w.cum > 0
         |         THEN CAST(o.n_chars AS BIGINT) ELSE w.cum + o.n_chars END
         |  FROM walk w JOIN ordered o ON o.shard = w.shard AND o.rn = w.rn + 1)
         |SELECT doc_id, shard,
         |  CAST(shard AS BIGINT) * 1000000 + pack_idx AS pack_id, pack_off
         |FROM walk ORDER BY doc_id""".stripMargin,
    // replay the identical md5 → uniform → exponential-key arithmetic;
    // ln/division are IEEE doubles in both engines and hash-derived keys
    // are far from ties, so the top-k selection is stable cross-engine
    "p_weighted_sample" ->
      s"""WITH t AS (
         |  SELECT doc_id, source, greatest(n_chars, 1) AS w,
         |    -ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) + 0.5)
         |        / 4294967296.0) / greatest(n_chars, 1) AS k
         |  FROM documents)
         |SELECT doc_id, source, w
         |FROM (SELECT * FROM t ORDER BY k LIMIT $WsK)
         |ORDER BY doc_id""".stripMargin,
    // replay the identical integer fixed-point recurrence as a
    // recursive CTE; self-edges with weight 0 keep every host (and the
    // iteration counter) flowing through the single recursive reference
    "p_host_rank" ->
      s"""WITH RECURSIVE
         |edges AS (SELECT DISTINCT doc_id % 40 AS src, (doc_id * 7 + 13) % 37 AS dst
         |          FROM documents WHERE doc_id % 40 <> (doc_id * 7 + 13) % 37),
         |-- NOTE: inside WITH RECURSIVE, DuckDB treats a CTE whose body
         |-- is a top-level UNION as recursive-style and skips the
         |-- cross-branch dedup — wrap the union in a subquery instead
         |hosts AS (SELECT DISTINCT h FROM
         |          (SELECT src AS h FROM edges UNION ALL SELECT dst FROM edges)),
         |outd AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
         |nn AS (SELECT COUNT(*) AS n FROM hosts),
         |eaug AS (SELECT src, dst, 1 AS w FROM edges
         |         UNION ALL SELECT h, h, 0 FROM hosts),
         |pr AS (
         |  SELECT h, CAST($PrScale // n AS BIGINT) AS r, 0 AS it FROM hosts, nn
         |  UNION ALL
         |  SELECT e.dst AS h,
         |    CAST((SELECT (($PrScale * 15) // 100) // n FROM nn)
         |      + (85 * SUM(CASE WHEN e.w = 1 THEN p.r // o.od ELSE 0 END)) // 100
         |      AS BIGINT) AS r,
         |    MAX(p.it) + 1 AS it
         |  FROM pr p JOIN eaug e ON e.src = p.h LEFT JOIN outd o ON o.src = p.h
         |  WHERE p.it < $PrIters
         |  GROUP BY e.dst)
         |SELECT p.h AS host, CAST(COALESCE(o.od, 0) AS BIGINT) AS outdeg,
         |  p.r AS rank_s
         |FROM pr p LEFT JOIN outd o ON o.src = p.h
         |WHERE p.it = $PrIters ORDER BY host""".stripMargin,
    // ordered triples a<b<c: the orientation-free formulation -- a hash
    // match proves the oriented Spark plan counts each triangle once
    "p_triangle_count" ->
      """WITH und AS (
        |  SELECT DISTINCT least(doc_id % 40, (doc_id * 7 + 13) % 37) AS a,
        |         greatest(doc_id % 40, (doc_id * 7 + 13) % 37) AS b
        |  FROM documents WHERE doc_id % 40 <> (doc_id * 7 + 13) % 37),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1
        |  JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT host, COUNT(*) AS n_tri FROM (
        |  SELECT x AS host FROM tri
        |  UNION ALL SELECT y FROM tri
        |  UNION ALL SELECT z FROM tri)
        |GROUP BY host ORDER BY host""".stripMargin,
  )
}
