package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.ArrayAggregators
import graft.functions.VectorFunctions._

/** Deduplication over the `documents` corpus — the highest-frequency
  * LLM-pipeline operation family. Five pipelines, each in its 100 TB
  * shape (NO all-pairs joins except the documented exact-baseline for
  * embeddings):
  *
  *   - [[d_dedup_exact]]: content-hash exact dedup (`sha2` → min-key
  *     groupBy with map-side partial agg). One shuffle on the hash.
  *   - [[d_ngram_jaccard]]: EXACT n-gram Jaccard near-dup via an
  *     inverted-index self-join on df-capped shingles — candidate pairs
  *     are only docs sharing ≥1 non-hot shingle, never the cross
  *     product, and no join bucket exceeds ShingleDfCap². DuckDB oracle
  *     applies the identical cap.
  *   - [[d_dedup_minhash]]: the sketch path — native one-pass 64-wide
  *     MinHash signatures (NO shuffle: each doc's signature is computed
  *     in place over its shingle array) → banded LSH self-join
  *     (16 bands × 4 rows) → exact-Jaccard verification of the tiny
  *     candidate set. At the 0.5 output threshold the LSH miss
  *     probability for a true pair is ≤ (1 - 0.5^4)^16 ≈ 0.35 in the
  *     worst case at exactly j=0.5 but ≈ 4e-8 at the j≥0.9 pairs this
  *     corpus contains, so the verified output equals the exact answer
  *     and is DuckDB-oracle-checked.
  *   - [[d_dedup_simhash]]: 64-bit frequency-weighted SimHash
  *     fingerprints (element-wise-sum UDAF) + block-triple LSH join
  *     over 6 blocks (pigeonhole: hamming ≤ 3 ⇒ ≥3 blocks equal ⇒
  *     some triple equal; 20 keys of ~33 bits keep buckets O(1) at
  *     10⁹ docs) + exact hamming filter. Approximate by nature →
  *     rows-only check + measured precision/recall in DedupOpsSpec.
  *   - [[d_dedup_embedding]]: cosine near-dup pairs over a planted
  *     re-crawl corpus of embeddings — centroid-BUCKETED candidate
  *     generation (each vector in its 2 nearest KMeans cells, pairs
  *     only within a cell) + exact cosine verify at 0.9, hash-checked
  *     against the all-pairs DuckDB oracle over the same corpus.
  *   - [[d_dedup_clusters]]: connected components over the near-dup
  *     pair graph (iterative min-label propagation, one shuffle join
  *     per round) — clusters + keeper selection, the step that turns
  *     pairs into an actual deduplicated corpus. Hash-checked against
  *     a DuckDB recursive-CTE transitive closure.
  */
object DedupOps {

  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------ shingling

  /** doc_id + the DISTINCT word 3-gram shingles of `text`, as an array
    * column (one narrow projection, no shuffle). Uses the native
    * codegen'd [[graft.functions.WordShingles]] expression — the
    * equivalent `split`+`transform`+`concat_ws`+`array_distinct` HOF
    * tree evaluates interpreted lambdas per element and was the single
    * most expensive line of the sf0.1 bench. */
  private[ops] def shingled(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.WordShingles.wordShingles(col("text"), 3).as("sh"))

  /** Exploded (doc_id, shingle) inverted-index rows. */
  private[ops] def shingleIndex(docs: DataFrame): DataFrame =
    shingled(docs).select(col("doc_id"), explode(col("sh")).as("s"))

  /** Exact Jaccard over candidate pairs given per-doc shingle arrays:
    * |A ∩ B| / |A ∪ B| computed from array_intersect on the joined
    * arrays. `pairs` must have (doc_a, doc_b). */
  private[ops] def exactJaccard(pairs: DataFrame, arrays: DataFrame): DataFrame = {
    val a = arrays.select(col("doc_id").as("doc_a"), col("sh").as("sha"))
    val b = arrays.select(col("doc_id").as("doc_b"), col("sh").as("shb"))
    pairs.join(a, "doc_a").join(b, "doc_b")
      .withColumn("c", size(array_intersect(col("sha"), col("shb"))))
      .withColumn("u", size(col("sha")) + size(col("shb")) - col("c"))
      .filter(col("c") * lit(2) >= col("u")) // c/u >= 0.5, integer-exact
      .select(col("doc_a"), col("doc_b"),
        round(lit(1000000.0) * col("c") / col("u")).cast("long").as("jac_e6"))
  }

  /** Exact-Jaccard DuckDB oracle; `dfCap = Some(n)` mirrors the
    * hot-shingle cap of [[d_ngram_jaccard]], `None` is the uncapped
    * exact answer [[d_dedup_minhash]] reproduces. */
  private def jaccardOracle(dfCap: Option[Int]): String = {
    val capped = dfCap match {
      case Some(cap) =>
        s"""sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx),
           |keep AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= $cap),
           |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN keep ON sh0.s = keep.s),""".stripMargin
      case None =>
        "sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx),"
    }
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM words),
       |$capped
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |common AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
       |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |           GROUP BY 1, 2)
       |SELECT ia AS doc_a, ib AS doc_b,
       |  CAST(ROUND(1000000.0 * c / (na.n + nb.n - c)) AS BIGINT) AS jac_e6
       |FROM common
       |JOIN sizes na ON ia = na.doc_id
       |JOIN sizes nb ON ib = nb.doc_id
       |WHERE 2 * c >= (na.n + nb.n - c)
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  // ---------------------------------------------------------- exact dedup

  /** Simulated re-crawl: the corpus unioned with its `src0` slice, then
    * exact-deduplicated by content hash. Keeper = min doc_id per hash;
    * `n_copies` proves the duplicates were actually seen. */
  val d_dedup_exact: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val corpus = docs.unionByName(docs.filter(col("source") === "src0"))
    corpus
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .select(col("doc_id"), col("n_copies"), substring(col("content_hash"), 1, 16).as("hash16"))
      .orderBy(col("doc_id"))
  }

  /** Fixed line width (words) for [[d_line_dedup]] — the fixture text
    * is a flat word stream, so "lines" are deterministic 12-word
    * windows (production corpora split on newlines; the operator is
    * identical either way, only the segmenter differs). */
  private[ops] val LineWords = 12

  /** LINE-LEVEL EXACT DEDUP — the RefinedWeb/CCNet rule that removes
    * boilerplate at sub-document granularity: every repeated LINE
    * keeps only its FIRST occurrence corpus-wide (first = min
    * (doc_id, position) — deterministic), later occurrences are cut
    * from their documents, and each document reassembles from its
    * surviving lines in original order. Near-dup documents thus
    * deflate to their novel lines without being dropped wholesale —
    * the granularity document-level dedup cannot reach.
    *
    * Scale shape (round-13 verdict item 3 — NO per-line window, NO
    * join keyed on line text): segmentation is a narrow in-row HOF;
    * first-occurrence-wins needs no ranking at all, only the argmin
    * `min(struct(doc_id, pos))` per line — a MAP-SIDE-COMBINABLE
    * aggregate, so a boilerplate line occurring 10⁹ times corpus-wide
    * combines to one row per map task before the shuffle instead of
    * sorting 10⁹ rows in one window partition. The kept lines ARE
    * exactly those argmin winners, so reassembly groups the
    * one-row-per-distinct-line firsts by their winning doc_id (doc-
    * bounded groups, no skew) — the raw exploded lines are never
    * shuffled on ANY key: per-doc totals come in-row from the word
    * count, and the final stitch is a join on doc_id. Output carries
    * the cleaned TEXT itself (hash-exact reassembly), plus kept/total
    * line counts; a doc whose every line first appeared elsewhere
    * keeps an empty clean_text. The DuckDB oracle replays
    * segmentation, ranking, and the ordered re-join from first
    * principles (declaratively, via the window formulation — the
    * hash match proves the aggregate plan computes the same rule). */
  val d_line_dedup: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val lines = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(0, CAST(ceil(size(w) / ${LineWords}.0) AS INT) - 1), " +
          s"i -> struct(CAST(i AS BIGINT) AS pos, " +
          s"array_join(slice(w, i * $LineWords + 1, $LineWords), ' ') AS line))")).as("pl"))
      .select(col("doc_id"), col("pl.pos").as("pos"), col("pl.line").as("line"))
    val firsts = lines
      .groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("f"))
      .select(col("f.doc_id").as("doc_id"), col("f.pos").as("pos"), col("line"))
    val kept = firsts.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(expr(
          "transform(array_sort(collect_list(struct(pos, line))), x -> x.line)"),
          " ").as("clean_text"))
    docs
      .select(col("doc_id"),
        ceil(size(split(col("text"), " ")) / lit(LineWords.toDouble)).as("n_lines"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------------- exact jaccard

  /** Document-frequency cap for the inverted-index self-join: a shingle
    * present in df documents contributes df·(df−1)/2 candidate pairs in
    * ONE join bucket — a single hot trigram ("in the of"-class) makes
    * that bucket quadratic, which is both a skew bomb at 100 TB and was
    * 32 % of the whole sf0.1 bench. Shingles above the cap carry almost
    * no near-dup signal (they are corpus-common boilerplate), so they
    * are dropped from the shingle SETS themselves (sizes and
    * intersections both see the filtered sets — Jaccard stays
    * internally consistent, and the DuckDB oracle applies the identical
    * cap). At the fixture scales the cap is inert at sf0.01 (max df 7)
    * and output-preserving at sf0.1 (same 256 pairs). */
  private val ShingleDfCap = 10

  /** df-capped inverted index over ONE shuffle (round 17, guide
    * §2.4/§3.1): `repartition(s)` establishes the shingle clustering
    * ONCE, and the df aggregate, the keep filter, the keep join, and
    * the downstream pair self-join all consume that same exchange with
    * ZERO additional shuffles of the index. The previous per-query
    * shape (`all ⋈ keep` then `sh ⋈ sh`) let the planner BROADCAST the
    * ~2M-row keep set and then the ~2.3M-row capped index itself
    * (post-explode size estimates are tiny, so the 10 MB bar never
    * fired) — two driver-side multi-million-entry hash-relation builds
    * per run, ~2× the measured pair-stage cost at sf0.1 (DedupProbe:
    * 1.6 s → 0.83 s), and a plan that at corpus scale would hit the
    * 8 GB broadcast cap. The `shuffle_hash` hints keep the co-
    * partitioned joins hash-based (no sort of the index) and bound
    * each build at one partition of kept shingles. Hot-shingle skew
    * exposure is unchanged (the df groupBy clustered by shingle
    * before too), and the cap drops hot shingles before any pairing. */
  private def cappedShingleIndex(corpus: DataFrame): DataFrame = {
    val rep = shingleIndex(corpus).repartition(col("s"))
    val keep = rep.groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= ShingleDfCap)
      .select("s")
    rep.join(keep.hint("shuffle_hash"), "s").select("doc_id", "s")
  }

  /** Inverted-index exact n-gram Jaccard over df-capped shingle sets:
    * pairs sharing ≥1 (non-hot) shingle, scored exactly. Shuffles on
    * shingle then on (doc_a, doc_b) — never a cross join, and per-bucket
    * work is bounded by ShingleDfCap². */
  val d_ngram_jaccard: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val sh = cappedShingleIndex(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.as("a")
      .join(sh.as("b").hint("shuffle_hash"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("u", col("na") + col("nb") - col("c"))
      .filter(col("c") * lit(2) >= col("u"))
      .select(col("doc_a"), col("doc_b"),
        round(lit(1000000.0) * col("c") / col("u")).cast("long").as("jac_e6"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --------------------------------------------- containment (quotes)

  /** Near-CONTAINMENT detection — the asymmetric inclusion score
    * `|A∩B| / min(|A|,|B|) ≥ 0.8` that catches a small document living
    * INSIDE a large one (quotes, boilerplate inclusion, excerpt
    * pages), which symmetric Jaccard structurally misses: a 30-shingle
    * excerpt of a 200-shingle source scores jac ≈ 0.15 but containment
    * 1.0. The fixture corpus has no natural inclusions, so the witness
    * PLANTS them (the [[d_dedup_embedding]] pattern): every 11th
    * document contributes its first 30 words as a standalone "quote"
    * doc under `doc_id + 1,000,000` — a derivation the oracle replays
    * verbatim. Candidates come from the same df-capped inverted-index
    * self-join as [[d_ngram_jaccard]] (one shuffle on shingle,
    * per-bucket work ≤ cap²; a quote shares its source's non-hot
    * shingles, so candidate recall for real inclusions is exact);
    * only the scoring differs, and the output carries BOTH scores so
    * the result itself shows the pairs a Jaccard gate would have
    * dropped. The ≥ 0.8 gate is integer-exact (5c ≥ 4·min), never a
    * rounded double. */
  val d_containment: Q = (s, d) => {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val quotes = docs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 1, 30)).as("text"))
    val corpus = docs.unionByName(quotes)
    val sh = cappedShingleIndex(corpus)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.as("a")
      .join(sh.as("b").hint("shuffle_hash"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .filter(col("c") * lit(5) >= least(col("na"), col("nb")) * lit(4))
      .select(col("doc_a"), col("doc_b"),
        round(lit(1000000.0) * col("c") / least(col("na"), col("nb")))
          .cast("long").as("cont_e6"),
        round(lit(1000000.0) * col("c") / (col("na") + col("nb") - col("c")))
          .cast("long").as("jac_e6"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------------------------- incremental dedup

  /** Incremental (new-batch-vs-corpus) near-dedup — the daily-ingest
    * production shape: docs with `doc_id ≡ 4 (mod 5)` play today's
    * batch, the rest the existing corpus. Candidates come from the
    * same df-capped inverted index as [[d_ngram_jaccard]], but the
    * join pairs OLD × NEW only — the existing corpus is never
    * re-paired with itself (that work was done when those docs
    * arrived), which is what makes daily dedup O(batch), not
    * O(corpus). The batch side of the index is explicitly
    * `broadcast`: a day's shingles are MBs against a corpus of TBs,
    * so every corpus partition probes a local map and the corpus
    * index is never shuffled at all. Exact Jaccard ≥ 0.5 verifies
    * candidates, as everywhere in the family. */
  val d_dedup_incremental: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val isNew = col("doc_id") % 5 === 4
    val sh = cappedShingleIndex(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = sh.filter(!isNew).as("a")
      .join(broadcast(sh.filter(isNew).as("b")), col("a.s") === col("b.s"))
      .groupBy(col("b.doc_id").as("doc_new"), col("a.doc_id").as("doc_old"))
      .agg(count(lit(1)).as("c"))
    common
      .join(sizes.select(col("doc_id").as("doc_new"), col("n").as("nn")), "doc_new")
      .join(sizes.select(col("doc_id").as("doc_old"), col("n").as("no")), "doc_old")
      .withColumn("u", col("nn") + col("no") - col("c"))
      .filter(col("c") * lit(2) >= col("u"))
      .select(col("doc_new"), col("doc_old"),
        round(lit(1000000.0) * col("c") / col("u")).cast("long").as("jac_e6"))
      .orderBy(col("doc_new"), col("doc_old"))
  }

  // ------------------------------------------------------------- minhash

  private val NumHashes = 64
  private val NumBands = 16
  private val BandRows = 4 // NumBands * BandRows == NumHashes

  /** The library's canonical universal hash family — derivation and
    * overflow/monotonicity rationale live at
    * [[graft.functions.MinHashSignature.stdA]] (one definition shared
    * with the SQL registration, so signatures bucket identically
    * through every surface). */
  private val HashP = graft.functions.MinHashSignature.StdP
  private val (hashA, hashB): (Seq[Long], Seq[Long]) = {
    require(graft.functions.MinHashSignature.stdA.length == NumHashes,
      "canonical family width drifted from the pipeline's NumHashes")
    (graft.functions.MinHashSignature.stdA, graft.functions.MinHashSignature.stdB)
  }

  /** (doc_id, sig) MinHash signatures via the native codegen'd
    * [[graft.functions.MinHashSignature]] expression: one narrow pass,
    * signatures computed in place over each doc's shingle array — NO
    * shuffle (the previous explode → 64-hash transform →
    * elementwise-min UDAF shape paid a full shuffle to reassemble
    * per-doc rows and 64 interpreted lambda evals per shingle; the
    * UDAF partial-agg capability itself remains exercised by
    * [[simhashFingerprints]]). Docs with no shingles are filtered, as
    * the explode formulation did implicitly — an empty-shingle doc has
    * no signature, not a degenerate all-MaxValue one that would bucket
    * every short doc together. */
  private[ops] def minhashSignatures(docs: DataFrame): DataFrame =
    signatureRows(shingled(docs))

  /** Signatures from pre-shingled (doc_id, sh) rows — the seam
    * [[DedupIndexStore]] uses to compute signatures and the shingle
    * registry from ONE shingling pass. */
  private[ops] def signatureRows(sh: DataFrame): DataFrame =
    sh.filter(size(col("sh")) > 0)
      .select(col("doc_id"),
        graft.functions.MinHashSignature.minhashSignature(col("sh"), hashA, hashB, HashP)
          .as("sig"))

  /** Docs per (band, key) bucket above which the pairwise self-join is
    * refused — the |bucket|² skew guard of this family (ShingleDfCap /
    * SubDfCap for the Jaccard/substring paths). A corpus with 10⁶
    * byte-identical documents puts them all in ONE bucket of every
    * band; uncapped, that is 10¹² candidate pairs in a single task.
    * Over-cap buckets instead take the exact-dup route: docs grouped
    * by FULL signature, each group paired to its min-doc_id
    * representative only — linear candidates, and downstream
    * CC-clustering sees the same connected components the all-pairs
    * edges would produce. Docs in an over-cap bucket whose full
    * signature is unique there still get their 15 other bands (a key
    * that hot with unequal signatures is degenerate, the same
    * no-signal argument as ShingleDfCap). Inert at the fixture scales
    * (max sf0.1 bucket ≪ cap), so `d_dedup_minhash` keeps matching
    * its all-pairs oracle. */
  private[ops] val LshBucketCap = 100L

  /** Banded-LSH candidate pairs from signatures: fold each 4-long band
    * to a key, self-join buckets on (band, key) — bounded by
    * [[LshBucketCap]]: over-cap buckets emit representative-star pairs
    * per full-signature group instead of the quadratic self-join.
    * `sfull` is a 64-bit hash of the whole signature; a collision can
    * only add a spurious candidate, which the exact-Jaccard
    * verification downstream discards. */
  /** (doc_id, sfull, band, key) band keys of MinHash signatures —
    * `sfull` is a 64-bit hash of the whole signature (the over-cap
    * exact-dup route's grouping key); shared by the in-session
    * [[lshCandidates]] self-join and [[DedupIndexStore]]'s
    * batch-probes-index join. */
  private[ops] def bandedKeys(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      xxhash64(col("sig")).as("sfull"),
      posexplode(
        transform(sequence(lit(0), lit(NumBands - 1)),
          k => aggregate(
            slice(col("sig"), k * lit(BandRows) + 1, lit(BandRows)),
            lit(0L),
            // modular fold keeps acc < 2^31 so acc*p + x stays < 2^63
            // (ANSI-safe); collisions only cost extra verified candidates
            (acc, x) => pmod(acc * lit(1000003L) + x, lit(2147483647L)))))
        .as(Seq("band", "key")))

  private[ops] def lshCandidates(sigs: DataFrame,
                                 cap: Long = LshBucketCap): DataFrame = {
    val banded = bandedKeys(sigs)
    // bucket width via a count window, NOT groupBy+join-back: every
    // branch below then hangs off the SAME (band, key) exchange, which
    // ReuseExchange/AQE computes once — the codegen'd signature pass
    // runs a single time for the whole candidate query
    val wBucket = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("key"))
    val withDf = banded.withColumn("df", count(lit(1)).over(wBucket))
    val small = withDf.filter(col("df") <= cap)
    val smallPairs = small.as("x")
      .join(small.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
    val big = withDf.filter(col("df") > cap)
    val reps = big.groupBy(col("band"), col("key"), col("sfull"))
      .agg(min(col("doc_id")).as("rep"))
    val bigPairs = big.join(reps, Seq("band", "key", "sfull"))
      .filter(col("doc_id") > col("rep"))
      .select(col("rep").as("doc_a"), col("doc_id").as("doc_b"))
    smallPairs.unionByName(bigPairs).distinct()
  }

  /** Full MinHash-LSH near-dup pipeline with exact-Jaccard verification
    * of the candidates (standard production shape: cheap sketch for
    * candidates, exact check before acting on a merge). */
  val d_dedup_minhash: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val cands = lshCandidates(minhashSignatures(docs))
    exactJaccard(cands, shingled(docs))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------------------------------------- simhash

  /** (doc_id, f) 64-bit frequency-weighted SimHash fingerprints. Bit i
    * of xxhash64(token) votes ±1 PER OCCURRENCE — summing occurrence
    * votes equals the classic ±count weighting, so no pre-counting
    * `groupBy(doc, tok)` shuffle is needed at all. The tally is the
    * fused [[graft.functions.ArrayAggregators.SimhashFingerprint]]
    * typed Aggregator consuming the raw hash stream directly: map-side
    * partial aggregation means ONE 64-long buffer per doc per
    * partition crosses the single remaining shuffle (this is the
    * UDAF's live exemplar — cross-row state that no per-row expression
    * can hold). */
  private[ops] def simhashFingerprints(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      // ONE fused aggregate from the raw token hashes (round 17): the
      // previous bit_votes → elementwise-sum → fold-HOF chain
      // materialized a 64-long votes array PER TOKEN OCCURRENCE —
      // 2.5M × 64 longs of allocation at sf0.1, measured as the bulk
      // of the fingerprint stage (DedupProbe 2.4 s → 0.9 s). Votes,
      // merge order-independence, and the > 0 majority threshold are
      // term-identical, so fingerprints are bit-equal (parity pinned
      // in GraftFunctionsSpec).
      .groupBy("doc_id")
      .agg(ArrayAggregators.simhashFingerprint(xxhash64(col("tok"))).as("f"))

  /** The 64 fingerprint bits split into 6 blocks (4×11 + 2×10 bits).
    * Hamming ≤ 3 can corrupt at most 3 blocks, so at least 3 of the 6
    * agree — hence some TRIPLE of blocks agrees entirely (pigeonhole,
    * still exact). Joining on block-triples instead of single blocks
    * is the scale fix: a single 16-bit block gives only 2^16 = 65,536
    * join buckets, so at 10⁹ docs each bucket holds ~15k docs and the
    * self-join goes quadratic per bucket; a triple key carries
    * 11+11+10..33 bits ⇒ ~2^32 buckets per triple, keeping buckets
    * O(1)-sized at billions of docs for C(6,3) = 20 keys per doc. */
  private val SimBlockBits = Seq(11, 11, 11, 11, 10, 10)
  private val SimBlockOffsets = SimBlockBits.scanLeft(0)(_ + _).init
  private val SimBlockTriples: Seq[(Int, Int, Int)] =
    for { i <- 0 until 6; j <- i + 1 until 6; k <- j + 1 until 6 } yield (i, j, k)

  /** SimHash near-dup pairs at hamming ≤ 3 via block-triple LSH over
    * [[SimBlockBits]]: candidates are docs agreeing on all three blocks
    * of some triple, then the exact hamming filter makes the output
    * identical to the all-pairs answer for hamming ≤ 3. */
  private[ops] def simhashPairs(docs: DataFrame): DataFrame = {
    val fps = simhashFingerprints(docs)
    // block b = bits [offset, offset+size); & mask kills shiftright's
    // sign extension for the block containing bit 63
    def block(i: Int): Column =
      shiftright(col("f"), SimBlockOffsets(i)).bitwiseAND(lit((1L << SimBlockBits(i)) - 1))
    // triple key: each block < 2^11, so packing at 11-bit stride is
    // collision-free and stays < 2^33
    val tripleKeys = array(SimBlockTriples.map { case (i, j, k) =>
      block(i) * lit(1L << 22) + block(j) * lit(1L << 11) + block(k)
    }: _*)
    val blocked = fps.select(col("doc_id"), col("f"),
      posexplode(tripleKeys).as(Seq("blk", "key")))
    blocked.as("x")
      .join(blocked.as("y"),
        col("x.blk") === col("y.blk") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.f").bitwiseXOR(col("y.f"))).as("hamming"))
      // hamming is pair-determined, so filtering BEFORE the distinct is
      // exact — and shrinks the dedup input from every (pair × agreeing
      // triple) to just the true near-dups
      .filter(col("hamming") <= 3)
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash recall floor asserted by the registered witness query,
    * measured against the EXACT df-capped Jaccard pair set
    * ([[d_ngram_jaccard]]). Hamming ≤ 3 on 64-bit fingerprints and
    * Jaccard ≥ 0.5 are DIFFERENT similarity notions — the sketch
    * recovers the high-similarity core of the Jaccard answer (fixture:
    * ~0.68–0.76 recall across SFs) while also pairing docs whose
    * token DISTRIBUTIONS are close without 50 % shingle overlap.
    * Within its own metric the operator is exact by construction
    * (pigeonhole LSH + exact hamming filter — zero hamming false
    * positives), so the scale contract worth enforcing on the Jaccard
    * side is recall plus CANDIDATE VOLUME: the pair count must stay
    * linear in the corpus (≤ 1 per doc), because at 10⁹ docs the
    * simhash output feeds an exact verifier and a superlinear pair
    * volume is what would sink it. (An absolute false-positive cap is
    * a fixture artifact — at sf0.1 the corpus is homogeneous enough
    * that ~64 % of hamming-close pairs sit below the 0.5 Jaccard bar,
    * measured in SCALING.md.) */
  private val SimhashRecallFloorPct = 60L

  /** BOUND-WITNESS for the SimHash path — the registered, DRIVER-
    * CHECKED face of [[simhashPairs]]. The sketch itself has no SQL
    * equivalent (xxhash64 fingerprints), so instead of an unverifiable
    * rows-only dump the query emits the measurable contract: the exact
    * pair-set size (DuckDB recomputes it independently from the
    * documents table) plus the recall and candidate-volume flags
    * described at [[SimhashRecallFloorPct]]. A hash match therefore
    * proves the approximate operator ran inside its spec — if recall
    * slips under the floor or pair volume goes superlinear, a boolean
    * flips and the driver's compare fails. One extra shuffle (the
    * full-outer pair join) over fixture-sized pair sets. */
  val d_dedup_simhash: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val found = simhashPairs(docs).select(col("doc_a"), col("doc_b"), lit(1).as("fnd"))
    val truth = d_ngram_jaccard(s, d).select(col("doc_a"), col("doc_b"), lit(1).as("tru"))
    val stats = found.join(truth, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(when(col("fnd").isNotNull && col("tru").isNotNull, 1L).otherwise(0L)).as("tp"),
        sum(when(col("fnd").isNotNull, 1L).otherwise(0L)).as("n_found"),
        sum(when(col("tru").isNotNull, 1L).otherwise(0L)).as("n_exact_pairs"))
    stats.crossJoin(docs.agg(count(lit(1)).as("n_docs")))
      .select(col("n_exact_pairs"),
        (col("tp") * lit(100L) >= col("n_exact_pairs") * lit(SimhashRecallFloorPct))
          .as("recall_ok"),
        (col("n_found") <= col("n_docs")).as("vol_ok"))
  }

  // ------------------------------------------------ dedup clustering

  /** Connected components over the near-dup pair graph — the step a
    * real dedup pipeline runs AFTER pair generation: pairs only say
    * "a~b"; deduplication needs CLUSTERS (a~b, b~c ⇒ {a,b,c}) and one
    * keeper per cluster.
    *
    * Algorithm: alternating LARGE-STAR / SMALL-STAR edge contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the shape GraphFrames ships as its default CC. Each
    * round rewires every node's neighbors to the minimum of its
    * closed neighborhood; both phases preserve component connectivity
    * and the edge set converges to a STAR FOREST (every node points
    * directly at its component's minimum id) in O(log n) rounds
    * REGARDLESS OF GRAPH DIAMETER. That diameter independence is the
    * point: plain min-label propagation needs diameter-many rounds,
    * and long near-dup chains (versioned / serially-edited pages)
    * produce exactly the deep-chain graphs that would silently
    * truncate under a fixed round cap. Convergence is verified
    * structurally (no parent is itself a child) and the round cap
    * FAILS LOUDLY via require — this function can return converged
    * labels or throw, never a silently-wrong clustering.
    *
    * Each phase is one shuffle (groupBy min + equi-join); the driver
    * holds only a boolean convergence count, never data. Per-phase
    * eager `localCheckpoint` truncates the iterative lineage (an
    * un-truncated plan doubles per round — exponential by round ~15;
    * the mandatory Pregel-on-Spark discipline). Caveat for a real
    * cluster: `localCheckpoint` stores blocks on executors, so losing
    * an executor mid-loop fails the job (acceptable: rerun) — a
    * deployment wanting fault-tolerant rounds swaps in reliable
    * `checkpoint()` against the cluster FS, same shape, one config.
    *
    * Output: (doc_id, cluster, is_keeper) over every doc in ≥1 pair,
    * cluster = min doc_id in the component, keeper = that min. The
    * DuckDB oracle replays the same exact-Jaccard pair graph and
    * closes it with a recursive CTE — a hash match proves the
    * distributed contraction found exactly the transitive closure. */
  private[ops] def connectedComponents(pairs: DataFrame): DataFrame =
    connectedComponentsWithRounds(pairs)._1

  /** [[connectedComponents]] plus the number of large/small-star
    * rounds it took — exposed so the spec can assert the O(log n)
    * convergence claim DIRECTLY (a 64-chain, diameter 63, must close
    * in ~log₂ rounds, where label propagation needs 63). */
  private[ops] def connectedComponentsWithRounds(pairs: DataFrame): (DataFrame, Int) = {
    // Materialize the pair graph ONCE before deriving anything from it:
    // vertices and the initial edge orientation both consume `pairs`,
    // and for every registered caller `pairs` is the WHOLE upstream
    // candidates→verify pipeline — without this checkpoint that
    // pipeline ran twice before the first star round even started
    // (measured at sf0.1: CC wall-clock was ~2× the verify stage for a
    // 1-round graph; guide §2.4 / §5 — cut the shared subtree, the pair
    // graph is verified-duplicates-sized, far smaller than the corpus).
    val base = pairs.localCheckpoint()
    // every vertex that appears in ≥1 pair (output coverage contract) —
    // lineage is one hop off `base`, no checkpoint of its own needed
    val vertices = base.select(col("doc_a").as("v"))
      .unionByName(base.select(col("doc_b").as("v")))
      .distinct()
    // canonical child→parent orientation (u > p), self-loops dropped
    var edges = base.filter(col("doc_a") =!= col("doc_b"))
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
        least(col("doc_a"), col("doc_b")).as("p"))
      .distinct().localCheckpoint()
    var chains = 1L
    var rounds = 0
    val MaxRounds = 50 // O(log n) algorithm: 50 covers n ≫ 2^50; require below
    while (chains > 0 && rounds < MaxRounds) {
      // LARGE-STAR: for every node u, link each STRICTLY LARGER
      // neighbor to m(u) = min(Γ(u) ∪ {u}). Processes the symmetrized
      // edge list so each undirected edge is seen from both endpoints.
      val sym = edges.unionByName(edges.select(col("p").as("u"), col("u").as("p")))
      val lmins = sym.groupBy("u").agg(min(col("p")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(lmins, "u")
        .filter(col("p") > col("u")) // v > u ≥ m keeps child→parent orientation
        .select(col("p").as("u"), col("m").as("p"))
        .filter(col("u") =!= col("p"))
        .distinct().localCheckpoint()
      // SMALL-STAR: for every node u, link its smaller neighbors AND
      // itself to m(u) = min(Γ⁻(u) ∪ {u}). Edges are already oriented
      // u > p, so Γ⁻ is exactly the p side.
      val smins = large.groupBy("u").agg(min(col("p")).as("m"))
      val small = large.join(smins, "u")
        .select(col("p").as("u"), col("m").as("p"))
        .unionByName(smins.select(col("u"), col("m").as("p")))
        .filter(col("u") =!= col("p"))
        .distinct().localCheckpoint()
      // Converged ⇔ star forest: no parent is itself a child. Both
      // phases preserve connectivity, so a star forest means each
      // original component is exactly one star rooted at its min id.
      chains = small.as("a")
        .join(small.as("b"), col("a.p") === col("b.u"))
        .limit(1).count()
      edges = small
      rounds += 1
    }
    require(chains == 0,
      s"connectedComponents did not converge within $MaxRounds large/small-star rounds")
    val labels = vertices.join(edges.select(col("u").as("v"), col("p")), Seq("v"), "left")
      .select(col("v").as("doc_id"),
        coalesce(col("p"), col("v")).as("cluster"),
        (col("p").isNull).as("is_keeper"))
    (labels, rounds)
  }

  val d_dedup_clusters: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val pairs = exactJaccard(lshCandidates(minhashSignatures(docs)), shingled(docs))
      .select(col("doc_a"), col("doc_b"))
    connectedComponents(pairs).orderBy(col("doc_id"))
  }

  /** END-TO-END dedup APPLICATION — the full near-dup pipeline run to
    * its actual product: MinHash-LSH candidates → exact-Jaccard verify
    * → connected components → drop every non-keeper → profile of the
    * SURVIVING corpus per source. This is the query a corpus team
    * actually ships (the pair/cluster queries are its observable
    * intermediate stages); the anti-join against the dropped set is
    * broadcast-size (dropped docs ≤ pair-graph vertices, a tiny
    * fraction of the corpus). The oracle replays the entire chain —
    * all-pairs Jaccard, recursive-CTE closure, NOT IN, aggregate — so
    * one hash match certifies the composition, not just the stages. */
  val d_dedup_apply: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val pairs = exactJaccard(lshCandidates(minhashSignatures(docs)), shingled(docs))
      .select(col("doc_a"), col("doc_b"))
    val dropped = connectedComponents(pairs)
      .filter(!col("is_keeper")).select(col("doc_id"))
    docs.join(dropped, Seq("doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------- substring-overlap dedup

  /** Content-defined-chunking parameters for [[d_dedup_substring]].
    * K/B/P reuse [[graft.functions.RollingHashes]]'s `t_fingerprint`
    * configuration (the DuckDB replay of that exact polynomial is
    * already proven); a window hash ≡ 0 mod [[SubChunkDiv]] marks a cut,
    * so expected chunk length ≈ 32 chars. Chunks under [[SubMinSpan]]
    * chars are noise (a 20-char span is ~3 words — below that, repeats
    * carry no boilerplate signal). [[SubDfCap]] bounds the removal
    * fan-out of a single fingerprint: a span shared by more docs than
    * the cap is GLOBAL boilerplate (site chrome, license walls) that a
    * production pipeline routes to a dedicated filter instead of
    * emitting corpus-sized removal lists through this operator. */
  private val SubK = 8
  private val SubBase = 257L
  private val SubMod = 1000003L
  private val SubChunkDiv = 32L
  private[ops] val SubMinSpan = 20
  private[ops] val SubDfCap = 1000L
  private[ops] val SubPlantOffset = 20000000L

  /** The planted shared span — a license-header lookalike long enough
    * (223 chars ≈ 7 expected chunks) to contain several interior
    * content-defined cuts, so every planted doc yields identical
    * interior chunks. ASCII, no quotes (it is embedded verbatim in the
    * DuckDB oracle SQL). */
  private[ops] val SubBoiler: String =
    "license header copyright notice all rights reserved redistribution " +
      "and use in source and binary forms with or without modification " +
      "are permitted provided that the above copyright notice appears " +
      "in all copies of the software"

  /** Corpus with planted cross-document spans, mirroring
    * [[plantedCorpus]]'s simulated re-crawl: every `doc_id % 7 == 0`
    * doc reappears (id-offset) with [[SubBoiler]] prepended. The
    * planted docs therefore share (a) the boilerplate span with each
    * OTHER and (b) their original text with their SOURCE doc — both are
    * true substring duplications the operator must find. */
  private[ops] def substringCorpus(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + SubPlantOffset).as("doc_id"),
          concat(lit(SubBoiler), lit(" "), col("text")).as("text")))

  /** Per-doc content-defined chunks: (doc_id, span_start, span_len,
    * fp16) for every chunk of at least [[SubMinSpan]] chars. One
    * NARROW projection chain — the native codegen'd O(len) rolling
    * hash, cut-position selection, and chunking are all per-row HOFs
    * over already-materialized columns (no shuffle until the caller
    * aggregates). Cuts are 1-based char positions whose K-window hash
    * ≡ 0 mod [[SubChunkDiv]]; position 1 is an implicit cut. Chunk i
    * spans [cut_i, cut_{i+1}) (last chunk runs to end-of-text), so
    * chunks tile the document exactly. Identical substrings in two
    * docs produce identical INTERIOR cuts (the window sees only span
    * content), hence identical chunk fingerprints — the standard CDC
    * argument, and the reason repeated spans are detectable by a plain
    * fingerprint groupBy instead of any pairwise comparison. */
  private[ops] def contentChunks(corpus: DataFrame): DataFrame = {
    val hs = corpus.filter(length(col("text")) >= SubK)
      .select(col("doc_id"), col("text"), length(col("text")).as("n"),
        graft.functions.RollingHashes
          .rollingHashes(col("text"), SubK, SubBase, SubMod).as("h"))
    val cuts = hs.select(col("doc_id"), col("text"), col("n"),
      concat(array(lit(1)),
        filter(
          transform(col("h"), (x, i) =>
            when(x % lit(SubChunkDiv) === 0 && i > 0, i + 1)),
          x => x.isNotNull)).as("cuts"))
    // span_len of cut i = next cut (or n+1 past the last cut) − cut i;
    // the CASE guard keeps element_at in-bounds under ANSI
    val spans = cuts.select(col("doc_id"), col("text"),
      explode(transform(col("cuts"), (c, i) =>
        struct(c.as("s"),
          (when(i === size(col("cuts")) - 1, col("n") + 1)
            .otherwise(element_at(col("cuts"), i + 2)) - c).as("l")))).as("sp"))
    spans
      .filter(col("sp.l") >= SubMinSpan)
      .select(col("doc_id"),
        col("sp.s").cast("long").as("span_start"),
        col("sp.l").cast("long").as("span_len"),
        substring(md5(col("text").substr(col("sp.s"), col("sp.l"))), 1, 16).as("fp16"))
  }

  /** Substring-overlap (cross-document repeated-span) dedup — the
    * production dedup mode doc-level exact/MinHash/SimHash all miss:
    * two documents sharing a 200-char boilerplate span are untouched
    * by whole-doc dedup, but a corpus pipeline must strip the repeated
    * span itself. Content-defined chunking (Rabin cuts over the
    * codegen'd rolling hash) makes equal spans yield equal chunks at
    * ALIGNED offsets regardless of surrounding text, so detection is
    * a fingerprint groupBy — one shuffle on fp16, map-side partial
    * agg, then one linear equi-join back on fp16. NEVER all-pairs:
    * per-fingerprint work is O(df), bounded by [[SubDfCap]], and no
    * self-join exists anywhere in the plan. Output: one removal row
    * (doc_id, span_start, span_len, fp16) for every occurrence of a
    * repeated chunk outside its keeper doc (keeper = min doc_id per
    * fingerprint, which keeps ALL its occurrences). The DuckDB oracle
    * replays the identical polynomial, cuts, chunking, md5
    * fingerprints, and keeper rule over the same planted corpus, so
    * the hash match certifies the whole pipeline exactly. */
  val d_dedup_substring: Q = (s, d) =>
    removalSpans(contentChunks(substringCorpus(Tables.documents(s, d))))
      .orderBy(col("doc_id"), col("span_start"), col("fp16"))

  /** The removal decision of [[d_dedup_substring]], unordered —
    * hoisted so the scrub operator below applies the IDENTICAL
    * keeper/df rule (one definition for detect and apply). */
  private[ops] def removalSpans(chunks: DataFrame): DataFrame = {
    val grp = chunks.groupBy("fp16")
      .agg(min(col("doc_id")).as("keeper"), countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= 2 && col("df") <= SubDfCap)
      .select(col("fp16"), col("keeper"))
    chunks.join(grp, "fp16")
      .filter(col("doc_id") =!= col("keeper"))
      .select(col("doc_id"), col("span_start"), col("span_len"), col("fp16"))
  }

  /** Span-granular corpus REWRITE — the apply step of substring
    * dedup, and the shape a production curation pipeline actually
    * ships (RefinedWeb/FineWeb-style passage dedup): duplicated spans
    * are EXCISED from each non-keeper document while the document
    * itself survives, vs [[d_dedup_apply]]'s whole-doc drop. Because
    * [[contentChunks]] tiles each document, removal spans are
    * pairwise disjoint by construction, so the rewrite is a single
    * ordered fold: sort each doc's spans, walk the text once
    * appending the kept gap before each span, then the tail.
    *
    * Scale shape: the span set is the SMALL side (docs with repeated
    * content × spans each — a fraction of the corpus); it groups to
    * one array per affected doc and left-joins back, so untouched
    * documents stream through with a null probe and zero text
    * movement, and the fold itself is one NARROW codegen'd
    * `aggregate` HOF per row — no per-segment text replication, no
    * window over the corpus, no shuffle of the text column beyond
    * the one equi-join. Output is (lengths, span count, md5₁₆ of the
    * scrubbed text) — both engines md5 the same UTF-8 bytes, so the
    * rewrite is certified byte-exact without dumping the corpus. */
  val d_substring_scrub: Q = (s, d) => {
    val corpus = substringCorpus(Tables.documents(s, d))
    val rem = removalSpans(contentChunks(corpus))
    val spansPerDoc = rem.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_len")))).as("spans"),
        count(lit(1)).as("n_spans"))
    val folded = corpus.join(spansPerDoc, Seq("doc_id"), "left")
      .withColumn("scrubbed",
        when(col("spans").isNull, col("text")).otherwise(
          aggregate(
            col("spans"),
            struct(lit(1L).as("pos"), lit("").as("acc")),
            (st, sp) => struct(
              (sp.getField("span_start") + sp.getField("span_len")).as("pos"),
              concat(st.getField("acc"),
                col("text").substr(st.getField("pos").cast("int"),
                  (sp.getField("span_start") - st.getField("pos")).cast("int"))).as("acc")),
            st => concat(st.getField("acc"),
              col("text").substr(st.getField("pos").cast("int"), length(col("text")))))))
    folded.select(col("doc_id"),
      length(col("text")).cast("long").as("n_before"),
      length(col("scrubbed")).cast("long").as("n_after"),
      coalesce(col("n_spans"), lit(0L)).as("n_spans"),
      substring(md5(col("scrubbed")), 1, 16).as("scrub16"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------- embedding near-dup

  /** Near-dup corpus construction, mirroring [[d_dedup_exact]]'s
    * simulated re-crawl: the embeddings table unioned with a
    * DETERMINISTICALLY PERTURBED copy of its `vec_id % 5 == 0` slice
    * (ids offset by [[PlantOffset]]; element i scaled by
    * 1 + (((id·31+i) mod 7) − 3)/1000 — i.e. each planted copy is a
    * ~0.1 %-noise near-duplicate of its source, cos ≈ 0.99999).
    *
    * WHY the corpus is constructed: this fixture's raw pair-cosine
    * distribution tops out at 0.60 — "pairs above 0.45" are
    * background-tail pairs, mostly cross-cluster, and recovering them
    * is information-theoretically an all-pairs problem (measured: any
    * IVF/LSH candidate set recovering all of them at sf0.1 contains
    * ≥ 96 % of ALL pairs — fake pruning). Real embedding dedup targets
    * near-IDENTICAL vectors; planting them makes the query test
    * exactly that, with a 0.9 threshold sitting in a wide margin
    * (0.60 ≪ 0.9 ≪ 0.9999) so the verified output is structurally
    * robust to quantizer detail. Everything is expressible in both
    * engines, so the DuckDB oracle replays the same construction
    * all-pairs. */
  private[ops] val PlantOffset = 10000000L

  private[ops] def plantedCorpus(e: DataFrame): DataFrame = {
    val base = e.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("embedding"))
    val planted = e.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + PlantOffset).as("vec_id"),
        expr(s"""transform(sequence(1, ${SimilarityOps.Dim}),
                 i -> CAST(element_at(embedding, i) AS DOUBLE) *
                      (1.0D + (CAST((vec_id * 31 + i) % 7 AS DOUBLE) - 3.0D) / 1000.0D))""")
          .as("embedding"))
    base.unionByName(planted)
  }

  /** Cells and probes for the bucketed candidate join. Near-identical
    * pairs land on the same nearest centroid except exactly at a cell
    * boundary, where the 1st/2nd nearest may swap between the two copies
    * — probing 2 cells covers that. Candidate fraction ≈ p²/k = 25 % of
    * the pair space here; at 100 TB k grows ~√n (cells stay
    * constant-sized) so the fraction keeps shrinking. */
  private val EmbCells = 16
  private val EmbProbes = 2

  /** Embedding near-dup pairs at cos ≥ 0.9 over the planted re-crawl
    * corpus — BUCKETED: vectors are assigned to their [[EmbProbes]]
    * nearest KMeans centroids ([[SimilarityOps.assignNearest]], a
    * narrow codegen'd map over driver-side centroids), candidate pairs
    * are generated only WITHIN a cell (equi-join on cent — never a
    * cartesian product; the shuffle is on centroid id and per-cell work
    * is |cell|², not |corpus|²), then exact-cosine verified. A pair
    * sharing both probed cells scores identically in each, so
    * `distinct()` is exact. The DuckDB oracle is the ALL-PAIRS answer
    * over the same corpus: hash-matching it proves the bucketed
    * candidates recover every qualifying pair. */
  val d_dedup_embedding: Q = (s, d) => {
    val corpus = plantedCorpus(Tables.embeddings(s, d))
    val cents = SimilarityOps.kmeansCentroids(corpus, EmbCells)
    val assigned = SimilarityOps.assignNearest(corpus, cents, "embedding", "cent", EmbProbes)
    // norms once per vector (narrow), native codegen'd dot per
    // candidate pair inside the cell join
    val a = assigned.select(col("cent"), col("vec_id").as("id_a"), col("embedding").as("ea"))
      .withColumn("na", sqrt(normSq(col("ea"))))
    val b = assigned.select(col("cent"), col("vec_id").as("id_b"), col("embedding").as("eb"))
      .withColumn("nb", sqrt(normSq(col("eb"))))
    a.join(b, "cent")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_e6",
        round(dot(col("ea"), col("eb")) / (col("na") * col("nb")) * 1e6).cast("long"))
      .filter(col("cos_e6") >= 900000L)
      .select(col("id_a"), col("id_b"), col("cos_e6"))
      .distinct()
      .orderBy(col("id_a"), col("id_b"))
  }

  // ----------------------------------------------------- fuzzy join

  /** Edit-distance (Levenshtein ≤ 1) join via the FastSS deletion
    * neighborhood — the entity-resolution primitive (typo'd names,
    * OCR'd strings, crawl-url variants) in its never-all-pairs shape.
    * Each side emits the string itself plus every single-character
    * deletion (len+1 variants); two strings are within distance 1 IFF
    * their variant sets intersect (substitution: delete the differing
    * position from both; insertion/deletion: the longer side's
    * deletion equals the shorter side verbatim; identity: the string
    * itself) — so a plain EQUI-join on the variant recovers EVERY
    * qualifying pair, and the real `levenshtein` (codegen'd) verifies
    * survivors. Candidates travel as id pairs only; text joins back
    * late (guide §2.3).
    *
    * Round 17 replaced PassJoin-style half-segment blocking here: on
    * TEMPLATED corpora (these names share the 9-char "Supplier#"
    * prefix and differ only in trailing digits — exactly like real
    * entity tables share "Inc."/"GmbH" boilerplate) a half or even a
    * ¾-length segment is corpus-common, so segment buckets went
    * quadratic: the candidate join produced ~|A|×|B| pairs at sf0.1
    * and the query spent a steady 2.1 s on 1 000 rows (measured,
    * DedupProbe). Deletion variants keep every distinguishing digit
    * in the key, so bucket sizes track true near-dup degree; at
    * threshold 1 the neighborhood is len+1 keys/row — linear state,
    * shuffled by variant content, never |A|×|B|.
    *
    * Probes are planted deterministically from supplier names — one
    * substitution, deletion or insertion at a key-dependent position —
    * and the DuckDB oracle runs the EXHAUSTIVE join (fine at fixture
    * scale): a hash match proves the blocking loses no qualifying pair.
    * Some probes legitimately match several canonicals (delete a digit
    * from a numeric suffix and two insertions restore different names)
    * — the join keeps all of them. */
  val d_fuzzy_join: Q = (s, d) => {
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"))
    // planted typo probes: position pos = key % 17 (0-based prefix len)
    val mkProbe =
      when(col("s_suppkey") % 3 === 0, concat(
        expr("substring(s_name, 1, CAST(s_suppkey % 17 AS INT))"), lit("x"),
        expr("substring(s_name, CAST(s_suppkey % 17 AS INT) + 2)")))
      .when(col("s_suppkey") % 3 === 1, concat(
        expr("substring(s_name, 1, CAST(s_suppkey % 17 AS INT))"),
        expr("substring(s_name, CAST(s_suppkey % 17 AS INT) + 2)")))
      .otherwise(concat(
        expr("substring(s_name, 1, CAST(s_suppkey % 17 AS INT))"), lit("x"),
        expr("substring(s_name, CAST(s_suppkey % 17 AS INT) + 1)")))
    val probes = sup.select(col("s_suppkey").as("probe_id"), mkProbe.as("probe"))
    // deletion neighborhood of a string column: the string itself plus
    // every single-character deletion — len+1 variants, built in-row
    def delVariants(name: String): Column = array_distinct(
      expr(s"concat(array($name), transform(sequence(1, length($name)), " +
        s"i -> concat(substring($name, 1, i - 1), substring($name, i + 1))))"))
    val probeKeys = probes
      .select(col("probe_id"), explode(delVariants("probe")).as("v"))
    val canonKeys = sup
      .select(col("s_suppkey"), explode(delVariants("s_name")).as("v"))
    // candidates travel as id pairs only; names (functionally
    // dependent on the ids) join back late, so the distinct-pair set —
    // and every levenshtein evaluation and final row — is unchanged
    val cand = probeKeys.join(canonKeys, "v")
      .select(col("probe_id"), col("s_suppkey"))
      .distinct()
    cand
      .join(broadcast(probes), "probe_id")
      .join(broadcast(sup), "s_suppkey")
      .withColumn("dist", levenshtein(col("probe"), col("s_name")))
      .filter(col("dist") <= 1)
      .select(col("probe_id"), col("probe"), col("s_suppkey"), col("s_name"), col("dist"))
      .orderBy(col("probe_id"), col("s_suppkey"))
  }

  // ------------------------------------------------------------ registry

  // --------------------------------------- persisted-index serving

  /** Write-once durable dedup index per (session, fixture dir) over
    * the OLD corpus slice (doc_id % 5 ≠ 4 — the same old/new split as
    * [[d_dedup_incremental]]). Lives under tmpdir for the session,
    * deleted on JVM exit. */
  private val dedupIndexDirs = graft.SessionCache.newCache[String]()

  private[graft] def persistedDedupIndexDir(s: org.apache.spark.sql.SparkSession,
                                            d: String): String =
    graft.SessionCache.perSession(dedupIndexDirs, s).getOrElseUpdate(d, {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_dedupidx_" +
        Tables.layoutTag(d)
      DedupIndexStore.build(
        Tables.documents(s, d).filter(col("doc_id") % 5 =!= 4)
          .select(col("doc_id"), col("text")), p)
      graft.Fs.deleteOnExit(p): Unit
      p
    })

  /** Write-once near-dup CLUSTER artifact per (session, fixture dir):
    * the full LSH → exact-Jaccard verify → connected-components
    * pipeline run ONCE and PERSISTED as a (doc_id, cluster, is_keeper)
    * parquet table — the production shape for every consumer that
    * needs the cluster labels but is not itself the dedup pipeline
    * (e.g. [[PipelineOps.p_leakage_split]]'s split key). A corpus team
    * derives clusters once per corpus version and every downstream
    * step (splits, keeper filters, audits) joins the stored table; at
    * 100 TB the table is pair-graph-sized (only docs in ≥1 near-dup
    * pair appear — a tiny fraction of the corpus), so consumers
    * BROADCAST it instead of re-running the pipeline. Lives under
    * tmpdir for the session, deleted on JVM exit. */
  private val clusterArtifacts = graft.SessionCache.newCache[String]()

  private[graft] def clusterArtifactDir(s: org.apache.spark.sql.SparkSession,
                                        d: String): String =
    graft.SessionCache.perSession(clusterArtifacts, s).getOrElseUpdate(d, {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_dupclusters_" +
        Tables.layoutTag(d)
      val docs = Tables.documents(s, d)
      val pairs = exactJaccard(lshCandidates(minhashSignatures(docs)), shingled(docs))
        .select(col("doc_a"), col("doc_b"))
      connectedComponents(pairs).write.mode("overwrite").parquet(p)
      graft.Fs.deleteOnExit(p): Unit
      p
    })

  /** Write-once INCREMENTALLY-ASSEMBLED dedup index per (session,
    * fixture dir): epoch 0 indexes doc_id % 5 ∈ {0, 1}, then
    * [[DedupIndexStore.applyDelta]] appends % 5 ∈ {2, 3} — real
    * maintenance over real ids, after which the index covers exactly
    * the same OLD corpus as [[persistedDedupIndexDir]]. */
  private[graft] def deltaDedupIndexDir(s: org.apache.spark.sql.SparkSession,
                                        d: String): String =
    graft.SessionCache.perSession(dedupIndexDirs, s).getOrElseUpdate("delta:" + d, {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_dedupidxd_" +
        Tables.layoutTag(d)
      val old = Tables.documents(s, d).filter(col("doc_id") % 5 =!= 4)
        .select(col("doc_id"), col("text"))
      DedupIndexStore.build(old.filter(col("doc_id") % 5 < 2), p)
      DedupIndexStore.applyDelta(s, p, old.filter(col("doc_id") % 5 >= 2)): Unit
      graft.Fs.deleteOnExit(p): Unit
      p
    })

  /** The daily near-dup screen served from the PERSISTED index
    * ([[DedupIndexStore]]): the 20 % "new day" batch (doc_id % 5 = 4)
    * probes the old corpus's banded LSH postings with its own band
    * keys and exact-verifies against the persisted shingle registry —
    * zero corpus jobs at serve time, and the result hash-matches the
    * from-scratch OLD × NEW exact-Jaccard replay in DuckDB (the whole
    * claim: the persisted artifacts reproduce the corpus computation
    * exactly, uncapped like [[d_dedup_minhash]]). */
  lazy val d_dedup_served: Q = (s, d) => {
    val dir = persistedDedupIndexDir(s, d)
    DedupIndexStore.nearDups(s, dir, DedupIndexStore.open(dir),
        Tables.documents(s, d).filter(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("text")))
      .orderBy(col("doc_new"), col("doc_old"))
  }

  /** The daily screen served after a RESHARD to 4× both fan-outs (one
    * flip; postings re-hash from their stored band keys, the registry
    * re-partitions — zero corpus jobs, nothing re-shingled):
    * hash-matching the SAME from-scratch oracle as [[d_dedup_served]]
    * proves the re-layout changed nothing observable — the grow-path
    * that keeps per-bucket posting volume ~√N as the corpus outgrows
    * its birth sizing (the ANN store's [[graft.ops.AnnIndexStore
    * .rebalance]] is this operation's trained-artifact sibling). */
  lazy val d_dedup_resharded: Q = (s, d) => {
    val dir = reshardedDedupIndexDir(s, d)
    DedupIndexStore.nearDups(s, dir, DedupIndexStore.open(dir),
        Tables.documents(s, d).filter(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("text")))
      .orderBy(col("doc_new"), col("doc_old"))
  }

  /** The daily screen served AFTER A SINGLE-FLIP CONTENT UPDATE
    * (1/45 of the indexed corpus re-texted by one
    * [[DedupIndexStore.applyUpdate]] commit — no tombstone, no
    * compact): hash-matching the from-scratch OLD×NEW replay over the
    * UPDATED corpus proves both halves at once — the updated docs'
    * old postings are physically gone (their former pairs vanish) and
    * the new postings serve (each updated doc pairs with its donor
    * batch doc at jac_e6 = 1000000). The operation the
    * delete→compact→insert dance previously made three epochs, in
    * one — completing update symmetry across all three durable
    * indexes (ANN deltas carry `op = "update"`; the text index got
    * [[TextIndexStore.applyUpdate]] this round). */
  lazy val d_dedup_updated: Q = (s, d) => {
    val dir = updatedDedupIndexDir(s, d)
    DedupIndexStore.nearDups(s, dir, DedupIndexStore.open(dir),
        Tables.documents(s, d).filter(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("text")))
      .orderBy(col("doc_new"), col("doc_old"))
  }

  /** The same daily screen served from the INCREMENTALLY-assembled
    * index (build on half the old corpus, delta-append the rest):
    * hash-matching the identical from-scratch oracle proves the append
    * commit — merged band buckets, appended registry segment, bumped
    * nDocs — converges exactly to the full-build answer. */
  lazy val d_dedup_index_delta: Q = (s, d) => {
    val dir = deltaDedupIndexDir(s, d)
    DedupIndexStore.nearDups(s, dir, DedupIndexStore.open(dir),
        Tables.documents(s, d).filter(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("text")))
      .orderBy(col("doc_new"), col("doc_old"))
  }

  /** The daily screen TIME-TRAVELED to the pre-delta epoch — the
    * reproducibility read a versioned dedup index owes ("which docs
    * would LAST WEEK's corpus have flagged?"), previously spec-pinned,
    * now oracle-checked: [[DedupIndexStore.openAt]] resolves epoch 0
    * of the incrementally-assembled index (built on the
    * `doc_id % 5 < 2` half of the old corpus, before the delta
    * appended the rest), and probing under that manifest must screen
    * against ONLY the bootstrap corpus — its own bucket pointers, its
    * own registry segment; the later epoch sharing the directory leaks
    * nothing in. The DuckDB oracle replays the OLD × NEW exact-Jaccard
    * from scratch with the old side bounded to the bootstrap docs. */
  lazy val d_dedup_asof: Q = (s, d) => {
    val dir = deltaDedupIndexDir(s, d)
    DedupIndexStore.nearDups(s, dir, DedupIndexStore.openAt(dir, 0L),
        Tables.documents(s, d).filter(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("text")))
      .orderBy(col("doc_new"), col("doc_old"))
  }

  /** Write-once UPDATED index per (session, fixture dir) for
    * [[d_dedup_updated]]: the OLD corpus indexed at epoch 0, then the
    * `doc_id ≡ 1 (mod 45)` docs' text REPLACED — by the text of doc
    * `doc_id + 3`, which is a BATCH doc (`(id+3) % 5 = 4`) — in ONE
    * [[DedupIndexStore.applyUpdate]] flip. The construction makes both
    * halves of the update observable in the served screen: the updated
    * docs' OLD near-dup pairs must vanish (old postings physically
    * removed) and each updated doc must now pair with its donor batch
    * doc at Jaccard 1.0 (new postings live). */
  private[graft] def updatedDedupIndexDir(s: org.apache.spark.sql.SparkSession,
                                          d: String): String =
    graft.SessionCache.perSession(dedupIndexDirs, s).getOrElseUpdate("upd:" + d, {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_dedupidxu_" +
        Tables.layoutTag(d)
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
      DedupIndexStore.build(docs.filter(col("doc_id") % 5 =!= 4), p)
      val upd = docs.filter(col("doc_id") % 45 === 1)
        .join(docs.select((col("doc_id") - 3).as("doc_id"),
          col("text").as("new_text")), "doc_id")
        .select(col("doc_id"), col("new_text").as("text"))
      DedupIndexStore.applyUpdate(s, p, upd): Unit
      graft.Fs.deleteOnExit(p): Unit
      p
    })

  /** Write-once RESHARDED index per (session, fixture dir) for
    * [[d_dedup_resharded]]: the OLD corpus indexed at the default
    * fan-outs (16, 16), then [[DedupIndexStore.reshard]] re-hashes
    * postings AND registry to (64, 64) behind one flip — the grow-path
    * a 100×-larger corpus takes instead of re-shingling everything. */
  private[graft] def reshardedDedupIndexDir(s: org.apache.spark.sql.SparkSession,
                                            d: String): String =
    graft.SessionCache.perSession(dedupIndexDirs, s).getOrElseUpdate("reshard:" + d, {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_dedupidxr_" +
        Tables.layoutTag(d)
      DedupIndexStore.build(
        Tables.documents(s, d).filter(col("doc_id") % 5 =!= 4)
          .select(col("doc_id"), col("text")), p)
      DedupIndexStore.reshard(s, p, 64, 64): Unit
      graft.Fs.deleteOnExit(p): Unit
      p
    })

  /** Write-once COMPACTED index per (session, fixture dir): the
    * delta-assembled index (two registry segments) squashed to one
    * segment by [[DedupIndexStore.compact]] — the segment-merge
    * lifecycle step that bounds serve-time read amplification. */
  private[graft] def compactedDedupIndexDir(s: org.apache.spark.sql.SparkSession,
                                            d: String): String =
    graft.SessionCache.perSession(dedupIndexDirs, s).getOrElseUpdate("compact:" + d, {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_dedupidxc_" +
        Tables.layoutTag(d)
      val old = Tables.documents(s, d).filter(col("doc_id") % 5 =!= 4)
        .select(col("doc_id"), col("text"))
      DedupIndexStore.build(old.filter(col("doc_id") % 5 < 2), p)
      DedupIndexStore.applyDelta(s, p, old.filter(col("doc_id") % 5 >= 2)): Unit
      DedupIndexStore.compact(s, p): Unit
      graft.Fs.deleteOnExit(p): Unit
      p
    })

  /** Write-once DELETED-FROM index per (session, fixture dir): the
    * full old corpus indexed, then `doc_id % 3 = 1` deleted by
    * [[DedupIndexStore.applyDelete]] — victims' postings located via
    * their registered shingles and removed EXACTLY, so serving needs
    * no tombstone filtering. */
  private[graft] def deletedDedupIndexDir(s: org.apache.spark.sql.SparkSession,
                                          d: String): String =
    graft.SessionCache.perSession(dedupIndexDirs, s).getOrElseUpdate("del:" + d, {
      val p = s"${System.getProperty("java.io.tmpdir")}/graft_dedupidxdel_" +
        Tables.layoutTag(d)
      val old = Tables.documents(s, d).filter(col("doc_id") % 5 =!= 4)
        .select(col("doc_id"), col("text"))
      DedupIndexStore.build(old, p)
      DedupIndexStore.applyDelete(s, p,
        old.filter(col("doc_id") % 3 === 1).select(col("doc_id"))): Unit
      graft.Fs.deleteOnExit(p): Unit
      p
    })

  /** The daily screen against an index a third of whose corpus was
    * DELETED: hash-matching the from-scratch replay over the SURVIVING
    * old docs proves the delete was exact — victims can no longer pair
    * (their postings are physically gone, not filtered), survivors'
    * pairs are untouched. */
  lazy val d_dedup_deleted: Q = (s, d) => {
    val dir = deletedDedupIndexDir(s, d)
    DedupIndexStore.nearDups(s, dir, DedupIndexStore.open(dir),
        Tables.documents(s, d).filter(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("text")))
      .orderBy(col("doc_new"), col("doc_old"))
  }

  /** The same daily screen after SEGMENT COMPACTION (build half,
    * delta-append the rest, squash the registry to one segment):
    * hash-matching the identical from-scratch oracle proves compaction
    * is a pure re-layout — same pairs, fewer serve-time leaf reads. */
  lazy val d_dedup_compacted: Q = (s, d) => {
    val dir = compactedDedupIndexDir(s, d)
    DedupIndexStore.nearDups(s, dir, DedupIndexStore.open(dir),
        Tables.documents(s, d).filter(col("doc_id") % 5 === 4)
          .select(col("doc_id"), col("text")))
      .orderBy(col("doc_new"), col("doc_old"))
  }

  /** Uncapped OLD × NEW exact-Jaccard replay — the shared oracle of
    * the served-dedup queries ([[d_dedup_incremental]]'s shape minus
    * the df cap, which the LSH-candidate route does not apply — same
    * uncapped semantics as [[d_dedup_minhash]]). Parameterized over
    * the OLD-side predicate so the delete witness replays against the
    * surviving corpus with the same single SQL definition. */
  private def servedDedupOracleOver(oldPred: String,
                                    corpus: String = "documents"): String =
    s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM $corpus),
      |idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM words),
      |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |common AS (SELECT b.doc_id AS doc_new, a.doc_id AS doc_old, count(*) AS c
      |           FROM sh a JOIN sh b ON a.s = b.s
      |            AND ($oldPred) AND b.doc_id % 5 = 4
      |           GROUP BY 1, 2)
      |SELECT doc_new, doc_old,
      |  CAST(ROUND(1000000.0 * c / (nn.n + no.n - c)) AS BIGINT) AS jac_e6
      |FROM common
      |JOIN sizes nn ON doc_new = nn.doc_id
      |JOIN sizes no ON doc_old = no.doc_id
      |WHERE 2 * c >= (nn.n + no.n - c)
      |ORDER BY doc_new, doc_old""".stripMargin

  private[graft] val servedDedupOracle: String =
    servedDedupOracleOver("a.doc_id % 5 <> 4")

  /** Shared CTE prefix of the embedding-dedup oracles: the planted
    * corpus construction + the EXHAUSTIVE all-pairs exact cosine ≥ 0.9
    * (fixture scale only) ending at `epairs(ia, ib, cos_e6)` — ONE
    * definition consumed by the [[d_dedup_embedding]] pair replay here
    * and the [[PipelineOps.p_semantic_dedup]] cluster replay, so the
    * two hash checks' pair derivations can never drift apart. */
  private[ops] lazy val embedPairCtes: String = {
    val cos = graft.functions.VectorFunctions
      .oracleCosineSql("a.embedding", "b.embedding", SimilarityOps.Dim)
    s"""corpus AS (
       |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS embedding
       |  FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + $PlantOffset,
       |    list_transform(generate_series(1, ${SimilarityOps.Dim}),
       |      i -> CAST(embedding[i] AS DOUBLE) *
       |           (1.0 + (CAST((vec_id * 31 + i) % 7 AS DOUBLE) - 3.0) / 1000.0))
       |  FROM embeddings WHERE vec_id % 5 = 0),
       |epairs AS (
       |  SELECT a.vec_id AS ia, b.vec_id AS ib,
       |    CAST(ROUND($cos * 1000000) AS BIGINT) AS cos_e6
       |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
       |  WHERE CAST(ROUND($cos * 1000000) AS BIGINT) >= 900000)""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "d_dedup_exact" -> d_dedup_exact,
    "d_line_dedup" -> d_line_dedup,
    "d_ngram_jaccard" -> d_ngram_jaccard,
    "d_containment" -> d_containment,
    "d_dedup_incremental" -> d_dedup_incremental,
    "d_dedup_served" -> d_dedup_served,
    "d_dedup_updated" -> d_dedup_updated,
    "d_dedup_resharded" -> d_dedup_resharded,
    "d_dedup_index_delta" -> d_dedup_index_delta,
    "d_dedup_asof" -> d_dedup_asof,
    "d_dedup_compacted" -> d_dedup_compacted,
    "d_dedup_deleted" -> d_dedup_deleted,
    "d_dedup_minhash" -> d_dedup_minhash,
    "d_dedup_simhash" -> d_dedup_simhash,
    "d_dedup_embedding" -> d_dedup_embedding,
    "d_dedup_clusters" -> d_dedup_clusters,
    "d_dedup_apply" -> d_dedup_apply,
    "d_dedup_substring" -> d_dedup_substring,
    "d_substring_scrub" -> d_substring_scrub,
    "d_fuzzy_join" -> d_fuzzy_join,
  )

  /** Shared CTE prefix of the two substring-dedup oracles: exact
    * replay of the content-defined-chunking pipeline — identical
    * Karp-Rabin polynomial (proven replay from t_fingerprint), cut
    * rule, tiling, md5 chunk fingerprints — ending at the `spans` and
    * `grp` CTEs both consumers select from. ONE definition, so the
    * detect and apply oracles can never drift apart. */
  /** Shared recursive-CTE prefix deriving the near-dup CLUSTER walk
    * (all-pairs df-uncapped Jaccard ≥ 0.5 → symmetric edges →
    * transitive closure `walk(v, l)`), ONE definition consumed by the
    * `d_dedup_clusters` / `d_dedup_apply` oracles here and the
    * leakage-split oracle in [[PipelineOps]] — so the cluster
    * derivation the three hash checks replay can never drift apart. */
  private[ops] lazy val clusterWalkCte: String =
    """WITH RECURSIVE
      |words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM words),
      |sh AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx),
      |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
      |common AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
      |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2),
      |pairs AS (SELECT ia AS a, ib AS b FROM common
      |          JOIN sizes na ON ia = na.doc_id
      |          JOIN sizes nb ON ib = nb.doc_id
      |          WHERE 2 * c >= (na.n + nb.n - c)),
      |edges AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
      |walk(v, l) AS (
      |  SELECT DISTINCT a, a FROM edges
      |  UNION
      |  SELECT e.b, w.l FROM walk w JOIN edges e ON e.a = w.v)""".stripMargin

  private lazy val substringSpansCte: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $SubPlantOffset, '$SubBoiler' || ' ' || text
       |  FROM documents WHERE doc_id % 7 = 0),
       |hs AS (
       |  SELECT doc_id, text, length(text) AS n,
       |    list_transform(generate_series(1, length(text) - ${SubK - 1}),
       |      i -> list_reduce(
       |             list_prepend(0, list_transform(generate_series(0, ${SubK - 1}),
       |               j -> ascii(substr(text, i + j, 1)))),
       |             (acc, x) -> (acc * $SubBase + x) % $SubMod)) AS h
       |  FROM corpus WHERE length(text) >= $SubK),
       |cuts AS (
       |  SELECT doc_id, text, n,
       |    list_prepend(1, list_filter(
       |      list_transform(h, (x, i) ->
       |        CASE WHEN x % $SubChunkDiv = 0 AND i > 1 THEN i ELSE NULL END),
       |      x -> x IS NOT NULL)) AS cuts
       |  FROM hs),
       |chunks AS (
       |  SELECT doc_id, text, n, cuts, unnest(generate_series(1, len(cuts))) AS i
       |  FROM cuts),
       |spans AS (
       |  SELECT doc_id,
       |    CAST(cuts[i] AS BIGINT) AS span_start,
       |    CAST((CASE WHEN i = len(cuts) THEN n + 1 ELSE cuts[i + 1] END) - cuts[i]
       |      AS BIGINT) AS span_len,
       |    substr(md5(substr(text, cuts[i],
       |      (CASE WHEN i = len(cuts) THEN n + 1 ELSE cuts[i + 1] END) - cuts[i])),
       |      1, 16) AS fp16
       |  FROM chunks
       |  WHERE (CASE WHEN i = len(cuts) THEN n + 1 ELSE cuts[i + 1] END) - cuts[i]
       |        >= $SubMinSpan),
       |grp AS (
       |  SELECT fp16, min(doc_id) AS keeper, count(DISTINCT doc_id) AS df
       |  FROM spans GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "d_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT * FROM documents
        |  UNION ALL
        |  SELECT * FROM documents WHERE source = 'src0')
        |SELECT min(doc_id) AS doc_id, count(*) AS n_copies,
        |  substr(sha256(text), 1, 16) AS hash16
        |FROM corpus GROUP BY sha256(text) ORDER BY doc_id""".stripMargin,
    // d_line_dedup: segmentation, first-occurrence ranking, and the
    // ordered reassembly replayed from first principles; COALESCE('')
    // matches Spark's empty array_join for an all-duplicate doc
    "d_line_dedup" ->
      s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |chunks AS (
        |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
        |    array_to_string(w[(i * $LineWords + 1):(i * $LineWords + $LineWords)], ' ') AS line
        |  FROM (SELECT doc_id, w,
        |          unnest(generate_series(0, CAST(ceil(len(w) / ${LineWords}.0) AS INT) - 1)) AS i
        |        FROM words)),
        |ranked AS (
        |  SELECT doc_id, pos, line,
        |    ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rk
        |  FROM chunks)
        |SELECT doc_id, COUNT(*) AS n_lines,
        |  CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  COALESCE(string_agg(CASE WHEN rk = 1 THEN line END, ' ' ORDER BY pos), '') AS clean_text
        |FROM ranked GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d_ngram_jaccard" -> jaccardOracle(Some(ShingleDfCap)),
    "d_containment" ->
      s"""WITH corpus AS (
         |  SELECT doc_id, text FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000 AS doc_id,
         |    array_to_string((string_split(text, ' '))[1:30], ' ') AS text
         |  FROM documents WHERE doc_id % 11 = 0),
         |words AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
         |idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM words),
         |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx),
         |keep AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= $ShingleDfCap),
         |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN keep ON sh0.s = keep.s),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |common AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
         |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |           GROUP BY 1, 2)
         |SELECT ia AS doc_a, ib AS doc_b,
         |  CAST(ROUND(1000000.0 * c / least(na.n, nb.n)) AS BIGINT) AS cont_e6,
         |  CAST(ROUND(1000000.0 * c / (na.n + nb.n - c)) AS BIGINT) AS jac_e6
         |FROM common
         |JOIN sizes na ON ia = na.doc_id
         |JOIN sizes nb ON ib = nb.doc_id
         |WHERE 5 * c >= 4 * least(na.n, nb.n)
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d_dedup_served" -> servedDedupOracle,
    // a reshard is observationally a no-op: same from-scratch oracle
    "d_dedup_resharded" -> servedDedupOracle,
    // the from-scratch replay over the UPDATED corpus: every %45=1 old
    // doc carries its donor batch doc's text (the same construction
    // the Spark side applied through ONE applyUpdate flip)
    "d_dedup_updated" -> servedDedupOracleOver("a.doc_id % 5 <> 4",
      """(SELECT d.doc_id, COALESCE(u.text, d.text) AS text
        | FROM documents d LEFT JOIN documents u
        |   ON d.doc_id % 45 = 1 AND u.doc_id = d.doc_id + 3) c""".stripMargin),
    "d_dedup_index_delta" -> servedDedupOracle,
    // time travel: epoch 0 of that same index screens against ONLY
    // the bootstrap half of the old corpus — from-scratch replay with
    // the old side bounded to it
    "d_dedup_asof" -> servedDedupOracleOver("a.doc_id % 5 < 2"),
    "d_dedup_compacted" -> servedDedupOracle,
    // the delete witness replays against the SURVIVING old corpus —
    // the index must behave as if the victims were never there
    "d_dedup_deleted" ->
      servedDedupOracleOver("a.doc_id % 5 <> 4 AND a.doc_id % 3 <> 1"),
    "d_dedup_incremental" ->
      s"""WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         |idx AS (SELECT doc_id, w, unnest(generate_series(1, len(w) - 2)) AS i FROM words),
         |sh0 AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s FROM idx),
         |keep AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) <= $ShingleDfCap),
         |sh AS (SELECT doc_id, sh0.s FROM sh0 JOIN keep ON sh0.s = keep.s),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
         |common AS (SELECT b.doc_id AS doc_new, a.doc_id AS doc_old, count(*) AS c
         |           FROM sh a JOIN sh b ON a.s = b.s
         |            AND a.doc_id % 5 <> 4 AND b.doc_id % 5 = 4
         |           GROUP BY 1, 2)
         |SELECT doc_new, doc_old,
         |  CAST(ROUND(1000000.0 * c / (nn.n + no.n - c)) AS BIGINT) AS jac_e6
         |FROM common
         |JOIN sizes nn ON doc_new = nn.doc_id
         |JOIN sizes no ON doc_old = no.doc_id
         |WHERE 2 * c >= (nn.n + no.n - c)
         |ORDER BY doc_new, doc_old""".stripMargin,
    "d_dedup_minhash" -> jaccardOracle(None),
    "d_dedup_clusters" ->
      s"""$clusterWalkCte
         |SELECT v AS doc_id, MIN(l) AS cluster, v = MIN(l) AS is_keeper
         |FROM walk GROUP BY v ORDER BY doc_id""".stripMargin,
    "d_dedup_apply" ->
      s"""$clusterWalkCte,
         |dropped AS (SELECT v AS doc_id FROM walk GROUP BY v HAVING v <> MIN(l))
         |SELECT source, COUNT(1) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM documents WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
         |GROUP BY source ORDER BY source""".stripMargin,
    // d_dedup_simhash is a bound-witness: DuckDB independently rebuilds
    // the exact df-capped Jaccard pair set and asserts the sketch's
    // recall/precision flags — the sketch itself (xxhash64) has no SQL
    // equivalent, but its CONTRACT is fully hash-checked.
    "d_dedup_simhash" ->
      s"""SELECT CAST(COUNT(1) AS BIGINT) AS n_exact_pairs,
         |  TRUE AS recall_ok, TRUE AS vol_ok
         |FROM (${jaccardOracle(Some(ShingleDfCap))})""".stripMargin,
    // Exact replay of the content-defined-chunking pipeline: identical
    // Karp-Rabin polynomial (proven replay from t_fingerprint), cut
    // rule, tiling, md5 chunk fingerprints, keeper rule, df cap.
    "d_dedup_substring" ->
      s"""$substringSpansCte
         |SELECT s.doc_id, s.span_start, s.span_len, s.fp16
         |FROM spans s JOIN grp g ON s.fp16 = g.fp16
         |WHERE s.doc_id <> g.keeper AND g.df BETWEEN 2 AND $SubDfCap
         |ORDER BY s.doc_id, s.span_start, s.fp16""".stripMargin,
    // the scrub replays the SAME span decision (shared CTE prefix),
    // then rebuilds each doc: LAG over its sorted spans yields the
    // kept gap before each span, a grouped MAX the tail, and an
    // ordered string_agg reassembles the text — md5 certifies the
    // rewrite byte-exactly against the Spark-side fold
    "d_substring_scrub" ->
      s"""$substringSpansCte,
         |rem AS (
         |  SELECT s.doc_id, s.span_start, s.span_len
         |  FROM spans s JOIN grp g ON s.fp16 = g.fp16
         |  WHERE s.doc_id <> g.keeper AND g.df BETWEEN 2 AND $SubDfCap),
         |seg0 AS (
         |  SELECT doc_id, span_start,
         |    COALESCE(LAG(span_start + span_len)
         |      OVER (PARTITION BY doc_id ORDER BY span_start), 1) AS seg_start
         |  FROM rem),
         |mids AS (SELECT doc_id, seg_start, span_start - seg_start AS seg_len FROM seg0),
         |tails AS (SELECT doc_id, MAX(span_start + span_len) AS seg_start,
         |            CAST(NULL AS BIGINT) AS seg_len
         |          FROM rem GROUP BY doc_id),
         |segs AS (SELECT * FROM mids UNION ALL SELECT * FROM tails),
         |scr AS (
         |  SELECT s.doc_id,
         |    string_agg(substr(c.text, CAST(s.seg_start AS INT),
         |      CAST(COALESCE(s.seg_len, length(c.text)) AS INT)), '' ORDER BY s.seg_start)
         |      AS scrubbed
         |  FROM segs s JOIN corpus c USING (doc_id) GROUP BY s.doc_id),
         |ns AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans FROM rem GROUP BY doc_id)
         |SELECT c.doc_id, CAST(length(c.text) AS BIGINT) AS n_before,
         |  CAST(length(COALESCE(scr.scrubbed, c.text)) AS BIGINT) AS n_after,
         |  COALESCE(ns.n_spans, 0) AS n_spans,
         |  substr(md5(COALESCE(scr.scrubbed, c.text)), 1, 16) AS scrub16
         |FROM corpus c
         |LEFT JOIN scr ON c.doc_id = scr.doc_id
         |LEFT JOIN ns ON c.doc_id = ns.doc_id
         |ORDER BY c.doc_id""".stripMargin,
    "d_dedup_embedding" ->
      s"""WITH $embedPairCtes
         |SELECT ia AS id_a, ib AS id_b, cos_e6 FROM epairs
         |ORDER BY id_a, id_b""".stripMargin,
    // the oracle join is EXHAUSTIVE (levenshtein over every pair — fine
    // at fixture scale); the Spark side is segment-blocked, so a hash
    // match proves the blocking recovers every qualifying pair
    "d_fuzzy_join" ->
      """WITH p AS (
        |  SELECT CAST(s_suppkey AS BIGINT) AS probe_id,
        |    CASE WHEN s_suppkey % 3 = 0 THEN
        |      substr(s_name, 1, CAST(s_suppkey % 17 AS INT)) || 'x' ||
        |        substr(s_name, CAST(s_suppkey % 17 AS INT) + 2)
        |    WHEN s_suppkey % 3 = 1 THEN
        |      substr(s_name, 1, CAST(s_suppkey % 17 AS INT)) ||
        |        substr(s_name, CAST(s_suppkey % 17 AS INT) + 2)
        |    ELSE
        |      substr(s_name, 1, CAST(s_suppkey % 17 AS INT)) || 'x' ||
        |        substr(s_name, CAST(s_suppkey % 17 AS INT) + 1)
        |    END AS probe
        |  FROM supplier)
        |SELECT p.probe_id, p.probe, CAST(s.s_suppkey AS BIGINT) AS s_suppkey,
        |  s.s_name, CAST(levenshtein(p.probe, s.s_name) AS INTEGER) AS dist
        |FROM p JOIN supplier s ON levenshtein(p.probe, s.s_name) <= 1
        |ORDER BY probe_id, s_suppkey""".stripMargin,
  )
}
