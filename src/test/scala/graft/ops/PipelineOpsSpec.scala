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

  test("decon served: identical to the inline exact overlap; verify stage is semi-join pruned") {
    val served = PipelineOps.p_decon_served(spark, sf).collect().toSeq
    val inline = PipelineOps.p_decontaminate(spark, sf).collect().toSeq
    assert(served == inline,
      "index-served decontamination diverged from the exact inline overlap")
    // non-vacuity: the fixture has probe docs AND contaminated docs
    assert(served.exists(_.getBoolean(1)), "no probe docs in the slice")
    assert(served.exists(r => r.getBoolean(3)), "nothing contaminated — witness moot")
    // the exact-verify corpus read is candidate-pruned (a LeftSemi
    // join against the posting-derived candidate set), never a full
    // unconditional re-shingle of the corpus
    val plan = PipelineOps.p_decon_served(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), plan.take(2000))
  }

  test("leakage split: no near-dup pair straddles; id- and source-keyed splits do") {
    def knuth(g: Long) = (g % 1000003L) * 2654435761L % 1000003L % 10L
    // per-doc group assignment exactly as the operator derives it
    val labels = DedupOps.d_dedup_clusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val grpOf = (id: Long) => labels.getOrElse(id, id)
    val pairs = DedupOps.d_dedup_minhash(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    // cluster-keyed: zero straddlers, by construction AND by check
    val straddleCluster = pairs.filter { case (a, b) =>
      knuth(grpOf(a)) != knuth(grpOf(b)) }
    assert(straddleCluster.isEmpty, s"cluster split leaked: $straddleCluster")
    // the naive keys genuinely leak on this corpus (non-vacuity of the
    // design choice — if these ever turn empty the witness is moot)
    def srcKey(s: String) = s.filter(_.isDigit).toLong
    val straddleId = pairs.count { case (a, b) => knuth(a) != knuth(b) }
    val straddleSrc = pairs.count { case (a, b) =>
      knuth(srcKey(docs(a))) != knuth(srcKey(docs(b))) }
    assert(straddleId > 0, "doc_id-keyed split did not leak — contrast vacuous")
    assert(straddleSrc > 0, "source-keyed split did not leak — contrast vacuous")
    // the registered aggregate is consistent with the raw assignment
    val got = PipelineOps.p_leakage_split(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = docs.keys.groupBy { id =>
      val k = knuth(grpOf(id))
      if (k < 8) "train" else if (k == 8) "val" else "test"
    }.map { case (k, v) => k -> v.size.toLong }
    assert(got == expected)
  }

  test("leakage split: artifact-backed split ≡ inline-derived split; serve plan has no CC loop") {
    // the registered query reads the PERSISTED cluster artifact; an
    // inline variant re-derives the labels through the full pipeline —
    // both must produce identical rows (the artifact is a cache of the
    // pipeline's product, nothing more)
    val viaArtifact = PipelineOps.p_leakage_split(spark, sf).collect().toSeq
    val inline = PipelineOps.leakageSplitFrom(spark, sf,
      DedupOps.d_dedup_clusters(spark, sf)).collect().toSeq
    assert(viaArtifact == inline)
    // the artifact exists on disk as parquet (a real cross-session
    // artifact, not a Spark-internal cache)
    val dir = DedupOps.clusterArtifactDir(spark, sf)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .anyMatch(p => p.toString.endsWith(".parquet")))
    // serve-path plan: one broadcast join over the corpus scan — the
    // LSH/CC machinery (posting-list aggregate + iterative joins)
    // must NOT appear when serving from the artifact
    val plan = PipelineOps.p_leakage_split(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    val joinCount = plan.linesIterator.count(_.contains("Join"))
    assert(joinCount <= 2, s"expected ≤2 joins in the served split, got $joinCount")
  }

  test("golden record: latest-non-null genuinely diverges from row-LWW on planted nulls") {
    val ev = Tables.events(spark, sf).select(col("user_id"),
      unix_micros(col("ts")).as("tus"), col("event_id"),
      round(col("value") * 100).cast("long").as("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // row-LWW view: each user's latest row's cents (null if planted)
    val lastRow = ev.groupBy(_._1).map { case (u, rows) =>
      val (_, _, eid, c) = rows.maxBy(_._2)
      u -> (if (eid % 7 == 0) None else Some(c))
    }
    val got = PipelineOps.p_golden_record(spark, sf).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // non-vacuity: for at least one user the latest row is a planted
    // null, so the survivorship rule must reach PAST it
    val diverging = lastRow.filter { case (u, c) => c.isEmpty && got(u).nonEmpty }
    assert(diverging.nonEmpty,
      "no user whose latest row is null-amount — survivorship rule vacuous")
    // and the reached value is that user's latest NON-NULL amount
    diverging.keys.foreach { u =>
      val expect = ev.filter(r => r._1 == u && r._3 % 7 != 0)
        .sortBy(_._2).lastOption.map(_._4)
      assert(got(u) == expect, s"user $u survivorship drifted")
    }
  }

  test("contig pack: offsets tile the stream densely; chunk spans are exact") {
    val rows = PipelineOps.p_contig_pack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == Tables.documents(spark, sf).count())
    // dense tiling: sorted by offset, every doc starts where the
    // previous ended — no gaps, no overlaps, total = sum of counts
    val byOff = rows.sortBy(_._3)
    byOff.foldLeft(0L) { case (expect, (id, n, start, _, _, _)) =>
      assert(start == expect, s"doc $id starts at $start, stream position is $expect")
      start + n
    }
    assert(byOff.map(_._2).sum == byOff.last._3 + byOff.last._2)
    // chunk arithmetic consistent with the offsets
    rows.foreach { case (id, n, start, first, last, off) =>
      assert(first == start / 256 && off == start % 256, s"doc $id")
      assert(last == (start + n - 1) / 256)
      assert(last >= first)
    }
    // docs genuinely span chunks on this corpus (the layout's point)
    assert(rows.count { case (_, _, _, f, l, _) => l > f } > 0,
      "no doc spans a chunk boundary — witness vacuous")
  }

  test("temperature mix: probabilities normalize, flatten the natural distribution, and preserve order") {
    val got = PipelineOps.p_temperature_mix(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length >= 2, "fixture must have >= 2 sources")
    // probabilities sum to 1e6 up to the div-floor remainder
    val pSum = got.map(_._3).sum
    assert(pSum > 1000000L - got.length && pSum <= 1000000L, s"p_e6 sum $pSum")
    // flattening: sampling keeps the SIZE ordering (alpha > 0) but
    // compresses it — a smaller source's boost is >= a larger one's,
    // and p is strictly between natural frequency and uniform for
    // every non-boundary source
    val bySize = got.sortBy(_._2)
    bySize.sliding(2).foreach {
      case Array(small, large) =>
        assert(small._3 <= large._3, s"alpha>0 must keep size order: $small $large")
        assert(small._4 >= large._4, s"smaller source must boost more: $small $large")
      case _ => ()
    }
    val total = got.map(_._2).sum.toDouble
    val uniform = 1000000.0 / got.length
    got.foreach { case (src, c, p, boost) =>
      val natural = 1000000.0 * c / total
      if (math.abs(natural - uniform) > 1) {
        val lo = math.min(natural, uniform) - 1
        val hi = math.max(natural, uniform) + 1
        assert(p >= lo && p <= hi, s"$src: p=$p outside ($natural, $uniform)")
        // boost agrees with p/natural within integer-division slack
        assert(math.abs(boost - 1000000.0 * p / natural) < 2000,
          s"$src: boost $boost inconsistent with p=$p natural=$natural")
      }
    }
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

  test("cdc apply: latest change wins, deletes drop, replayed against the orders base") {
    val base = Tables.orders(spark, sf)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long").as("cents"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = PipelineOps.p_cdc_apply(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // deleted keys are gone, every other key is present exactly once
    assert(got.keySet == base.keySet.filter(_ % 7 != 0))
    got.foreach { case (k, (seq, cents, n)) =>
      val expectN = 1L + (if (k % 3 == 0) 1 else 0) + (if (k % 7 == 0) 1 else 0)
      assert(n == expectN, s"n_changes for $k")
      if (k % 3 == 0) { assert(seq == k * 10 + 2); assert(cents == base(k) + 1000) }
      else { assert(seq == k * 10 + 1); assert(cents == base(k)) }
    }
  }

  test("url dedup: canonical urls are normalized, groups cover the corpus, keeper is min") {
    val r = PipelineOps.p_url_dedup(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(r.map(_.getLong(2)).sum == total, "every doc lands in exactly one group")
    r.foreach { row =>
      val u = row.getString(0)
      assert(u == u.toLowerCase, s"not lowercased: $u")
      assert(!u.contains('?') && !u.contains('#') && !u.endsWith("/"), s"not canonical: $u")
      assert(u.startsWith("https://www.site"), s"unexpected shape: $u")
    }
    // keeper really is the smallest doc_id of its canonical group
    val keepers = r.map(row => row.getString(0) -> row.getLong(1)).toMap
    val byCanon = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
      .groupBy(id => s"https://www.site${id % 40}.example.com/page/${id % 120}")
    byCanon.foreach { case (canon, ids) =>
      assert(keepers(canon) == ids.min, s"keeper for $canon")
    }
  }

  test("sequence pack: shard walks replayed sequentially on the driver match exactly") {
    val got = PipelineOps.p_sequence_pack(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // driver-side sequential replay of the identical greedy walk
    val docs = Tables.documents(spark, sf).select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expect = docs
      .map { case (id, n) => (id, (id % 8).toInt, (id % 1000003L) * 2654435761L % 1000003L, n) }
      .groupBy(_._2).toSeq.flatMap { case (shard, rows) =>
        var pack = 0L; var cum = 0L
        rows.sortBy(t => (t._3, t._1)).map { case (id, sh, _, n) =>
          if (cum + n > 2000 && cum > 0) { pack += 1; cum = 0L }
          val off = cum; cum += n
          (id, sh, sh * 1000000L + pack, off)
        }
      }.sortBy(_._1)
    assert(got.toSeq == expect)
    // no pack exceeds capacity unless it is a single oversized doc
    got.groupBy(_._3).foreach { case (packId, members) =>
      val sz = members.map(m => docs.toMap.apply(m._1)).sum
      assert(sz <= 2000 || members.length == 1, s"pack $packId overflows with ${members.length} docs")
    }
  }

  test("sequence pack property: distributed fold equals sequential replay on adversarial corpora") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    // oversized (> capacity 2000), exactly-capacity, zero-length, and huge
    // ids (ANSI-overflow probes for the Knuth mix) all appear
    val genDoc = for {
      id <- Gen.chooseNum(0L, 4000000000L)
      n <- Gen.oneOf(Gen.chooseNum(0L, 300L), Gen.chooseNum(1900L, 2100L),
        Gen.const(2000L), Gen.chooseNum(2001L, 5000L))
    } yield (id, n)
    val genCorpus = Gen.chooseNum(1, 120).flatMap(k => Gen.listOfN(k, genDoc))
      .map(_.distinctBy(_._1))
    val prop = Prop.forAll(genCorpus) { corpus =>
      val df = corpus.toDF("doc_id", "n_chars")
      val got = PipelineOps.sequencePack(spark, df).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
      val expect = corpus
        .map { case (id, n) => (id, (id % 8).toInt, (id % 1000003L) * 2654435761L % 1000003L, n) }
        .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
          var pack = 0L; var cum = 0L
          rows.sortBy(t => (t._3, t._1)).map { case (id, sh, _, n) =>
            if (cum + n > 2000 && cum > 0) { pack += 1; cum = 0L }
            val off = cum; cum += n
            (id, sh, sh * 1000000L + pack, off)
          }
        }.sortBy(_._1)
      got == expect
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("curate apply: every stage bites and survivors pass all four gates") {
    val survivors = PipelineOps.p_curate_apply(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(survivors.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    // driver-side replay of the funnel
    val corpus = docs ++ docs.filter(_._3 == "src0").map(t => (t._1 + 1000000L, t._2, t._3))
    val quality = corpus.filter(_._2.split(" ", -1).length >= 30)
    assert(quality.length < corpus.length, "quality gate must drop short docs")
    val keepers = quality.groupBy(_._2).map { case (_, g) => g.minBy(_._1) }.toSeq
    assert(keepers.length < quality.length, "dedup must drop re-crawled copies")
    def shingles(t: String): Set[String] =
      t.split(" ", -1).toSeq.sliding(8).filter(_.length == 8).map(_.mkString(" ")).toSet
    val probe = docs.filter(_._1 % 97 == 0).flatMap(t => shingles(t._2)).toSet
    val clean = keepers.filter(t => t._1 % 97 != 0 && (shingles(t._2) & probe).isEmpty)
    assert(clean.length < keepers.length, "decontamination must drop probe-overlapping docs")
    def bucket(id: Long) = (id % 1000003L) * 2654435761L % 1000003L % 1000L
    def q(src: String) =
      if (Set("src0","src1","src2","src3","src4")(src)) 900L
      else if (Set("src5","src6","src7","src8","src9")(src)) 500L else 200L
    val expect = clean.filter(t => bucket(t._1) < q(t._3)).map(t => (t._1, t._3)).sortBy(_._1)
    assert(expect.length < clean.length, "mixture sampling must drop over-quota docs")
    assert(survivors.toSeq == expect, "funnel composition must match the driver replay")
  }

  test("doc chunk: chunks partition every doc's pieces and respect the token budget") {
    val chunks = PipelineOps.p_doc_chunk(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // totals equal the per-doc BPE counts from t_bpe_tokens
    val docTotals = TextOps.t_bpe_tokens(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getInt(1).toLong, r.getLong(2))).toMap
    val byDoc = chunks.groupBy(_._1)
    assert(byDoc.keySet == docTotals.keySet)
    byDoc.foreach { case (doc, cs) =>
      val (nPieces, nTokens) = docTotals(doc)
      assert(cs.map(_._3).sum == nPieces, s"doc $doc piece coverage")
      assert(cs.map(_._4).sum == nTokens, s"doc $doc token coverage")
      // chunk ids contiguous from 0, first_piece strictly increasing
      val ordered = cs.sortBy(_._2)
      assert(ordered.map(_._2).toSeq == (0L until cs.length).toSeq, s"doc $doc chunk gap")
      assert(ordered.map(_._5).toSeq == ordered.map(_._5).sorted.toSeq)
    }
    // the budget bites: some doc has multiple chunks, and no chunk
    // exceeds budget + the longest single piece (the straddle bound)
    assert(chunks.exists(_._2 > 0), "fixture docs must exceed one chunk")
    val maxPiece = graft.ops.Tables.documents(spark, sf).collect()
      .iterator.flatMap(_.getString(1).split(' ')).filter(_.nonEmpty)
      .map(w => graft.functions.BpeTokenizer.encodePiece(w).length).max
    assert(chunks.forall(_._4 <= 64L + maxPiece - 1),
      s"chunk exceeds budget + straddle bound ($maxPiece)")
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

  test("weighted sample: k rows, biased toward heavy docs, deterministic, top-k plan") {
    val r = PipelineOps.p_weighted_sample(spark, sf).collect()
    assert(r.length == 100)
    // exact witness: replay the md5 → uniform → exponential-key draw on
    // the driver and assert the operator selected precisely the k
    // smallest keys (A-ES semantics, not merely "some biased sample")
    val all = Tables.documents(spark, sf)
      .select(col("doc_id"), greatest(col("n_chars"), lit(1L))).collect()
      .map { row =>
        val id = row.getLong(0); val w = row.getLong(1)
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 8)
        val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 4294967296.0
        (id, -math.log(u) / w)
      }
    val expected = all.sortBy(_._2).take(100).map(_._1).toSet
    assert(r.map(_.getLong(0)).toSet == expected)
    // and the draw IS weight-biased: sampled mean weight above corpus mean
    val sampledMean = r.map(_.getLong(2)).sum.toDouble / r.length
    val corpusMean = Tables.documents(spark, sf)
      .agg(avg(greatest(col("n_chars"), lit(1L)))).head.getDouble(0)
    assert(sampledMean > corpusMean,
      s"sample not weight-biased: sampled=$sampledMean corpus=$corpusMean")
    // hash-derived draw: identical on a second run (retry safety)
    assert(r.toSeq == PipelineOps.p_weighted_sample(spark, sf).collect().toSeq)
    // the k-selection is a distributed top-k, not a global sort: the
    // physical plan must show TakeOrderedAndProject with no Sort node
    // feeding it (per-partition heaps + driver merge, O(k) memory)
    val plan = PipelineOps.p_weighted_sample(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("host rank: distributed fixed-point PageRank equals the sequential replay exactly") {
    val got = PipelineOps.p_host_rank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // sequential driver-side replay of the identical integer recurrence
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val edges = ids.map(id => (id % 40, (id * 7 + 13) % 37))
      .filter { case (a, b) => a != b }.distinct
    val hosts = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outd = edges.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val S = 1000000000000L
    val n = hosts.length.toLong
    val teleport = (S * 15 / 100) / n
    var r = hosts.map(_ -> S / n).toMap
    for (_ <- 1 to 10) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / outd(src) }.sum
      }
      r = hosts.map(h => h -> (teleport + 85 * contrib.getOrElse(h, 0L) / 100)).toMap
    }
    val expected = hosts.map(h => (h, outd.getOrElse(h, 0L), r(h)))
    assert(got.toSeq == expected.toSeq)
    // ranks genuinely differentiated (the graph is not regular) and
    // total mass stays under the scale (dangling + floor loss only)
    assert(got.map(_._3).distinct.length > 1)
    assert(got.map(_._3).sum <= S)
  }

  test("p_triangle_count: matches brute force; orientation bounds wedge work") {
    val got = PipelineOps.p_triangle_count(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // brute-force replay over the tiny planted host graph
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val und = ids.map(id => (id % 40, (id * 7 + 13) % 37))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct.toSet
    val hosts = und.toSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val tris = for {
      a <- hosts; b <- hosts if a < b && und((a, b))
      c <- hosts if b < c && und((b, c)) && und((a, c))
    } yield (a, b, c)
    val part = tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (h, v) => (h, v.length.toLong) }
      .toSeq.sortBy(_._1)
    assert(tris.nonEmpty, "planted graph must contain triangles")
    assert(got.toSeq == part)
    assert(got.map(_._2).sum == 3L * tris.length)
    // the de-skew witness: the (deg,id) orientation strictly lowers the
    // max per-task wedge pivot degree vs raw undirected degree
    val deg = und.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (h, v) => h -> v.length }
    val ord = hosts.sortBy(h => (deg(h), h)).zipWithIndex.toMap
    val outDeg = und.toSeq
      .map { case (a, b) => if (ord(a) < ord(b)) a else b }
      .groupBy(identity).map(_._2.length)
    assert(outDeg.max < deg.values.max,
      s"orientation must cut the max pivot degree: ${outDeg.max} vs ${deg.values.max}")
  }

  test("scd2: sequential replay matches; runs collapse; intervals chain per user") {
    val got = PipelineOps.p_scd2(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val exp = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val runs = rows.sortBy(r => (r._2, r._3))
        .foldLeft(Vector.empty[(Long, String)]) { (acc, r) =>
          if (acc.nonEmpty && acc.last._2 == r._4) acc else acc :+ ((r._2, r._4))
        }
      runs.zipWithIndex.map { case ((t, st), i) =>
        val to = if (i + 1 < runs.length) runs(i + 1)._1 else -1L
        (u, i + 1, st, t, to, to == -1L)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got.toSeq == exp)
    // non-vacuous: at least one same-state run collapsed, and state
    // genuinely changes (some user has more than one version)
    assert(got.length < ev.length, "no run ever collapsed")
    assert(got.groupBy(_._1).exists(_._2.length > 1))
    // validity intervals chain: each version closes where the next opens,
    // and exactly the last version per user is current
    got.groupBy(_._1).values.foreach { vs =>
      val s = vs.sortBy(_._2)
      s.sliding(2).foreach {
        case Array(a, b) => assert(a._5 == b._4, s"gap between versions of user ${a._1}")
        case _ =>
      }
      assert(s.last._6 && s.init.forall(!_._6))
    }
  }

  test("embed decon: driver replay matches; every probe source flags; corpus mostly clean") {
    val got = PipelineOps.p_embed_decon(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val all = Tables.embeddings(spark, sf).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    assert(got.length == all.length)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val probes = all.filter(_._1 % PipelineOps.EmbedProbeMod == 0).map { case (_, e) =>
      val p = e.map(_.toDouble); p(0) += 0.25; p
    }
    assert(probes.nonEmpty)
    val tau = PipelineOps.EmbedDecontTauE6
    val exp = all.map { case (id, ef) =>
      val c = ef.map(_.toDouble)
      val cn = math.sqrt(dot(c, c))
      val cos = probes.map(p => math.round(dot(c, p) / (cn * math.sqrt(dot(p, p))) * 1e6))
      (id, cos.max, cos.count(_ >= tau).toLong, cos.exists(_ >= tau))
    }.sortBy(_._1)
    assert(got.toSeq == exp.toSeq)
    val sources = got.filter(_._1 % PipelineOps.EmbedProbeMod == 0)
    assert(sources.nonEmpty && sources.forall(_._4),
      "every probe's leaked source vector must flag as contaminated")
    assert(got.count(!_._4) > got.length / 2, "most of the corpus must stay clean")
  }

  test("label prop: four synchronous rounds match sequential replay; communities form") {
    val got = PipelineOps.p_label_prop(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val dirE = ids.map(id => (id % 40, (id * 7 + 13) % 37))
      .filter(t => t._1 != t._2).distinct
    val e2 = (dirE ++ dirE.map(_.swap)).distinct
    val nbrs = e2.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSeq }
    var lbl = nbrs.keys.map(h => h -> h).toMap
    for (_ <- 1 to PipelineOps.LpIters) {
      val prev = lbl
      lbl = nbrs.map { case (u, vs) =>
        val counts = vs.map(prev).groupBy(identity).map { case (l, o) => (l, o.size) }
        u -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    val sizes = lbl.values.groupBy(identity).map { case (l, o) => l -> o.size.toLong }
    val exp = lbl.toSeq.map { case (h, l) => (h, l, sizes(l)) }.sortBy(_._1)
    assert(got.toSeq == exp)
    // non-vacuous: labels coalesce into genuine communities
    assert(got.map(_._2).distinct.length < got.length, "labels never merged")
    assert(got.map(_._2).distinct.length > 0)
  }

  test("bpe pair counts: replay matches; top candidate equals the trainer's first pick") {
    val got = PipelineOps.p_bpe_pair_counts(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val words = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.length >= 2)
    val counts = scala.collection.mutable.Map.empty[(String, String), Long]
    for (w <- words; i <- 0 until w.length - 1) {
      val p = (w.substring(i, i + 1), w.substring(i + 1, i + 2))
      counts(p) = counts.getOrElse(p, 0L) + 1L
    }
    val exp = counts.toSeq.map { case ((a, b), n) => (a, b, n) }
      .sortBy { case (a, b, n) => (-n, a, b) }.take(PipelineOps.BpePairTopK)
      .sortBy { case (a, b, _) => (a, b) }
    assert(got.toSeq == exp)
    // the distributed round agrees with the sequential trainer's
    // first merge over the same corpus word frequencies
    val wc = words.groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    val first = graft.functions.BpeTrainer.train(wc, maxMerges = 1).head
    val top1 = got.minBy { case (a, b, n) => (-n, a, b) }
    assert((top1._1, top1._2) == first,
      s"distributed top pair $top1 != trainer pick $first")
  }

  test("iterative graph ops truncate lineage: plan size is iteration-invariant") {
    // Without per-round localCheckpoint the logical plan deepens by one
    // join-aggregate per iteration — linear re-analysis cost and a full
    // replay of every prior round on executor loss. With it, the final
    // plan hangs off the LAST round's materialized RDD, so its node
    // count must not grow with the round count.
    def planNodes(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect { case n => n }.length
    val pr2 = planNodes(PipelineOps.hostRank(spark, sf, 2))
    val pr8 = planNodes(PipelineOps.hostRank(spark, sf, 8))
    assert(pr8 == pr2, s"host-rank plan grew with iterations: $pr2 -> $pr8")
    val lp2 = planNodes(PipelineOps.labelProp(spark, sf, 2))
    val lp6 = planNodes(PipelineOps.labelProp(spark, sf, 6))
    assert(lp6 == lp2, s"label-prop plan grew with iterations: $lp2 -> $lp6")
  }

  test("train shuffle: a true permutation, dense per-shard positions, actually shuffled, deterministic") {
    val rows = PipelineOps.p_train_shuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = graft.ops.Tables.documents(spark, sf).count()
    // permutation: every doc exactly once
    assert(rows.length == nDocs)
    assert(rows.map(_._3).distinct.length == nDocs)
    // dense positions 1..n within each shard
    rows.groupBy(_._1).foreach { case (shard, srows) =>
      assert(srows.map(_._2).sorted.toSeq == (1L to srows.length).toSeq,
        s"shard $shard positions not dense")
    }
    // the order is genuinely shuffled: within at least one shard the
    // doc_id sequence in position order is not monotone
    val shuffledSomewhere = rows.groupBy(_._1).values.exists { srows =>
      val ids = srows.sortBy(_._2).map(_._3)
      ids.zip(ids.drop(1)).exists { case (a, b) => a > b }
    }
    assert(shuffledSomewhere, "key order degenerated to doc_id order — not a shuffle")
    // retry-safety: a second run reproduces the identical permutation
    val again = PipelineOps.p_train_shuffle(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(again.toSeq == rows.toSeq)
  }
}
