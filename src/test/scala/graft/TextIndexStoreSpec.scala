package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Tables, TextIndexStore, TextOps}

/** The durable-text-index contract — the lexical mirror of
  * [[AnnIndexStoreSpec]]: the inverted index on disk is a complete,
  * versioned artifact (postings + vocab stats + scalars), a later
  * session serves BM25 from it with ZERO corpus jobs, serving reads
  * only the query terms' posting buckets, append maintenance converges
  * exactly to the full rebuild, old epochs time-travel, and the
  * append-only contract fails loudly.
  */
class TextIndexStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))

  private def scoreKey(df: org.apache.spark.sql.DataFrame) =
    df.select("doc_id", "score_e6", "n_hit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def freshDir(tag: String): String = {
    val p = java.nio.file.Files.createTempDirectory(s"graft_tis_$tag")
    p.toFile.deleteOnExit()
    p.toString
  }

  test("a fresh session serves scores identical to the from-scratch pipeline, zero corpus jobs") {
    val dir = freshDir("serve")
    TextIndexStore.build(docs, dir)
    val expected = scoreKey(TextOps.bm25Scores(docs))
    val s2 = spark.newSession()
    val before = TextIndexStore.buildCount.get()
    val served = TextIndexStore.bm25Scores(s2, dir, TextIndexStore.open(dir))
    assert(scoreKey(served) == expected, "served scores drifted from the corpus pipeline")
    assert(TextIndexStore.buildCount.get() == before,
      "serving must not rebuild anything — the artifacts are on disk")
    // ...and every file the serve plan reads lives INSIDE the index
    // dir: no path back to the corpus parquet exists in the plan
    served.collect()
    val inputs = served.inputFiles
    assert(inputs.nonEmpty)
    inputs.foreach(f => assert(f.contains(dir.split('/').last),
      s"serve plan read outside the index: $f"))
  }

  test("serving reads only the query terms' posting buckets (manifest-pruned scan)") {
    val dir = freshDir("prune")
    TextIndexStore.build(docs, dir)
    val m = TextIndexStore.open(dir)
    val served = TextIndexStore.bm25Scores(spark, dir, m)
    served.collect()
    val bucketDirsRead = served.inputFiles
      .flatMap(_.split('/').find(seg => seg.matches("b\\d+"))).distinct.sorted
    // 5 query terms can touch at most 5 of the populated buckets;
    // the fixture populates (nearly) all NumBuckets
    assert(m.buckets.size > TextOps.BmQueryK,
      s"fixture must populate more buckets than query terms (got ${m.buckets.size})")
    assert(bucketDirsRead.length <= TextOps.BmQueryK,
      s"read ${bucketDirsRead.mkString(",")} — more buckets than query terms")
  }

  test("append delta converges exactly to the full rebuild; untouched buckets keep their dirs") {
    val dir = freshDir("delta")
    val base = docs.filter(col("doc_id") % 13 =!= 0)
    val batch = docs.filter(col("doc_id") % 13 === 0)
    val m0 = TextIndexStore.build(base, dir)
    val commit = TextIndexStore.applyDelta(spark, dir, batch)
    // scores after the append == scores of a from-scratch build on all docs
    val full = scoreKey(TextOps.bm25Scores(docs))
    assert(scoreKey(TextIndexStore.bm25Scores(spark, dir, commit.manifest)) == full,
      "incremental index diverged from the full rebuild")
    // the batch touched a strict subset of buckets; untouched buckets
    // still point at their epoch-0 dirs (no gratuitous rewrite)
    assert(commit.affected.nonEmpty && commit.affected.size <= m0.buckets.size)
    val untouched = m0.buckets.keySet -- commit.affected.toSet
    untouched.foreach { b =>
      assert(commit.manifest.buckets(b) == m0.buckets(b),
        s"untouched bucket $b was rewritten")
    }
    // scalars bumped exactly
    val batchN = batch.count()
    assert(commit.manifest.nDocs == m0.nDocs + batchN)
    assert(commit.manifest.sumDl > m0.sumDl)
    // every merge read lay inside the affected buckets' old dirs
    commit.readPaths.foreach(p =>
      assert(commit.affected.exists(b => p.contains(s"/b$b/")), s"stray merge read: $p"))
  }

  test("time travel: the pre-delta epoch still serves its old scores bit-identically") {
    val dir = freshDir("tt")
    val base = docs.filter(col("doc_id") % 13 =!= 0)
    TextIndexStore.build(base, dir)
    val preDelta = scoreKey(TextIndexStore.bm25Scores(spark, dir, TextIndexStore.open(dir)))
    TextIndexStore.applyDelta(spark, dir, docs.filter(col("doc_id") % 13 === 0))
    assert(TextIndexStore.listEpochs(dir) == Seq(0L, 1L))
    val atZero = TextIndexStore.withSnapshot(dir, 0L) { m0 =>
      scoreKey(TextIndexStore.bm25Scores(spark, dir, m0))
    }
    assert(atZero == preDelta, "epoch-0 snapshot no longer serves its committed scores")
    // and the live epoch differs (the delta genuinely changed N/df)
    val live = scoreKey(TextIndexStore.bm25Scores(spark, dir, TextIndexStore.open(dir)))
    assert(live != preDelta, "delta was a no-op — the time-travel test is vacuous")
  }

  test("append-only contract: re-adding an indexed doc_id fails loudly") {
    val dir = freshDir("dup")
    TextIndexStore.build(docs, dir)
    val err = intercept[IllegalArgumentException] {
      TextIndexStore.applyDelta(spark, dir, docs.limit(3))
    }
    assert(err.getMessage.contains("append-only"))
    // the failed commit left the manifest on epoch 0
    assert(TextIndexStore.open(dir).epoch == 0L)
  }

  test("retention GC drops old epochs' manifests and unreferenced component dirs") {
    val dir = freshDir("gc")
    // retain=1: after each delta only the newest epoch must survive
    TextIndexStore.build(docs.filter(col("doc_id") % 13 =!= 0), dir)
    TextIndexStore.applyDelta(spark, dir,
      docs.filter(col("doc_id") % 13 === 0 && col("doc_id") % 2 === 0), retain = 1)
    TextIndexStore.applyDelta(spark, dir,
      docs.filter(col("doc_id") % 13 === 0 && col("doc_id") % 2 =!= 0), retain = 1)
    assert(TextIndexStore.listEpochs(dir) == Seq(2L))
    val m = TextIndexStore.open(dir)
    // stats of dropped epochs are swept; the live one survives
    val statsDirs = Option(new java.io.File(dir, "stats").listFiles()).toSeq.flatten
      .map(_.getName).sorted
    assert(statsDirs == Seq("e2"), s"stale stats epochs survive GC: $statsDirs")
    // all bucket-epoch dirs on disk are referenced by the live manifest
    val onDisk = for {
      bd <- Option(new java.io.File(dir).listFiles()).toSeq.flatten
        if bd.isDirectory && bd.getName.matches("b\\d+")
      ed <- Option(bd.listFiles()).toSeq.flatten if ed.getName.matches("e\\d+")
    } yield s"${bd.getName}/${ed.getName}"
    assert(onDisk.toSet == m.buckets.values.toSet,
      s"unreferenced bucket dirs survive GC: ${onDisk.toSet -- m.buckets.values.toSet}")
    // doc-registry segments referenced by the live manifest all resolve
    m.docs.foreach(rel => assert(new java.io.File(dir, rel).exists()))
    // and serving the live epoch still matches the full rebuild
    assert(scoreKey(TextIndexStore.bm25Scores(spark, dir, m)) ==
      scoreKey(TextOps.bm25Scores(docs)))
  }
}
