package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WRITE-AUDIT-PUBLISH governed table — the lakehouse ingestion
  * discipline (Iceberg's WAP / staging-branch pattern): a producer
  * STAGES a batch where no manifest points, an AUDIT runs data-quality
  * predicates against the table as it WOULD serve, and only a clean
  * audit flips the manifest — a dirty batch is aborted and serving
  * never observes it. This is how a 100 TB ingest pipeline keeps a bad
  * upstream push out of the serving path without a rollback scramble:
  * the quarantine boundary is the manifest flip itself.
  *
  * Built on the shared store core: [[graft.ManifestIo.commit]] is the
  * atomic publish (write-rename, versioned manifests retained), so the
  * table gets time travel ([[readAt]]) for free — the audit-passed
  * epochs ARE the version history. Segments are append-only parquet
  * dirs; a staged dir (`stage-e<n>`) is invisible by construction
  * because reads resolve through the manifest's segment list, never a
  * directory listing. Crash semantics: a crash after stage leaves an
  * orphan stage dir that the next [[stage]] of the same epoch
  * overwrites in place (idempotent re-stage); a crash between the
  * rename and the flip is healed by [[publish]]'s move-if-present
  * (the rename is the only non-manifest mutation).
  *
  * Scale shape: stage is the batch write (batch-proportional);
  * audit is a predicate over base ∪ staged — predicate pushdown
  * reaches both parquet scans, and an audit that only inspects the
  * batch (the common case) prunes to the staged segment alone;
  * publish and abort are metadata-only (one rename + one manifest
  * write / one recursive delete). Nothing rewrites history.
  */
object GovernedTable {

  /** `segments` is the append-only list of published parquet dirs
    * (relative), in publish order. `batches` is the streaming-ingest
    * log ([[ingestBatch]]): micro-batch id → the epoch its audit
    * verdict landed at (an ACCEPTED batch's published epoch, or the
    * rejection epoch of a refused one, tagged negative) — riding the
    * manifest so the verdict and the flip are ONE atomic write. */
  case class Manifest(epoch: Long, segments: Seq[String],
                      batches: Map[Long, Long] = Map.empty)

  private def render(m: Manifest): String = {
    // Manifest is a public case class and commit() accepts any
    // segments — a name with a quote/backslash would render
    // unparseable JSON, so restrict to the filesystem-safe alphabet
    // the internally generated 'e<N>' names live in.
    m.segments.foreach(s => require(s.matches("[A-Za-z0-9._-]+"),
      s"illegal segment name '$s' (allowed: [A-Za-z0-9._-]+)"))
    val b =
      if (m.batches.isEmpty) ""
      else m.batches.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""$k":$v""" }
        .mkString(""","batches":{""", ",", "}")
    s"""{"epoch":${m.epoch},"segments":${
      m.segments.map(s => s""""$s"""").mkString("[", ",", "]")}$b}"""
  }

  private def parse(p: java.nio.file.Path): Manifest = {
    import org.json4s._
    val j = org.json4s.jackson.JsonMethods.parse(java.nio.file.Files.readString(p))
    val e = (j \ "epoch") match {
      case JInt(n) => n.toLong; case o => sys.error(s"bad epoch $o") }
    val segs = (j \ "segments") match {
      case JArray(ss) => ss.map { case JString(v) => v
                                  case o => sys.error(s"bad segment $o") }
      case o => sys.error(s"bad segments $o")
    }
    val batches = (j \ "batches") match {
      case JObject(fs) => fs.collect { case (k, JInt(v)) => k.toLong -> v.toLong }.toMap
      case _ => Map.empty[Long, Long] // pre-ingest manifests carry none
    }
    Manifest(e, segs, batches)
  }

  private def commit(dir: String, m: Manifest): Unit =
    graft.ManifestIo.commit(java.nio.file.Paths.get(dir), m.epoch, render(m))

  def open(dir: String): Manifest =
    parse(graft.ManifestIo.manifestPath(java.nio.file.Paths.get(dir)))

  def openAt(dir: String, epoch: Long): Manifest =
    graft.ManifestIo.openVersioned(java.nio.file.Paths.get(dir), epoch, parse)

  /** Epoch 0 from the base rows — the only unaudited write (there is
    * no serving state yet to protect). `partitionBy` is the SEGMENT's
    * layout, not the table's: each segment carries its own directory
    * layout, which is what makes PARTITION EVOLUTION free — a later
    * [[stage]] may partition by different columns, old segments are
    * never rewritten, and reads prune each segment under its own
    * scheme. */
  def build(rows: DataFrame, dir: String,
            partitionBy: Seq[String] = Nil): Manifest = {
    // refuse to clobber a LIVE table; below that bar, overwrite mode
    // makes a crash between the e0 write and the flip replayable by
    // simply re-running build (the same idempotence stage/compact have)
    require(!java.nio.file.Files.exists(
        graft.ManifestIo.manifestPath(java.nio.file.Paths.get(dir))),
      s"table at $dir is already built (manifest exists)")
    write(rows, s"$dir/e0", partitionBy, overwrite = true)
    val m = Manifest(0L, Seq("e0"))
    commit(dir, m)
    m
  }

  private def write(rows: DataFrame, path: String, partitionBy: Seq[String],
                    overwrite: Boolean): Unit = {
    val w = rows.write.mode(if (overwrite) "overwrite" else "errorifexists")
    (if (partitionBy.isEmpty) w else w.partitionBy(partitionBy: _*))
      .parquet(path)
  }

  /** Segments load SEPARATELY and union by name: each segment's scan
    * discovers its OWN partition layout, so a pushed filter becomes a
    * PartitionFilter exactly where that segment's scheme covers it
    * (partition evolution: the old layout still prunes on its old
    * columns, the new one on its new columns — no rewrite).
    *
    * COLUMN evolution rides the same union: each segment carries its
    * own DATA schema too, and `allowMissingColumns` makes the serve
    * the union-by-name of all live schemas — a column added by a
    * later WAP round reads as NULL over pre-evolution segments, with
    * zero history rewrite (the `st_upsert_evolve` discipline applied
    * to the governed table; Iceberg/Delta `mergeSchema` semantics).
    * Time travel to a pre-evolution epoch serves the OLD schema —
    * versioned manifests pin the segment list, so the added column
    * simply isn't there. Same-name columns with INCOMPATIBLE types
    * still fail loudly in the union. Segment count is epoch count — a
    * long-lived table compacts old epochs the usual way. */
  private def readUnder(s: SparkSession, dir: String, m: Manifest): DataFrame =
    m.segments.map(r => s.read.parquet(s"$dir/$r"))
      .reduce(_.unionByName(_, allowMissingColumns = true))

  /** The SERVING view — resolves through the current manifest only;
    * staged batches are invisible by construction. */
  def read(s: SparkSession, dir: String): DataFrame =
    readUnder(s, dir, open(dir))

  /** Time travel to a published epoch (versioned manifests). Takes NO
    * retention lease — safe when no concurrent [[gc]] can run (offline
    * audits, single-writer pipelines); a read that must survive a
    * concurrent sweep materializes inside [[withSnapshot]] instead. */
  def readAt(s: SparkSession, dir: String, epoch: Long): DataFrame =
    readUnder(s, dir, openAt(dir, epoch))

  /** CHANGE FEED between two published epochs — the rows `to` serves
    * that `from` did not, computed as the SEGMENT-LIST diff: segments
    * are append-only, so the delta is exactly the segments published
    * after `from`, and the feed reads ONLY those directories — never
    * the base table (the [[MvStore.changeFeed]] contract on the
    * governed table; at 100 TB an incremental consumer pays for its
    * delta, not for history). Rejection epochs ([[ingestBatch]]) add
    * no segment, so a feed across one is correctly empty. Fails
    * pointedly across a [[compact]] boundary: compaction rewrites the
    * segment list, so "new segments" would replay the whole table —
    * the consumer must re-baseline (same rule Iceberg's incremental
    * reads apply across rewrites). */
  def changeFeed(s: SparkSession, dir: String,
                 fromEpoch: Long, toEpoch: Long): DataFrame = {
    val from = openAt(dir, fromEpoch)
    val to = openAt(dir, toEpoch)
    require(from.segments.forall(to.segments.contains),
      s"epoch $fromEpoch's segments are not a prefix of epoch $toEpoch's " +
        "(a compaction rewrote the list between them) — re-baseline the consumer")
    val fresh = to.segments.filterNot(from.segments.contains)
    if (fresh.isEmpty)
      readUnder(s, dir, to).limit(0)
    else
      fresh.map(r => s.read.parquet(s"$dir/$r"))
        .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Lease-pinned time travel — the [[graft.ManifestIo.withSnapshot]]
    * handshake every durable store shares: the epoch is spared from a
    * concurrent [[gc]] for the duration of `body`, so materialize
    * (collect/write) INSIDE it; a lazily-returned DataFrame outlives
    * the lease. */
  def withSnapshot[A](s: SparkSession, dir: String, epoch: Long)
                     (body: DataFrame => A): A =
    graft.ManifestIo.withSnapshot(java.nio.file.Paths.get(dir), epoch, parse) {
      m => body(readUnder(s, dir, m))
    }

  /** Stage a batch WITHOUT publishing: written to `stage-e<next>`,
    * where no manifest points. Overwrite mode makes a re-stage after
    * a crashed audit replay in place. Returns the staged handle.
    *
    * SINGLE-WRITER DISCIPLINE (shared with [[gc]]): the stage name is
    * derived from the live epoch, so two concurrent producers would
    * stage into the same dir, and a [[gc]] racing a concurrent
    * publish could sweep a stage the other producer still audits.
    * One producer at a time per table — the same contract every
    * durable store's epoch chain carries. */
  def stage(rows: DataFrame, dir: String,
            partitionBy: Seq[String] = Nil): String = {
    val rel = s"stage-e${open(dir).epoch + 1}"
    write(rows, s"$dir/$rel", partitionBy, overwrite = true)
    rel
  }

  /** The AUDIT view: the table as it WOULD serve if `staged`
    * published — current segments ∪ the staged batch (the staged scan
    * discovers its own layout AND schema, like any published segment —
    * an audit of a column-evolving batch sees the widened schema it
    * would serve). */
  def stagedView(s: SparkSession, dir: String, staged: String): DataFrame =
    read(s, dir).unionByName(s.read.parquet(s"$dir/$staged"),
      allowMissingColumns = true)

  /** Publish a clean staged batch: rename into the epoch layout, ONE
    * manifest flip. A STALE handle (the table advanced since the
    * stage) fails pointedly — the audit's verdict no longer describes
    * the table it would be joining.
    *
    * Crash seams compose: a crash AFTER the rename but BEFORE the flip
    * may be recovered either by replaying publish directly (the
    * renamed segment is found and the flip completes) or by replaying
    * the WHOLE round (stage → audit → publish) — in the latter case
    * the re-staged dir is a duplicate of the already-renamed segment
    * (same deterministic batch) and is discarded in favor of the
    * rename, so the two recovery paths cannot collide. */
  def publish(s: SparkSession, dir: String, staged: String): Manifest = {
    val m = open(dir)
    val e = m.epoch + 1
    require(staged == s"stage-e$e",
      s"stale stage '$staged': table is at epoch ${m.epoch}, expected stage-e$e")
    renameStage(s, dir, staged, e)
    val m2 = Manifest(e, m.segments :+ s"e$e", m.batches)
    commit(dir, m2)
    m2
  }

  /** The rename-or-heal step shared by [[publish]] and
    * [[ingestBatch]]: move `staged` to `e<e>`, or — if a crashed
    * prior attempt already renamed it — verify a re-staged duplicate
    * really matches before discarding it. */
  private def renameStage(s: SparkSession, dir: String, staged: String,
                          e: Long): Unit = {
    val from = java.nio.file.Paths.get(dir, staged)
    val to = java.nio.file.Paths.get(dir, s"e$e")
    if (java.nio.file.Files.exists(to)) {
      // rename already happened (crash before the flip); a re-staged
      // duplicate of the same batch, if present, yields to it — but
      // ONLY if it really is a duplicate: the whole-round recovery
      // path assumes deterministic replay, and a replay that staged
      // DIFFERENT rows must fail loudly instead of silently losing
      // them. Row count is the cheap witness (parquet footer counts —
      // no data scan).
      if (java.nio.file.Files.exists(from)) {
        val nStaged = s.read.parquet(from.toString).count()
        val nRenamed = s.read.parquet(to.toString).count()
        require(nStaged == nRenamed,
          s"re-staged '$staged' has $nStaged rows but the already-renamed " +
            s"'e$e' has $nRenamed — non-deterministic replay; refusing to " +
            "discard the re-staged batch")
        graft.Fs.deleteRecursively(from.toFile)
      }
    } else {
      require(java.nio.file.Files.exists(from),
        s"nothing staged at '$staged' and no renamed segment 'e$e' — stage first")
      java.nio.file.Files.move(from, to)
      ()
    }
  }

  /** Abort a dirty staged batch: delete the stage dir — serving was
    * never affected, the manifest never moved. */
  def abort(dir: String, staged: String): Unit = {
    graft.Fs.deleteRecursively(new java.io.File(s"$dir/$staged"))
    ()
  }

  /** COMPACTION: rewrite every live segment into ONE new segment under
    * `partitionBy` (typically the current scheme — this is how a
    * partition-evolved table retires its legacy layout once the old
    * era's read traffic no longer justifies two schemes), behind one
    * manifest flip. Observationally a no-op: the served rows are
    * identical, only the layout changes — the same discipline as every
    * store's reshard. Old epochs keep resolving through their
    * versioned manifests (time travel across the compaction) until
    * [[graft.ManifestIo.gcEpochs]]-style retention retires them; the
    * superseded segment DIRS are likewise left for the retention
    * sweep, since an older manifest still points at them. Crash
    * replay: the rewrite targets `e<next>` in overwrite mode, so a
    * crash between write and flip replays in place. */
  def compact(s: SparkSession, dir: String,
              partitionBy: Seq[String] = Nil): Manifest = {
    val m = open(dir)
    val e = m.epoch + 1
    write(readUnder(s, dir, m), s"$dir/e$e", partitionBy, overwrite = true)
    val m2 = Manifest(e, Seq(s"e$e"), m.batches)
    commit(dir, m2)
    m2
  }

  /** Retention GC — the sweep that makes [[compact]]'s "superseded
    * segments are left for retention" honest: manifests below
    * `current − retain + 1` retire through the shared lease handshake
    * ([[graft.ManifestIo.gcManifests]] — an in-flight [[withSnapshot]]
    * holding a lease is spared; bare [[readAt]] takes no lease and is
    * not protected), then any segment or stage dir that NO
    * retained manifest references is deleted. Dirs beyond the live
    * epoch are spared (a publish's renamed-but-not-flipped segment, or
    * the in-flight stage); stale STAGE dirs at or below the live epoch
    * are crash leftovers and sweep with the segments — which is safe
    * ONLY under the single-writer discipline documented on [[stage]]:
    * with a second producer, a stage taken just before a concurrent
    * publish advanced the epoch would be swept mid-audit. Layout differs
    * from the five bucketed stores (segments live at the table root,
    * not under `<component>/e<N>`), hence the table-shaped sweep here
    * instead of [[graft.ManifestIo.gcEpochs]]. */
  def gc(dir: String, retain: Int): Unit = {
    require(retain >= 1, s"retain must be >= 1, got $retain")
    val d = java.nio.file.Paths.get(dir)
    val live = open(dir)
    graft.ManifestIo.gcManifests(d, math.max(0L, live.epoch - retain + 1))
    val referenced = graft.ManifestIo.listEpochs(d)
      .flatMap(e => parse(graft.ManifestIo.versionedPath(d, e)).segments).toSet
    for (f <- Option(d.toFile.listFiles()).toSeq.flatten
           if f.isDirectory && f.getName.matches("(stage-)?e\\d+")) {
      val epoch = f.getName.stripPrefix("stage-").stripPrefix("e").toLong
      if (!referenced.contains(f.getName) && epoch <= live.epoch)
        graft.Fs.deleteRecursively(f)
    }
  }

  /** One WAP round: stage → audit the staged view → publish iff the
    * audit counts ZERO violations, abort otherwise. Returns the
    * violation count and the new manifest when published. */
  def writeAuditPublish(s: SparkSession, dir: String, rows: DataFrame,
                        partitionBy: Seq[String] = Nil)
                       (audit: DataFrame => Long): (Long, Option[Manifest]) = {
    val staged = stage(rows, dir, partitionBy)
    val violations = audit(stagedView(s, dir, staged))
    if (violations == 0L) (0L, Some(publish(s, dir, staged)))
    else { abort(dir, staged); (violations, None) }
  }

  /** EXACTLY-ONCE streaming WAP ingest — one micro-batch = one
    * audited round, with the batch id riding the SAME atomic manifest
    * write as the verdict (the epoch-pins-batch-id contract every
    * durable store's streaming feed carries, applied to the governed
    * table):
    *
    *   - a REPLAYED batch (at-least-once delivery) finds its id in
    *     `batches` and no-ops — accepted or refused, the verdict
    *     stands;
    *   - a batch GAP fails loudly (a skipped id means lost data, not
    *     a replay);
    *   - an ACCEPTED batch publishes as epoch e with `batches += id → e`;
    *   - a REFUSED batch advances to a REJECTION EPOCH: the epoch
    *     increments with NO new segment and `batches += id → −e`, so
    *     the refusal itself is atomic, replay-idempotent, and visible
    *     in the version history (time travel to −(−e) shows exactly
    *     what served while the batch was being refused).
    *
    * Crash seams: after stage → re-stage overwrites in place; after
    * rename, before flip → the replay re-stages, re-audits, and
    * [[renameStage]] heals (row-count-guarded); after flip → the
    * replay no-ops on the batch id. Returns (violations, manifest). */
  def ingestBatch(s: SparkSession, dir: String, rows: DataFrame, batchId: Long,
                  partitionBy: Seq[String] = Nil)
                 (audit: DataFrame => Long): (Long, Manifest) = {
    val m = open(dir)
    if (m.batches.contains(batchId)) return (0L, m)
    val expected = if (m.batches.isEmpty) 0L else m.batches.keys.max + 1
    require(batchId == expected,
      s"batch gap: expected batch $expected, got $batchId — refusing to skip")
    val staged = stage(rows, dir, partitionBy)
    val violations = audit(stagedView(s, dir, staged))
    val e = m.epoch + 1
    val m2 =
      if (violations == 0L) {
        renameStage(s, dir, staged, e)
        Manifest(e, m.segments :+ s"e$e", m.batches + (batchId -> e))
      } else {
        abort(dir, staged)
        Manifest(e, m.segments, m.batches + (batchId -> -e))
      }
    commit(dir, m2)
    (violations, m2)
  }
}
