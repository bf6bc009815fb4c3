package graft

import java.nio.file.{Files, Path, StandardCopyOption}

/** Epoch-versioned manifest plumbing shared by the three durable
  * stores (streaming upsert table, ANN index, inverted text index):
  * path layout, torn-write-proof commit, epoch listing, and the
  * [[EpochGuard]]-wired manifest retention sweep. Store-specific JSON
  * render/parse stays with each store; everything about HOW a
  * manifest reaches and leaves disk lives here, ONCE — a durability
  * fix (fsync, crash recovery of a stale `.tmp`) now propagates to
  * all three instead of needing three synchronized edits.
  */
private[graft] object ManifestIo {

  /** The live current-pointer manifest. */
  def manifestPath(dir: Path): Path = dir.resolve("_manifest.json")

  /** Stage-then-rename publish of per-partition parquet dirs — the
    * shared write path of every bucketed store artifact (ANN cells,
    * text-index posting buckets, dedup-index band buckets): stage
    * `rows` under `.stage-e<epoch>` partitioned by a COPY of
    * `partColumn` (so the data files keep the original as a real
    * column after the rename strips the `p<col>=K` dir name), then
    * publish each staged partition via rename into its immutable
    * `<dirPrefix><K>/e<epoch>` location. Published ids come from the
    * STAGE DIRECTORY LISTING — the write is the only job over `rows`,
    * so callers never pay a second corpus-sized pass just to learn
    * which partitions materialized. A crashed attempt's leftover
    * destination dirs are overwritten on replay (idempotent: nothing
    * references `e<epoch>` until the manifest flips). Returns the
    * published partition ids, sorted. */
  def publishPartitions(rows: org.apache.spark.sql.DataFrame, dir: Path,
                        epoch: Long, partColumn: String,
                        dirPrefix: String, saltTasks: Int = 1): Seq[Int] = {
    import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
    require(saltTasks >= 1, s"saltTasks must be ≥ 1, got $saltTasks")
    val stage = dir.resolve(s".stage-e$epoch")
    Fs.deleteRecursively(stage.toFile)
    // repartition ON the partition column first: without it every
    // upstream task writes a file into every partition dir — tasks ×
    // fan-out files (measured 9× super-linear build growth at fan-out
    // 512 in ScaleBench, and a small-file storm an object store would
    // punish harder). One extra shuffle of the posting rows buys
    // ~one file per partition dir. Trade-off: a partition's rows now
    // land on ONE task, so a pathologically hot partition writes as a
    // straggler — usually acceptable because every caller sizes its
    // fan-out ~√N (suggestedBuckets/suggestedNlist), which shrinks
    // per-partition bytes as the corpus grows. A store that EXPECTS
    // heavy skew passes `saltTasks` > 1: the shuffle key gains a
    // deterministic row-content salt (xxhash64 over the row, mod
    // saltTasks — stable under task retry, unlike round-robin), so a
    // hot partition's rows spread over up to `saltTasks` parallel
    // writers and its dir holds ≤ saltTasks files instead of one —
    // bounded small-file cost, no straggler.
    val keyed = rows.withColumn("p" + partColumn, col(partColumn))
    val parted =
      if (saltTasks == 1) keyed.repartition(col("p" + partColumn))
      // explicit partition count: an AQE-coalescible repartition would
      // merge the salt groups right back into one task, silently
      // undoing the skew spread (observed: 300k-row hot bucket → 1
      // file at saltTasks=4 under AQE). REPARTITION_BY_NUM is exempt
      // from AQE coalescing.
      else keyed.repartition(
        rows.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt,
        col("p" + partColumn),
        pmod(xxhash64(rows.columns.map(col): _*), lit(saltTasks.toLong)))
    parted
      .write.mode("overwrite").partitionBy("p" + partColumn).parquet(stage.toString)
    val staged = Option(stage.toFile.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith(s"p$partColumn="))
      .map(_.getName.stripPrefix(s"p$partColumn=").toInt).sorted
    staged.foreach { k =>
      val src = stage.resolve(s"p$partColumn=$k")
      val dst = dir.resolve(s"$dirPrefix$k").resolve(s"e$epoch")
      Files.createDirectories(dst.getParent)
      Fs.deleteRecursively(dst.toFile)
      Files.move(src, dst)
      ()
    }
    Fs.deleteRecursively(stage.toFile)
    staged
  }

  /** The immutable per-epoch snapshot manifest. */
  def versionedPath(dir: Path, e: Long): Path = dir.resolve(s"_manifest-e$e.json")

  /** temp + ATOMIC_MOVE: readers never observe a torn manifest. */
  def atomicWrite(dest: Path, content: String): Unit = {
    val tmp = dest.resolveSibling("." + dest.getFileName.toString + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  /** The atomic flip: write the immutable per-epoch manifest FIRST
    * (the snapshot the epoch stays readable through), then replace
    * the current pointer. A crash between the two moves leaves a
    * complete-but-unreferenced versioned manifest — harmless under
    * every store's recovery story (idempotent replay or rebuild). */
  def commit(dir: Path, epoch: Long, json: String): Unit = {
    atomicWrite(versionedPath(dir, epoch), json)
    atomicWrite(manifestPath(dir), json)
  }

  /** Epochs with a readable versioned manifest, ascending. */
  def listEpochs(dir: Path): Seq[Long] =
    Option(dir.toFile.listFiles()).toSeq.flatten.map(_.getName)
      .collect { case n if n.startsWith("_manifest-e") && n.endsWith(".json") =>
        n.stripPrefix("_manifest-e").stripSuffix(".json").toLong }
      .sorted

  /** Delete versioned manifests below `horizon` through
    * [[EpochGuard.guardedDelete]]'s two-phase intent handshake
    * (reader leases win; see EpochGuard's scaladoc for the race
    * argument). `afterIntent` is the test seam specs use to plant a
    * racing lease at the historically-missed point. */
  def gcManifests(dir: Path, horizon: Long, afterIntent: Long => Unit = _ => ()): Unit =
    for (e <- listEpochs(dir) if e < horizon)
      EpochGuard.guardedDelete(dir, e, () => afterIntent(e)) {
        Files.deleteIfExists(versionedPath(dir, e)): Unit
      }

  /** The full retention-GC pass every durable store runs after a flip,
    * ONCE for all of them: manifests below the horizon go through the
    * lease handshake above, then any `<component>/e<N>` dir that no
    * RETAINED manifest references (and that is older than the live
    * epoch — in-flight future dirs are spared) is swept.
    * `componentPattern` names the store's top-level component dirs
    * (e.g. `"b\\d+|stats|docs|dels"`); `referencedOf` parses ONE
    * retained versioned manifest into the relative component paths it
    * pins (e.g. `"b3/e2"`). */
  def gcEpochs(dir: Path, current: Long, retain: Int,
               componentPattern: String,
               referencedOf: Path => Iterable[String],
               afterIntent: Long => Unit = _ => ()): Unit = {
    val horizon = math.max(0L, current - retain + 1)
    gcManifests(dir, horizon, afterIntent)
    val referenced: Set[String] =
      listEpochs(dir).flatMap(e => referencedOf(versionedPath(dir, e))).toSet
    val dirs = Option(dir.toFile.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.matches(componentPattern))
    for (cd <- dirs; ed <- Option(cd.listFiles()).toSeq.flatten
           if ed.getName.matches("e\\d+")) {
      val rel = s"${cd.getName}/${ed.getName}"
      val epoch = ed.getName.stripPrefix("e").toLong
      if (!referenced.contains(rel) && epoch < current)
        Fs.deleteRecursively(ed)
    }
  }

  /** Lease-pinned snapshot access — the [[EpochGuard.withLease]]
    * wiring every store's `withSnapshot` shares: write the lease,
    * wait out any in-flight GC intent, re-parse the versioned
    * manifest (its continued existence is the liveness check), run
    * `body` with the epoch spared from GC. */
  def withSnapshot[T, A](dir: Path, epoch: Long, parse: Path => T)
                        (body: T => A): A =
    EpochGuard.withLease(dir, epoch,
      Files.exists(versionedPath(dir, epoch)), dir.toString) {
      body(parse(versionedPath(dir, epoch)))
    }

  /** Versioned-manifest open with the pointed not-retained failure —
    * the shared shape of every store's `openAt` (UNPINNED: a
    * concurrent GC can still sweep component files between this
    * resolve and a lazy read; pin with [[withSnapshot]] for that). */
  def openVersioned[T](dir: Path, epoch: Long, parse: Path => T): T = {
    val p = versionedPath(dir, epoch)
    require(Files.exists(p),
      s"epoch $epoch is not retained (have: ${listEpochs(dir).mkString(",")})")
    parse(p)
  }
}
