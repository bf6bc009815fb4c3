package graft

import java.nio.file.{Files, Path}

/** Reader-lease vs retention-GC mutual exclusion for epoch-versioned
  * stores (the upsert state table and the ANN index store share this
  * protocol and its on-disk file names).
  *
  * The round-10 protocol (reader: write lease → recheck manifest; GC:
  * list leases → delete) carried an honest documented residual: a
  * lease written in the instants between GC's lease listing and its
  * delete was missed, and the reader's in-flight read crashed on the
  * vanished files. This object closes that window with the classic
  * store-then-load handshake (Dekker's algorithm's first half — each
  * side PUBLISHES its claim before CHECKING the other's):
  *
  *  - GC, per epoch: write a `_gc-intent-e<N>.json` marker, THEN
  *    re-list leases; delete the epoch only if unleased; remove the
  *    marker in all cases.
  *  - Reader: write `_lease-e<N>-<token>.json`, THEN wait out any
  *    intent marker for its epoch before trusting the manifest
  *    recheck.
  *
  * Why this closes the race: a conflict means both files get written.
  * Whichever side writes second must see the other's file on its
  * subsequent check — reader-lease-then-intent-check racing
  * gc-intent-then-lease-list cannot interleave so that BOTH checks
  * miss (reader misses intent ⇒ reader's check preceded GC's intent
  * write ⇒ reader's earlier lease write preceded GC's later lease
  * list ⇒ GC sees the lease). Local-FS metadata ops within one
  * directory are sequentially consistent, which is all the argument
  * needs; on an object store the same shape holds if list-after-write
  * is consistent (S3 is, since 2020).
  *
  * Liveness bound, stated honestly: the reader waits out an intent
  * for at most [[IntentWaitMs]] and then proceeds if the manifest is
  * alive — an intent older than that is a crashed GC's leftover
  * (crashed GCs delete nothing further, so proceeding is safe). The
  * one assumption this buys is that a LIVE GC never stalls longer
  * than the wait between writing its intent and deleting — the same
  * bounded-pause assumption every lease-based system without fencing
  * tokens makes (Chubby/GFS-style leases); a store with conditional
  * deletes would discharge it mechanically.
  *
  * Single-maintenance-writer is assumed (as the stores' commit
  * protocols already do): intents guard GC-vs-reader, not GC-vs-GC.
  */
object EpochGuard {

  /** Max time a reader waits for a live GC pass to clear its intent
    * marker. A GC pass's intent→delete span is a handful of local
    * metadata ops — microseconds — so 10 s is ~6 orders of margin. */
  private[graft] val IntentWaitMs = 10000L
  private val PollMs = 5L

  def leasePath(dir: Path, epoch: Long, token: String): Path =
    dir.resolve(s"_lease-e$epoch-$token.json")

  def intentPath(dir: Path, epoch: Long): Path =
    dir.resolve(s"_gc-intent-e$epoch.json")

  /** Epochs currently pinned by a reader lease. */
  def leasedEpochs(dir: Path): Set[Long] =
    Option(dir.toFile.listFiles()).toSeq.flatten.map(_.getName)
      .collect { case n if n.startsWith("_lease-e") && n.endsWith(".json") =>
        n.stripPrefix("_lease-e").takeWhile(_ != '-').toLong }
      .toSet

  /** Reader side: pin `epoch` for the duration of `body`. `alive`
    * must re-check the epoch's manifest ON DISK each call (not a
    * cached value). Throws IllegalStateException("snapshot expired…")
    * if GC won — never returns a partial view. */
  def withLease[A](dir: Path, epoch: Long, alive: => Boolean,
                   what: String, waitMs: Long = IntentWaitMs)(body: => A): A = {
    val token = java.util.UUID.randomUUID().toString.take(8)
    val lease = leasePath(dir, epoch, token)
    Files.writeString(lease, s"""{"epoch":$epoch}""")
    try {
      // wait out any in-flight GC pass: it either saw our lease (it
      // re-lists after its intent write — spares us) or it didn't
      // (its delete lands; the manifest recheck below catches it)
      val deadline = System.nanoTime() + waitMs * 1000000L
      while (Files.exists(intentPath(dir, epoch)) &&
             System.nanoTime() < deadline) {
        if (!alive)
          throw new IllegalStateException(
            s"snapshot expired: epoch $epoch of $what was GC'd before the " +
              "lease landed; raise retention or lease earlier")
        Thread.sleep(PollMs)
      }
      if (!alive)
        throw new IllegalStateException(
          s"snapshot expired: epoch $epoch of $what was GC'd before the " +
            "lease landed; raise retention or lease earlier")
      body
    } finally { Files.deleteIfExists(lease); () }
  }

  /** GC side: two-phase delete of one epoch. Publishes the intent,
    * re-lists leases, runs `delete` only if the epoch is unleased,
    * and always clears the intent. `afterIntent` is a TEST SEAM — it
    * runs at the exact point the round-10 protocol was vulnerable
    * (after the intent is visible, before the lease list), letting a
    * spec plant a racing lease deterministically; production callers
    * leave it default. */
  def guardedDelete(dir: Path, epoch: Long, afterIntent: () => Unit = () => ())
                   (delete: => Unit): Unit = {
    val intent = intentPath(dir, epoch)
    Files.writeString(intent, s"""{"epoch":$epoch}""")
    try {
      afterIntent()
      if (!leasedEpochs(dir).contains(epoch)) delete
    } finally { Files.deleteIfExists(intent); () }
  }
}
