package graft

/** The one recursive-delete used by every temp-dir/artifact owner
  * (similarity index store, streaming state dirs, specs) — previously
  * four private copies that could drift independently. */
private[graft] object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRecursively)
    f.delete(); ()
  }

  /** JVM-exit temp-dir sweeper shared by every durable-artifact memo
    * (ANN index dirs, text index dirs, …): ONE registry and ONE
    * shutdown hook instead of a per-file copy that can half-apply
    * future cleanup changes. */
  private val exitDirs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      exitDirs.forEach(p => deleteRecursively(new java.io.File(p)))))
  }

  /** Register `p` for recursive deletion at JVM exit; returns `p`. */
  def deleteOnExit(p: String): String = { exitDirs.add(p); p }
}
