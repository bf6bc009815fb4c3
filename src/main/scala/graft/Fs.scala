package graft

/** The one recursive-delete used by every temp-dir/artifact owner
  * (similarity index store, streaming state dirs, specs) — previously
  * four private copies that could drift independently. */
private[graft] object Fs {
  def deleteRecursively(f: java.io.File): Unit = {
    val cs = f.listFiles(); if (cs != null) cs.foreach(deleteRecursively)
    f.delete(); ()
  }
}
