package graft

import org.apache.spark.sql.SparkSession

/** Session-scoped memoization for per-(session, fixture-dir) artifacts
  * (layout copies, durable-store dirs, trained artifacts).
  *
  * A `TrieMap[(SparkSession, String), V]` — the obvious shape — holds
  * STRONG session references: a long-lived process running many
  * sessions would retain every stopped session (and its entries)
  * forever. The outer map is therefore a [[java.util.WeakHashMap]]
  * keyed on the session, so a collected session's entries vanish with
  * it; the inner per-dir map carries no session reference. The lock
  * covers only the outer lookup, never a Spark job — `getOrElseUpdate`
  * on the inner TrieMap runs the (possibly expensive) builder outside
  * it. */
object SessionCache {

  type PerDir[V] = scala.collection.concurrent.TrieMap[String, V]
  type Sessions[V] = java.util.WeakHashMap[SparkSession, PerDir[V]]

  def newCache[V](): Sessions[V] = new java.util.WeakHashMap[SparkSession, PerDir[V]]

  def perSession[V](m: Sessions[V], s: SparkSession): PerDir[V] =
    m.synchronized {
      val cur = m.get(s)
      if (cur != null) cur
      else {
        val v = scala.collection.concurrent.TrieMap.empty[String, V]
        m.put(s, v); v
      }
    }
}
