package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite

/** Spill-correctness witness (round-9 verdict item 6): direct evidence
  * that the heaviest operators keep producing the oracle answer when
  * their buffers overflow to disk — the memory regime a 100 TB input
  * actually runs in, which the comfortable fixture sizes never enter.
  *
  * A cloned session forces spilling at toy thresholds (window and
  * sort-merge-join buffers spill every few rows, hash aggregation
  * falls back to sort-based) — the same execution paths real memory
  * pressure triggers, minus the flakiness of trying to exhaust an 8 GB
  * test JVM. The spec then asserts BOTH halves of the claim:
  *
  *   - correctness: each query's full result set under forced spilling
  *     is row-identical to the default session's (which the DuckDB
  *     oracle gate already hash-checks);
  *   - the spill actually happened: the executed plans' SQL metrics
  *     report nonzero spill bytes, so the assertion can never pass
  *     vacuously on an in-memory run.
  */
class SpillWitnessSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Session clone whose operator buffers spill after a handful of
    * rows. Runtime SQLConf only — the shared context is untouched. */
  private lazy val spillSession = {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "4")
    ss.conf.set("spark.sql.windowExec.buffer.spill.threshold", "16")
    ss.conf.set("spark.sql.sortMergeJoinExec.buffer.in.memory.threshold", "4")
    ss.conf.set("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "16")
    ss.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4")
    ss
  }

  /** Every physical node, descending through AQE wrappers and query
    * stages (metrics live on the materialized stages' nodes). */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val nested = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
      case q: QueryStageExec => allNodes(q.plan)
      case _ => Seq.empty
    }
    p +: (p.children.flatMap(allNodes) ++ nested)
  }

  private def spillBytes(df: DataFrame): Long =
    allNodes(df.queryExecution.executedPlan)
      .flatMap(_.metrics.collect { case (name, m) if name.toLowerCase.contains("spill") => m.value })
      .filter(_ > 0).sum

  /** Collect to a canonical, comparable form: every row as a string
    * sequence, sorted — byte-level result equality, order-free. */
  private def canon(df: DataFrame): Seq[Seq[String]] =
    df.collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString(""))

  /** The witnesses: the suite's heaviest join star, its heaviest
    * multi-stage pipeline (LSH dedup funnel run to product), and a
    * window aggregation whose per-partition buffers must spill. */
  private val witnessQueries = Seq("q5_region_revenue", "d_dedup_apply", "q_window_running_sum")

  for (name <- witnessQueries)
    test(s"$name: identical results under forced buffer spilling") {
      val expected = canon(SparkEntry.queries(name)(spark, sf))
      val got = canon(SparkEntry.queries(name)(spillSession, sf))
      assert(got == expected, s"$name diverged under spill pressure")
    }

  test("the spill regime is real: executed plans report nonzero spill bytes") {
    // q_window_running_sum partitions carry far more rows than the
    // 16-row spill threshold, so its window buffers must hit disk; the
    // metric check keeps the correctness tests above from ever passing
    // vacuously in a config where the thresholds stopped applying.
    val df = SparkEntry.queries("q_window_running_sum")(spillSession, sf)
    df.collect()
    val spilled = spillBytes(df)
    assert(spilled > 0, "expected nonzero spill bytes in the forced-spill session")
    info(s"spill bytes observed: $spilled")
  }
}
