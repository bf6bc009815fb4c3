package graft.ops

import org.apache.spark.sql.SparkSession

/** Round-16 probe: split a query's wall-clock into PLANNING (analysis→
  * physical plan) vs EXECUTION (codegen+run via noop), to separate
  * plan-bloat problems from data-path problems.
  * Run: tools/run_main.sh -t graft.ops.PlanCostProbe <query>...
  */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SOLO_SF", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    args.foreach { name =>
      val fn = qs(name)
      (1 to 3).foreach { rep =>
        var t0 = System.nanoTime()
        val df = fn(s, sf)
        val build = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        df.queryExecution.executedPlan
        val plan = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val exec = (System.nanoTime() - t0) / 1e9
        println(f"#PLANCOST# $name rep=$rep build=$build%.3f plan=$plan%.3f exec=$exec%.3f")
      }
    }
    s.stop()
  }
}
