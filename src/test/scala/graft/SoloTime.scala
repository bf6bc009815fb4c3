package graft

/** Ad-hoc solo timer: runs the named queries in isolation (fresh JVM,
  * no other queries contending for the session) N times each through
  * the same `noop` materialization Bench uses, printing every run's
  * time plus the join-strategy lines of the executed plan. This is the
  * diagnosis tool for bench anomalies: Bench times 126 queries
  * back-to-back in one JVM, so a single query's number can be polluted
  * by GC/JIT pressure from its neighbors; SoloTime gives the same
  * query a clean room.
  *
  * Run: SPARK_GRAFT_SOLO_SF=/root/testdata/sf0.1 \
  *        sbt 'Test/runMain graft.SoloTime q5_region_revenue 5'
  */
object SoloTime {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SOLO_SF", "/root/testdata/sf0.001")
    val reps = args.lastOption.flatMap(_.toIntOption).getOrElse(3)
    val names = args.filter(_.toIntOption.isEmpty).toSeq match {
      case Nil => Seq("q5_region_revenue")
      case ns  => ns
    }
    // Mirror Bench's session exactly (local[32], 32 shuffle partitions)
    // so solo numbers are comparable to driver bench numbers.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-solo")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"#SOLO# $name sf=$sf runs=${times.map(t => f"$t%.3f").mkString(",")} best=${times.min}%.3f")
      val plan = fn(spark, sf).queryExecution.executedPlan.toString
      plan.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") || l.contains("AQE"))
        .take(30)
        .foreach(l => println("  " + l.trim.take(150)))
    }
    spark.stop()
  }
}
