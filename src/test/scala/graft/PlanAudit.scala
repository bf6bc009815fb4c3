package graft

/** Ad-hoc plan auditor: prints the executed plan of the named queries.
  * Run: sbt 'Test/runMain graft.PlanAudit q_array_fns q_pivot' */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"#PLAN# $name")
      println(SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
        .linesIterator.map(_.take(160)).take(45).mkString("\n"))
    }
    spark.stop()
  }
}
