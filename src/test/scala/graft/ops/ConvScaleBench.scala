package graft.ops

import java.nio.file.Files
import graft.dump.DumpConverter

/** Measures converter wall-clock vs minPartitions on the sf0.1-scale
  * rendered dump (the SCALING.md partition-scaling table).
  * Run: sbt 'Test/runMain graft.ConvScaleBench' */
object ConvScaleBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dump = ConverterQueries.scaleDumpFile(spark, sf)
    println(s"#CONV# dump bytes = ${Files.size(dump)}")
    for (parts <- Seq(1, 2, 4, 8, 16, 32); _ <- 1 to 2) {
      val out = Files.createTempDirectory(s"convbench_$parts")
      val t0 = System.nanoTime()
      val res = DumpConverter.convert(spark, dump.toString, out.toString, minPartitions = parts)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"#CONV# minPartitions=$parts%2d  ${sec}%6.2f s  rows=${res.rowsWritten.values.sum}")
    }
    spark.stop()
  }
}
