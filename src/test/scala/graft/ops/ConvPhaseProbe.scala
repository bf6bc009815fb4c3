package graft.ops

import java.nio.file.Files
import graft.dump.DumpConverter

/** Round-17 diagnosis probe: conv_scale regressed 1.96→2.55 s in the
  * round-16 driver bench after the LZ4 statements-cache commit — this
  * times the converter's own phases at the bench's exact shape
  * (minPartitions = 32, sf0.1 dump) so the regression names its phase.
  * Run: tools/run_main.sh -t graft.ops.ConvPhaseProbe */
object ConvPhaseProbe {
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
    println(s"#CONVP# dump bytes = ${Files.size(dump)}")
    for (i <- 1 to 4) {
      val phases = new scala.collection.mutable.LinkedHashMap[String, Double]
      val prog: String => Unit = {
        case s if s.startsWith("[dump-phase] ") =>
          val kv = s.stripPrefix("[dump-phase] ").split("=")
          phases(kv(0)) = phases.getOrElse(kv(0), 0.0) + kv(1).toDouble
        case _ => ()
      }
      val out = Files.createTempDirectory("convphase_")
      val t0 = System.nanoTime()
      DumpConverter.convert(spark, dump.toString, out.toString,
        minPartitions = 32, progress = prog)
      val sec = (System.nanoTime() - t0) / 1e9
      val other = sec - phases.values.sum
      val detail = (phases.toSeq :+ ("other" -> other))
        .map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
      println(f"#CONVP# run$i total=$sec%.2f  $detail")
      graft.Fs.deleteRecursively(out.toFile)
    }
    spark.stop()
  }
}
