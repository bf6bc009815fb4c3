package graft.ops

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.dump.DumpConverter

/** The converter one decade up from ConvScaleBench's 53 MB fixture:
  * lineitem replicated 10× with disjoint order-key ranges (sf1-ish —
  * 6M rows, ~0.5 GB of SQL text), rendered ONCE to a reusable dump
  * under java.io.tmpdir, then converted at several split counts. This
  * is the parse-dominated regime the 53 MB table says little about
  * (its ~1.8 s fixed tail is near the floor) — the SCALING.md decade
  * row comes from here.
  *
  * Run: sbt 'Test/runMain graft.ops.ConvDecadeBench'
  * (optional args: fixture dir, replication factor) */
object ConvDecadeBench {
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
    val reps = args.lift(1).flatMap(_.toIntOption).getOrElse(10)
    val dumpPath = Paths.get(
      System.getProperty("java.io.tmpdir"), s"graft_decade_dump_x$reps.sql")
    if (!Files.exists(dumpPath)) {
      val t0 = System.nanoTime()
      val li = Tables.lineitem(spark, sf)
        .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
      val maxOk = li.agg(max("l_orderkey")).head.getLong(0) + 1
      // one big table: each replica's keys shifted into a disjoint
      // range, so the dump is a plausible sf1 lineitem, not 10 copies
      val big = (0 until reps).map { k =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(k.toLong * maxOk))
      }.reduce(_ unionByName _)
      val w = Files.newBufferedWriter(dumpPath.resolveSibling(dumpPath.getFileName.toString + ".tmp"))
      try {
        w.write("-- MySQL dump 10.13  Distrib 8.0.36\n\n")
        ConverterQueries.streamSection(w, "lineitem", big,
          Seq("l_orderkey", "l_linenumber"), batchSize = 1000)
        w.write("-- Dump completed\n")
      } finally w.close()
      Files.move(dumpPath.resolveSibling(dumpPath.getFileName.toString + ".tmp"), dumpPath)
      println(f"#DECADE# rendered once in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    println(s"#DECADE# dump bytes = ${Files.size(dumpPath)}")
    // (minPartitions, saltsPerTable): the second dial matters at this
    // size — a one-table dump's reduce side has exactly `salts` tasks.
    // The ×100 (third-decade) grid runs salts into the hundreds: with
    // ~4.5 GB of one-table SQL the question is whether route/write
    // stays the bottleneck or statement-assembly starts to dominate,
    // and whether the salt dial keeps scaling the reduce side.
    // Round-14 ×100 grid: the r13 verdict asked for a salts sweep at
    // the best minPartitions (128) with the new route/write phase
    // split — {32, 128, 512} brackets the previous sweet spot a
    // factor of 4 in each direction.
    val grid =
      if (reps >= 100) Seq((128, 32), (128, 128), (128, 512))
      else Seq((8, 8), (32, 8), (64, 8), (128, 8), (32, 32), (64, 32), (64, 64))
    for ((parts, salts) <- grid; attempt <- 1 to 2) {
      val out = Files.createTempDirectory(s"decade_$parts")
      val phases = new scala.collection.mutable.LinkedHashMap[String, Double]
      val prog: String => Unit = {
        case s if s.startsWith("[dump-phase] ") =>
          val kv = s.stripPrefix("[dump-phase] ").split("=")
          phases(kv(0)) = phases.getOrElse(kv(0), 0.0) + kv(1).toDouble
        case _ => ()
      }
      val t0 = System.nanoTime()
      val res = DumpConverter.convert(spark, dumpPath.toString, out.toString,
        minPartitions = parts, saltsPerTable = salts, progress = prog)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"#DECADE# minPartitions=$parts%3d salts=$salts%2d attempt=$attempt  ${sec}%6.2f s  " +
        f"rows=${res.rowsWritten.values.sum}")
      println(s"#DECADEPHASE# minPartitions=$parts salts=$salts  " +
        phases.map { case (k, v) => f"$k=$v%.2f" }.mkString(" "))
      // delete output between runs so disk doesn't accumulate 10 copies
      def rec(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rec); f.delete(); ()
      }
      rec(out.toFile)
    }
    spark.stop()
  }
}
