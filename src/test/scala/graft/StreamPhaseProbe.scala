package graft

import org.apache.spark.sql.SparkSession

/** Round-16 optimization probe: decompose the st_upsert /
  * st_upsert_evolve wall-clock into phases (layout build, per-drain,
  * per-batch) so the optimization targets the measured term, not the
  * guessed one. Run:
  *   tools/run_main.sh -t graft.StreamPhaseProbe [sfDir]
  */
object StreamPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def stamp(): Long = System.nanoTime()
    def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    (1 to 2).foreach { rep =>
      val t0 = stamp()
      var last = t0
      val stateDir = java.nio.file.Files.createTempDirectory("probe_evolve_")
      val df = streaming.StreamingOps.st_upsert_evolve_run(
        s, sf, stateDir.toString,
        (phase, _) => {
          println(f"#PHASE# evolve rep=$rep drain$phase%d ${sec(last)}%.3f s")
          last = stamp()
        })
      df.write.mode("overwrite").format("noop").save()
      println(f"#PHASE# evolve rep=$rep final_read ${sec(last)}%.3f s total ${sec(t0)}%.3f s")
    }

    (1 to 2).foreach { rep =>
      val t0 = stamp()
      var last = t0
      var batches = 0
      val df = streaming.StreamingOps.st_upsert_run(s, sf, { _ =>
        batches += 1
        println(f"#PHASE# upsert rep=$rep batch$batches%d ${sec(last)}%.3f s")
        last = stamp()
      })
      df.write.mode("overwrite").format("noop").save()
      println(f"#PHASE# upsert rep=$rep final_read ${sec(last)}%.3f s total ${sec(t0)}%.3f s")
    }

    // Streaming-free merge: drive mergeUpsertBatch directly over the
    // same 2-file batch slices the drain sees — the delta between this
    // and the drained per-batch time is pure streaming-machinery cost.
    import org.apache.spark.sql.functions.col
    (1 to 2).foreach { rep =>
      val stateDir = java.nio.file.Files.createTempDirectory("probe_merge_")
      val ev = ops.Tables.events(s, sf).repartition(8)
        .write.mode("overwrite")
        .parquet(stateDir.resolve("src").toString)
      val files = java.nio.file.Files.list(stateDir.resolve("src"))
        .toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted
      files.grouped(2).zipWithIndex.foreach { case (fs, i) =>
        val t = stamp()
        val batch = s.read.parquet(fs: _*)
        streaming.StreamingOps.mergeUpsertBatch(
          s, stateDir.resolve("state").toString,
          ops.Tables.normalizeEventTs(batch, "probe"))
        println(f"#PHASE# rawmerge rep=$rep batch${i + 1}%d ${sec(t)}%.3f s")
      }
    }
    // Step-level decomposition of one merge batch (mirrors
    // mergeUpsertBatch's structure): which term owns the ~2 s?
    locally {
      import org.apache.spark.sql.functions.{col, max, struct, unix_micros, round}
      import org.apache.spark.sql.DataFrame
      val stateDir = java.nio.file.Files.createTempDirectory("probe_steps_")
      val src = stateDir.resolve("src")
      ops.Tables.events(s, sf).repartition(8)
        .write.mode("overwrite").parquet(src.toString)
      val files = java.nio.file.Files.list(src)
        .toArray.map(_.toString).filter(_.endsWith(".parquet")).sorted
      val fanOut = 16
      val lww = Seq(col("tus"), col("event_type"), col("cents"))
      def reduceKeys(df: DataFrame): DataFrame =
        df.groupBy(col("bucket"), col("user_id"))
          .agg(max(struct(lww: _*)).as("m"))
          .select(col("bucket"), col("user_id"), col("m.tus").as("tus"),
            col("m.event_type").as("event_type"), col("m.cents").as("cents"))
      files.grouped(2).zipWithIndex.foreach { case (fs, i) =>
        var t = stamp()
        val batch = ops.Tables.normalizeEventTs(s.read.parquet(fs: _*), "probe")
        val delta = reduceKeys(batch
          .select(col("user_id"), unix_micros(col("ts")).as("tus"),
            col("event_type"), round(col("value") * 100).cast("long").as("cents"))
          .withColumn("bucket", (col("user_id") % fanOut).cast("int")))
        val affected = delta.select("bucket").distinct().collect().map(_.getInt(0))
        println(f"#STEP# b$i%d delta_collect ${sec(t)}%.3f s (${affected.length} buckets)")
        t = stamp()
        val prevDirs = (0 until fanOut).map(b => stateDir.resolve(s"b$b"))
          .filter(p => java.nio.file.Files.exists(p)).map(_.toString)
        val cur =
          if (prevDirs.nonEmpty)
            s.read.parquet(prevDirs: _*)
              .withColumn("bucket", (col("user_id") % fanOut).cast("int"))
              .select(col("bucket"), col("user_id"), col("tus"),
                col("event_type"), col("cents"))
          else delta.limit(0)
        val merged = reduceKeys(cur.unionByName(delta))
        val stage = stateDir.resolve(s".stage-e$i")
        merged.repartition(col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(stage.toString)
        println(f"#STEP# b$i%d merge_write ${sec(t)}%.3f s")
        t = stamp()
        (0 until fanOut).foreach { b =>
          val sp = stage.resolve(s"bucket=$b")
          val dp = stateDir.resolve(s"b$b")
          if (java.nio.file.Files.exists(sp)) {
            org.apache.commons.io.FileUtils.deleteDirectory(dp.toFile)
            java.nio.file.Files.move(sp, dp)
          }
        }
        println(f"#STEP# b$i%d moves ${sec(t)}%.3f s")
      }
    }
    s.stop()
  }
}
