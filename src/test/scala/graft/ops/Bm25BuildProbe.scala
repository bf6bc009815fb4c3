package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc phase profiler for `bm25_build` at a scale tier — times the
  * build's constituent jobs separately so the superlinear term can be
  * attributed (posting shuffle vs bucket write/rename vs stats vs
  * registry). Usage:
  *   tools/run_main.sh -t graft.ops.Bm25BuildProbe <reps> [fanOut]
  */
object Bm25BuildProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .appName("bm25-build-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_scale_x$reps"
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()
    val fanOut = args.lift(1).flatMap(_.toIntOption)
      .getOrElse(TextIndexStore.suggestedBuckets(nDocs))
    println(s"#PROBE# nDocs=$nDocs fanOut=$fanOut")

    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"#PROBE# $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    // phase 1: the posting shuffle + cache materialization
    val occ = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dl = occ.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val rows = occ.join(dl, "doc_id")
      .withColumn("bucket", pmod(xxhash64(col("tok")), lit(fanOut.toLong)).cast("int"))
      .cache()
    val nRows = time("postings_cache")(rows.count())
    println(s"#PROBE# postingRows=$nRows rowsPerBucket=${nRows / fanOut}")

    val tis = Files.createTempDirectory("bm25probe").toString
    // phase 2: the bucket publish (stage write + rename)
    time("publish_total") {
      val stage = new java.io.File(s"$tis/.stage-e0")
      time("stage_write") {
        rows.select(col("tok"), col("doc_id"), col("tf"), col("dl"), col("bucket"))
          .withColumn("pbucket", col("bucket"))
          .repartition(col("pbucket"))
          .write.mode("overwrite").partitionBy("pbucket").parquet(stage.toString)
      }
      time("rename") {
        val staged = Option(stage.listFiles()).toSeq.flatten
          .filter(f => f.isDirectory && f.getName.startsWith("pbucket="))
        staged.foreach { f =>
          val k = f.getName.stripPrefix("pbucket=").toInt
          val dst = java.nio.file.Paths.get(s"$tis/b$k/e0")
          Files.createDirectories(dst.getParent)
          Files.move(f.toPath, dst)
        }
        println(s"#PROBE# staged=${staged.size}")
      }
    }
    // phase 3: stats
    time("stats") {
      rows.groupBy(col("tok")).agg(count(lit(1)).cast("long").as("df"))
        .write.mode("overwrite").parquet(s"$tis/stats/e0")
    }
    // phase 4: registry
    time("registry") {
      rows.groupBy(col("doc_id"))
        .agg(first(col("dl")).as("dl"), collect_set(col("bucket")).as("buckets"))
        .write.mode("overwrite").parquet(s"$tis/docs/e0")
    }
    time("scalars") {
      s.read.parquet(s"$tis/docs/e0")
        .agg(count(lit(1)).as("n"), sum(col("dl")).as("s")).head
    }
    // and the real thing end-to-end for comparison
    val tis2 = Files.createTempDirectory("bm25probe2").toString
    time("full_build")(TextIndexStore.build(docs, tis2, numBuckets = fanOut))
    graft.Fs.deleteRecursively(new java.io.File(tis))
    graft.Fs.deleteRecursively(new java.io.File(tis2))
    s.stop()
  }
}
