package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timer for the size-derived nlist: ANN build + serve + recall
  * at a scale tier. Usage: tools/run_main.sh -t graft.ops.AnnSizedProbe <reps> [nlist]
  */
object AnnSizedProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(100)
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_scale_x$reps"
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val nVec = emb.count()
    val nlist = args.lift(1).flatMap(_.toIntOption)
      .getOrElse(AnnIndexStore.sizedNlist(nVec))
    println(s"#PROBE# nVec=$nVec nlist=$nlist (suggested=${AnnIndexStore.suggestedNlist(nVec)})")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"#PROBE# $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val annDir = Files.createTempDirectory(s"graft_annprobe_x$reps").toString
    val trainSample = emb.sample(withReplacement = false,
      math.min(1.0, 8000.0 / nVec), 42L)
    // the fit is memoized per (dataset, k): timing it first isolates
    // it from the assignment+publish the subsequent build times
    time("kmeans_fit") {
      SimilarityOps.kmeansCentroids(trainSample, nlist)
    }
    time("ann_build") {
      AnnIndexStore.build(trainSample, annDir, k = nlist, index = Some(emb))
    }
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val served = time("ann_serve_np5") {
      AnnIndexStore.topK(s, annDir, AnnIndexStore.open(annDir), queries,
        k = 5, nprobe = 5).select(col("qid"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    time("ann_serve_np5_rep2") {
      AnnIndexStore.topK(s, annDir, AnnIndexStore.open(annDir), queries,
        k = 5, nprobe = 5).count()
    }
    val brute = time("brute") {
      SimilarityOps.bruteForceTopK(queries,
          emb.select(col("vec_id").as("cid"), col("embedding").as("ce")), 5)
        .select(col("qid"), col("cid")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(s"#PROBE# recall_np5=${served.intersect(brute).size * 100 / brute.size}")
    graft.Fs.deleteRecursively(new java.io.File(annDir))
    s.stop()
  }
}
