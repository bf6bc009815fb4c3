package graft.ops
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ServeCostProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(100)
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_scale_x$reps"
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val nVec = emb.count()
    val nlist = AnnIndexStore.sizedNlist(nVec)
    val annDir = java.nio.file.Files.createTempDirectory("servecost").toString
    val trainSample = emb.sample(withReplacement = false, math.min(1.0, 8000.0 / nVec), 42L)
    AnnIndexStore.build(trainSample, annDir, k = nlist, index = Some(emb))
    def time[A](l: String, n: Int)(b: => A): Unit = {
      val t0 = System.nanoTime(); (1 to n).foreach(_ => b)
      println(f"#COST# $l ${(System.nanoTime() - t0) / 1e9 / n}%.3f s/call (x$n)")
    }
    // warm
    val q0 = emb.filter(col("vec_id") < 8).select(col("vec_id").as("qid"), col("embedding").as("qe"))
    AnnIndexStore.topK(s, annDir, AnnIndexStore.open(annDir), q0, 5, 5).count()
    time("open", 20)(AnnIndexStore.open(annDir))
    val m = AnnIndexStore.open(annDir)
    time("centsLit_build", 20) {
      val ordered = m.centroids.sortBy(_._1)
      typedLit(ordered.map(_._2.toSeq))
    }
    time("assign_plan", 10) {
      SimilarityOps.assignNearest(q0, m.centroids, "qe", "cell", 5).queryExecution.executedPlan
    }
    time("topk_full", 5) {
      AnnIndexStore.topK(s, annDir, m, q0, 5, 5).count()
    }
    time("topk_incl_open", 5) {
      AnnIndexStore.topK(s, annDir, AnnIndexStore.open(annDir), q0, 5, 5).count()
    }
    // the round-16 memoized serve path: pointer-prefix staleness probe
    // + per-(session, dir, epoch) manifest/literal reuse
    time("epoch_probe", 100) {
      graft.ManifestIo.pointerEpoch(java.nio.file.Paths.get(annDir))
    }
    time("open_cached", 20)(AnnIndexStore.openCached(s, annDir))
    time("topk_incl_open_cached", 5) {
      AnnIndexStore.topK(s, annDir, AnnIndexStore.openCached(s, annDir), q0, 5, 5).count()
    }
    graft.Fs.deleteRecursively(new java.io.File(annDir))
    s.stop()
  }
}
