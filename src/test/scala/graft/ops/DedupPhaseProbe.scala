package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Round-16 optimization probe: stage costs of the MinHash-LSH dedup
  * pipeline (shingle → signature → candidates → verify → CC) at sf0.1,
  * so d_dedup_apply / d_dedup_clusters optimization aims at the
  * measured term. Run: tools/run_main.sh -t graft.ops.DedupPhaseProbe
  */
object DedupPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    def time[A](l: String)(b: => A): A = {
      val t0 = System.nanoTime(); val r = b
      println(f"#DPHASE# $l ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    (1 to 2).foreach { rep =>
      println(s"== rep $rep ==")
      val docs = Tables.documents(s, sf)
      time("docs_count")(println("  docs=" + docs.count()))
      time("shingled")(noop(DedupOps.shingled(docs)))
      time("signatures")(noop(DedupOps.minhashSignatures(docs)))
      val cands = DedupOps.lshCandidates(DedupOps.minhashSignatures(docs))
      time("candidates")(noop(cands))
      val pairs = time("verify_pairs") {
        val p = DedupOps.exactJaccard(cands, DedupOps.shingled(docs))
        noop(p); p
      }
      time("pairs_count")(println("  pairs=" + pairs.count()))
      time("cc") {
        val (labels, rounds) = DedupOps.connectedComponentsWithRounds(
          pairs.select(col("doc_a"), col("doc_b")))
        noop(labels)
        println("  rounds=" + rounds)
      }
    }
    s.stop()
  }
}
