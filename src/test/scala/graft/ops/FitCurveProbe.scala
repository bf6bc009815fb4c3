package graft.ops

import org.apache.spark.sql.functions._

/** Round-16 verdict watch item: the k-means fit is the dominant ANN
  * build term (~18 s single-task at k=782) and `sizedNlist` grows k
  * with the corpus up to 2¹⁶ — nobody had measured or projected a
  * large-k fit. This probe measures the fit wall-clock at the
  * sizedNlist schedule's shape (n = fitCap-scale sample, k sweeping
  * upward) so SCALING.md can carry a measured fit-vs-k curve and a
  * projection to the cap instead of a guess. The Lloyd cost model is
  * t_iter ∝ n·k·dim, so with n and dim pinned the curve should be
  * ~linear in k — the probe verifies the exponent and the constant.
  *
  * Run: sbt 'Test/runMain graft.ops.FitCurveProbe [n] [k ...]'
  * Defaults n=262144, ks=512 1024 2048 4096. ks above HierFitK run
  * the two-level fit — the same dispatch production takes.
  */
object FitCurveProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(262144)
    val ksArg = args.drop(1).flatMap(_.toIntOption).toSeq
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dim = 16 // the fixture embedding width
    // deterministic synthetic vectors, fixture-shaped (unit-ish scale)
    val e = s.range(0, n.toLong, 1, 32).select(
      transform(sequence(lit(0), lit(dim - 1)),
        j => sin(col("id") * (j + lit(1.7)) * 0.37)).cast("array<double>")
        .as("embedding"))
      .cache()
    e.count()
    val ks = if (ksArg.nonEmpty) ksArg else Seq(512, 1024, 2048, 4096)
    for (k <- ks) {
      val t0 = System.nanoTime()
      val cents = SimilarityOps.kmeansCentroids(e, k, seed = 42L + k)
      val sec = (System.nanoTime() - t0) / 1e9
      val mode = if (k > SimilarityOps.HierFitK) "two-level" else "flat"
      println(f"#FIT# n=$n k=$k dim=$dim mode=$mode -> ${sec}%8.2f s  (cents=${cents.size})")
    }
    s.stop()
  }
}
