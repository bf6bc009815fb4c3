package graft.ops

/** Round-17 diagnosis probe: time s_ann_lsh's sub-stages separately
  * (band-key projection, bucket join+dedup, brute-force side, full
  * witness) so the optimization targets the measured cost, not the
  * guessed one. Run: tools/run_main.sh -t graft.ops.LshProbe */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    def time(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        mk.write.mode("overwrite").format("noop").save()
        println(f"#LSH# $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val e = Tables.embeddings(spark, sf)
    val planes = SimilarityOps.lshPlanes(
      SimilarityOps.LshBands * SimilarityOps.LshRowsPerBand)
    val c0 = SimilarityOps.candSide(e)
    val q0 = SimilarityOps.querySide(e)
    time("bandkeys_cand")(SimilarityOps.lshBandKeys(
      c0.withColumn("cn", sqrt(graft.functions.VectorFunctions.normSq(col("ce")))), "ce", planes))
    time("lsh_topk")(SimilarityOps.lshTopK(c0, q0, 5))
    time("brute_force")(SimilarityOps.bruteForceTopK(q0, c0, 5))
    time("full_witness")(SparkEntry_lsh(spark, sf))
    spark.stop()
  }
  private def SparkEntry_lsh(s: org.apache.spark.sql.SparkSession, sf: String) =
    graft.SparkEntry.queries("s_ann_lsh")(s, sf)
}
