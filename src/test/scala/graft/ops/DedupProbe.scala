package graft.ops

/** Round-17 diagnosis probe: time d_ngram_jaccard's sub-stages (the
  * df-capped inverted index is also the candidate source for
  * d_containment / d_dedup_incremental / d_dedup_simhash's truth
  * side) so the family optimization targets the measured cost.
  * Run: tools/run_main.sh -t graft.ops.DedupProbe */
object DedupProbe {
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
        println(f"#DDP# $name run$i ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val docs = Tables.documents(spark, sf)
    time("shingle_index")(DedupOps.shingleIndex(docs))
    time("df_keep") {
      DedupOps.shingleIndex(docs).groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 10).select("s")
    }
    time("capped_index") {
      val all = DedupOps.shingleIndex(docs)
      val keep = all.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 10).select("s")
      all.join(keep, "s").select("doc_id", "s")
    }
    time("selfjoin_pairs") {
      val all = DedupOps.shingleIndex(docs)
      val keep = all.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 10).select("s")
      val sh = all.join(keep, "s").select("doc_id", "s")
      sh.as("a").join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("c"))
    }
    time("selfjoin_pairs_v2") {
      val rep = DedupOps.shingleIndex(docs).repartition(col("s"))
      val keep = rep.groupBy("s").agg(count(lit(1)).as("df"))
        .filter(col("df") <= 10).select("s")
      val sh = rep.join(keep.hint("shuffle_hash"), "s").select("doc_id", "s")
      sh.as("a").join(sh.as("b").hint("shuffle_hash"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("c"))
    }
    time("simhash_fps")(DedupOps.simhashFingerprints(docs))
    time("simhash_pairs")(DedupOps.simhashPairs(docs))
    time("full_ngram_jaccard")(graft.SparkEntry.queries("d_ngram_jaccard")(spark, sf))
    time("full_simhash")(graft.SparkEntry.queries("d_dedup_simhash")(spark, sf))
    time("full_fuzzy_join")(graft.SparkEntry.queries("d_fuzzy_join")(spark, sf))
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries("d_fuzzy_join")(spark, sf)
      df.queryExecution.executedPlan
      val t1 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime()
      println(f"#DDP# fuzzy_split run$i plan=${(t1 - t0) / 1e9}%.3f exec=${(t2 - t1) / 1e9}%.3f s")
    }
    // how big is the candidate space really?
    locally {
      val sup = Tables.supplier(spark, sf)
        .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"))
      println(s"#DDP# suppliers=${sup.count()}")
      val nameLen = sup.select(length(col("s_name")).as("l"))
        .groupBy("l").count().collect().toSeq
      println(s"#DDP# name_lengths=$nameLen")
    }
    spark.stop()
  }
}
