package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions.{dot, normSq}

/** A/B parity check on the REAL tier data: the round-14 struct-literal
  * assignment formula vs the native NearestCentroids path, over the
  * actual ×R embeddings and the actual fitted centroids. Prints the
  * number of (vec, probe-cell) rows that differ. */
object AssignParityProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.flatMap(_.toIntOption).getOrElse(4)
    val nprobe = args.lift(1).flatMap(_.toIntOption).getOrElse(5)
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_scale_x$reps"
    val emb = s.read.parquet(s"$dir/embeddings.parquet")
    val nVec = emb.count()
    val nlist = AnnIndexStore.sizedNlist(nVec)
    val trainSample = emb.sample(withReplacement = false,
      math.min(1.0, 8000.0 / nVec), 42L)
    val cents = SimilarityOps.kmeansCentroids(trainSample, nlist)
    println(s"#PARITY# nVec=$nVec nlist=$nlist fitted=${cents.size}")

    // the round-14 struct-literal formulation, verbatim
    def oldAssign(vecs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val scored = array(cents.map { case (id, c) =>
        val c2 = c.map(x => x * x).sum
        struct(
          (col("_vn2") - lit(2.0) * dot(col("embedding"), typedLit(c.toSeq)) + lit(c2)).as("dist"),
          lit(id).as("cent_id"))
      }: _*)
      vecs.withColumn("_vn2", normSq(col("embedding")))
        .withColumn("cell",
          explode(transform(slice(array_sort(scored), 1, nprobe), x => x.getField("cent_id"))))
        .drop("_vn2")
    }
    val oldCells = oldAssign(emb).select("vec_id", "cell")
    val newCells = SimilarityOps.assignNearest(emb, cents, "embedding", "cell", nprobe)
      .select("vec_id", "cell")
    val onlyOld = oldCells.exceptAll(newCells).count()
    val onlyNew = newCells.exceptAll(oldCells).count()
    println(s"#PARITY# nprobe=$nprobe onlyOld=$onlyOld onlyNew=$onlyNew")
    s.stop()
  }
}
