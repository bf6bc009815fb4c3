package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 probe: which term of q_approx_percentile owns the time —
  * the t-digest (percentile_approx, accuracy 10⁴) or the exact
  * percentile's full-buffer aggregate? */
object PctlPhaseProbe {
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
      println(f"#PCTL# $l ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // bit-identity of the rewritten exact side across all three SFs
    for (tier <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val li = Tables.lineitem(s, tier)
        .withColumn("price_cents", round(col("l_extendedprice") * 100).cast("long"))
      val old = li.agg(percentile(col("price_cents"),
        array(lit(0.5), lit(0.9), lit(0.99))).as("e")).head.getSeq[Double](0)
      val row = RelationalQueries.queries("q_approx_percentile")(s, tier).head()
      val oldRow = {
        val ap = li.agg(percentile_approx(col("price_cents"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"))
          .head.getSeq[Long](0).map(_.toDouble)
        (math.abs(ap(0) - old(0)) <= 0.01 * old(0),
         math.abs(ap(1) - old(1)) <= 0.01 * old(1),
         math.abs(ap(2) - old(2)) <= 0.01 * old(2))
      }
      println(s"#EXACT# $tier old=$old newflags=(${row.getBoolean(1)},${row.getBoolean(2)},${row.getBoolean(3)}) oldflags=$oldRow match=${(row.getBoolean(1), row.getBoolean(2), row.getBoolean(3)) == oldRow}")
    }
    (1 to 3).foreach { rep =>
      println(s"== rep $rep ==")
      val li = Tables.lineitem(s, sf)
        .withColumn("price_cents", round(col("l_extendedprice") * 100).cast("long"))
      time("scan_only")(noop(li.select(col("price_cents"))))
      time("approx_only")(noop(li.agg(
        percentile_approx(col("price_cents"),
          array(lit(0.5), lit(0.9), lit(0.99)), lit(10000)).as("ap"))))
      time("exact_only")(noop(li.agg(
        percentile(col("price_cents"),
          array(lit(0.5), lit(0.9), lit(0.99))).as("e"))))
      time("count_only")(noop(li.agg(count(lit(1)).as("n"))))
      time("full_query")(noop(RelationalQueries.queries("q_approx_percentile")(s, sf)))
      time("distinct_count")(println("  ndistinct=" +
        li.select(col("price_cents")).distinct().count()))
      time("exact_hist") {
        val hist = li.groupBy(col("price_cents")).agg(count(lit(1)).as("freq"))
        noop(hist.agg(percentile(col("price_cents"),
          array(lit(0.5), lit(0.9), lit(0.99)), col("freq")).as("e")))
      }
      if (rep == 1) {
        val e1 = li.agg(percentile(col("price_cents"),
          array(lit(0.5), lit(0.9), lit(0.99))).as("e")).head.getSeq[Double](0)
        val hist = li.groupBy(col("price_cents")).agg(count(lit(1)).as("freq"))
        val e2 = hist.agg(percentile(col("price_cents"),
          array(lit(0.5), lit(0.9), lit(0.99)), col("freq")).as("e")).head.getSeq[Double](0)
        println(s"  exact=$e1 hist=$e2 equal=${e1 == e2}")
      }
    }
    s.stop()
  }
}
