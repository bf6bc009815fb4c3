package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GraftSparkExtensions, RangeJoinBinning}

/** The binned-range-join optimizer rule: plan shape (BNLJ → equi join
  * on bins), result equality with the rule disabled, the no-fire
  * guards, floor-binning on negatives, and both registration paths. */
class RangeJoinBinningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  /** Fresh clone with the rule installed — same installation the
    * registered query performs, locally owned so guard tests can vary
    * the confs without touching the query's memoized clone. */
  private def ruleSession(width: Long, force: Boolean): SparkSession = {
    val c = spark.newSession()
    val cc = c.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cc.experimental.extraOptimizations =
      cc.experimental.extraOptimizations :+ RangeJoinBinning
    c.conf.set(RangeJoinBinning.WidthKey, width.toString)
    c.conf.set(RangeJoinBinning.ForceKey, force.toString)
    c
  }

  /** The witness query's dataflow on an arbitrary session. */
  private def bandJoin(s: SparkSession): DataFrame = {
    val ev = ops.Tables.events(s, sf)
    val windows = ev
      .filter(col("event_type") === "error" && col("event_id") % 37 === 0)
      .select(col("event_id").as("window_id"), col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("hi"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
    clicks.join(windows, col("click_ts") >= col("lo") && col("click_ts") <= col("hi"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_clicks"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("window_id"))
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Long)] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("band join rewrites to an equi join on bins and matches the rule-off result") {
    val on = ops.RelationalQueries.q_range_bin_join(spark, sf)
    val onPlan = on.queryExecution.executedPlan.toString
    assert(onPlan.contains("__graft_bin"), "bin key absent — rule did not fire")
    assert(!onPlan.contains("BroadcastNestedLoopJoin") && !onPlan.contains("CartesianProduct"),
      "rewritten plan still nested-loops")
    // rule-off on the plain session: the shape the rule exists to kill
    val off = bandJoin(spark)
    val offPlan = off.queryExecution.executedPlan.toString
    assert(offPlan.contains("BroadcastNestedLoopJoin"),
      "rule-off contrast plan is not a BNLJ — witness vacuous")
    assert(rows(on) == rows(off), "rewrite changed the answer")
    assert(rows(on).nonEmpty)
  }

  test("q_range_bin_date: the date-band query rewrites to an equi join and matches rule-off") {
    val on = ops.RelationalQueries.q_range_bin_date(spark, sf)
    val onPlan = on.queryExecution.executedPlan.toString
    assert(onPlan.contains("__graft_bin"), "bin key absent — rule did not fire on dates")
    assert(!onPlan.contains("BroadcastNestedLoopJoin") && !onPlan.contains("CartesianProduct"),
      "rewritten date-band plan still nested-loops")
    // rule-off contrast on the plain session
    val win = ops.Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 1009 === 0)
      .select(col("o_orderkey").as("window_id"),
        col("o_orderdate").cast("date").as("lo"),
        date_add(col("o_orderdate").cast("date"), 6).as("hi"))
    val ships = ops.Tables.lineitem(spark, sf)
      .select(col("l_shipdate").cast("date").as("ship_d"), col("l_quantity"))
    val off = ships.join(win, col("ship_d") >= col("lo") && col("ship_d") <= col("hi"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_ship"),
        sum(round(col("l_quantity")).cast("long")).as("qty"))
      .orderBy(col("window_id"))
    assert(rows(on) == rows(off), "date-band rewrite changed the answer")
    assert(rows(on).nonEmpty)
  }

  test("no-fire guards: equi conjunct present, width unset, size guard without force") {
    // equi key present → Spark hash-joins already; the rule must stay out
    val s1 = ruleSession(1800, force = true)
    val ev = ops.Tables.events(s1, sf)
    val l = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("a_ts"))
    val r = ev.filter(col("event_type") === "error")
      .select(col("user_id").as("uid"), col("ts").as("lo"),
        (col("ts") + expr("INTERVAL 30 MINUTES")).as("hi"))
    val equiBand = l.join(r, col("user_id") === col("uid") &&
      col("a_ts") >= col("lo") && col("a_ts") <= col("hi"))
    assert(!equiBand.queryExecution.optimizedPlan.toString.contains("__graft_bin"),
      "rule fired despite an extractable equi key")
    // width unset → no-op even with force
    val s2 = spark.newSession()
    val cc2 = s2.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    cc2.experimental.extraOptimizations =
      cc2.experimental.extraOptimizations :+ RangeJoinBinning
    s2.conf.set(RangeJoinBinning.ForceKey, "true")
    assert(!bandJoin(s2).queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    // fixture sides sit under the broadcast threshold → without force
    // the size guard keeps the rule out (BNLJ is fine when one side
    // broadcasts — the rule exists for two big sides)
    val s3 = ruleSession(1800, force = false)
    assert(!bandJoin(s3).queryExecution.optimizedPlan.toString.contains("__graft_bin"),
      "size guard ignored: both sides are broadcastable here")
  }

  test("floor binning is exact on negative values and multi-bin intervals") {
    val s = ruleSession(10, force = true)
    import s.implicits._
    // points straddle zero; intervals span 3-5 bins of width 10
    val pts = (-50L to 50L).map(v => (v, s"p$v")).toDF("p", "pid")
    val ivs = Seq((-45L, -12L, "a"), (-9L, 23L, "b"), (5L, 40L, "c"), (-30L, -30L, "d"))
      .toDF("lo", "hi", "iid")
    val got = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .groupBy(col("iid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("a") == 34L && got("b") == 33L && got("c") == 36L && got("d") == 1L)
    val plan = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__graft_bin"), "rule did not fire on the negative-range fixture")
  }

  test("date-typed band joins bin via unix_date (Cast date→long is invalid in Spark 4)") {
    val s = ruleSession(7, force = true) // width = 7 DAYS for dates
    import s.implicits._
    val pts = Seq("2024-01-01", "2024-01-15", "2024-03-01").toDF("d")
      .select(col("d").cast("date").as("p"))
    val ivs = Seq(("2023-12-25", "2024-01-20", "a"), ("2024-02-20", "2024-02-28", "b"))
      .toDF("slo", "shi", "iid")
      .select(col("slo").cast("date").as("lo"), col("shi").cast("date").as("hi"), col("iid"))
    val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
    // the rewrite must FIRE (dates are binnable) and the plan must
    // survive validation — the pre-fix failure mode was an unresolvable
    // Cast(date, long) inside the optimized plan
    assert(joined.queryExecution.optimizedPlan.toString.contains("__graft_bin"),
      "rule did not fire on a date-typed band")
    val got = joined.select(col("p").cast("string"), col("iid")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("2024-01-01", "a"), ("2024-01-15", "a")), s"date band rows drifted: $got")
  }

  test("strict bounds keep their strictness through the residual") {
    val s = ruleSession(10, force = true)
    import s.implicits._
    val pts = Seq(10L, 20L, 30L).toDF("p")
    val ivs = Seq((10L, 30L, "halfopen")).toDF("lo", "hi", "iid")
    val got = pts.join(ivs, col("p") > col("lo") && col("p") < col("hi"))
      .select(col("p")).as[Long].collect().sorted.toSeq
    assert(got == Seq(20L), s"strict band returned $got")
  }

  test("inverted and null-bounded intervals match nothing instead of throwing") {
    val s = ruleSession(10, force = true)
    import s.implicits._
    val pts = Seq(10L, 20L).toDF("p")
    val ivs = Seq((Some(30L), Some(5L), "inverted"), (None, Some(25L), "nulllo"),
        (Some(5L), None, "nullhi"), (Some(15L), Some(25L), "ok"))
      .toDF("lo", "hi", "iid")
    val joined = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
    assert(joined.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    val got = joined.select(col("iid"), col("p")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("ok", 20L)), s"degenerate intervals leaked: $got")
  }

  test("outer joins: point-side-preserved rewrites fire and keep null rows; interval-side-preserved stays out") {
    val s = ruleSession(10, force = true)
    import s.implicits._
    val pts = Seq(Some(5L), Some(25L), Some(95L), None).zipWithIndex
      .map { case (v, i) => (i, v) }.toDF("pid", "p")
    val ivs = Seq((0L, 30L, "a"), (20L, 40L, "b")).toDF("lo", "hi", "iid")
    // LEFT OUTER, point side preserved: rewrite fires, unmatched points
    // (95 and the null) emit exactly one null row each
    val lo = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"), "left_outer")
    assert(lo.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    val got = lo.select(col("pid"), col("iid")).collect()
      .map(r => (r.getInt(0), Option(r.getString(1)))).toSet
    assert(got == Set((0, Some("a")), (1, Some("a")), (1, Some("b")),
      (2, None), (3, None)), s"outer rows drifted: $got")
    // LEFT OUTER with the INTERVAL side preserved: the rewrite would
    // emit one null row per bin for an unmatched interval — must not fire
    val lo2 = ivs.join(pts, col("p") >= col("lo") && col("p") <= col("hi"), "left_outer")
    assert(!lo2.queryExecution.optimizedPlan.toString.contains("__graft_bin"),
      "rule fired on a preserved interval side")
    // RIGHT OUTER mirror: point on the right (preserved) side → fires,
    // same row multiset as the vanilla plan
    val ro = ivs.join(pts, col("p") >= col("lo") && col("p") <= col("hi"), "right_outer")
    assert(ro.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
    val roRows = ro.select(col("pid"), col("iid")).collect()
      .map(r => (r.getInt(0), Option(r.getString(1)))).toSet
    assert(roRows == got)
  }

  test("property: rewrite preserves the exact pair set on random data") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val s = ruleSession(1, force = true) // width overridden per trial
    val ptSchema = StructType(Seq(StructField("pid", IntegerType, nullable = false),
      StructField("p", LongType, nullable = true)))
    val ivSchema = StructType(Seq(StructField("iid", IntegerType, nullable = false),
      StructField("lo", LongType, nullable = true),
      StructField("hi", LongType, nullable = true)))
    val genVal: Gen[java.lang.Long] =
      Gen.frequency(9 -> Gen.chooseNum(-200L, 200L).map(Long.box),
        1 -> Gen.const(null: java.lang.Long))
    // intervals include inverted (lo > hi), empty after strictness,
    // point-sized, multi-bin, and null-bounded — every degenerate shape
    val genIv: Gen[(java.lang.Long, java.lang.Long)] =
      for { a <- genVal; b <- genVal } yield (a, b)
    val trial = for {
      w <- Gen.oneOf(1L, 3L, 10L, 64L)
      outer <- Gen.oneOf(false, true)
      pts <- Gen.listOfN(60, genVal)
      ivs <- Gen.listOfN(25, genIv)
    } yield (w, outer, pts, ivs)
    val prop = Prop.forAllNoShrink(trial) { case (w, outer, pts, ivs) =>
      s.conf.set(RangeJoinBinning.WidthKey, w.toString)
      val joinType = if (outer) "left_outer" else "inner"
      def mk(sess: SparkSession) = {
        val p = sess.createDataFrame(
          java.util.Arrays.asList(pts.zipWithIndex.map { case (v, i) =>
            Row(i, v) }: _*), ptSchema)
        val iv = sess.createDataFrame(
          java.util.Arrays.asList(ivs.zipWithIndex.map { case ((a, b), i) =>
            Row(i, a, b) }: _*), ivSchema)
        p.join(iv, col("p") >= col("lo") && col("p") <= col("hi"), joinType)
          .select(col("pid"), col("iid"))
      }
      def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
        .map(r => (r.getInt(0), if (r.isNullAt(1)) -1 else r.getInt(1)))
        .groupBy(identity).view.mapValues(_.length).toMap // multiset
      val on = mk(s)
      val fired = on.queryExecution.optimizedPlan.toString.contains("__graft_bin")
      (fired: Prop) && (rows(on) == rows(mk(spark)): Prop)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }

  test("spark.sql.extensions registration path installs the same rule") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftSparkExtensions().apply(ext)
    val rules = org.apache.spark.sql.graftbridge.GraftColumnBridge
      .optimizerRules(ext, spark)
    assert(rules.contains(RangeJoinBinning),
      s"injected optimizer rules $rules do not include RangeJoinBinning")
  }
}
