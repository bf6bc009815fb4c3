package graft.streaming

import java.util.UUID
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Structured-streaming slice (SURVEY.md §2 Part B row 11, §7 M4):
  * the `events` table replayed through a file-source stream with
  * `Trigger.AvailableNow`, windowed event-time aggregations, and a
  * 1-hour watermark.
  *
  * Determinism contract with the DuckDB oracles: `AvailableNow` drains
  * the source, then the final (empty) batch advances the event-time
  * watermark to `max(ts) - 1 hour` and append mode flushes every
  * window/session whose END is at or below that watermark. The batch
  * oracles reproduce exactly that cutoff (`WHERE end <= max(ts) -
  * INTERVAL 1 HOUR`), so the streaming results hash-match a pure-SQL
  * answer — the watermark's late-data-drop semantics are part of the
  * checked surface, not just declared.
  *
  * Scale notes: event-time windowed aggregation shuffles once on
  * (window, key); session windows shuffle on user_id and merge ranges
  * in the state store. The watermark bounds state: at 100 TB/day the
  * state store holds only windows newer than max-event-time − 1h.
  *
  * `ts` in the fixture parquet is TIMESTAMP(NANOS); sessions set
  * `spark.sql.legacy.parquet.nanosAsLong=true`, so the stream schema
  * declares LongType nanos and converts to micros exactly like
  * `ops.Tables.events`.
  */
object StreamingOps {

  type Q = (SparkSession, String) => DataFrame

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** File-source stream over the events parquet (glob keeps the file
    * source happy with a single-file "directory"). */
  private def eventStream(s: SparkSession, d: String): DataFrame =
    s.readStream.schema(eventsSchema).parquet(s"$d/events*.parquet")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Run a streaming DataFrame to completion on AvailableNow into a
    * uniquely-named memory sink; return the materialized result as a
    * local relation. The memory sink is inherently driver-resident —
    * fine for this deterministic test/verify harness, NOT a production
    * sink — but it must not LEAK across invocations: bench, verify and
    * tests share one session, so the sink table is dropped and the
    * explicit checkpoint dir deleted before returning (previously every
    * call left a full materialized copy registered forever). */
  private def drain(s: SparkSession, out: DataFrame, mode: String): DataFrame = {
    val name = "graft_stream_" + UUID.randomUUID().toString.replace("-", "")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_")
    val q = out.writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt.toString)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val result = s.table(name)
    val rows = result.collect()
    val schema = result.schema
    s.catalog.dropTempView(name)
    deleteRecursively(ckpt.toFile)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(deleteRecursively)
    f.delete(): Unit
  }

  /** Tumbling 1-day windows per event_type, append mode: only windows
    * closed by the watermark are emitted. */
  val st_tumbling: Q = (s, d) => {
    val agg = eventStream(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n"), col("value_cents"))
    drain(s, agg, "append").orderBy(col("window_start"), col("event_type"))
  }

  /** Sliding 2-day windows advancing 1 day, complete mode: every
    * window emitted each trigger (no watermark cutoff). */
  val st_sliding: Q = (s, d) => {
    val agg = eventStream(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "2 days", "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n"))
    drain(s, agg, "complete").orderBy(col("window_start"), col("event_type"))
  }

  /** Session windows (30-minute gap) per user, append mode with the
    * same watermark cutoff. */
  val st_session: Q = (s, d) => {
    val agg = eventStream(s, d)
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("user_id"), col("n"))
    drain(s, agg, "append").orderBy(col("user_id"), col("session_start"))
  }

  /** Streaming dedup — the streaming face of the dedup family: first
    * occurrence per (day, user_id, event_type) via
    * `dropDuplicatesWithinWatermark`, with dedup state EXPIRING as the
    * event-time watermark passes (at 100 TB/day the state store holds
    * only keys newer than max-event-time − 1h, vs unbounded state for
    * plain `dropDuplicates`). The emitted projection is the key itself,
    * so the result is independent of which physical row arrived first —
    * deterministic, and batch-expressible as SELECT DISTINCT. */
  val st_dedup: Q = (s, d) => {
    val dedup = eventStream(s, d)
      .withWatermark("ts", "1 hour")
      .select(col("ts"), col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .dropDuplicatesWithinWatermark("day", "user_id", "event_type")
      .select(col("day"), col("user_id"), col("event_type"))
    drain(s, dedup, "append").orderBy(col("day"), col("user_id"), col("event_type"))
  }

  // ------------------------------------------------------------ registry

  val queries: Map[String, Q] = Map(
    "st_tumbling" -> st_tumbling,
    "st_sliding" -> st_sliding,
    "st_session" -> st_session,
    "st_dedup" -> st_dedup,
  )

  val oracles: Map[String, String] = Map(
    "st_tumbling" ->
      """WITH m AS (SELECT max(ts) AS mx FROM events),
        |agg AS (
        |  SELECT date_trunc('day', ts) AS window_start,
        |    date_trunc('day', ts) + INTERVAL 1 DAY AS window_end,
        |    event_type, COUNT(1) AS n,
        |    CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |  FROM events GROUP BY 1, 2, 3)
        |SELECT window_start, window_end, event_type, n, value_cents
        |FROM agg, m WHERE window_end <= mx - INTERVAL 1 HOUR
        |ORDER BY window_start, event_type""".stripMargin,
    "st_sliding" ->
      """WITH w AS (
        |  SELECT date_trunc('day', ts) - INTERVAL (k) DAY AS window_start, event_type
        |  FROM events, unnest([0, 1]) AS t(k))
        |SELECT window_start, window_start + INTERVAL 2 DAY AS window_end,
        |  event_type, COUNT(1) AS n
        |FROM w GROUP BY 1, 2, 3 ORDER BY window_start, event_type""".stripMargin,
    "st_dedup" ->
      """SELECT DISTINCT date_trunc('day', ts) AS day, user_id, event_type
        |FROM events ORDER BY day, user_id, event_type""".stripMargin,
    "st_session" ->
      """WITH m AS (SELECT max(ts) AS mx FROM events),
        |g AS (SELECT user_id, ts,
        |        CASE WHEN lag(ts) OVER w IS NULL
        |               OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
        |             THEN 1 ELSE 0 END AS brk
        |      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, ts,
        |        SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |                       ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g),
        |agg AS (SELECT user_id, MIN(ts) AS session_start,
        |          MAX(ts) + INTERVAL 30 MINUTE AS session_end,
        |          COUNT(1) AS n
        |        FROM s GROUP BY user_id, sid)
        |SELECT session_start, session_end, user_id, n
        |FROM agg, m WHERE session_end <= mx - INTERVAL 1 HOUR
        |ORDER BY user_id, session_start""".stripMargin,
  )
}
