package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each call is a fresh lazy scan — Catalyst prunes columns and pushes
  * filters per consuming query, so sharing a cached DataFrame here would
  * only hurt (it would pin the full schema in memory and defeat
  * per-query column pruning at 100 TB).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's TimestampType
    * (micros) cannot represent; with
    * `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as LongType
    * nanos, which we floor-div to micros (integer div — a double div
    * would lose precision at 1e18). DuckDB truncates ns→µs the same
    * way, so oracle compares stay exact. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Unique on-disk tag for a write-once derived layout (bucketed /
    * partitioned / text copies of a fixture dir). Two parts, both
    * load-bearing: a SHA-256 prefix of the FULL source path (stable,
    * debuggable, and collision-free where `String.hashCode`'s 32 bits
    * are not — two fixture dirs with colliding hashCodes would
    * silently share one layout), plus a fresh per-call nonce so each
    * (session, dir) memoization entry gets its own directory — a
    * second SparkSession preparing the same dir must never
    * mode-overwrite files a first session's memoized path may still
    * be reading. Hex + underscores only, so the tag is also a valid
    * catalog table-name suffix. */
  private[graft] def layoutTag(d: String): String = {
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(d.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
    val nonce = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    s"${sha}_$nonce"
  }
}
