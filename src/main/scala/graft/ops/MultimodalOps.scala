package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with
  * typed metadata, and a batched per-partition feature-extraction pass
  * — the Scala/Dataset equivalent of a `mapInPandas` decode stage.
  *
  * The container has no image/audio codecs, so the DECODE ITSELF is a
  * clearly-marked deterministic fake ([[fakeDecode]]); everything
  * around it — binary column, typed metadata struct, case-class
  * encoders, fixed-size batching inside `mapPartitions`, output schema
  * — is the real 100 TB plumbing a vectorized decoder would plug into
  * (swap [[fakeDecode]] for the codec call; the batch shape already
  * amortizes per-batch model/codec setup the way Arrow batches do).
  *
  * The payloads are derived deterministically from `documents.text`
  * (UTF-8 bytes posing as an encoded frame), so results are
  * reproducible and [[mm_binary_meta]] is DuckDB-oracle-checkable.
  */
object MultimodalOps {

  type Q = (SparkSession, String) => DataFrame

  case class MediaRecord(doc_id: Long, mime: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, width: Int, height: Int,
                           n_frames: Int, n_bytes: Long)

  /** documents → opaque media table: (doc_id, mime, payload binary). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        lit("image/x-fake").as("mime"),
        encode(col("text"), "UTF-8").as("payload"))

  /** STUB — stands in for a real image decode (no codec libs in this
    * environment). Deterministic in the payload bytes: "dimensions"
    * come from a byte checksum, "frames" from the length. Replace with
    * the real decoder at the call site in [[decodeFeatures]]. */
  private[ops] def fakeDecode(payload: Array[Byte]): (Int, Int, Int) = {
    var cs = 0
    var i = 0
    while (i < payload.length) { cs = (cs * 31 + (payload(i) & 0xFF)) & 0x7FFFFFFF; i += 1 }
    val width = 16 * (1 + cs % 64)            // "decoded" width: 16..1024
    val height = 16 * (1 + (cs / 64) % 64)    // "decoded" height
    val frames = 1 + payload.length % 8       // "frame count"
    (width, height, frames)
  }

  /** Batched per-partition decode: the mapInPandas shape. Batches of
    * `batchSize` amortize codec/model setup; memory is bounded by one
    * batch of payloads per task, never the partition. */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("mime"), col("payload")).as[MediaRecord]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch setup would go here (decoder init, model load)
          batch.iterator.map { r =>
            val (w, h, f) = fakeDecode(r.payload)
            MediaFeatures(r.doc_id, w, h, f, r.payload.length.toLong)
          }
        }
      }
  }

  /** Binary metadata pass — size + content hash straight off the
    * binary column (codegen'd, no stub involved), oracle-checked. */
  val mm_binary_meta: Q = (s, d) =>
    mediaTable(s, d)
      .select(col("doc_id"), col("mime"),
        length(col("payload")).as("n_bytes"),
        substring(sha2(col("payload"), 256), 1, 16).as("hash16"))
      .orderBy(col("doc_id"))

  /** The batched decode pipeline end-to-end (stubbed decode → typed
    * features). Rows-only check; determinism + batch shape are
    * asserted in MultimodalOpsSpec. */
  val mm_decode_stub: Q = (s, d) =>
    decodeFeatures(mediaTable(s, d)).toDF()
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------ registry

  val queries: Map[String, Q] = Map(
    "mm_binary_meta" -> mm_binary_meta,
    "mm_decode_stub" -> mm_decode_stub,
  )

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, 'image/x-fake' AS mime,
        |  CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        |  substr(sha256(text), 1, 16) AS hash16
        |FROM documents ORDER BY doc_id""".stripMargin,
    // mm_decode_stub: decode is a documented stub — no SQL equivalent.
  )
}
