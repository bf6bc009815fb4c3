package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalOpsSpec extends AnyFunSuite {
  lazy val spark = graft.SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("media table: one binary payload per doc, byte length == n_chars (ascii)") {
    val m = MultimodalOps.mediaTable(spark, sf)
    assert(m.schema("payload").dataType.typeName == "binary")
    val joined = m.join(Tables.documents(spark, sf), "doc_id")
      .filter(length(col("payload")) =!= col("n_chars"))
    assert(joined.count() == 0)
  }

  test("decode pipeline is deterministic and covers every record") {
    val a = MultimodalOps.mm_decode_stub(spark, sf).collect()
    val b = MultimodalOps.mm_decode_stub(spark, sf).collect()
    assert(a.toSeq == b.toSeq)
    assert(a.length == Tables.documents(spark, sf).count())
    a.foreach { r =>
      assert(r.getInt(1) >= 16 && r.getInt(1) <= 1024) // width
      assert(r.getInt(2) >= 16 && r.getInt(2) <= 1024) // height
      assert(r.getInt(3) >= 1 && r.getInt(3) <= 8)     // frames
      assert(r.getLong(4) > 0)                         // n_bytes
    }
  }

  test("batching does not change results (batch boundary invariance)") {
    val m = MultimodalOps.mediaTable(spark, sf)
    val big = MultimodalOps.decodeFeatures(m, batchSize = 1000).collect().sortBy(_.doc_id)
    val tiny = MultimodalOps.decodeFeatures(m, batchSize = 3).collect().sortBy(_.doc_id)
    assert(big.toSeq == tiny.toSeq)
  }

  test("fakeDecode is pure and stable on known bytes") {
    val once = MultimodalOps.fakeDecode("hello world".getBytes("UTF-8"))
    val twice = MultimodalOps.fakeDecode("hello world".getBytes("UTF-8"))
    assert(once == twice)
  }
}
