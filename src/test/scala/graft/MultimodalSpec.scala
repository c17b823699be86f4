package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (0L, "abcd", 4L), (1L, "efgh ijkl mnop qrst", 19L), (2L, "x", 1L)
  ).toDF("doc_id", "text", "n_chars")

  test("documentsAsMedia assigns types and metadata deterministically") {
    val m = Multimodal.documentsAsMedia(docs).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    m(0L) shouldBe "image"
    m(1L) shouldBe "audio"
    m(2L) shouldBe "video"
  }

  test("extractFeatures computes byte length and checksum per row") {
    val feats = Multimodal.extractFeatures(spark, Multimodal.documentsAsMedia(docs))
      .collect().map(f => f.media_id -> f).toMap
    feats(0L).byte_len shouldBe 4
    feats(0L).checksum shouldBe "abcd".getBytes("UTF-8").map(_ & 0xff).sum
    feats(0L).feature.sum shouldBe 4.0 // histogram mass = byte count
  }

  test("sampleFrames emits stride-spaced frames") {
    val media = Multimodal.documentsAsMedia(docs)
    val frames = Multimodal.sampleFrames(media, frameSize = 4, stride = 2)
    val f1 = frames.where($"media_id" === 1).orderBy("frame_no").collect()
    // 19 bytes → 4 blocks → positions 0,2 sampled
    f1.length shouldBe 2
    new String(f1(0).getAs[Array[Byte]]("frame_bytes"), "UTF-8") shouldBe "efgh"
  }

  test("resizePayload truncates to budget") {
    val out = Multimodal.resizePayload(Multimodal.documentsAsMedia(docs), 2)
    out.select(max($"resized_len")).collect()(0).getInt(0) shouldBe 2
  }
}
