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

  test("image headers parse real PNG/GIF/JPEG bytes, None for junk") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // PNG: signature + IHDR length + "IHDR" + w=640 h=480 (BE u32)
    val png = b(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13) ++ "IHDR".getBytes ++ b(0, 0, 2, 0x80, 0, 0, 1, 0xe0) ++ b(8, 6, 0, 0, 0)
    Multimodal.parseImageHeader(png) shouldBe
      Some(Multimodal.ImageHeader("png", 640, 480))
    // GIF89a: w=3 h=2 (LE u16)
    val gif = "GIF89a".getBytes ++ b(3, 0, 2, 0, 0, 0)
    Multimodal.parseImageHeader(gif) shouldBe
      Some(Multimodal.ImageHeader("gif", 3, 2))
    // JPEG: SOI, APP0 (16 bytes), SOF0 with h=2 w=3
    val jpeg = b(0xff, 0xd8, 0xff, 0xe0, 0, 16) ++ Array.fill[Byte](14)(0) ++
      b(0xff, 0xc0, 0, 17, 8, 0, 2, 0, 3) ++ Array.fill[Byte](10)(0)
    Multimodal.parseImageHeader(jpeg) shouldBe
      Some(Multimodal.ImageHeader("jpeg", 3, 2))
    // junk/truncated → None, never a guess
    Multimodal.parseImageHeader("not an image".getBytes) shouldBe None
    Multimodal.parseImageHeader(b(0xff, 0xd8, 0x00)) shouldBe None
    // adversarial prefixes that loose magic checks would misparse
    Multimodal.parseImageHeader("GIFs are fun to share".getBytes) shouldBe None
    Multimodal.parseImageHeader(
      b(0x89, 'P', 'N', 'G', 0, 0, 0, 0) ++ "NOPE".getBytes ++
        Array.fill[Byte](20)(7)) shouldBe None

    // distributed path: mixed payloads → typed rows with NULLs for junk
    val media = Seq((1L, png), (2L, gif), (3L, "junk".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.imageHeaders(spark, media).orderBy("media_id").collect()
    out(0).getString(1) shouldBe "png"
    out(0).getInt(2) shouldBe 640
    out(1).getString(1) shouldBe "gif"
    out(2).isNullAt(1) shouldBe true
  }

  test("WAV/RIFF header parsing: chunk walk, alignment, duration; junk rejected") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def le16(v: Int) = b(v & 0xff, (v >> 8) & 0xff)
    def le32(v: Int) = b(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    def fmtChunk(ch: Int, rate: Int, bits: Int): Array[Byte] =
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(ch) ++ le32(rate) ++
        le32(rate * ch * bits / 8) ++ le16(ch * bits / 8) ++ le16(bits)
    def wav(chunks: Array[Byte]*): Array[Byte] = {
      val body = "WAVE".getBytes ++ chunks.flatten
      "RIFF".getBytes ++ le32(body.length) ++ body
    }
    // canonical: fmt then data (16000 Hz mono 16-bit, 32000 bytes = 1 s)
    val mono = wav(fmtChunk(1, 16000, 16),
      "data".getBytes ++ le32(32000) ++ Array.fill[Byte](4)(0)) // truncated data ok
    Multimodal.parseWavHeader(mono) shouldBe
      Some(Multimodal.AudioHeader("wav", 1, 16000, 16, 32000L))
    // a LIST chunk with an ODD size (pad byte) before fmt still parses
    val listFirst = wav("LIST".getBytes ++ le32(5) ++ Array.fill[Byte](6)(0), // 5 + pad
      fmtChunk(2, 44100, 24), "data".getBytes ++ le32(1000))
    Multimodal.parseWavHeader(listFirst) shouldBe
      Some(Multimodal.AudioHeader("wav", 2, 44100, 24, 1000L))
    // junk and non-WAV RIFF rejected
    Multimodal.parseWavHeader("RIFFxxxxAVI ".getBytes) shouldBe None
    Multimodal.parseWavHeader("not audio".getBytes) shouldBe None

    // distributed path + duration arithmetic (32000 B / 32000 B/s = 1000 ms)
    val media = Seq((1L, mono), (2L, "junk".getBytes)).toDF("media_id", "payload")
    val rows = Multimodal.audioHeaders(spark, media).orderBy("media_id").collect()
    rows(0).getString(1) shouldBe "wav"
    rows(0).getInt(3) shouldBe 16000
    rows(0).getLong(5) shouldBe 1000L
    rows(1).isNullAt(1) shouldBe true
  }

  test("real pixel decode: a generated PNG raster yields exact dimensions and luma histogram") {
    // 4×2 PNG with known colors: 4 black, 2 white, 2 mid-gray (128)
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 4) img.setRGB(x, 0, 0x000000)          // luma 0   → bin 0
    img.setRGB(0, 1, 0xffffff); img.setRGB(1, 1, 0xffffff)   // luma 255 → bin 7
    img.setRGB(2, 1, 0x808080); img.setRGB(3, 1, 0x808080)   // luma 128 → bin 4
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val pf = Multimodal.decodePixels(png).get
    pf.width shouldBe 4
    pf.height shouldBe 2
    pf.lumaHist.toSeq shouldBe Seq(4.0, 0, 0, 0, 2.0, 0, 0, 2.0)
    // non-images refuse, never guess
    Multimodal.decodePixels("not an image".getBytes) shouldBe None
  }

  test("real PCM decode: peak and RMS from hand-built 16-bit samples; fallback for junk") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def le16(v: Int) = b(v & 0xff, (v >> 8) & 0xff)
    def le32(v: Int) = b(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    // mono 16-bit PCM, 4 samples: 0, +16384, -16384, -32768
    val samples = le16(0) ++ le16(16384) ++ le16(-16384 & 0xffff) ++ le16(-32768 & 0xffff)
    val wav = "RIFF".getBytes ++ le32(4 + 24 + 8 + samples.length) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(16000) ++
      le32(32000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(samples.length) ++ samples
    val st = Multimodal.decodeWavSamples(wav).get
    st.nSamples shouldBe 4L
    st.peak shouldBe 1.0 // -32768/32768
    st.rms shouldBe math.sqrt((0.0 + 0.25 + 0.25 + 1.0) / 4) +- 1e-12
    Multimodal.decodeWavSamples("junk".getBytes) shouldBe None
    // A-law (format 6) is 8-bit but COMPANDED: decoding it as linear PCM
    // would return confidently wrong stats — the contract is None
    val alaw = "RIFF".getBytes ++ le32(4 + 24 + 8 + 4) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(6) ++ le16(1) ++ le32(8000) ++
      le32(8000) ++ le16(1) ++ le16(8) ++
      "data".getBytes ++ le32(4) ++ Array[Byte](1, 2, 3, 4)
    Multimodal.decodeWavSamples(alaw) shouldBe None
  }

  test("extractFeatures uses real decodes where a JDK codec exists, byte fallback otherwise") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    def le16(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val wav = "RIFF".getBytes ++ le32(4 + 24 + 8 + 2) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(16000) ++
      le32(32000) ++ le16(2) ++ le16(16) ++
      "data".getBytes ++ le32(2) ++ le16(16384)
    val media = Seq(
      (1L, "image", bos.toByteArray),
      (2L, "audio", wav),
      (3L, "video", "just bytes".getBytes)).toDF("media_id", "media_type", "payload")
    val out = Multimodal.extractFeatures(spark, media)
      .collect().map(f => f.media_id -> f).toMap
    out(1L).feature.take(2).toSeq shouldBe Seq(2.0, 1.0)       // real w × h
    out(1L).feature.drop(2).sum shouldBe 2.0                    // histogram covers all pixels
    out(2L).feature.toSeq shouldBe Seq(1.0, 0.5, 0.5)           // n, peak, rms of one sample
    out(3L).feature.length shouldBe 8                           // byte-histogram fallback
    out(3L).feature.sum shouldBe 10.0                           // one bin count per byte
  }
}
