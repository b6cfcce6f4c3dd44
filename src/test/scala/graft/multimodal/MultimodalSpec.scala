package graft.multimodal

import graft.SparkSuite
import graft.multimodal.Multimodal.{FakeDecoder, MediaHeaders}

class MultimodalSpec extends SparkSuite {

  private def bmp(width: Int, height: Int, bpp: Int): Array[Byte] = {
    val b = new Array[Byte](54)
    b(0) = 'B'; b(1) = 'M'
    def i32(o: Int, v: Int): Unit = (0 until 4).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    def i16(o: Int, v: Int): Unit = (0 until 2).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    i32(18, width); i32(22, height); i16(28, bpp)
    b
  }

  private def wav(channels: Int, rate: Int, bits: Int): Array[Byte] = {
    val b = new Array[Byte](44)
    "RIFF".getBytes.copyToArray(b, 0)
    "WAVE".getBytes.copyToArray(b, 8)
    "fmt ".getBytes.copyToArray(b, 12)
    def i32(o: Int, v: Int): Unit = (0 until 4).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    def i16(o: Int, v: Int): Unit = (0 until 2).foreach(i => b(o + i) = ((v >> (8 * i)) & 0xff).toByte)
    i16(22, channels); i32(24, rate); i16(34, bits)
    b
  }

  test("BMP header parse: width/height/bpp from BITMAPINFOHEADER") {
    val info = MediaHeaders.sniff(bmp(640, 480, 24))
    assert(info === Some(MediaHeaders.Info("bmp", 640, 480, 1, 0, 24)))
    val d = FakeDecoder.decode(7L, bmp(640, 480, 24))
    assert(d.feat0 === 640.0 && d.feat1 === 480.0 && d.n_bytes === 54)
  }

  test("WAV header parse: channels/sample-rate/bits from the fmt chunk") {
    val info = MediaHeaders.sniff(wav(2, 44100, 16))
    assert(info === Some(MediaHeaders.Info("wav", 0, 0, 2, 44100, 16)))
    val d = FakeDecoder.decode(8L, wav(2, 44100, 16))
    assert(d.feat0 === 44100.0 && d.feat1 === 2.0)
  }

  test("unrecognized payloads keep the byte-derived fallback (oracle-stable)") {
    assert(MediaHeaders.sniff("plain text payload".getBytes).isEmpty)
    val d = FakeDecoder.decode(9L, "ab".getBytes)
    assert(d.feat0 === 'a'.toDouble / 255.0 && d.feat1 === 'b'.toDouble / 255.0)
    assert(d.checksum === ('a'.toInt + 'b'.toInt).toLong)
  }

  test("frameSample: n frames per payload, slices partition the bytes exactly") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij", "s", "en", 10L, 10L))
      .toDF("doc_id", "text", "source", "lang", "n_chars", "n_tokens")
    val frames = Multimodal.frameSample(spark, docs, 4).collect().sortBy(_.frame_id)
    assert(frames.length === 4)
    assert(frames.map(_.n_bytes).toSeq === Seq(2, 3, 2, 3)) // 10 bytes over 4 frames
    assert(frames.map(_.n_bytes).sum === 10)
    assert(frames.map(_.checksum).sum === "abcdefghij".map(_.toLong).sum)
  }

  test("resizeStub: stride downsampling keeps every factor-th byte") {
    import spark.implicits._
    val docs = Seq((1L, "abcdef", "s", "en", 6L, 6L))
      .toDF("doc_id", "text", "source", "lang", "n_chars", "n_tokens")
    val out = Multimodal.resizeStub(spark, docs, 2)
      .as[(Long, Array[Byte])].collect().head
    assert(new String(out._2) === "ace")
  }

  test("decode pipeline runs partition-parallel over the documents table") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Multimodal.decodeFeatures(spark, docs).collect()
    assert(out.length === docs.count().toInt)
    assert(out.forall(d => d.checksum > 0 && d.n_bytes > 0))
  }
}
