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

  test("frame container: pack -> explode round-trips frames with exact lengths/checksums") {
    import spark.implicits._
    import Multimodal.FrameContainer
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](), Array[Byte](-1, 127))
    val container = FrameContainer.packContainer(frames)
    val df = Seq((7L, container)).toDF("doc_id", "payload")
    val out = Multimodal.explodeContainerFrames(spark, df)
      .collect().sortBy(_.frame_id)
    assert(out.forall(_.ok))
    assert(out.map(_.n_bytes).toSeq === Seq(3, 0, 2))
    // checksums are unsigned-byte sums: (1+2+3), 0, (255+127)
    assert(out.map(_.checksum).toSeq === Seq(6L, 0L, 382L))
  }

  test("frame container: corrupt payloads quarantine as ONE error row, no throw") {
    import spark.implicits._
    import Multimodal.FrameContainer
    val good = FrameContainer.packContainer(Seq(Array[Byte](9, 9)))
    val cases = Seq(
      1L -> "nonsense".getBytes("US-ASCII"),          // bad magic
      2L -> good.dropRight(1),                        // truncated body
      3L -> (good ++ Array[Byte](0)),                 // trailing garbage
      4L -> good.take(6),                             // short header
      5L -> good)                                     // control: valid
    val out = Multimodal.explodeContainerFrames(spark, cases.toDF("doc_id", "payload"))
      .collect().groupBy(_.doc_id)
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      val rows = out(id)
      assert(rows.length == 1 && !rows.head.ok && rows.head.err.nonEmpty, s"doc $id")
    }
    assert(out(5L).forall(_.ok))
    // strict parse reasons are specific, not generic
    assert(out(1L).head.err == "bad magic")
    assert(out(3L).head.err.contains("trailing"))
  }

  test("decode pipeline runs partition-parallel over the documents table") {
    val docs = graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Multimodal.decodeFeatures(spark, docs).collect()
    assert(out.length === docs.count().toInt)
    assert(out.forall(d => d.checksum > 0 && d.n_bytes > 0))
  }
}
