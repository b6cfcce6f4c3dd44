package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction plumbing over `mapPartitions`.
  *
  * The container has no image/audio codecs, so the decoder is a STUB
  * behind `PayloadDecoder` — a deterministic fake that derives "features"
  * from the raw bytes. Everything around it — schema, batch iteration,
  * partition-parallel execution, metadata projection — is the real Spark
  * plumbing a production decode stage uses (swap `FakeDecoder` for a
  * JNI/codec-backed implementation and nothing else changes).
  *
  * Scale notes: payloads stay columnar-binary end to end (never hex
  * strings in the hot path); decode is per-partition with zero shuffle;
  * metadata-only queries prune the binary column at the parquet scan.
  */
object Multimodal {

  /** One decoded record: stand-in for (width, height, channels) etc. */
  case class DecodedFeatures(doc_id: Long, n_bytes: Int, checksum: Long,
                             feat0: Double, feat1: Double)

  /** The stub boundary: a real implementation would decode image/audio
    * bytes here (e.g. via a JNI codec). MUST be deterministic. */
  trait PayloadDecoder extends Serializable {
    def decode(id: Long, bytes: Array[Byte]): DecodedFeatures
  }

  /** Real byte-format header parsing for the two simplest uncompressed
    * media containers — this is an actual decoder path, not a stub:
    * BMP (width/height/bpp from the BITMAPINFOHEADER) and RIFF/WAVE
    * (channels/sample-rate/bits from the fmt chunk). Anything else is
    * an unrecognized payload. */
  object MediaHeaders {
    final case class Info(format: String, width: Int, height: Int,
                          channels: Int, sampleRate: Int, bitsPerSample: Int)

    private def u16le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def i32le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    def sniff(b: Array[Byte]): Option[Info] = {
      if (b.length >= 30 && b(0) == 'B' && b(1) == 'M')
        Some(Info("bmp", i32le(b, 18), i32le(b, 22), 1, 0, u16le(b, 28)))
      else if (b.length >= 36 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E' &&
        // canonical layout only: 'fmt ' must be the first chunk, else the
        // fixed offsets would read garbage (JUNK/LIST-first files → None)
        b(12) == 'f' && b(13) == 'm' && b(14) == 't' && b(15) == ' ')
        Some(Info("wav", 0, 0, u16le(b, 22), i32le(b, 24), u16le(b, 34)))
      else None
    }
  }

  /** Deterministic decoder: REAL header parse for recognized formats
    * (BMP → width/height as features; WAV → sampleRate/channels);
    * unrecognized payloads fall back to byte-derived pseudo-features —
    * the remaining declared stub boundary (the container has no codecs
    * for compressed formats). The byte-sum checksum is computed either
    * way. */
  object FakeDecoder extends PayloadDecoder {
    def decode(id: Long, bytes: Array[Byte]): DecodedFeatures = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff).toLong; i += 1 }
      MediaHeaders.sniff(bytes) match {
        case Some(m) if m.format == "bmp" =>
          DecodedFeatures(id, bytes.length, sum, m.width.toDouble, m.height.toDouble)
        case Some(m) =>
          DecodedFeatures(id, bytes.length, sum, m.sampleRate.toDouble, m.channels.toDouble)
        case None =>
          val f0 = if (bytes.nonEmpty) (bytes(0) & 0xff).toDouble / 255.0 else 0.0
          val f1 = if (bytes.length > 1) (bytes(1) & 0xff).toDouble / 255.0 else 0.0
          DecodedFeatures(id, bytes.length, sum, f0, f1)
      }
    }
  }

  /** Documents → opaque binary payloads with typed metadata: the shape of
    * a multimodal training table (payload BINARY, meta STRUCT). The bytes
    * here are the UTF-8 text (the testdata has no real media); a real
    * pipeline reads them from object storage. */
  def asBinaryTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        octet_length(col("text").cast("binary")).as("n_bytes"),
        col("source").as("origin"),
        col("lang").as("lang_hint")).as("meta"))

  /** Metadata-only projection — must NOT read payload bytes at the scan
    * (column pruning keeps the binary column out of ReadSchema). */
  def metaOnly(documents: DataFrame): DataFrame =
    asBinaryTable(documents)
      .select(col("doc_id"), col("meta.n_bytes").cast("bigint").as("n_bytes"),
        col("meta.origin").as("origin"), col("meta.lang_hint").as("lang_hint"))

  /** One sampled "frame": a contiguous byte slice of the payload with
    * its own length and checksum — the record shape a video/audio
    * frame-sampling stage emits (one input row → nFrames output rows). */
  case class Frame(doc_id: Long, frame_id: Int, n_bytes: Int, checksum: Long)

  /** Frame sampling: split each payload into `nFrames` contiguous byte
    * ranges (slice i = [i*len/n, (i+1)*len/n)) and emit one row per
    * frame — the flatMap-shaped stage of a media pipeline (a real codec
    * would decode the container and pick keyframes; the slicing/fan-out/
    * checksum plumbing is identical). Map-side, zero shuffle. */
  def frameSample(spark: SparkSession, documents: DataFrame,
                  nFrames: Int): Dataset[Frame] = {
    require(nFrames > 0, "nFrames must be positive")
    import spark.implicits._
    asBinaryTable(documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val len = bytes.length
        (0 until nFrames).iterator.map { i =>
          // Long arithmetic: i*len overflows Int for GB-scale payloads
          val start = (i.toLong * len / nFrames).toInt
          val end = ((i + 1).toLong * len / nFrames).toInt
          var sum = 0L
          var j = start
          while (j < end) { sum += (bytes(j) & 0xff).toLong; j += 1 }
          Frame(id, i, end - start, sum)
        }
      }
  }

  /** Resize stub: stride-`factor` byte downsampling (keep every factor-th
    * byte) — stands in for image resize; the payload-in/payload-out
    * transform plumbing is the real part. Deterministic, map-side. */
  def resizeStub(spark: SparkSession, documents: DataFrame,
                 factor: Int): DataFrame = {
    require(factor > 0, "factor must be positive")
    import spark.implicits._
    asBinaryTable(documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val out = new Array[Byte]((bytes.length + factor - 1) / factor)
        var i = 0
        while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
        (id, out)
      }.toDF("doc_id", "payload")
  }

  /** A length-prefixed frame container — the byte-layout pattern of real
    * media containers (video = header + per-frame length/payload
    * records), minimal enough to parse without codecs:
    * magic "GFC1" | n_frames int32 BE | per frame (len int32 BE, bytes).
    * [[packContainer]] builds one (fixtures/tests), [[parseContainer]]
    * parses with STRICT bounds checking, and [[explodeContainerFrames]]
    * is the fan-out stage: one input row → one row per frame, or ONE
    * error row for a corrupt container (`ok = false`, reason in `err`) —
    * a production ingest must quarantine bad payloads, not die on the
    * first truncated file (the binary analogue of the try_cast parse
    * path). */
  object FrameContainer {
    val Magic: Array[Byte] = "GFC1".getBytes("US-ASCII")

    private def i32be(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

    private def readI32be(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

    def packContainer(frames: Seq[Array[Byte]]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Magic)
      out.write(i32be(frames.size))
      frames.foreach { f => out.write(i32be(f.length)); out.write(f) }
      out.toByteArray
    }

    /** Strict parse: every length is validated against the remaining
      * buffer BEFORE the slice, trailing garbage is an error (a real
      * demuxer treats it as corruption, not padding). */
    def parseContainer(b: Array[Byte]): Either[String, Vector[Array[Byte]]] = {
      if (b.length < 8) return Left(s"short header: ${b.length} bytes")
      if (!java.util.Arrays.equals(b.take(4), Magic)) return Left("bad magic")
      val n = readI32be(b, 4)
      if (n < 0) return Left(s"negative frame count $n")
      var off = 8
      val frames = Vector.newBuilder[Array[Byte]]
      var i = 0
      while (i < n) {
        if (off + 4 > b.length) return Left(s"truncated at frame $i length")
        val len = readI32be(b, off)
        if (len < 0) return Left(s"negative length at frame $i")
        if (off + 4 + len > b.length) return Left(s"truncated at frame $i body")
        frames += java.util.Arrays.copyOfRange(b, off + 4, off + 4 + len)
        off += 4 + len
        i += 1
      }
      if (off != b.length) return Left(s"${b.length - off} trailing bytes")
      Right(frames.result())
    }
  }

  /** One container frame (or the container's error row). */
  case class ContainerFrame(doc_id: Long, frame_id: Int, n_bytes: Int,
                            checksum: Long, ok: Boolean, err: String)

  /** The container fan-out stage: map-side, zero shuffle, corrupt
    * payloads quarantined as error rows. Input: (doc_id, payload). */
  def explodeContainerFrames(spark: SparkSession, containers: DataFrame): Dataset[ContainerFrame] = {
    import spark.implicits._
    containers.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        FrameContainer.parseContainer(bytes) match {
          case Left(reason) =>
            Iterator.single(ContainerFrame(id, -1, bytes.length, 0L,
              ok = false, err = reason))
          case Right(frames) =>
            frames.iterator.zipWithIndex.map { case (f, i) =>
              var sum = 0L
              var j = 0
              while (j < f.length) { sum += (f(j) & 0xff).toLong; j += 1 }
              ContainerFrame(id, i, f.length, sum, ok = true, err = "")
            }
        }
      }
  }

  /** Partition-parallel decode: the real plumbing around the stub.
    * No shuffle; one decoder instance per partition (cheap init amortized
    * across the partition — the pattern a codec/model handle needs). */
  def decodeFeatures(spark: SparkSession, documents: DataFrame,
                     decoder: PayloadDecoder = FakeDecoder): Dataset[DecodedFeatures] = {
    import spark.implicits._
    asBinaryTable(documents)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder // per-partition init point
        it.map { case (id, bytes) => d.decode(id, bytes) }
      }
  }
}
