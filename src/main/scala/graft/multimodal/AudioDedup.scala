package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual audio near-duplicate detection over decoded WAV samples —
  * the audio member of the multimodal dedup family (images got dHash in
  * this round; this is the 1-D analogue). An energy-envelope gradient
  * hash: split the PCM stream into 65 fixed windows, sum sample energy
  * (s²) per window, emit one sign bit per adjacent window pair. Sign
  * comparisons are invariant under any uniform POSITIVE volume scaling
  * (energies scale by c², order preserved) — the re-mastered/gain-
  * adjusted copy byte-exact dedup cannot see — and the whole pipeline
  * is integer arithmetic, so the oracle can recompute it from the
  * sample spec in pure SQL.
  *
  * Candidate pairing reuses [[ImageDedup.bandedHammingPairs]] verbatim
  * (any 64-bit perceptual hash shares the banding machinery), and the
  * band-store ingest gate would lift the same way. Decode is a REAL
  * RIFF chunk walker (arbitrary chunk order, JUNK/LIST tolerated,
  * strict bounds), not a fixed-offset sniff: 16-bit PCM, mono used
  * as-is, stereo mixed (l+r)/2 — floor division, still scaling-exact
  * for even factors. Anything else → None (quarantine upstream). */
object AudioDedup {

  private def u16le(a: Array[Byte], o: Int): Int =
    (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8)
  private def i32le(a: Array[Byte], o: Int): Int =
    (a(o) & 0xff) | ((a(o + 1) & 0xff) << 8) |
      ((a(o + 2) & 0xff) << 16) | ((a(o + 3) & 0xff) << 24)

  /** Walk RIFF chunks; returns (channels, sampleRate, mono samples).
    * 16-bit PCM only; stereo mixes to mono by floor((l+r)/2). */
  def decodeWavPcm16(b: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (b.length < 12 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' ||
      b(3) != 'F' || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return None
    // Offset arithmetic in Long: a crafted chunk length near Int.MaxValue
    // would overflow `off + 8 + len` negative in Int and slip past the
    // bounds check — the quarantine contract (hostile bytes → None, never
    // a task crash) requires the overflow-free comparison.
    var offL = 12L
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None     // (offset, len)
    while (offL + 8 <= b.length) {
      val off = offL.toInt
      val id = new String(b, off, 4, "US-ASCII")
      val len = i32le(b, off + 4)
      if (len < 0 || offL + 8 + len > b.length) return None
      if (id == "fmt " && len >= 16) {
        val audioFormat = u16le(b, off + 8)
        if (audioFormat != 1) return None // PCM only
        fmt = Some((u16le(b, off + 10), i32le(b, off + 12), u16le(b, off + 22)))
      } else if (id == "data") data = Some((off + 8, len))
      offL += 8L + len + (len & 1) // chunks pad to even length
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some((dOff, dLen)))
          if bits == 16 && (ch == 1 || ch == 2) =>
        val frameBytes = 2 * ch
        val n = dLen / frameBytes
        val out = new Array[Int](n)
        var i = 0
        while (i < n) {
          val o = dOff + i * frameBytes
          val s0 = (u16le(b, o) << 16) >> 16 // sign-extend
          out(i) =
            if (ch == 1) s0
            else {
              val s1 = (u16le(b, o + 2) << 16) >> 16
              // floorDiv, not /: -3/2 truncates toward 0, breaking the
              // exactness of even-factor volume scaling on odd sums
              Math.floorDiv(s0 + s1, 2)
            }
          i += 1
        }
        Some((ch, rate, out))
      case _ => None
    }
  }

  /** Pack mono 16-bit PCM as a canonical WAV (fmt-first — also parses
    * with [[Multimodal.MediaHeaders.sniff]]). Fixture/builder side. */
  def packWavPcm16(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dLen = samples.length * 2
    val out = new Array[Byte](44 + dLen)
    def w16(o: Int, v: Int): Unit = { out(o) = v.toByte; out(o + 1) = (v >> 8).toByte }
    def w32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    def tag(o: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (c, i) => out(o + i) = c }
    tag(0, "RIFF"); w32(4, 36 + dLen); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16); w16(20, 1); w16(22, 1)
    w32(24, sampleRate); w32(28, sampleRate * 2); w16(32, 2); w16(34, 16)
    tag(36, "data"); w32(40, dLen)
    samples.zipWithIndex.foreach { case (s, i) => w16(44 + i * 2, s) }
    out
  }

  /** 64-bit energy-envelope hash: 65 windows of Σ s², bit i = 1 iff
    * e(i) < e(i+1). Windows split as [i·n/65, (i+1)·n/65); requires
    * ≥ 65 samples. */
  def fingerprintFromSamples(samples: Array[Int]): Long = {
    require(samples.length >= 65, s"too few samples: ${samples.length}")
    val n = samples.length
    val e = new Array[Long](65)
    var w = 0
    while (w < 65) {
      val s0 = (w.toLong * n / 65).toInt
      val s1 = ((w + 1).toLong * n / 65).toInt
      var sum = 0L
      var i = s0
      while (i < s1) { val s = samples(i).toLong; sum += s * s; i += 1 }
      e(w) = sum
      w += 1
    }
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (e(i) < e(i + 1)) hash |= 1L << i
      i += 1
    }
    hash
  }

  /** Full decode → hash for one payload; None for undecodable or
    * too-short audio. */
  def fingerprint(bytes: Array[Byte]): Option[Long] =
    decodeWavPcm16(bytes).collect {
      case (_, _, s) if s.length >= 65 => fingerprintFromSamples(s)
    }

  /** Map-side decode+hash over (doc_id, payload); undecodable payloads
    * drop here (same contract as [[ImageDedup.imageDhash]]). The output
    * column is `dhash` so the banded pairing/store machinery applies
    * unchanged. */
  def audioFingerprints(spark: SparkSession, audio: DataFrame): DataFrame = {
    import spark.implicits._
    audio.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) => fingerprint(bytes).map(h => (id, h)) }
      .toDF("doc_id", "dhash")
  }

  /** Band keys for the incremental gate — the audio instantiation of
    * [[ImageDedup.hashBandKeys]]; same "b#value" layout, so
    * `Dedup.compactBandStore` maintains this store too. */
  def audioBandKeys(spark: SparkSession, audio: DataFrame,
                    bands: Int = 4): DataFrame =
    ImageDedup.hashBandKeys(audioFingerprints(spark, audio), bands)

  /** Ingest-time audio near-dup gate: [[ImageDedup.incrementalBandGate]]
    * over fingerprint band keys — a new clip is rejected when any band
    * was seen within-batch (earlier id) or in the cross-run store;
    * undecodable/too-short payloads carry no bands and always pass.
    * Same full-recall (hamming ≤ bands−1) pigeonhole argument, same
    * probabilistic over-drop trade as the image and MinHash gates. */
  def incrementalAudioNearDup(spark: SparkSession, newAudio: DataFrame,
                              seenBands: DataFrame,
                              bands: Int = 4): DataFrame =
    ImageDedup.incrementalBandGate(newAudio,
      audioBandKeys(spark, newAudio, bands), seenBands)

  /** foreachBatch sink — [[ImageDedup.bandStoreSink]] with the audio
    * key extractor; replay-idempotent, store compacts with
    * `Dedup.compactBandStore`. */
  def incrementalAudioSink(out: String, bands: Int = 4)(
      batch: DataFrame, batchId: Long): Unit =
    ImageDedup.bandStoreSink(out,
      audioBandKeys(batch.sparkSession, _, bands))(batch, batchId)

  /** Deterministic audio corpus off the documents table: sample k of a
    * doc is (byte(k mod len) − 64) · 256 (ASCII ⇒ full int16 range
    * without clipping), `windows`·`perWindow` samples per doc. Every
    * doc with doc_id ≡ 0 (mod `scaleEvery`) also emits a volume-DOUBLED
    * copy at doc_id + `copyOffset` — ×2 is exact in int16 here because
    * |s| ≤ 16384, so the copy's fingerprint is bit-identical while its
    * bytes all differ. Packs real WAV bytes to exercise the decoder. */
  def synthDocAudio(documents: DataFrame, windows: Int = 65,
                    perWindow: Int = 16, scaleEvery: Int = 5,
                    copyOffset: Long = 1L << 41): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val n = windows * perWindow
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val bytes = text.getBytes("UTF-8")
        def samples(factor: Int): Array[Int] = Array.tabulate(n) { k =>
          val b = if (bytes.isEmpty) 0 else bytes(k % bytes.length) & 0xff
          (b - 64) * 256 * factor
        }
        val base = (id, packWavPcm16(8000, samples(1)))
        if (id % scaleEvery == 0)
          Iterator(base, (id + copyOffset, packWavPcm16(8000, samples(2))))
        else Iterator.single(base)
      }
      .toDF("doc_id", "payload")
  }
}
