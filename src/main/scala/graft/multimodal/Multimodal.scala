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

  /** Deterministic fake decoder: byte-sum checksum + two fake "features"
    * derived from byte positions. Stands in for the codec stage. */
  object FakeDecoder extends PayloadDecoder {
    def decode(id: Long, bytes: Array[Byte]): DecodedFeatures = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += (bytes(i) & 0xff).toLong; i += 1 }
      val f0 = if (bytes.nonEmpty) (bytes(0) & 0xff).toDouble / 255.0 else 0.0
      val f1 = if (bytes.length > 1) (bytes(1) & 0xff).toDouble / 255.0 else 0.0
      DecodedFeatures(id, bytes.length, sum, f0, f1)
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
