package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Multimodal columns (SURVEY §2 I): media as opaque `binary` with a
  * typed metadata struct. The Spark-side plumbing — schema,
  * partition-wise batch transform, UDF signatures, frame chunking —
  * is real and tested; the actual codec is STUBBED deterministically
  * (no image/audio libraries in this container): `decodeStub`
  * "decodes" by computing byte statistics, standing where a JNI/FFI
  * codec call would.
  *
  * Scale shape: decode is `mapPartitions` — one codec context per
  * partition, not per row; binary columns never shuffle (all derived
  * features are computed before any wide op).
  */
object MultiModal {

  /** A media row: content bytes + typed metadata, synthesized from
    * documents (text bytes stand in for an encoded frame).
    */
  final case class MediaRow(doc_id: Long, content: Array[Byte],
      format: String, width: Int, height: Int)

  final case class MediaFeatures(doc_id: Long, n_bytes: Long,
      byte_sum: Long, first_byte: Int, n_frames: Int)

  /** Binary media table synthesized from documents. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("content"),
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpg").otherwise("wav")
          .as("format"),
        (lit(64) + (col("doc_id") % 16) * 32).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 9) * 32).cast("int").as("height"))
      .as[MediaRow]
  }

  /** I1: partition-wise batch "decode". One decoder per partition —
    * the real-codec call site is the marked line.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real pipeline: val codec = Codec.open(format) — once per partition
      rows.map { m =>
        val bytes = m.content
        MediaFeatures(
          doc_id = m.doc_id,
          n_bytes = bytes.length.toLong,
          byte_sum = bytes.foldLeft(0L)((a, b) => a + (b & 0xff)),
          first_byte = if (bytes.isEmpty) -1 else bytes(0) & 0xff,
          n_frames = 1 + (bytes.length / 64))
      }
    }
  }

  /** I2: frame sampling — split content into fixed 64-byte "frames"
    * and keep every `stride`-th one (binary → array<binary>).
    */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.withColumn("frames",
      expr(s"""filter(
        transform(sequence(0, CAST(octet_length(content) DIV 64 AS INT)),
          i -> substring(content, i * 64 + 1, 64)),
        (x, i) -> i % $stride = 0 AND octet_length(x) > 0)"""))

  // ---------------------------------------------------------------- I1
  /** Metadata extraction as an oracle-checked query: byte length and
    * content digest are codec-independent and cross-engine exact.
    */
  val mMeta: Q = Q(
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          expr("octet_length(text)").cast("long").as("byte_len"),
          md5(col("text")).as("content_md5"),
          (lit(64) + (col("doc_id") % 16) * 32).as("width"),
          (lit(64) + (col("doc_id") % 9) * 32).as("height"),
          expr("1 + octet_length(text) DIV 64").cast("long").as("n_frames"))
        .orderBy("doc_id"),
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
      |  md5(text) AS content_md5,
      |  64 + (doc_id % 16) * 32 AS width,
      |  64 + (doc_id % 9) * 32 AS height,
      |  CAST(1 + strlen(text) // 64 AS BIGINT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin)

  val registry: Map[String, Q] = Map("m_meta" -> mMeta)
}
