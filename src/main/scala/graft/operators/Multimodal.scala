package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decoded metadata for one multimodal payload. */
case class MediaMeta(
    doc_id: Long, n_bytes: Long, byte_sum: Long,
    format: String, width: Long, height: Long)

/** Multimodal column plumbing (SURVEY §2.G): media as opaque binary
  * columns + typed metadata, feature extraction via batched
  * per-partition iteration.
  *
  * The DECODER IS A STUB — image/audio codecs aren't in this
  * container. It derives deterministic fake features from the raw
  * bytes so the Spark-side plumbing (binary column, typed Dataset,
  * mapPartitions batch shape, partition-preserving schema) is real
  * and oracle-checkable. Swap `stubDecode` for a real codec (JNI /
  * javax.imageio) without touching the plan.
  *
  * Scale: mapPartitions keeps decode zero-copy per executor; binary
  * payloads stay columnar in parquet until the iterator touches
  * them. No shuffle — the operator is embarrassingly parallel.
  */
object Multimodal {

  /** STUB decoder: deterministic fake features from raw bytes.
    * `bytes(0) & 0xff` (not the raw signed byte) so a payload whose
    * first byte is >= 0x80 classifies like the oracle's ascii()
    * codepoint on the ASCII corpus instead of going negative; a
    * zero-length payload is its own format rather than an
    * ArrayIndexOutOfBounds. */
  private def stubDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length
    var i = 0
    var sum = 0L
    while (i < n) { sum += (bytes(i) & 0xff); i += 1 }
    val format =
      if (n == 0) "empty"
      else ((bytes(0) & 0xff) % 3) match {
        case 0 => "jpeg"
        case 1 => "png"
        case _ => "wav"
      }
    MediaMeta(id, n.toLong, sum, format, 64L + n % 512, 64L + sum % 512)
  }

  /** Binary payload → decoded metadata via mapPartitions. */
  def q70(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => stubDecode(id, bytes) })
      .toDF()
      .orderBy("doc_id")
  }

  /** The stub features are byte arithmetic, so the oracle can verify
    * the full plumbing end-to-end (ASCII corpus: char == byte). */
  private val q70Sql =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
       CAST(coalesce(list_sum(list_transform(range(1, strlen(text)+1), i -> ascii(text[i]))), 0) AS BIGINT) AS byte_sum,
       CASE WHEN strlen(text) = 0 THEN 'empty'
            ELSE CASE ascii(text[1]) % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'wav' END END AS format,
       CAST(64 + strlen(text) % 512 AS BIGINT) AS width,
       CAST(64 + coalesce(list_sum(list_transform(range(1, strlen(text)+1), i -> ascii(text[i]))), 0) % 512 AS BIGINT) AS height
       FROM documents ORDER BY doc_id"""

  val qs: Seq[Q] = Seq(
    Q("q70_multimodal_meta", q70, Some(q70Sql)))
}
