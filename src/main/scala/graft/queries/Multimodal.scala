package graft.queries

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY.md §2.C (#37) — multimodal column plumbing.
  *
  * Media decode libraries aren't in this container, so the decoder is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing is real:
  * an opaque binary payload column, a typed Dataset, a partition-wise decode
  * (the shape a JNI/FFmpeg/PIL bridge would take: one decoder instance per
  * partition, streaming rows through it), and a typed metadata schema out.
  */
object Multimodal extends QueryModule {

  /** An opaque media payload: at 100 TB these are real image/audio bytes;
    * here the payload is the UTF-8 encoding of `text`.
    */
  final case class DocBlob(doc_id: Long, payload: Array[Byte])

  final case class BlobMeta(
      doc_id: Long, n_bytes: Long, magic_hex: String,
      width: Int, height: Int, format: String)

  /** STUB decoder — stands in for image decode (PIL/libjpeg not available).
    * Deterministic function of the payload so the oracle can check the
    * plumbing end-to-end. A real deployment swaps only this function.
    */
  def decodeStub(b: DocBlob): BlobMeta = {
    val n = b.payload.length.toLong
    val magic = b.payload.take(4).map(x => f"${x & 0xff}%02X").mkString
    BlobMeta(b.doc_id, n, magic, (n % 640).toInt, ((n * 7) % 480).toInt, "stub")
  }

  private def metaExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[DocBlob]
    // Partition-wise decode: one decoder per partition, rows streamed through.
    blobs.mapPartitions(_.map(decodeStub)).toDF()
      .orderBy("doc_id")
  }

  private val metaExtractSql = """
    SELECT doc_id,
      CAST(strlen(text) AS BIGINT) AS n_bytes,
      upper(hex(substr(text, 1, 4))) AS magic_hex,
      CAST(strlen(text) % 640 AS INT) AS width,
      CAST((strlen(text) * 7) % 480 AS INT) AS height,
      'stub' AS format
    FROM documents ORDER BY doc_id"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("mm_meta_extract", metaExtract, Some(metaExtractSql))
  )
}
