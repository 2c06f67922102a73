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
  *
  * Oracle encoding assumption: the DuckDB twins index `text` by CHARACTER
  * while the Spark side works on the payload BYTES — identical only while
  * the corpus is single-byte (ASCII), which TextSpec asserts explicitly. A
  * real binary corpus exercises only the Spark side (the payloads would
  * not round-trip through a VARCHAR oracle at all).
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

  // ---------------------------------------------------------------
  // frame-sample: every FrameStep bytes take a FrameLen-byte frame —
  // the shape of video frame sampling, streamed partition-wise through
  // the stub decoder. Frames are identified by a 64-bit hash.
  final case class Frame(doc_id: Long, frame_no: Int, offset: Int, frame_hash: Long)

  val FrameStep = 64
  val FrameLen = 32
  /** Hard frame cap shared with the oracle's generate_series bound: both
    * engines stop at frame_no MaxFrameNo, so a pathological multi-MB
    * payload cannot silently diverge the twins (and the explode stays
    * bounded). 1001 frames covers payloads up to ~64 KB.
    */
  val MaxFrameNo = 1000

  private def md5Long64Jvm(x: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(x.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def sampleFrames(b: DocBlob): Iterator[Frame] = {
    val payload = new String(b.payload, "UTF-8")
    Iterator.from(0).map(_ * FrameStep)
      .takeWhile(off => off + FrameLen <= payload.length && off / FrameStep <= MaxFrameNo)
      .map(off => Frame(b.doc_id, off / FrameStep, off,
        md5Long64Jvm(payload.substring(off, off + FrameLen))))
  }

  private def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[DocBlob]
      .mapPartitions(_.flatMap(sampleFrames))
      .toDF()
      .orderBy("doc_id", "frame_no")
  }

  private val frameSampleSql = s"""
    WITH frames AS (
      SELECT doc_id, CAST(i AS INT) AS frame_no, CAST(i * $FrameStep AS INT) AS "offset",
             substr(text, i * $FrameStep + 1, $FrameLen) AS frame
      FROM documents
      CROSS JOIN (SELECT unnest(generate_series(0, $MaxFrameNo)) AS i) g
      WHERE i * $FrameStep + $FrameLen <= length(text))
    SELECT doc_id, frame_no, "offset",
           CAST('0x'||substr(md5(frame),1,15) AS BIGINT) AS frame_hash
    FROM frames
    ORDER BY doc_id, frame_no"""

  // ---------------------------------------------------------------
  // feature-extract: cheap per-payload features (the stub stand-in for a
  // real embedding/feature model); resize: pure metadata transform.
  def resizeStub(m: BlobMeta, maxW: Int, maxH: Int): BlobMeta = {
    val scale = math.min(1.0, math.min(
      maxW.toDouble / math.max(m.width, 1), maxH.toDouble / math.max(m.height, 1)))
    m.copy(width = (m.width * scale).toInt, height = (m.height * scale).toInt,
      format = s"${m.format}_resized")
  }

  private def features(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents").select(
      col("doc_id"),
      (length(col("text")) - length(regexp_replace(col("text"), lit(" "), lit("")))).cast("long").as("n_spaces"),
      (length(col("text")) - length(regexp_replace(col("text"), lit("[aeiou]"), lit("")))).cast("long").as("n_vowels"),
      (length(col("text")) - length(regexp_replace(col("text"), lit("[0-9]"), lit("")))).cast("long").as("n_digits"))
      .orderBy("doc_id")

  private val featuresSql = """
    SELECT doc_id,
      CAST(length(text) - length(regexp_replace(text, ' ', '', 'g')) AS BIGINT) AS n_spaces,
      CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS n_vowels,
      CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits
    FROM documents ORDER BY doc_id"""

  private val metaExtractSql = """
    SELECT doc_id,
      CAST(strlen(text) AS BIGINT) AS n_bytes,
      upper(hex(substr(text, 1, 4))) AS magic_hex,
      CAST(strlen(text) % 640 AS INT) AS width,
      CAST((strlen(text) * 7) % 480 AS INT) AS height,
      'stub' AS format
    FROM documents ORDER BY doc_id"""

  // mm_resize: decode -> bounded-box resize -> typed metadata out, all
  // partition-wise (the real pipeline would re-encode the payload; the
  // stub transforms the metadata with the exact scale arithmetic a
  // thumbnailer uses). Single IEEE ops, so the oracle reproduces the
  // integer dimensions bit-for-bit.
  val ResizeMaxW = 128
  val ResizeMaxH = 96

  private def resize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[DocBlob]
      .mapPartitions(_.map(b => resizeStub(decodeStub(b), ResizeMaxW, ResizeMaxH)))
      .toDF()
      .orderBy("doc_id")
  }

  private val resizeSql = s"""
    WITH m AS (
      SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
             upper(hex(substr(text, 1, 4))) AS magic_hex,
             CAST(strlen(text) % 640 AS INT) AS w,
             CAST((strlen(text) * 7) % 480 AS INT) AS h
      FROM documents),
    scaled AS (
      SELECT *, least(1.0, least(CAST($ResizeMaxW AS DOUBLE) / greatest(w, 1),
                                 CAST($ResizeMaxH AS DOUBLE) / greatest(h, 1))) AS s
      FROM m)
    SELECT doc_id, n_bytes, magic_hex,
           CAST(floor(w * s) AS INT) AS width,
           CAST(floor(h * s) AS INT) AS height,
           'stub_resized' AS format
    FROM scaled ORDER BY doc_id"""

  // ---------------------------------------------------------------
  // mm_dedup: near-duplicate media via shared sampled-frame hashes — the
  // video-dedup shape (perceptual frame hash → inverted index → overlap
  // verify). Candidate pairs come from an inverted index on the frame
  // hash with a document-frequency cap (a frame appearing in many docs is
  // a title card / black frame — joining through it would explode the
  // pair set at 100 TB), so the shuffle is on compact 64-bit keys and the
  // pair set stays proportional to the true duplicate count.
  private val MmDfCap = 20
  private val MmMinShared = 2

  /** Distinct (doc_id, frame_hash), memoized + cached per (session, dir):
    * the df cap, the self-joined candidate pairs, and the size aggregation
    * all re-scan it — without the cache the binary frame-hash pass runs
    * four times per invocation (same pattern as Docs/shingles).
    */
  private def frames(s: SparkSession, dir: String): DataFrame =
    SessionCache.memo(s, "frames", dir)(
      frameSample(s, dir).select("doc_id", "frame_hash").distinct())

  private def mmDedup(s: SparkSession, dir: String): DataFrame = {
    val fr = frames(s, dir)
    val df = fr.groupBy("frame_hash").agg(count(lit(1)).as("d"))
    val rare = fr.join(df.filter(col("d") <= MmDfCap), Seq("frame_hash"))
    val shared = rare.as("a")
      .join(rare.as("b"), col("a.frame_hash") === col("b.frame_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= MmMinShared)
    val sizes = fr.groupBy("doc_id").agg(count(lit(1)).as("n"))
    shared
      .join(sizes.as("sa"), col("sa.doc_id") === col("doc_a"))
      .join(sizes.as("sb"), col("sb.doc_id") === col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("sa.n").as("n_a"), col("sb.n").as("n_b"),
        (col("n_shared").cast("double") / least(col("sa.n"), col("sb.n"))).as("containment"))
      .orderBy("doc_a", "doc_b")
  }

  private val mmDedupSql =
    s"""WITH fr AS (
       |  SELECT DISTINCT doc_id, frame_hash FROM ($frameSampleSql)),
       |df AS (SELECT frame_hash, count(*) AS d FROM fr GROUP BY frame_hash),
       |rare AS (SELECT fr.doc_id, fr.frame_hash FROM fr JOIN df ON df.frame_hash = fr.frame_hash WHERE df.d <= $MmDfCap),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM rare a JOIN rare b ON a.frame_hash = b.frame_hash AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |  HAVING count(*) >= $MmMinShared),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM fr GROUP BY doc_id)
       |SELECT s.doc_a, s.doc_b, s.n_shared, sa.n AS n_a, sb.n AS n_b,
       |       CAST(s.n_shared AS DOUBLE) / least(sa.n, sb.n) AS containment
       |FROM shared s
       |JOIN sizes sa ON sa.doc_id = s.doc_a
       |JOIN sizes sb ON sb.doc_id = s.doc_b
       |ORDER BY s.doc_a, s.doc_b""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("mm_meta_extract", metaExtract, Some(metaExtractSql)),
    QueryDef("mm_frame_sample", frameSample, Some(frameSampleSql)),
    QueryDef("mm_features", features, Some(featuresSql)),
    QueryDef("mm_resize", resize, Some(resizeSql)),
    QueryDef("mm_dedup", mmDedup, Some(mmDedupSql))
  )
}
