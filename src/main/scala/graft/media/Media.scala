package graft.media

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** #35: multimodal column plumbing — opaque binary media payloads with
  * typed metadata, decoded batch-wise via `mapPartitions`.
  *
  * The media payload here is the document text encoded to bytes (the
  * container ships no image/audio codecs), and the "decoder" is a
  * CLEARLY-MARKED deterministic stub: it derives width/height/frame-count
  * from the payload length and id. What is REAL and tested is the Spark
  * plumbing a production decoder plugs into:
  *  - a `binary` column carried through a typed `Dataset`;
  *  - batch-shaped decode via `mapPartitions` (one iterator per
  *    partition — where a real codec would amortize library init, exactly
  *    like a Pandas-UDF batch);
  *  - typed metadata out (case-class Encoder, columnar downstream).
  *
  * Scale: map-only, zero shuffle; payload bytes never leave the executor.
  */
object Media {

  /** Input row for the decode stage: id + format tag + raw payload. */
  final case class MediaIn(doc_id: Long, fmt: String, media: Array[Byte])

  /** Typed decode output. */
  final case class MediaMeta(doc_id: Long, fmt: String, n_bytes: Long,
      width: Long, height: Long, n_frames: Long)

  /** STUB decoder: a real implementation would parse the container
    * header; this derives deterministic fake dimensions from payload
    * size + id so the operator is oracle-checkable end-to-end.
    */
  private def decodeStub(m: MediaIn): MediaMeta = {
    val n = m.media.length.toLong
    MediaMeta(
      doc_id = m.doc_id,
      fmt = m.fmt,
      n_bytes = n,
      width = 320L + (n * 7L + m.doc_id) % 1280L,
      height = 240L + (m.doc_id * 13L) % 720L,
      n_frames = 1L + n % 24L)
  }

  def metadata(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fmts = array(lit("jpeg"), lit("png"), lit("webp"))
    graft.core.Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(fmts, (col("doc_id") % 3).cast("int") + 1).as("fmt"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaIn]
      .mapPartitions(_.map(decodeStub)) // batch boundary: codec init amortizes here
      .toDF()
  }

  val metadataSql: String =
    """SELECT doc_id,
      |  ['jpeg','png','webp'][CAST(doc_id % 3 AS INT) + 1] AS fmt,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  320 + (CAST(octet_length(encode(text)) AS BIGINT) * 7 + doc_id) % 1280 AS width,
      |  240 + (doc_id * 13) % 720 AS height,
      |  1 + CAST(octet_length(encode(text)) AS BIGINT) % 24 AS n_frames
      |FROM documents""".stripMargin

  // ------------------------------------------------- #49 frame sampling

  /** One sampled, "resized", feature-extracted frame. */
  final case class Frame(doc_id: Long, frame_idx: Long, ts_ms: Long,
      out_w: Long, out_h: Long, feat: Long)

  val MaxSamples = 4L
  val FrameMs = 40L // 25 fps
  val ResizeTo = 224L

  /** STUB frame pipeline for one payload: decode (fake dims from
    * [[decodeStub]]'s formulas) → sample every ⌈n_frames/4⌉-th frame →
    * resize to ≤224 → extract a deterministic fake feature. A real
    * implementation swaps the arithmetic for a codec + model call; the
    * iterator-in/iterator-out batch shape (frames EXPLODE inside the
    * partition, payload bytes never shuffle) is the production plumbing.
    */
  private def sampleStub(m: MediaIn): Iterator[Frame] = {
    val n = m.media.length.toLong
    val width = 320L + (n * 7L + m.doc_id) % 1280L
    val height = 240L + (m.doc_id * 13L) % 720L
    val nFrames = 1L + n % 24L
    val step = (nFrames + MaxSamples - 1) / MaxSamples
    (0L until MaxSamples).iterator.map(_ * step).filter(_ < nFrames)
      .map { idx =>
        Frame(m.doc_id, idx, idx * FrameMs,
          math.min(width, ResizeTo), math.min(height, ResizeTo),
          (n * 31L + idx * 17L + m.doc_id) % 1000000L)
      }
  }

  /** #49: decode → frame-sample → resize → featurize over the binary
    * media column; one output row per sampled frame.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val fmts = array(lit("jpeg"), lit("png"), lit("webp"))
    graft.core.Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        element_at(fmts, (col("doc_id") % 3).cast("int") + 1).as("fmt"),
        encode(col("text"), "UTF-8").as("media"))
      .as[MediaIn]
      .mapPartitions(_.flatMap(sampleStub))
      .toDF()
  }

  val frameSampleSql: String =
    s"""WITH d AS (
       |  SELECT doc_id,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS n,
       |    320 + (CAST(octet_length(encode(text)) AS BIGINT) * 7 + doc_id) % 1280 AS width,
       |    240 + (doc_id * 13) % 720 AS height,
       |    1 + CAST(octet_length(encode(text)) AS BIGINT) % 24 AS n_frames
       |  FROM documents
       |), s AS (
       |  SELECT *, (n_frames + ${MaxSamples - 1}) // $MaxSamples AS step FROM d
       |)
       |SELECT doc_id, i * step AS frame_idx, i * step * $FrameMs AS ts_ms,
       |  LEAST(width, $ResizeTo) AS out_w, LEAST(height, $ResizeTo) AS out_h,
       |  (n * 31 + i * step * 17 + doc_id) % 1000000 AS feat
       |FROM s, (SELECT unnest(range(0, $MaxSamples)) AS i)
       |WHERE i * step < n_frames""".stripMargin
}
