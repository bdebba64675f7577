package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing (SURVEY §2.12): media payloads travel as
 * opaque `binary` columns beside a typed metadata struct; decode /
 * feature-extraction runs as a typed `mapPartitions` over
 * `Dataset[MediaRecord]` — the Scala analogue of a Pandas-UDF
 * `mapInPandas` stage: batched per partition, schema-checked at both
 * ends, no driver involvement.
 *
 * The actual byte decode is a STUB by design (no image/audio libs in
 * this container — per the brief): [[MediaFeatures.decodeStub]] derives
 * deterministic pseudo-features from the byte length, so the pipeline
 * shape (schema, partitioning, batch iteration, typed encoders) is
 * real and oracle-checkable while the codec call is one `???`-class
 * seam to swap for a real decoder.
 */
object Multimodal {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaMeta(source: String, n_chars: Long, mime: String)
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeature(doc_id: Long, n_bytes: Int, width: Int, height: Int, feat: Double)

  object MediaFeatures {
    /**
     * Deterministic decode stand-in — REPLACE WITH a real codec
     * (e.g. javax.imageio / ffmpeg JNI) when available. Signature and
     * batching stay identical.
     */
    def decodeStub(r: MediaRecord): MediaFeature = {
      val n = r.payload.length
      MediaFeature(r.doc_id, n, n % 640, (n * 7) % 480, n / 100.0)
    }
  }

  /** documents(text, …) → Dataset[MediaRecord] with a binary payload column. */
  def toMediaRecords(docs: DataFrame)(implicit s: SparkSession): Dataset[MediaRecord] = {
    import s.implicits._
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(col("source"), col("n_chars"), lit("text/plain").as("mime")).as("meta"))
      .as[MediaRecord]
  }

  /** The decode/feature-extract stage: per-partition batched map. */
  def extractFeatures(records: Dataset[MediaRecord])(implicit s: SparkSession): Dataset[MediaFeature] = {
    import s.implicits._
    records.mapPartitions(_.map(MediaFeatures.decodeStub))
  }

  /** End-to-end: documents → media schema → stub decode → features. */
  def pipeline(s: SparkSession, docs: DataFrame): DataFrame = {
    implicit val sp: SparkSession = s
    extractFeatures(toMediaRecords(docs)).toDF()
  }

  /**
   * Frame sampling over a media payload: treat the binary as a stream
   * of fixed-size frames and emit every `step`-th frame's (index,
   * offset, length). The frame *list* is generated declaratively
   * (`sequence` + `explode` — codegen'd, no UDF); a real decoder would
   * slice `payload` bytes at `frame_offset` in the same plan position
   * (e.g. in a batched mapPartitions like [[extractFeatures]]) — the
   * byte decode is the stubbed seam, the distributed shape is real:
   * explode multiplies rows partition-locally, no shuffle until the
   * caller aggregates.
   */
  def frameSample(docs: DataFrame, frameBytes: Int, step: Int): DataFrame = {
    require(frameBytes > 0 && step > 0, s"frameBytes=$frameBytes step=$step must be > 0")
    val nBytes = octet_length(col("text")) // payload = encode(text) (see pipeline)
    val nFrames = ceil(nBytes.cast("double") / frameBytes).cast("int")
    docs.select(col("doc_id"), nBytes.as("n_bytes"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("n_bytes"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(step))).as("frame_idx"))
      .select(
        col("doc_id"), col("frame_idx"),
        (col("frame_idx") * frameBytes).as("frame_offset"),
        least(lit(frameBytes), col("n_bytes") - col("frame_idx") * frameBytes).as("frame_len"))
  }
}
