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
  /**
   * REAL image-header metadata decode — no codec library needed: PNG,
   * JPEG, and GIF all carry their pixel dimensions in fixed container
   * positions, so this is byte arithmetic, not decompression. This is
   * the part of "multimodal decode" that genuinely runs at 100 TB scan
   * time (routing, dedup-by-resolution, filtering tiny images) while
   * pixel decode stays behind the [[MediaFeatures.decodeStub]] seam.
   *
   * Returns (width, height), or None for unrecognized/truncated bytes.
   */
  def imageDims(payload: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (payload.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' && u8(2) == 'N' &&
        u8(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a) {
      // PNG: 8-byte signature, IHDR chunk is first — width/height at 16/20
      Some((be32(16), be32(20)))
    } else if (payload.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // JPEG: walk marker segments to the first SOFn frame header
      var i = 2
      while (i + 9 < payload.length) {
        if (u8(i) != 0xff) return None // desynced
        // ISO 10918 permits any number of 0xFF fill bytes before a
        // marker id — skip them or the walk reads a garbage length
        while (i + 1 < payload.length && u8(i + 1) == 0xff) i += 1
        if (i + 9 >= payload.length) return None
        val marker = u8(i + 1)
        if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
          i += 2 // standalone markers, no length field
        } else {
          val len = be16(i + 2)
          if (len < 2) return None
          val isSof = marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc
          if (isSof) {
            if (i + 9 >= payload.length) return None
            return Some((be16(i + 7), be16(i + 5))) // (width, height)
          }
          i += 2 + len
        }
      }
      None
    } else if (payload.length >= 10 && u8(0) == 'G' && u8(1) == 'I' && u8(2) == 'F' &&
        u8(3) == '8' && (u8(4) == '7' || u8(4) == '9') && u8(5) == 'a') {
      // GIF87a/89a: logical screen descriptor, little-endian at 6/8
      Some((le16(6), le16(8)))
    } else None
  }

  /** Minimal valid PNG header bytes for (w, h) — the synth half of the
    * dims roundtrip (tests/oracle invert it with [[imageDims]]). */
  def pngHeaderBytes(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](24)
    val sig = Array(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt, 0x0d, 0x0a, 0x1a, 0x0a)
    sig.indices.foreach(i => out(i) = sig(i).toByte)
    // IHDR chunk: length 13, type "IHDR", then width/height big-endian
    out(8) = 0; out(9) = 0; out(10) = 0; out(11) = 13
    out(12) = 'I'.toByte; out(13) = 'H'.toByte; out(14) = 'D'.toByte; out(15) = 'R'.toByte
    def putBe32(i: Int, v: Int): Unit = {
      out(i) = (v >>> 24).toByte; out(i + 1) = (v >>> 16).toByte
      out(i + 2) = (v >>> 8).toByte; out(i + 3) = v.toByte
    }
    putBe32(16, w); putBe32(20, h)
    out
  }

  final case class ImageDims(doc_id: Long, width: Long, height: Long)

  /**
   * Synth-then-parse dims pipeline over the documents table: every doc
   * gets a valid PNG header sized from its metadata, and [[imageDims]]
   * recovers the dimensions from the BYTES alone. The oracle recomputes
   * the same dims arithmetically — so the correctness gate proves the
   * parser inverts a real container format, not a stub.
   */
  def dimsPipeline(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val bytes = pngHeaderBytes((nChars % 640 + 1).toInt, (nChars % 480 + 1).toInt)
        val Some((w, h)) = imageDims(bytes)
        ImageDims(id, w.toLong, h.toLong)
      })
      .toDF()
  }

  /**
   * Minimal canonical RIFF/WAVE container (44-byte PCM header: RIFF
   * size + fmt chunk + data chunk declaration) — the audio counterpart
   * of [[pngHeaderBytes]]. All multi-byte fields little-endian per the
   * RIFF spec.
   */
  def wavHeaderBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
      nSamples: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    val dataSize = nSamples * blockAlign
    val out = new Array[Byte](44)
    def putTag(i: Int, s: String): Unit =
      s.indices.foreach(j => out(i + j) = s.charAt(j).toByte)
    def putLe32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
      out(i + 2) = (v >>> 16).toByte; out(i + 3) = (v >>> 24).toByte
    }
    def putLe16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >>> 8).toByte
    }
    putTag(0, "RIFF"); putLe32(4, 36 + dataSize); putTag(8, "WAVE")
    putTag(12, "fmt "); putLe32(16, 16)
    putLe16(20, 1) // PCM
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * blockAlign); putLe16(32, blockAlign)
    putLe16(34, bitsPerSample)
    putTag(36, "data"); putLe32(40, dataSize)
    out
  }

  /**
   * Parse (sampleRate, channels, bitsPerSample, nSamples) from
   * RIFF/WAVE bytes by WALKING THE CHUNK LIST (not fixed offsets — a
   * real WAV may carry LIST/INFO/fact chunks before data; chunk sizes
   * pad to even per the spec). Returns None on anything that is not a
   * plausible PCM WAVE.
   */
  def wavInfo(payload: Array[Byte]): Option[(Int, Int, Int, Long)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      (u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3).toLong << 24)) & 0xffffffffL
    def tag(i: Int): String =
      if (i + 4 <= payload.length) new String(payload, i, 4, "US-ASCII") else ""
    if (payload.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var i = 12
    var fmt: Option[(Int, Int, Int)] = None // (sampleRate, channels, bits)
    var dataSize = -1L
    while (i + 8 <= payload.length && (fmt.isEmpty || dataSize < 0)) {
      val id = tag(i); val size = le32(i + 4)
      if (id == "fmt " && size >= 16 && i + 8 + 16 <= payload.length) {
        val channels = le16(i + 10)
        val rate = le32(i + 12)
        val bits = le16(i + 22)
        if (channels < 1 || rate < 1 || rate > Int.MaxValue || bits < 1) return None
        fmt = Some((rate.toInt, channels, bits))
      } else if (id == "data") {
        dataSize = size
      }
      // chunk sizes pad to even; a data chunk's payload may be absent
      // in a header-only capture — the declared size still counts
      i += 8 + (size + (size & 1L)).toInt
    }
    fmt.flatMap { case (rate, channels, bits) =>
      val blockAlign = channels * bits / 8
      if (dataSize < 0 || blockAlign <= 0) None
      else Some((rate, channels, bits, dataSize / blockAlign))
    }
  }

  /**
   * Minimal ISO BMFF (MP4) container: `ftyp` box + `moov` box holding
   * one `mvhd` (version 0) — the video counterpart of
   * [[pngHeaderBytes]]/[[wavHeaderBytes]]. Box sizes/fields big-endian
   * per ISO 14496-12.
   */
  def mp4HeaderBytes(timescale: Int, duration: Long): Array[Byte] = {
    val ftyp = 16; val mvhdLen = 8 + 100; val moovLen = 8 + mvhdLen
    val out = new Array[Byte](ftyp + moovLen)
    def putTag(i: Int, s: String): Unit =
      s.indices.foreach(j => out(i + j) = s.charAt(j).toByte)
    def putBe32(i: Int, v: Long): Unit = {
      out(i) = (v >>> 24).toByte; out(i + 1) = (v >>> 16).toByte
      out(i + 2) = (v >>> 8).toByte; out(i + 3) = v.toByte
    }
    putBe32(0, ftyp); putTag(4, "ftyp"); putTag(8, "isom"); putBe32(12, 512)
    putBe32(16, moovLen); putTag(20, "moov")
    putBe32(24, mvhdLen); putTag(28, "mvhd")
    // version 0 mvhd: ver/flags(4) ctime(4) mtime(4) timescale(4) duration(4)
    putBe32(32, 0); putBe32(36, 0); putBe32(40, 0)
    putBe32(44, timescale); putBe32(48, duration)
    out
  }

  /**
   * Parse (timescale, duration) from ISO BMFF bytes by walking the
   * top-level box list to `moov`, then its children to `mvhd`
   * (version 0: 32-bit fields; version 1: 64-bit ctime/mtime/duration
   * — both handled). Returns None for anything that is not a
   * plausible MP4.
   */
  def mp4Info(payload: Array[Byte]): Option[(Long, Long)] = {
    def u8(i: Int): Int = payload(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    def be64(i: Int): Long = (be32(i) << 32) | be32(i + 4)
    def tag(i: Int): String =
      if (i + 4 <= payload.length) new String(payload, i, 4, "US-ASCII") else ""
    def walk(from: Int, to: Int, want: String): Option[Int] = {
      var i = from
      while (i + 8 <= to) {
        val size = be32(i)
        if (size < 8) return None // size64/size0 boxes not emitted here
        if (tag(i + 4) == want) return Some(i)
        i += size.toInt
      }
      None
    }
    if (payload.length < 12 || tag(4) != "ftyp") return None
    for {
      moov <- walk(0, payload.length, "moov")
      mvhd <- walk(moov + 8, math.min(payload.length, (moov + be32(moov)).toInt), "mvhd")
      if mvhd + 12 <= payload.length
      version = u8(mvhd + 8)
      info <- version match {
        // v0 duration ends at mvhd+28; v1 (64-bit ctime/mtime/duration)
        // at mvhd+40
        case 0 if mvhd + 28 <= payload.length =>
          Some((be32(mvhd + 20), be32(mvhd + 24)))
        case 1 if mvhd + 40 <= payload.length =>
          Some((be32(mvhd + 28), be64(mvhd + 32)))
        case _ => None
      }
    } yield info
  }

  final case class VideoInfo(doc_id: Long, timescale: Long,
      duration_ticks: Long, duration_ms: Long)

  /**
   * Synth-then-parse video pipeline: every doc gets a valid MP4
   * ftyp+moov/mvhd header parameterized from its metadata; [[mp4Info]]
   * recovers (timescale, duration) from the BYTES alone. Same oracle
   * contract as [[dimsPipeline]]/[[audioPipeline]].
   */
  def videoPipeline(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val timescale = if (nChars % 2 == 0) 90000 else 1000
        val ticks = nChars * 37 + 1
        val bytes = mp4HeaderBytes(timescale, ticks)
        val Some((ts, d)) = mp4Info(bytes)
        VideoInfo(id, ts, d, d * 1000L / ts)
      })
      .toDF()
  }

  final case class AudioInfo(doc_id: Long, sample_rate: Long,
      channels: Long, n_samples: Long, duration_ms: Long)

  /**
   * Synth-then-parse audio pipeline over the documents table: every
   * doc gets a valid RIFF/WAVE header parameterized from its metadata,
   * and [[wavInfo]] recovers rate/channels/sample-count from the BYTES
   * alone (duration derives in exact integer arithmetic). Same
   * contract as [[dimsPipeline]]: the oracle recomputes the fields
   * arithmetically, so a chunk-walk offset slip fails the hash.
   */
  def audioPipeline(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val rate = 8000 + (nChars % 3).toInt * 4000
        val channels = 1 + (nChars % 2).toInt
        val nSamples = (nChars % 100000).toInt + 1
        val bytes = wavHeaderBytes(rate, channels, 16, nSamples)
        val Some((r, c, _, n)) = wavInfo(bytes)
        AudioInfo(id, r.toLong, c.toLong, n, n * 1000L / r)
      })
      .toDF()
  }

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
