package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 "multimodal").
  *
  * Media are opaque `binary` columns with typed metadata travelling
  * beside them. The corpus has no real media, so payloads are
  * SYNTHESIZED — but with REAL container headers: a valid PNG
  * signature + IHDR chunk (with a genuine CRC32), a valid 44-byte
  * RIFF/WAVE PCM header, and a minimal MP4 ftyp/moov/trak/tkhd box
  * tree. Metadata extraction then parses the ACTUAL header fields
  * back out of the bytes — magic, big/little-endian dimension and
  * sample-rate fields — exactly as a container sniffer would, with
  * payloads whose magic doesn't match any known container quarantined
  * to a typed error column instead of failing the scan.
  *
  * Both directions are pure native expressions (concat/substring/
  * hex/unhex/conv — whole-stage-codegen'd, no UDF, no codec): header
  * synthesis and header parsing are byte arithmetic, which Spark
  * expresses directly. Only PIXEL/SAMPLE decode would need a codec
  * library; that step slots into the typed mapPartitions shape
  * [[sampleFrames]] demonstrates (one decoder init per partition,
  * streamed rows, nothing collected to the driver).
  *
  * At 100 TB: payloads stay columnar/binary end to end, header
  * parsing is codegen'd per row inside the scan stage, decode
  * parallelism = partition count.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  case class Frame(doc_id: Long, frame_idx: Int, frame_len: Int)

  /** Header sizes by container (synthesis and body-extraction agree). */
  val PngHeaderLen = 33   // 8 signature + 25 IHDR chunk (len+type+13+CRC)
  val WavHeaderLen = 44   // canonical RIFF/WAVE PCM header
  val Mp4HeaderLen = 124  // 16 ftyp + 108 moov(trak(tkhd))

  // ---- binary builders (native expressions) ----

  /** 4-byte big-endian binary of a non-negative integral column. */
  private def be32(c: Column): Column = unhex(lpad(hex(c), 8, "0"))

  /** 4-byte little-endian binary: big-endian hex with bytes reversed. */
  private def le32(c: Column): Column = {
    val h = lpad(hex(c), 8, "0")
    unhex(concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2)))
  }

  /** 2-byte little-endian binary. */
  private def le16(c: Column): Column = {
    val h = lpad(hex(c), 4, "0")
    unhex(concat(substring(h, 3, 2), substring(h, 1, 2)))
  }

  private def bytesLit(bs: Array[Byte]): Column = lit(bs)
  private def ascii(s: String): Column = lit(s.getBytes("US-ASCII"))

  private val PngSig: Array[Byte] =
    Array(0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** ISO 14496-12 unity transform matrix (the 36-byte tkhd field). */
  private val UnityMatrix: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(36)
    Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
      .foreach(bb.putInt)
    bb.array()
  }

  // Deterministic per-doc metadata planted INTO the headers (and
  // re-derivable from the text by the DuckDB oracle): dimensions from
  // the body length, sample rate banded over common audio rates.
  private def widthOf(blen: Column): Column = lit(64) + blen % 640
  // length * 7 wraps Int negative past ~307 MB bodies (ANSI mode makes
  // it a task failure instead) — multiply in long space; the oracle's
  // octet_length is already BIGINT
  private def heightOf(blen: Column): Column =
    (lit(48L) + (blen.cast("long") * 7) % 480).cast("int")
  private def rateOf(blen: Column): Column = lit(8000) + (blen % 8) * 4000
  private def chansOf(blen: Column): Column = lit(1) + blen % 2

  /** Attach a synthesized binary payload to the documents table: a
    * REAL container header (PNG / WAV / MP4 by doc_id mod 3) followed
    * by the UTF-8 text bytes as the opaque body. */
  def withPayload(docs: DataFrame): DataFrame = {
    val body = encode(col("text"), "UTF-8")
    val blen = octet_length(body)

    // PNG: signature, then IHDR with width/height big-endian and a
    // genuine CRC32 over (chunk type ++ chunk data)
    val ihdrData = concat(be32(widthOf(blen)), be32(heightOf(blen)),
      bytesLit(Array[Byte](8, 6, 0, 0, 0)))
    val png = concat(bytesLit(PngSig), be32(lit(13)), ascii("IHDR"), ihdrData,
      be32(crc32(concat(ascii("IHDR"), ihdrData))), body)

    // WAV: canonical 44-byte PCM header, little-endian fields
    val sr = rateOf(blen)
    val ch = chansOf(blen)
    val wav = concat(ascii("RIFF"), le32(lit(36) + blen), ascii("WAVE"),
      ascii("fmt "), le32(lit(16)), le16(lit(1)), le16(ch), le32(sr),
      le32(sr * ch * 2), le16(ch * 2), le16(lit(16)),
      ascii("data"), le32(blen), body)

    // MP4: ftyp box, then moov > trak > tkhd with 16.16 fixed-point
    // width/height in the real tkhd positions (unity matrix included)
    val tkhd = concat(be32(lit(92)), ascii("tkhd"),
      bytesLit(Array.fill[Byte](40)(0)), bytesLit(UnityMatrix),
      be32(widthOf(blen) * 65536), be32(heightOf(blen) * 65536))
    val mp4 = concat(be32(lit(16)), ascii("ftyp"), ascii("isom"), be32(lit(0)),
      be32(lit(108)), ascii("moov"), be32(lit(100)), ascii("trak"), tkhd, body)

    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, png)
        .when(col("doc_id") % 3 === 1, wav)
        .otherwise(mp4).as("payload"),
      (when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4")).as("media_type"))
  }

  /** Plant corrupt payloads: every `everyN`-th doc_id has its first 8
    * bytes zeroed — breaking the PNG signature, the RIFF tag and the
    * ftyp box type — so the decode path's quarantine is exercised on
    * real data, the way a crawler corpus always carries truncated or
    * mislabeled media. */
  def withCorruption(media: DataFrame, everyN: Int = 97): DataFrame =
    media.withColumn("payload",
      when(col("doc_id") % everyN === 0,
        concat(bytesLit(Array.fill[Byte](8)(0)),
          substring(col("payload"), 9, Int.MaxValue)))
        .otherwise(col("payload")))

  // ---- header parsing (native expressions) ----

  /** Big-endian unsigned int read: `len` bytes at 1-based `pos`. */
  private def beRead(p: Column, pos: Int, len: Int): Column =
    conv(hex(substring(p, pos, len)), 16, 10).cast("int")

  /** Little-endian unsigned int read: reverse the byte order in hex. */
  private def leRead(p: Column, pos: Int, len: Int): Column =
    conv(concat((0 until len).reverse.map(i =>
      hex(substring(p, pos + i, 1))): _*), 16, 10).cast("int")

  /** Parse container metadata from the payload's REAL header bytes.
    * Emits one row per input with a typed error column: rows whose
    * magic matches no known container get format/dimensions null and
    * the error set — quarantined, never a task failure. Pure codegen'd
    * expressions; the media_type column is deliberately NOT consulted
    * (containers are identified by magic, as a sniffer must — labels
    * lie in crawled corpora). */
  def extractMeta(spark: SparkSession, media: DataFrame): DataFrame = {
    val p = col("payload")
    val isPng = substring(p, 1, 8) === bytesLit(PngSig)
    val isWav = substring(p, 1, 4) === ascii("RIFF") &&
      substring(p, 9, 4) === ascii("WAVE")
    val isMp4 = substring(p, 5, 4) === ascii("ftyp")
    val format = when(isPng, "PNG").when(isWav, "WAV").when(isMp4, "MP4")
    media.select(
      col("doc_id"),
      octet_length(p).as("byte_len"),
      format.as("format"),
      // PNG: IHDR width/height big-endian at 17/21; MP4: tkhd 16.16
      // fixed-point at 117/121 (after ftyp16 + moov8 + trak8 + 84)
      when(isPng, beRead(p, 17, 4))
        .when(isMp4, beRead(p, 117, 4) / 65536).cast("int").as("width"),
      when(isPng, beRead(p, 21, 4))
        .when(isMp4, beRead(p, 121, 4) / 65536).cast("int").as("height"),
      // WAV fmt chunk: sample rate LE32 at 25, channels LE16 at 23
      when(isWav, leRead(p, 25, 4)).as("sample_rate"),
      when(isWav, leRead(p, 23, 2)).as("channels"),
      when(format.isNull, "unknown container magic").as("error"))
  }

  /** Strip the container header, returning the opaque body — content
    * addressing for dedup hashes the BODY, so identical content in
    * different containers (or re-muxed copies) dedups together. An
    * unknown container keeps its full bytes (no header to strip). */
  def body(p: Column): Column = {
    val headerLen =
      when(substring(p, 1, 8) === bytesLit(PngSig), PngHeaderLen)
        .when(substring(p, 1, 4) === ascii("RIFF") &&
          substring(p, 9, 4) === ascii("WAVE"), WavHeaderLen)
        .when(substring(p, 5, 4) === ascii("ftyp"), Mp4HeaderLen)
        .otherwise(0)
    substring(p, headerLen + 1, lit(Int.MaxValue))
  }

  /** 64-bit dHash of the media body as FOUR 16-bit band values — the
    * perceptual-hash shape (row-wise adjacent-pixel gradient signs
    * over an 8×9 grayscale thumbnail) with the pixel DECODE stubbed
    * deterministically: the "thumbnail" samples the body at 72 evenly
    * spaced byte offsets (pos(t) = 1 + ⌊t·len/72⌋ — a real decoder
    * slots in at exactly this point via the [[sampleFrames]]
    * mapPartitions shape, everything downstream unchanged). Returning
    * the bands directly (b = Σ_j bit(16b+j)·2^j, each < 2^16) keeps
    * the banding join sign-free and lets hamming distance sum
    * per-band XOR popcounts. Fully unrolled native expressions
    * (substr/conv/when — codegen'd, no UDF, no HOF lambdas): ~200
    * nodes once per row, never per pair. */
  def dhashBands(bodyCol: Column): Column = {
    val blen = octet_length(bodyCol)
    def px(t: Int): Column =
      conv(hex(bodyCol.substr(
        (floor(lit(t) * blen / 72) + 1).cast("int"), lit(1))), 16, 10)
        .cast("long")
    array((0 until 4).map { b =>
      (0 until 16).map { j =>
        val k = b * 16 + j
        val a = (k / 8) * 9 + (k % 8) // pixel grid: 8 rows × 9 cols
        when(px(a) < px(a + 1), lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** The 72 dHash byte samples as ONE array<long> column — the
    * [[audioEnergyGrid]] recipe applied to the image arm: the unrolled
    * [[dhashBands]] form inlines the body-strip subtree into all 144
    * sample sites (~5k expression nodes once the header when-chain is
    * substituted), and at gate sizes that tree's per-plan Catalyst
    * analysis, not row work, was the query's cost (the audio arm
    * measured ~3.5 s of driver-side analysis for its 240-site unroll
    * and split exactly this way). One transform lambda ≈ 15 nodes;
    * sample t is pos = 1 + ⌊t·len/72⌋ — bit-identical arithmetic to
    * dhashBands' px(). Callers materialize this column (checkpoint)
    * before [[dhashBandsFromGrid]], since interior samples feed two
    * gradient bits. */
  def dhashSampleGrid(bodyCol: Column): Column = {
    val blen = octet_length(bodyCol)
    transform(sequence(lit(0), lit(71)), t =>
      conv(hex(bodyCol.substr(
        (floor(t * blen / 72) + lit(1)).cast("int"), lit(1))), 16, 10)
        .cast("long"))
  }

  /** dHash bands from a MATERIALIZED sample grid: 64 comparisons on
    * element_at — a small tree over an already-computed column, the
    * [[audioFpBandsFromGrid]] shape. Identical bit layout to
    * [[dhashBands]]: bit j of band b compares grid cells a and a+1
    * with a = (k/8)·9 + k%8, k = 16b + j. */
  def dhashBandsFromGrid(gridCol: Column): Column = {
    def px(t: Int): Column = element_at(gridCol, t + 1)
    array((0 until 4).map { b =>
      (0 until 16).map { j =>
        val k = b * 16 + j
        val a = (k / 8) * 9 + (k % 8)
        when(px(a) < px(a + 1), lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** 64-bit chromaprint-style AUDIO fingerprint of the media body as
    * FOUR 16-bit band values — the acoustic arm of the perceptual
    * family (Chromaprint/AcoustID's public design: per-frame spectral
    * band energies, fingerprint bits from energy GRADIENTS across
    * consecutive frames; the Shazam landmark family, Wang 2003, is
    * the sparser cousin). The spectral DECODE is the deterministic
    * byte-sampling stub (the [[dhashBands]] contract): a 5-frame ×
    * 16-band "energy" grid where E(t, b) sums 3 evenly spaced body
    * bytes (pos = 1 + ⌊idx·len/240⌋), and bit j of band value t is
    * the sign of E(t+1, j) − E(t, j) — 4 time-deltas × 16 spectral
    * bands = 64 bits. A real FFT/chroma filterbank slots in at the
    * energy() seam, everything downstream (banding join, hamming
    * cut) unchanged.
    *
    * The 5-frame × 16-band energy GRID as one array<long> column (row
    * major, frame-outer; grid cell g = frame·16 + band sums sampled
    * bytes 3g..3g+2 — the flattened index IS contiguous in the sample
    * sequence). Built with HOF lambdas instead of 240 unrolled
    * sample sites: the unrolled form's ~2000-node tree cost ~3.5 s of
    * DRIVER-side Catalyst analysis per plan (measured — row work and
    * codegen were not the bottleneck), where the two-lambda form is
    * ~50 nodes and per-element interpretation over 240×|rows| values
    * is noise. Callers materialize this column (checkpoint — the
    * mm_phash rule) before [[audioFpBandsFromGrid]], since each
    * interior frame's energy feeds TWO gradient bits. */
  def audioEnergyGrid(bodyCol: Column): Column = {
    val blen = octet_length(bodyCol)
    // ONE lambda, three direct extractions per cell — a nested
    // bytes-array lambda would re-evaluate the whole inner transform
    // per element_at (HOFs interpret their subtree per element),
    // turning 240 extractions/row into 57,600
    transform(sequence(lit(0), lit(79)), g =>
      (0 until 3).map { i =>
        conv(hex(bodyCol.substr(
          (floor((g * 3 + lit(i)) * blen / 240) + lit(1)).cast("int"),
          lit(1))), 16, 10).cast("long")
      }.reduce(_ + _))
  }

  /** Fingerprint bands from a MATERIALIZED energy grid: 64 cell
    * comparisons on element_at — a small tree over an already-computed
    * column. */
  def audioFpBandsFromGrid(gridCol: Column): Column = {
    def cell(t: Int, b: Int): Column = element_at(gridCol, t * 16 + b + 1)
    array((0 until 4).map { t =>
      (0 until 16).map { j =>
        when(cell(t + 1, j) > cell(t, j), lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** One-shot form (each gradient bit re-derives its two energies —
    * ~2× the sample sites; prefer the grid/bands split with a
    * checkpoint in between for query plans). */
  def audioFpBands(bodyCol: Column): Column = {
    val blen = octet_length(bodyCol)
    def byteAt(idx: Int): Column =
      conv(hex(bodyCol.substr(
        (floor(lit(idx) * blen / 240) + 1).cast("int"), lit(1))), 16, 10)
        .cast("long")
    def energy(t: Int, b: Int): Column =
      (0 until 3).map(i => byteAt(t * 48 + b * 3 + i)).reduce(_ + _)
    array((0 until 4).map { t =>
      (0 until 16).map { j =>
        when(energy(t + 1, j) > energy(t, j), lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
  }

  /** Deterministic frame/chunk sampling over the media BODY: split
    * into `frameBytes` chunks, keep every `stride`-th. Typed
    * mapPartitions shape — this is where a real per-partition codec
    * init would live. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   frameBytes: Int = 64, stride: Int = 4): Dataset[Frame] = {
    // fail fast like every other parameterized operator: stride = 0
    // would throw ArithmeticException per row inside the task and a
    // non-positive frameBytes divides by zero or silently emits nothing
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride > 0, s"stride must be positive, got $stride")
    import spark.implicits._
    media.withColumn("payload", body(col("payload")))
      .as[MediaRow].flatMap { r =>
        val nFrames = (r.payload.length + frameBytes - 1) / frameBytes
        (0 until nFrames).filter(_ % stride == 0).map { i =>
          val len = math.min(frameBytes, r.payload.length - i * frameBytes)
          Frame(r.doc_id, i, len)
        }
      }
  }
}
