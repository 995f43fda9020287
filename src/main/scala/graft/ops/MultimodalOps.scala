package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs, processed in batch-shaped
  * partition passes (the Scala analogue of `mapInPandas`: one reusable
  * decoder per partition, rows streamed through it).
  *
  * The IMAGE path is real: javax.imageio (in the JDK — png/jpeg/bmp/gif)
  * decodes dimensions header-only and pixels for feature extraction.
  * Audio/video codecs are not in this container, so non-image payloads fall
  * back to a clearly-named deterministic stub for dimensions; the Spark
  * plumbing (schema, partition pass, null discipline) is identical for
  * both, so swapping in a JNI codec changes only the per-row decode call.
  */
object MultimodalOps {

  final case class MediaMeta(format: String, width: Int, height: Int,
      nBytes: Long)

  /** Real image metadata via ImageIO — reads the HEADER only (dimensions
    * come from the format header, no pixel decode), the shape that survives
    * 100 TB of payload columns. None when no installed reader claims the
    * bytes.
    */
  def decodeImageMeta(payload: Array[Byte]): Option[MediaMeta] = {
    if (payload == null || payload.length == 0) return None
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(in)
          Some(MediaMeta(r.getFormatName.toLowerCase, r.getWidth(0),
            r.getHeight(0), payload.length.toLong))
        } finally r.dispose()
      }
    } catch { case _: Exception => None }
    finally if (in != null) in.close()
  }

  final case class AudioMeta(format: String, channels: Int,
      sampleRateHz: Int, bitsPerSample: Int, nFrames: Long)
  final case class VideoMeta(format: String, brand: String, timescale: Long,
      durationTicks: Long, width: Int, height: Int)

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xFFL) | ((b(o + 1) & 0xFFL) << 8) |
      ((b(o + 2) & 0xFFL) << 16) | ((b(o + 3) & 0xFFL) << 24)
  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def u64be(b: Array[Byte], o: Int): Long =
    (u32be(b, o) << 32) | u32be(b, o + 4)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** REAL audio metadata from a RIFF/WAVE header — the fmt chunk is plain
    * little-endian fields, no codec needed (format spec is public:
    * multimedia.cx/mirror of the Microsoft RIFF docs). Walks the chunk list
    * for `fmt ` (channels, sample rate, bits) and `data` (frame count =
    * dataBytes / blockAlign). None when the bytes are not RIFF/WAVE or the
    * fmt chunk is missing/truncated.
    */
  def decodeWavMeta(payload: Array[Byte]): Option[AudioMeta] = {
    val b = payload
    if (b == null || b.length < 12 || tag(b, 0) != "RIFF" ||
      tag(b, 8) != "WAVE") return None
    // Long offsets: a chunk-size field is unsigned 32-bit, so Int math on
    // adversarial sizes (e.g. 0xFFFFFFF8) would advance by <= 0 and loop
    // forever; with Long arithmetic an oversized chunk just runs o past
    // the payload and the walk terminates
    var o = 12L
    var fmt: Option[(Int, Int, Int, Int)] = None // channels, rate, bits, blockAlign
    var dataBytes = -1L
    while (o + 8 <= b.length) {
      val oi = o.toInt
      val id = tag(b, oi)
      val sz = u32le(b, oi + 4)
      if (id == "fmt " && sz >= 16 && o + 8 + 16 <= b.length) {
        // the rate field is unsigned 32-bit; a value above Int.MaxValue is
        // no real sample rate — treat the chunk as malformed rather than
        // letting .toInt wrap it into a silently-negative sampleRateHz
        val rate = u32le(b, oi + 12)
        if (rate <= Int.MaxValue)
          fmt = Some((u16le(b, oi + 10), rate.toInt,
            u16le(b, oi + 22), u16le(b, oi + 20)))
      }
      else if (id == "data") dataBytes = sz
      o += 8L + sz + (sz & 1L) // chunks are word-aligned
    }
    fmt.map { case (ch, rate, bits, blockAlign) =>
      val frames =
        if (dataBytes >= 0 && blockAlign > 0) dataBytes / blockAlign else -1L
      AudioMeta("wav", ch, rate, bits, frames)
    }
  }

  /** REAL video metadata from ISO BMFF (MP4) box headers — box framing,
    * `ftyp` brand, `moov/mvhd` timescale+duration and `moov/trak/tkhd`
    * 16.16-fixed-point presentation dimensions are all plain big-endian
    * header fields, parseable without any codec (public spec: ISO/IEC
    * 14496-12). None when the bytes are not BMFF.
    */
  def decodeMp4Meta(payload: Array[Byte]): Option[VideoMeta] = {
    val b = payload
    if (b == null || b.length < 12 || tag(b, 4) != "ftyp") return None
    var brand = ""
    var timescale = 0L
    var duration = 0L
    var width = 0
    var height = 0
    // Iterative DFS over (offset, until, depth) ranges on an explicit
    // stack: a crafted payload of 8-byte nested containers would drive a
    // recursive walk to ~payload/8 stack frames (executor-killing
    // StackOverflowError); the heap stack is bounded by the same depth cap.
    // Real BMFF nests < 10 container levels (ISO/IEC 14496-12 box tree).
    val maxDepth = 16
    var stack: List[(Long, Long, Int)] = (0L, b.length.toLong, 0) :: Nil
    while (stack.nonEmpty) {
      var (o, until, depth) = stack.head
      stack = stack.tail
      var walking = true
      while (walking && o + 8 <= until) {
        val sz32 = u32be(b, o.toInt)
        // size == 1 -> 64-bit `largesize` follows the type (a moov after a
        // > 4 GiB mdat is reachable only through this); size == 0 -> box
        // extends to the end of the enclosing range (legal for a trailing
        // mdat). `sz > until - o` (not `o + sz > until`) so an adversarial
        // largesize near Long.MaxValue cannot overflow the bound check.
        val hdr: Long = if (sz32 == 1L) 16L else 8L
        val sz: Long =
          if (sz32 == 1L) { if (o + 16 <= until) u64be(b, o.toInt + 8) else -1L }
          else if (sz32 == 0L) until - o
          else sz32
        if (sz < hdr || sz > until - o) walking = false // malformed: stop, keep parsed
        else {
          val id = tag(b, o.toInt + 4)
          val p = (o + hdr).toInt // payload start (header is 8 or 16 bytes)
          // field reads are bounded by the box's OWN declared end, not just
          // the enclosing range — a short box must not read its sibling's
          // bytes as field values (e.g. an sz=8 ftyp reporting the next
          // box's size field as the brand)
          val end = (o + sz).toInt
          id match {
            case "ftyp" if p + 4 <= end => brand = tag(b, p)
            case "moov" | "trak" if depth < maxDepth => // containers
              // preserve DFS order: finish this range after the container
              stack = ((o + hdr, o + sz, depth + 1)) ::
                ((o + sz, until, depth)) :: stack
              walking = false
            case "mvhd" if p + 4 <= end =>
              val v = b(p) & 0xFF
              if (v == 1 && p + 4 + 16 + 12 <= end) {
                timescale = u32be(b, p + 4 + 16)
                duration = u64be(b, p + 4 + 20)
              } else if (v == 0 && p + 4 + 8 + 8 <= end) {
                timescale = u32be(b, p + 4 + 8)
                duration = u32be(b, p + 4 + 12)
              }
            case "tkhd" if p + 4 <= end =>
              val v = b(p) & 0xFF
              val base = p + 4 // past version+flags
              // v0 body: creation/mod/track/reserved/duration (20) + reserved
              // (8) + layer/alt/volume/reserved (8) + matrix (36) = 72 to
              // width; v1 widens the three time fields by 4 each (+12)
              val wOff = if (v == 1) base + 84 else base + 72
              if (wOff + 8 <= end) {
                width = (u32be(b, wOff) >> 16).toInt // 16.16 fixed point
                height = (u32be(b, wOff + 4) >> 16).toInt
              }
            case _ => ()
          }
          if (walking) o += sz
        }
      }
    }
    Some(VideoMeta("mp4", brand, timescale, duration, width, height))
  }

  /** STUB decoder — reached ONLY by payloads no real parser claims: not an
    * image (ImageIO), not RIFF/WAVE, not ISO BMFF. Deterministic fake dims,
    * NOT a real codec (pixel/sample-data decoding libraries are absent in
    * this container; header metadata above is real).
    */
  def decodeStub(payload: Array[Byte]): MediaMeta = {
    val format =
      if (payload.length >= 8 &&
        (payload(0) & 0xFF) == 0x89 && payload(1) == 'P') "png"
      else if (payload.length >= 3 &&
        (payload(0) & 0xFF) == 0xFF && (payload(1) & 0xFF) == 0xD8) "jpeg"
      else if (payload.length >= 4 && payload(0) == 'R' && payload(1) == 'I' &&
        payload(2) == 'F' && payload(3) == 'F') "riff"
      else "unknown"
    // fabricated-but-deterministic dims: stable across runs and partitions
    var h = 1125899906842597L
    payload.foreach(b => h = 31 * h + b)
    val w = 16 + math.floorMod(h, 1024).toInt
    val ht = 16 + math.floorMod(h >> 10, 1024).toInt
    MediaMeta(format, w, ht, payload.length.toLong)
  }

  /** Real decode when a header parser claims the bytes (image via ImageIO,
    * WAV fmt chunk, MP4 boxes), stub ONLY for unknown formats. Audio has no
    * visual dimensions: width/height are 0 (the typed fields live in
    * [[mediaInfo]]).
    */
  def decode(payload: Array[Byte]): MediaMeta = {
    val p = if (payload == null) Array.emptyByteArray else payload
    decodeImageMeta(p)
      .orElse(decodeWavMeta(p).map(_ =>
        MediaMeta("wav", 0, 0, p.length.toLong)))
      .orElse(decodeMp4Meta(p).map(v =>
        MediaMeta(v.format, v.width, v.height, p.length.toLong)))
      .getOrElse(decodeStub(p))
  }

  /** Full typed-metadata partition pass over a mixed media column:
    * (key, payload) -> (key, kind, format, width, height, channels,
    * sample_rate, bits, n_frames, timescale, duration_ticks, n_bytes) with
    * -1 for fields the modality doesn't carry. Same batch shape as
    * [[decodeMeta]]; only the header fields are real for audio/video —
    * sample/pixel decode still needs codecs this container lacks.
    */
  def mediaInfo(spark: SparkSession, df: DataFrame, keyCol: String,
      binCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (k, payload) =>
          val p = if (payload == null) Array.emptyByteArray else payload
          decodeImageMeta(p) match {
            case Some(m) =>
              (k, "image", m.format, m.width, m.height, -1, -1, -1, -1L, -1L,
                -1L, p.length.toLong)
            case None => decodeWavMeta(p) match {
              case Some(a) =>
                (k, "audio", a.format, -1, -1, a.channels, a.sampleRateHz,
                  a.bitsPerSample, a.nFrames, -1L, -1L, p.length.toLong)
              case None => decodeMp4Meta(p) match {
                case Some(v) =>
                  (k, "video", v.format, v.width, v.height, -1, -1, -1, -1L,
                    v.timescale, v.durationTicks, p.length.toLong)
                case None =>
                  val m = decodeStub(p)
                  (k, "unknown", m.format, m.width, m.height, -1, -1, -1,
                    -1L, -1L, -1L, p.length.toLong)
              }
            }
          }
        }
      }
      .toDF(keyCol, "kind", "format", "width", "height", "channels",
        "sample_rate", "bits", "n_frames", "timescale", "duration_ticks",
        "n_bytes")
  }

  /** Per-partition decode pass over a binary column: (key, payload) ->
    * (key, format, width, height, n_bytes). The decoder runs inside one
    * partition iterator — the batch shape a heavyweight codec needs.
    */
  def decodeMeta(spark: SparkSession, df: DataFrame, keyCol: String,
      binCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (k, payload) =>
          val m = decode(payload)
          (k, m.format, m.width, m.height, m.nBytes)
        }
      }
      .toDF(keyCol, "format", "width", "height", "n_bytes")
  }

  /** Real image feature extraction: decode pixels (ImageIO), mean-pool
    * luminance onto a grid x grid raster (the resize step), emit the
    * flattened feature vector — null for payloads no reader can decode.
    * Output: (key, features: array<double> of grid*grid).
    */
  def imageFeatures(spark: SparkSession, df: DataFrame, keyCol: String,
      binCol: String, grid: Int = 8): DataFrame = {
    import spark.implicits._
    val g = grid
    df.select(col(keyCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (k, payload) =>
          (k, decodeLuminanceGrid(payload, g))
        }
      }
      .toDF(keyCol, "features")
  }

  /** Pixel decode + grid mean-pool (driver-free, one image in memory at a
    * time). Exposed for direct unit testing.
    */
  def decodeLuminanceGrid(payload: Array[Byte], grid: Int): Array[Double] = {
    if (payload == null || payload.length == 0) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](grid * grid)
    val counts = new Array[Long](grid * grid)
    var y = 0
    while (y < h) {
      val gy = math.min(y * grid / h, grid - 1)
      var x = 0
      while (x < w) {
        val gx = math.min(x * grid / w, grid - 1)
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        val cell = gy * grid + gx
        sums(cell) += lum
        counts(cell) += 1
        x += 1
      }
      y += 1
    }
    val out = new Array[Double](grid * grid)
    var i = 0
    while (i < out.length) {
      out(i) = if (counts(i) == 0) 0.0 else sums(i) / counts(i)
      i += 1
    }
    out
  }

  /** Frame-sampling shape: slice `n` deterministic byte windows from a
    * binary payload (what frame extraction does to video) — pure Spark
    * `functions`, fully codegen'd.
    */
  def sampleFrames(df: DataFrame, keyCol: String, binCol: String,
      n: Int, frameBytes: Int): DataFrame =
    df.select(col(keyCol), posexplode(
      transform(sequence(lit(0), lit(n - 1)), i =>
        substring(col(binCol),
          (i * greatest((octet_length(col(binCol)) - frameBytes) / n, lit(1)) + 1)
            .cast("int"),
          lit(frameBytes)))))
      .toDF(keyCol, "frame_idx", "frame_bytes")
}
