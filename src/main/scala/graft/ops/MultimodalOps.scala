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

  /** STUB decoder for non-image payloads — deterministic fake, NOT a real
    * codec (audio/video libraries are absent in this container).
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

  /** Real decode when an image reader claims the bytes, stub otherwise. */
  def decode(payload: Array[Byte]): MediaMeta = {
    val p = if (payload == null) Array.emptyByteArray else payload
    decodeImageMeta(p).getOrElse(decodeStub(p))
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
