package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata structs, processed in batch-shaped
  * partition passes (the Scala analogue of `mapInPandas`: one reusable
  * decoder per partition, rows streamed through it).
  *
  * The codec libraries are not in this container, so the *decode* step is a
  * STUB — a deterministic fake that sniffs magic bytes and fabricates
  * dimensions from the payload hash. Everything around it (schema, batch
  * shape, partition pass, null discipline) is real and tested; swapping the
  * stub for javax.imageio / a JNI codec changes only `decodeStub`.
  */
object MultimodalOps {

  final case class MediaMeta(format: String, width: Int, height: Int,
      nBytes: Long)

  /** STUB decoder — deterministic fake, NOT a real codec. */
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

  /** Per-partition decode pass over a binary column: (key, payload) ->
    * (key, format, width, height, n_bytes). The decoder instance is created
    * once per partition — the batch shape a real codec needs.
    */
  def decodeMeta(spark: SparkSession, df: DataFrame, keyCol: String,
      binCol: String): DataFrame = {
    import spark.implicits._
    df.select(col(keyCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs allocate here, once per partition
        it.map { case (k, payload) =>
          val m = decodeStub(if (payload == null) Array.emptyByteArray else payload)
          (k, m.format, m.width, m.height, m.nBytes)
        }
      }
      .toDF(keyCol, "format", "width", "height", "n_bytes")
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
