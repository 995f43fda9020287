package graft.ops

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("simhash kernel: deterministic, 31-bit, near-dup stability") {
    val t = "THEQUICKBROWNFOXJUMPSOVERTHELAZYDOGTHEQUICKBROWNFOX"
    val a = TextQueries.simhashOf(t)
    assert(a == TextQueries.simhashOf(t))
    assert(a >= 0 && a < (1L << 31))
    // single-char mutation moves few bits
    val b = TextQueries.simhashOf(t.updated(10, 'Z'))
    assert(java.lang.Long.bitCount(a ^ b) <= 8)
  }

  test("hyperplanes are deterministic and balanced-ish") {
    val p1 = Ops.hyperplane(3, 64)
    assert(p1 == Ops.hyperplane(3, 64))
    assert(p1.forall(c => c == 1 || c == -1))
    val pos = (0 until Ops.LshPlanes)
      .map(j => Ops.hyperplane(j, 64).count(_ == 1)).sum
    assert(pos > 300 && pos < 724, s"sign balance off: $pos/1024")
  }

  test("multimodal decode: per-partition pass, magic sniffing, null payloads") {
    val rows = Seq(
      (1L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10)),
      (2L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)),
      (3L, "RIFF1234WAVE".getBytes("UTF-8")),
      (4L, "plain".getBytes("UTF-8")),
      (5L, null)
    )
    import spark.implicits._
    val df = rows.toDF("doc_id", "payload")
    val got = MultimodalOps.decodeMeta(spark, df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "png", 2L -> "jpeg", 3L -> "riff",
      4L -> "unknown", 5L -> "unknown"))
  }

  test("real image decode: ImageIO reads true dimensions and pixels") {
    import spark.implicits._
    // synthesize a genuine 20x10 PNG: left half black, right half white
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val payload = png(20, 10)
    val meta = MultimodalOps.decode(payload)
    assert(meta.format == "png" && meta.width == 20 && meta.height == 10)
    assert(meta.nBytes == payload.length)

    // the distributed pass agrees, and non-images fall back to the stub
    val df = Seq((1L, payload), (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val got = MultimodalOps.decodeMeta(spark, df, "doc_id", "payload")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(got(1L) == (("png", 20, 10)))
    assert(got(2L)._1 == "unknown")

    // feature extraction: 2x2 grid — left column dark, right column bright
    val feats = MultimodalOps.imageFeatures(spark, df, "doc_id", "payload", 2)
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[scala.collection.Seq[Double]](1)).map(_.toSeq).orNull)
      .toMap
    val f = feats(1L)
    assert(f.length == 4)
    assert(f(0) < 1.0 && f(2) < 1.0, s"left cells should be black: $f")
    assert(f(1) > 254.0 && f(3) > 254.0, s"right cells should be white: $f")
    assert(feats(2L) == null, "non-image must yield null features")
  }

  test("frame sampling emits n deterministic slices per row") {
    import spark.implicits._
    val df = Seq((1L, ("AB" * 100).getBytes("UTF-8"))).toDF("id", "payload")
    val frames = MultimodalOps.sampleFrames(df, "id", "payload", 4, 16).collect()
    assert(frames.length == 4)
    assert(frames.map(_.getInt(1)).toSeq == Seq(0, 1, 2, 3))
    assert(frames.forall(_.getAs[Array[Byte]](2).length == 16))
  }

  test("substring dups: hashed+verified scale form == string-grouped form") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val plain = rows(TextQueries.substringDups(spark, sf, L = 20))
    val hashed = rows(TextQueries.substringDupsHashed(spark, sf, L = 20))
    assert(plain.nonEmpty, "fixture should contain shared substrings")
    assert(hashed == plain)
  }

  test("IVF ANN: recall@5 vs brute force is high, never all-pairs") {
    val brute = EmbeddingQueries.knn(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (v, rs) => v -> rs.map(_.getLong(2)).toSet }
    val ivf = EmbeddingQueries.ivf(spark, sf).collect()
      .groupBy(_.getLong(0))
      .map { case (v, rs) => v -> rs.map(_.getLong(2)).toSet }
    // recall@5: fraction of true top-5 neighbors found within the cell
    val hits = brute.map { case (v, truth) =>
      truth.intersect(ivf.getOrElse(v, Set.empty)).size
    }.sum
    val recall = hits.toDouble / brute.map(_._2.size).sum
    assert(recall >= 0.5, f"IVF recall@5 = $recall%.3f too low")
    // and the candidate set is genuinely bucketed: no vector was compared
    // against (nearly) everything
    assert(ivf.values.forall(_.size <= 5))
  }

  test("embedding cosine near-dup clusters: every vector labeled, label = min id") {
    val c = EmbeddingQueries.embeddingDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c.size == 500)
    // labels are cluster minima
    val byLabel = c.groupBy(_._2).view.mapValues(_.keys.min).toMap
    assert(byLabel.forall { case (label, minMember) => label == minMember })
  }

  test("embedding knn: every query vector gets exactly k ranked neighbors") {
    val knn = EmbeddingQueries.knn(spark, sf).collect()
    val byVec = knn.groupBy(_.getLong(0))
    assert(byVec.size == 500)
    assert(byVec.values.forall(_.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("bucketed ANN neighbors are a subset of brute-force candidate space") {
    val buckets = EmbeddingQueries.lshBuckets(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ann = EmbeddingQueries.annBucketed(spark, sf).collect()
    assert(ann.nonEmpty)
    // every returned neighbor shares the query's bucket (the ANN contract)
    assert(ann.forall(r => buckets(r.getLong(0)) == buckets(r.getLong(2))))
  }

  test("lang-id tie-break order is en > de > fr > es") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-langid").toString
    Seq((1L, "nothing matches here", "xx", "s", 20L),
      (2L, "the und le el", "xx", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = TextQueries.langId(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getString(5)).toMap
    assert(got == Map(1L -> "en", 2L -> "en")) // all-zero and all-equal -> en
  }
}
