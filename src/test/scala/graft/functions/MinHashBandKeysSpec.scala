package graft.functions

import graft.SparkSpec
import graft.core.{MinHasher, MinHashParams}
import graft.pipeline.DedupPipeline

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class MinHashBandKeysSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def udfKeys(p: MinHashParams, raw: String): Seq[Long] = {
    // the reference path: upper + strip non-A-Z (as Spark's upper() does),
    // then the verified MinHasher kernel
    val up = UTF8String.fromString(raw).toUpperCase.toString
    val norm = up.filter(ch => ch >= 'A' && ch <= 'Z')
    new MinHasher(p).bandKeys(norm).toSeq
  }

  test("kernel == normalize+MinHasher on random, exotic, and edge inputs") {
    val p = MinHashParams(numHashes = 8)
    val kernel = new BandKeyKernel(p)
    val rng = new scala.util.Random(61)
    val cases = Seq(
      "", "A", "ABCDE", "ABCDEF", "ABCDEFG", // below/at/above the k=6 gate
      "abcdefg", "AbCdEfGh", // case folding
      "ab, cd! ef\ngh12ij", // punctuation/digits stripped
      "straße größe", // ß: full uppercase mapping differs from simple
      "ınanç ISPARTA", // dotless i
      "日本語テキストabcdefgh", // non-ASCII + ASCII mix
      "ABCDEF" * 20 // repeated shingles (multiset duplicates)
    ) ++ (0 until 50).map { _ =>
      (0 until rng.nextInt(200)).map { _ =>
        val r = rng.nextInt(100)
        if (r < 60) ('a' + rng.nextInt(26)).toChar
        else if (r < 85) ('A' + rng.nextInt(26)).toChar
        else if (r < 95) " ,.!?0123456789".charAt(rng.nextInt(15))
        else "éßıÉÀ日本".charAt(rng.nextInt(7))
      }.mkString
    }
    cases.foreach { s =>
      assert(kernel.bandKeys(UTF8String.fromString(s)).toSeq == udfKeys(p, s),
        s"diverged on: '$s'")
    }

    // every band-width packing branch (c = 1, 2, 3) agrees with MinHasher
    for (c <- 1 to 3) {
      val pc = MinHashParams(bandWidth = c, numHashes = 5)
      val kc = new BandKeyKernel(pc)
      cases.foreach { s =>
        assert(kc.bandKeys(UTF8String.fromString(s)).toSeq == udfKeys(pc, s),
          s"c=$c diverged on: '$s'")
      }
    }
  }

  test("range kernel [from, until) == MinHasher.bandsInRange on every split") {
    val p = MinHashParams(numHashes = 12)
    val rng = new scala.util.Random(67)
    val cases = Seq("", "ABCDE", "ABCDEFG", "The quick brown fox", "ab! cd") ++
      (0 until 20).map(_ => (0 until rng.nextInt(150))
        .map(_ => ('a' + rng.nextInt(28)).toChar).mkString)
    for (from <- Seq(0, 1, 5, 11, 12)) {
      val kernel = new BandKeyKernel(p, from)
      cases.foreach { s =>
        val up = UTF8String.fromString(s).toUpperCase.toString
        val norm = up.filter(ch => ch >= 'A' && ch <= 'Z')
        val want = new MinHasher(p).bandsInRange(norm, from, p.numHashes)
        val got = kernel.bandKeys(UTF8String.fromString(s))
        assert(got.toSeq == want.map(_._2).toSeq,
          s"from=$from diverged on: '$s'")
        // and the (Int, Long) band indices line up with position + from
        assert(want.map(_._1).toSeq == got.indices.map(_ + from),
          s"band indices must be contiguous from $from")
      }
    }
  }

  test("expression evaluates via codegen, no ScalaUDF in the plan") {
    val docs = Seq((1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "x")).toDF("id", "text")
    val bands = DedupPipeline.signatures(spark, docs, MinHashParams(numHashes = 8))
    val plan = bands.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"UDF leaked into:\n$plan")
    // "*(n)" is the WholeStageCodegen marker in the compact plan string —
    // the expression must sit INSIDE a codegen span
    assert(plan.linesIterator.exists(l =>
      l.contains("minhash_band_keys") && l.trim.startsWith("*(")),
      s"expression not inside a codegen span:\n$plan")

    val p = MinHashParams(numHashes = 8)
    val got = bands.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val want = Seq((1L, "The quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"), (3L, "x"))
      .flatMap { case (id, t) =>
        udfKeys(p, t).zipWithIndex.map { case (key, band) => (id, band, key) }
      }.toSet
    assert(got == want)
  }

  test("SQL registration: extensions builder + literal args") {
    GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT minhash_band_keys('ABCDEFGH', 6, 2, 4) AS ks").head()
      .getAs[scala.collection.Seq[Long]](0)
    val want = new MinHasher(MinHashParams(numHashes = 4))
      .bandKeys("ABCDEFGH").toSeq
    assert(got.toSeq == want)
  }

  test("null text yields null (nullSafeEval contract)") {
    val df = Seq((1L, Option.empty[String]), (2L, Some("ABCDEFGHIJ")))
      .toDF("id", "text")
    import org.apache.spark.sql.GraftSqlBridge
    val keys = GraftSqlBridge.column(MinHashBandKeys(
      GraftSqlBridge.expression(col("text")), 6, 2, 4))
    val rows = df.select(col("id"), keys.as("ks")).collect()
    assert(rows.find(_.getLong(0) == 1L).get.isNullAt(1))
    assert(!rows.find(_.getLong(0) == 2L).get.isNullAt(1))
  }
}
