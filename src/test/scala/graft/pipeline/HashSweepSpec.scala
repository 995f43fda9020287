package graft.pipeline

import graft.SparkSpec
import graft.core.{MinHasher, MinHashParams}

import org.scalatest.funsuite.AnyFunSuite

class HashSweepSpec extends AnyFunSuite with SparkSpec {

  test("bandsInRange matches full bands on every sub-range (I1 exactness)") {
    val p = MinHashParams(kmerLen = 6, bandWidth = 2, numHashes = 12)
    val hasher = new MinHasher(p)
    val rng = new scala.util.Random(29)
    for (_ <- 0 until 40) {
      val t = (0 until rng.nextInt(150))
        .map(_ => ('A' + rng.nextInt(26)).toChar).mkString
      val full = hasher.bands(t)
      for (from <- 0 to 12; until <- from to 12) {
        val part = hasher.bandsInRange(t, from, until)
        val want = if (full.isEmpty) Seq.empty else full.slice(from, until).toSeq
        assert(part.toSeq == want, s"range [$from,$until) t=$t")
      }
    }
  }

  test("sweep: incremental append equals from-scratch clustering per step") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep").toString
    val pages = Pages.toDS(spark, PagesGen.micro).toDF()
    val result = HashSweep.run(spark, pages, bandDir = dir,
      startHashes = 6, delta = 4, maxHashes = 9, threshold = 0.95)
    assert(result.steps.nonEmpty)
    // convergence is monotone-ish on this corpus; final step must have run
    // with the last h and produced a full assignment
    val n = result.assignments.count()
    assert(n == pages.count())

    // cross-check the last step against a from-scratch pipeline at same h
    val lastH = result.steps.last.numHashes
    val docs = DedupPipeline.extractDocs(pages)
    val bands = DedupPipeline.signatures(spark, docs,
      MinHashParams(numHashes = lastH))
    val (pairs, _) = DedupPipeline.candidatePairs(spark, bands, Int.MaxValue)
    val want = ConnectedComponents.run(spark, pairs, docs.select("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = result.assignments.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "incremental sweep diverged from from-scratch run")
  }

  test("sweep with shinglingIterations=2: incremental vertex cache == from-scratch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep-v").toString
    val pages = Pages.toDS(spark, PagesGen.micro).toDF()
    val result = HashSweep.run(spark, pages, bandDir = dir,
      startHashes = 5, delta = 3, maxHashes = 8, threshold = 2.0, // sweep all
      shinglingIterations = 2)
    assert(result.steps.map(_.numHashes) == Seq(5, 6, 7, 8))

    // from-scratch at the last h: kmer pairs + one full vertex round
    val lastH = result.steps.last.numHashes
    val params = MinHashParams(numHashes = lastH)
    val docs = DedupPipeline.extractDocs(pages)
    val bands = DedupPipeline.signatures(spark, docs, params)
    val (kmerPairs, _) = DedupPipeline.candidatePairs(spark, bands, Int.MaxValue)
    val all = VertexShingling.densify(spark, kmerPairs, params)
    val want = ConnectedComponents.run(spark, all, docs.select("id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = result.assignments.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want, "incremental vertex round diverged from from-scratch")
  }

  test("killed-and-restarted sweep reuses the band prefix without duplicates") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep3").toString
    val pages = Pages.toDS(spark, PagesGen.micro).toDF()
    // first run materializes bands 0..6
    HashSweep.run(spark, pages, bandDir = dir,
      startHashes = 5, delta = 3, maxHashes = 7, threshold = 2.0)
    val rowsAfterFirst = spark.read.parquet(dir).count()
    val perBand = spark.read.parquet(dir).groupBy("band")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // "restart": a new run over the same bandDir must detect the existing
    // band=0..6 prefix and append NOTHING for those indices
    HashSweep.run(spark, pages, bandDir = dir,
      startHashes = 5, delta = 3, maxHashes = 7, threshold = 2.0)
    val perBand2 = spark.read.parquet(dir).groupBy("band")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perBand2 == perBand, "restart duplicated band rows")
    assert(spark.read.parquet(dir).count() == rowsAfterFirst)
  }

  test("incremental pair table: uncommitted partition dropped + re-derived") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep-pc").toString
    val pages = Pages.toDS(spark, PagesGen.micro).toDF()
    def assignments(d: String) =
      HashSweep.run(spark, pages, bandDir = d,
        startHashes = 5, delta = 3, maxHashes = 7, threshold = 2.0)
        .assignments.collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = assignments(dir)
    // crash simulation: the last band's pair append completed but its
    // marker commit did not — the partition is an UNCOMMITTED increment
    // and must be dropped and re-derived on restart, not double-counted
    // or trusted half-written
    val marker = new java.io.File(s"$dir.pairs", ".band_6_done")
    assert(marker.exists(), "fixture: expected a committed band-6 marker")
    assert(marker.delete())
    val got = assignments(dir)
    assert(got == want, "restart after a torn pair append diverged")
    assert(marker.exists(), "restart must re-commit the dropped band")
    // the pair table prefix is DISTINCT by construction: no (a, b)
    // appears under two bands
    val t = spark.read.parquet(s"$dir.pairs")
    assert(t.groupBy("a", "b").agg(count(lit(1)).as("n"))
      .where(col("n") > 1).count() == 0, "pair stored under two bands")

    // same protocol on the BAND table: an unmarked band partition (torn
    // appendBands write) is dropped and re-derived — it must never be
    // adopted as complete and fed into the (durable) pair table
    val bandMarker = new java.io.File(dir, ".band_6_done")
    assert(bandMarker.exists())
    assert(bandMarker.delete())
    // make the tear real: remove one data file from the partition
    val part = new java.io.File(dir, "band=6")
    val dataFiles = part.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(dataFiles.nonEmpty)
    assert(dataFiles.head.delete())
    // the stale band-6 pair marker must not mask the re-derive: drop it
    // the way a torn step would have (pairs commit follows band commit)
    val pairMarker6 = new java.io.File(s"$dir.pairs", ".band_6_done")
    if (pairMarker6.exists()) {
      assert(pairMarker6.delete())
      graft.tools.Fs.rmRf(new java.io.File(s"$dir.pairs", "band=6"))
    }
    val healed = assignments(dir)
    assert(healed == want, "restart after a torn band append diverged")
    assert(bandMarker.exists(), "restart must re-commit the torn band")
  }

  test("restarted sweep with shinglingIterations=2 resumes at the cached step") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep-vr").toString
    val pages = Pages.toDS(spark, PagesGen.micro).toDF()
    val first = HashSweep.run(spark, pages, bandDir = dir,
      startHashes = 5, delta = 3, maxHashes = 7, threshold = 2.0,
      shinglingIterations = 2)
    assert(first.steps.map(_.numHashes) == Seq(5, 6, 7))
    // "restart": same bandDir, same startHashes — the vertex caches sit at
    // h=7 (test) / h=4 (base); re-entering the loop at h=5 used to crash on
    // the cache's monotonicity require. It must instead resume AT the last
    // committed test step and reproduce its assignment exactly.
    val second = HashSweep.run(spark, pages, bandDir = dir,
      startHashes = 5, delta = 3, maxHashes = 7, threshold = 2.0,
      shinglingIterations = 2)
    assert(second.steps.map(_.numHashes) == Seq(7),
      "restart must resume at the cached hash count, not re-sweep from 5")
    val got = second.assignments.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = first.assignments.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("sweep pair generation is salted: lossless on skew + salted plan shape") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep-skew").toString
    val pages = Pages.toDS(spark, PagesGen.skew(hot = 80, background = 100)).toDF()
    // salted sweep == unsalted sweep (lossless), on a corpus with a genuine
    // hot band at saltBlockSize = 16
    val salted = HashSweep.run(spark, pages, bandDir = dir,
      startHashes = 5, delta = 3, maxHashes = 6, threshold = 2.0,
      saltBlockSize = 16, saltDetectFraction = 1.0)
    val dir2 = java.nio.file.Files.createTempDirectory("graft-sweep-skew2").toString
    val unsalted = HashSweep.run(spark, pages, bandDir = dir2,
      startHashes = 5, delta = 3, maxHashes = 6, threshold = 2.0,
      saltBlockSize = Int.MaxValue)
    assert(salted.assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      == unsalted.assignments.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap)

    // the exact STEADY-STATE pair stage the sweep runs (one new band ->
    // candidatePairs with the sweep's salt config; the bulk seed uses the
    // streamed tagged group-emit, which has no join to mis-plan) must
    // carry the salted-plan shape: hot-key joins broadcast, band rows
    // never sort-merged against hot keys
    val oneBand = spark.read.parquet(dir).where(col("band") === 5)
    val sized = oneBand.groupBy("band", "key").agg(count(lit(1)).as("n"))
    assert(sized.where(col("n") > 16).count() > 0,
      "fixture must produce a hot bucket in the increment band")
    val (pairs, _) = DedupPipeline.candidatePairs(spark, oneBand,
      Int.MaxValue, saltBlockSize = 16, saltDetectFraction = 1.0)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"sweep pair stage must broadcast hot keys in:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"sweep band rows must not sort-merge against hot keys in:\n$plan")
  }

  test("restarting a sweep with a different hash family fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep-fp").toString
    val pages = Pages.toDS(spark, PagesGen.micro).toDF()
    HashSweep.run(spark, pages, bandDir = dir,
      startHashes = 5, delta = 3, maxHashes = 5, threshold = 2.0)
    // same params: restart is fine (covered above); different kmerLen: the
    // existing band rows were computed in a different sketch space
    val ex = intercept[IllegalStateException] {
      HashSweep.run(spark, pages, bandDir = dir,
        startHashes = 5, delta = 3, maxHashes = 5, threshold = 2.0,
        baseParams = graft.core.MinHashParams(kmerLen = 5, numHashes = 1))
    }
    assert(ex.getMessage.contains("different hash family"))
  }

  test("startHashes > maxHashes fails loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep4").toString
    val pages = Pages.toDS(spark, PagesGen.micro).toDF()
    intercept[IllegalArgumentException] {
      HashSweep.run(spark, pages, bandDir = dir,
        startHashes = 9, delta = 3, maxHashes = 7)
    }
  }

  test("sweep records increasing hash counts and stops at threshold or max") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sweep2").toString
    val pages = Pages.toDS(spark, PagesGen.micro).toDF()
    val r = HashSweep.run(spark, pages, bandDir = dir,
      startHashes = 5, delta = 3, maxHashes = 7, threshold = 2.0) // unreachable
    assert(!r.converged)
    assert(r.steps.map(_.numHashes) == Seq(5, 6, 7))
    assert(r.steps.forall(s => s.fscore >= 0.0 && s.fscore <= 1.0))
  }
}
