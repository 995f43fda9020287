package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

/** The input data model per `BASELINE.json` `input_hint`: an Iceberg-shaped
  * table of Common-Crawl-style web pages. (Parquet here — the Iceberg runtime
  * is not in this sandbox; all IO goes through a seam in
  * [[DedupPipeline.StageIO]] so the table format is swappable.)
  */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

object Pages {

  /** Deterministic `html -> text` extraction — the analogue of the
    * reference's FASTA parsing, a pure function of the record bytes
    * (`/root/reference/src/fasta_util.cpp:81-98`). Our fixture html is
    * `<html><body>TEXT</body></html>`; extraction must reproduce the `text`
    * column byte-identically (per-row invariant from `input_hint`).
    */
  def extractText(html: Array[Byte]): String = {
    val s = new String(html, java.nio.charset.StandardCharsets.UTF_8)
    val open = s.indexOf("<body>")
    val close = s.lastIndexOf("</body>")
    if (open >= 0 && close > open) s.substring(open + 6, close) else s
  }

  def htmlFor(text: String): Array[Byte] =
    s"<html><body>$text</body></html>"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  def toDS(spark: SparkSession, pages: Seq[Page]): Dataset[Page] = {
    import spark.implicits._
    // parallelize explicitly: a LocalRelation would funnel the whole corpus
    // through very few partitions downstream
    spark.createDataset(spark.sparkContext.parallelize(pages,
      spark.sparkContext.defaultParallelism))
  }
}

/** Deterministic synthetic corpora (FIXTURES.md §2). Fixed seeds, no wall
  * clock: byte-identical across runs. Text is uppercase A-Z with no spaces so
  * the reference's `char - 'A'` base-20 positional encoding applies verbatim
  * (digits for V..Z exceed the base — the quirk is exercised, not avoided).
  */
object PagesGen {
  private val Epoch = 1577836800000L // 2020-01-01T00:00:00Z, fixed

  private def ts(i: Int): Timestamp = new Timestamp(Epoch + i * 1000L)

  private def randomText(rng: scala.util.Random, len: Int): String = {
    val sb = new StringBuilder(len)
    var i = 0
    while (i < len) { sb += ('A' + rng.nextInt(26)).toChar; i += 1 }
    sb.toString
  }

  /** Substitute `m` chars at deterministic positions — a near-duplicate. */
  private def mutate(rng: scala.util.Random, text: String, m: Int): String = {
    val arr = text.toCharArray
    var i = 0
    while (i < m && arr.nonEmpty) {
      val pos = rng.nextInt(arr.length)
      arr(pos) = ('A' + rng.nextInt(26)).toChar
      i += 1
    }
    new String(arr)
  }

  private def page(group: Int, idx: Int, text: String): Page =
    Page(s"https://site$group.example/page/$idx", ts(group * 1000 + idx),
      Pages.htmlFor(text), text, "en")

  /** 6 planted groups (1 master + 2-4 mutated copies) + 4 singletons. */
  def micro: Seq[Page] = {
    val rng = new scala.util.Random(42)
    val copies = Seq(2, 3, 4, 2, 3, 4)
    val groups = copies.zipWithIndex.flatMap { case (n, g) =>
      val master = randomText(rng, 120 + 20 * g)
      page(g, 0, master) +: (1 to n).map { i =>
        page(g, i, mutate(rng, master, 2))
      }
    }
    val singles = (0 until 4).map(i => page(100 + i, 0, randomText(rng, 150)))
    groups ++ singles
  }

  /** Byte-exactness edge cases: len < k, len == k, len == k+c-1 (the
    * incomplete-band gate, reference `:680`), repeated-shingle docs
    * (multiset c-min duplicates), identical-text distinct-url pairs.
    */
  def edge(k: Int = 6, c: Int = 2): Seq[Page] = {
    val rng = new scala.util.Random(43)
    val rep = "ABCDEF" * 10 // every kmer repeats: duplicate minima exercised
    val same = randomText(rng, 90)
    Seq(
      page(200, 0, ""), // empty
      page(200, 1, randomText(rng, k - 1)), // no kmer
      page(200, 2, randomText(rng, k)), // exactly 1 occurrence: gate fails for c=2
      page(200, 3, randomText(rng, k + c - 1)), // exactly c occurrences: gate passes
      page(201, 0, rep),
      page(201, 1, rep), // identical repeated-shingle pair
      page(202, 0, same),
      page(202, 1, same), // identical text, distinct urls
      page(203, 0, "AAAAAAAAAA") // single distinct shingle, many occurrences
    ) ++ (0 until 8).map(i => page(210 + i, 0, randomText(rng, 40 + 7 * i)))
  }

  /** nGroups dup groups (sizes cycling 2..10, near-dup) + nSingles singletons. */
  def corpus(seed: Long, nGroups: Int, nSingles: Int,
      minLen: Int = 60, maxLen: Int = 400): Seq[Page] = {
    val rng = new scala.util.Random(seed)
    val groups = (0 until nGroups).flatMap { g =>
      val size = 2 + g % 9
      val len = minLen + rng.nextInt(maxLen - minLen)
      val master = randomText(rng, len)
      page(g, 0, master) +: (1 until size).map { i =>
        page(g, i, mutate(rng, master, math.max(1, len / 80)))
      }
    }
    val singles =
      (0 until nSingles).map { i =>
        page(500000 + i, 0, randomText(rng, minLen + rng.nextInt(maxLen - minLen)))
      }
    groups ++ singles
  }

  /** ~1000 rows: 100 dup groups + 400 singletons (FIXTURES.md `small`). */
  def small: Seq[Page] = corpus(seed = 44, nGroups = 100, nSingles = 400)

  /** One pathological hot group of `hot` near-identical docs + background. */
  def skew(hot: Int = 500, background: Int = 4500): Seq[Page] = {
    val rng = new scala.util.Random(45)
    val master = randomText(rng, 200)
    val hotDocs = (0 until hot).map { i =>
      page(9000, i, if (i == 0) master else mutate(rng, master, 1))
    }
    hotDocs ++ corpus(seed = 46, nGroups = background / 12, nSingles = background / 2)
  }

  /** `small` recipe scaled — bench corpus. */
  def bench(nDocs: Int): Seq[Page] = {
    // ~60% of docs in groups of avg size 6, 40% singletons, as in `small`
    val nGroups = (nDocs * 6) / 100
    val nSingles = nDocs - nGroups * 6
    corpus(seed = 47, nGroups = nGroups, nSingles = math.max(nSingles, 0))
  }

  /** Distributed deterministic bench corpus: each row derives purely from
    * its index (group master text re-derived from the group seed), so
    * generation runs as a parallel `spark.range` map with no driver-side
    * Seq materialization or serialization bottleneck. Same shape as
    * [[bench]]: groups of sizes cycling 2..10 + singletons, near-dup
    * mutations, uppercase A-Z text.
    */
  def benchDF(spark: org.apache.spark.sql.SparkSession, nDocs: Long)
      : org.apache.spark.sql.Dataset[Page] = {
    import spark.implicits._
    val groupShare = (nDocs * 6) / 10 // ~60% of rows live in dup groups
    spark.range(0, nDocs, 1, spark.sparkContext.defaultParallelism)
      .map { idx =>
        if (idx < groupShare) {
          // rows [0, groupShare) pack consecutively into groups whose sizes
          // cycle 2..10 (avg 6); find (group, member) for this row index
          val cycle = (2 to 10).sum // 54 rows per 9-group cycle
          val cycleIdx = idx / cycle
          var rem = (idx % cycle).toInt
          var size = 2
          var inCycle = 0
          while (rem >= size) { rem -= size; size += 1; inCycle += 1 }
          val group = cycleIdx * 9 + inCycle
          val member = rem
          val grng = new scala.util.Random(0x9E3779B9L * (group + 1))
          val len = 60 + grng.nextInt(340)
          val master = Array.fill(len)(('A' + grng.nextInt(26)).toChar)
          if (member > 0) {
            val mrng = new scala.util.Random(group * 1000003L + member)
            var m = 0
            val nMut = math.max(1, len / 80)
            while (m < nMut) {
              master(mrng.nextInt(len)) = ('A' + mrng.nextInt(26)).toChar
              m += 1
            }
          }
          val text = new String(master)
          Page(s"https://site$group.example/page/$member",
            new java.sql.Timestamp(1577836800000L + idx),
            Pages.htmlFor(text), text, "en")
        } else {
          val rng = new scala.util.Random(0xC2B2AE35L * (idx + 1))
          val len = 60 + rng.nextInt(340)
          val text = (0 until len).map(_ => ('A' + rng.nextInt(26)).toChar)
            .mkString
          Page(s"https://single$idx.example/page/0",
            new java.sql.Timestamp(1577836800000L + idx),
            Pages.htmlFor(text), text, "en")
        }
      }
  }
}
