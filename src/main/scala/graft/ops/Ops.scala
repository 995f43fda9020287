package graft.ops

import graft.core.HashRandoms

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the driver-gate queries over the generic testdata
  * tables (`documents`, `embeddings`, `events`). Every query here has two
  * faces kept in lockstep: a Spark DataFrame plan and an ANSI-SQL oracle
  * (run by the driver in DuckDB on the same parquet). Constants (hash
  * randoms, hyperplanes, stopword lists) are generated once and embedded in
  * BOTH faces from the same source so they can never drift.
  */
object Ops {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Number of hash functions used by the documents-table MinHash queries
    * (kept small so the SQL oracle stays tractable; the pipeline itself
    * uses the full configured signature length).
    */
  val DocNumHashes = 8
  val Prime: Long = graft.core.MinHashParams.DefaultPrime
  val KmerLen = 6

  /** First (a,b) pairs from the checked-in randoms file — the same family
    * the reference reads via `-x use_fixed_randoms`
    * (`/root/reference/src/shingling_toolbox.cpp:22-39`).
    */
  lazy val hashPairs: IndexedSeq[(Long, Long)] = {
    val r = HashRandoms.default
    (0 until DocNumHashes).map(i => (r(2 * i), r(2 * i + 1)))
  }

  /** SQL `VALUES` list for the hash pairs: `(0, a0, b0), (1, a1, b1), ...` */
  lazy val hashPairsSql: String = hashPairs.zipWithIndex
    .map { case ((a, b), i) => s"($i, $a, $b)" }.mkString(", ")

  /** Stopword list shared by quality scoring; embedded in both faces. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  def sqlStringList(xs: Seq[String]): String =
    xs.map(x => s"'$x'").mkString("[", ", ", "]")

  /** Language-marker token sets for the heuristic language-ID query. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "et", "les", "dans"),
    "es" -> Seq("el", "los", "las", "y")
  )

  /** Deterministic ±1 hyperplane coefficients for the sign-LSH embedding
    * query: plane j, dimension d -> +1 / -1 from a Weyl-style integer mix
    * (no RNG object: reproducible in a one-line formula).
    */
  def hyperplane(j: Int, dims: Int): IndexedSeq[Int] =
    (0 until dims).map { d =>
      val m = (j * dims + d).toLong * 2654435761L
      if (((m >> 16) & 1L) == 0L) 1 else -1
    }

  val LshPlanes = 16
  val EmbeddingDims = 64

  /** Exact-duplicate canonicalization with 8-byte exchange keys: group on
    * xxhash64(text) — never on the text string itself; full document
    * bodies as shuffle/sort keys is the scale anti-pattern the q29 family
    * exists to avoid, and the streaming twin
    * ([[graft.streaming.StreamingDedup.exactDedup]]) already keys on the
    * hash. Min doc_id per hash group is the canonical; the group's
    * representative text rides the aggregation buffers as PAYLOAD (values,
    * not keys) and is verified equal on the join-back, so a 64-bit
    * collision (p ≈ n²/2^65) raises instead of silently mislabeling — the
    * same fail-loud discipline as the pipeline's doc-id encode
    * ([[graft.pipeline.DedupPipeline.extractDocs]]).
    *
    * @param d any (doc_id, text, ...) frame
    * @return the input columns plus `canonical_id`
    */
  def canonicalByText(d: DataFrame): DataFrame = {
    val withH = d.withColumn("h", xxhash64(col("text")))
    val canon = withH.groupBy("h").agg(
      min(col("doc_id")).as("canonical_id"),
      // a collision-free hash group holds exactly one distinct text, so
      // min(text) IS the group's text
      min(col("text")).as("ctext"))
    withH.join(canon, "h")
      .withColumn("canonical_id",
        when(col("text") <=> col("ctext"), col("canonical_id"))
          .otherwise(raise_error(lit(
            "xxhash64(text) collision detected — re-salt canonicalByText"))))
      .drop("h", "ctext")
  }
}
