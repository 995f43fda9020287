package graft.ops

import graft.core.HashRandoms

import org.apache.spark.sql.{DataFrame, SparkSession}

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
}
