package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Legacy cluster-file scans (SURVEY.md S4/S6) — the two alternate
  * baseline input formats the reference's evaluator reads, so clusterings
  * produced by OLD reference runs (or by pclust-family tools) can be
  * scored against this pipeline's output with [[Evaluator.fscore]]/`nmi`.
  *
  * Output contract matches [[GroundTruth.readTsv]]:
  * DataFrame(member: string, label: string).
  */
object ClusterFormats {

  /** S4 — the MRMPI "print" cluster dump
    * (`/root/reference/src/fvalue_evaluator.cpp:827-872`; written by
    * `graph_formater.cpp:160-175`): one cluster per line,
    * `KMV pair: proc 0, nvalues N, sizes 9 4679, key @<label>, values m1
    * m2 ...` — token 11 (1-based) minus its trailing comma is the label,
    * tokens 13+ are the members. Lines are self-contained, so the parse
    * is one fully distributed map; a repeated label keeps the FIRST
    * line's cluster (the reference's `labels_set` check, `:857-866`),
    * clusters below `minClusterSize` distinct members are dropped, and
    * `rename = true` applies the domain-strip projection
    * (`/name_3` -> `name`, `:845-848`).
    */
  def readMrmpi(spark: SparkSession, path: String, minClusterSize: Int = 1,
      rename: Boolean = false): DataFrame = {
    import spark.implicits._
    val lines = spark.sparkContext.textFile(path).zipWithIndex()
      .toDF("line", "lineno")
      .where(length(trim(col("line"))) > 0)
      .select(col("line"), split(col("line"), " ").as("t"), col("lineno"))
    val lab = element_at(col("t"), 11)
    // a non-empty line that is not the KMV shape — `KMV pair: ... values
    // ...` with >= 12 tokens — is a corrupted dump (e.g. an interleaved
    // MRMPI diagnostic line): fail loudly instead of contributing a
    // silent bogus-label row (the CommunityImport discipline)
    val isKmv = size(col("t")) >= 12 &&
      element_at(col("t"), 1) === "KMV" &&
      element_at(col("t"), 2) === "pair:" &&
      element_at(col("t"), 12) === "values"
    // the reference applies min_cluster_limit BEFORE the labels_set
    // dedup (fvalue_evaluator.cpp:855-866: `if (cluster_size >=
    // min_cluster_limit) { if (labels_set.find(...) ...`), so a duplicate
    // label whose FIRST line is undersized keeps a later passing line —
    // filter each line by its DISTINCT (post-rename) member count first,
    // then keep the first surviving line per label (ADVICE r05 #3).
    // The malformation raise is the data-dependent ELSE branch of the
    // filter itself (a plain size predicate would silently drop short
    // corrupted lines before any label raise evaluated — spec-caught; and
    // it must not hinge on the optimizer declining to simplify a
    // tautological guard).
    val msCol = slice(col("t"), lit(13), greatest(size(col("t")) - 12, lit(0)))
    val lineMembers =
      if (rename) array_distinct(transform(msCol,
        m => GroundTruth.stripDomainSuffix(m)))
      else array_distinct(msCol)
    val passing = lines
      .where(when(isKmv, size(lineMembers) >= minClusterSize)
        .otherwise(raise_error(concat(
          lit("malformed MRMPI cluster line: "), col("line"))).cast("boolean")))
    val parsed = passing.select(
      // post-filter every row is KMV-shaped; the raise stays as defense in
      // depth should the projection ever run unfiltered
      when(isKmv, lab.substr(lit(1), length(lab) - 1))
        .otherwise(raise_error(concat(
          lit("malformed MRMPI cluster line: "), col("line")))).as("label"),
      msCol.as("ms"),
      col("lineno"))
    val first = parsed.groupBy("label").agg(min("lineno").as("lineno"))
    val kept = parsed.join(first, Seq("label", "lineno"))
    val exploded = kept.select(col("label"), explode(col("ms")).as("member"))
    val members =
      (if (rename)
        exploded.select(
          GroundTruth.stripDomainSuffix(col("member")).as("member"),
          col("label"))
      else exploded.select("member", "label")).distinct()
    sizeFilter(members, minClusterSize)
  }

  /** S6 — the pclust block format
    * (`/root/reference/src/fvalue_evaluator.cpp:995-1038`): a `Cluster:`
    * header line opens each cluster; member lines are `<idx> <name>`
    * (leading `>` on the name dropped). `rename = true` truncates the
    * name at its first `_`; otherwise members get the reference's `/`
    * prefix. Cluster labels are the 0-based block ordinals.
    *
    * The format is stateful across lines (a member belongs to the nearest
    * preceding header), so the header line numbers — ONE per cluster, the
    * same single-node-tool-output bound as [[CommunityImport]] — are
    * collected and broadcast; members resolve their block by binary
    * search, keeping the member parse itself distributed.
    */
  def readPclust(spark: SparkSession, path: String, minClusterSize: Int = 1,
      rename: Boolean = false): DataFrame = {
    import spark.implicits._
    val lines = spark.sparkContext.textFile(path).zipWithIndex()
    val headers = lines.filter(_._1.contains("Cluster:")).map(_._2)
      .collect().sorted
    require(headers.nonEmpty, s"no 'Cluster:' header lines in $path")
    val bc = spark.sparkContext.broadcast(headers)
    val members = lines
      .filter { case (l, _) => !l.contains("Cluster:") && l.trim.nonEmpty }
      .map { case (raw, no) =>
        val hs = bc.value
        val at = java.util.Arrays.binarySearch(hs, no)
        val idx = if (at >= 0) at else -(at + 1) - 1
        require(idx >= 0, s"member line ${no + 1} precedes the first header")
        // sscanf-style: skip leading whitespace, split index from name at
        // the first space; a line with no name token is malformed
        val l = raw.trim
        val sp = l.indexOf(' ')
        require(sp > 0 && sp < l.length - 1,
          s"malformed pclust member line ${no + 1}: '$raw'")
        var m = l.substring(sp + 1)
        if (m.startsWith(">")) m = m.substring(1)
        if (rename) {
          val u = m.indexOf('_')
          if (u >= 0) m = m.substring(0, u)
        } else m = "/" + m
        (m, idx.toString)
      }.toDF("member", "label").distinct()
    sizeFilter(members, minClusterSize)
  }

  /** The shared `min_cluster_limit` semantics of all the reference's
    * scans — one definition site ([[GroundTruth.minClusterFilter]]).
    */
  private def sizeFilter(members: DataFrame, minClusterSize: Int): DataFrame =
    GroundTruth.minClusterFilter(members, minClusterSize)
}
