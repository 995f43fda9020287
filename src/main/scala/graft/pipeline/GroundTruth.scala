package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** External labeled-clustering (ground truth) ingestion — the Spark
  * restatement of the reference's Pfam TSV reader (SURVEY.md S5,
  * `/root/reference/src/fvalue_evaluator.cpp:638-692`): a TSV where column
  * `memberCol` holds the member name and column `clusterCol` the cluster
  * label; clusters are member SETS (duplicates collapse), clusters smaller
  * than `minClusterSize` are dropped, and in domain mode each occurrence of
  * a member name is suffixed `/name_k` by its per-name occurrence index
  * (the reference's overlapping-domain handling, `:664-668`).
  *
  * Output: DataFrame(member: string, label: string) — feeds
  * [[Evaluator.fscore]] / [[Evaluator.nmi]] directly, so a pipeline
  * clustering can be scored against an EXTERNAL truth, not only against
  * another pipeline run.
  */
object GroundTruth {

  def readTsv(spark: SparkSession, path: String,
      memberCol: Int = 0, clusterCol: Int = 5,
      minClusterSize: Int = 1, wholeSeq: Boolean = true): DataFrame = {
    import spark.implicits._
    // zipWithIndex preserves file line order — needed only for the
    // domain-occurrence counter, which the reference derives from read order
    val lines = spark.sparkContext.textFile(path).zipWithIndex()
      .toDF("line", "lineno")
    val parsed = lines
      .where(length(trim(col("line"))) > 0)
      .select(split(col("line"), "\t").as("t"), col("lineno"))
      .select(col("t").getItem(memberCol).as("seq"),
        col("t").getItem(clusterCol).as("label"), col("lineno"))

    val members =
      if (wholeSeq) parsed.select(col("seq").as("member"), col("label"))
      else {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("seq").orderBy("lineno")
        parsed
          .withColumn("k", row_number().over(w))
          .select(concat(lit("/"), col("seq"), lit("_"), col("k")).as("member"),
            col("label"))
      }
    minClusterFilter(members.distinct(), minClusterSize)
  }

  /** Drop clusters with fewer than `minClusterSize` (distinct) members —
    * the reference's `min_cluster_limit` semantics, shared by every
    * cluster scan (this TSV reader and [[ClusterFormats]]'s S4/S6 scans).
    * Input must already be member-distinct per label.
    */
  private[pipeline] def minClusterFilter(members: DataFrame,
      minClusterSize: Int): DataFrame =
    if (minClusterSize <= 1) members
    else {
      val sizes = members.groupBy("label")
        .agg(count(lit(1)).as("n"))
        .where(col("n") >= minClusterSize)
        .select("label")
      members.join(sizes, "label").select("member", "label")
    }

  /** P4 — the reference's `rename_sequences` projection
    * (`shingling_cluster_generator_optimized.cpp:1129-1135`): strip the
    * domain suffix from a member name, `/name_3` -> `name` (strtok at the
    * first '_' after the leading '/').
    */
  def stripDomainSuffix(member: Column): Column =
    regexp_extract(regexp_replace(member, "^/", ""), "^([^_]*)", 1)
}
