package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed weighted best-match F-score between two cluster-assignment
  * tables — the Spark restatement of the reference's `fvalue_evaluator`
  * MR path (`/root/reference/src/fvalue_evaluator.cpp:98-198`):
  * member equi-join (`:367-386`,`:422-455`) → intersection counts
  * (`:150-164`) → per-cluster best F1, size-weighted (`:457-511`,`:938-977`)
  * → per-side sums and averaging (`:186-189`).
  *
  * Both inputs: DataFrame(member: long, label: long). The cluster-size
  * joins carry NO broadcast hint: at 10^12 members the label dimension can
  * be 10^9+ rows, and a forced broadcast OOMs; AQE broadcasts at runtime
  * when a side is genuinely small (asserted in PlanSpec) and shuffles
  * otherwise.
  */
object Evaluator {

  final case class Scores(fX: Double, fY: Double, avg: Double)

  /** The per-(lx, ly) contingency with precision/recall/F1 — exposed so the
    * physical join shape is testable (PlanSpec).
    */
  def contingency(x: DataFrame, y: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val sx = x.groupBy(col("label").as("lx")).agg(count(lit(1)).as("nx"))
    val sy = y.groupBy(col("label").as("ly")).agg(count(lit(1)).as("ny"))

    val joined = x.select(col("member"), col("label").as("lx"))
      .join(y.select(col("member"), col("label").as("ly")), "member")
    val inter = joined.groupBy("lx", "ly").agg(count(lit(1)).as("i"))

    val scored = inter
      .join(sx, "lx")
      .join(sy, "ly")
      .withColumn("p", col("i") / col("nx"))
      .withColumn("r", col("i") / col("ny"))
      .withColumn("f1",
        when(col("p") + col("r") === 0.0, 0.0)
          .otherwise(lit(2) * col("p") * col("r") / (col("p") + col("r"))))
    (scored, sx, sy)
  }

  /** Reference parity for the evaluator's read-side cap
    * (`fvalue_evaluator.cpp:771-800`: `largest_clusters_count > 0` keeps
    * only the N largest clusters of a side before scoring): restrict a
    * side's assignments to members of its `k` largest clusters, size
    * descending with label-ascending tie-break (the reference's selection
    * is by size; the tie-break here makes the Spark result deterministic).
    * The k-row top set joins back as a runtime broadcast (AQE).
    */
  private def keepLargest(a: DataFrame, k: Int): DataFrame = {
    val top = a.groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("label")).limit(k).select("label")
    a.join(top, "label").select("member", "label")
  }

  def fscore(spark: SparkSession, x: DataFrame, y: DataFrame,
      topKx: Option[Int] = None, topKy: Option[Int] = None): Scores = {
    val (scored0, sx, sy) = contingency(
      topKx.fold(x)(keepLargest(x, _)), topKy.fold(y)(keepLargest(y, _)))
    // BOTH side passes consume the full contingency — persist it so the
    // member equi-join + intersection aggregate run once per fscore call,
    // not once per side (the sweep's evaluator leg is a fixed per-step
    // latency: 13.9 s -> 9.9 s at 4M/local[32], BASELINE.md round-5
    // per-leg table). The contingency is one row per intersecting label
    // PAIR — far smaller than the membership tables it derives from.
    val scored = scored0.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def side(groupCol: String, sizes: DataFrame, sizeCol: String): Double = {
      val best = scored.groupBy(groupCol).agg(max(col("f1")).as("best"))
      val row = sizes.join(best, sizes(if (groupCol == "lx") "lx" else "ly") ===
          best(groupCol), "left")
        .select(
          sum(coalesce(col("best"), lit(0.0)) * col(sizeCol)).as("wsum"),
          sum(col(sizeCol)).as("tot"))
        .head()
      row.getDouble(0) / row.getLong(1)
    }

    try {
      val fX = side("lx", sx, "nx")
      val fY = side("ly", sy, "ny")
      Scores(fX, fY, (fX + fY) / 2)
    } finally scored.unpersist()
  }

  /** Distributed normalized mutual information (SURVEY.md A14, reference
    * `fvalue_evaluator.cpp:200-365`): 2*I(X;Y) / (H(X)+H(Y)) over the
    * shared-member contingency. Marginals are derived from the joint (i.e.
    * over shared members only), matching [[graft.core.NMI.score]] exactly.
    */
  def nmi(spark: SparkSession, x: DataFrame, y: DataFrame): Double = {
    val joined = x.select(col("member"), col("label").as("lx"))
      .join(y.select(col("member"), col("label").as("ly")), "member")
    val inter = joined.groupBy("lx", "ly").agg(count(lit(1)).as("i"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nRow = inter.agg(coalesce(sum(col("i")), lit(0L))).head()
      val n = nRow.getLong(0).toDouble
      if (n == 0) return 0.0
      val nx = inter.groupBy("lx").agg(sum(col("i")).as("nx"))
      val ny = inter.groupBy("ly").agg(sum(col("i")).as("ny"))
      def entropy(m: DataFrame, c: String): Double =
        -m.select(sum(col(c) / n * log(col(c) / n))).head().getDouble(0)
      val hx = entropy(nx, "nx")
      val hy = entropy(ny, "ny")
      if (hx == 0.0 && hy == 0.0) return 1.0
      val mi = inter.join(nx, "lx").join(ny, "ly")
        .select(sum((col("i") / n) *
          log(col("i") * n / (col("nx") * col("ny")))))
        .head().getDouble(0)
      2.0 * mi / (hx + hy)
    } finally inter.unpersist()
  }
}
