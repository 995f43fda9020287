package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Min-label propagation connected components — the reference's primary CC
  * loop (SURVEY.md A7, `/root/reference/src/
  * shingling_cluster_generator_optimized.cpp:1035-1127,1350-1375`): every
  * node repeatedly adopts the minimum label in its closed neighborhood
  * until a fixpoint.
  *
  * O(diameter) rounds vs large/small-star's O(log^2 n) — kept as the
  * reference-faithful CROSS-CHECK of [[ConnectedComponents]] (the
  * production path), exactly the role the reference's own two CC codepaths
  * play against each other.
  */
object LabelPropagation {

  /** @return DataFrame(id, component) — component = min member id. */
  def run(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
      maxIter: Int = 200): DataFrame = {
    // pre-partition the STATIC edge table by the per-round join key (v):
    // Dataset.localCheckpoint preserves the plan's output partitioning in
    // the LogicalRDD, so every round's `pulled` join reuses it instead of
    // re-exchanging the edges each round — one shuffle per round saved on
    // data that never changes (guide §2.4)
    val directed = edges
      .where(col("a") =!= col("b"))
      .select(col("a").as("u"), col("b").as("v"))
      .union(edges.where(col("a") =!= col("b"))
        .select(col("b").as("u"), col("a").as("v")))
      .distinct()
      .repartition(col("v"))
      .localCheckpoint(true)

    var labels = nodes.select(col("id").cast("long"))
      .withColumn("label", col("id"))
      .localCheckpoint(true)

    var iter = 0
    var changed = 1L
    // handle of the round's persisted frame (labels is a projection over
    // it from round 2 on, so unpersist must target this, not labels)
    var persisted: DataFrame = null
    while (changed > 0 && iter < maxIter) {
      // min label over the closed neighborhood: each node pulls its
      // neighbors' labels, keeps the smallest including its own. The
      // round's OLD label rides the checkpointed frame as `prev`, so the
      // convergence count is a filter over the checkpoint's in-memory
      // partitions — the former shape re-JOINED next against old labels
      // (a full shuffle join per round) to recover information the round
      // already had in hand. Same convergence criterion (count of nodes
      // whose label changed) -> same round count, same output. The
      // localCheckpoint stays: it truncates lineage so round r's plan
      // does not nest r analyzed subtrees (a persist-based variant
      // measured SLOWER here for exactly that reason).
      val pulled = directed
        .join(labels.select(col("id").as("v"), col("label").as("nl")), "v")
        .groupBy(col("u").as("id"))
        .agg(min(col("nl")).as("pulled"))
      val next = labels
        .join(pulled, Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("pulled"), col("label")))
            .as("label"), col("label").as("prev"))
        .localCheckpoint(true)
      changed = next.where(col("label") =!= col("prev")).count()
      if (persisted != null) persisted.unpersist()
      else labels.unpersist() // round 1: release the initial checkpoint
      persisted = next
      labels = next.select("id", "label")
      iter += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"label propagation did not converge within $maxIter rounds")
    labels.select(col("id"), col("label").as("component"))
  }
}
