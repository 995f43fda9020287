package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components via alternating large-star / small-star
  * (Kiveris et al., "Connected Components in MapReduce and Beyond", 2014) —
  * replacing the reference's Hash-to-Min MPI loop
  * (`/root/reference/src/shingling_cluster_generator_optimized.cpp:1444-1531`)
  * with the same fixpoint (every node labeled by the min id of its
  * component, the label contract of `union_find.cpp:43-63`) but skew-safe
  * behavior: no node ever materializes its whole component in one task —
  * both star steps are plain join+groupBy(min), so AQE can split hot keys.
  *
  * Each iteration is localCheckpoint'ed to cut lineage (on a real cluster
  * this would be a reliable checkpoint / stage table — see
  * [[DedupPipeline]] for the stage-level persistence).
  */
object ConnectedComponents {

  /** @param edges DataFrame(a: long, b: long), any orientation, self-loops ok
    * @param nodes DataFrame(id: long) — the full node universe (isolated
    *              nodes get component = self)
    * @return DataFrame(id: long, component: long), component = min member id
    */
  def run(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
      maxIter: Int = 64): DataFrame = {
    var cur = edges
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint(true)

    var prevSig: (Long, Long) = (-1L, 0L)
    var iter = 0
    var converged = cur.isEmpty
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      // order-independent, overflow-free edge-set signature (edges are
      // distinct, so xor never cancels duplicates)
      val sigRow = next
        .agg(count(lit(1)), bit_xor(xxhash64(col("a"), col("b")))).head()
      val sig = (sigRow.getLong(0), if (sigRow.isNullAt(1)) 0L else sigRow.getLong(1))
      converged = sig == prevSig
      prevSig = sig
      cur.unpersist()
      cur = next
      iter += 1
    }

    // At the fixpoint `cur` is a star forest: (a = component min, b = member).
    val assigned = cur.select(col("b").as("id"), col("a").as("component"))
      .union(cur.select(col("a").as("id"), col("a").as("component")))
      .distinct()
    nodes.select(col("id").cast("long"))
      .join(assigned, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Large-star: for each node u, link every strictly-larger neighbor v to
    * m(u) = min(Γ(u) ∪ {u}). Keeps the invariant a < b on output.
    */
  private[pipeline] def largeStar(edges: DataFrame): DataFrame = {
    val nbrs = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
    val m = nbrs.groupBy("u").agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("mv"), col("u")).as("m"))
    nbrs.join(m, "u")
      .where(col("v") > col("u"))
      .select(col("m").as("a"), col("v").as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
  }

  /** Small-star: for each node u, link all smaller neighbors (and u itself)
    * to the min of the smaller neighborhood.
    */
  private[pipeline] def smallStar(edges: DataFrame): DataFrame = {
    // orientation a < b  =>  smaller-neighbor lists are keyed by u = b
    val sm = edges.select(col("b").as("u"), col("a").as("v"))
    val m = sm.groupBy("u").agg(min(col("v")).as("m"))
    val relink = sm.join(m, "u")
      .where(col("v") =!= col("m"))
      .select(col("m").as("a"), col("v").as("b"))
    val toCenter = m.select(col("m").as("a"), col("u").as("b"))
    relink.union(toCenter)
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
  }
}
