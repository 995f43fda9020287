package graft.pipeline

import graft.core.{MinHasher, MinHashParams}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 "vertex shingling" — the reference's graph densification pass
  * (`/root/reference/src/shingling_cluster_generator_optimized.cpp:830-1000`,
  * driver loop `:282-308`, default `shingling_iterations = 2` ⇒ one such
  * round): after the k-mer LSH round produces a graph, each node is
  * re-sketched over its (deduplicated, `:259` / `mr_util.cpp:105-121`)
  * neighbor-id set with the same universal hash family and c-min sketch;
  * nodes whose neighborhoods collide in a band yield additional candidate
  * pairs, which are unioned with the round-1 edges. Documents that missed
  * each other's buckets but share many neighbors get connected.
  *
  * Deviation (documented, SURVEY.md §7): node ids here are synthetic 64-bit
  * (possibly negative), so the hash is computed in `floorMod` arithmetic;
  * the serial oracle in tests uses the identical formula.
  */
object VertexShingling {

  /** c minima of h_i, i in [from, until), over a distinct neighbor-id
    * array — the raw (unpacked) sketch kernel, shared by the one-shot
    * vertex round and the incremental cache ([[VertexSketchCache]], the
    * reference's persistent per-vertex memo `:853-948`,
    * `shingling_toolbox.h:22-24`). floorMod arithmetic because synthetic
    * node ids may be negative (documented deviation, SURVEY.md §7).
    * Returns a flattened (until-from)*c array, ascending per hash block.
    */
  def vertexMinimaRange(params: MinHashParams, neighbors: Array[Long],
      from: Int, until: Int): Array[Long] = {
    val c = params.bandWidth
    val n = until - from
    val buf = new Array[Long](n * c)
    java.util.Arrays.fill(buf, Long.MaxValue)
    var p = 0
    while (p < neighbors.length) {
      val x = neighbors(p)
      var i = 0
      while (i < n) {
        val hv = java.lang.Math.floorMod(x * params.a(from + i) + params.b(from + i),
          params.prime)
        val base = i * c
        var pos = base + c - 1
        if (hv < buf(pos)) {
          while (pos > base && hv < buf(pos - 1)) { buf(pos) = buf(pos - 1); pos -= 1 }
          buf(pos) = hv
        }
        i += 1
      }
      p += 1
    }
    buf
  }

  /** c minima of h_i over a sorted distinct neighbor-id array, packed band
    * keys; gate: |N(u)| >= c (the reference's emit gate `:680` applied to
    * the neighbor multiset — deduped, so a set here).
    */
  def vertexBands(params: MinHashParams, neighbors: Array[Long]): Array[(Int, Long)] = {
    val c = params.bandWidth
    if (neighbors.length < c) return Array.empty
    val h = params.numHashes
    val buf = vertexMinimaRange(params, neighbors, 0, h)
    val out = new Array[(Int, Long)](h)
    var i = 0
    while (i < h) {
      out(i) = (i, MinHasher.pack(
        java.util.Arrays.copyOfRange(buf, i * c, i * c + c), params.prime))
      i += 1
    }
    out
  }

  /** edges (a, b) -> extra candidate pairs from neighbor-set banding.
    * Hot vertex-band buckets (many nodes sharing a neighbor-set sketch)
    * get the same lossless salted decomposition as the k-mer round.
    */
  def extraPairs(spark: SparkSession, edges: DataFrame,
      params: MinHashParams, maxBucketSize: Int = Int.MaxValue,
      saltBlockSize: Int = Int.MaxValue,
      saltDetectFraction: Double = 1.0): DataFrame =
    DedupPipeline.candidatePairs(spark,
      vertexBandRows(spark, edges, params), maxBucketSize,
      saltBlockSize = saltBlockSize,
      saltDetectFraction = saltDetectFraction)._1

  /** Vertex band rows (id, band, key) from a one-shot full re-sketch of
    * every node's neighbor set — the non-incremental form (the cache in
    * [[VertexSketchCache]] must produce exactly these rows).
    */
  def vertexBandRows(spark: SparkSession, edges: DataFrame,
      params: MinHashParams): DataFrame = {
    import spark.implicits._
    val p = params
    val nbrs = edges.select(col("a").as("u"), col("b").as("v"))
      .union(edges.select(col("b").as("u"), col("a").as("v")))
      .as[(Long, Long)]
    val bandRows = nbrs
      .repartition(col("u"))
      .sortWithinPartitions("u", "v")
      .mapPartitions { it =>
        // stream per-u sorted neighbor groups (dedupe adjacent), sketch each
        new Iterator[(Long, Int, Long)] {
          private var pending: (Long, Long) = if (it.hasNext) it.next() else null
          private var out: Array[(Int, Long)] = Array.empty
          private var outIdx = 0
          private var curU = 0L
          private val vs = scala.collection.mutable.ArrayBuffer.empty[Long]

          private def advance(): Unit = {
            while (outIdx >= out.length && pending != null) {
              curU = pending._1
              vs.clear(); vs += pending._2
              pending = null
              while (pending == null && it.hasNext) {
                val r = it.next()
                if (r._1 == curU) { if (r._2 != vs.last) vs += r._2 }
                else pending = r
              }
              out = vertexBands(p, vs.toArray)
              outIdx = 0
            }
          }
          override def hasNext: Boolean = { advance(); outIdx < out.length }
          override def next(): (Long, Int, Long) = {
            advance()
            val (b, k) = out(outIdx); outIdx += 1
            (curU, b, k)
          }
        }
      }
      .toDF("id", "band", "key")
    bandRows
  }

  /** Round-1 edges ∪ vertex-round pairs, deduped — the graph CC runs on
    * when `shinglingIterations > 1` (reference `:308` collate + `:368`).
    */
  def densify(spark: SparkSession, edges: DataFrame,
      params: MinHashParams, maxBucketSize: Int = Int.MaxValue,
      saltBlockSize: Int = Int.MaxValue,
      saltDetectFraction: Double = 1.0): DataFrame =
    edges.select("a", "b")
      .union(extraPairs(spark, edges, params, maxBucketSize,
        saltBlockSize, saltDetectFraction))
      .distinct()
}
