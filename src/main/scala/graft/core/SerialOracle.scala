package graft.core

import scala.collection.mutable

/** Serial, auditable reimplementation of the whole dedup pipeline, used as
  * ground truth for tests (the reference binary is unbuildable here —
  * `/root/reference/.MISSING_LARGE_BLOBS:1-2`, `Makefile:1`). Implements,
  * verbatim, the cited reference formulas:
  *   - sketches: P1/P2/A1/A2 via [[Shingler]]/[[MinHasher]] (shared kernels —
  *     the *distribution* is what the Spark pipeline adds on top);
  *   - candidate pairs: LSH bucket self-join `draw_graph`
  *     (`shingling_cluster_generator_optimized.cpp:750-798`) — all pairs of
  *     distinct docs sharing a band key, canonicalized (a < b);
  *   - clusters: union-find with label = min member id
  *     (`union_find.cpp:43-63`).
  */
object SerialOracle {

  final case class Result(
      signatures: Map[Long, Array[Array[Long]]], // id -> h x c minima (null row = gate fail)
      pairs: Set[(Long, Long)], // canonical a < b
      clusters: Map[Long, Long] // id -> min-member label (every input id present)
  )

  def run(
      docs: Seq[(Long, String)],
      params: MinHashParams,
      jaccardThreshold: Double = 0.0
  ): Result = {
    val hasher = new MinHasher(params)
    val sigs = docs.map { case (id, t) => id -> hasher.sketch(t) }.toMap

    // LSH buckets: (bandIdx, packed minima) -> member ids
    val buckets = mutable.Map.empty[(Int, Long), mutable.ArrayBuffer[Long]]
    docs.foreach { case (id, t) =>
      val sk = sigs(id)
      if (sk(0) != null) {
        var i = 0
        while (i < sk.length) {
          buckets.getOrElseUpdate((i, MinHasher.pack(sk(i), params.prime)),
            mutable.ArrayBuffer.empty) += id
          i += 1
        }
      }
    }
    var pairs = buckets.valuesIterator.flatMap { ids =>
      val s = ids.distinct.sorted
      for (i <- s.indices.iterator; j <- (i + 1 until s.length).iterator)
        yield (s(i), s(j))
    }.toSet

    if (jaccardThreshold > 0.0) {
      val sets = docs.map { case (id, t) =>
        id -> Shingler.shingleSet(t, params.kmerLen)
      }.toMap
      // same comparison form as the pipeline: i >= tau * (union), so the
      // two sides can never disagree by a final-ulp rounding of i/u
      pairs = pairs.filter { case (a, b) =>
        val i = Shingler.intersectionSize(sets(a), sets(b))
        i >= jaccardThreshold * (sets(a).length + sets(b).length - i)
      }
    }

    val uf = new UnionFind
    docs.foreach { case (id, _) => uf.add(id) }
    pairs.foreach { case (a, b) => uf.union(a, b) }
    Result(sigs, pairs, uf.componentsByMinLabel())
  }
}
