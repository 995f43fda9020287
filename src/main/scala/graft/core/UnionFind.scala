package graft.core

import scala.collection.mutable

/** Weighted quick-union with path halving — the reference's serial CC
  * fallback (`/root/reference/src/union_find.cpp:82-116`, `:13-80`). Used by
  * the serial oracle; the distributed pipeline uses large-star/small-star
  * (same fixpoint: every node labeled with the min id of its component,
  * the label contract from `union_find.cpp:43-63`).
  */
final class UnionFind {
  private val parent = mutable.LongMap.empty[Long]
  private val size = mutable.LongMap.empty[Long]

  def add(x: Long): Unit =
    if (!parent.contains(x)) { parent(x) = x; size(x) = 1L }

  def find(x: Long): Long = {
    add(x)
    var r = x
    while (parent(r) != r) {
      parent(r) = parent(parent(r)) // path halving
      r = parent(r)
    }
    r
  }

  def union(x: Long, y: Long): Unit = {
    val rx = find(x); val ry = find(y)
    if (rx != ry) {
      if (size(rx) < size(ry)) { parent(rx) = ry; size(ry) += size(rx) }
      else { parent(ry) = rx; size(rx) += size(ry) }
    }
  }

  /** node -> min member id of its component (the cluster-label contract). */
  def componentsByMinLabel(): Map[Long, Long] =
    labelPairs().toMap

  /** Same labeling as an array of (node, minLabel) pairs — no immutable-Map
    * overhead. (The pipeline's driver CC finish uses the faster
    * primitive-array union-find in
    * [[graft.pipeline.ConnectedComponents]]; this stays the simple oracle.)
    */
  def labelPairs(): Array[(Long, Long)] = {
    val minOf = mutable.LongMap.empty[Long]
    parent.keys.foreach { n =>
      val r = find(n)
      minOf(r) = math.min(minOf.getOrElse(r, Long.MaxValue), n)
    }
    val out = new Array[(Long, Long)](parent.size)
    var i = 0
    parent.keys.foreach { n => out(i) = (n, minOf(find(n))); i += 1 }
    out
  }
}
