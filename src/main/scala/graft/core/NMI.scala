package graft.core

/** Serial normalized mutual information between two clusterings — the
  * reference's legacy NMI evaluator (SURVEY.md A14,
  * `/root/reference/src/fvalue_evaluator.cpp:200-365`):
  * NMI = 2 I(X;Y) / (H(X) + H(Y)) over the shared-member contingency.
  * Members present in only one side are ignored (join semantics, matching
  * the reference's member equi-join and [[graft.pipeline.Evaluator]]).
  */
object NMI {

  def score(x: Map[Long, Long], y: Map[Long, Long]): Double = {
    val shared = x.keySet.intersect(y.keySet).toSeq
    val n = shared.size.toDouble
    if (n == 0) return 0.0
    val cx = shared.groupBy(x).map { case (k, v) => k -> v.size.toDouble }
    val cy = shared.groupBy(y).map { case (k, v) => k -> v.size.toDouble }
    val joint = shared.groupBy(m => (x(m), y(m)))
      .map { case (k, v) => k -> v.size.toDouble }

    def h(counts: Iterable[Double]): Double =
      -counts.map { c => val p = c / n; if (p > 0) p * math.log(p) else 0.0 }.sum

    val hx = h(cx.values)
    val hy = h(cy.values)
    if (hx == 0.0 && hy == 0.0) return 1.0 // both trivial: identical
    val mi = joint.map { case ((lx, ly), c) =>
      val pxy = c / n
      pxy * math.log(pxy * n * n / (cx(lx) * cy(ly)) )
    }.sum
    2.0 * mi / (hx + hy)
  }
}
