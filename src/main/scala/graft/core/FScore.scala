package graft.core

/** Weighted best-match F-score between two clusterings — the reference's
  * `fvalue_evaluator` MR path (A11–A13):
  *   - per intersecting cluster pair (X,Y): |X∩Y| via member equi-join
  *     (`/root/reference/src/fvalue_evaluator.cpp:367-386`, `:422-455`);
  *   - per cluster: p = ∩/|X|, r = ∩/|Y|, F1 = 2pr/(p+r), take the best
  *     match, weight by own size (`:457-511` at `:472-474`; `:938-977` best
  *     at `:960-966`, weight `:967`);
  *   - F_side = Σ weighted_F1 / Σ memberships per side; final
  *     f = (F_x + F_y) / 2 (`:186-189`).
  *
  * Serial form for tests; the Spark form is `graft.pipeline.Evaluator`.
  */
object FScore {

  /** assignments: member -> label. Returns (fX, fY, avg). */
  def score(x: Map[Long, Long], y: Map[Long, Long]): (Double, Double, Double) = {
    val sizeX = x.groupBy(_._2).map { case (l, m) => l -> m.size }
    val sizeY = y.groupBy(_._2).map { case (l, m) => l -> m.size }
    // intersection sizes over shared members
    val inter = x.keysIterator.filter(y.contains)
      .map(m => (x(m), y(m))).toSeq
      .groupBy(identity).map { case (k, v) => k -> v.size }

    def f1(i: Int, nx: Int, ny: Int): Double = {
      val p = i.toDouble / nx
      val r = i.toDouble / ny
      if (p + r == 0) 0.0 else 2 * p * r / (p + r)
    }

    val bestX = inter.groupBy(_._1._1).map { case (lx, m) =>
      lx -> m.map { case ((_, ly), i) => f1(i, sizeX(lx), sizeY(ly)) }.max
    }
    val bestY = inter.groupBy(_._1._2).map { case (ly, m) =>
      ly -> m.map { case ((lx, _), i) => f1(i, sizeX(lx), sizeY(ly)) }.max
    }
    val totX = sizeX.values.sum.toDouble
    val totY = sizeY.values.sum.toDouble
    val fX = sizeX.map { case (l, n) => bestX.getOrElse(l, 0.0) * n }.sum / totX
    val fY = sizeY.map { case (l, n) => bestY.getOrElse(l, 0.0) * n }.sum / totY
    (fX, fY, (fX + fY) / 2)
  }
}
