package graft.core

import org.scalatest.funsuite.AnyFunSuite

class OracleSpec extends AnyFunSuite {

  test("union-find: components labeled by min member (`union_find.cpp:43-63`)") {
    val uf = new UnionFind
    Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).foreach(uf.add)
    uf.union(5, 3); uf.union(3, 7); uf.union(2, 6)
    val comp = uf.componentsByMinLabel()
    assert(comp(5L) == 3L && comp(3L) == 3L && comp(7L) == 3L)
    assert(comp(2L) == 2L && comp(6L) == 2L)
    assert(comp(1L) == 1L && comp(4L) == 4L)
  }

  test("oracle: identical docs always pair and cluster together") {
    val p = MinHashParams(kmerLen = 6, bandWidth = 2, numHashes = 8)
    val docs = Seq(
      10L -> "QWERTYUIOPASDFGHJKLZXCVBNMQWERTY",
      20L -> "QWERTYUIOPASDFGHJKLZXCVBNMQWERTY",
      30L -> "ZZZZZZYYYYYYXXXXXXWWWWWWVVVVVVUU"
    )
    val r = SerialOracle.run(docs, p)
    assert(r.pairs.contains((10L, 20L)))
    assert(r.clusters(10L) == 10L && r.clusters(20L) == 10L)
    assert(r.clusters(30L) == 30L)
  }

  test("oracle: jaccard threshold prunes dissimilar bucket collisions") {
    val p = MinHashParams(kmerLen = 3, bandWidth = 1, numHashes = 2)
    // c=1 banding collides easily; threshold 1.0 keeps only exact sets
    val docs = Seq(1L -> "ABCDEFGH", 2L -> "ABCDEFGH", 3L -> "HGFEDCBA")
    val strict = SerialOracle.run(docs, p, jaccardThreshold = 1.0)
    assert(strict.pairs.forall { case (a, b) => Set(a, b) == Set(1L, 2L) })
  }

  test("fscore: identical clusterings score 1.0") {
    val x = Map(1L -> 10L, 2L -> 10L, 3L -> 30L, 4L -> 30L)
    val (fx, fy, avg) = FScore.score(x, x)
    assert(fx == 1.0 && fy == 1.0 && avg == 1.0)
  }

  test("fscore: hand-computed 2x2 example (`fvalue_evaluator.cpp:457-511`)") {
    // X: {1,2,3}, {4};  Y: {1,2}, {3,4}
    val x = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L)
    val y = Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L)
    // pair (X1,Y1): i=2, p=2/3, r=1, f=0.8 ; (X1,Y3): i=1, p=1/3, r=1/2, f=0.4
    // (X4,Y3): i=1, p=1, r=1/2, f=2/3
    // bestX: X1=0.8 (w3), X4=2/3 (w1) => fX = (0.8*3 + 2/3)/4 = 0.76667
    // bestY: Y1=0.8 (w2), Y3=2/3 (w2) => fY = (0.8*2 + (2/3)*2)/4 = 0.73333
    val (fx, fy, avg) = FScore.score(x, y)
    assert(math.abs(fx - (0.8 * 3 + 2.0 / 3) / 4) < 1e-12)
    assert(math.abs(fy - (0.8 * 2 + (2.0 / 3) * 2) / 4) < 1e-12)
    assert(math.abs(avg - (fx + fy) / 2) < 1e-15)
  }

  test("fscore is symmetric in avg for swapped sides") {
    val x = Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L, 5L -> 3L)
    val y = Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L, 5L -> 5L)
    val (fx1, fy1, a1) = FScore.score(x, y)
    val (fx2, fy2, a2) = FScore.score(y, x)
    assert(fx1 == fy2 && fy1 == fx2 && a1 == a2)
  }
}
