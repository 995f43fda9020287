package graft.core

import org.scalatest.funsuite.AnyFunSuite

class MinHasherSpec extends AnyFunSuite {

  private def params(h: Int, c: Int, k: Int = 3) = MinHashParams(
    kmerLen = k, bandWidth = c, numHashes = h)

  /** Brute force: c smallest over the occurrence multiset, ascending —
    * independent of the bounded-insert implementation.
    */
  private def brute(text: String, p: MinHashParams): Array[Array[Long]] = {
    val ks = Shingler.kmerValues(text, p.kmerLen)
    (0 until p.numHashes).map { i =>
      if (ks.length < p.bandWidth) null
      else ks.map(x => p.hash(i, x)).sorted.take(p.bandWidth)
    }.toArray
  }

  private def azText(rng: scala.util.Random, len: Int): String =
    (0 until len).map(_ => ('A' + rng.nextInt(26)).toChar).mkString

  test("sketch equals brute-force c-min over the occurrence multiset") {
    val rng = new scala.util.Random(13)
    for (trial <- 0 until 150) {
      val p = params(h = 1 + rng.nextInt(12), c = 1 + rng.nextInt(4))
      val hasher = new MinHasher(p)
      val t = azText(rng, rng.nextInt(80))
      val got = hasher.sketch(t)
      val want = brute(t, p)
      (0 until p.numHashes).foreach { i =>
        if (want(i) == null) assert(got(i) == null || got.forall(_ == null))
        else assert(got(i).toSeq == want(i).toSeq, s"trial=$trial hash=$i t=$t")
      }
    }
  }

  test("duplicate occurrences are kept (multiset semantics, `:636-672`)") {
    val p = params(h = 4, c = 3)
    val hasher = new MinHasher(p)
    // "AAAAA" with k=3: three occurrences of the same kmer AAA
    val sk = hasher.sketch("AAAAA")
    (0 until 4).foreach { i =>
      val hv = p.hash(i, Shingler.kmerValues("AAA", 3)(0))
      assert(sk(i).toSeq == Seq(hv, hv, hv))
    }
  }

  test("emit gate: fewer than c occurrences emits nothing (`:680`)") {
    val p = params(h = 3, c = 2)
    val hasher = new MinHasher(p)
    assert(hasher.bands("ABC").isEmpty) // one occurrence < c = 2
    assert(hasher.bands("AB").isEmpty) // zero occurrences
    assert(hasher.bands("ABCD").length == 3) // two occurrences = c
  }

  test("band keys embed the hash index — no cross-band collisions (`:679-689`)") {
    val p = params(h = 5, c = 2)
    val hasher = new MinHasher(p)
    val bs = hasher.bands("ABCDEFGH")
    assert(bs.map(_._1).toSeq == (0 until 5))
  }

  test("c=2 packing is collision-free and invertible") {
    val P = MinHashParams.DefaultPrime
    val rng = new scala.util.Random(17)
    for (_ <- 0 until 1000) {
      val m0 = math.abs(rng.nextLong()) % P
      val m1 = math.abs(rng.nextLong()) % P
      val packed = MinHasher.pack(Array(m0, m1), P)
      assert(packed / P == m0 && packed % P == m1)
    }
  }

  test("kmerLen that would overflow 64-bit hash arithmetic fails loudly") {
    // with the default randoms (a, b < 2^31) k = 7 is the last safe length
    MinHashParams(kmerLen = 7) // must construct fine
    val ex = intercept[IllegalArgumentException] { MinHashParams(kmerLen = 8) }
    assert(ex.getMessage.contains("overflow"))
  }

  test("identical texts produce identical bands; sketch is deterministic") {
    val p = params(h = 8, c = 2, k = 6)
    val a = new MinHasher(p)
    val b = new MinHasher(p)
    val t = azText(new scala.util.Random(19), 100)
    assert(a.bands(t).toSeq == b.bands(t).toSeq)
    assert(a.bands(t).toSeq == a.bands(t).toSeq)
  }
}
