package graft.core

import org.scalatest.funsuite.AnyFunSuite

class ShinglerSpec extends AnyFunSuite {

  /** Direct positional formula — the reference's init path (`:607-610`). */
  private def direct(text: String, k: Int): Array[Long] =
    (0 to text.length - k).map { i =>
      var v = 0L
      (0 until k).foreach { j =>
        v += (text.charAt(i + j) - 'A').toLong *
          math.round(math.pow(Shingler.AlphabetSize, k - 1 - j))
      }
      v
    }.toArray

  private def azText(rng: scala.util.Random, len: Int): String =
    (0 until len).map(_ => ('A' + rng.nextInt(26)).toChar).mkString

  test("rolling path equals the direct positional formula (`:604-619`)") {
    val rng = new scala.util.Random(7)
    for (_ <- 0 until 300) {
      val t = azText(rng, rng.nextInt(200))
      val k = 1 + rng.nextInt(8)
      assert(Shingler.kmerValues(t, k).toSeq == direct(t, k).toSeq,
        s"k=$k text=$t")
    }
  }

  test("hand-checked values, k=3") {
    // "ABC" -> 0*400 + 1*20 + 2 = 22; "BCD" -> 1*400+2*20+3 = 443
    assert(Shingler.kmerValues("ABCD", 3).toSeq == Seq(22L, 443L))
  }

  test("digits beyond base 20 (V..Z) are kept as-is — the reference quirk") {
    // "ZZZ" -> 25*400 + 25*20 + 25 = 10525
    assert(Shingler.kmerValues("ZZZ", 3).toSeq == Seq(10525L))
  }

  test("short text yields no kmers") {
    assert(Shingler.kmerValues("AB", 3).isEmpty)
    assert(Shingler.kmerValues("", 3).isEmpty)
  }

  test("packed sets: pack/merge-count round-trips exactly vs array form") {
    val rng = new scala.util.Random(53)
    for (_ <- 0 until 200) {
      def randSet() = Shingler.shingleSet(
        (0 until rng.nextInt(300)).map(_ => ('A' + rng.nextInt(26)).toChar)
          .mkString, 6)
      val a = randSet(); val b = randSet()
      val pa = Shingler.packSet(a); val pb = Shingler.packSet(b)
      assert(Shingler.packedSize(pa) == a.length)
      assert(Shingler.intersectionSizePacked(pa, pb) ==
        Shingler.intersectionSize(a, b))
      assert(pa.length < math.max(8, a.length * 5),
        s"packing should be compact: ${pa.length} bytes for ${a.length} values")
    }
    // edge: empty sets
    val e = Shingler.packSet(Array.emptyLongArray)
    assert(Shingler.packedSize(e) == 0)
    assert(Shingler.intersectionSizePacked(e, e) == 0)
  }

  test("shingleSet is sorted-distinct; jaccard merge-count is exact") {
    val rng = new scala.util.Random(11)
    for (_ <- 0 until 200) {
      val a = azText(rng, rng.nextInt(120))
      val b = azText(rng, rng.nextInt(120))
      val sa = Shingler.shingleSet(a, 3)
      val sb = Shingler.shingleSet(b, 3)
      assert(sa.toSeq == sa.toSeq.distinct.sorted)
      val (setA, setB) = (sa.toSet, sb.toSet)
      val expected =
        if (setA.isEmpty && setB.isEmpty) 0.0
        else (setA & setB).size.toDouble / (setA | setB).size
      assert(Shingler.jaccard(sa, sb) == expected)
    }
  }
}
