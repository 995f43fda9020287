package graft.core

import graft.pipeline.{DedupPipeline, VertexSketchCache}

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the pure kernels — the invariants the distributed
  * operators rest on, checked over generated inputs (no Spark session;
  * raw scalacheck driven from scalatest, the plus-bridge artifact is not
  * in the offline cache).
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(label: String, p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$label: ${res.status}")
  }

  private val sortedDistinctLongs: Gen[Array[Long]] =
    Gen.listOf(Gen.chooseNum(0L, Long.MaxValue / 2))
      .map(_.distinct.sorted.toArray)

  test("packSet round-trips: size and intersection match the array form") {
    check("packSet", Prop.forAll(sortedDistinctLongs, sortedDistinctLongs) {
      (a: Array[Long], b: Array[Long]) =>
        val pa = Shingler.packSet(a)
        val pb = Shingler.packSet(b)
        Shingler.packedSize(pa) == a.length &&
        Shingler.intersectionSizePacked(pa, pb) ==
          Shingler.intersectionSize(a, b)
    })
  }

  test("mergeMinima == c smallest of the concatenation, per hash block") {
    check("mergeMinima",
      Prop.forAll(Gen.chooseNum(1, 4), Gen.chooseNum(1, 5), Gen.long) {
        (c, blocks, seed) =>
          val rng = new scala.util.Random(seed)
          def block(): Array[Long] =
            Array.fill(c)(rng.nextLong().abs % 1000).sorted
          val a = Array.fill(blocks)(block()).flatten
          val b = Array.fill(blocks)(block()).flatten
          val merged = VertexSketchCache.mergeMinima(a, b, c)
          (0 until blocks).forall { blk =>
            val want = (a.slice(blk * c, blk * c + c) ++
              b.slice(blk * c, blk * c + c)).sorted.take(c)
            merged.slice(blk * c, blk * c + c).toSeq == want.toSeq
          }
      })
  }

  test("salted block decomposition covers every pair exactly once") {
    // the invariant candidatePairs' salted path rests on: each unordered
    // pair of a bucket lands in exactly ONE salted group
    // (min(bi,bj), max(bi,bj)); the diagonal group handles same-block pairs
    check("salted",
      Prop.forAll(Gen.chooseNum(2, 6), Gen.nonEmptyListOf(Gen.long)) {
        (nBlocks: Int, idsRaw: List[Long]) =>
          val ids = idsRaw.distinct
          val blockOf = ids.map(id =>
            id -> DedupPipeline.blockOf(id, nBlocks)).toMap
          // replicate each id into its nBlocks groups, as saltedGroups does
          val groups = ids.flatMap { id =>
            val b = blockOf(id)
            (0 until nBlocks)
              .map(g => (math.min(b, g), math.max(b, g)) -> (b, id))
          }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
          // emit pairs per group, as saltedPairs does
          val emitted = groups.toSeq.flatMap { case ((gi, gj), members) =>
            if (gi == gj) {
              val xs = members.filter(_._1 == gi).map(_._2).sorted
              for (i <- xs.indices; j <- i + 1 until xs.length)
                yield (xs(i), xs(j))
            } else {
              val left = members.filter(_._1 == gi).map(_._2)
              val right = members.filter(_._1 == gj).map(_._2)
              for (x <- left; y <- right)
                yield (math.min(x, y), math.max(x, y))
            }
          }
          val want = (for {
            i <- ids.indices; j <- i + 1 until ids.length
          } yield (math.min(ids(i), ids(j)), math.max(ids(i), ids(j)))).sorted
          blockOf.values.forall(b => b >= 0 && b < nBlocks) &&
            emitted.sorted == want
      })
  }

  test("blockOf is deterministic and in range for any id") {
    check("blockOf", Prop.forAll(Gen.long, Gen.chooseNum(1, 1000)) {
      (id: Long, n: Int) =>
        val b = DedupPipeline.blockOf(id, n)
        b >= 0 && b < n && b == DedupPipeline.blockOf(id, n)
    })
  }

  test("NMI is symmetric and within [0, 1] on random clusterings") {
    check("nmi",
      Prop.forAll(Gen.chooseNum(2L, 8L), Gen.chooseNum(2L, 8L), Gen.long) {
        (kx, ky, seed) =>
          val rng = new scala.util.Random(seed)
          val members = (1L to 50L)
          val x = members.map(m => m -> rng.nextLong().abs % kx).toMap
          val y = members.map(m => m -> rng.nextLong().abs % ky).toMap
          val s = NMI.score(x, y)
          s >= -1e-12 && s <= 1.0 + 1e-12 &&
            math.abs(s - NMI.score(y, x)) < 1e-12
      })
  }
}
