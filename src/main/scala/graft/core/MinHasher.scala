package graft.core

/** The c-min MinHash sketch.
  *
  * Per (document, hash function i): the `c` smallest values of
  * h_i(x) = (a_i*x + b_i) mod P over the **multiset of k-mer occurrences**
  * (duplicate k-mers contribute once per occurrence), ascending — the
  * reference's bounded sorted insert `update_hash_func_min_values`
  * (`/root/reference/src/shingling_cluster_generator_optimized.cpp:636-672`).
  * A band is emitted only if the row accumulated >= c values, i.e. the doc
  * has >= c k-mer occurrences — the completeness gate at `:680`
  * (`emit_min_shingle_kvs`, `:674-693`). The emitted band key embeds the
  * hash-function index (`:679-689`), so buckets never collide across bands.
  *
  * This class is reusable and thread-confined: create one per partition
  * (`mapPartitions`) and call [[bands]] per row.
  */
final class MinHasher(val params: MinHashParams) extends Serializable {
  private val h = params.numHashes
  private val c = params.bandWidth
  // flattened h x c minima buffer, reused across documents
  @transient private lazy val buf = new Array[Long](h * c)

  /** Sketch of one document: for each hash i the ascending c minima, or
    * `null` entry when the gate fails (fewer than c occurrences).
    * The returned arrays are fresh (safe to retain).
    */
  def sketch(text: String): Array[Array[Long]] = {
    val ks = Shingler.kmerValues(text, params.kmerLen)
    val out = new Array[Array[Long]](h)
    if (ks.length < c) return out // gate fails for every band at once
    val b = buf
    java.util.Arrays.fill(b, Long.MaxValue)
    var p = 0
    while (p < ks.length) {
      val x = ks(p)
      var i = 0
      while (i < h) {
        val hv = (x * params.a(i) + params.b(i)) % params.prime
        // bounded sorted insert into b[i*c .. i*c+c-1] (ascending, dups kept)
        val base = i * c
        var pos = base + c - 1
        if (hv < b(pos)) {
          while (pos > base && hv < b(pos - 1)) { b(pos) = b(pos - 1); pos -= 1 }
          b(pos) = hv
        }
        i += 1
      }
      p += 1
    }
    var i = 0
    while (i < h) {
      out(i) = java.util.Arrays.copyOfRange(b, i * c, i * c + c)
      i += 1
    }
    out
  }

  /** Bands for hash indices [from, until) only — the incremental-recompute
    * path: the reference's persistent sketch cache computes only the rows
    * for hash functions it has not seen (`latest_hashed` bookkeeping,
    * `shingling_cluster_generator_optimized.cpp:469-547`, `:147`). Cost is
    * O(L * (until-from) * c): hash rows are mutually independent.
    */
  def bandsInRange(text: String, from: Int, until: Int): Array[(Int, Long)] = {
    require(from >= 0 && until <= h && from <= until)
    if (from == until) return Array.empty
    val ks = Shingler.kmerValues(text, params.kmerLen)
    if (ks.length < c) return Array.empty
    val n = until - from
    val b = new Array[Long](n * c)
    java.util.Arrays.fill(b, Long.MaxValue)
    var p = 0
    while (p < ks.length) {
      val x = ks(p)
      var i = 0
      while (i < n) {
        val hv = (x * params.a(from + i) + params.b(from + i)) % params.prime
        val base = i * c
        var pos = base + c - 1
        if (hv < b(pos)) {
          while (pos > base && hv < b(pos - 1)) { b(pos) = b(pos - 1); pos -= 1 }
          b(pos) = hv
        }
        i += 1
      }
      p += 1
    }
    val out = new Array[(Int, Long)](n)
    var i = 0
    while (i < n) {
      out(i) = (from + i,
        MinHasher.pack(java.util.Arrays.copyOfRange(b, i * c, i * c + c),
          params.prime))
      i += 1
    }
    out
  }

  /** Packed band keys as a primitive array (index = band index), empty when
    * the >= c occurrence gate fails — the allocation-light form for the hot
    * Spark path (pair with `posexplode`; tuple-per-band boxing measured as
    * the dominant GC source in the signature stage).
    */
  def bandKeys(text: String): Array[Long] = {
    val ks = Shingler.kmerValues(text, params.kmerLen)
    if (ks.length < c) return Array.emptyLongArray
    val b = buf
    java.util.Arrays.fill(b, Long.MaxValue)
    var p = 0
    while (p < ks.length) {
      val x = ks(p)
      var i = 0
      while (i < h) {
        val hv = (x * params.a(i) + params.b(i)) % params.prime
        val base = i * c
        var pos = base + c - 1
        if (hv < b(pos)) {
          while (pos > base && hv < b(pos - 1)) { b(pos) = b(pos - 1); pos -= 1 }
          b(pos) = hv
        }
        i += 1
      }
      p += 1
    }
    val out = new Array[Long](h)
    var i = 0
    while (i < h) {
      out(i) =
        if (c == 2) b(i * 2) * params.prime + b(i * 2 + 1)
        else if (c == 1) b(i)
        else MinHasher.pack(java.util.Arrays.copyOfRange(b, i * c, i * c + c),
          params.prime)
      i += 1
    }
    out
  }

  /** Bands passing the gate, packed for shuffle: (bandIdx, packedKey).
    * For c <= 2 the packing is collision-free and SQL-reproducible:
    * key = m0 (c=1) or m0*P + m1 (c=2; both < P so the product < 2^62).
    * For c > 2 a 64-bit mix is used (collisions ~2^-64, documented).
    */
  def bands(text: String): Array[(Int, Long)] = {
    val sk = sketch(text)
    if (sk(0) == null) return Array.empty
    val out = new Array[(Int, Long)](h)
    var i = 0
    while (i < h) {
      out(i) = (i, MinHasher.pack(sk(i), params.prime))
      i += 1
    }
    out
  }
}

object MinHasher {
  def pack(minima: Array[Long], prime: Long): Long = {
    if (minima.length == 1) minima(0)
    else if (minima.length == 2) minima(0) * prime + minima(1)
    else {
      // 64-bit fmix-style fold for c > 2 (not SQL-oracle-exact; documented)
      var acc = 0x9E3779B97F4A7C15L
      var i = 0
      while (i < minima.length) {
        var k = minima(i)
        k *= 0xFF51AFD7ED558CCDL; k ^= k >>> 33; k *= 0xC4CEB9FE1A85EC53L
        acc = (acc ^ k) * 0x2545F4914F6CDD1DL
        i += 1
      }
      acc
    }
  }
}
