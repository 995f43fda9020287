package graft.core

/** Configuration of the MinHash sketch family.
  *
  * Reproduces the reference's parameter surface
  * (`/root/reference/src/minhash_clustering.cpp:77-83`, README:61-70):
  *   - `kmerLen`   (k, default 6): character shingle length.
  *   - `bandWidth` (c = the reference's `shingle_size`, default 2): number of
  *     minima kept per hash function; a "band" is one hash function's c minima.
  *   - `numHashes` (h): number of hash functions = number of bands.
  *   - `prime`     P = 1,280,000,003 (`minhash_clustering.cpp:27`).
  *   - `randoms`   interleaved (a_i, b_i) pairs for the universal hash family
  *     h_i(x) = (a_i * x + b_i) mod P
  *     (`shingling_cluster_generator_optimized.cpp:621-624`), loaded from a
  *     checked-in file exactly like the reference's `-x use_fixed_randoms`
  *     path (`shingling_toolbox.cpp:22-39`, README:77).
  *
  * All arithmetic fits signed 64-bit: kmer values < 26*Σ20^i ≈ 8.5e7 < 2^27,
  * a,b < 2^31 ⇒ a*x + b < 2^58.
  */
final case class MinHashParams(
    kmerLen: Int = 6,
    bandWidth: Int = 2,
    numHashes: Int = 41,
    prime: Long = MinHashParams.DefaultPrime,
    randoms: Array[Long] = HashRandoms.default
) extends Serializable {
  require(kmerLen >= 1, s"kmerLen must be >= 1, got $kmerLen")
  require(bandWidth >= 1, s"bandWidth must be >= 1, got $bandWidth")
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
  require(
    randoms.length >= 2 * numHashes,
    s"need ${2 * numHashes} randoms for $numHashes hash functions, got ${randoms.length}"
  )

  def a(i: Int): Long = randoms(2 * i)
  def b(i: Int): Long = randoms(2 * i + 1)

  /** h_i(x) = (a_i*x + b_i) mod P — the permutation family the north rule
    * requires byte-exact (`shingling_cluster_generator_optimized.cpp:621-624`).
    */
  @inline def hash(i: Int, x: Long): Long = (x * a(i) + b(i)) % prime
}

object MinHashParams {
  val DefaultPrime: Long = 1280000003L
}
