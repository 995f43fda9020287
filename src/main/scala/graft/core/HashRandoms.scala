package graft.core

import scala.io.Source

/** Loader for the fixed hash-randoms file — same contract as the reference's
  * `-x use_fixed_randoms` option, which reads `max_hash*2` integers one per
  * line (`/root/reference/src/shingling_toolbox.cpp:22-39`; README:77). The
  * reference's data file did not survive in the repo, so ours is a
  * checked-in resource generated once with a fixed seed (positive ints
  * < 2^31, matching the range of the reference's `rand()` fallback).
  */
object HashRandoms {
  val ResourcePath = "/graft/random_hash_abs"

  /** 4000 ints = (a,b) for up to 2000 hash functions. */
  lazy val default: Array[Long] = fromResource(ResourcePath)

  def fromResource(path: String): Array[Long] = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"missing resource $path")
    try Source.fromInputStream(in, "UTF-8").getLines().map(_.trim)
      .filter(_.nonEmpty).map(_.toLong).toArray
    finally in.close()
  }
}
