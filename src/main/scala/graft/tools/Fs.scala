package graft.tools

/** Shared filesystem helpers for the measurement mains (Bench, SweepBench,
  * ProfVerify) — one recursive delete instead of a copy per main.
  */
object Fs {
  def rmRf(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(rmRf)
    f.delete(): Unit
  }
}
