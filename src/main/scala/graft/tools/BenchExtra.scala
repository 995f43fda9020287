package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query repeated timing with the noop sink (guide §1.4) — the
  * measurement companion to the FROZEN graft.Bench: BENCH_QUERY_REPS
  * (default 3) timed reps per query after one untimed warm-up, reporting
  * median/min/max per query so a single slow host window cannot read as a
  * phantom regression (VERDICT round-5 ask #2). Query selection via
  * BENCH_QUERIES_ONLY (comma-separated names; default all). Prints ONE
  * JSON line: {"queries":{name:{"med":s,"min":s,"max":s,"reps":[..]}},
  * "noise_probe_mops":[..],"cores":C,"sf":dir}.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = math.max(1, sys.env.get("BENCH_QUERY_REPS")
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(3))
    val only = sys.env.get("BENCH_QUERIES_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val toRun = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val probes = scala.collection.mutable.ArrayBuffer(graft.Bench.noiseProbe())
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val results = toRun.map { case (name, fn) =>
      spark.sparkContext.setJobDescription(name)
      once(fn) // warm-up (JIT + codegen + shuffle service)
      val walls = (1 to reps).map(_ => once(fn)).sorted
      val med =
        if (walls.length % 2 == 1) walls(walls.length / 2)
        else (walls(walls.length / 2 - 1) + walls(walls.length / 2)) / 2.0
      System.err.println(f"[benchextra] $name med=$med%.3f " +
        walls.map(w => f"$w%.3f").mkString("[", ",", "]"))
      name -> (med, walls)
    }
    probes += graft.Bench.noiseProbe()
    val qs = results.map { case (k, (med, walls)) =>
      f""""$k":{"med":$med%.3f,"min":${walls.min}%.3f,"max":${walls.max}%.3f,""" +
        walls.map(w => f"$w%.3f").mkString(""""reps":[""", ",", "]}")
    }.mkString("{", ",", "}")
    val probeJson = probes.map(p => f"$p%.1f").mkString("[", ",", "]")
    println(s"""{"queries":$qs,"noise_probe_mops":$probeJson,""" +
      s""""cores":$cpus,"sf":"$sfDir"}""")
    spark.stop()
  }
}
