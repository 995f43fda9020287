package graft

import graft.core.MinHashParams
import graft.pipeline.{DedupConfig, DedupPipeline, Pages, PagesGen}

import org.apache.spark.sql.SparkSession

/** Benchmark main. Prints ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec",
  *    "queries":{<name>:<sec>,...},
  *    "pipeline":{"docs":N,"seconds":s,"docs_per_sec":r},
  *    "cores":C,"sf":"<dir>"}
  *
  * The headline is the end-to-end dedup pipeline (read -> signatures ->
  * LSH pairs -> exact-Jaccard verify -> connected components -> write) on a
  * deterministic synthetic page corpus sized by BENCH_DOCS (default 50k);
  * the `queries` section times every SparkEntry query on
  * SPARK_GRAFT_SF_DIR. Run at SPARK_GRAFT_CPUS=8 and =32 on the same input
  * for the two-parallelism scaling-efficiency evidence (BASELINE.md).
  */
object Bench {
  /** Tolerant env-int parse: a malformed knob ("3 ", "3x") degrades to the
    * default instead of aborting the whole bench before any JSON is
    * emitted (the SnapshotCatalog env-parse discipline).
    */
  private def envInt(name: String, default: Int): Int =
    sys.env.get(name)
      .flatMap(v => scala.util.Try(v.trim.toInt).toOption).getOrElse(default)

  /** Same degradation contract for boolean knobs (`BENCH_QUERIES=yes`
    * must not abort the bench before the JSON artifact is emitted).
    */
  private def envBool(name: String, default: Boolean): Boolean =
    sys.env.get(name)
      .flatMap(v => scala.util.Try(v.trim.toBoolean).toOption)
      .getOrElse(default)

  /** Same-process CPU-noise probe: a fixed single-thread xorshift loop
    * timed at known points of the run, reported in the bench JSON so a
    * slow host window is self-evident IN the artifact instead of
    * reconstructed after the fact (this host's wall-clock swings up to
    * ~1.8x between identical runs — BASELINE.md).
    *
    * @return measured rate in M iterations/sec (higher = faster window)
    */
  def noiseProbe(): Double = {
    val iters = 400000000L
    var x = 0x9E3779B97F4A7C15L
    val t0 = System.nanoTime()
    var i = 0L
    while (i < iters) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      i += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    if (x == 42L) System.err.println("") // defeat dead-code elimination
    iters / sec / 1e6
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 500k default: large enough that fixed costs (JVM warm-up, stage
    // commits, corpus generation) stop dominating docs_per_sec — at 50k the
    // headline under-reported steady-state throughput ~10x (BASELINE.md)
    val benchDocs = envInt("BENCH_DOCS", 500000)
    val benchHashes = envInt("BENCH_HASHES", 16)
    val runQueries = envBool("BENCH_QUERIES", true)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val withStages = envBool("BENCH_STAGES", true)
    // end-to-end dedup throughput on a fresh stage dir; corpus generation
    // is materialized outside the timed window
    def runPipeline(nDocs: Int, hashes: Int): (Long, Long, Double) = {
      val stageDir = java.nio.file.Files
        .createTempDirectory("graft-bench").toString
      val pages = PagesGen.benchDF(spark, nDocs).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nPages = pages.count()
      val cfg = DedupConfig(
        params = MinHashParams(numHashes = hashes),
        jaccardThreshold = 0.5,
        maxBucketSize = 100000,
        outputDir = if (withStages) Some(stageDir) else None)
      val t0 = System.nanoTime()
      val nOut = DedupPipeline.run(spark, pages, cfg).count()
      val sec = (System.nanoTime() - t0) / 1e9
      pages.unpersist()
      // a bench must not leak ~2 GB of stage parquet per invocation
      graft.tools.Fs.rmRf(new java.io.File(stageDir))
      (nOut, nPages, sec)
    }
    // Pipeline blocks run BENCH_PIPELINE_REPS times (default 3) and report
    // the MEDIAN with min/max spread: this host's wall-clock swings up to
    // ~1.8x between identical runs (BASELINE.md), so a single sample can
    // read as a phantom regression (BENCH_r03's 500k block measured 14.6k
    // docs/s where a same-code clean run gave 21.6k)
    val reps = math.max(1, envInt("BENCH_PIPELINE_REPS", 3))
    final case class PipeStat(docs: Long, inputDocs: Long, median: Double,
        walls: Seq[Double])
    def runPipelineMedian(nDocs: Int, hashes: Int): PipeStat = {
      val runs = (1 to reps).map(_ => runPipeline(nDocs, hashes))
      require(runs.map(r => (r._1, r._2)).distinct.size == 1,
        s"non-deterministic pipeline output across reps: ${runs.map(_._1)}")
      val secs = runs.map(_._3).sorted
      val med =
        if (secs.length % 2 == 1) secs(secs.length / 2)
        else (secs(secs.length / 2 - 1) + secs(secs.length / 2)) / 2.0
      PipeStat(runs.head._1, runs.head._2, med, runs.map(_._3))
    }
    // probe the host window before / between / after the pipeline blocks
    val probes = scala.collection.mutable.ArrayBuffer(noiseProbe())
    val pipeStat = runPipelineMedian(benchDocs, benchHashes)
    probes += noiseProbe()
    // BASELINE.md operating point (4M docs, 41 hashes, tau 0.5, stages on)
    // so the per-round bench artifact is row-for-row comparable with the
    // hand-measured scaling pairs; BENCH_HEADLINE_DOCS=0 skips it
    val headlineDocs = envInt("BENCH_HEADLINE_DOCS", 4000000)
    val headline =
      if (headlineDocs <= 0) None
      else Some(runPipelineMedian(headlineDocs, 41))
    probes += noiseProbe()

    val toRun = if (runQueries) SparkEntry.queries.toSeq.sortBy(_._1)
      else Seq.empty
    // warm-up pass: run the suite once untimed so the timed pass measures
    // plan cost, not first-query JIT + codegen + shuffle-service warm-up
    // (BENCH_WARMUP=false for single-shot cold numbers)
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark
        .sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        false
      }
    if (envBool("BENCH_WARMUP", true))
      toRun.foreach { case (n, f) => runOnce(n, f) }
    val results = toRun.map { case (name, fn) =>
      val t = System.nanoTime()
      val ok = runOnce(name, fn)
      if (!ok) failures += name
      // a crashed query must never read as a fast time: poison its entry
      name -> (if (ok) (System.nanoTime() - t) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + pipeStat.median +
      headline.map(_.median).getOrElse(0.0)
    // "seconds"/"docs_per_sec" carry the MEDIAN rep (comparable row-for-row
    // with earlier rounds' single-sample blocks); "reps_sec" carries every
    // per-rep wall so the spread is in the artifact itself
    def pipeJson(t: PipeStat): String =
      f"""{"docs":${t.docs},"input_docs":${t.inputDocs},""" +
        f""""seconds":${t.median}%.3f,"docs_per_sec":${t.docs / t.median}%.1f,""" +
        f""""seconds_min":${t.walls.min}%.3f,"seconds_max":${t.walls.max}%.3f,""" +
        s""""reps":${t.walls.length},""" +
        t.walls.map(w => f"$w%.3f").mkString(""""reps_sec":[""", ",", "]}")
    val pipe = pipeJson(pipeStat)
    val head = headline.map(h => s""""pipeline_4m":${pipeJson(h)},""")
      .getOrElse("")
    val failed = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val probeJson = probes.map(p => f"$p%.1f").mkString("[", ",", "]")
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec",""" +
      s""""queries":$qs,"pipeline":$pipe,$head"failed":$failed,""" +
      s""""noise_probe_mops":$probeJson,""" +
      s""""cores":$cpus,"sf":"$sfDir"}""")
    spark.stop()
    if (failures.nonEmpty) sys.exit(1)
  }
}
