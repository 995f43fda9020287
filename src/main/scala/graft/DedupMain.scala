package graft

import graft.core.MinHashParams
import graft.pipeline.{DedupConfig, DedupPipeline, Pages, PagesGen}

import org.apache.spark.sql.SparkSession

/** spark-submit entry point: synthesize (or read) a pages table, run the
  * dedup pipeline with per-stage checkpointing, print a cluster summary.
  *
  * Usage: DedupMain [nDocs] [outDir] [numHashes] [jaccardThreshold]
  *   - nDocs      size of the deterministic synthetic corpus (default 1000)
  *   - outDir     stage-checkpoint root (default: none, in-memory)
  *   - numHashes  signature length (default 16)
  *   - jaccardThreshold  exact-verify threshold, 0 disables (default 0)
  */
object DedupMain {
  def main(args: Array[String]): Unit = {
    val nDocs = args.lift(0).map(_.toInt).getOrElse(1000)
    val outDir = args.lift(1).filter(_.nonEmpty)
    val numHashes = args.lift(2).map(_.toInt).getOrElse(16)
    val tau = args.lift(3).map(_.toDouble).getOrElse(0.0)

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-dedup")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_SHUFFLE_PARTITIONS",
          sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val pages = PagesGen.benchDF(spark, nDocs).toDF()
    val cfg = DedupConfig(
      params = MinHashParams(numHashes = numHashes),
      jaccardThreshold = tau,
      outputDir = outDir)

    val t0 = System.nanoTime()
    val clusters = DedupPipeline.run(spark, pages, cfg)
    val nDocsOut = clusters.count()
    val nClusters = clusters.select("cluster").distinct().count()
    val nDups = nDocsOut - nClusters
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"docs=$nDocsOut clusters=$nClusters dup_docs=$nDups " +
      f"seconds=$sec%.2f docs_per_sec=${nDocsOut / sec}%.0f")
    clusters.groupBy("cluster").count().orderBy(org.apache.spark.sql.functions
      .desc("count"), org.apache.spark.sql.functions.col("cluster"))
      .show(5, truncate = false)
    spark.stop()
  }
}
