package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for isolating plan/runtime behavior (kept out of the
  * library surface; used during bench tuning).
  */
object DebugJoin {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val aqe = sys.env.getOrElse("AQE", "true")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SHUF_PARTS", cpus))
      .config("spark.sql.adaptive.enabled", aqe)
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("PREFER_SMJ", "true"))
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIR", "/tmp"))
      .config("spark.storage.memoryMapThreshold",
        sys.env.getOrElse("MMAP_THRESHOLD", "2m"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sig = spark.read.parquet("/tmp/pp32/signatures")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    time("scan")(sig.count())
    val (pairs, _) = graft.pipeline.DedupPipeline.candidatePairs(spark, sig,
      Int.MaxValue)
    val g0 = gcMs
    val df = pairs.cache()
    time("join+distinct")(df.count())
    println(s"gc during join: ${gcMs - g0} ms")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Join") || l.contains("Exchange")
        || l.contains("Aggregate") || l.contains("AQE")).mkString("\n"))
    spark.stop()
  }
}
