package graft.tools

import graft.core.Shingler
import graft.ops.{MinHashDocQueries => M, Ops, TextQueries => T}
import graft.pipeline.DedupPipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch sub-stage profiler for the gate queries (r06 optimization round):
  * times each building block of the currently-slow queries with the noop
  * sink so the bottleneck stage is measured, not guessed (guide §1).
  */
object ProfQ {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      f
      println(f"[profq] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // ---- q05 anatomy
    val bandRows = DedupPipeline.signatures(spark,
      M.normalizedDocs(spark, dir)
        .select(col("doc_id").as("id"), col("t").as("text")), M.params)
    t("q05 bandRows")(noop(bandRows))
    val pairs = DedupPipeline.candidatePairs(spark, bandRows, Int.MaxValue)._1
    t("q05 candidatePairs")(noop(pairs))
    println("[profq] q05 pair count = " + pairs.count())
    val k = Ops.KmerLen
    val setOf = udf((t: String) => Shingler.shingleSet(t, k))
    val sets = M.normalizedDocs(spark, dir)
      .select(col("doc_id"), setOf(col("t")).as("sh"))
    t("q05 sets (scan parallelism)")(noop(sets))
    val setsRep = M.normalizedDocs(spark, dir)
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), setOf(col("t")).as("sh"))
    t("q05 sets (repartitioned)")(noop(setsRep))
    t("q05 full")(noop(M.jaccard(spark, dir)))

    // ---- q29 anatomy
    val docs = Ops.table(spark, dir, "documents")
    def winMap(d: org.apache.spark.sql.DataFrame) = d
      .select(col("doc_id"),
        explode(array_distinct(filter(transform(
          sequence(lit(1), greatest(length(col("text")) - 29, lit(0))),
          i => substring(col("text"), i, lit(30))),
          w => length(w) === 30))).as("w"))
      .select(col("doc_id"), xxhash64(col("w")).as("h"), col("w"))
    t("q29 windows map (scan parallelism)")(noop(winMap(docs)))
    t("q29 windows map (repartitioned)")(noop(winMap(
      docs.repartition(spark.sparkContext.defaultParallelism, col("doc_id")))))
    println("[profq] q29 window rows = " + winMap(docs).count())
    val w = winMap(docs)
    val j = w.as("x").join(w.as("y"),
        col("x.h") === col("y.h") && col("x.doc_id") < col("y.doc_id")
          && col("x.w") <= col("y.w") && col("x.w") >= col("y.w"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
    t("q29 join+agg (no final sort)")(noop(j))
    t("q29 full")(noop(T.substringDupsHashed(spark, dir)))

    // ---- q23 anatomy
    t("q23 full")(noop(M.labelPropClusters(spark, dir)))

    // ---- q31 anatomy
    t("q31 full")(noop(T.substringLcs(spark, dir)))
    spark.stop()
  }
}
