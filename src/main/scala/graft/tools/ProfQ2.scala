package graft.tools
import graft.core.Shingler
import graft.ops.{MinHashDocQueries => M, Ops}
import graft.pipeline.DedupPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfQ2 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t(name: String)(f: => Unit): Unit = {
      f
      val t0 = System.nanoTime(); f
      println(f"[profq2] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val k = Ops.KmerLen
    import graft.functions.PackedSetOps
    val bandRows = DedupPipeline.signatures(spark,
      M.normalizedDocs(spark, dir).select(col("doc_id").as("id"), col("t").as("text")), M.params)
    val pairs = DedupPipeline.candidatePairs(spark, bandRows, Int.MaxValue)._1
      .select(col("a").as("id_a"), col("b").as("id_b"))
    val setOf = udf((t: String) => Shingler.packSet(Shingler.shingleSet(t, k)))
    val sets = M.normalizedDocs(spark, dir).select(col("doc_id"), setOf(col("t")).as("sh"))
    val joined = pairs
      .join(sets.select(col("doc_id").as("id_a"), col("sh").as("sha")), "id_a")
      .join(sets.select(col("doc_id").as("id_b"), col("sh").as("shb")), "id_b")
      .select(col("id_a"), col("id_b"),
        PackedSetOps.intersectionSize(col("sha"), col("shb")).as("inter_size"),
        (PackedSetOps.setSize(col("sha"))
          + PackedSetOps.setSize(col("shb"))).as("apb"))
      .select(col("id_a"), col("id_b"), col("inter_size"),
        (col("apb") - col("inter_size")).as("union_size"))
    t("q05 joins only (no sort)")(noop(joined))
    t("q05 joins + orderBy")(noop(joined.orderBy("id_a", "id_b")))
    t("q05 pairs only")(noop(pairs))
    spark.stop()
  }
}
