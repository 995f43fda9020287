package graft.tools

import graft.pipeline.SnapshotCatalog

import graft.core.{MinHashParams, Shingler}
import graft.pipeline.DedupPipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: sub-step timings of the Jaccard-verify stage against a
  * staged pipeline dir (docs + pairs_raw snapshots must exist).
  * Usage: ProfVerify <stageDir>
  */
object ProfVerify {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val cat = new SnapshotCatalog(spark, dir)
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = cat.readLatest("docs").get
    val pairsIn = cat.readLatest("pairs_raw").get
    val k = MinHashParams().kmerLen

    val pairs = pairsIn.persist()
    t("pairs count")(pairs.count())
    val ids = pairs.select(col("a").as("id"))
      .union(pairs.select(col("b").as("id"))).distinct()
    t("ids distinct count")(ids.count())
    val setOf = udf((text: String) =>
      Shingler.packSet(Shingler.shingleSet(text, k)))
    val sets = docs.join(ids, "id")
      .select(col("id"), setOf(DedupPipeline.normalizeAZ(col("text"))).as("sh"))
      .persist()
    t("sets build+persist")(sets.count())
    val keep = udf((x: Array[Byte], y: Array[Byte]) => {
      val i = Shingler.intersectionSizePacked(x, y)
      i >= 0.5 * (Shingler.packedSize(x) + Shingler.packedSize(y) - i)
    })
    val out = pairs
      .join(sets.select(col("id").as("a"), col("sh").as("sha")), "a")
      .join(sets.select(col("id").as("b"), col("sh").as("shb")), "b")
      .where(keep(col("sha"), col("shb")))
      .select("a", "b")
    t("pair joins + filter + count")(out.count())
    t("write (join recompute + parquet)")(
      out.write.mode("overwrite").parquet(s"$dir/_prof_out"))
    // decompose: cached result -> pure parquet encode+write cost
    val cached = out.persist()
    t("join recompute -> cache")(cached.count())
    t("pure write from cache")(
      cached.write.mode("overwrite").parquet(s"$dir/_prof_out2"))
    cached.unpersist()
    sets.unpersist()
    pairs.unpersist()
    // a diagnostic must not leave stage-sized parquet in the corpus dir
    Fs.rmRf(new java.io.File(s"$dir/_prof_out"))
    Fs.rmRf(new java.io.File(s"$dir/_prof_out2"))
    spark.stop()
  }
}
