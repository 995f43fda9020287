package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`Array[Float]` column).
  *
  * Embeddings are quantized to `floor(x * 1000)` int64 per dimension before
  * any arithmetic so dot products are integer-exact and the cross-engine
  * oracle compare is float-free in every value column; ordering uses
  * `dot / sqrt(norm)` — a composition of IEEE-deterministic ops, identical
  * in both engines bit-for-bit.
  *
  * Brute-force cosine top-k is the baseline; the sign-LSH bucketed variant
  * is the scale path (bucket first, search within buckets).
  */
object EmbeddingQueries {

  /** (vec_id, q) — quantized embeddings, plus nrm = <q,q>. The source is a
    * single parquet file (1-2 input splits); the brute-force cross join is
    * embarrassingly parallel, so spread the probe side across all cores.
    */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    Ops.table(spark, dir, "embeddings")
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1000.0)).cast("long")).as("q"))
      .withColumn("nrm",
        aggregate(transform(col("q"), x => x * x), lit(0L), (acc, x) => acc + x))

  /** Brute-force cosine top-5: (vec_id, rnk, neighbor_id).
    *
    * This is the DECLARED n^2 oracle baseline, fenced off from any scale
    * path ([[annBucketed]] is the real operator): the cross join refuses to
    * launch above `maxRows` vectors so a config typo can never start a
    * 10^12-row cartesian job.
    */
  def knn(spark: SparkSession, dir: String, k: Int = 5,
      maxRows: Long = 1000000L): DataFrame = {
    val e = quantized(spark, dir)
    val n = e.count()
    require(n <= maxRows,
      s"brute-force knn is the small-scale oracle baseline: $n vectors > " +
      s"maxRows=$maxRows; use annBucketed for the bucketed scale path")
    val a = e.select(col("vec_id").as("a_id"), col("q").as("qa"))
    val b = e.select(col("vec_id").as("b_id"), col("q").as("qb"),
      col("nrm").as("nb"))
    val dot = aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val pairs = a.crossJoin(b)
      .where(col("a_id") =!= col("b_id"))
      .withColumn("dot", dot)
      .withColumn("cosv", when(col("nb") === 0, lit(-2.0))
        .otherwise(col("dot").cast("double") / sqrt(col("nb").cast("double"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(desc("cosv"), col("b_id"))
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("a_id").as("vec_id"), col("rnk"), col("b_id").as("neighbor_id"))
      .orderBy("vec_id", "rnk")
  }

  val knnSql: String = """
WITH q AS (
  SELECT vec_id, list_transform(embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS qe
  FROM embeddings
),
n AS (SELECT vec_id, list_dot_product(qe, qe)::BIGINT AS nb FROM q),
pairs AS (
  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
    list_dot_product(a.qe, b.qe)::BIGINT AS dot, n.nb
  FROM q a JOIN q b ON a.vec_id <> b.vec_id JOIN n ON n.vec_id = b.vec_id
),
ranked AS (
  SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id ORDER BY
    (CASE WHEN nb = 0 THEN -2.0 ELSE dot / sqrt(nb) END) DESC, b_id) AS rn
  FROM pairs
)
SELECT a_id AS vec_id, rn::BIGINT AS rnk, b_id AS neighbor_id
FROM ranked WHERE rn <= 5 ORDER BY vec_id, rnk"""

  /** Sign-LSH bucketing: bucket = 16 hyperplane sign bits over the
    * quantized embedding (integer dot, `>= 0` = bit set). The scale path:
    * candidate search joins within buckets instead of the full cross join.
    */
  def lshBuckets(spark: SparkSession, dir: String): DataFrame = {
    val planes: Array[Array[Int]] =
      (0 until Ops.LshPlanes).map(j =>
        Ops.hyperplane(j, Ops.EmbeddingDims).toArray).toArray
    val bucketOf = udf((q: Seq[Long]) => {
      var bucket = 0L
      var j = 0
      while (j < planes.length) {
        val p = planes(j)
        var d = 0
        var dot = 0L
        val n = math.min(p.length, q.length)
        while (d < n) { dot += q(d) * p(d); d += 1 }
        if (dot >= 0) bucket |= (1L << j)
        j += 1
      }
      bucket
    })
    quantized(spark, dir)
      .select(col("vec_id"), bucketOf(col("q")).as("bucket"))
      .orderBy("vec_id")
  }

  val lshBucketsSql: String = {
    val planeValues = (0 until Ops.LshPlanes).map { j =>
      val cs = Ops.hyperplane(j, Ops.EmbeddingDims).mkString("[", ", ", "]")
      s"($j, $cs::BIGINT[])"
    }.mkString(",\n ")
    s"""
WITH planes(j, p) AS (VALUES
 $planeValues),
q AS (
  SELECT vec_id, list_transform(embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS qe
  FROM embeddings
)
SELECT vec_id,
  sum(CASE WHEN list_dot_product(qe, p) >= 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
    AS bucket
FROM q CROSS JOIN planes
GROUP BY vec_id ORDER BY vec_id"""
  }

  /** Bucketed ANN: top-k within each vector's LSH bucket — the 10^12-scale
    * formulation (bucket equi-join replaces the cross join). Rows only
    * exist for vectors sharing a bucket with at least one other vector.
    */
  def annBucketed(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = quantized(spark, dir)
    val withBucket = e.join(lshBuckets(spark, dir), "vec_id")
    val a = withBucket.select(col("bucket"), col("vec_id").as("a_id"),
      col("q").as("qa"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("b_id"),
      col("q").as("qb"), col("nrm").as("nb"))
    val dot = aggregate(zip_with(col("qa"), col("qb"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x)
    val pairs = a.join(b, "bucket")
      .where(col("a_id") =!= col("b_id"))
      .withColumn("dot", dot)
      .withColumn("cosv", when(col("nb") === 0, lit(-2.0))
        .otherwise(col("dot").cast("double") / sqrt(col("nb").cast("double"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(desc("cosv"), col("b_id"))
    pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("a_id").as("vec_id"), col("rnk"), col("b_id").as("neighbor_id"))
      .orderBy("vec_id", "rnk")
  }

  val annBucketedSql: String = {
    val planeValues = (0 until Ops.LshPlanes).map { j =>
      val cs = Ops.hyperplane(j, Ops.EmbeddingDims).mkString("[", ", ", "]")
      s"($j, $cs::BIGINT[])"
    }.mkString(",\n ")
    s"""
WITH planes(j, p) AS (VALUES
 $planeValues),
q AS (
  SELECT vec_id, list_transform(embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS qe
  FROM embeddings
),
n AS (SELECT vec_id, list_dot_product(qe, qe)::BIGINT AS nb FROM q),
buckets AS (
  SELECT vec_id,
    sum(CASE WHEN list_dot_product(qe, p) >= 0 THEN (1::BIGINT << j) ELSE 0 END)::BIGINT
      AS bucket
  FROM q CROSS JOIN planes GROUP BY vec_id
),
pairs AS (
  SELECT ba.vec_id AS a_id, bb.vec_id AS b_id,
    list_dot_product(qa.qe, qb.qe)::BIGINT AS dot, n.nb
  FROM buckets ba
  JOIN buckets bb ON ba.bucket = bb.bucket AND ba.vec_id <> bb.vec_id
  JOIN q qa ON qa.vec_id = ba.vec_id
  JOIN q qb ON qb.vec_id = bb.vec_id
  JOIN n ON n.vec_id = bb.vec_id
),
ranked AS (
  SELECT a_id, b_id, row_number() OVER (PARTITION BY a_id ORDER BY
    (CASE WHEN nb = 0 THEN -2.0 ELSE dot / sqrt(nb) END) DESC, b_id) AS rn
  FROM pairs
)
SELECT a_id AS vec_id, rn::BIGINT AS rnk, b_id AS neighbor_id
FROM ranked WHERE rn <= 5 ORDER BY vec_id, rnk"""
  }
}
