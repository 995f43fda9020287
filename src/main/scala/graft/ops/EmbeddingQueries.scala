package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Native codegen'd integer dot product ([[graft.functions.LongDot]]) —
    * replaces the interpreted `aggregate(zip_with(...))` HOF pair in every
    * per-pair hot path here (q17/q19/q28 and the nrm column).
    */
  private def dotOf(a: Column, b: Column): Column =
    graft.functions.LongDot.of(a, b)

  /** (vec_id, q) — quantized embeddings, plus nrm = <q,q>. The source is a
    * single parquet file (1-2 input splits); the brute-force cross join is
    * embarrassingly parallel, so spread the probe side across all cores.
    */
  private def quantized(spark: SparkSession, dir: String): DataFrame =
    // split-gated spread (was a blind repartition — a full embedding-table
    // shuffle at 100 TB; the gate passes many-split scans through
    // unchanged, VERDICT r05 ask #3)
    Ops.spreadSmallScan(Ops.table(spark, dir, "embeddings"), "vec_id")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1000.0)).cast("long")).as("q"))
      .withColumn("nrm", dotOf(col("q"), col("q")))

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
    val dot = dotOf(col("qa"), col("qb"))
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
    val dot = dotOf(col("qa"), col("qb"))
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

  /** Embedding-cosine near-duplicate CLUSTERS: candidate pairs from the
    * sign-LSH buckets (the scale path — never all-pairs), kept when
    * cos(a, b) >= 0.9, resolved to components with min-vec_id labels.
    * The threshold compare is INTEGER-exact cross-engine:
    * cos >= t  <=>  dot >= 0 && 100*dot^2 >= (100 t^2) * na * nb
    * over the quantized vectors (t = 0.9 -> 81).
    */
  def embeddingDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = quantized(spark, dir)
    val withBucket = e.join(lshBuckets(spark, dir), "vec_id")
    val a = withBucket.select(col("bucket"), col("vec_id").as("a"),
      col("q").as("qa"), col("nrm").as("na"))
    val b = withBucket.select(col("bucket"), col("vec_id").as("b"),
      col("q").as("qb"), col("nrm").as("nb"))
    val dot = dotOf(col("qa"), col("qb"))
    val pairs = a.join(b, "bucket")
      .where(col("a") < col("b"))
      .withColumn("dot", dot)
      .where(col("dot") >= 0 &&
        col("dot") * col("dot") * 100 >= lit(81) * col("na") * col("nb"))
      .select("a", "b")
      .distinct()
    val nodes = Ops.table(spark, dir, "embeddings")
      .select(col("vec_id").as("id"))
    graft.pipeline.ConnectedComponents.run(spark, pairs, nodes,
        assumeCanonical = true, driverFinishMaxEdges = 1L << 23)
      .select(col("id").as("vec_id"), col("component").as("cluster_id"))
      .orderBy("vec_id")
  }

  val embeddingDedupSql: String = {
    val planeValues = (0 until Ops.LshPlanes).map { j =>
      val cs = Ops.hyperplane(j, Ops.EmbeddingDims).mkString("[", ", ", "]")
      s"($j, $cs::BIGINT[])"
    }.mkString(",\n ")
    s"""
WITH RECURSIVE planes(j, p) AS (VALUES
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
  SELECT DISTINCT ba.vec_id AS a, bb.vec_id AS b
  FROM buckets ba
  JOIN buckets bb ON ba.bucket = bb.bucket AND ba.vec_id < bb.vec_id
  JOIN q qa ON qa.vec_id = ba.vec_id
  JOIN q qb ON qb.vec_id = bb.vec_id
  JOIN n na ON na.vec_id = ba.vec_id
  JOIN n nbb ON nbb.vec_id = bb.vec_id
  WHERE list_dot_product(qa.qe, qb.qe) >= 0
    AND list_dot_product(qa.qe, qb.qe)::BIGINT * list_dot_product(qa.qe, qb.qe)::BIGINT * 100
        >= 81 * na.nb * nbb.nb
),
bi(u, v) AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
reach(node, lbl) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT bi.v, reach.lbl FROM reach JOIN bi ON bi.u = reach.node
)
SELECT node AS vec_id, min(lbl) AS cluster_id FROM reach GROUP BY node
ORDER BY vec_id"""
  }

  /** IVF-style ANN (the second scale path next to sign-LSH): a deterministic
    * coarse quantizer — centroids = the first `nCells` vectors by id,
    * refined by `iters` Lloyd steps over integer-quantized vectors — then
    * top-k search with multi-probe: each query probes its `nProbe` nearest
    * cells, candidates are vectors whose HOME cell is probed (candidate
    * fraction ~ nProbe/nCells, never all-pairs). No SQL oracle (iterative
    * float k-means is not reasonably DuckDB-exact); correctness = recall@k
    * vs brute force in the sbt spec, the standard ANN acceptance metric.
    */
  def ivf(spark: SparkSession, dir: String, nCells: Int = 16, iters: Int = 2,
      k: Int = 5, nProbe: Int = 4): DataFrame = {
    import spark.implicits._
    val e = quantized(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic init: the nCells lowest vec_ids (no RNG: reproducible)
    var centroids: Array[(Int, Array[Double])] = e.orderBy("vec_id")
      .limit(nCells).collect()
      .zipWithIndex
      .map { case (r, i) =>
        (i, r.getAs[scala.collection.Seq[Long]]("q").map(_.toDouble).toArray)
      }
    def assignCell(q: scala.collection.Seq[Long],
        cs: Array[(Int, Array[Double])]): Int = {
      var best = -1; var bestD = Double.MaxValue
      cs.foreach { case (i, c) =>
        var d = 0.0; var j = 0
        val n = math.min(c.length, q.length)
        while (j < n) { val t = q(j) - c(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = i }
      }
      best
    }
    var it = 0
    while (it < iters) {
      val cs = centroids
      val cellOf = udf((q: scala.collection.Seq[Long]) => assignCell(q, cs))
      // Lloyd step: mean per cell, distributed
      val assigned = e.withColumn("cell", cellOf(col("q")))
      centroids = assigned
        .select(col("cell"), col("q"))
        .as[(Int, Array[Long])]
        .groupByKey(_._1)
        .mapGroups { (cell, rows) =>
          val sum = new Array[Double](Ops.EmbeddingDims)
          var n = 0L
          rows.foreach { case (_, q) =>
            var j = 0
            val m = math.min(sum.length, q.length)
            while (j < m) { sum(j) += q(j); j += 1 }
            n += 1
          }
          (cell, sum.map(_ / n))
        }
        .collect()
      it += 1
    }
    val cs = centroids
    val np = math.min(nProbe, cs.length)
    def nearestCells(q: scala.collection.Seq[Long]): Array[Int] =
      cs.map { case (i, c) =>
        var d = 0.0; var j = 0
        val n = math.min(c.length, q.length)
        while (j < n) { val t = q(j) - c(j); d += t * t; j += 1 }
        (d, i)
      }.sortBy(_._1).take(np).map(_._2)
    val cellOf = udf((q: scala.collection.Seq[Long]) => assignCell(q, cs))
    val probeOf = udf((q: scala.collection.Seq[Long]) => nearestCells(q))
    // query side probes its nProbe nearest cells; candidate side sits in
    // its single home cell — the join fans each query out nProbe ways
    val a = e.select(explode(probeOf(col("q"))).as("cell"),
      col("vec_id").as("a_id"), col("q").as("qa"))
    val b = e.withColumn("cell", cellOf(col("q")))
      .select(col("cell"), col("vec_id").as("b_id"),
        col("q").as("qb"), col("nrm").as("nb"))
    val dot = dotOf(col("qa"), col("qb"))
    val pairs = a.join(b, "cell")
      .where(col("a_id") =!= col("b_id"))
      .withColumn("dot", dot)
      .withColumn("cosv", when(col("nb") === 0, lit(-2.0))
        .otherwise(col("dot").cast("double") / sqrt(col("nb").cast("double"))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("a_id").orderBy(desc("cosv"), col("b_id"))
    val out = pairs.withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col("a_id").as("vec_id"), col("rnk"), col("b_id").as("neighbor_id"))
      .orderBy("vec_id", "rnk")
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** q30 — the IVF coarse quantizer under the driver gate, restated in
    * INTEGER-exact arithmetic so DuckDB replicates it value-for-value
    * (the float variant [[ivf]] keeps its recall@k sbt acceptance):
    * centroids start as the `nCells` lowest-vec_id quantized vectors, one
    * Lloyd step updates them to the per-cell element-wise floor(mean)
    * (double division of exact integers — IEEE-identical cross-engine),
    * and the output is each vector's nearest updated centroid.
    * Distances use the integer expansion |a|² + |c|² − 2⟨a,c⟩; ties break
    * to the smaller cell id. Output (vec_id, cell).
    */
  def ivfAssign(spark: SparkSession, dir: String, nCells: Int = 8): DataFrame = {
    import spark.implicits._
    val e = quantized(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bounded driver collect: nCells rows (same fence as [[ivf]])
    val c0: Array[Array[Long]] = e.orderBy("vec_id").limit(nCells)
      .select("q").as[Array[Long]].collect()
    def assignUdf(cs: Array[Array[Long]]) = udf((q: Seq[Long]) => {
      var best = 0
      var bestD = Long.MaxValue
      var i = 0
      while (i < cs.length) {
        val c = cs(i)
        var d = 0L
        var j = 0
        val n = math.min(c.length, q.length)
        while (j < n) { val t = q(j) - c(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; best = i } // strict < : min cell id wins
        i += 1
      }
      best
    })
    // one Lloyd step, distributed: per-cell element-wise floor(sum / n)
    val moved = e.withColumn("cell", assignUdf(c0)(col("q")))
      .select(col("cell"), col("q")).as[(Int, Array[Long])]
      .groupByKey(_._1)
      .mapGroups { (cell, rows) =>
        val sum = new Array[Long](Ops.EmbeddingDims)
        var n = 0L
        rows.foreach { case (_, q) =>
          var j = 0
          val m = math.min(sum.length, q.length)
          while (j < m) { sum(j) += q(j); j += 1 }
          n += 1
        }
        (cell, sum.map(s => math.floor(s.toDouble / n).toLong))
      }
      .collect()
    val c1 = c0.clone() // a cell that lost every member keeps its centroid
    moved.foreach { case (cell, c) => c1(cell) = c }
    val out = e.withColumn("cell", assignUdf(c1)(col("q")).cast("long"))
      .select(col("vec_id"), col("cell"))
      .orderBy("vec_id")
      .localCheckpoint(true)
    e.unpersist()
    out
  }

  /** The same two assignments + integer-floor Lloyd step in pure SQL. */
  val ivfAssignSql: String = s"""
WITH q AS (
  SELECT vec_id, list_transform(embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS qe
  FROM embeddings
),
c0 AS (
  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::INT AS cell, qe AS c
  FROM (SELECT vec_id, qe FROM q ORDER BY vec_id LIMIT 8)
),
d0 AS (
  SELECT q.vec_id, c0.cell,
    list_dot_product(q.qe, q.qe)::BIGINT + list_dot_product(c0.c, c0.c)::BIGINT
      - 2 * list_dot_product(q.qe, c0.c)::BIGINT AS d
  FROM q CROSS JOIN c0
),
a0 AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
      row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
    FROM d0) WHERE rn = 1
),
dims AS (SELECT unnest(range(1, ${Ops.EmbeddingDims + 1})) AS j),
comp AS (
  SELECT a0.cell, dims.j, q.qe[dims.j::INT] AS v
  FROM a0 JOIN q USING (vec_id) CROSS JOIN dims
),
cm AS (
  SELECT cell, j, floor(sum(v)::BIGINT / count(*))::BIGINT AS cv
  FROM comp GROUP BY cell, j
),
c1l AS (SELECT cell, list(cv ORDER BY j) AS c FROM cm GROUP BY cell),
c1 AS (
  SELECT c0.cell, coalesce(c1l.c, c0.c) AS c
  FROM c0 LEFT JOIN c1l USING (cell)
),
d1 AS (
  SELECT q.vec_id, c1.cell,
    list_dot_product(q.qe, q.qe)::BIGINT + list_dot_product(c1.c, c1.c)::BIGINT
      - 2 * list_dot_product(q.qe, c1.c)::BIGINT AS d
  FROM q CROSS JOIN c1
)
SELECT vec_id, cell::BIGINT AS cell FROM (
  SELECT vec_id, cell,
    row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) AS rn
  FROM d1) WHERE rn = 1
ORDER BY vec_id"""

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

  /** Product-quantization codes — the compressed-vector scale path next to
    * IVF: the 64-dim quantized vector splits into `m` contiguous
    * subspaces, each assigned to its nearest codeword by integer-exact
    * squared L2 (strict <, min code wins, same tie discipline as
    * [[ivfAssign]]). Codebook per subspace = the subvectors of the first
    * `k` vectors (deterministic; a Lloyd refinement would slot in exactly
    * like ivfAssign's). At 10^12 vectors the codes table is the object
    * ANN search actually scans — m bytes per vector instead of 4*dims —
    * and this map pass is embarrassingly parallel with an m*k*dims-size
    * broadcast codebook.
    *
    * @return (vec_id, sub, code) — long format, one row per subspace
    */
  def pqCodes(spark: SparkSession, dir: String, m: Int = PqM, k: Int = PqK)
      : DataFrame = {
    val (e, seeds) = pqSetup(spark, dir, m, k)
    pqCodesOf(spark, e, seeds, m).orderBy("vec_id", "sub")
  }

  /** One driver collect shared by [[pqCodes]] and [[pqAdcTopK]]: the
    * quantized frame plus the k codebook seed vectors (the ivfAssign
    * bounded-collect fence).
    */
  private def pqSetup(spark: SparkSession, dir: String, m: Int, k: Int)
      : (DataFrame, Array[Array[Long]]) = {
    import spark.implicits._
    require(Ops.EmbeddingDims % m == 0, s"$m must divide ${Ops.EmbeddingDims}")
    val e = quantized(spark, dir)
    (e, e.orderBy("vec_id").limit(k).select("q").as[Array[Long]].collect())
  }

  /** Integer squared L2 between subspace `mi` of `q` and codeword `w`
    * (length `sub`); entries missing from a short vector count as 0, the
    * same zero-pad semantics Arrays.copyOfRange gives the seed side.
    */
  private def subSqDist(q: IndexedSeq[Long], mi: Int, w: Array[Long]): Long = {
    var d = 0L
    var j = 0
    while (j < w.length) {
      val idx = mi * w.length + j
      val t = (if (idx < q.length) q(idx) else 0L) - w(j)
      d += t * t
      j += 1
    }
    d
  }

  /** (vec_id, sub, code) codes against a codebook seeded from `seeds`. */
  private def pqCodesOf(spark: SparkSession, e: DataFrame,
      seeds: Array[Array[Long]], m: Int): DataFrame = {
    val sub = Ops.EmbeddingDims / m
    // codebook(mIdx)(code) = codeword subvector
    val book: Array[Array[Array[Long]]] = Array.tabulate(m)(mi =>
      seeds.map(v => java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub)))
    val bc = spark.sparkContext.broadcast(book)
    val codesUdf = udf((q: Seq[Long]) => {
      val b = bc.value
      val qi = q.toIndexedSeq
      val out = new Array[Int](b.length)
      var mi = 0
      while (mi < b.length) {
        val words = b(mi)
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < words.length) {
          val d = subSqDist(qi, mi, words(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(mi) = best
        mi += 1
      }
      out
    })
    e.select(col("vec_id"), posexplode(codesUdf(col("q"))).as(Seq("sub", "code")))
      .select(col("vec_id"), col("sub").cast("long").as("sub"),
        col("code").cast("long").as("code"))
  }

  /** Shared PQ CTE chain: quantize, seed the codebook, per-(vector,
    * subspace, codeword) distances via |q_m|^2 + |c_m|^2 - 2<q_m, c_m>
    * over list_slice subvectors, argmin codes (min (dist, code) wins).
    */
  // one definition site for the oracle's m/k/subwidth so the SQL cannot
  // drift from the Scala side's derived sub = EmbeddingDims / m
  private val PqM = 4
  private val PqK = 4
  private val PqSub = Ops.EmbeddingDims / PqM
  private val PqTopK = 5
  private val PqQueryVec = 0L
  private def sl(v: String): String =
    s"list_slice($v, subs.sub::INT * $PqSub + 1, (subs.sub::INT + 1) * $PqSub)"

  val pqCtes: String = s"""
q AS (
  SELECT vec_id, list_transform(embedding, x -> floor(x::DOUBLE * 1000)::BIGINT) AS qe
  FROM embeddings
),
seeds AS (
  SELECT (row_number() OVER (ORDER BY vec_id) - 1)::BIGINT AS code, qe AS c
  FROM (SELECT vec_id, qe FROM q ORDER BY vec_id LIMIT $PqK)
),
subs AS (SELECT unnest(range(0, $PqM))::BIGINT AS sub),
d AS (
  SELECT q.vec_id, subs.sub, seeds.code,
    list_dot_product(${sl("q.qe")}, ${sl("q.qe")})::BIGINT
    + list_dot_product(${sl("seeds.c")}, ${sl("seeds.c")})::BIGINT
    - 2 * list_dot_product(${sl("q.qe")}, ${sl("seeds.c")})::BIGINT AS dist
  FROM q CROSS JOIN subs CROSS JOIN seeds
),
codes AS (
  SELECT vec_id, sub, code FROM (
    SELECT vec_id, sub, code,
      row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
    FROM d) WHERE rn = 1
)"""

  val pqCodesSql: String =
    s"WITH $pqCtes SELECT vec_id, sub, code FROM codes ORDER BY vec_id, sub"

  /** ADC top-k: approximate nearest neighbors of a query vector scanned
    * entirely over the PQ codes — the lookup-table trick (Jegou et al.,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011): the
    * per-(subspace, codeword) distance table to the query is m*k integers
    * computed ONCE and broadcast, so the scan never touches a float
    * vector — a codes-table map + tiny-dim join + TakeOrdered top-k, the
    * shape that survives 10^12 vectors.
    *
    * @return the `topK` (vec_id, adc) rows nearest to `queryVecId` by
    *         summed subspace distances (excluding the query itself),
    *         deterministic (adc, vec_id) order
    */
  def pqAdcTopK(spark: SparkSession, dir: String, m: Int = PqM, k: Int = PqK,
      topK: Int = PqTopK, queryVecId: Long = PqQueryVec): DataFrame = {
    import spark.implicits._
    val (e, seeds) = pqSetup(spark, dir, m, k) // ONE seed collect, shared
    val sub = Ops.EmbeddingDims / m
    val query: IndexedSeq[Long] = e.where(col("vec_id") === queryVecId)
      .select("q").as[Array[Long]].head().toIndexedSeq
    // the ADC lookup table: m*k integers, computed on the driver with the
    // same subspace kernel that assigns codes
    val lut = (0 until m).flatMap { mi =>
      seeds.zipWithIndex.map { case (v, code) =>
        (mi.toLong, code.toLong, subSqDist(query, mi,
          java.util.Arrays.copyOfRange(v, mi * sub, (mi + 1) * sub)))
      }
    }.toDF("sub", "code", "d")
    pqCodesOf(spark, e, seeds, m) // no oracle-ordering sort in this path
      .where(col("vec_id") =!= queryVecId)
      .join(broadcast(lut), Seq("sub", "code"))
      .groupBy("vec_id").agg(sum(col("d")).as("adc"))
      .orderBy(col("adc"), col("vec_id"))
      .limit(topK)
  }

  val pqAdcTopKSql: String = s"""
WITH $pqCtes,
query AS (SELECT qe FROM q WHERE vec_id = $PqQueryVec),
lut AS (
  SELECT subs.sub, seeds.code,
    list_dot_product(${sl("query.qe")}, ${sl("query.qe")})::BIGINT
    + list_dot_product(${sl("seeds.c")}, ${sl("seeds.c")})::BIGINT
    - 2 * list_dot_product(${sl("query.qe")}, ${sl("seeds.c")})::BIGINT AS d
  FROM subs CROSS JOIN seeds CROSS JOIN query
)
SELECT c.vec_id, sum(l.d)::BIGINT AS adc
FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
WHERE c.vec_id <> $PqQueryVec
GROUP BY c.vec_id
ORDER BY adc, vec_id LIMIT $PqTopK"""
}
