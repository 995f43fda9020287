package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** METIS graph export — the Spark restatement of the reference's
  * `graph_formater` sink (SURVEY.md S7,
  * `/root/reference/src/graph_formater.cpp:3-44,75-117`): vertices are
  * renumbered 1..V (deterministically, by ascending original id — the
  * reference uses discovery order, any stable bijection is valid METIS),
  * a `_dictionary` file maps `#<num> <original id>` and the main file is
  * `V E` followed by one adjacency line per vertex (1-based neighbor
  * numbers, ascending; blank line for isolated vertices). With
  * `edgeFile = true` an `_edges` file of `u v` lines is also written (the
  * reference's `usc_louvain` mode).
  *
  * All heavy work (renumbering, adjacency grouping, sorting) is
  * distributed; only the final ordered byte stream is pulled through the
  * driver with `toLocalIterator` — a METIS file is consumed by a
  * single-node community-detection tool, so a single ordered file is the
  * contract itself (the reference also serializes on MPI rank 0,
  * `graph_formater.cpp:17,75`).
  */
object MetisExport {

  def write(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
      filename: String, edgeFile: Boolean = false): Unit = {
    import spark.implicits._
    val canonical = edges
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint(true)

    // stable 1..V renumbering by ascending id (zipWithIndex: one pass, no
    // single-partition window)
    val numbered = nodes.select(col("id").cast("long")).distinct()
      .orderBy("id").as[Long].rdd
      .zipWithIndex().map { case (id, i) => (id, i + 1) }
      .toDF("id", "num")
      .localCheckpoint(true)
    val numEdges = canonical.count()
    val numVertices = numbered.count()

    val directed = canonical.select(col("a").as("u"), col("b").as("v"))
      .union(canonical.select(col("b").as("u"), col("a").as("v")))
    val renumbered = directed
      .join(numbered.select(col("id").as("u"), col("num").as("un")), "u")
      .join(numbered.select(col("id").as("v"), col("num").as("vn")), "v")
      .select(col("un"), col("vn"))

    // one adjacency line per vertex, isolated vertices included (left join)
    val adjacency = numbered
      .join(renumbered.groupBy("un").agg(sort_array(collect_list("vn")).as("ns")),
        numbered("num") === col("un"), "left")
      .select(col("num"), col("id"),
        coalesce(col("ns"), array().cast("array<bigint>")).as("ns"))
      .orderBy("num")

    val out = new java.io.BufferedWriter(new java.io.FileWriter(filename))
    val dict = new java.io.BufferedWriter(
      new java.io.FileWriter(filename + "_dictionary"))
    val edgesOut =
      if (edgeFile) Some(new java.io.BufferedWriter(
        new java.io.FileWriter(filename + "_edges")))
      else None
    try {
      out.write(s"$numVertices $numEdges\n")
      val it = adjacency.select(col("num"), col("id"), col("ns"))
        .as[(Long, Long, Seq[Long])].toLocalIterator()
      while (it.hasNext) {
        val (num, id, ns) = it.next()
        dict.write(s"#$num $id\n")
        out.write(ns.mkString(" "))
        out.write("\n")
        edgesOut.foreach { e => ns.foreach(v => e.write(s"$num $v\n")) }
      }
    } finally {
      out.close(); dict.close(); edgesOut.foreach(_.close())
    }
  }
}
