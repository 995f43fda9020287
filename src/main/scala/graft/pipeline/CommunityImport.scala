package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The community-detection RETURN bridge — the reference's default
  * pipeline exports a METIS graph, runs an external single-node community
  * tool (Grappolo / usc_louvain, `bin/cluster_script.sh:40-56`), and reads
  * the community assignments BACK
  * (`/root/reference/src/graph_formater.cpp:118-158`
  * `read_node_dictionary` + `read_communities`, consumed at `:139-175`):
  * the community file carries one integer community id per line, where
  * line N (1-based) is the assignment of vertex #N of the `_dictionary`
  * written next to the METIS file by [[MetisExport]] (`#<num> <id>`
  * lines).
  *
  * This reader closes that loop for Spark: both files parse into
  * DataFrames, join on the vertex number, and yield `(member, label)` —
  * directly consumable by [[Evaluator.fscore]] / [[Evaluator.nmi]] or as a
  * cluster-assignment side anywhere the pipeline takes one. Community
  * files are the OUTPUT of a single-node tool (MBs even for huge graphs —
  * one small int per vertex), so a driver-side line parse would also be
  * defensible; reading through the DataFrame text source keeps the join
  * and any downstream evaluation distributed, and `zipWithIndex` over the
  * text RDD reproduces file line order (Hadoop splits enumerate in offset
  * order) for the line-number = vertex-number contract.
  */
object CommunityImport {

  /** @param communityFile one community id per line, line N = vertex #N
    * @param dictionaryFile the `_dictionary` file of [[MetisExport]]
    * @return (member: long — original vertex id, label: long — community)
    */
  def read(spark: SparkSession, communityFile: String,
      dictionaryFile: String): DataFrame = {
    import spark.implicits._
    val dictLine = """#(\d+)\s+(-?\d+)""".r
    val dict = spark.read.textFile(dictionaryFile).rdd
      .map(_.trim).filter(_.nonEmpty)
      .map {
        case dictLine(num, id) => (num.toLong, id.toLong)
        case bad => sys.error(s"malformed dictionary line: '$bad'")
      }
      .toDF("num", "member")
    val comms = spark.read.textFile(communityFile).rdd
      .zipWithIndex()
      .map { case (l, i) =>
        // the reference's sscanf("%d") semantics: leading int of the line
        val t = l.trim.split("\\s+")(0)
        require(t.matches("-?\\d+"),
          s"malformed community line ${i + 1}: '$l'")
        (i + 1, t.toLong)
      }
      .toDF("num", "label")
    // inner join — a vertex present on only one side is silently absent
    // from the result; use [[readChecked]] for the fail-loud contract
    dict.join(comms, "num").select(col("member"), col("label"))
  }

  /** [[read]] plus the line-count contract check — community lines ==
    * dictionary vertices == joined rows, checked in BOTH directions
    * (a community file SHORTER than the dictionary is a truncated tool
    * write; LONGER means a stale dictionary, and the inner join would
    * silently drop the extra assignments) — use when the files come from
    * an external tool run.
    */
  def readChecked(spark: SparkSession, communityFile: String,
      dictionaryFile: String): DataFrame = {
    val out = read(spark, communityFile, dictionaryFile)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = out.count()
    def nonEmptyLines(path: String): Long =
      spark.read.textFile(path)
        .filter(length(trim(col("value"))) > 0).count()
    val dictN = nonEmptyLines(dictionaryFile)
    val commN = nonEmptyLines(communityFile)
    require(commN == dictN && n == dictN,
      s"community/dictionary mismatch: $commN community lines, $dictN " +
        s"dictionary vertices, $n joined (truncated community file or " +
        "stale dictionary?)")
    out
  }
}
