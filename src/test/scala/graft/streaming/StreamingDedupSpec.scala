package graft.streaming

import graft.SparkSpec
import graft.core.{MinHashParams, SerialOracle}
import graft.pipeline.{DedupPipeline, Pages, PagesGen}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingDedupSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("streaming exact dedup keeps one row per text within the watermark") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, String)]
    val pages = input.toDF().toDF("url", "warc_ts", "text")
    val q = StreamingDedup.exactDedup(pages)
      .select("url", "text")
      .writeStream.format("memory").queryName("exact_dedup_out")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    input.addData(
      ("u1", t0, "SAMETEXT"), ("u2", t0, "SAMETEXT"), ("u3", t0, "OTHER"))
    q.processAllAvailable()
    input.addData(("u4", t0, "SAMETEXT"), ("u5", t0, "THIRD"))
    q.processAllAvailable()
    val rows = spark.sql("SELECT text FROM exact_dedup_out")
      .collect().map(_.getString(0)).sorted
    q.stop()
    assert(rows.toSeq == Seq("OTHER", "SAMETEXT", "THIRD"))
  }

  test("streaming LSH pairs converge to the batch candidate set") {
    implicit val sc = spark.sqlContext
    val params = MinHashParams(numHashes = 8)
    val corpus = PagesGen.micro
    val input = MemoryStream[(String, java.sql.Timestamp, String)]
    val pages = input.toDF().toDF("url", "warc_ts", "text")
    val q = StreamingDedup.lshPairs(spark, pages, params, stateTtlMs = 0)
      .writeStream.format("memory").queryName("lsh_pairs_out")
      .outputMode("append").start()
    // feed in two arrival waves to exercise cross-batch state
    val (wave1, wave2) = corpus.splitAt(corpus.size / 2)
    input.addData(wave1.map(p => (p.url, p.warc_ts, p.text)))
    q.processAllAvailable()
    input.addData(wave2.map(p => (p.url, p.warc_ts, p.text)))
    q.processAllAvailable()
    val got = spark.sql("SELECT a, b FROM lsh_pairs_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()

    // oracle: batch pairs over the same corpus with xxhash64 ids
    val docs = DedupPipeline.extractDocs(Pages.toDS(spark, corpus).toDF())
      .select("url", "id").collect().map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val want = SerialOracle
      .run(corpus.map(p => docs(p.url) -> p.text), params).pairs
    assert(got == want)
  }
}
