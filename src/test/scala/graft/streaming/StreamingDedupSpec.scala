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

  test("watermarked windowed aggregation matches the batch hourly rollup") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    val q = StreamingDedup.hourlyEvents(events)
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val wave1 = Seq(
      (1L, ts("2020-01-01 10:05:00"), 1.234),
      (1L, ts("2020-01-01 10:50:00"), 2.5),
      (2L, ts("2020-01-01 10:10:00"), 0.999),
      (1L, ts("2020-01-01 11:05:00"), 10.0))
    input.addData(wave1)
    q.processAllAvailable()
    // advance event time far enough that the 10:00 and 11:00 windows pass
    // the 2h watermark and finalize (append mode emits only closed windows)
    input.addData(Seq((9L, ts("2020-01-01 15:00:00"), 0.0)))
    q.processAllAvailable()
    input.addData(Seq((9L, ts("2020-01-01 23:00:00"), 0.0)))
    q.processAllAvailable()
    val got = spark.sql(
      "SELECT user_id, hour_us, n_events, sum_cents FROM hourly_out")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    q.stop()

    // batch oracle: the same rollup as TextQueries.hourlyEvents
    val want = wave1.toDF("user_id", "ts", "value")
      .groupBy(col("user_id"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100)).cast("long").as("sum_cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(want.subsetOf(got), s"missing windows: ${want.diff(got)}")
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
