package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.inspector.{Inspector, SyntheticTraffic}
import KafkaSink._

class KafkaSinkSpec extends SparkSpec {

  test("spec parsing: /T, /T1/T2, /T/, //T, extra pairs, invalid") {
    assert(parseSpec("b:9092/T") === KafkaSpec("b:9092", "T", "T", Map.empty))
    assert(parseSpec("b:9092/T1/T2") === KafkaSpec("b:9092", "T1", "T2", Map.empty))
    assert(parseSpec("b:9092/T/") === KafkaSpec("b:9092", "T", "", Map.empty))
    assert(parseSpec("b:9092//T") === KafkaSpec("b:9092", "", "T", Map.empty))
    assert(parseSpec("h1:9092,h2:9092/T?env=prod&dc=kr") ===
      KafkaSpec("h1:9092,h2:9092", "T", "T", Map("env" -> "prod", "dc" -> "kr")))
    assertThrows[IllegalArgumentException](parseSpec("b:9092//"))
    assertThrows[IllegalArgumentException](parseSpec("no-topics"))
  }

  private lazy val recs =
    Inspector.records(spark, SyntheticTraffic.ensurePcapDir()).toDF().cache()

  test("topic routing: requests to topic1, responses to topic2, empty skipped") {
    val both = jsonRecords(recs, parseSpec("b/req/res"), "h")
    val byTopic = both.groupBy(col("topic")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTopic("req").toInt === SyntheticTraffic.ExpectedRequests)
    assert(byTopic("res").toInt === SyntheticTraffic.ExpectedResponses)

    val reqOnly = jsonRecords(recs, parseSpec("b/req/"), "h")
    assert(reqOnly.select("topic").distinct().collect().map(_.getString(0)).toSeq === Seq("req"))

    val resOnly = jsonRecords(recs, parseSpec("b//res"), "h")
    assert(resOnly.count().toInt === SyntheticTraffic.ExpectedResponses)
  }

  test("record JSON: epoch-ms ts, hostname, extra pairs, full record fields") {
    val df = jsonRecords(recs, parseSpec("b/req/res?dc=test"), "myhost")
    val getReq = df.filter(col("value").contains("\"method\":\"get\"") &&
      col("value").contains("\"row\":\"row1\"")).collect()(0).getString(1)
    val parsed = spark.read.json(
      spark.createDataset(Seq(getReq))(org.apache.spark.sql.Encoders.STRING))
    val row = parsed.collect()(0)
    assert(row.getAs[String]("hostname") === "myhost")
    assert(row.getAs[String]("dc") === "test")
    assert(row.getAs[Long]("ts") === 1600000000000L) // epoch millis, not a date
    assert(row.getAs[String]("client") === "10.0.0.1")
    assert(row.getAs[Long]("call_id") === 1L)
  }

  test("q14 driver entry: one JSON record per event, both topics, fields intact") {
    val df = KafkaSink.queries("q14_json_records")(spark, "/root/testdata/sf0.001")
    assert(df.columns.toSeq === Seq("topic", "value"))
    assert(df.count() === 1000L)
    assert(df.select("topic").distinct().collect().map(_.getString(0)).toSet ===
      Set("hbase.requests", "hbase.responses"))
    val v = df.filter(col("topic") === "hbase.requests").head().getString(1)
    val row = spark.read.json(
      spark.createDataset(Seq(v))(org.apache.spark.sql.Encoders.STRING)).head()
    assert(row.getAs[String]("hostname") === "graft-host")
    assert(row.getAs[String]("pipeline") === "graft")
    assert(row.getAs[Boolean]("inbound"))
    assert(row.getAs[String]("client").startsWith("u"))
  }
}
