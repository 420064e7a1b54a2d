package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.inspector.{Inspector, SyntheticTraffic}

/** Kafka JSON sink: topic-spec parsing, record shaping, writeStream
  * plumbing (reference: sink/kafka.clj + core.clj:463-474
  * parse-kafka-spec).
  *
  * Spec grammar (reference usage text, core.clj:40-44):
  *   `SERVERS/T`      both requests and responses to T
  *   `SERVERS/T1/T2`  requests to T1, responses to T2
  *   `SERVERS/T/`     requests to T, responses ignored
  *   `SERVERS//T`     requests ignored, responses to T
  * plus `?k=v&...` extra key-value pairs merged into every record.
  */
object KafkaSink {

  final case class KafkaSpec(
      servers: String,
      topic1: String, // requests
      topic2: String, // responses
      extraPairs: Map[String, String])

  private val SpecRe = "^([^/]+)/([^/]*?)(?:/([^/]*?))?(?:\\?(.*))?$".r

  def parseSpec(spec: String): KafkaSpec = spec match {
    case SpecRe(servers, t1, t2, query) =>
      if ((t1 == null || t1.isEmpty) && (t2 == null || t2.isEmpty))
        throw new IllegalArgumentException("Invalid Kafka spec")
      val extras = Option(query).filter(_.nonEmpty).toSeq
        .flatMap(_.split('&').toSeq)
        .flatMap { kv =>
          kv.split("=", 2) match {
            case Array(k, v) if k.nonEmpty => Some(k -> v)
            case _ => None
          }
        }.toMap
      // absent second topic (no second slash) -> both sides share topic1;
      // an EMPTY second topic ("/T/") means responses are ignored
      KafkaSpec(servers, t1, Option(t2).getOrElse(t1), extras)
    case _ => throw new IllegalArgumentException("Invalid Kafka spec")
  }

  /** Shapes records into (topic, value) rows: value = the full record as
    * JSON with epoch-millis ts, injected hostname, and the extra pairs
    * (reference sink/kafka.clj:45-61 send-fn/make-record); topic routing
    * by direction with empty topics filtered (kafka.clj:69-74).
    *
    * Input: the RecordInfo-shaped DataFrame ([[Inspector.records]] —
    * `ts` is already epoch millis).
    */
  def jsonRecords(records: DataFrame, spec: KafkaSpec, hostname: String): DataFrame = {
    val extras = spec.extraPairs.toSeq.sortBy(_._1)
      .map { case (k, v) => lit(v).as(k) }
    val payload = records.columns.map(col) ++ (lit(hostname).as("hostname") +: extras)
    records
      .select(
        when(col("inbound"), lit(spec.topic1)).otherwise(lit(spec.topic2))
          .as("topic"),
        to_json(struct(payload: _*)).as("value"))
      .filter(length(col("topic")) > 0)
  }

  /** writeStream plumbing for a streaming (topic, value) frame. Kafka
    * needs per-row topics under the `topic` column — exactly what
    * [[jsonRecords]] emits; gzip matches the reference's producer config
    * (sink/kafka.clj:7-17).
    */
  def writeStream(jsonRecords: DataFrame, spec: KafkaSpec,
                  checkpointDir: String): DataStreamWriter[org.apache.spark.sql.Row] =
    jsonRecords.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", spec.servers)
      .option("kafka.compression.type", "gzip")
      .option("checkpointLocation", checkpointDir)

  // --- driver-contract query --------------------------------------------

  /** q14: the Kafka JSON record shape over the inspector pipeline output
    * (deterministic hostname; rows-only — JSON strings are not DuckDB-
    * comparable; shape covered by KafkaSinkSpec).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_json_records" -> ((s, _) =>
      jsonRecords(
        Inspector.records(s, SyntheticTraffic.ensurePcapDir()).toDF(),
        parseSpec("broker:9092/hbase.requests/hbase.responses?dc=test&pipeline=graft"),
        hostname = "graft-host")))

  def oracles: Map[String, String] = Map()
}
