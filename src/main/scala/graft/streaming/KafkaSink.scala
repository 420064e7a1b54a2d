package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

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
    * Input: the RecordInfo-shaped DataFrame ([[graft.inspector.Inspector.records]] —
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

  /** q14: the Kafka JSON record shape — [[jsonRecords]] over a
    * record-shaped frame derived deterministically from the events table,
    * so BOTH engines see identical input and the serialization itself
    * (field order = struct order, string escaping, topic routing, injected
    * hostname + sorted extra pairs) is hash-verified against DuckDB's
    * `json_object`. Every field is non-null by construction: DuckDB keeps
    * `"k":null` where Spark's `to_json` drops the field. The real
    * pipeline composition (Inspector.records → jsonRecords) stays covered
    * by KafkaSinkSpec — jsonRecords is input-schema-generic.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_json_records" -> ((s, dir) =>
      jsonRecords(
        graft.Tables.events(s, dir).select(
          expr("ts div 1000000").as("ts"), // nanos → epoch millis
          (col("event_id") % 2 === 0).as("inbound"),
          concat(lit("u"), col("user_id")).as("client"),
          (col("user_id") % 1024 + 9000).cast("int").as("port"),
          (col("event_id") % 100000).cast("int").as("call_id"),
          col("event_type").as("method"),
          length(col("props")).cast("int").as("size")),
        parseSpec("broker:9092/hbase.requests/hbase.responses?dc=test&pipeline=graft"),
        hostname = "graft-host")))

  def oracles: Map[String, String] = Map(
    // json_object renders compact like Jackson (no spaces, same escapes);
    // epoch_ns // 1000000 = Spark's `ts div 1000000` on the nanos long.
    "q14_json_records" ->
      """SELECT
        |  CASE WHEN event_id % 2 = 0 THEN 'hbase.requests'
        |       ELSE 'hbase.responses' END AS topic,
        |  json_object(
        |    'ts', epoch_ns(ts) // 1000000,
        |    'inbound', event_id % 2 = 0,
        |    'client', 'u' || CAST(user_id AS VARCHAR),
        |    'port', CAST(user_id % 1024 + 9000 AS INTEGER),
        |    'call_id', CAST(event_id % 100000 AS INTEGER),
        |    'method', event_type,
        |    'size', CAST(length(props) AS INTEGER),
        |    'hostname', 'graft-host',
        |    'dc', 'test',
        |    'pipeline', 'graft')::VARCHAR AS value
        |FROM events""".stripMargin
  )
}
