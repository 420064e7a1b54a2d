package graft.inspector

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch packet->record pipeline (placeholder; filled by the pcap/proto stack). */
object Inspector {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracles: Map[String, String] = Map()
}
