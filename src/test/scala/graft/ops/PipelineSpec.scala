package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Capstone integration: the full curation chain a training-data run
  * performs, composed from the library's own operators over one fixture —
  * exact dedup → benchmark decontamination → PII redaction → repetition
  * quality filter → mixture resampling → sequence packing. Each planted
  * document is eliminated at exactly the stage built to catch it.
  */
class PipelineSpec extends SparkSpec {

  test("curation chain: dedup → decontaminate → redact → quality → mix → pack") {
    val s = spark
    import s.implicits._

    val benchText =
      "wikipedia held out benchmark question about the capital of france tonight"
    val bench = Seq((900L, benchText)).toDF("doc_id", "text")

    val cleanEn = "the quick brown fox jumps over the lazy dog in the sunny park"
    val raw = Seq(
      (1L, "en", cleanEn),
      (2L, "en", cleanEn), // planted exact duplicate of 1
      (3L, "en", "students memorized wikipedia held out benchmark question about " +
        "the capital of france before the exam"), // planted benchmark leak
      (4L, "en", "contact john.doe@example.com about the agenda for tomorrow " +
        "afternoon and the budget review session"), // planted PII
      (5L, "en", "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (6L, "zh", "北京 上海 广州 深圳 成都 杭州 武汉 南京 西安 重庆 天津 苏州"),
      (7L, "zh", "长江 黄河 珠江 松花江 淮河 海河 辽河 汉江 赣江 湘江 闽江 桂江"))
      .toDF("doc_id", "lang", "text")

    // 1. exact dedup (q30 shape): keep the smallest doc_id per text
    val keep = raw.groupBy(xxhash64(col("text")), length(col("text")))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val deduped = raw.join(keep, Seq("doc_id"), "left_semi")
    assert(collectSet(deduped.select("doc_id")).flatten.toSet ===
      Set(1L, 3L, 4L, 5L, 6L, 7L)) // 2 dropped as a duplicate of 1

    // 2. benchmark decontamination: the leaked doc goes
    val decontaminated = Decontam.decontaminate(deduped, bench)
    assert(collectSet(decontaminated.select("doc_id")).flatten.toSet ===
      Set(1L, 4L, 5L, 6L, 7L)) // 3 dropped for the shared 8-gram

    // 3. PII redaction: text replaced, nothing dropped
    val redacted = decontaminated.drop("text")
      .join(Pii.detect(decontaminated).select(col("doc_id"),
        col("redacted").as("text")), "doc_id")
    val doc4 = redacted.filter(col("doc_id") === 4L).select("text").head().getString(0)
    assert(doc4.contains("<EMAIL>") && !doc4.contains("@"))

    // 4. repetition quality filter (stateless, shared with streaming)
    val quality = graft.streaming.StreamingOps.qualityFiltered(redacted)
      .drop("dup_gram_ratio", "top_token_ratio")
    assert(collectSet(quality.select("doc_id")).flatten.toSet ===
      Set(1L, 4L, 6L, 7L)) // 5 dropped: top-token ratio 1.0

    // 5. mixture resampling: weights set to the surviving natural mass, so
    //    both strata are binding and every survivor is kept (deterministic)
    val withMeta = quality
      .withColumn("source", lit("test"))
      .withColumn("n_chars", length(col("text")))
    val mass = withMeta.groupBy("lang").agg(sum("n_chars").cast("double").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val total = mass.values.sum
    val mixed = Sampling.mixSample(withMeta,
      mass.map { case (l, m) => l -> m / total })
    assert(collectSet(mixed.select("doc_id")).flatten.toSet ===
      Set(1L, 4L, 6L, 7L))

    // 6. sequence packing: every survivor lands in exactly one pack with
    //    its true token count
    val packs = Curation.packedSequences(
      mixed.join(redacted.select("doc_id", "text"), "doc_id"),
      "doc_id", budget = 32, nShards = 2).collect()
    assert(packs.map(_.getLong(0)).toSet === Set(1L, 4L, 6L, 7L))
    val nTok = packs.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(nTok(6L) === 12L && nTok(7L) === 12L)
    assert(packs.forall(_.getLong(2) >= 0L)) // well-formed pack ids
  }
}
