package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline:
  * language ID, quality scoring, token counting, document fingerprinting.
  * All are single-pass, map-side-only transforms (no shuffle): at 100 TB
  * each is embarrassingly parallel over parquet row groups, and every
  * expression stays inside whole-stage codegen (builtin functions only —
  * no UDFs in the hot path).
  */
object TextAnalysis {

  /** Stopword sets per language for the n-gram/stopword LID heuristic.
    * Tiny on purpose: broadcast as literals inside the plan.
    */
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une"),
    "es" -> Seq("el", "la", "de", "y", "los", "las", "un", "una"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "zu", "mit"),
    "zh" -> Seq("de", "le", "shi", "zai", "you", "wo", "ta", "men"))

  /** Whitespace tokenization of the `text` column — THE shared
    * definition (q38/q48's oracle form `regexp_split_to_array(trim(text),
    * '\s+')`); ops outside this file reuse it so a tokenizer tweak can
    * never drift between queries.
    */
  private[graft] def words = split(trim(col("text")), "\\s+")

  /** JVM-side twin of [[words]] for driver / `mapPartitions` code, with
    * the `filter(token =!= "")` every consumer of [[words]] applies.
    * Strips SPACES only — SQL `trim` semantics; Java's `String.trim` also
    * strips every control char <= U+0020 and would silently diverge on
    * text edged with a non-whitespace control char (the
    * RepetitionStats.compute note). A property spec
    * cross-checks the two on whitespace soups.
    */
  private[graft] def wordsLocal(text: String): Array[String] = {
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    text.substring(lo, hi).split("\\s+").filter(_.nonEmpty)
  }

  /** The repetition-quality ratios over a [[graft.functions.RepetitionStats]]
    * struct column — ONE definition shared by batch q44 and the streaming
    * quality filter so the two paths cannot drift.
    */
  /** Repetition-screen thresholds — ONE definition shared by the
    * streaming quality filter and the q112 cascade so the two screens
    * cannot drift. */
  private[graft] val MaxDupGramRatio = 0.5
  private[graft] val MaxTopTokenRatio = 0.3

  private[graft] def dupGramRatio(st: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(st.getField("ng") > 0,
      lit(1.0) - st.getField("nu").cast("double") / st.getField("ng"))
      .otherwise(0.0)

  private[graft] def topTokenRatio(st: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    st.getField("top").cast("double") / st.getField("n_toks")

  /** First 8 md5 hex digits of a column as a long — the per-value hash
    * shared with the DuckDB oracles (`('0x' || substring(md5(x),1,8))
    * ::BIGINT` on that side). Used by q40's rolling fingerprint and
    * q46's split buckets; keep both engines' forms in sync through this
    * one definition.
    */
  private[graft] def md5Prefix(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Compression-ratio quality signal (q82): deflated bytes / raw bytes
    * of the UTF-8 text — the CCNet/RedPajama-style heuristic (machine-
    * generated or heavily repetitive text compresses far below prose;
    * random noise doesn't compress at all). Map-side only; ONE Deflater
    * per partition, reset per row (the WARC sink lesson: per-row native
    * deflater churn dominates small-document throughput). Deterministic
    * for a given zlib level, so rows are stable across runs; no SQL
    * oracle exists (DuckDB has no deflate) — the spec pins closed-form
    * orderings instead.
    */
  def compressionRatio(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        // end() must run even when the consumer short-circuits (limit/
        // take/failure leave the iterator partially drained) — the task
        // completion listener is the only hook that always fires
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => deflater.end()))
        val buf = new Array[Byte](1 << 16)
        it.map { case (id, text) =>
          val raw = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(raw)
          deflater.finish()
          var n = 0L
          while (!deflater.finished()) n += deflater.deflate(buf)
          val ratio = if (raw.length == 0) 1.0 else n.toDouble / raw.length
          (id, raw.length.toLong, n, math.rint(ratio * 1e6) / 1e6)
        }
      }.toDF("doc_id", "n_bytes", "n_deflated", "compress_ratio")
  }

  /** q37's exact per-doc language prediction, reusable by rollups (q105
    * fertility): stopword-overlap scores per language, argmax with the
    * deterministic first-in-sorted-order tiebreak. NULL-text contract
    * shared with the oracle (same as q44): a NULL text makes every score
    * NULL — Spark's fold would keep the init language while the oracle's
    * CASE falls through to the last, so both sides exclude NULL-text
    * docs instead. Pure builtin-function plan: words -> per-language
    * overlap counts, map-side only.
    */
  private[graft] def langPerDoc(docs: DataFrame): DataFrame = {
    val base = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), words.as("w"))
    val scored = stopwords.foldLeft(base) { case (df, (lang, sw)) =>
      df.withColumn(s"score_$lang",
        size(array_intersect(array_distinct(col("w")),
          array(sw.map(lit): _*))).cast("double") / size(col("w")))
    }
    val langs = stopwords.keys.toSeq.sorted
    // argmax via chained when (ties resolve to first in sorted order)
    val best = langs.tail.foldLeft(
      struct(col(s"score_${langs.head}").as("sc"), lit(langs.head).as("lang"))) {
      (acc, l) =>
        when(col(s"score_$l") > acc.getField("sc"),
          struct(col(s"score_$l").as("sc"), lit(l).as("lang"))).otherwise(acc)
    }
    // n_words/n_uniq ride the SAME projection so rollups (q114) need no
    // second tokenization pass and no doc_id join; q37/q105 select the
    // columns they use
    scored.select(col("doc_id"), best.getField("lang").as("pred_lang"),
      best.getField("sc").as("lid_score"),
      size(col("w")).cast("long").as("n_words"),
      size(array_distinct(col("w"))).cast("long").as("n_uniq"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q82_compress_ratio" -> ((s, dir) =>
      compressionRatio(s, Tables.documents(s, dir))),

    // Doc quality profile: token counts, vocabulary richness, word shape.
    "q38_quality_score" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"), words.as("w"))
        .select(
          col("doc_id"),
          size(col("w")).cast("long").as("n_words"),
          size(array_distinct(col("w"))).cast("long").as("n_uniq"),
          col("n_chars"))
        .withColumn("uniq_ratio", col("n_uniq").cast("double") / col("n_words"))
        .withColumn("chars_per_word", col("n_chars").cast("double") / col("n_words"))),

    // Token counting: whitespace tokens + a BPE-ish regex segmentation
    // (letter runs / digit runs / single non-alnum marks).
    "q39_token_count" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          size(words).cast("long").as("ws_tokens"),
          // regexp_count ≡ size(regexp_extract_all) — same engine, same
          // non-overlapping walk — without building the match array (r21)
          expr("regexp_count(text, '[a-z]+')").cast("long")
            .as("alpha_tokens"),
          expr("regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')")
            .cast("long").as("bpeish_tokens"))),

    // Language ID: score = fraction of tokens that are stopwords of each
    // language; argmax with deterministic tiebreak on language code.
    // Pure builtin-function plan: words -> per-language overlap counts.
    "q37_lang_id" -> ((s, dir) =>
      langPerDoc(Tables.documents(s, dir))
        .select(col("doc_id"), col("pred_lang"), col("lid_score"))),

    // Per-language quality profile: the "which languages need which
    // thresholds" table — q37's prediction rolled up with exact token
    // stats, all from langPerDoc's ONE map-side projection (no second
    // tokenization, no doc_id join), collapsed by a ≤|languages|-key
    // partial agg. Ratios are INTEGER ppm / milli-words — round(q·scale,
    // 0) of one division of exact long sums, never round(q, 6): scale-0
    // rounding cannot diverge cross-engine (half-integers are exact
    // doubles — the q109 lesson), and never an average of per-doc
    // doubles whose FP accumulation order would break the hash.
    "q114_lang_quality" -> ((s, dir) =>
      langPerDoc(Tables.documents(s, dir))
        .groupBy(col("pred_lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("sw"), sum(col("n_uniq")).as("su"))
        .select(col("pred_lang"), col("n_docs"),
          col("sw").cast("long").as("sum_words"),
          col("su").cast("long").as("sum_uniq"),
          round(col("su").cast("double") * 1e6 / col("sw"), 0).cast("long")
            .as("uniq_ratio_ppm"),
          round(col("sw").cast("double") * 1000 / col("n_docs"), 0).cast("long")
            .as("mean_words_milli"))),

    // Repetition signals (Gopher/C4-style quality filters): duplicate
    // 3-gram ratio (non-distinct grams — repetition IS the signal) and
    // top-token concentration. Round 2: O(tokens²) interpreted array
    // form. Round 3: explode + codegen aggregates (one (doc_id, token)
    // shuffle). Round 4: the stats are a pure per-row function, so the
    // native codegen'd RepetitionStats expression computes them inside
    // the scan projection — ZERO shuffles, the tokenized corpus never
    // leaves its input partition. Oracle unchanged (same outputs).
    "q44_repetition" -> ((s, dir) => {
      // explicit null-text contract shared with the oracle SQL: a doc
      // with NULL text is excluded on both sides
      Tables.documents(s, dir).filter(col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.RepetitionStats(col("text")).as("st"))
        .select(
          col("doc_id"),
          col("st.ng").as("n_grams"),
          col("st.nu").as("n_uniq_grams"),
          dupGramRatio(col("st")).as("dup_gram_ratio"),
          topTokenRatio(col("st")).as("top_token_ratio"))
    }),

    // Rolling-hash document fingerprint: polynomial hash of the token
    // stream mod (2^31 - 1) — content-defined identity robust to whitespace
    // noise; modular form keeps every step in long range under ANSI mode.
    // Per-word hash = first 8 md5 hex digits (round 4: was crc32, which
    // DuckDB lacks — md5 is shared by both engines, making this oracle-able).
    "q40_doc_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), words.as("w"))
        .select(col("doc_id"),
          aggregate(col("w"), lit(7L),
            (acc, w) => pmod(acc * lit(31L) + md5Prefix(w), lit(2147483647L)))
            .as("fingerprint"))),

    // Per-source character-class profile — see [[charClassProfile]].
    "q137_char_classes" -> ((s, dir) =>
      charClassProfile(Tables.documents(s, dir))),

    // Per-language token-length histogram — see [[tokenLenHist]].
    "q143_token_len_hist" -> ((s, dir) =>
      tokenLenHist(Tables.documents(s, dir)))
  )

  /** Per-source character-class mix (q137) — the SCRIPT/shape profile
    * of a data mix, one level below q38's token-quality fields: the
    * fraction of a source's characters that are ASCII letters, digits,
    * whitespace, or other. A source whose digit share doubles between
    * crawls started feeding id dumps or tables; a collapsing letter
    * share flags markup/encoding rot that token-level stats read as
    * "new vocabulary". Counts per class come from ONE regexp_replace
    * length delta per class per row (codegen'd, map-side; character
    * classes are spelled as explicit ASCII ranges — [A-Za-z], [0-9],
    * [ \t\n\r] — the Java-regex/RE2 intersection, so both engines
    * delete exactly the same characters); shares are floored integer
    * ppm of exact long sums (the q122 convention — no per-doc double
    * ever crosses an aggregate). The four ppm columns need not sum to
    * 10⁶ (each floors independently) — BY DESIGN, same as q122.
    *
    * Scale shape: map-side per-row class counts into ONE ≤|sources|-key
    * partial aggregate; nothing but (source, 5 longs) crosses the
    * exchange.
    */
  def charClassProfile(docs: DataFrame): DataFrame = {
    val n = length(col("text")).cast("long")
    def cnt(cls: String) =
      (n - length(regexp_replace(col("text"), cls, ""))).cast("long")
    docs.filter(col("text").isNotNull)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(n).as("n_chars"),
        sum(cnt("[A-Za-z]")).as("nl"), sum(cnt("[0-9]")).as("nd"),
        sum(cnt("[ \\t\\n\\r]")).as("ns"))
      .filter(col("n_chars") > 0)
      .select(col("source"), col("n_docs"), col("n_chars"),
        expr("(1000000 * nl) div n_chars").as("letter_ppm"),
        expr("(1000000 * nd) div n_chars").as("digit_ppm"),
        expr("(1000000 * ns) div n_chars").as("space_ppm"),
        expr("(1000000 * (n_chars - nl - nd - ns)) div n_chars")
          .as("other_ppm"))
  }

  /** Per-language token-length histogram (q143) — the subword-budget
    * table under q48's single avg_tok_len number: how token mass
    * distributes over character lengths per language decides BPE
    * vocabulary sizing and flags corpus rot the average hides (a spike
    * at 16+ means URLs/ids/concatenation artifacts; a collapse to 1–2
    * means CJK-style segmentation leaked into a space-delimited lang).
    * Lengths clamp at 16 (everything longer is one "16+" bucket — the
    * tail is the signal, not its exact lengths); shares are floored
    * integer ppm of each language's token mass.
    *
    * Scale shape: ONE corpus-scale tokenize into a (lang, len_bucket)
    * partial aggregate — ≤ |langs|·16 cells; per-lang totals re-agg
    * the cell frame (never a second corpus pass) and join back by
    * broadcast.
    */
  def tokenLenHist(docs: DataFrame): DataFrame = {
    val cells = Materialize(docs.filter(col("text").isNotNull)
      .select(col("lang"), explode(words).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("lang"), least(length(col("tok")), lit(16)).as("len_bucket"))
      .agg(count(lit(1)).as("n_tokens")))
    val totals = cells.groupBy(col("lang")).agg(sum(col("n_tokens")).as("tot"))
    cells.join(broadcast(totals), Seq("lang"))
      .select(col("lang"), col("len_bucket").cast("long").as("len_bucket"),
        col("n_tokens"),
        expr("(1000000 * n_tokens) div tot").as("share_ppm"))
  }

  def oracles: Map[String, String] = Map(
    "q38_quality_score" ->
      """SELECT doc_id,
        |CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_words,
        |CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT)
        |  AS n_uniq,
        |n_chars,
        |CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS DOUBLE)
        |  / len(regexp_split_to_array(trim(text), '\s+')) AS uniq_ratio,
        |CAST(n_chars AS DOUBLE)
        |  / len(regexp_split_to_array(trim(text), '\s+')) AS chars_per_word
        |FROM documents""".stripMargin,

    "q39_token_count" ->
      """SELECT doc_id,
        |CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
        |CAST(len(regexp_extract_all(text, '[a-z]+')) AS BIGINT) AS alpha_tokens,
        |CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT)
        |  AS bpeish_tokens
        |FROM documents""".stripMargin,

    "q44_repetition" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') tk
        |           FROM documents WHERE text IS NOT NULL),
        |g AS (SELECT doc_id, tk,
        |        CASE WHEN len(tk) >= 3
        |             THEN list_transform(generate_series(1, len(tk)-2),
        |                    i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
        |             ELSE [] END gr
        |      FROM t)
        |SELECT doc_id,
        |  CAST(len(gr) AS BIGINT) AS n_grams,
        |  CAST(len(list_distinct(gr)) AS BIGINT) AS n_uniq_grams,
        |  CASE WHEN len(gr) > 0
        |       THEN 1.0 - CAST(len(list_distinct(gr)) AS DOUBLE)/len(gr)
        |       ELSE 0.0 END AS dup_gram_ratio,
        |  CAST(list_max(list_transform(list_distinct(tk),
        |         x -> len(list_filter(tk, y -> y = x)))) AS DOUBLE)/len(tk)
        |    AS top_token_ratio
        |FROM g""".stripMargin,
    // The q37 oracle mirrors the Spark fold exactly: scores are
    // stopword-overlap ratios per language; the argmax CASE keeps the
    // "strictly greater replaces" fold semantics (ties resolve to the
    // FIRST language in sorted order), so `score_de >= greatest(rest)`
    // wins de exactly when de holds the (possibly shared) maximum.
    "q37_lang_id" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w
        |           FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT doc_id,
        |  CAST(len(list_intersect(list_distinct(w),
        |    ['der','die','das','und','ein','eine','zu','mit'])) AS DOUBLE)/len(w) AS score_de,
        |  CAST(len(list_intersect(list_distinct(w),
        |    ['the','a','of','and','to','in','is','that'])) AS DOUBLE)/len(w) AS score_en,
        |  CAST(len(list_intersect(list_distinct(w),
        |    ['el','la','de','y','los','las','un','una'])) AS DOUBLE)/len(w) AS score_es,
        |  CAST(len(list_intersect(list_distinct(w),
        |    ['le','la','de','et','les','des','un','une'])) AS DOUBLE)/len(w) AS score_fr,
        |  CAST(len(list_intersect(list_distinct(w),
        |    ['de','le','shi','zai','you','wo','ta','men'])) AS DOUBLE)/len(w) AS score_zh
        |FROM t)
        |SELECT doc_id,
        |  CASE WHEN score_de >= greatest(score_en, score_es, score_fr, score_zh) THEN 'de'
        |       WHEN score_en >= greatest(score_es, score_fr, score_zh) THEN 'en'
        |       WHEN score_es >= greatest(score_fr, score_zh) THEN 'es'
        |       WHEN score_fr >= score_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang,
        |  greatest(score_de, score_en, score_es, score_fr, score_zh) AS lid_score
        |FROM s""".stripMargin,

    // the q37 argmax CTE + exact long sums; ratios round q·scale at
    // SCALE 0 (ppm / milli-words) — the cross-engine-safe spelling
    "q114_lang_quality" ->
      """WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') w
        |           FROM documents WHERE text IS NOT NULL),
        |s AS (SELECT doc_id, len(w) AS n_words,
        |  len(list_distinct(w)) AS n_uniq,
        |  CAST(len(list_intersect(list_distinct(w),
        |    ['der','die','das','und','ein','eine','zu','mit'])) AS DOUBLE)/len(w) AS score_de,
        |  CAST(len(list_intersect(list_distinct(w),
        |    ['the','a','of','and','to','in','is','that'])) AS DOUBLE)/len(w) AS score_en,
        |  CAST(len(list_intersect(list_distinct(w),
        |    ['el','la','de','y','los','las','un','una'])) AS DOUBLE)/len(w) AS score_es,
        |  CAST(len(list_intersect(list_distinct(w),
        |    ['le','la','de','et','les','des','un','une'])) AS DOUBLE)/len(w) AS score_fr,
        |  CAST(len(list_intersect(list_distinct(w),
        |    ['de','le','shi','zai','you','wo','ta','men'])) AS DOUBLE)/len(w) AS score_zh
        |FROM t),
        |l AS (SELECT doc_id, n_words, n_uniq,
        |  CASE WHEN score_de >= greatest(score_en, score_es, score_fr, score_zh) THEN 'de'
        |       WHEN score_en >= greatest(score_es, score_fr, score_zh) THEN 'en'
        |       WHEN score_es >= greatest(score_fr, score_zh) THEN 'es'
        |       WHEN score_fr >= score_zh THEN 'fr'
        |       ELSE 'zh' END AS pred_lang
        |FROM s)
        |SELECT pred_lang, count(*) AS n_docs,
        |  CAST(sum(n_words) AS BIGINT) AS sum_words,
        |  CAST(sum(n_uniq) AS BIGINT) AS sum_uniq,
        |  CAST(round(CAST(sum(n_uniq) AS DOUBLE) * 1e6 / sum(n_words), 0)
        |    AS BIGINT) AS uniq_ratio_ppm,
        |  CAST(round(CAST(sum(n_words) AS DOUBLE) * 1000 / count(*), 0)
        |    AS BIGINT) AS mean_words_milli
        |FROM l GROUP BY pred_lang""".stripMargin,

    // Same fold, DuckDB form: list_prepend injects the init value,
    // list_reduce runs the identical (acc*31 + h) % P recurrence. All
    // intermediates positive, so % == pmod.
    "q40_doc_fingerprint" ->
      """SELECT doc_id,
        |  list_reduce(list_prepend(7::BIGINT,
        |    list_transform(regexp_split_to_array(trim(text), '\s+'),
        |      w -> ('0x' || substring(md5(w), 1, 8))::BIGINT)),
        |    (acc, h) -> (acc*31 + h) % 2147483647) AS fingerprint
        |FROM documents""".stripMargin,

    // Same explicit ASCII classes (RE2 reads [ \t\n\r] exactly like
    // Java regex), 'g' flag because DuckDB's regexp_replace is
    // first-match by default where Spark's replaces all; same floored
    // integer ppm over exact sums (`//` == `div`, non-negative).
    "q137_char_classes" ->
      raw"""WITH d AS (
           |  SELECT source, CAST(length(text) AS BIGINT) AS n,
           |    CAST(length(text)
           |      - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
           |      AS BIGINT) AS nl,
           |    CAST(length(text)
           |      - length(regexp_replace(text, '[0-9]', '', 'g'))
           |      AS BIGINT) AS nd,
           |    CAST(length(text)
           |      - length(regexp_replace(text, '[ \t\n\r]', '', 'g'))
           |      AS BIGINT) AS ns
           |  FROM documents WHERE text IS NOT NULL),
           |s AS (
           |  SELECT source, count(*) AS n_docs, sum(n) AS n_chars,
           |    sum(nl) AS nl, sum(nd) AS nd, sum(ns) AS ns
           |  FROM d GROUP BY source)
           |SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           |  CAST(n_chars AS BIGINT) AS n_chars,
           |  CAST((1000000 * nl) // n_chars AS BIGINT) AS letter_ppm,
           |  CAST((1000000 * nd) // n_chars AS BIGINT) AS digit_ppm,
           |  CAST((1000000 * ns) // n_chars AS BIGINT) AS space_ppm,
           |  CAST((1000000 * (n_chars - nl - nd - ns)) // n_chars AS BIGINT)
           |    AS other_ppm
           |FROM s WHERE n_chars > 0""".stripMargin,

    // Same tokenizer, same 16-clamp, same floored-ppm shares off the
    // cell frame (`//` == `div`, non-negative). MATERIALIZED pins the
    // shared cell CTE to one evaluation.
    "q143_token_len_hist" ->
      raw"""WITH cells AS MATERIALIZED (
           |  SELECT lang, least(length(tok), 16) AS len_bucket,
           |    count(*) AS n_tokens
           |  FROM (SELECT lang,
           |          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           |        FROM documents WHERE text IS NOT NULL)
           |  WHERE tok <> '' GROUP BY 1, 2),
           |tot AS (SELECT lang, sum(n_tokens) AS tot FROM cells GROUP BY lang)
           |SELECT c.lang, CAST(c.len_bucket AS BIGINT) AS len_bucket,
           |  CAST(c.n_tokens AS BIGINT) AS n_tokens,
           |  CAST((1000000 * c.n_tokens) // t.tot AS BIGINT) AS share_ppm
           |FROM cells c JOIN tot t ON c.lang = t.lang""".stripMargin
  )
}
