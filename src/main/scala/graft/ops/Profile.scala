package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Generic column profiler (q83) — the data-quality monitor a pipeline
  * runs on every snapshot: per column, row/null/distinct counts and
  * min/max. Catching "lang went 40% NULL in this crawl" BEFORE training
  * is the point of having the numbers.
  *
  * Scale posture: ONE aggregation over the table computes every column's
  * stats (Catalyst expands multiple DISTINCT aggregates into one pass),
  * then an explode of the single result row into (column, stats) rows —
  * the unpivot costs nothing. DISTINCT counts run over md5 of the
  * string rendering, NOT the raw value: the distinct partial must ship
  * every distinct value through its exchange, and for a text column
  * that is the whole corpus — 32 hex chars per row keeps the repo's
  * "bodies never cross the exchange" posture (128-bit collisions are
  * the accepted fingerprint risk everywhere else). min/max partials
  * collapse to one value per partition either way; they stay on the raw
  * column, string-rendered (bigint and UTF-8 byte orderings render
  * identically cross-engine).
  */
object Profile {

  /** (col_name, n_rows, n_null, n_distinct, min_val, max_val) per column. */
  def columnStats(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty, "Profile.columnStats: no columns given")
    val aggs = columns.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__nn"),
        count_distinct(md5(col(c).cast("string"))).as(s"${c}__nd"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val rows = array(columns.map { c =>
      struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_null"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }: _*)
    one.select(explode(rows).as("s")).select(col("s.*"))
  }

  /** Per-source Gini coefficient of document token counts (q120), in
    * integer ppm — the inequality profile of a data mix: a source whose
    * token mass sits in a few huge documents (gini → 1) packs, shards,
    * and trains very differently from one with uniform documents
    * (gini → 0), and drift in this number between crawl snapshots is a
    * pipeline alarm.
    *
    * For ascending-sorted token counts x₁…x_m the classic rank form is
    *
    *   G = (2·Σ i·xᵢ − (m+1)·Σ xᵢ) / (m·Σ xᵢ)
    *
    * Scale shape: the corpus-scale sort that formula implies is NOT run
    * over rows. Like q89/q111's exact quantiles, the corpus first
    * collapses to a per-(source, token-count) VALUE HISTOGRAM (one
    * map-side-combined aggregation — the only corpus-scale pass), and
    * Σ i·xᵢ is reconstructed exactly from histogram blocks: a count
    * value n with multiplicity c starting at cumulative rank p
    * contributes n·(c·p + c(c−1)/2), because the ranks it occupies are
    * exactly p…p+c−1 and Gini is tie-order invariant. The window that
    * assigns p runs over histogram rows — bounded by the token-count
    * DOMAIN per source, not its document count — so a dominant source
    * degrades to a spilled sort of distinct lengths, never a
    * corpus-scale row sort.
    *
    * Everything is int64 (c(c−1) is even, so `div 2` is exact; the
    * ppm numerator 10⁶·(2·Σi·x − (m+1)·Σx) ≤ 10⁶·m·Σx overflows only
    * past ~9·10¹² doc·tokens per source — ANSI mode fails loudly there;
    * lift to decimal(38,0) at that scale).
    */
  def lengthGini(docs: DataFrame): DataFrame = {
    // q38's n_words definition: raw split length of the trimmed text
    // (NULL docs excluded; an empty doc counts 1, so Σx ≥ m ≥ 1 and no
    // denominator can hit zero)
    val n = size(split(trim(col("text")), "\\s+")).cast("long")
    val hist = docs.filter(col("text").isNotNull)
      .groupBy(col("source"), n.as("n"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source")).orderBy(col("n"))
    hist
      // p = 1-based cumulative rank where this value block starts
      .withColumn("p", sum(col("c")).over(w) - col("c") + lit(1L))
      .groupBy(col("source"))
      .agg(
        sum(col("c")).as("m"),
        sum(col("n") * col("c")).as("s"),
        sum(expr("n * (c * p + (c * (c - 1)) div 2)")).as("s1"))
      .select(
        col("source"),
        col("m").as("n_docs"),
        col("s").as("total_tokens"),
        expr("(1000 * s) div m").as("mean_tokens_milli"),
        expr("(1000000 * (2 * s1 - (m + 1) * s)) div (m * s)").as("gini_ppm"))
  }

  /** Per-source distribution divergence (q122): total-variation (TV)
    * distance between each source's unigram distribution and the
    * corpus-wide one, in integer ppm — the "which source is
    * distributionally unusual" diagnostic of a data mix (a boilerplate
    * mirror at TV → 10⁶ dilutes a mixture very differently from a
    * source that tracks the corpus at TV → 0, and per-source drift in
    * this number between snapshots localizes what q86 only detects).
    * TV(s) = ½·Σ_t |p_s(t) − p(t)| over the corpus vocabulary; q86
    * ranks individual drifted TOKENS between two snapshots, this
    * collapses each SOURCE to one comparable number against the whole.
    *
    * Exactness: both distributions are first floored to integer ppm
    * (p = 10⁶·c div N — the metric is DEFINED on the floored values),
    * so every term is int64 and the gate compares bit-identical
    * integers; no FP sum order to pin. 10⁶·c must fit int64 — loud
    * ANSI overflow past ~9·10¹² occurrences of one token in one
    * source; lift to decimal(38,0) at that scale.
    *
    * Scale shape: ONE corpus-scale tokenize feeds ONE (source, token)
    * partial-agg pass whose vocab×sources-scale output is MATERIALIZED
    * ([[Materialize]] — the multi-consumer contract), and every
    * downstream frame re-aggregates those blocks (corpus token counts =
    * re-agg by token, source totals = re-agg by source; without the
    * lineage break each broadcast consumer replans the whole chain and
    * the corpus is tokenized six times — measured at sf0.001, and
    * ReusedExchange only rescues the forced-shuffle regime). Absent
    * tokens (in the corpus
    * vocab but not in s) never materialize: their contribution
    * Σ_{t∉s} p(t) folds to P_total − Σ_{t∈s} p(t), so the join stays on
    * PRESENT (source, token) pairs — no source×vocab cross product. The
    * per-token join is a vocab-scale shuffle on token; source totals
    * (≤ domain-catalog rows) and the two 1-row corpus frames ride
    * broadcasts.
    */
  def sourceDivergence(docs: DataFrame): DataFrame = {
    // q48/q86's token definition: whitespace words of the trimmed text,
    // empty tokens dropped (NULL docs carry none)
    val st = Materialize(docs.filter(col("text").isNotNull)
      .select(col("source"), explode(TextAnalysis.words).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c_st")))
    val tok = st.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val src = st.groupBy(col("source"))
      .agg(sum(col("c_st")).as("n_s"), count(lit(1)).as("vocab"))
    val n = tok.agg(sum(col("c_t")).as("n"))
    val tokPpm = tok.crossJoin(broadcast(n))
      .select(col("tok"), expr("(1000000 * c_t) div n").as("p_t"))
    val pTotal = tokPpm.agg(sum(col("p_t")).as("p_total"))
    st.join(tokPpm, Seq("tok"))
      .join(broadcast(src), Seq("source"))
      .groupBy(col("source"), col("n_s"), col("vocab"))
      .agg(
        sum(abs(expr("(1000000 * c_st) div n_s") - col("p_t"))).as("terms"),
        sum(col("p_t")).as("cov"))
      .crossJoin(broadcast(pTotal))
      .select(col("source"), col("n_s").as("n_tokens"), col("vocab"),
        expr("(terms + p_total - cov) div 2").as("tv_ppm"))
  }

  /** The (source, tok, c) unigram count frame q135/q136 derive from —
    * q122's tokenizer (whitespace words of the trimmed text, empties
    * dropped, NULL docs carry none), ONE corpus-scale tokenize into ONE
    * map-side-combined (source, token) partial aggregation. Everything
    * downstream of this frame is vocab-scale.
    */
  private def sourceTokenCounts(docs: DataFrame): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("source"), explode(TextAnalysis.words).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))

  /** Per-source Zipf rank-frequency slope (q135) — the shape law of a
    * token distribution: natural prose tracks rank^(-1) (slope ≈ −1 in
    * log-log), templated/boilerplate sources flatten toward 0, and
    * id-dump or gibberish sources steepen past −1.5 — so drift in this
    * ONE number per source localizes "this crawl started feeding us
    * something structurally different" before any token-level diff
    * (q86) is read. Least-squares slope of ln(count) on ln(rank) over
    * the source's full vocabulary, rank = row_number by (count desc,
    * token asc) — the deterministic q61 tie order.
    *
    * Exactness contract: the regression runs on QUANTIZED logs —
    * x = round(10³·ln rank), y = round(10³·ln count), both int64 — so
    * the four sums Σx, Σy, Σxy, Σx² are exact integers with no FP
    * accumulation order to pin (the q133 all-integer lesson; ln agrees
    * cross-engine to the 3-dp rounding, WIDER margin than q86's 6-dp
    * precedent). Counts are non-increasing in rank, so by the Chebyshev
    * sum inequality num = Σx·Σy − n·Σxy ≥ 0 and den = n·Σx² − (Σx)² > 0
    * for vocab ≥ 2 — slope_ppm = −((10⁶·num) div den) divides
    * NON-NEGATIVE integers (the `div`-vs-`//` floor/trunc divergence on
    * negatives never arises) and negates after. The combination lifts
    * the int64 sums to decimal(38,0): n·Σxy overflows int64 past ~10⁹
    * vocab rows in one source, and 38 digits hold the 10⁶-scaled
    * products exactly to ~10³² — loud ANSI overflow far past any
    * physical corpus.
    *
    * Scale shape: ONE corpus-scale tokenize + (source, token) partial
    * agg ([[sourceTokenCounts]]); the ranking window runs over the
    * VOCAB-scale count frame partitioned by source (the q120 histogram-
    * window class — bounded by vocabulary, not documents), and the
    * regression collapses it to one row per source map-side.
    */
  def zipfSlope(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("tok").asc)
    val q = sourceTokenCounts(docs)
      .withColumn("i", row_number().over(w))
      .select(col("source"), col("c"),
        round(log(col("i").cast("double")) * 1000).cast("long").as("x"),
        round(log(col("c").cast("double")) * 1000).cast("long").as("y"))
    q.groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tokens"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("vocab") >= 2)
      .select(col("source"), col("vocab"), col("n_tokens"),
        (-expr("""(1000000 * (CAST(sx AS DECIMAL(38,0)) * CAST(sy AS DECIMAL(38,0))
                   - CAST(vocab AS DECIMAL(38,0)) * CAST(sxy AS DECIMAL(38,0))))
                  div (CAST(vocab AS DECIMAL(38,0)) * CAST(sxx AS DECIMAL(38,0))
                   - CAST(sx AS DECIMAL(38,0)) * CAST(sx AS DECIMAL(38,0)))"""))
          .as("zipf_slope_ppm"))
  }

  /** Per-source unigram Shannon entropy (q136) — the CONCENTRATION
    * diagnostic q135's slope and q122's TV distance don't give: entropy
    * collapses "how spread is this source's token mass" to one number
    * (a keyword-stuffed or looping-generator source reads low, natural
    * prose high), and the ln(vocab)-normalized form is comparable
    * across sources of different vocabulary sizes — the standard
    * efficiency/perplexity axis of a mixture report.
    *
    * Exactness: H = ln N − (Σ c·ln c)/N is computed on quantized logs —
    * x_c = round(10³·ln c) ≥ 0, so Σ c·x_c is an exact int64 sum (≤
    * N·3·10⁴: loud ANSI overflow only past ~3·10¹⁴ tokens per source)
    * and entropy_milli = round(10³·ln N) − (Σ c·x_c) div N divides
    * non-negative integers; norm_entropy_ppm = (10⁶·entropy_milli) div
    * H_max_milli with H_max_milli = round(10³·ln vocab) — all
    * int64, nothing for the engines to round differently (the q133
    * convention; ln to 3 dp as q135).
    *
    * Scale shape: [[sourceTokenCounts]]' one corpus-scale pass, then a
    * single vocab-scale (source) partial aggregate — no window, no
    * join; the per-source scalars fold map-side.
    */
  def tokenEntropy(docs: DataFrame): DataFrame =
    sourceTokenCounts(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tokens"),
        sum(col("c") *
          round(log(col("c").cast("double")) * 1000).cast("long"))
          .as("sclnc"))
      .filter(col("vocab") >= 2)
      .select(col("source"), col("vocab"), col("n_tokens"),
        (round(log(col("n_tokens").cast("double")) * 1000).cast("long")
          - expr("sclnc div n_tokens")).as("entropy_milli"),
        round(log(col("vocab").cast("double")) * 1000).cast("long")
          .as("hmax_milli"))
      .select(col("source"), col("vocab"), col("n_tokens"),
        col("entropy_milli"),
        expr("(1000000 * entropy_milli) div hmax_milli")
          .as("norm_entropy_ppm"))

  /** Per-source hapax/dis legomena profile (q138) — the vocabulary-HEALTH
    * axis q135's slope and q136's entropy summarize away: the share of a
    * source's vocabulary (and token mass) occurring exactly once or
    * twice. OCR noise, id dumps and encoding rot INFLATE hapax share
    * (every garble is a fresh "word"); templated/boilerplate sources
    * DEFLATE it far below prose's ~40–60% — and hapax mass is exactly
    * the vocabulary-growth pressure (Heaps-law tail) a tokenizer budget
    * or a MisraGries cap has to absorb. One number pair per source,
    * comparable across crawls.
    *
    * Exactness: pure integer arithmetic — hapax/dis are exact long
    * counts off the (source, token) frame, shares are floored ppm of
    * exact sums (the q122 convention). Scale shape:
    * [[sourceTokenCounts]]' one corpus-scale pass, then a single
    * vocab-scale per-source aggregate — no window, no join.
    */
  def hapaxProfile(docs: DataFrame): DataFrame =
    sourceTokenCounts(docs)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("hapax"),
        sum(when(col("c") === 2, 1L).otherwise(0L)).as("dis"))
      .select(col("source"), col("vocab"), col("n_tokens"),
        col("hapax"), col("dis"),
        expr("(1000000 * hapax) div vocab").as("hapax_vocab_ppm"),
        expr("(1000000 * hapax) div n_tokens").as("hapax_mass_ppm"),
        expr("(1000000 * dis) div vocab").as("dis_vocab_ppm"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q83_column_stats" -> ((s, dir) =>
      columnStats(Tables.documents(s, dir),
        Seq("doc_id", "text", "lang", "source", "n_chars"))),
    "q120_length_gini" -> ((s, dir) =>
      lengthGini(Tables.documents(s, dir))),
    "q122_source_divergence" -> ((s, dir) =>
      sourceDivergence(Tables.documents(s, dir))),
    "q135_zipf_slope" -> ((s, dir) =>
      zipfSlope(Tables.documents(s, dir))),
    "q136_token_entropy" -> ((s, dir) =>
      tokenEntropy(Tables.documents(s, dir))),
    "q138_hapax_ratio" -> ((s, dir) =>
      hapaxProfile(Tables.documents(s, dir))))

  def oracles: Map[String, String] = Map(
    // one UNION branch per column — counts + casts mirror exactly
    // (count(col) excludes NULLs, count(DISTINCT md5(...)) excludes
    // NULLs and fingerprints the same rendered strings, string min/max
    // are byte-order on both engines)
    "q83_column_stats" -> Seq("doc_id", "text", "lang", "source", "n_chars")
      .map { c =>
        s"""SELECT '$c' AS col_name, count(*) AS n_rows,
           |  count(*) - count($c) AS n_null,
           |  CAST(count(DISTINCT md5(CAST($c AS VARCHAR))) AS BIGINT)
           |    AS n_distinct,
           |  CAST(min($c) AS VARCHAR) AS min_val,
           |  CAST(max($c) AS VARCHAR) AS max_val
           |FROM documents""".stripMargin
      }.mkString("\nUNION ALL\n"),

    // The oracle takes the NAIVE road the Spark side deliberately
    // avoids — row_number over raw documents — which doubles as a
    // derivation check that the histogram-block reconstruction of
    // Σ i·xᵢ is exact (Gini is tie-order invariant, so the arbitrary
    // tie resolution inside each equal-count block cannot diverge).
    "q120_length_gini" ->
      raw"""WITH t AS (
           |  SELECT source,
           |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
           |      AS n
           |  FROM documents WHERE text IS NOT NULL),
           |r AS (
           |  SELECT source, n,
           |    row_number() OVER (PARTITION BY source ORDER BY n) AS i
           |  FROM t)
           |SELECT source,
           |  count(*) AS n_docs,
           |  CAST(sum(n) AS BIGINT) AS total_tokens,
           |  CAST((1000 * sum(n)) // count(*) AS BIGINT)
           |    AS mean_tokens_milli,
           |  CAST((1000000 * (2 * sum(i * n) - (count(*) + 1) * sum(n)))
           |    // (count(*) * sum(n)) AS BIGINT) AS gini_ppm
           |FROM r GROUP BY source""".stripMargin,

    // Same tokenizer, same floored-ppm definition, same absent-token
    // fold (P_total − cov); `//` floors like Spark's `div` on the
    // non-negative operands here. MATERIALIZED pins the shared CTEs to
    // one evaluation (the q119/q102 inlining lesson); every output
    // column is cast to BIGINT because DuckDB's sum() returns hugeint,
    // which pandas would render as float64 and fail the hash.
    "q122_source_divergence" ->
      raw"""WITH st AS MATERIALIZED (
           |  SELECT source, tok, count(*) AS c_st
           |  FROM (SELECT source,
           |          unnest(regexp_split_to_array(trim(text), '\s+'))
           |            AS tok
           |        FROM documents WHERE text IS NOT NULL)
           |  WHERE tok <> ''
           |  GROUP BY source, tok),
           |tk AS MATERIALIZED (
           |  SELECT tok, sum(c_st) AS c_t FROM st GROUP BY tok),
           |n AS (SELECT sum(c_t) AS n FROM tk),
           |tp AS MATERIALIZED (
           |  SELECT tok, (1000000 * c_t) // n AS p_t FROM tk, n),
           |pt AS (SELECT sum(p_t) AS p_total FROM tp),
           |src AS MATERIALIZED (
           |  SELECT source, sum(c_st) AS n_s, count(*) AS vocab
           |  FROM st GROUP BY source),
           |terms AS (
           |  SELECT st.source,
           |         sum(abs((1000000 * st.c_st) // s.n_s - tp.p_t))
           |           AS terms,
           |         sum(tp.p_t) AS cov
           |  FROM st JOIN tp USING (tok) JOIN src s USING (source)
           |  GROUP BY st.source)
           |SELECT t.source, CAST(s.n_s AS BIGINT) AS n_tokens,
           |       CAST(s.vocab AS BIGINT) AS vocab,
           |       CAST((t.terms + pt.p_total - t.cov) // 2 AS BIGINT)
           |         AS tv_ppm
           |FROM terms t JOIN src s USING (source), pt""".stripMargin,

    // Same tokenizer, same (count desc, token asc) rank order, same
    // 3-dp log quantization (round() ties-away == Spark HALF_UP on
    // these non-negative values), same decimal/HUGEINT-exact
    // combination: duckdb's sum() over BIGINT already returns HUGEINT,
    // so the products are 128-bit exact like Spark's decimal(38,0);
    // `//` floors like `div` on the non-negative num/den, negation
    // happens after the division on both engines.
    "q135_zipf_slope" ->
      raw"""WITH st AS MATERIALIZED (
           |  SELECT source, tok, count(*) AS c
           |  FROM (SELECT source,
           |          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           |        FROM documents WHERE text IS NOT NULL)
           |  WHERE tok <> '' GROUP BY source, tok),
           |r AS (
           |  SELECT source, c,
           |    row_number() OVER (PARTITION BY source
           |                       ORDER BY c DESC, tok ASC) AS i
           |  FROM st),
           |q AS (
           |  SELECT source,
           |    c,
           |    CAST(round(ln(i) * 1000) AS BIGINT) AS x,
           |    CAST(round(ln(c) * 1000) AS BIGINT) AS y
           |  FROM r),
           |s AS (
           |  SELECT source, count(*) AS n, sum(c) AS n_tokens,
           |    sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
           |    sum(x * x) AS sxx
           |  FROM q GROUP BY source)
           |SELECT source, CAST(n AS BIGINT) AS vocab,
           |  CAST(n_tokens AS BIGINT) AS n_tokens,
           |  CAST(-((1000000 * (sx * sy - n * sxy))
           |         // (n * sxx - sx * sx)) AS BIGINT) AS zipf_slope_ppm
           |FROM s WHERE n >= 2""".stripMargin,

    // Same tokenizer, same quantized-log integer entropy: x_c =
    // round(10^3 ln c), entropy_milli = round(10^3 ln N) −
    // (Σ c·x_c) // N, norm = (10^6·entropy_milli) // round(10^3 ln V) —
    // every operand non-negative, `//` == `div`.
    "q136_token_entropy" ->
      raw"""WITH st AS MATERIALIZED (
           |  SELECT source, tok, count(*) AS c
           |  FROM (SELECT source,
           |          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           |        FROM documents WHERE text IS NOT NULL)
           |  WHERE tok <> '' GROUP BY source, tok),
           |s AS (
           |  SELECT source, count(*) AS vocab, sum(c) AS n_tokens,
           |    sum(c * CAST(round(ln(c) * 1000) AS BIGINT)) AS sclnc
           |  FROM st GROUP BY source),
           |e AS (
           |  SELECT source, vocab, n_tokens,
           |    CAST(round(ln(n_tokens) * 1000) AS BIGINT)
           |      - sclnc // n_tokens AS entropy_milli,
           |    CAST(round(ln(vocab) * 1000) AS BIGINT) AS hmax_milli
           |  FROM s WHERE vocab >= 2)
           |SELECT source, CAST(vocab AS BIGINT) AS vocab,
           |  CAST(n_tokens AS BIGINT) AS n_tokens,
           |  CAST(entropy_milli AS BIGINT) AS entropy_milli,
           |  CAST((1000000 * entropy_milli) // hmax_milli AS BIGINT)
           |    AS norm_entropy_ppm
           |FROM e""".stripMargin,

    // Same tokenizer, same exact-count shares (`//` == `div`,
    // non-negative); BIGINT casts because duckdb sums render hugeint
    // as float64 in the compare.
    "q138_hapax_ratio" ->
      raw"""WITH st AS MATERIALIZED (
           |  SELECT source, tok, count(*) AS c
           |  FROM (SELECT source,
           |          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
           |        FROM documents WHERE text IS NOT NULL)
           |  WHERE tok <> '' GROUP BY source, tok)
           |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
           |  CAST(sum(c) AS BIGINT) AS n_tokens,
           |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
           |  CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dis,
           |  CAST((1000000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END))
           |    // count(*) AS BIGINT) AS hapax_vocab_ppm,
           |  CAST((1000000 * sum(CASE WHEN c = 1 THEN 1 ELSE 0 END))
           |    // sum(c) AS BIGINT) AS hapax_mass_ppm,
           |  CAST((1000000 * sum(CASE WHEN c = 2 THEN 1 ELSE 0 END))
           |    // count(*) AS BIGINT) AS dis_vocab_ppm
           |FROM st GROUP BY source""".stripMargin)
}
