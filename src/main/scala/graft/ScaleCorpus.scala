package graft

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ~10x (sf1-equivalent) bench corpus, derived from the
  * read-only sf0.1 testdata by unioning [[Replicas]] id-remapped
  * replicas — the Scala counterpart of `tools/r11/derive.py` so that
  * [[Bench]] can self-provision the corpus at gate time instead of
  * depending on a /tmp directory surviving between sessions.
  *
  * WHY the official bench moved here (round-13 verdict item #1): at
  * sf0.1, 80+ of the 112 queries run under one second, where timer
  * jitter, JIT warm-up and hypervisor steal dominate — three straight
  * rounds spent adjudicating sub-second noise (q45/q96 in r12, q10 in
  * r13) while the 10x corpus is where plan-cost signal actually
  * exceeds shared-VM noise. Timings at this scale are graded against
  * the SCALED floor block in [[Bench.expectedScaled]].
  *
  * The id offsets preserve every modular contract the queries rely on
  * (mirroring derive.py — one source of truth per rule, restated here
  * because the Scala corpus is derived independently):
  *   - doc_id offset is a multiple of 20 (q49/q104/q108/q112's
  *     `doc_id % 20 == 0` benchmark slice keeps its 5% share per
  *     replica)
  *   - vec_id offset is even (q110's even/odd snapshot halves)
  *   - texts/embeddings/ts are NOT perturbed: replicas are exact
  *     content duplicates — precisely the duplication stress the
  *     dedup family must absorb via caps, not pair blowups
  *   - dimension tables copy through unchanged; fact foreign keys
  *     stay valid (cust/order keys shift consistently, so joins land
  *     inside each replica)
  *
  * Reuse is decided by a marker file carrying a fingerprint of the
  * SOURCE corpus (file sizes — the testdata is read-only, so size
  * identity is a faithful proxy) plus the derivation version: a
  * half-written corpus (crash mid-derive) never carries a valid
  * marker because the marker is deleted first and rewritten last.
  * All id columns are int64 in the source parquet, so `col + lit`
  * with Long offsets preserves the schema exactly.
  */
object ScaleCorpus {

  /** Bump when the derivation rules change: a stale corpus then fails
    * the marker check and re-derives, instead of silently timing a
    * different dataset than the floors were evidenced on.
    */
  val Version = "graft-scale-v1"

  val Replicas = 10

  /** Dimension tables: copied through unchanged. */
  val CopyTables: Seq[String] = Seq("region", "nation", "part", "supplier")

  /** Fact tables with their per-replica id offsets (offset k uses
    * `+ offset * k`). Offsets sit above each sf0.1 max key; see the
    * object doc for the modular contracts they preserve.
    */
  val Remap: Seq[(String, Seq[(String, Long)])] = Seq(
    "documents"  -> Seq("doc_id" -> 5000L),
    "embeddings" -> Seq("vec_id" -> 2000L),
    "events"     -> Seq("event_id" -> 100000L, "user_id" -> 1500L),
    "orders"     -> Seq("o_orderkey" -> 150000L, "o_custkey" -> 15000L),
    "lineitem"   -> Seq("l_orderkey" -> 150000L),
    "customer"   -> Seq("c_custkey" -> 15000L))

  def tables: Seq[String] = CopyTables ++ Remap.map(_._1)

  /** Where the derived corpus lives. The basename ("graft_sf1d") is
    * ALSO the discriminator `tools/floors.py` uses to route a gate
    * artifact's times into the scaled floor block — override the dir
    * only with a path that keeps the basename, or floors stop
    * regenerating from the artifacts produced there.
    */
  def defaultDir: String =
    sys.env.getOrElse("SPARK_GRAFT_SCALED_DIR", "/tmp/graft_sf1d")

  private def marker(outDir: String) = Paths.get(outDir, "_GRAFT_SCALE_OK")

  /** Source-corpus identity: derivation version, replica count, and
    * each source table's file size. Pure file metadata — the readiness
    * check must not need a Spark job.
    */
  def fingerprint(srcDir: String): String = {
    val sizes = tables.map { t =>
      s"$t:${new File(srcDir, s"$t.parquet").length}"
    }
    (s"$Version x$Replicas" +: sizes).mkString("\n")
  }

  /** Is a previously-derived corpus at `outDir` current for `srcDir`?
    * True iff the marker matches the fingerprint and every table path
    * still exists (a deleted table dir with a surviving marker must
    * not pass).
    */
  def ready(srcDir: String, outDir: String): Boolean =
    try {
      Files.exists(marker(outDir)) &&
        new String(Files.readAllBytes(marker(outDir)), StandardCharsets.UTF_8) ==
          fingerprint(srcDir) &&
        tables.forall(t => new File(outDir, s"$t.parquet").exists())
    } catch { case _: Throwable => false }

  private def replicate(df: DataFrame, shifts: Seq[(String, Long)]): DataFrame =
    (0 until Replicas).map { k =>
      shifts.foldLeft(df) { case (d, (c, off)) =>
        d.withColumn(c, col(c) + lit(off * k))
      }
    }.reduce(_.unionByName(_))

  /** Derive the corpus (overwriting any stale tables) and stamp the
    * marker. Marker ordering is the crash-safety: deleted before the
    * first write, created after the last.
    */
  def derive(spark: SparkSession, srcDir: String, outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    Files.deleteIfExists(marker(outDir))
    for (t <- CopyTables)
      spark.read.parquet(s"$srcDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    for ((t, shifts) <- Remap)
      replicate(spark.read.parquet(s"$srcDir/$t.parquet"), shifts)
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    Files.write(marker(outDir),
      fingerprint(srcDir).getBytes(StandardCharsets.UTF_8))
  }

  /** Reuse the corpus when current, derive it otherwise. Returns true
    * when the corpus was reused, false when it was (re)derived — the
    * caller logs which, so a gate artifact's stderr records whether
    * derivation time preceded the sweep.
    */
  def ensure(spark: SparkSession, srcDir: String, outDir: String): Boolean = {
    val reused = ready(srcDir, outDir)
    if (!reused) derive(spark, srcDir, outDir)
    reused
  }

  /** Manual CLI: `sbt "runMain graft.ScaleCorpus [srcDir] [outDir]"`. */
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else defaultDir
    val spark = Sessions.tune(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reused = ensure(spark, srcDir, outDir)
    println(s"[scale-corpus] ${if (reused) "reused" else "derived"} $outDir from $srcDir")
    spark.stop()
  }
}
