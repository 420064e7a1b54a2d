package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev probe (test sourceset) for the pairStats carry-sizes question
  * (r21 "Not yet optimized" item 1 / r22 verdict item 6): on a
  * duplicate-heavy corpus, does the distinct-pair frame outgrow the
  * df-capped posting frame enough that carrying per-doc sizes THROUGH
  * the pair expansion (removing the two pair-frame joins, adding two
  * posting-scale exchanges) would win?
  *
  * Builds high-duplication corpora (every doc replicated k times with
  * fresh ids — all copies share all grams, the worst case for the pair
  * joins), measures the two frame sizes the trade depends on, and times
  * the current q33 shape:
  *
  *   P  = kept posting rows (Σ|ids| over df-capped groups) — the rows
  *        TWO extra exchanges would carry in the carry-sizes shape;
  *   PR = distinct pair rows — the rows the TWO joins shuffle today.
  *
  * The carry-sizes trade flips positive roughly when PR > P.
  *
  *   sbt "Test/runMain graft.ops.R22DupProbe /root/testdata/sf0.1 20,50,100"
  */
object R22DupProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ks = args.lift(1).map(_.split(',').map(_.toInt).toSeq)
      .getOrElse(Seq(20, 50, 100))
    val baseDocs = 2000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (k <- ks) {
      val dir = s"/tmp/graft_hidup$k"
      if (!Files.exists(Paths.get(dir, "documents.parquet"))) {
        val base = Tables.documents(spark, srcDir)
          .filter(col("text").isNotNull).limit(baseDocs)
          .select(col("doc_id"), col("text"), col("lang"), col("source"),
            col("n_chars"))
        val reps = spark.range(k).select(col("id").as("rep"))
        base.crossJoin(reps)
          .select((col("doc_id") * k + col("rep")).as("doc_id"), col("text"),
            col("lang"), col("source"), col("n_chars"))
          .coalesce(4).write.mode("overwrite")
          .parquet(s"$dir/documents.parquet")
      }
      val docs = Tables.documents(spark, dir)
      // replicate pairStats' capped posting construction to expose the
      // two frame sizes (same DfCap=50 spelling as Dedup.pairStats)
      val inv = Dedup.gramsOf(docs)
      val grouped = inv.groupBy(col("g"))
        .agg(graft.functions.CappedCollectSetLong(col("doc_id"), 50).as("ids"))
        .filter(size(col("ids")).between(2, 50))
      val stats = grouped.agg(
        count(lit(1)).as("groups"),
        sum(size(col("ids"))).as("postings")).collect()(0)
      val pairsOf = flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + 2, size(col("ids"))),
          y => struct(x.as("a"), y.as("b")))))
      val pr = grouped.select(explode(pairsOf).as("p"))
        .groupBy(col("p.a"), col("p.b")).agg(count(lit(1)))
        .count()
      println(s"[dupprobe] k=$k docs=${baseDocs * k} groups=${stats.getLong(0)} " +
        s"postings(P)=${stats.getLong(1)} distinctPairs(PR)=$pr " +
        f"PR/P=${pr.toDouble / stats.getLong(1)}%.2f")
      // time the current q33 shape, 3 reps
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        Dedup.jaccardPairs(docs).write.format("noop").mode("overwrite").save()
        println(f"[dupprobe] k=$k q33 rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
