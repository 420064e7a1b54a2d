package graft.ops

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class MaterializeSpec extends SparkSpec {

  test("default mode local-checkpoints: correct results, no checkpoint dir needed") {
    val s = spark
    import s.implicits._
    val df = Materialize((1 to 100).toDF("x"))
    assert(df.count() === 100)
    assert(df.agg(org.apache.spark.sql.functions.sum("x")).head().getLong(0) === 5050L)
  }

  test("reliable flag writes through the SparkContext checkpoint dir") {
    val dir = Files.createTempDirectory("graft_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    spark.conf.set(Materialize.ReliableFlag, "true")
    try {
      val s = spark
      import s.implicits._
      val df = Materialize((1 to 50).toDF("x"))
      assert(df.count() === 50)
      // reliable checkpoint materializes RDD part-files under the dir on
      // the first action (lazy mode: at job end, not at plan build)
      val walk = Files.walk(Paths.get(dir))
      val hasData =
        try {
          import scala.jdk.CollectionConverters._
          walk.iterator().asScala.exists(p =>
            Files.isRegularFile(p) && p.getFileName.toString.startsWith("part-"))
        } finally walk.close()
      assert(hasData, s"no checkpoint part-files under $dir")
    } finally spark.conf.unset(Materialize.ReliableFlag)
  }
}
