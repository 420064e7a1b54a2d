package graft

import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for the DISTRIBUTABLE artifact (round-11 verdict item #6): the
  * `sbt package` jar plus the stock Spark jars must be a complete,
  * launchable deployment — `java -cp` with just the jar and the Spark
  * jars dir — with none of sbt's classpath assembling it silently. MainSpec
  * drives the CLI logic in-process; this proves the packaging: every
  * class the entry point needs is IN the jar, and the documented JDK-17
  * module options are sufficient outside spark-submit.
  */
class PackagedJarSpec extends AnyFunSuite {

  // keep in sync with build.sbt's jdk17AddOpens (the README documents
  // the same list for standalone deployment)
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  test("the sbt-package jar serves graft.Main on a bare java classpath") {
    val jar = sys.props.get("graft.packagedJar")
      .getOrElse(fail("build.sbt must pass -Dgraft.packagedJar to test JVMs"))
    assert(new java.io.File(jar).isFile, s"packaged jar missing at $jar")
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cmd: Seq[String] = Seq(javaBin) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Xmx2g",
      "-cp", s"$jar:/opt/spark/jars/*", "graft.Main", "-h")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
    pb.environment().put("SPARK_MASTER", "local[2]")
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    assert(p.waitFor(120, TimeUnit.SECONDS), s"jar CLI hung; output:\n$out")
    assert(p.exitValue() === 0, s"jar CLI exited ${p.exitValue()}:\n$out")
    assert(out.contains("usage: graft.Main"),
      s"expected the usage banner, got:\n$out")
  }
}
