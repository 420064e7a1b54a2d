package graft

import java.util.concurrent.TimeUnit

import org.scalatest.funsuite.AnyFunSuite

/** Smoke for the DISTRIBUTABLE artifact (round-11 verdict item #6): the
  * `sbt package` jar plus the stock Spark jars must be a complete,
  * launchable deployment — `java -cp` with just the jar and the Spark
  * jars dir — with none of sbt's classpath assembling it silently.
  * MainSpec drives the CLI logic in-process; this proves the packaging:
  * every class the entry point needs is IN the jar, and the documented
  * JDK-17 module options are sufficient outside spark-submit.
  */
class PackagedJarSpec extends AnyFunSuite {

  test("the sbt-package jar serves graft.Main on a bare java classpath") {
    val jar = sys.props.get("graft.packagedJar")
      .getOrElse(fail("build.sbt must pass -Dgraft.packagedJar to test JVMs"))
    assert(new java.io.File(jar).isFile, s"packaged jar missing at $jar")
    // the exact jdk17AddOpens list from build.sbt (single source of
    // truth; the build passes it down, this spec never copies it)
    val addOpens = sys.props.get("graft.addOpens")
      .getOrElse(fail("build.sbt must pass -Dgraft.addOpens to test JVMs"))
      .split(',').toSeq
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cmd: Seq[String] = Seq(javaBin) ++ addOpens ++ Seq(
      "-Dspark.ui.enabled=false", "-Xmx2g",
      "-cp", s"$jar:/opt/spark/jars/*", "graft.Main", "-h")
    // output to a file, NOT a pipe read before waitFor: a child hung in
    // session init with stdout open would block an eager readAllBytes
    // forever and the timeout below could never fire
    val outFile = java.nio.file.Files.createTempFile("graft_jar_smoke", ".out")
    val pb = new ProcessBuilder(cmd: _*).redirectErrorStream(true)
      .redirectOutput(outFile.toFile)
    pb.environment().put("SPARK_MASTER", "local[2]")
    val p = pb.start()
    val finished = p.waitFor(120, TimeUnit.SECONDS)
    if (!finished) p.destroyForcibly().waitFor(10, TimeUnit.SECONDS)
    val out = java.nio.file.Files.readString(outFile)
    assert(finished, s"jar CLI hung (killed); output so far:\n$out")
    assert(p.exitValue() === 0, s"jar CLI exited ${p.exitValue()}:\n$out")
    assert(out.contains("usage: graft.Main"),
      s"expected the usage banner, got:\n$out")
  }
}
