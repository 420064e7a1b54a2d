ThisBuild / scalaVersion := "2.13.17"
// THE version: flows into the jar manifest (Implementation-Version,
// which `graft.Main --version` reads) and down to tests as
// -Dgraft.version; CHANGELOG.md documents each release. Never hard-code
// it anywhere else — MainSpec/PackagedJarSpec assert the three surfaces
// agree.
ThisBuild / version := "0.21.0"
name := "hbasepacketinspectorspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked `run` output goes straight to stdout (no sbt [info] prefix):
// the driver parses Bench's single JSON line from stdout — two rounds of
// BENCH_r{N}.json "parsed": null came from the logger prefix.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Test / outputStrategy := Some(OutputStrategy.StdoutOutput)
// No "[success] Total time: ..." trailer after runMain: the driver keeps
// only the last 2000 chars of stdout when parsing Bench's JSON line, so
// every trailing byte sbt emits eats into that window.
Global / showSuccess := false
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// The packaged-jar CLI smoke (PackagedJarSpec) launches `java -cp
// <jar>:/opt/spark/jars/*` as a child process: build the jar before any
// test forks, tell the spec where it landed, and hand it the module
// options above (one source of truth — the spec must not copy the list).
Test / javaOptions += s"-Dgraft.packagedJar=${(Compile / packageBin).value.getAbsolutePath}"
Test / javaOptions += s"-Dgraft.addOpens=${jdk17AddOpens.mkString(",")}"
// the Spark jars location, from the same key the build resolves them
// with (one source of truth — the spec must not hard-code /opt/spark/jars)
Test / javaOptions += s"-Dgraft.sparkJars=${unmanagedBase.value.getAbsolutePath}"
// the build version, for asserting `--version` output matches
Test / javaOptions += s"-Dgraft.version=${version.value}"
// `sbt runMain` launches from class directories (no jar manifest), so
// Main.version needs the same system-property fallback there — without
// it the README-advertised `sbt "runMain graft.Main --version"` prints
// "graft unknown" (round-13 advice)
run / javaOptions += s"-Dgraft.version=${version.value}"
