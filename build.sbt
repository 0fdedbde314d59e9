ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "overturelinkdatapipelinespark"
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
// The round driver parses the LAST stdout line of `sbt "runMain ..."`
// as the bench totals JSON. Two sbt behaviors break that: (a) forked
// run output is re-logged with an "[info] " prefix, (b) sbt prints a
// "[success] Total time..." trailer AFTER the program's last line.
// Inherit the child's stdio directly and drop the success trailer so
// the program's own final println IS the final stdout line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not another setting;
// exclude it from the unused-key lint so `compile` output stays clean.
Global / excludeLintKeys += showSuccess
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
  // r13: one JVM JIT-compiles ~385 distinct codegen-heavy queries per
  // sweep; the JDK-17 default ReservedCodeCacheSize (240 MB) forces
  // code-cache sweeps that deoptimize hot loops mid-run (measured as
  // 4-10x per-query swings between sweeps on the media/codec rows).
  // 512 MB holds the whole sweep's compiled code.
  "-XX:ReservedCodeCacheSize=512m",
  // Ad-hoc profiling passthrough (JFR etc.). Whitespace-split: option
  // values containing spaces cannot be expressed — acceptable for a
  // dev knob (r14, ADVICE).
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.trim.split("\\s+"))
