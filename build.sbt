ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlsuitespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Project-level so it reaches runMain too: `run / fork` alone does NOT —
// task-axis delegation never falls through runMain → run, so for 11 rounds
// every `sbt "runMain graft.{Verify,Bench,ScaleSmoke}"` silently ran
// IN-PROCESS in the sbt launcher JVM (SBT_OPTS -Xmx4g) and the javaOptions
// below (add-opens, SPARK_DRIVER_MEM heap) were dead config. A 4 g heap
// under local[32] explains both the historical bench spread (full-GC
// pauses read as "VM stall spikes") and heavy probe legs dying at 32×.
fork := true
Test / fork := true
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
// Keep `sbt "runMain graft.Bench"` stdout machine-parseable: sbt's closing
// "[success] Total time: ..." line lands AFTER Bench's JSON line, so any
// parser that reads the last line of the run's output tail got sbt noise
// instead of the record (BENCH_r01..r14 all show "parsed": null for
// exactly this reason). With showSuccess off, the last stdout line is
// whatever the forked main printed last; StdoutOutput forwards the forked
// JVM's stdout verbatim (no "[info] " logger prefix in front of the JSON).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess // read by the command engine, not a task
outputStrategy := Some(OutputStrategy.StdoutOutput)
