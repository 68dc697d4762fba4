ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etheventtrackerspark"
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
// VERDICT r12 #2 (bench reporting contract): the driver invokes
// `sbt "runMain graft.Bench"` and parses stdout for the one-line JSON;
// sbt's default LoggedOutput strategy prefixes every forked-process line
// with "[info] ", which made the line unparseable in every round's BENCH
// artifact (parsed: null → empty PERF per_query). StdoutOutput passes the
// forked JVM's stdout through UNDECORATED, and showSuccess drops the
// trailing "[success] Total time" banner, so the JSON is the final bare
// stdout line. Timing methodology is untouched.
outputStrategy := Some(StdoutOutput)
showSuccess := false
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
  // local[32] puts 32 executor threads in ONE JVM: an 8g heap made mid-run
  // GC pauses land on whichever query was executing (driver bench showed
  // 3-12x inflation on random queries vs isolated runs). The box has
  // 128 GiB; give the fork enough headroom that shuffles never thrash.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
)
