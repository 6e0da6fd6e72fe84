ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "syntheaetlspark"
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
  // 16g default: the full bench runs 123 queries in one JVM and its RSS
  // crosses 7.5g — at 8g the tail rows stall in GC (measured: rows at
  // ~3% busy on an idle host, e.g. q228 1.1s -> 7.4s run-to-run). Any
  // real deployment sizes the driver heap the same way.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // The 123-query bench compiles ~240 generated-code plans; at the JDK
  // default 240m code cache the JIT hits the ceiling mid-run and the
  // codegen/regex-heavy rows drop to interpreted speed (the q93-block
  // transient BASELINE.md reproduced with -XX:ReservedCodeCacheSize=32m:
  // 4-14x on exactly those rows). Size the cache so steady-state query
  // code stays compiled — same flag any long-lived Spark driver ships.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // extra flags for perf experiments (e.g. constrained code cache to
  // reproduce JIT-deopt signatures) — empty in normal runs
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty).toSeq)
