ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "opcua_ingestion_enginespark"
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
// The bench/verify contract parses a raw JSON line from stdout; sbt's
// default logger prefixes forked output with "[info] ", which breaks that.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// local-cluster[...] (ClusterParity's real-executor-JVM mode) spawns
// CoarseGrainedExecutorBackend processes through the launcher's
// AbstractCommandBuilder, which insists on resolving a Spark home +
// scala version even though the full classpath is already shipped via
// spark.executor.extraClassPath. Point it at the image's Spark dist.
run / envVars ++= Map("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13")
Test / envVars ++= Map("SPARK_HOME" -> "/opt/spark", "SPARK_SCALA_VERSION" -> "2.13")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Pin the JVM default locale: UTF8String.toLowerCase's non-ASCII slow
  // path delegates to String.toLowerCase() under the DEFAULT locale, and
  // the TextKernel natives' probed-identical claim (TextFeaturesExpr)
  // mirrors that with Locale.ROOT — identical except under tr/az/lt
  // defaults (dotless-i rules). Pinning en-US keeps kernel and built-in
  // byte-identical regardless of the host image's locale (r12 ADVICE).
  "-Duser.language=en", "-Duser.country=US",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
