ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlgammaspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Test-only, NOT a resolved dependency: the pre-warmed coursier cache
// happens to carry the DuckDB JDBC driver, which implements Postgres's
// INSERT ... ON CONFLICT syntax — the one statement of the Postgres
// fast path no embeddable engine here could execute (Derby has no
// upsert).  PgUpsertSpec runs the pinned SqlDialect.Postgres statement
// text against it for real; absent the jar the spec cancels, it never
// fails the build.
Test / unmanagedJars ++= {
  val cache = file(sys.props("user.home")) / ".cache" / "coursier"
  val found =
    if (cache.exists)
      (cache ** "duckdb_jdbc-*.jar").get.headOption
    else None
  found.map(Attributed.blank(_)).toSeq
}
Test / fork := true
run / fork := true
// Forked run output goes straight to stdout, NOT through sbt's logger:
// the driver parses Bench's one-line JSON from stdout, and the logger's
// "[info] " prefix breaks that parse (BENCH_r01/r02 both landed
// "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// The driver keeps only the LAST 2000 chars of stdout; sbt's trailing
// "[success] Total time: ..." line would eat ~80 of them and push the
// head of Bench's JSON line out of the window (BENCH_r05 landed
// "parsed": null with the JSON head-truncated at exactly that margin).
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
// Ad-hoc conf experiments against a FRESH forked JVM (SparkConf picks up
// -Dspark.* system properties), e.g.
//   SPARK_EXTRA_OPTS="-Dspark.sql.codegen.methodSplitThreshold=256" sbt "runMain ..."
javaOptions ++= sys.env.get("SPARK_EXTRA_OPTS").toSeq
  .flatMap(_.split("\\s+").filter(_.nonEmpty))
