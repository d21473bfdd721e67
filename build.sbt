ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gtecetlspark"
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
// Forked run output goes to stdout UN-DECORATED (no [info] prefix):
// the bench driver tail-parses the one JSON result line Bench prints,
// and sbt's default LoggedOutput strategy wraps it beyond recognition
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// One forked JVM per suite, several at once: the suites are mutually
// independent (each JVM gets its own SparkSession, temp dirs, and Caches
// registry — the cross-suite Caches.release() races a shared-JVM parallel
// run would hit cannot occur), so ~16 sequential suite-minutes collapse
// to the longest few. Heaviest suites are scheduled first so they don't
// straggle at the tail. 8 groups × local[4] sessions = the 32 cores.
Test / testGrouping := {
  // each group's JVM sees 4 processors: without the cap every forked JVM
  // sizes its GC and thread pools for all 32 cores, and 8 concurrent
  // JVMs × 32-thread pools thrash each other (measured ~6× per-suite
  // inflation); the test sessions are local[4] anyway
  val opts = ForkOptions().withRunJVMOptions((Test / javaOptions).value.toVector
    ++ Seq("-XX:ActiveProcessorCount=4"))
  val heavy = Seq("PlanAuditSpec", "ExtensionOpsSpec", "TopmedPipelineSpec",
    "SinksSpec", "StreamingRetentionSpec", "StreamingAsofSpec", "ScaleGenSpec",
    "StreamingMultimodalSpec").zipWithIndex.toMap
  (Test / definedTests).value
    .sortBy(t => heavy.collectFirst { case (n, i) if t.name.endsWith(n) => i }
      .getOrElse(99))
    .map(t => Tests.Group(t.name, Seq(t), Tests.SubProcess(opts)))
}
// REPLACE the default restrictions: sbt ships Tags.limit(ForkedTestGroup, 1)
// by default, and appending a larger limit would not loosen it (the most
// restrictive tag rule wins)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 8),
  Tags.limitAll(12))
