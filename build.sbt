ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "spectrifyspark"
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
// Run the suite as PARALLEL forked JVM groups (r19; r18 verdict item 2:
// the serial suite outgrew the driver's window — 42m40s measured, r18's
// run was cut off mid-suite). Suites are packed into four groups by
// measured duration (longest-processing-time greedy; weights from the
// r19 timing run, default 10 s for new/unlisted suites), each group a
// forked JVM with its own SparkSession (4 cores each — the suites
// already ran local[4]) and its own temp warehouse dir (SparkSpec).
// Measured: 42m40s serial -> ~12-14m in 4 groups.
val suiteWeights: Map[String, Int] = Map(
  "QueryCatalogSpec" -> 650, "PlanAuditSpec" -> 392,
  "StreamingQueriesSpec" -> 258, "BandedExactParitySpec" -> 144,
  "ContainmentSpec" -> 140, "PrefixJaccardSpec" -> 97,
  "JoinViewCdcSpec" -> 89, "StarViewSpec" -> 78, "AggIndexSpec" -> 72,
  "IndexMaintenanceSpec" -> 68, "FastSsIndexSpec" -> 65,
  "JoinViewSpec" -> 61, "EntityBlockIndexSpec" -> 37, "Scd2DimSpec" -> 32,
  "ScaleTechniquesSpec" -> 32, "ConnectedComponentsSpec" -> 31,
  "IvfPqIndexSpec" -> 28, "MainSpec" -> 25, "AsofFloorSpec" -> 22,
  "SignatureIndexSpec" -> 21, "MinHashIndexSpec" -> 16,
  "SubstringIndexSpec" -> 16, "PqRetrainSpec" -> 15,
  "PassJoinIndexSpec" -> 15, "VecProbeBatchSpec" -> 14,
)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val fo = (Test / forkOptions).value
  val nGroups = 4
  def weight(t: sbt.TestDefinition): Int =
    suiteWeights.getOrElse(t.name.split('.').last, 10)
  val buckets = Array.fill(nGroups)(
    (scala.collection.mutable.ArrayBuffer.empty[sbt.TestDefinition], Array(0L)))
  for (t <- tests.sortBy(t => (-weight(t), t.name))) {
    val (buf, w) = buckets.minBy(_._2(0))
    buf += t; w(0) += weight(t)
  }
  buckets.toSeq.zipWithIndex.map { case ((buf, _), i) =>
    Tests.Group(s"g$i", buf.toSeq, Tests.SubProcess(fo))
  }
}
// allow the four groups to actually run concurrently
Global / concurrentRestrictions := Seq(Tags.limit(Tags.ForkedTestGroup, 4),
  Tags.limitAll(8))
// Pass the forked run's stdout/stderr through verbatim instead of
// re-logging each line with an "[info]"/"[error]" prefix: the bench
// driver parses the final one-line JSON from stdout, and the sbt
// prefix broke that parse every round since r15 (PERF per_query empty).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ... and keep it the LAST stdout line: sbt's closing "[success] Total
// time: ..." banner otherwise prints after the app exits.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
