ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkstateproviderspark"
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
// Forked-run output goes straight to stdout (no "[info] " prefix) so the
// driver can parse the one-line JSON that Bench prints.
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// r19: the full suite (~96 SparkSession-bearing suites, 800+ tests) ran
// SEQUENTIALLY in one forked JVM and outgrew the driver's test budget
// (VERIFY_r18 tests_ok=false — the fork was SIGTERMed mid-suite, seen as
// ForgetSuite's context "stopped by SparkShutdownHookManager"). Split the
// suites round-robin (by sorted name, deterministic) across N forked JVMs
// that run CONCURRENTLY: each group keeps its own SparkContext exactly as
// before — no cross-suite session sharing is introduced, suites are
// byte-identical — and wall time divides by ~N on the 32-core box (suites
// run local[2..4] masters, so N=6 groups load ≤ ~24 cores). Sorted-name
// round-robin also interleaves the Streaming*/state heavy families across
// groups instead of stacking them in one.
val testForkGroups = 6
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  // per-group heap: the old SINGLE 8g JVM held every suite's peak at
  // once; a group holds ~1/6 of the suites, and 4g leaves 6×4g = 24g max
  // heap — comfortable in the 128 GiB sandbox even all-peaking at once.
  val opts = (Test / javaOptions).value.toVector :+ "-Xmx4g"
  tests.zipWithIndex
    .groupBy(_._2 % testForkGroups).toSeq.sortBy(_._1)
    .map { case (i, group) =>
      Tests.Group(s"fork$i", group.map(_._1),
        Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testForkGroups),
  Tags.limitAll(16))
