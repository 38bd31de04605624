ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rustnearindexerspark"
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
// Fast gate while iterating: everything except the randomized soak /
// replay-storm tests (tagged graft.Slow). CI cadence runs the full
// `test`; `quick` exists so the edit loop stays under ~5 min.
addCommandAlias("quick", "testOnly * -- -l graft.Slow")
// Forked run output goes straight to stdout WITHOUT sbt's "[info] "
// prefix — the driver parses Bench's single JSON line from stdout and
// a prefixed line is unparseable (BENCH_r02.json "parsed": null).
Compile / run / outputStrategy := Some(sbt.OutputStrategy.StdoutOutput)
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
// Parallel forked test groups (r18, VERDICT r17 #1: the 28.5-min
// sequential suite ate the driver's verify window). Suites are
// bin-packed by measured wall (see OPTIMIZATION_r18.md §1d) into three
// groups that run as CONCURRENT forked JVMs — full isolation (own
// SparkSession, own warehouse dir), no shared mutable state, so no
// suite semantics change. Wall = the heaviest group (StreamingSpec,
// ~6.5 min of micro-batch orchestration) instead of the 17-min sum.
// SPARK_GRAFT_TEST_GROUPS=1 restores the single sequential JVM.
val testGroupOf: String => Int = {
  // group 2: the LLM/NEAR/pipeline mid-weights (~5.7 min together);
  // group 3: everything else (~4.5 min); group 1: StreamingSpec alone.
  val g2 = Set("graft.LlmOpsSpec", "graft.NearPipelineSpec",
    "graft.Round12Spec", "graft.Round13Spec", "graft.Round14Spec")
  name =>
    if (name == "graft.StreamingSpec") 1
    else if (g2(name)) 2
    else 3
}
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val nGroups = sys.env.getOrElse("SPARK_GRAFT_TEST_GROUPS", "3").toInt
  if (nGroups <= 1)
    Seq(Tests.Group("all", tests, Tests.SubProcess(
      ForkOptions().withRunJVMOptions(opts))))
  else
    tests.groupBy(t => testGroupOf(t.name)).toSeq.sortBy(_._1).map {
      case (g, ts) =>
        Tests.Group(s"g$g", ts, Tests.SubProcess(ForkOptions()
          // distinct warehouse per JVM: PlanAuditSpec asserts the
          // warehouse holds no graft_bkt_* residue — a sibling group
          // materializing a bucketed table concurrently in a SHARED
          // warehouse would flake it
          .withRunJVMOptions(opts ++ Vector(
            s"-Dspark.sql.warehouse.dir=${
              java.nio.file.Files.createTempDirectory(s"graft_test_wh_g$g")}"
          ))))
    }
}
// let the three forked groups actually run concurrently
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 3),
  Tags.limitAll(16),
)
