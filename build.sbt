ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "logistics_data_pipelinespark"
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

// ---- parallel test battery (r11) -------------------------------------
// One sequential forked JVM ran the 366-test battery in ~42 min of wall for
// ~13 min of attributed per-test time (NOTES_r10 §5) — the rest is
// suite-level scheduling/JIT/GC overhead that serializes behind a single
// JVM. Partition the suites into parallel forked GROUPS: each group is its
// own JVM with its own shared SparkSession (suites inside a group still run
// sequentially, so every shared-session invariant — plan pins, cache
// drains, ReadOnlyGuard arming, Connect service lifecycle — holds exactly
// as before). The only cross-JVM shared path, spark-warehouse/, is
// isolated per group via spark.sql.warehouse.dir. Suites with global-state
// affinity are pinned to one group (the serve trio shares the Connect
// service lifecycle; streaming suites are the heavy drives, spread across
// groups); the rest distribute by name hash.
// Proportional to the host: 4 Spark threads per group JVM, capped at 8
// groups (this box: 32 cores → 8). Merging groups on a smaller machine is
// always safe — suites within a group run sequentially — it only costs
// parallelism; a fixed 8 would commit up to 64 GB of heap ceilings and 32
// worker threads regardless of host size.
val testGroupCount = math.max(1,
  math.min(8, java.lang.Runtime.getRuntime.availableProcessors / 4))
val pinnedTestGroups: Map[String, Int] = Map(
  // the config-parity sweep is the single heaviest suite — own group
  "graft.coverage.AqeParitySpec" -> 0,
  // streaming drives (real micro-batch waits) spread over three groups
  "graft.streaming.StreamingDedupSpec" -> 1,
  "graft.streaming.EventStreamIngestSpec" -> 1,
  "graft.streaming.AdvancePropertySpec" -> 1,
  "graft.pipeline.PipelineSpec" -> 2,
  "graft.streaming.StatefulOpsSpec" -> 2,
  "graft.streaming.StatefulOpsV2Spec" -> 2,
  "graft.streaming.StreamingCurationSpec" -> 2,
  // serve trio: one JVM owns SparkConnectService + ReadOnlyGuard.enforcing
  "graft.serve.ConnectServeSpec" -> 3,
  "graft.serve.ReadOnlyGuardSpec" -> 3,
  "graft.serve.ReadOnlyInterceptorSpec" -> 3,
  "graft.PlanShapeSpec" -> 3,
  "graft.models.WarehouseReplaySpec" -> 3,
  // other heavy/iterative suites balanced over the remaining groups
  "graft.streaming.StreamJoinsSpec" -> 4,
  "graft.operators.HeavyHittersSpec" -> 4,
  "graft.operators.ConnectedComponentsSpec" -> 4,
  "graft.operators.DedupSkewSpec" -> 5,
  "graft.operators.SamplingSpec" -> 5,
  "graft.expressions.VectorExprCodegenSpec" -> 6,
  "graft.operators.SimilaritySearchSpec" -> 6,
  "graft.text.BpeTokenizerSpec" -> 7,
  "graft.operators.DedupSpec" -> 7,
)
Test / testGrouping := {
  // extend the task-scoped fork options (javaOptions, envVars, output
  // strategy, …) rather than building bare ForkOptions() — a bare one
  // silently drops any later `Test / envVars` / `javaHome` additions
  val baseFo = (Test / forkOptions).value
  val base = baseDirectory.value
  (Test / definedTests).value
    .groupBy(t => pinnedTestGroups.getOrElse(t.name,
      // unpinned suites hash over the non-pinned-heavy groups (4..7)
      4 + math.abs(t.name.hashCode % 4)) % testGroupCount)
    .toSeq.sortBy(_._1)
    .map { case (g, tests) =>
      Tests.Group(s"g$g", tests, Tests.SubProcess(
        baseFo
          .withWorkingDirectory(Some(base))
          .withRunJVMOptions(baseFo.runJVMOptions :+
            s"-Dspark.sql.warehouse.dir=${base / "target" / s"test-warehouse-g$g"}")))
    }
}
// sbt's default allows only ONE forked test group at a time; keep the
// default Clean exclusivity so `;clean ;test` can't race target/ deletion
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testGroupCount),
  Tags.limitAll(math.max(testGroupCount, 4)),
  Tags.exclusive(Tags.Clean))
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
// Test JVMs only — Verify/Bench keep engine defaults. Belt-and-braces for
// sessions a test builds outside SparkSuite (see SparkSuite's scaladoc for
// both measurements):
//  - local-FS checkpoint checksum sidecars fork a Hadoop Shell per stat;
//  - stateful-timeout no-data batches spin forever under AvailableNow.
Test / javaOptions ++= Seq(
  "-Dspark.sql.streaming.checkpoint.fileChecksum.enabled=false",
  "-Dspark.sql.streaming.noDataMicroBatches.enabled=false",
)
