package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ingest.RawLoader
import graft.models.Warehouse
import graft.quality.{DbtStyleTests, DqChecks}
import graft.streaming.EventStreamIngest

/**
 * The staged batch driver mirroring the reference's hourly Airflow DAG
 * (`airflow/dags/logistics_dag.py:99`):
 *
 *   stream_to_minio >> load_to_duckdb >> run_dq_checks >> dbt_run >>
 *   dbt_test >> log_success
 *
 * Stage boundaries collapse into one Spark driver: the stream drain is an
 * AvailableNow streaming query, load/DQ/model/test are batch jobs, and the
 * DQ gate is a thrown `DqGateFailure` (the analogue of `sys.exit(1)`).
 */
object Pipeline {

  final case class RunResult(
      newRawRows: Long,
      dqResults: Seq[DqChecks.CheckResult],
      warehouse: Warehouse,
      testResults: Seq[DbtStyleTests.TestResult]) {
    def testsPassed: Boolean = testResults.forall(_.passed)
  }

  /**
   * One full pipeline run against a file landing zone.
   *
   * @param landingDir  where producer parquet batches arrive
   * @param bronzeDir   checkpointed streaming sink (partitioned by ingest date)
   * @param rawTableDir the accumulating raw_logistics parquet table
   */
  def run(spark: SparkSession, landingDir: String, bronzeDir: String,
          checkpointDir: String, rawTableDir: String): RunResult = {

    // 1. stream_to_minio: drain everything pending from the landing zone
    val q = EventStreamIngest.bronzeSink(
      EventStreamIngest.fromFiles(spark, landingDir), bronzeDir, checkpointDir)
    q.awaitTermination(600000)

    // 2. load_to_duckdb: incremental anti-join append into raw_logistics
    // (partition discovery on the bronze root; partition columns are pruned
    // by the explicit 11-column read schema)
    val newRows = RawLoader.load(spark, bronzeDir, rawTableDir)

    // 3. run_dq_checks: the 7-check gate (throws DqGateFailure on ERROR)
    val raw = spark.read.schema(graft.model.LogisticsEvent.rawSchema)
      .parquet(rawTableDir)
    val dq = DqChecks.runAll(raw)

    // 4. dbt_run: (re)define the model DAG — lazy views, nothing computes yet
    val w = Warehouse.fromRaw(raw, cacheShared = true)
    w.registerViews()

    // 5. dbt_test: schema assertions over the built models
    val tests = DbtStyleTests.suite(w)

    RunResult(newRows, dq, w, tests)
  }

  /** Serving entry (§3.3): the registered views answer ad-hoc SQL. */
  def query(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)
}
