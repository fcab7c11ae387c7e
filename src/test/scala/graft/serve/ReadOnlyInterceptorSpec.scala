package graft.serve

import org.apache.spark.connect.proto
import org.scalatest.funsuite.AnyFunSuite

/**
 * Pure classification tests for the wire-level read-only guard: constructed
 * request protos, no endpoint. The wire-driven end-to-end denials live in
 * [[ConnectServeSpec]]; this spec pins the default-deny POLICY — including
 * surfaces a JDBC client can't emit (register-function commands, nested
 * catalog relations, compressed plans) — so a policy regression fails fast
 * without gRPC in the loop.
 */
class ReadOnlyInterceptorSpec extends AnyFunSuite {

  private def execOf(plan: proto.Plan): proto.ExecutePlanRequest =
    proto.ExecutePlanRequest.newBuilder().setPlan(plan).build()

  private def catalogPlan(cat: proto.Catalog.Builder): proto.Plan =
    proto.Plan.newBuilder().setRoot(
      proto.Relation.newBuilder().setCatalog(cat)).build()

  private def v(req: Any): Option[String] = ReadOnlyInterceptor.violation(req)

  test("mutating catalog RPCs are denied; read-only ones pass") {
    val drop = catalogPlan(proto.Catalog.newBuilder()
      .setDropGlobalTempView(proto.DropGlobalTempView.newBuilder()
        .setViewName("dash_dq_issues")))
    assert(v(execOf(drop)).exists(_.contains("DROP_GLOBAL_TEMP_VIEW")))

    val cache = catalogPlan(proto.Catalog.newBuilder()
      .setCacheTable(proto.CacheTable.newBuilder().setTableName("t")))
    assert(v(execOf(cache)).exists(_.contains("CACHE_TABLE")))

    val clear = catalogPlan(proto.Catalog.newBuilder()
      .setClearCache(proto.ClearCache.newBuilder()))
    assert(v(execOf(clear)).exists(_.contains("CLEAR_CACHE")))

    val list = catalogPlan(proto.Catalog.newBuilder()
      .setListTables(proto.ListTables.newBuilder()))
    assert(v(execOf(list)).isEmpty)

    // an unset catalog oneof is an unknown future case: fail closed
    val unset = catalogPlan(proto.Catalog.newBuilder())
    assert(v(execOf(unset)).nonEmpty)
  }

  test("a mutating catalog relation NESTED inside a plan tree is still caught") {
    // spark.catalog.listTables() is a DataFrame — catalog relations compose;
    // the planner executes them during transformation, so a mutation hidden
    // under a Filter must be denied by the recursive scan
    val nested = proto.Plan.newBuilder().setRoot(
      proto.Relation.newBuilder().setFilter(
        proto.Filter.newBuilder().setInput(
          proto.Relation.newBuilder().setCatalog(
            proto.Catalog.newBuilder().setDropGlobalTempView(
              proto.DropGlobalTempView.newBuilder().setViewName("x")))))).build()
    assert(v(execOf(nested)).exists(_.contains("DROP_GLOBAL_TEMP_VIEW")))

    val nestedRead = proto.Plan.newBuilder().setRoot(
      proto.Relation.newBuilder().setFilter(
        proto.Filter.newBuilder().setInput(
          proto.Relation.newBuilder().setCatalog(
            proto.Catalog.newBuilder().setListTables(
              proto.ListTables.newBuilder()))))).build()
    assert(v(execOf(nestedRead)).isEmpty)
  }

  test("command protos default-deny off the allowlist") {
    def cmdPlan(c: proto.Command.Builder): proto.Plan =
      proto.Plan.newBuilder().setCommand(c).build()

    // client code upload: UDF registration never builds a plan — denied here
    val reg = cmdPlan(proto.Command.newBuilder().setRegisterFunction(
      proto.CommonInlineUserDefinedFunction.newBuilder()
        .setFunctionName("evil")))
    assert(v(execOf(reg)).exists(_.contains("REGISTER_FUNCTION")))

    // streaming start: denied at the wire on top of the analyzer's
    // WriteToStream denial (defense in depth)
    val stream = cmdPlan(proto.Command.newBuilder()
      .setWriteStreamOperationStart(
        proto.WriteStreamOperationStart.newBuilder()))
    assert(v(execOf(stream)).exists(_.contains("WRITE_STREAM_OPERATION_START")))

    // SQL commands pass through — the analyzer rule enforces them per-plan
    // (SELECT and INSERT both arrive this way; only the analyzer can tell)
    val sql = cmdPlan(proto.Command.newBuilder().setSqlCommand(
      proto.SqlCommand.newBuilder()))
    assert(v(execOf(sql)).isEmpty)
  }

  test("persist/unpersist analyze RPCs are denied (allowlist, not blocklist); " +
      "schema analysis passes") {
    // analyze RPCs are default-deny like commands and catalog protos: the
    // allowlist names the read-only cases, so PERSIST/UNPERSIST (which
    // mutate the context-SHARED CacheManager) — and any FUTURE mutating
    // analyze case a Spark upgrade adds — fail closed
    val persist = proto.AnalyzePlanRequest.newBuilder()
      .setPersist(proto.AnalyzePlanRequest.Persist.newBuilder()
        .setRelation(proto.Relation.newBuilder().setSql(
          proto.SQL.newBuilder().setQuery("SELECT 1"))))
      .build()
    assert(v(persist).exists(_.contains("not available")))
    val unpersist = proto.AnalyzePlanRequest.newBuilder()
      .setUnpersist(proto.AnalyzePlanRequest.Unpersist.newBuilder()
        .setRelation(proto.Relation.newBuilder().setSql(
          proto.SQL.newBuilder().setQuery("SELECT 1"))))
      .build()
    assert(v(unpersist).exists(_.contains("not available")))

    val schema = proto.AnalyzePlanRequest.newBuilder()
      .setSchema(proto.AnalyzePlanRequest.Schema.newBuilder()
        .setPlan(proto.Plan.newBuilder().setRoot(
          proto.Relation.newBuilder().setSql(
            proto.SQL.newBuilder().setQuery("SELECT 1")))))
      .build()
    assert(v(schema).isEmpty)

    // schema analysis of a plan containing a catalog mutation still executes
    // the mutation during transformation — the recursive scan must reach it
    val schemaDrop = proto.AnalyzePlanRequest.newBuilder()
      .setSchema(proto.AnalyzePlanRequest.Schema.newBuilder()
        .setPlan(catalogPlan(proto.Catalog.newBuilder()
          .setDropGlobalTempView(proto.DropGlobalTempView.newBuilder()
            .setViewName("x")))))
      .build()
    assert(v(schemaDrop).exists(_.contains("DROP_GLOBAL_TEMP_VIEW")))
  }

  test("compressed plans are uninspectable and fail closed — top-level AND nested in analyze") {
    val compressed = proto.Plan.newBuilder().setCompressedOperation(
      proto.Plan.CompressedOperation.newBuilder()).build()
    assert(v(execOf(compressed)).exists(_.contains("compressed")))
    // a compressed plan inside AnalyzePlan.Schema would be decompressed and
    // TRANSFORMED (executing any catalog op) before any guard ran — the
    // recursive scan must catch it where a top-level hasCompressedOperation
    // check cannot
    val nested = proto.AnalyzePlanRequest.newBuilder()
      .setSchema(proto.AnalyzePlanRequest.Schema.newBuilder()
        .setPlan(compressed))
      .build()
    assert(v(nested).exists(_.contains("compressed")))
  }

  test("inline UDF expressions are client code and fail closed") {
    // `SELECT my_udf(x)` from a client-jvm/PySpark Connect session arrives
    // as a CommonInlineUserDefinedFunction EXPRESSION carrying a serialized
    // closure / pickled function — executable upload inside a plain query,
    // reachable without AddArtifacts for Python. Denied wherever it sits.
    val udfExpr = proto.Expression.newBuilder()
      .setCommonInlineUserDefinedFunction(
        proto.CommonInlineUserDefinedFunction.newBuilder()
          .setFunctionName("evil"))
    val plan = proto.Plan.newBuilder().setRoot(
      proto.Relation.newBuilder().setProject(
        proto.Project.newBuilder()
          .setInput(proto.Relation.newBuilder().setSql(
            proto.SQL.newBuilder().setQuery("SELECT 1 AS x")))
          .addExpressions(udfExpr))).build()
    assert(v(execOf(plan)).exists(_.contains("inline user-defined")))
    // …including under schema analysis, which also transforms the plan
    val analyzed = proto.AnalyzePlanRequest.newBuilder()
      .setSchema(proto.AnalyzePlanRequest.Schema.newBuilder().setPlan(plan))
      .build()
    assert(v(analyzed).exists(_.contains("inline user-defined")))
  }

  test("non-plan requests pass through untouched") {
    assert(v(proto.ConfigRequest.newBuilder().build()).isEmpty)
    assert(v("not a proto at all").isEmpty)
  }
}
