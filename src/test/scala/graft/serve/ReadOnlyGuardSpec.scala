package graft.serve

import graft.SparkSuite
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode}
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.execution.command.DropTempViewCommand

/** A command class the allowlist has never heard of: must be denied. */
case class FakeWriteCommand() extends LeafNode with Command {
  override def output: Seq[Attribute] = Nil
}

/** Same simple name as Catalyst's streaming sink statement (which is not a
  * Command): pins the classifier's WriteToStream* prefix denial without
  * standing up a streaming query. */
case class WriteToStreamStatement() extends LeafNode {
  override def output: Seq[Attribute] = Nil
}

/**
 * Unit surface of the read-only serving guard: the pure plan classifier
 * ([[ReadOnlyGuard.violation]]) and the session-identity gates. The
 * end-to-end contract — a real Connect client's INSERT/CTAS/DROP rejected
 * over the wire while SELECT serves — lives in [[ConnectServeSpec]].
 */
class ReadOnlyGuardSpec extends SparkSuite {

  private val gdb = "global_temp"

  private def analyzedOf(sql: String) =
    spark.sql(sql).queryExecution.analyzed

  test("plain queries, including over published views, are allowed") {
    assert(ReadOnlyGuard.violation(
      analyzedOf("SELECT 1 AS x"), gdb).isEmpty)
    assert(ReadOnlyGuard.violation(
      analyzedOf("SELECT x, count(*) FROM VALUES (1),(1),(2) t(x) GROUP BY x"),
      gdb).isEmpty)
  }

  test("unknown commands fail CLOSED: default-deny, not default-allow") {
    val v = ReadOnlyGuard.violation(FakeWriteCommand(), gdb)
    assert(v.isDefined && v.get.contains("FakeWriteCommand"))
  }

  test("streaming sink statements are denied even though they are not Commands") {
    val v = ReadOnlyGuard.violation(WriteToStreamStatement(), gdb)
    assert(v.isDefined && v.get.contains("streaming"))
  }

  test("global-temp-view drop is denied; a session-local one is allowed") {
    val globalDrop = DropTempViewCommand(Identifier.of(Array(gdb), "served"))
    assert(ReadOnlyGuard.violation(globalDrop, gdb).exists(
      _.contains("unpublish")))
    // case must not matter: the analyzer may carry the db in either case
    val globalDropUpper = DropTempViewCommand(Identifier.of(Array("GLOBAL_TEMP"), "served"))
    assert(ReadOnlyGuard.violation(globalDropUpper, gdb).isDefined)
    val localDrop = DropTempViewCommand(Identifier.of(Array.empty[String], "mine"))
    assert(ReadOnlyGuard.violation(localDrop, gdb).isEmpty)
  }

  test("read-only metadata commands are allowed") {
    for (sql <- Seq(
      "EXPLAIN SELECT 1",
      "SHOW TABLES",
      "SHOW FUNCTIONS LIKE 'graft*'",
      "DESCRIBE QUERY SELECT 1 AS x",
      "SET spark.sql.shuffle.partitions=4",
      "RESET spark.sql.shuffle.partitions")) {
      assert(ReadOnlyGuard.violation(analyzedOf(sql), gdb).isEmpty,
        s"expected allowed: $sql")
    }
  }

  test("the engine session is capable (extension wired) but not Connect-managed") {
    spark.sql("SELECT 1").collect()
    assert(ReadOnlyGuard.isCapable(spark),
      "SparkSuite session must carry the injected check rule")
    assert(!ReadOnlyGuard.isConnectManaged(spark),
      "the engine session must never be classified as a client session")
  }

  test("an in-process newSession() clone is capable and unrestricted") {
    val clone = spark.newSession()
    clone.sql("SELECT 1").collect()
    assert(ReadOnlyGuard.isCapable(clone))
    assert(!ReadOnlyGuard.isConnectManaged(clone))
  }
}
