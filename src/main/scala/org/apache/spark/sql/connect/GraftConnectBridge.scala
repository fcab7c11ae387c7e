package org.apache.spark.sql.connect

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connect.service.SparkConnectService

/**
 * Package bridge (same justified pattern as `org.apache.spark.sql
 * .ColumnBridge`): `SparkConnectService.sessionManager` is
 * `private[connect]`, and graft's read-only serving guard
 * ([[graft.serve.ReadOnlyGuard]]) needs exactly one thing from it — the
 * identity of the live client sessions, so enforcement can distinguish "a
 * session the Connect service created for a remote client" from the engine
 * session and its in-process clones. Object identity is the one signal a
 * client cannot forge or clear (unlike a session conf). Single object,
 * read-only access, no state; a Spark-minor-version breakage here fails to
 * compile, not silently.
 */
object GraftConnectBridge {

  /** The SparkSessions currently owned by the Connect session manager —
    * one per active remote client session; empty when the service is down. */
  def connectSessions(): Seq[SparkSession] = {
    val mgr = SparkConnectService.sessionManager
    mgr.listActiveSessions.flatMap { info =>
      mgr.getIsolatedSessionIfPresent(info.key).map(_.session)
    }
  }

  /** Whether a Connect gRPC server is live in this JVM right now
    * (`started`/`stopped` are `private[connect]` vars). The read-only
    * serving boundary needs this as a DIRECT liveness probe before
    * `start()`: a service built before graft's interceptor conf was set
    * never read it, so a read-only claim over that server would be
    * unenforceable at the wire. */
  def serviceRunning(): Boolean =
    SparkConnectService.started && !SparkConnectService.stopped
}
