package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}
import graft.model.LogisticsEvent

/**
 * The `transformWithState` twin of [[StatefulOps.orderProgress]] — Spark 4's
 * arbitrary-stateful-v2 API: named typed state handles obtained from a
 * processor handle instead of one opaque `GroupState`, declarative TTL
 * instead of manual timeout bookkeeping, and a processor object whose
 * lifecycle (`init`/`handleInputRows`/`close`) matches long-lived state
 * evolution (new named states can be added across query restarts, which
 * the v1 single-state API cannot express). Both implementations fold each
 * batch through the SAME [[StatefulOps.advance]], so their semantics are
 * identical by construction — `StatefulOpsV2Spec` additionally pins
 * streamed v2 ≡ streamed v1 on a two-micro-batch scenario.
 *
 * Scale shape: identical to v1 — state ∝ OPEN keys (few dozen bytes per
 * order), evicted by the 6 h TTL; the state store is RocksDB-backed
 * (transformWithState requires the RocksDB provider — which is also the
 * right provider at production state sizes: state lives off-heap/on-disk
 * with changelog checkpointing, not in executor heap snapshots).
 *
 * Deployment note: the TTL timers interact with `Trigger.AvailableNow()`
 * exactly like v1's `ProcessingTimeTimeout` — the engine keeps scheduling
 * no-data micro-batches while timers are pending, so a bounded drain never
 * terminates on its own; see [[StatefulOps]]' deployment note for the two
 * remedies.
 */
object StatefulOpsV2 {

  private val ttl = TTLConfig(java.time.Duration.ofHours(6))

  class OrderProgressProcessor
      extends StatefulProcessor[String, LogisticsEvent, OrderUpdate] {

    @transient private var state: ValueState[OrderState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[OrderState](
        "orderState", Encoders.product[OrderState], ttl)

    override def handleInputRows(key: String, rows: Iterator[LogisticsEvent],
                                 timerValues: TimerValues): Iterator[OrderUpdate] = {
      val prev = if (state.exists()) state.get() else OrderState(0L, "", "")
      StatefulOps.advance(key, prev, rows.toSeq) match {
        case None => Iterator.empty
        case Some((next, out)) =>
          state.update(next)
          Iterator.single(out)
      }
    }
  }

  /** Running per-order progress; one output row per order per micro-batch.
    * Requires `spark.sql.streaming.stateStore.providerClass` =
    * `RocksDBStateStoreProvider` on the running session. */
  def orderProgress(events: Dataset[LogisticsEvent]): Dataset[OrderUpdate] = {
    implicit val keyEnc = Encoders.STRING
    implicit val outEnc = Encoders.product[OrderUpdate]
    events
      .groupByKey(_.order_id.getOrElse(""))
      .transformWithState(new OrderProgressProcessor,
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
