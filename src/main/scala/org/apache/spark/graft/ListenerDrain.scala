package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Bench-only accessor for the `private[spark]` listener bus: task-metric
  * listeners are async, so a per-query shuffle-byte counter must wait for
  * the bus to drain before reading (and before resetting for the next
  * query). Lives under `org.apache.spark` solely for visibility — no
  * Spark internals are modified. */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
