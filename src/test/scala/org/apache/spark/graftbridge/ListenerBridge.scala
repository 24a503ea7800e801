// SparkContext.listenerBus is private[spark], but deterministic
// job-count assertions need the async listener bus DRAINED before
// reading a counter — a fixed sleep lets stragglers from a previous
// measured body land inside the next one's window on a loaded box.
// Test-only, same one-file pattern as graftbridge.{ColumnBridge,
// PlanBridge}; no Spark internals are modified.
package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

object ListenerBridge {
  /** Block until every event already posted to the listener bus has been
    * delivered to every listener (30s cap — the bus drains in ms). */
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
