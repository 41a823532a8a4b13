package org.apache.spark.sql.graftbridge

import org.apache.spark.SparkContext

/** Bridges the private[spark] listener-bus drain: SparkListener events
  * are delivered on an async bus, so per-task metrics read "right after
  * an action returns" can miss the trailing tasks — often the largest,
  * slowest ones, i.e. exactly the stragglers a skew measurement exists
  * to record. Call before reading listener-populated state. */
object ListenerBridge {
  def waitUntilListenersProcessed(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
