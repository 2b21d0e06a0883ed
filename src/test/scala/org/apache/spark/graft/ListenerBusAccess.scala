package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only bridge to `SparkContext.listenerBus` (which is
  * `private[spark]`): lets specs drain the async listener bus
  * deterministically instead of sleeping a fixed interval — fixed
  * sleeps both undercount events under load and add dead latency. */
object ListenerBusAccess {
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
