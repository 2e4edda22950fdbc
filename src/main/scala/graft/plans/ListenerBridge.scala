package org.apache.spark

/** Bridge to SparkContext's private[spark] listener bus, so the bench
  * harness can drain in-flight task-end events before reading its
  * shuffle counters (listener delivery is asynchronous; without the
  * flush a query's last tasks could be credited to the next query). */
object GraftListenerBridge {
  def drain(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty(30000L)
}
