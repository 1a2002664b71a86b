package org.apache.spark

/** Test-only bridge to the private[spark] listener bus: lets specs
  * drain pending listener events before reading job counters, so a
  * job-count assertion is deterministic instead of racing the async
  * event delivery. */
object GraftListenerBus {
  def waitUntilEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
