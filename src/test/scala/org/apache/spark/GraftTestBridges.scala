package org.apache.spark

/** Test-only bridge: flush the async listener bus so a suite that sums
  * task metrics through a SparkListener reads COMPLETE totals instead of
  * racing event delivery (`listenerBus` is private[spark]). */
object GraftListenerBusFlush {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
