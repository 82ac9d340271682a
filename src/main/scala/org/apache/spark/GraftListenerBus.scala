package org.apache.spark

/** Test/instrumentation shim: drain the listener bus so BenchExtra's
  * per-query job/stage/task counters are exact (the bus is private[spark]).
  */
object GraftListenerBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
