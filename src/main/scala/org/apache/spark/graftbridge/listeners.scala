package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** `listenerBus.waitUntilEmpty()` is `private[spark]`; the benchmark's
  * utilization report needs it so a run's task-metric events are fully
  * drained before the listener counters are read (the bus is async —
  * reading immediately after a job returns undercounts). Same shim pattern
  * as [[org.apache.spark.sql.graftbridge.Bridge]].
  */
object ListenerBridge {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
