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

/** Serializable Hadoop-conf carrier for executor-side FileSystem access
  * (`SerializableConfiguration` is private[spark]; this is the same
  * one-liner, kept in the bridge package like the other private-API
  * shims).
  */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
