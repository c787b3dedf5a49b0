package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Bridge to the `private[spark]` listener-bus accessor so Bench can flush
  * pending stage events before reading its shuffle-bytes counter (the bus
  * is async; without a flush a query's last stages would be charged to the
  * NEXT query's delta). `waitUntilEmpty` itself is public API on the bus. */
object ListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
