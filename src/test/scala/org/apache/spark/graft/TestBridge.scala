package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only access to `private[spark]` members (same pattern as the main
  * tree's sql Bridge): lets specs drain the async listener bus before
  * asserting on job counts.
  */
object TestBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
