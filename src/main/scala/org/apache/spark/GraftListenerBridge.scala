/* Lives in org.apache.spark to reach the private[spark] listener bus flush —
 * needed only by tests that assert "this API submitted no Spark jobs" (the
 * job-start events are delivered asynchronously). */
package org.apache.spark

object GraftListenerBridge {
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
