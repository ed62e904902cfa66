package org.apache.spark

/** Test-only access to `private[spark]` members — the listener bus
  * drain PlanFingerprintSpec needs to make QueryExecutionListener
  * capture deterministic (ExecutionListenerBus posts callbacks
  * asynchronously on the shared listener bus; polling a sleep instead
  * would be a flake generator). Same in-package idiom as the main
  * tree's org.apache.spark.sql.GraftBridge. */
object GraftTestBridge {
  def waitListenerBusEmpty(sc: SparkContext, timeoutMs: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
