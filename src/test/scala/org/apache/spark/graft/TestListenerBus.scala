package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only in-package shim: `SparkContext.listenerBus` is
  * `private[spark]`, and listener-counting assertions (job counts, plan
  * probes) must drain the async bus before reading their counters. */
object TestListenerBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
