package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Minimal accessor for `private[spark]` scheduler internals the metrics
  * registry needs. `LiveListenerBus.waitUntilEmpty()` is the only sanctioned
  * way to make async listener delivery deterministic (Spark's own test
  * utilities rely on it); it is JVM-public and stable across 3.x/4.x, just
  * Scala-scoped to the org.apache.spark package — hence this shim. */
object SparkInternals {
  /** Block until every queued listener event has been delivered (10 s cap
    * inside Spark). Best effort: a timeout degrades metrics counters, never
    * the data path. */
  def flushListenerBus(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: java.util.concurrent.TimeoutException => () }
}
