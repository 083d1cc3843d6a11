package org.apache.spark.graft

import org.apache.spark.SparkContext

/** `private[spark]` access shim: flush the async listener bus so that a
  * `SparkListener` registered via the public `addSparkListener` API observes
  * every event from work submitted before the call returns.
  *
  * Two consumers need this determinism:
  *   - `graft.Bench` attributes task/shuffle/spill metrics to the query that
  *     just ran; without a flush, events from query N leak into query N+1's
  *     window.
  *   - `OperatorsSpec`'s fit-is-lazy job counter must not observe job-start
  *     events still queued from a previous test (ADVICE r7).
  */
object ListenerBusHatch {
  /** Block until all queued listener events are dispatched (bounded wait;
    * swallows the timeout — callers prefer slightly-stale metrics over a
    * crashed bench run).
    */
  def drain(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
