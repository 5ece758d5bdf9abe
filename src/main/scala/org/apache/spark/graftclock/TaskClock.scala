package org.apache.spark.graftclock

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Aggregate task-time clock for benchmark legs.
  *
  * Wall time on this shared VM swings 2.6-3.6x with host weather
  * (BENCH/BASELINE.md), so scaling pairs need a companion metric that
  * external bus storms distort LESS: summed task executor time. Per e2e rep
  * the WORK is identical (deterministic corpus, partition-invariant pairs
  * table), so
  *
  *   - cpu_sec 2c vs 8c isolates the job's own contention growth (memory-bus
  *     self-interference shows up as stall cycles, which on-CPU time counts;
  *     external CPU steal does not — the thread is descheduled), and
  *   - run_sec - cpu_sec is scheduler wait + shuffle fetch + GC, the
  *     remainder worth watching when the two diverge.
  *
  * Lives under org.apache.spark because draining the async listener bus
  * before a snapshot needs the private[spark] `listenerBus` (same pattern as
  * sql.graftbridge.ColumnBridge for the Column/Expression bridge). */
class TaskClock extends SparkListener {
  val cpuNs = new AtomicLong(0L)
  val runMs = new AtomicLong(0L)
  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      cpuNs.addAndGet(m.executorCpuTime)
      runMs.addAndGet(m.executorRunTime)
    }
  }
}

object TaskClock {
  /** Install a clock on `sc`. Returns the instance to snapshot from. */
  def install(sc: SparkContext): TaskClock = {
    val c = new TaskClock
    sc.addSparkListener(c)
    c
  }

  /** Block until every queued listener event has been delivered, so a
    * snapshot taken right after an action includes all its task ends. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
