// Spark keeps TaskContext.taskMemoryManager() private[spark], so an
// operator that wants its in-task structures ACCOUNTED against Spark's
// execution-memory pool (instead of invisibly consuming JVM heap) needs
// this one-file bridge inside the spark namespace — the same pattern as
// sql.graftbridge.{ColumnBridge, PlanBridge}. No Spark internals are
// modified; the class below is an ordinary MemoryConsumer.
package org.apache.spark.graftbridge

import org.apache.spark.{SparkException, TaskContext}
import org.apache.spark.memory.{MemoryConsumer, MemoryMode}

/** Execution-memory accounting for an unspillable in-task structure
  * (graft's bounded-heap top-k): every byte the structure holds is
  * acquired from the task's memory pool, so Spark's memory manager SEES
  * the usage — co-scheduled spillable consumers (sort, hash-aggregate)
  * are asked to spill before the JVM heap is at risk, task
  * `peakExecutionMemory` metrics include the heap, and if the pool is
  * truly exhausted the operator fails its task with a clear, retryable
  * error instead of taking down the executor with an untraceable
  * OutOfMemoryError.
  *
  * Acquisition is chunked (1 MB) so the per-row hot path almost never
  * touches the (synchronized) TaskMemoryManager. `spill` returns 0: this
  * consumer cannot free memory on demand — which is exactly why its
  * usage must be visible to the consumers that can. */
final class TrackedTaskMemory private (tc: TaskContext)
    extends MemoryConsumer(tc.taskMemoryManager(), MemoryMode.ON_HEAP) {

  private var pooled = 0L    // acquired from the pool, not yet handed out
  private var handedOut = 0L // attributed to live structure bytes
  private var peak = 0L      // max handedOut over the consumer's life
  private val chunk = 1L << 20

  /** Max bytes ever attributed to the structure (reported into the
    * task's peakExecutionMemory metric at completion, the same contract
    * sort/aggregate operators follow). */
  def peakBytes: Long = peak

  override def spill(size: Long, trigger: MemoryConsumer): Long = 0L

  /** Attribute `bytes` of structure growth; acquires from the task pool
    * in chunks. Throws a clear SparkException (failing the task, not the
    * executor) when the pool cannot cover the request. */
  def reserve(bytes: Long, what: => String): Unit = {
    if (pooled < bytes) {
      val want = math.max(bytes - pooled, chunk)
      pooled += acquireMemory(want)
      if (pooled < bytes) {
        val held = handedOut + pooled
        releaseAll()
        throw new SparkException(
          s"$what: cannot reserve $bytes bytes of execution memory " +
            s"(consumer held $held); the operator does not spill — " +
            "reduce k, key cardinality, or partition count, or use the " +
            "window/auto form which spills")
      }
    }
    pooled -= bytes
    handedOut += bytes
    if (handedOut > peak) peak = handedOut
  }

  /** Return `bytes` of structure shrinkage to the local chunk pool. */
  def release(bytes: Long): Unit = { handedOut -= bytes; pooled += bytes }

  /** Free everything back to the task pool. */
  def releaseAll(): Unit = { freeMemory(getUsed); pooled = 0; handedOut = 0 }
}

object TrackedTaskMemory {
  /** None outside a running task (e.g. driver-side single-partition
    * plans in tests). The completion listener frees the pool on task end
    * regardless of success/failure. */
  def forCurrentTask(): Option[TrackedTaskMemory] =
    Option(TaskContext.get()).map { tc =>
      val t = new TrackedTaskMemory(tc)
      tc.addTaskCompletionListener[Unit] { _ =>
        t.releaseAll()
        // fold the consumer's peak into the classic task metric, the
        // same way sort/aggregate/join operators report theirs
        tc.taskMetrics().incPeakExecutionMemory(t.peakBytes)
      }
      t
    }
}
