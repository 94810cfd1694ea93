package graft.util

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd}
import org.apache.spark.util.LongAccumulator

/** Named, driver-logged accumulators for default-on safety guards.
  *
  * Guards that drop data (hot-bucket caps, skew filters) must be
  * observable even on their zero-configuration path: the accumulator is
  * named (so it surfaces per-stage in the Spark UI) and a per-context
  * listener logs at job end whenever the total grew. Counts are
  * observational — task retries and plan reuse can over-count — which
  * is the right trade for visibility with zero extra jobs.
  */
object GuardMetrics {

  private val accs =
    new ConcurrentHashMap[(SparkContext, String), LongAccumulator]

  /** One accumulator per (context, name); `describe(total)` renders the
    * job-end log line (emitted only when the total increased). */
  def loggedAccumulator(sc: SparkContext, name: String)(
      describe: Long => String): LongAccumulator =
    accs.computeIfAbsent((sc, name), { _ =>
      val acc = sc.longAccumulator(name)
      val logged = new AtomicLong(0L)
      sc.addSparkListener(new SparkListener {
        override def onJobEnd(e: SparkListenerJobEnd): Unit = {
          val v = acc.value
          if (v > logged.getAndSet(v)) System.err.println(describe(v))
        }
      })
      acc
    })
}
