package org.apache.spark.graft

import org.apache.spark.SparkContext
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Test-only bridges into `private[spark]`/`private[sql]` surfaces. */
object ListenerBusFlush {
  /** SparkListener task-metric events are posted asynchronously, so a test
    * that sums shuffle bytes from a listener must drain the bus before
    * asserting — otherwise the assertion races the event delivery. */
  def flush(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}

object PlanMetrics {
  /** Sum of the `dataSize` metric over every shuffle exchange of an
    * ALREADY-EXECUTED dataset: UnsafeRow bytes entering each shuffle,
    * before serialization and compression — the deterministic measure of
    * how wide the rows a plan exchanges are (compressed bytesWritten
    * depends on codec behavior and is useless for tight assertions). */
  def shuffleDataSize(ds: Dataset[_]): Long = {
    // the AQE final plan wraps every materialized exchange in a leaf
    // ShuffleQueryStageExec (children = Nil), so the walk must unwrap both
    // the adaptive root and each query stage to reach the exchanges
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    walk(ds.queryExecution.executedPlan).collect {
      case s: ShuffleExchangeLike => s.metrics.get("dataSize").map(_.value).getOrElse(0L)
    }.sum
  }
}
