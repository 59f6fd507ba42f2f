package org.apache.spark.graft

import org.apache.spark.scheduler.StageInfo

/** Bridge into the `private[spark]` scheduler fields the perf tooling
  * reads (same visibility rationale as org.apache.spark.sql.graft's
  * ColumnBridge): `StageInfo.shuffleDepId` identifies a shuffle-map
  * stage and dedups AQE retries/reuse of the same exchange. */
object SchedulerBridge {
  def shuffleDepId(si: StageInfo): Option[Int] = si.shuffleDepId
}
