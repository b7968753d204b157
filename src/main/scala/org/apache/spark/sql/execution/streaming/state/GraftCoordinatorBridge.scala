package org.apache.spark.sql.execution.streaming.state

import java.util.UUID

import org.apache.spark.SparkEnv

/** Access bridge to the package-private coordinator RPCs a provider needs
  * (the built-in providers call these from inside this package). Kept to
  * the minimal surface: snapshot-upload reporting for the coordinator's
  * lag detector.
  */
object GraftCoordinatorBridge {
  def snapshotUploaded(storeId: StateStoreId, runId: UUID, version: Long): Unit =
    StateStoreCoordinatorRef.forExecutor(SparkEnv.get)
      .snapshotUploaded(StateStoreProviderId(storeId, runId), version,
        System.currentTimeMillis())

  /** Test seam: what the coordinator believes is the newest uploaded
    * snapshot for a store. */
  def latestUploadedSnapshotForTesting(storeId: StateStoreId, runId: UUID): Option[Long] =
    StateStoreCoordinatorRef.forExecutor(SparkEnv.get)
      .getLatestSnapshotVersionForTesting(StateStoreProviderId(storeId, runId))
}
