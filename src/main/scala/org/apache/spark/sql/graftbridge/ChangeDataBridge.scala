package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.streaming.state.{RecordType, StateStore, SupportsFineGrainedReplay}
import org.apache.spark.util.NextIterator

/** `SupportsFineGrainedReplay.getStateStoreChangeDataReader` returns
  * `org.apache.spark.util.NextIterator`, which is `private[spark]` — a
  * provider outside the spark namespace cannot even write the override's
  * signature. This trait (in the sql package namespace, the standard
  * extension-library pattern, like [[ColumnBridge]]) implements the
  * iterator plumbing where the type is visible and delegates the actual
  * changelog access/decoding to three hooks the provider implements.
  */
trait GraftChangeDataSupport extends SupportsFineGrainedReplay {

  /** One version's changelog as (physicalKey, valueOrNull-for-delete)
    * records, already filtered to `colFamilyName`. Strict: a
    * missing/corrupt changelog throws. */
  protected def changeRecords(version: Long, colFamilyName: String):
    Iterator[(Array[Byte], Array[Byte])]

  protected def decodeChangeKey(colFamilyName: String, physicalKey: Array[Byte]): UnsafeRow
  protected def decodeChangeValue(colFamilyName: String, valueBytes: Array[Byte]): UnsafeRow

  override def getStateStoreChangeDataReader(
      startVersion: Long, endVersion: Long,
      colFamilyNameOpt: Option[String],
      endCheckpointId: Option[String]):
      NextIterator[(RecordType.Value, UnsafeRow, UnsafeRow, Long)] = {
    require(startVersion >= 1 && endVersion >= startVersion,
      s"invalid change range [$startVersion, $endVersion]")
    val cf = colFamilyNameOpt.getOrElse(StateStore.DEFAULT_COL_FAMILY_NAME)

    new NextIterator[(RecordType.Value, UnsafeRow, UnsafeRow, Long)] {
      private var version = startVersion
      private var records: Iterator[(Array[Byte], Array[Byte])] = Iterator.empty

      override protected def getNext(): (RecordType.Value, UnsafeRow, UnsafeRow, Long) = {
        while (!records.hasNext && version <= endVersion) {
          records = changeRecords(version, cf)
          version += 1
        }
        if (!records.hasNext) {
          finished = true
          null
        } else {
          val (pk, vb) = records.next()
          // the tuple's Long is surfaced as batch_id: changelog version v
          // holds the changes batch v-1 wrote (version 0 = empty store)
          val batchId = (version - 1) - 1
          val key = decodeChangeKey(cf, pk)
          if (vb == null) (RecordType.DELETE_RECORD, key, null, batchId)
          else (RecordType.PUT_RECORD, key, decodeChangeValue(cf, vb), batchId)
        }
      }

      override protected def close(): Unit = ()
    }
  }
}
