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

  /** All value rows encoded in one changelog value blob. Single-value
    * column families yield exactly one row; multi-value (ListState) blobs
    * yield one row PER ELEMENT — a merge's changelog entry carries the
    * whole concatenated list, and reporting only its first element would
    * silently drop the rest from the change feed. */
  protected def decodeChangeValues(colFamilyName: String,
      valueBytes: Array[Byte]): Iterator[UnsafeRow]

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
      // multi-value puts expand to several tuples; drain these first
      private var pending: Iterator[(RecordType.Value, UnsafeRow, UnsafeRow, Long)] =
        Iterator.empty

      override protected def getNext(): (RecordType.Value, UnsafeRow, UnsafeRow, Long) = {
        while (!pending.hasNext) {
          while (!records.hasNext && version <= endVersion) {
            records = changeRecords(version, cf)
            version += 1
          }
          if (!records.hasNext) {
            finished = true
            return null
          }
          val (pk, vb) = records.next()
          // the tuple's Long is surfaced as batch_id: changelog version v
          // holds the changes batch v-1 wrote (version 0 = empty store)
          val batchId = (version - 1) - 1
          val key = decodeChangeKey(cf, pk)
          pending =
            if (vb == null) Iterator.single((RecordType.DELETE_RECORD, key, null: UnsafeRow, batchId))
            else decodeChangeValues(cf, vb).map(v => (RecordType.PUT_RECORD, key, v, batchId))
        }
        pending.next()
      }

      override protected def close(): Unit = ()
    }
  }
}
