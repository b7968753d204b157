package graft.state

import org.apache.hadoop.conf.Configuration

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.streaming.state.{NoPrefixKeyStateEncoderSpec, StateStore, StateStoreConf, StateStoreId}
import org.apache.spark.sql.types.StructType

/** Offline state SURGERY for stopped streaming queries — operations
  * Spark itself cannot do:
  *
  *  - [[rescale]]: a stateful query pins `shuffle.partitions` from its
  *    first micro-batch forever (recovered from the offsets log on
  *    every restart), so a query that outgrew its parallelism is stuck
  *    unless its keyed state is physically redistributed. Every (key,
  *    value) pair is routed by evaluating Spark's own
  *    `HashPartitioning.partitionIdExpression` over the key row — the
  *    EXACT routing the shuffle uses — so a restarted query with `newN`
  *    partitions finds every key in the store its exchange will read.
  *  - [[prune]]: targeted key deletion (the right-to-be-forgotten
  *    request) — rewrite the state dropping rejected keys at the same
  *    layout; the resumed query sees those entities as new.
  *  - [[migrate]]: value-schema evolution — rewrite every stored value
  *    to a new layout (and, via [[migrateCheckpoint]], the checkpoint's
  *    recorded state schema) so the query resumes with a CHANGED state
  *    class instead of discarding its history.
  *
  * Scope: value stores under `NoPrefixKeyStateEncoderSpec` and the
  * default column family — streaming aggregation, dropDuplicates, and
  * (flat)mapGroupsWithState state. Session-window / stream-stream-join
  * layouts and multi-CF transformWithState stores carry extra key
  * sections with their own distribution and are out of scope here.
  *
  * Version discipline: the new stores are committed up to the SAME
  * version as the old ones (empty commits below, the full data set in
  * the final commit), because the next micro-batch after restart opens
  * `version = lastBatch + 1` — a store rebuilt at version 1 would be
  * unreadable for any real checkpoint. All old partitions must agree on
  * their latest committed version; disagreement means a torn checkpoint
  * and the tool refuses.
  *
  * Scale notes: this implementation streams one old partition at a
  * time through one JVM — an offline maintenance pass (state is
  * typically orders of magnitude smaller than the data that built it).
  * The shape distributes naturally when needed: routing is pure per-key
  * arithmetic and the snapshot files live on the shared FS, so a
  * cluster variant runs one task per NEW partition, each scanning the
  * old snapshots for its keys.
  */
object StateRescale extends Logging {

  /** The exact expression Spark's exchange evaluates to place a state
    * row: `Pmod(Murmur3Hash(key fields), n)` bound to the key schema.
    * Exposed so tests (and any external verifier) route keys with the
    * SAME arithmetic the tool and the engine use. */
  def partitionIdExpressionFor(keySchema: StructType, n: Int)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    HashPartitioning(
      keySchema.fields.zipWithIndex.map { case (f, i) =>
        BoundReference(i, f.dataType, f.nullable)
      }.toIndexedSeq, n).partitionIdExpression

  final case class RescaleReport(
      oldPartitions: Int,
      newPartitions: Int,
      version: Long,
      keysMoved: Long,
      perNewPartition: Map[Int, Long])

  /** @param makeProvider fresh provider instance per partition
    *                     (providers bind to one StateStoreId at init)
    * @param oldStateRoot checkpoint state root of the source (the
    *                     directory whose children are operator ids)
    * @param newStateRoot state root to write the rescaled layout into
    *                     (must not equal `oldStateRoot`)
    */
  def rescale(
      makeProvider: () => GraftStateStoreProviderBase,
      oldStateRoot: String,
      newStateRoot: String,
      operatorId: Long,
      oldN: Int,
      newN: Int,
      keySchema: StructType,
      valueSchema: StructType,
      conf: StateStoreConf,
      hadoopConf: Configuration = new Configuration()): RescaleReport =
    rewriteState(makeProvider, oldStateRoot, newStateRoot, operatorId,
      oldN, newN, keySchema, valueSchema, valueSchema, conf, hadoopConf,
      keep = _ => true, transformValue = None)

  /** Targeted key DELETION across a checkpoint's state — the
    * right-to-be-forgotten operation for streaming state: a stopped
    * query's keyed state is rewritten dropping every key `keep` rejects
    * (e.g. a deleted user's id), at the same version and partition
    * count, so the query resumes with those entities starting fresh and
    * everyone else's state intact. Same scope and version discipline as
    * [[rescale]]; the two compose (prune = same-N rewrite with a
    * predicate, rescale = route-only rewrite).
    */
  def prune(
      makeProvider: () => GraftStateStoreProviderBase,
      oldStateRoot: String,
      newStateRoot: String,
      operatorId: Long,
      numPartitions: Int,
      keySchema: StructType,
      valueSchema: StructType,
      conf: StateStoreConf,
      keep: InternalRow => Boolean,
      hadoopConf: Configuration = new Configuration()): RescaleReport =
    rewriteState(makeProvider, oldStateRoot, newStateRoot, operatorId,
      numPartitions, numPartitions, keySchema, valueSchema, valueSchema,
      conf, hadoopConf, keep, transformValue = None)

  /** State value SCHEMA MIGRATION — evolve the stored state of a
    * stopped query to a new value layout (add a field with a default,
    * reorder, widen) so the query can resume with a CHANGED state class
    * instead of discarding its history: `transformValue` maps each old
    * value row to an [[InternalRow]] matching `newValueSchema` (the
    * tool projects it to the stored UnsafeRow form). Keys are
    * untouched; layout and version are preserved. Pair with
    * [[migrateCheckpoint]], which also rewrites the checkpoint's state
    * schema file so the resumed query's compatibility check sees the
    * new layout as the recorded one.
    */
  def migrate(
      makeProvider: () => GraftStateStoreProviderBase,
      oldStateRoot: String,
      newStateRoot: String,
      operatorId: Long,
      numPartitions: Int,
      keySchema: StructType,
      oldValueSchema: StructType,
      newValueSchema: StructType,
      conf: StateStoreConf,
      transformValue: InternalRow => InternalRow,
      hadoopConf: Configuration = new Configuration()): RescaleReport =
    rewriteState(makeProvider, oldStateRoot, newStateRoot, operatorId,
      numPartitions, numPartitions, keySchema, oldValueSchema, newValueSchema,
      conf, hadoopConf, keep = _ => true, transformValue = Some(transformValue))

  /** Read-only count of keys matching `pred` across a state root — the
    * audit companion to [[prune]]: [[graft.Forget.forget]] uses it to
    * PROVE the pruned checkpoint holds zero residual keys for a delete
    * list (the parquet artifacts get the same proof from
    * [[graft.operators.Pipeline.deletionAudit]]). Opens each partition's
    * store at its latest committed version, iterates, aborts — nothing
    * is written.
    */
  def countKeys(
      makeProvider: () => GraftStateStoreProviderBase,
      stateRoot: String,
      operatorId: Long,
      numPartitions: Int,
      keySchema: StructType,
      valueSchema: StructType,
      conf: StateStoreConf,
      pred: InternalRow => Boolean = _ => true,
      hadoopConf: Configuration = new Configuration()): Long = {
    var n = 0L
    var committedParts = 0
    (0 until numPartitions).foreach { p =>
      val prov = makeProvider()
      prov.init(StateStoreId(stateRoot, operatorId, p), keySchema, valueSchema,
        NoPrefixKeyStateEncoderSpec(keySchema), useColumnFamilies = false,
        conf, hadoopConf, useMultipleValuesPerKey = false,
        stateSchemaProvider = None)
      try {
        val version = prov.latestCommittedVersion
        if (version > 0) {
          committedParts += 1
          val store = prov.getStore(version, None)
          try {
            val it = store.iterator(StateStore.DEFAULT_COL_FAMILY_NAME)
            try it.foreach(pair => if (pred(pair.key)) n += 1)
            finally it.close()
          } finally store.abort()
        }
      } finally prov.close()
    }
    // a compliance re-proof must be able to tell "zero residuals" from
    // "nothing there": a typo'd or nonexistent state root has NO
    // committed partition and would otherwise read as clean (the same
    // torn-checkpoint class rewriteState refuses)
    require(committedParts > 0,
      s"countKeys: no partition under $stateRoot (operator $operatorId, " +
        s"$numPartitions partitions) has a committed version — wrong path, " +
        "wrong partition count, or a torn checkpoint; a count over nothing " +
        "proves nothing")
    n
  }

  private def rewriteState(
      makeProvider: () => GraftStateStoreProviderBase,
      oldStateRoot: String,
      newStateRoot: String,
      operatorId: Long,
      oldN: Int,
      newN: Int,
      keySchema: StructType,
      oldValueSchema: StructType,
      newValueSchema: StructType,
      conf: StateStoreConf,
      hadoopConf: Configuration,
      keep: InternalRow => Boolean,
      transformValue: Option[InternalRow => InternalRow]): RescaleReport = {
    require(oldN > 0 && newN > 0, s"partition counts must be positive: $oldN -> $newN")
    require(oldStateRoot != newStateRoot,
      "state rewrite must target a fresh state root — rewriting in place " +
        "would destroy the source on a mid-run failure")

    // migrated values arrive as any InternalRow shape; the store needs
    // UnsafeRows of the NEW schema
    val toUnsafe = transformValue.map(_ =>
      org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(newValueSchema))

    // the exact expression the shuffle evaluates to place a row
    val partIdExpr = partitionIdExpressionFor(keySchema, newN)
    def route(key: InternalRow): Int = partIdExpr.eval(key).asInstanceOf[Int]

    // every opened provider must close on EVERY exit path — a leaked
    // RocksDB handle holds its LOCK file and blocks a same-JVM retry
    val opened = scala.collection.mutable.ArrayBuffer.empty[GraftStateStoreProviderBase]
    def openTracked(root: String, partition: Int,
                    valueSchema: StructType): GraftStateStoreProviderBase = {
      val p = makeProvider()
      opened += p
      p.init(StateStoreId(root, operatorId, partition), keySchema, valueSchema,
        NoPrefixKeyStateEncoderSpec(keySchema), useColumnFamilies = false,
        conf, hadoopConf, useMultipleValuesPerKey = false, stateSchemaProvider = None)
      p
    }
    try {
      // 1) discover the common committed version across old partitions
      val oldProviders = (0 until oldN).map(openTracked(oldStateRoot, _, oldValueSchema))
      val versions = oldProviders.map(_.latestCommittedVersion)
      val version = versions.head
      require(versions.forall(_ == version),
        s"torn checkpoint: old partitions at versions $versions — refusing to rescale")
      require(version > 0, "source state has no committed version")

      // 2) open writers at version-1 (empty commits up to it), then route
      val writers: Array[StateStore] = (0 until newN).map { p =>
        val prov = openTracked(newStateRoot, p, newValueSchema)
        var v = 0L
        while (v < version - 1) { prov.getStore(v, None).commit(); v += 1 }
        prov.getStore(version - 1, None)
      }.toArray

      val perPart = new Array[Long](newN)
      var moved = 0L
      oldProviders.zipWithIndex.foreach { case (prov, p) =>
        val store = prov.getStore(version, None)
        try {
          val it = store.iterator(StateStore.DEFAULT_COL_FAMILY_NAME)
          try it.foreach { pair =>
            if (keep(pair.key)) {
              val target = route(pair.key)
              val value = transformValue match {
                case Some(f) => toUnsafe.get.apply(f(pair.value))
                case None => pair.value
              }
              // provider put() copies both rows — the iterator may reuse buffers
              writers(target).put(pair.key, value, StateStore.DEFAULT_COL_FAMILY_NAME)
              perPart(target) += 1
              moved += 1
            }
          } finally it.close()
        } finally store.abort()
        logInfo(s"rescale: drained old partition $p")
      }

      writers.foreach { w => require(w.commit() == version) }
      logInfo(s"rescale: $moved keys $oldN -> $newN partitions at version $version")
      RescaleReport(oldN, newN, version, moved,
        (0 until newN).map(p => p -> perPart(p)).toMap)
    } finally opened.foreach { p =>
      try p.close()
      catch { case scala.util.control.NonFatal(e) =>
        logWarning(s"rescale: provider close failed: ${e.getMessage}")
      }
    }
  }

  /** Whole-checkpoint rescale: copy `oldCkpt`'s logs (offsets, commits,
    * metadata) to `newCkpt`, rewrite the state of `operatorId` from
    * `oldN` to `newN` partitions, and rewrite the offsets log's pinned
    * `spark.sql.shuffle.partitions` — after which a query restarted on
    * `newCkpt` runs at `newN` partitions with its state intact
    * (end-to-end gated in StateRescaleResumeSuite). Local-FS paths (the
    * offline-maintenance context); the SPI layer underneath is
    * FS-agnostic.
    */
  def rescaleCheckpoint(
      makeProvider: () => GraftStateStoreProviderBase,
      oldCkpt: String,
      newCkpt: String,
      operatorId: Long,
      oldN: Int,
      newN: Int,
      keySchema: StructType,
      valueSchema: StructType,
      conf: StateStoreConf,
      hadoopConf: Configuration = new Configuration()): RescaleReport = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    copyCheckpointExceptOperator(oldCkpt, newCkpt, operatorId)
    val report = rescale(makeProvider, s"$oldCkpt/state", s"$newCkpt/state",
      operatorId, oldN, newN, keySchema, valueSchema, conf, hadoopConf)
    // the offsets log pins shuffle partitions from the first batch; the
    // restarted query recovers the value from the LATEST entry — rewrite
    // them all so every recovery point agrees
    val offsets = Paths.get(newCkpt).resolve("offsets")
    if (Files.isDirectory(offsets)) {
      Files.list(offsets).iterator().asScala.filter(Files.isRegularFile(_)).foreach { f =>
        rewriteTextFile(f, _.replace(
          s""""spark.sql.shuffle.partitions":"$oldN"""",
          s""""spark.sql.shuffle.partitions":"$newN""""))
      }
    }
    // the OPERATOR metadata also records numPartitions; the streaming
    // runtime takes the count from the offsets conf, but the state DATA
    // SOURCE reader (`spark.read.format("statestore")`) takes it from
    // here — leave it stale and every post-rescale state read silently
    // scans only the first oldN partition dirs
    val opMeta = Paths.get(newCkpt).resolve(s"state/$operatorId/_metadata/metadata")
    if (Files.isRegularFile(opMeta)) {
      rewriteTextFile(opMeta, _.replace(
        s""""numPartitions":$oldN""", s""""numPartitions":$newN"""))
    }
    report
  }

  /** Rewrite a checkpoint text file in place, dropping any Hadoop
    * checksum sidecar (`.name.crc`) the copy carried over — a stale crc
    * fails ChecksumFileSystem reads of the edited content. */
  private def rewriteTextFile(f: java.nio.file.Path,
                              transform: String => String): Unit = {
    import java.nio.file.Files
    val rewritten = transform(new String(Files.readAllBytes(f), "UTF-8"))
    Files.write(f, rewritten.getBytes("UTF-8"))
    Files.deleteIfExists(f.resolveSibling("." + f.getFileName.toString + ".crc"))
    ()
  }

  /** Whole-checkpoint [[prune]]: copy the logs and sibling operators,
    * rewrite `operatorId`'s state dropping keys `keep` rejects. Same
    * version and partition count, so NO offsets edit — the query resumes
    * on `newCkpt` unchanged except for the forgotten keys (end-to-end
    * gated in StateRescaleResumeSuite).
    */
  def pruneCheckpoint(
      makeProvider: () => GraftStateStoreProviderBase,
      oldCkpt: String,
      newCkpt: String,
      operatorId: Long,
      numPartitions: Int,
      keySchema: StructType,
      valueSchema: StructType,
      conf: StateStoreConf,
      keep: InternalRow => Boolean,
      hadoopConf: Configuration = new Configuration()): RescaleReport = {
    copyCheckpointExceptOperator(oldCkpt, newCkpt, operatorId)
    prune(makeProvider, s"$oldCkpt/state", s"$newCkpt/state",
      operatorId, numPartitions, keySchema, valueSchema, conf, keep, hadoopConf)
  }

  /** Whole-checkpoint [[migrate]]: copy the logs and sibling operators,
    * rewrite `operatorId`'s state values to `newValueSchema`, and
    * REWRITE THE STATE SCHEMA FILE (the v2 key/value-JSON record under
    * `state/<op>/0/_metadata/schema`) so the resumed query's
    * compatibility check accepts the evolved state class as what the
    * checkpoint always recorded. Same version and layout — no offsets
    * edit (end-to-end gated in StateRescaleResumeSuite: a query resumes
    * with a CHANGED state case class over its migrated history).
    */
  def migrateCheckpoint(
      makeProvider: () => GraftStateStoreProviderBase,
      oldCkpt: String,
      newCkpt: String,
      operatorId: Long,
      numPartitions: Int,
      keySchema: StructType,
      oldValueSchema: StructType,
      newValueSchema: StructType,
      conf: StateStoreConf,
      transformValue: InternalRow => InternalRow,
      hadoopConf: Configuration = new Configuration()): RescaleReport = {
    copyCheckpointExceptOperator(oldCkpt, newCkpt, operatorId)
    val report = migrate(makeProvider, s"$oldCkpt/state", s"$newCkpt/state",
      operatorId, numPartitions, keySchema, oldValueSchema, newValueSchema,
      conf, transformValue, hadoopConf)
    writeSchemaFile(java.nio.file.Paths.get(
        newCkpt, "state", operatorId.toString, "0", "_metadata", "schema"),
      keySchema, newValueSchema)
    report
  }

  /** Write Spark's v2 state schema record: `writeUTF("v2")`, then the
    * key and value schema JSONs each as a chunk count + `writeUTF`
    * chunks (one chunk here — the 64 KB writeUTF bound holds for any
    * sane state schema; refuse rather than silently truncate). */
  private def writeSchemaFile(path: java.nio.file.Path,
                              keySchema: StructType,
                              valueSchema: StructType): Unit = {
    import java.nio.file.Files
    val kj = keySchema.json; val vj = valueSchema.json
    require(kj.length < 65535 && vj.length < 65535,
      "schema JSON exceeds one UTF chunk — extend writeSchemaFile to multi-chunk")
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeUTF("v2")
    out.writeInt(1); out.writeUTF(kj)
    out.writeInt(1); out.writeUTF(vj)
    out.flush()
    Files.createDirectories(path.getParent)
    Files.write(path, bos.toByteArray)
    Files.deleteIfExists(path.resolveSibling("." + path.getFileName + ".crc"))
    ()
  }

  /** Copy every log AND every other operator's state verbatim — a
    * checkpoint can hold several stateful operators (chained ops), and
    * skipping all of `state/` would silently drop their state, so only
    * the target operator's subtree (which the rewrite recreates) is
    * skipped. A query with several stateful ops runs one
    * rescale/prune per operator id into the SAME destination; existing
    * destination files are never overwritten, so call 2's copy phase
    * cannot clobber call 1's rewritten state with the old layout.
    */
  private def copyCheckpointExceptOperator(
      oldCkpt: String, newCkpt: String, operatorId: Long): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val src = Paths.get(oldCkpt)
    val dst = Paths.get(newCkpt)
    require(Files.isDirectory(src), s"no checkpoint at $oldCkpt")
    // the target operator's partition DATA is skipped (the rewrite
    // recreates it) but its `_metadata` artifacts — the operator
    // metadata and the partition-0 state schema file — are KEPT: the
    // state data source reader needs the schema, and a resumed query
    // validates against it (rescale/prune never change schemas)
    def underTargetOperator(rel: java.nio.file.Path): Boolean =
      rel.getNameCount >= 2 && rel.getName(0).toString == "state" &&
        rel.getName(1).toString == operatorId.toString &&
        !(0 until rel.getNameCount).exists(i => rel.getName(i).toString == "_metadata")
    Files.walk(src).iterator().asScala.foreach { p =>
      val rel = src.relativize(p)
      if (rel.getNameCount == 0 || !underTargetOperator(rel)) {
        val t = dst.resolve(rel.toString)
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else if (!Files.exists(t)) {
          Files.createDirectories(t.getParent)
          Files.copy(p, t)
        }
      }
    }
  }
}

/** CLI for [[StateRescale.rescaleCheckpoint]]:
  * {{{
  * runMain graft.state.StateRescaleMain \
  *   <oldCheckpoint> <newCheckpoint> <operatorId> <oldN> <newN> \
  *   <keySchemaDDL> <valueSchemaDDL> [providerClass]
  * }}}
  * Schema DDL like `"value INT"` / `"user_id BIGINT, k STRING"` — the
  * KEY schema must match the operator's grouping-key row layout (it
  * drives routing); the value schema is informational to the SPI.
  */
object StateRescaleMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 7,
      "usage: <oldCkpt> <newCkpt> <operatorId> <oldN> <newN> <keyDDL> <valueDDL> [providerClass]")
    val Array(oldCkpt, newCkpt, opId, oldN, newN, keyDdl, valueDdl) = args.take(7)
    val provider: () => GraftStateStoreProviderBase =
      if (args.length > 7)
        () => Class.forName(args(7)).getDeclaredConstructor().newInstance()
          .asInstanceOf[GraftStateStoreProviderBase]
      else () => new RocksDbStateStoreProvider
    val conf = new StateStoreConf(new org.apache.spark.sql.internal.SQLConf, Map.empty)
    val report = StateRescale.rescaleCheckpoint(provider, oldCkpt, newCkpt,
      opId.toLong, oldN.toInt, newN.toInt,
      StructType.fromDDL(keyDdl), StructType.fromDDL(valueDdl), conf)
    println(s"rescaled: $report")
  }
}
