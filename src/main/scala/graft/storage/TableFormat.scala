package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Storage-format seam for MANAGED TABLES (the lakehouse dirs the apps
  * read, append, upsert, compact and expire).
  *
  * The reference is an Iceberg lakehouse (catalog DDL at reference
  * ods/ProduceKafkaDBDataToODS.scala:53-60, maintenance at
  * offlineanls/CombinDataAndRemoveOldSnap.scala:32-53). This image has
  * no iceberg-spark-runtime jar, so the shipped implementation is
  * [[ParquetDirFormat]] — plain parquet directories with generation-swap
  * upsert and snapshot-dir maintenance. Every call site in
  * `graft.apps`/`graft.Queries` goes through this trait, which makes the
  * "Iceberg drop-in" claim CHECKED STRUCTURE rather than a comment: an
  * Iceberg deployment implements the same five operations as
  *
  *   - `read`       → `spark.table(table)`
  *   - `append`     → `df.writeTo(table).append()`
  *   - `streamAppend` → `df.writeStream.toTable(table)`
  *   - `upsert`     → `MERGE INTO table USING batch ON key ...`
  *   - `compact`    → `CALL lh.system.rewrite_data_files(table)`
  *   - `expireSnapshots` → `CALL lh.system.expire_snapshots(table)`
  *
  * with `table` a catalog name (`lh.db.t`) instead of a path. Nothing
  * else in the engine changes — operators only ever see DataFrames.
  *
  * Kafka-topic stand-in dirs (`$work/topics/...`) deliberately do NOT
  * go through this seam: they model a message bus, not a table, and on
  * a cluster they are `Sinks.kafkaJson`/`kafkaDynamicTopic`.
  */
trait TableFormat {

  /** Batch scan of a managed table. */
  def read(spark: SparkSession, table: String): DataFrame

  /** Batch append, optionally date/hive-partitioned. */
  def append(df: DataFrame, table: String,
             partitionCols: Seq[String] = Nil): Unit

  /** Streaming append (exactly-once per format's commit protocol). */
  def streamAppend(df: DataFrame, table: String, checkpoint: String,
                   partitionCols: Seq[String] = Nil,
                   triggerMs: Long = 5000L): StreamingQuery

  /** Full-recompute replace — INSERT OVERWRITE semantics
    * (Iceberg: `df.writeTo(table).replace()`). */
  def replace(df: DataFrame, table: String): Unit

  /** MERGE-style keyed upsert: latest record per `key` (by `versionCol`)
    * wins over both the batch and the stored table. */
  def upsert(spark: SparkSession, batch: DataFrame, table: String,
             key: String, versionCol: String,
             keepVersionCol: Boolean = true): Unit

  /** Rewrite small data files toward `targetBytes`; returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, table: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int)

  /** Expire snapshot generations older than `olderThanMs`; returns the
    * number removed. */
  def expireSnapshots(spark: SparkSession, table: String,
                      olderThanMs: Long = System.currentTimeMillis()): Int

  /** Snapshot read / time travel: the table as of retained version
    * `version` (Iceberg: `SELECT … FROM table VERSION AS OF v`,
    * reference ProcessUserPoints.scala:30-41 scans an Iceberg table
    * whose snapshots CombinDataAndRemoveOldSnap.scala:44-53 manages).
    * MUST fail loudly when the version was expired or never retained —
    * never silently fall back to the live table. */
  def readAt(spark: SparkSession, table: String, version: String): DataFrame

  /** Retained version identifiers of a table, oldest first
    * (Iceberg: the `table.snapshots` metadata table). */
  def listVersions(spark: SparkSession, table: String): Seq[String]

  /** Declared column-rename evolution, metadata-only (Iceberg:
    * `ALTER TABLE t RENAME COLUMN from TO to` — no data rewrite).
    * After the call, every read door (`read`, `readAt`, `upsert`'s
    * merge) resolves old generations' files under the new name;
    * add-column evolution needs no declaration (upsert merges by name
    * with missing-column tolerance, reads schema-merge). The evolution
    * contract the reference leans on Iceberg 0.11 for (its dynamic dim
    * DDL exists precisely because dim schemas drift, reference
    * dim/DimDataToHBase.scala:79-93). */
  def renameColumn(spark: SparkSession, table: String,
                   from: String, to: String): Unit

  /** Declared column-drop evolution, metadata-only (Iceberg:
    * `ALTER TABLE t DROP COLUMN c` — data files keep the bytes until
    * their next rewrite; every read door projects the column away
    * immediately). */
  def dropColumn(spark: SparkSession, table: String, column: String): Unit

  /** Declared type-widening evolution, metadata-only (Iceberg 0.11
    * promotion set: `ALTER TABLE t ALTER COLUMN c TYPE bigint` for
    * int->long, float->double, decimal precision growth). Narrow files
    * cast up on read; the next generation rewrite materializes the
    * wide type. Non-widening changes are rejected loudly. */
  def widenColumn(spark: SparkSession, table: String, column: String,
                  to: org.apache.spark.sql.types.DataType): Unit
}

/** Plain-parquet implementation: `table` is a directory path. Delegates
  * to the battle-tested pieces — [[graft.sinks.Sinks]] for writes and
  * [[graft.maintenance.Compaction]] for maintenance — so there is ONE
  * implementation of each mechanism regardless of which door it is
  * reached through. */
object ParquetDirFormat extends TableFormat {
  import graft.sinks.Sinks
  import graft.maintenance.Compaction

  override def read(spark: SparkSession, table: String): DataFrame =
    // journal-resolved + schema-merged: append dirs legitimately mix
    // pre- and post-add-column files, and renamed tables resolve old
    // files' columns under the evolved name (Evolution scaladoc)
    Evolution.read(spark, table)

  override def append(df: DataFrame, table: String,
                      partitionCols: Seq[String]): Unit =
    Sinks.batchAppend(df, table, partitionCols)

  override def streamAppend(df: DataFrame, table: String, checkpoint: String,
                            partitionCols: Seq[String],
                            triggerMs: Long): StreamingQuery =
    Sinks.streamAppend(df, table, checkpoint, partitionCols, triggerMs)

  override def replace(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").parquet(table)

  override def upsert(spark: SparkSession, batch: DataFrame, table: String,
                      key: String, versionCol: String,
                      keepVersionCol: Boolean): Unit =
    Sinks.upsertParquet(spark, batch, table, key, versionCol, keepVersionCol)

  override def compact(spark: SparkSession, table: String,
                       targetBytes: Long): (Int, Int) =
    Compaction.rewriteDataFiles(spark, table, targetBytes)

  override def expireSnapshots(spark: SparkSession, table: String,
                               olderThanMs: Long): Int =
    // two retention stores, one maintenance door (like Iceberg's one
    // expire_snapshots): compaction's pre-rewrite file snapshots
    // (`_snap_` inside the dir) and upsert's retired generations
    // (`<table>_versions` sibling, the time-travel store)
    Compaction.expireSnapshots(spark, table, olderThanMs) +
      Sinks.expireDimVersions(spark, table, olderThanMs)

  /** Versions are retained by the flat generation-swap [[upsert]] (each
    * upsert retires the previous whole-table generation by rename —
    * zero data I/O). The bucketed upsert variant rewrites per-bucket
    * and does not retain; large dims wanting time travel use the
    * Iceberg implementation of this seam, where MERGE INTO snapshots
    * come free. */
  override def readAt(spark: SparkSession, table: String,
                      version: String): DataFrame =
    // a retired generation reads against the EVOLVED schema: renames
    // resolve through the journal, added columns conform as typed
    // nulls — the Iceberg name-mapping behavior, not a frozen schema
    Evolution.readAt(spark, table, version)

  override def listVersions(spark: SparkSession, table: String): Seq[String] =
    Sinks.listDimVersions(spark, table)

  override def renameColumn(spark: SparkSession, table: String,
                            from: String, to: String): Unit =
    Evolution.renameColumn(spark, table, from, to)

  override def dropColumn(spark: SparkSession, table: String,
                          column: String): Unit =
    Evolution.dropColumn(spark, table, column)

  override def widenColumn(spark: SparkSession, table: String, column: String,
                           to: org.apache.spark.sql.types.DataType): Unit =
    Evolution.widenColumn(spark, table, column, to)
}
