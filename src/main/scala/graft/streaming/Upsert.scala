package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming keyed-table upsert — the `foreachBatch` CDC-sink pattern.
  *
  * The reference's pipeline re-lands the full extracted table every
  * scheduled run (airflow_dag.py's extract → save path); the streaming
  * form a 100 TB deployment needs instead maintains a keyed state table
  * incrementally: each micro-batch merges into the table, keeping the
  * latest row per key. This module is that sink, built to three
  * contracts:
  *
  *  1. **Partial maintenance.** The table is laid out as
  *     `bucket=pmod(hash(key), nBuckets)` parquet partitions. A
  *     micro-batch reads back ONLY the buckets its keys hash into
  *     (partition-pruned scan) and rewrites ONLY those buckets
  *     (dynamic partition overwrite — [[graft.sources.Sources
  *     .relandPartitions]] semantics). Per-batch cost is proportional
  *     to touched buckets, never to table size; size nBuckets so one
  *     bucket ≈ one comfortable task (e.g. 2^14 buckets for a 10 TB
  *     state table → ~600 MB per bucket).
  *  2. **Idempotent merge.** Keep-latest (seq desc, tie-break desc) is
  *     idempotent: re-merging a batch the sink already applied changes
  *     nothing. `foreachBatch` re-delivers the in-flight batch after a
  *     crash (at-least-once), so idempotence is exactly what upgrades
  *     the table contents to exactly-once across restarts — proven by
  *     the kill/restart spec (StreamRecoverySpec) the same way
  *     f1/f2/f3's sinks are.
  *  3. **Isolation caveat, stated honestly.** Plain parquet has no
  *     snapshot isolation: the merge job reads the buckets it is about
  *     to replace, so the merged batch is pinned with an EAGER
  *     localCheckpoint before the overwrite (the lineage must not
  *     re-read files the commit deletes). That is safe single-writer
  *     (which `foreachBatch` guarantees within one query); concurrent
  *     writers need a table format with MVCC commits (Delta/Iceberg) —
  *     the plumbing here (bucket layout, pruned read, keep-latest
  *     merge) carries over unchanged.
  */
object Upsert {

  /** Merge one batch into the keyed parquet state table at `tablePath`,
    * keeping the latest row per `keyCol` (by `seqCol`, ties by
    * `tieCol`). Creates the table on first call. Idempotent.
    *
    * The read-merge-overwrite critical section runs under a
    * [[graft.sources.LandingLease]] (same guard as the a8 lander):
    * foreachBatch guarantees one live merge per QUERY, but nothing
    * stops an operator error from starting a second query on the same
    * table — two interleaved dynamic overwrites would corrupt buckets.
    * A second writer fails fast with ConcurrentLandingException; a
    * crashed writer's stale lease (past `leaseMs`) is taken over. */
  def upsertIntoTable(spark: SparkSession, batch: DataFrame, tablePath: String,
                      keyCol: String, seqCol: String, tieCol: String,
                      nBuckets: Int, leaseMs: Long = 15 * 60 * 1000L): Unit = {
    val leaseFs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tablePath), spark.sparkContext.hadoopConfiguration)
    leaseFs.mkdirs(new org.apache.hadoop.fs.Path(tablePath)) // lease marker needs the dir
    val token = graft.sources.LandingLease.acquire(leaseFs, tablePath, leaseMs)
    try upsertLocked(spark, batch, tablePath, keyCol, seqCol, tieCol, nBuckets)
    finally graft.sources.LandingLease.release(leaseFs, tablePath, token)
  }

  private def upsertLocked(spark: SparkSession, batch: DataFrame, tablePath: String,
                           keyCol: String, seqCol: String, tieCol: String,
                           nBuckets: Int): Unit = {
    val bucketed = batch.withColumn("bucket", pmod(hash(col(keyCol)), lit(nBuckets)))
    // batch-local keep-latest first: the merge input shrinks to one row
    // per key before any table bytes are read
    val batchLatest = graft.ingest.Ingest.dedupKeepLatest(
      bucketed, Seq(keyCol), seqCol, tieCol)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tablePath), spark.sparkContext.hadoopConfiguration)
    // "table exists" = has bucket partitions, not "directory exists" —
    // the lease marker (and its parent mkdirs) precede the first merge
    val exists = fs.listStatus(new org.apache.hadoop.fs.Path(tablePath))
      .exists(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
    val merged =
      if (!exists) batchLatest
      else {
        // touched-bucket list is bounded by nBuckets — a driver-safe pull
        val touched = batchLatest.select(col("bucket")).distinct()
          .collect().map(_.getInt(0)).toSeq
        val existing = spark.read.parquet(tablePath)
          .filter(col("bucket").isin(touched: _*))
        graft.ingest.Ingest.dedupKeepLatest(
          existing.unionByName(batchLatest), Seq(keyCol), seqCol, tieCol)
      }
    // eager pin: the overwrite below deletes the very files `merged`'s
    // lineage would re-read (contract 3)
    val pinned = merged.localCheckpoint(true)
    graft.sources.Sources.relandPartitions(pinned, tablePath, Seq("bucket"))
  }

  /** The streaming sink: every micro-batch upserts into `tablePath`.
    * Trigger.AvailableNow by default — drains the source then stops,
    * the batch-job-shaped run Verify and the specs use; pass a
    * processing-time trigger for an always-on pipeline. */
  def streamUpsert(stream: DataFrame, tablePath: String, checkpointDir: String,
                   keyCol: String, seqCol: String, tieCol: String,
                   nBuckets: Int,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertIntoTable(batch.sparkSession, batch, tablePath,
          keyCol, seqCol, tieCol, nBuckets)
      }.start()

  /** Read the maintained state table (bucket column dropped — layout is
    * an implementation detail of the sink, not part of the row). */
  def readTable(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(tablePath).drop("bucket")
}
