package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory for the engine (SURVEY.md §4/§5).
  *
  * One place to hold the scale posture: AQE with skew-join handling on
  * (runtime re-planning replaces hand-tuned partition counts at 100 TB),
  * UTC session time so timestamp semantics match the DuckDB oracle and
  * any cluster deployment, and shuffle partitions sized to the actual
  * parallelism instead of the 200 default.
  */
object GraftSession {
  def build(master: String, shufflePartitions: Int,
            appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // 64 MB broadcast budget (default 10 MB is sized for small-heap
      // executors): lets AQE broadcast mid-size build sides it measures
      // at runtime — e.g. e4's 50k-doc gram-array table at sf1 (~55 MB),
      // which otherwise drags ~7 GB of candidate×array rows through a
      // sort-merge shuffle. Sides that outgrow the budget at real scale
      // fall back to shuffle automatically, so this is a per-run
      // decision from measured sizes, not a plan-time gamble.
      .config("spark.sql.autoBroadcastJoinThreshold", (64 * 1024 * 1024).toString)
      // Scan-partition granularity sized to the parallelism (SURVEY §5,
      // round 9): the defaults (128 MB max + 4 MB open cost) PACK small
      // part-files until a mid-size table scans in 3-5 tasks — at sf10
      // the 57 MB documents table read on 4 of 32 cores and every
      // narrow map-only operator paid ~4x (e10 17.5 -> ~4 s solo). At
      // 100 TB the same math holds per executor: partitions should be
      // sized so the WAVE COUNT matches the cluster, not the file
      // layout. 16 MB / 512 KB keeps small-file packing (thousands of
      // tiny files still coalesce) while letting tables from ~0.5 GB
      // up scan at full parallelism.
      .config("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512 * 1024).toString)
      // collect_set/collect_list run on ObjectHashAggregate, which falls
      // back to SORT-based aggregation after only 128 distinct groups per
      // partition — every signature-building aggregation (gram sets,
      // minhash bands) would pay an extra sort of the exploded rows.
      // 128k keeps those hash-based with a safety valve for genuinely
      // huge per-partition group counts.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      // hugeMethodLimit stays at Spark's 64 KB default DELIBERATELY
      // (round 12): tools/CodegenSizeAudit found 3 stages surface-wide
      // whose largest generated method exceeds the JVM JIT's ~8 KB
      // threshold (e3/e53/e56 at 8.3-9.1 KB). Setting the limit to
      // 8000 de-fuses those stages — measured STRICTLY WORSE at sf0.1
      // (e3 1.21→7.52 s, e53 1.66→4.25 s min-of-3): a slightly-over
      // glue method still runs its hot inner loops through JIT-compiled
      // sub-methods, while losing whole-stage fusion costs per-row
      // virtual calls everywhere. The real cure for a GROSSLY oversized
      // method is shrinking the kernel (the e62 PqReconstruct fusion,
      // 5x), never de-fusing the stage.
      .config("spark.sql.session.timeZone", "UTC")
      // Feeds carrying TIMESTAMP(NANOS) parquet timestamps (events) are
      // read as nanos-since-epoch longs — set once at session build so
      // table loaders never mutate session state (racy as a library).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed tables (Sources.writeBucketed) land outside the repo
      .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
      // native expressions as SQL functions (array_dot, array_norm2)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
}
