package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Sources and sinks — the reference's CSV save / object-store layout
  * (data_extraction.py:135-172, airflow_dag.py upload paths)
  * re-expressed as schema-enforced Spark IO.
  *
  * Reads take an EXPLICIT schema (never inferSchema — a schema-inference
  * pass over 100 TB is a full extra scan, and drifting inputs should
  * fail loudly, not silently re-type). Malformed rows are quarantined
  * via PERMISSIVE mode + corrupt-record capture instead of killing the
  * job. Sinks write parquet partitioned by business keys — the layout
  * that turns downstream time/key predicates into partition pruning —
  * with CSV kept for interop parity with the reference.
  */
object Sources {

  val corruptCol = "_corrupt_record"

  /** Schema-enforced CSV read; malformed lines land in `_corrupt_record`
    * instead of aborting (PERMISSIVE). Pair with validRecords /
    * corruptRecords to split the quarantine. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("timestampFormat", timestampFormat)
      .schema(schema.add(corruptCol, "string"))
      .csv(path)

  /** Both split helpers cache the parsed frame first: Spark disallows
    * queries whose only referenced column from a raw CSV scan is the
    * corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN — column
    * pruning reduces a quarantine count to exactly that), and the
    * documented remedy is materializing the parse. A quarantine split
    * wants that anyway: one parse pass feeds both sides. cache() is
    * idempotent on the same plan, so valid + corrupt share one entry.
    * At 100 TB, land the parsed frame to parquet once instead. */
  def validRecords(df: DataFrame): DataFrame =
    df.cache().filter(col(corruptCol).isNull).drop(corruptCol)

  def corruptRecords(df: DataFrame): DataFrame =
    df.cache().filter(col(corruptCol).isNotNull)

  /** Plant a raw CSV part file into a landed directory — the
    * fault-injection fixture for the g12 rescue audit: a crashed or
    * buggy upstream writer leaves a torn part alongside the good ones,
    * and the rescue read must quarantine its rows rather than abort
    * the scan or silently coerce garbage. Driver-side write through
    * the Hadoop FS API so the same call works on any filesystem the
    * session can reach. */
  def appendRawCsvPart(spark: SparkSession, dirPath: String, name: String,
                       content: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dirPath, name)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
  }

  /** CSV sink (save_data_to_csv parity). Seconds-precision timestamp
    * format keeps the roundtrip lossless for the canonical feed. */
  def writeCsv(df: DataFrame, path: String,
               timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", timestampFormat)
      .csv(path)

  /** Partitioned parquet sink: the at-scale layout (one directory per
    * partition key value; downstream filters on the key prune entire
    * partitions at planning time). */
  def writePartitionedParquet(df: DataFrame, path: String,
                              partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Read back a partitioned parquet sink. */
  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Dynamic-partition-overwrite re-land — the idempotent form of the
    * reference's scheduled full re-land to the object store
    * (airflow_dag.py's extract task re-writing the bucket via
    * save_to_minio, data_extraction.py:140): `overwrite` mode with
    * `partitionOverwriteMode=dynamic` replaces ONLY the partitions the
    * batch actually contains, byte-leaving every sibling partition in
    * place. This is the re-land a scheduled pipeline needs at 100 TB —
    * re-running one day can never truncate the other 36,499 day
    * directories the static mode would drop. The option is set on the
    * write (not the session), so surrounding jobs keep static
    * semantics. */
  def relandPartitions(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write
      .option("partitionOverwriteMode", "dynamic")
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** JSON-lines sink (one object per line — the interchange format
    * most raw corpora land in). Seconds-precision timestamps keep the
    * roundtrip lossless for the canonical feed. */
  def writeJsonl(df: DataFrame, path: String,
                 timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", timestampFormat)
      .json(path)

  /** Schema-enforced JSON-lines read with PERMISSIVE corrupt-record
    * quarantine — same contract as [[readCsv]]: explicit schema (no
    * inference scan at 100 TB), malformed lines land in
    * `_corrupt_record` instead of aborting. */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
                timestampFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", corruptCol)
      .option("timestampFormat", timestampFormat)
      .schema(schema.add(corruptCol, "string"))
      .json(path)

  /** Schema-evolution read: union the schemas of every file in a
    * parquet sink whose batches were written under DIFFERENT (widening)
    * schemas — columns absent in older batches surface as nulls. This
    * is how a long-lived 100 TB corpus actually looks after a year of
    * pipeline changes. `mergeSchema` reads every file FOOTER (not data)
    * at planning time — bounded but not free at millions of files, so
    * production tables pin the merged schema in a catalog; this read is
    * the discovery/backfill path. */
  def readMergedParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** ORC sink — the columnar interchange format for engines outside the
    * parquet ecosystem (Hive/Trino warehouses). Same footprint rules as
    * the parquet sink: columnar, compressed, splittable. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Schema-enforced ORC read — explicit schema like every other read
    * here (no inference pass; ORC carries types but the declared schema
    * is the contract drifting inputs are checked against). */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Bucketed table sink — the 100 TB fact-fact join layout: rows are
    * hash-bucketed (and sorted) on the join key at WRITE time, so a
    * later equi-join of two tables bucketed into the same count plans
    * with ZERO Exchange — bucket co-location replaces the shuffle that
    * would otherwise move both fact tables. `saveAsTable` is required:
    * bucket metadata lives in the catalog, not the files. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a location left behind by a previous session (not in THIS catalog)
    // still blocks CTAS with LOCATION_ALREADY_EXISTS — clear it
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol).saveAsTable(table)
  }

  /** Read a bucketed table back (bucket metadata intact). */
  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Small-file compaction — the maintenance chore every scheduled
    * pipeline accumulates: each incremental land (a5/a8) writes a few
    * files, and after a year a day-partition holds thousands of
    * kilobyte parquet files whose per-file open/footer cost dominates
    * scans (and whose listing dominates planning). Rewrites a directory
    * into ceil(bytes / targetBytes) files of even size.
    *
    * Sizing comes from the filesystem (one directory listing — no data
    * read), summing DATA files only: _SUCCESS / .crc / checksum
    * sidecars would inflate the byte total and over-split the output.
    * The file count tracks the REAL byte volume, not a guessed row
    * count — though targetBytes is approximate under compression-ratio
    * shift: the round-robin shuffle destroys whatever value clustering
    * the source files had, so when that clustering compressed unusually
    * well the rewritten files can overshoot targetBytes by the ratio
    * change (sortWithinPartitions before the write if tight output
    * sizing matters). The rewrite uses `repartition(n)`
    * (round-robin): one full shuffle, but every output file lands
    * within a row of even — `coalesce(n)` would skip the shuffle and
    * glue adjacent input files, inheriting whatever skew the small
    * files had (and capping read parallelism at n for the whole
    * rewrite). Compaction is a bytes-bound batch job; the shuffle IS
    * the cost you signed up for, and it buys deterministic layout.
    * Content is layout-invariant: the read-back equals the source
    * row-for-row (the g8 oracle), only the file boundaries move.
    *
    * At 100 TB this runs per-partition (compact yesterday's partition
    * after the last late batch), never over the whole table; pass the
    * partition directory as `srcPath`. */
  def compactParquet(spark: SparkSession, srcPath: String, dstPath: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(spark.sessionState.newHadoopConf())
    val bytes = fs.listStatus(src).iterator
      .filter(st => st.isFile && isDataFile(st.getPath.getName))
      .map(_.getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(srcPath).repartition(n)
      .write.mode("overwrite").parquet(dstPath)
    spark.read.parquet(dstPath)
  }

  /** Range-sorted data layout — the scan-pruning lever compaction
    * alone doesn't give. `repartitionByRange` on the clustering key
    * slices the domain into `nFiles` DISJOINT key ranges (one range
    * exchange — sampled boundaries, no full sort), and the
    * within-partition sort makes every row group's footer min/max
    * tight. A predicate on the key then skips whole files and row
    * groups at READ time via exactly those stats — on an unsorted
    * layout every file spans the whole domain and nothing can skip.
    * At 100 TB this is the difference between a time-range query
    * touching one day's files and touching all 36,500: layout work is
    * one extra shuffle at write time, amortized over every read.
    * Content is layout-invariant (the oracle is the plain feed);
    * the disjointness property itself is asserted from footer stats
    * ([[ParquetStats.columnRange]]) in SourcesSpec. */
  def writeSortedLayout(df: DataFrame, path: String, rangeCol: String,
                        nFiles: Int): DataFrame = {
    df.repartitionByRange(nFiles, col(rangeCol))
      .sortWithinPartitions(rangeCol)
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  /** Z-order (Morton-interleaved) TWO-column layout (round 8) — the
    * multi-dimensional pruning lever [[writeSortedLayout]] cannot give:
    * a single-key range sort makes predicates on THAT key skip files,
    * but every file still spans the full domain of every other column.
    * Interleaving the bits of both columns' normalized values into one
    * z-value and range-partitioning on IT gives every file a tight
    * min/max box in BOTH dimensions (a 16-file layout ≈ a 4×4 grid),
    * so a point/range predicate on EITHER column skips ~√nFiles of the
    * files via footer stats alone — the Delta/Iceberg OPTIMIZE ZORDER
    * move, done with one range exchange at write time.
    *
    * Both columns quantize to `bits`-bit grid cells by min/max affine
    * scaling (decimal intermediates, no overflow at any span); the
    * z-value is a codegen'd fold of shift/mask terms — no UDF. The
    * domain [min, max] pair comes from one metadata-cheap aggregate;
    * a production deployment reads it from catalog/footer stats
    * ([[ParquetStats.columnRange]]) instead. Content is
    * layout-invariant (the oracle is the plain feed); the two-sided
    * pruning property is asserted from footer stats in SourcesSpec,
    * z-ordered vs single-key-sorted control. */
  def writeZorderLayout(df: DataFrame, path: String, colA: String,
                        colB: String, nFiles: Int, bits: Int = 16): DataFrame = {
    require(nFiles > 0, "nFiles must be positive")
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val stats = df.agg(
      min(col(colA).cast("long")), max(col(colA).cast("long")),
      min(col(colB).cast("long")), max(col(colB).cast("long"))).head()
    require(!stats.anyNull, s"z-order columns $colA/$colB are all-null")
    val m = (1L << bits) - 1
    def quant(c: Column, mn: Long, mx: Long): Column = {
      val span = math.max(mx - mn, 1L)
      floor(((c.cast("long") - mn).cast("decimal(38,0)") * m) / span).cast("long")
    }
    val qa = quant(col(colA), stats.getLong(0), stats.getLong(1))
    val qb = quant(col(colB), stats.getLong(2), stats.getLong(3))
    val z = (0 until bits).foldLeft(lit(0L): Column) { (acc, i) =>
      acc.bitwiseOR(shiftleft(shiftright(qa, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(qb, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
  }

  private def isDataFile(name: String): Boolean =
    name.endsWith(".parquet") || name.endsWith(".snappy.parquet")

  /** Data files (not _SUCCESS/metadata) under a sink path — the
    * compaction spec's file-count probe. */
  def dataFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p).toSeq.map(_.getPath.getName).filter(isDataFile)
  }

  // ------------------------------------------------------------------
  // Versioned snapshot table (round 9) — manifest-gated, append-only.
  // ------------------------------------------------------------------

  /** Append a new VERSION to a manifest-gated snapshot table — the
    * portable re-expression of a lakehouse table's time travel, and
    * the atomic-publish discipline the reference's object-store
    * re-lands lack (a crashed writer must never leave a half-visible
    * dataset). Layout: data lands under `data/v<N>/` (never rewritten
    * — versions share history by construction), then the manifest
    * `manifest_<N>` is written LAST, listing every data directory the
    * version comprises. The manifest write is the publish point:
    * readers resolve versions ONLY through manifests, so a crash
    * after the data write but before the manifest leaves an orphan
    * directory that no read will ever see (SourcesSpec plants one and
    * proves it invisible). Returns the new version number.
    *
    * The manifest itself publishes atomically: it is written to a
    * dot-prefixed temp name (which the `manifest_` prefix filter in
    * [[currentVersion]] ignores) and renamed into place — rename is
    * atomic on HDFS and local filesystems, so a crash mid-write leaves
    * only an invisible temp file, never a partial manifest that
    * [[currentVersion]] would count as published.
    *
    * Scale shape: the manifest is a few hundred bytes regardless of
    * data volume; a version read opens exactly the listed directories
    * (no full-table listing); history costs nothing until read.
    * Concurrent writers are out of scope here — serialize them with
    * [[LandingLease]] like the a8/f8 sinks. */
  def appendVersion(df: DataFrame, spark: SparkSession, table: String): Long = {
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val prev = currentVersion(spark, table)
    val next = prev + 1
    df.write.mode("overwrite").parquet(s"$table/data/v$next")
    // the new manifest extends the PREVIOUS version's directory list
    // (not a blind v1..vN enumeration): after an [[overwriteVersion]]
    // the chain restarts from the rewrite, so retention can actually
    // free the pre-rewrite directories. Pure-append tables still
    // produce manifest_N = v1..vN, byte-identical to the round-9 form.
    val dirs = (if (prev == 0) Seq.empty else manifestDirs(fs, root, prev, table)) :+
      s"data/v$next"
    publishManifest(fs, root, next, dirs, table)
    next
  }

  /** Publish a full-snapshot REWRITE as the next version: the manifest
    * lists ONLY the new data directory, cutting the chain to every
    * older directory. This is the compaction/rewrite move of a real
    * snapshot store (squash N appends into one laid-out snapshot —
    * pair with [[writeSortedLayout]]-style rewrites); history is still
    * intact (older manifests keep reading their own snapshots) until
    * [[retainVersions]] expires them — at which point the pre-rewrite
    * directories become unreferenced and reclaimable, which is what
    * gives retention GC real bytes to free. */
  def overwriteVersion(df: DataFrame, spark: SparkSession, table: String): Long = {
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val next = currentVersion(spark, table) + 1
    df.write.mode("overwrite").parquet(s"$table/data/v$next")
    publishManifest(fs, root, next, Seq(s"data/v$next"), table)
    next
  }

  /** Keep-newest-N retention GC for a versioned snapshot table — the
    * reference's cleanup_old_files chore (airflow_dag.py:570-631)
    * re-expressed against the manifest store: expire every version
    * older than the newest `keepLast`, then reclaim data directories
    * no surviving manifest references. Returns
    * (expired version numbers, deleted data directory names).
    *
    * Crash-ordered for the publish contract: expired MANIFESTS are
    * deleted first (removing the publish points — after this the
    * versions read as never-published), and only then are
    * unreferenced data directories reclaimed. A crash between the two
    * phases leaves orphan directories that no read can see (the g13
    * invisibility contract) and that the next retention run sweeps —
    * the operation is idempotent. Reclamation also sweeps orphans
    * from torn publishes, but ONLY directories numbered at or below
    * the newest live version: an in-flight writer's landed-but-not-
    * yet-published directory is always numbered above it and is never
    * touched. Lease-guarded ([[LandingLease]]) like every directory
    * mutator, so two schedulers firing the same target serialize.
    *
    * Scale shape: pure metadata work — one directory listing plus one
    * few-hundred-byte manifest read per live version; data deletes are
    * directory-level. Nothing scans table bytes. */
  def retainVersions(spark: SparkSession, table: String,
                     keepLast: Int): (Seq[Long], Seq[String]) = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return (Seq.empty, Seq.empty)
    val token = LandingLease.acquire(fs, table, leaseMs = 10 * 60 * 1000L)
    try {
      val versions = listVersions(spark, table)
      val live = versions.takeRight(keepLast)
      val expired = versions.dropRight(keepLast)
      expired.foreach(v =>
        fs.delete(new org.apache.hadoop.fs.Path(root, s"manifest_$v"), false))
      val referenced = live.flatMap(v => manifestDirs(fs, root, v, table)).toSet
      val maxLive = live.lastOption.getOrElse(0L)
      val dataRoot = new org.apache.hadoop.fs.Path(root, "data")
      val removable =
        if (!fs.exists(dataRoot)) Seq.empty
        else fs.listStatus(dataRoot).toSeq.filter(_.isDirectory).map(_.getPath)
          .filter { p =>
            val n = p.getName
            !referenced.contains(s"data/$n") &&
              n.startsWith("v") && n.drop(1).forall(_.isDigit) &&
              n.drop(1).toLong <= maxLive
          }
      removable.foreach(p => fs.delete(p, true))
      (expired, removable.map(p => s"data/${p.getName}"))
    } finally LandingLease.release(fs, table, token)
  }

  /** All published (manifest-gated) versions, ascending. */
  def listVersions(spark: SparkSession, table: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("manifest_"))
      .map(_.stripPrefix("manifest_").toLong)
      .sorted
  }

  /** Highest published (manifest-gated) version, 0 when none. */
  def currentVersion(spark: SparkSession, table: String): Long =
    listVersions(spark, table).lastOption.getOrElse(0L)

  /** Data directory names currently on disk under `table/data` —
    * retention-spec probe (referenced and orphaned alike). */
  def versionDataDirs(spark: SparkSession, table: String): Seq[String] = {
    val dataRoot = new org.apache.hadoop.fs.Path(table, "data")
    val fs = dataRoot.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(dataRoot)) Seq.empty
    else fs.listStatus(dataRoot).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
  }

  /** Read a snapshot AS OF `version` — exactly the directories its
    * manifest lists, nothing else (orphan data from torn writes is
    * invisible; later versions do not leak in). */
  def readVersion(spark: SparkSession, table: String, version: Long): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(table)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = manifestDirs(fs, root, version, table)
    spark.read.parquet(dirs.map(d => s"$table/$d"): _*)
  }

  /** Atomic manifest publish: write to a dot-prefixed temp (invisible
    * to the `manifest_` prefix filter) and rename into place. */
  private def publishManifest(fs: org.apache.hadoop.fs.FileSystem,
                              root: org.apache.hadoop.fs.Path, version: Long,
                              dirs: Seq[String], table: String): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(root, s".manifest_$version.tmp")
    val out = fs.create(tmp, true)
    try out.write(dirs.mkString("\n").getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmp, new org.apache.hadoop.fs.Path(root, s"manifest_$version")))
      throw new java.io.IOException(s"failed to publish manifest_$version in $table")
  }

  /** The directory list a published manifest carries; throws on a
    * never-published version and rejects empty (torn) manifests. */
  private def manifestDirs(fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path, version: Long,
                           table: String): Seq[String] = {
    val mf = new org.apache.hadoop.fs.Path(root, s"manifest_$version")
    require(fs.exists(mf), s"version $version was never published in $table")
    val in = fs.open(mf)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val dirs = body.split("\n").toSeq.filter(_.nonEmpty)
    require(dirs.nonEmpty, s"manifest_$version in $table is empty (torn publish?)")
    dirs
  }
}
