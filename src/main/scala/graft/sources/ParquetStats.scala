package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Catalog-style statistics read from parquet FOOTER metadata — no
  * Spark job, no data pages, just the per-file footer each writer
  * already produced. This is the "catalog row-count stat" the
  * LSH-banding gates (e22/e37/e38) need to size `autoPlanes`: a
  * `df.count()` there is a whole column-pruned scan JOB per query
  * invocation, while the footer total is a driver-side metadata read —
  * the same numbers a real lakehouse catalog (HMS/Iceberg/Delta)
  * serves from its table stats.
  *
  * Scale contract: cost is O(files) driver-side footer opens, not
  * O(rows) — at 100 TB a partition-pruned directory is thousands of
  * files, and a catalog would cache this per snapshot; here the read
  * itself is the cache-miss path. Parquet footers are REQUIRED by the
  * format to carry exact row counts per row group, so the total is
  * exact, not an estimate — it can only diverge from a scan while a
  * writer is mid-commit, which is exactly when a catalog snapshot
  * would not have been published either. */
object ParquetStats {

  /** Exact row count of a parquet file or directory (recursive), summed
    * from footer metadata. Non-data sidecars (_SUCCESS, .crc, committer
    * staging) are skipped by the same data-file filter the sinks use. */
  def rowCount(spark: SparkSession, path: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && name.endsWith(".parquet") && !name.startsWith("_") &&
          !name.startsWith("."))
          buf += st.getPath
      }
      buf
    }
    files.iterator.map { f =>
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try rd.getFooter.getBlocks.asScala.iterator.map(_.getRowCount).sum
      finally rd.close()
    }.sum
  }

  /** Per-file (min, max) of an integer-physical column (INT32/INT64 —
    * which covers longs and µs timestamps), read from footer statistics
    * only. This is the metadata a reader's predicate pushdown skips
    * whole files/row groups WITH — so it is also the honest way to TEST
    * a data layout: after [[Sources.writeSortedLayout]], these ranges
    * must be pairwise disjoint (each file owns one key range); on an
    * unsorted write every file spans ~the whole domain and nothing can
    * skip. Driver-side footer opens, O(files), no data pages. */
  def columnRange(spark: SparkSession, path: String,
                  column: String): Seq[(String, Long, Long)] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Path]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && name.endsWith(".parquet") && !name.startsWith("_") &&
          !name.startsWith("."))
          buf += st.getPath
      }
      buf
    }
    files.iterator.map { f =>
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        val ranges = rd.getFooter.getBlocks.asScala.iterator.flatMap { block =>
          block.getColumns.asScala.iterator
            .filter(_.getPath.toDotString == column)
            .map { cc =>
              val st = cc.getStatistics
              require(st != null && !st.isEmpty, s"no stats for $column in $f")
              (st.genericGetMin, st.genericGetMax) match {
                case (mn: java.lang.Long, mx: java.lang.Long) => (mn.toLong, mx.toLong)
                case (mn: java.lang.Integer, mx: java.lang.Integer) => (mn.toLong, mx.toLong)
                case other => sys.error(s"non-integer stats for $column: $other")
              }
            }
        }.toSeq
        (f.getName, ranges.map(_._1).min, ranges.map(_._2).max)
      } finally rd.close()
    }.toSeq
  }

  /** Distributed ANALYZE from footers only (round 8) — the
    * table-stats catalog build: per integer-physical column, exact
    * (n_rows, n_nulls, min_v, max_v) assembled purely from parquet
    * footer statistics. ZERO data pages are read: each task opens its
    * files' footers (a few KB apiece), emits per-column partials, and
    * a tiny groupBy folds them — the op that keeps every other
    * operator honest about "read the catalog, not the corpus"
    * (autoPlanes sizing, g9/g10 pruning proofs, a12 planning). Footer
    * stats are exact by format contract (row counts required;
    * min/max/null_count written by every mainstream writer — we
    * REQUIRE them and fail loudly on a writer that omitted them,
    * because a silent fallback to scanning would defeat the point).
    *
    * Scale shape: the driver touches only the file LISTING; footer
    * opens are distributed (one partition per ~file — at 100 TB the
    * work is thousands of independent KB-sized reads, the
    * embarrassingly-parallel case mapPartitions exists for). The
    * partial-stats table is files×columns rows; its groupBy is
    * column-cardinality-bounded. */
  def analyzeTable(spark: SparkSession, path: String,
                   columns: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(columns.nonEmpty, "at least one column")
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val files = {
      val it = fs.listFiles(p, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (st.isFile && name.endsWith(".parquet") && !name.startsWith("_") &&
          !name.startsWith("."))
          buf += st.getPath.toString
      }
      buf.toSeq
    }
    require(files.nonEmpty, s"no parquet data files under $path")
    val bc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(conf))
    val cols = columns
    spark.createDataset(files)
      .repartition(math.max(1, math.min(files.size,
        spark.sparkContext.defaultParallelism)))
      .mapPartitions { it =>
        val c = bc.value.value
        it.flatMap { f =>
          val rd = ParquetFileReader.open(
            HadoopInputFile.fromPath(new Path(f), c))
          try {
            val blocks = rd.getFooter.getBlocks.asScala.toSeq
            cols.map { colName =>
              var rows = 0L
              var nulls = 0L
              var mn: Option[Long] = None
              var mx: Option[Long] = None
              var found = false
              blocks.foreach { block =>
                rows += block.getRowCount
                block.getColumns.asScala
                  .filter(_.getPath.toDotString == colName).foreach { cc =>
                    found = true
                    val st = cc.getStatistics
                    require(st != null && !st.isEmpty,
                      s"writer omitted stats for $colName in $f")
                    nulls += st.getNumNulls
                    if (st.hasNonNullValue) {
                      val (a, b) = (st.genericGetMin, st.genericGetMax) match {
                        case (x: java.lang.Long, y: java.lang.Long) =>
                          (x.toLong, y.toLong)
                        case (x: java.lang.Integer, y: java.lang.Integer) =>
                          (x.toLong, y.toLong)
                        case other =>
                          sys.error(s"non-integer stats for $colName: $other")
                      }
                      mn = Some(mn.fold(a)(math.min(_, a)))
                      mx = Some(mx.fold(b)(math.max(_, b)))
                    }
                  }
              }
              require(found, s"column $colName absent from $f")
              (colName, rows, nulls, mn, mx)
            } // strict Seq.map: fully materialized before the close below
          } finally rd.close()
        }
      }
      .toDF("column_name", "__rows", "__nulls", "__mn", "__mx")
      .groupBy(F.col("column_name"))
      .agg(F.sum(F.col("__rows")).as("n_rows"),
        F.sum(F.col("__nulls")).as("n_nulls"),
        F.min(F.col("__mn")).as("min_v"), F.max(F.col("__mx")).as("max_v"))
  }
  private val F = org.apache.spark.sql.functions

  /** Snapshot stats drift (round 11, b22): compare two table
    * snapshots' per-column footer stats — the schema/profile gate a
    * pipeline runs BEFORE accepting a re-land (the reference re-lands
    * its full extract every run; this is the "did the new extract's
    * profile move" check, priced at footer reads only). Emits per
    * column both sides' (rows, nulls, min, max) plus two flags:
    * `range_extended` (the new snapshot's value range escapes the
    * old's — new ids/regions appeared) and `null_rate_up` (null rate
    * more than doubled, decided in exact integer cross-multiplication
    * — n_nulls_b·n_rows_a > 2·n_nulls_a·n_rows_b; products stay under
    * 2⁶³ through ~10⁹-row × 10⁹-null snapshots, far past any single
    * snapshot this gate prices). All-null columns carry null min/max;
    * the range flag treats an unknowable range as not-extended
    * (coalesce false) rather than poisoning the verdict. */
  def statsDrift(spark: SparkSession, pathA: String, pathB: String,
                 columns: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val a = analyzeTable(spark, pathA, columns).select(col("column_name"),
      col("n_rows").as("n_rows_a"), col("n_nulls").as("n_nulls_a"),
      col("min_v").as("min_a"), col("max_v").as("max_a"))
    val b = analyzeTable(spark, pathB, columns).select(col("column_name"),
      col("n_rows").as("n_rows_b"), col("n_nulls").as("n_nulls_b"),
      col("min_v").as("min_b"), col("max_v").as("max_b"))
    a.join(b, Seq("column_name"))
      .withColumn("range_extended",
        coalesce(col("min_b") < col("min_a"), lit(false)) ||
          coalesce(col("max_b") > col("max_a"), lit(false)))
      .withColumn("null_rate_up",
        col("n_nulls_b") * col("n_rows_a") > col("n_nulls_a") * col("n_rows_b") * 2)
  }
}
