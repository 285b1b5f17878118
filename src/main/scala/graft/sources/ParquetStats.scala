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
}
