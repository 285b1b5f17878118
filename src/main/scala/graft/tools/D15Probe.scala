package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.DataFrame

/** Stage-level probe for the d15 super-linear decade tail (round-9
  * verdict item 2): runs part-pair counting on SPARK_GRAFT_SF_DIR and
  * prints, per completed stage, the task time, shuffle read/write
  * volume, and memory/disk SPILL — the three candidate mechanisms the
  * verdict names (pair-aggregate spill, lost ReusedExchange, genuine
  * bytes) separate cleanly on these counters. Optional arg selects a
  * variant: `current` (default) or `twolevel` (order-salted two-level
  * pair aggregation). Not part of the library surface. */
object D15Probe {
  private final class StageTable extends SparkListener {
    case class Row(id: Int, name: String, tasks: Int, taskSec: Double,
                   gcSec: Double,
                   inRec: Long, srMB: Double, swMB: Double,
                   spillMemMB: Double, spillDiskMB: Double, outRec: Long)
    val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val si = sc.stageInfo
      val m = si.taskMetrics
      rows += Row(si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
        m.executorRunTime / 1e3, m.jvmGCTime / 1e3,
        m.inputMetrics.recordsRead,
        m.shuffleReadMetrics.totalBytesRead / 1e6,
        m.shuffleWriteMetrics.bytesWritten / 1e6,
        m.memoryBytesSpilled / 1e6, m.diskBytesSpilled / 1e6,
        m.shuffleWriteMetrics.recordsWritten)
    }
    def dump(): Unit = {
      println(f"${"stage"}%5s ${"tasks"}%5s ${"taskSec"}%8s ${"gcSec"}%8s ${"inRec"}%12s ${"shRdMB"}%9s ${"shWrMB"}%9s ${"spillM"}%9s ${"spillD"}%9s ${"shWrRec"}%12s  name")
      rows.sortBy(_.id).foreach { r =>
        println(f"${r.id}%5d ${r.tasks}%5d ${r.taskSec}%8.1f ${r.gcSec}%8.1f ${r.inRec}%12d ${r.srMB}%9.1f ${r.swMB}%9.1f ${r.spillMemMB}%9.1f ${r.spillDiskMB}%9.1f ${r.outRec}%12d  ${r.name}")
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val variant = args.headOption.getOrElse("current")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus.toInt, "d15-probe")
    spark.sparkContext.setLogLevel("WARN")
    val listener = new StageTable
    spark.sparkContext.addSparkListener(listener)
    // conf overrides a variant installs, restored after the timed run
    // (the exec choice is read at PHYSICAL planning time, i.e. during
    // materialize — restoring any earlier would defeat the variant;
    // restoring at all keeps a same-JVM caller from inheriting it)
    var restoreConf: () => Unit = () => ()
    val df: DataFrame = variant match {
      case "current" =>
        graft.analytics.Analytics.partPairCounts(graft.Tables.lineitem(spark, sfDir), 100)
      case "selfjoin" => {
        // the PRE-round-9 formulation, kept for reproducing the study:
        // distinct (order, part) projection self-joined on the order
        // key — three sort-heavy exchanges of the fact table; spilled
        // 41 GB and ran 3.8x/3x super-linear at sf30
        import org.apache.spark.sql.functions._
        val li = graft.Tables.lineitem(spark, sfDir)
        val items = li
          .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
          .select(col("l_orderkey").as("__o"), col("l_partkey").as("__p"))
          .distinct()
        items.as("a").join(items.as("b"),
            col("a.__o") === col("b.__o") && col("a.__p") < col("b.__p"))
          .groupBy(col("a.__p").as("part_a"), col("b.__p").as("part_b"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
          .limit(100)
      }
      case "d18" =>
        graft.analytics.Analytics.basketLift(graft.Tables.lineitem(spark, sfDir), 100)
      case "sortagg" =>
        // same plan but the basket collect_set runs as SortAggregate
        // (radix-sorted UnsafeRows, one group buffer at a time) instead
        // of ObjectHashAggregate (44M boxed set objects → GC)
        val key = "spark.sql.execution.useObjectHashAggregateExec"
        val prior = spark.conf.getOption(key)
        spark.conf.set(key, "false")
        restoreConf = () => prior match {
          case Some(v) => spark.conf.set(key, v)
          case None    => spark.conf.unset(key)
        }
        graft.analytics.Analytics.partPairCounts(graft.Tables.lineitem(spark, sfDir), 100)
      case other => sys.error(s"unknown variant $other")
    }
    println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    val t0 = System.nanoTime()
    try graft.Bench.materialize(df) finally restoreConf()
    val dt = (System.nanoTime() - t0) / 1e9
    Thread.sleep(2000) // let the last stage-completed events drain
    println(f"\n=== d15/$variant on $sfDir: $dt%.1f s ===")
    listener.dump()
    spark.stop()
  }
}
