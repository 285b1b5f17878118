package graft.timeseries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-at-or-before) join — the time-series join Spark
  * has no native operator for (joining each observation to the latest
  * reference row ≤ its timestamp: prices to trades, scaler/forecast
  * versions to events, config epochs to sessions).
  *
  * Re-expressed Spark-first as the UNION + per-key ordered window
  * trick rather than a range join: tag both sides, union them, and
  * carry the right side's payload forward with `last(_, ignoreNulls)`
  * over an ordered per-key window, then keep only left rows. Cost is
  * ONE shuffle of both inputs on the key (the window's partitioning) —
  * no range-condition join, which Spark would execute as a per-key
  * cross product with a filter (O(|L|·|R|) per key at 100 TB). Right
  * rows order BEFORE left rows at equal timestamps, so a reference row
  * stamped exactly at the observation time is visible to it (>=
  * semantics, matching DuckDB/kdb ASOF).
  */
object AsOf {

  /** Left-outer as-of join. `payloadCols` are taken from `right`
    * (names must not collide with `left`'s columns); left rows with no
    * reference row at or before them get null payloads. For
    * deterministic results `right` must have at most one row per
    * (key, rightTs) — enforce upstream (e.g. an aggregate produced it). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String,
               payloadCols: Seq[String]): DataFrame = {
    val l = left
      .withColumn("__t", col(leftTsCol))
      .withColumn("__side", lit(1))
    val r = right
      .select(col(keyCol) +: col(rightTsCol) +: payloadCols.map(col): _*)
      .withColumn("__t", col(rightTsCol))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    // the matched reference timestamp rides along like a payload
    val withRts = carried
      .withColumn(rightTsCol, last(when(col("__side") === 0, col("__t")), ignoreNulls = true).over(w))
    withRts.filter(col("__side") === 1)
      .drop("__t", "__side")
  }
}
