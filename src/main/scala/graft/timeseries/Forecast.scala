package graft.timeseries

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed forecasting operators.
  *
  * The reference trains LSTM/Transformer forecasters on a single node
  * (model.py:44-137); at 100 TB the engine's job is the data side:
  * per-series baselines, closed-form models, and evaluation — each one
  * scan + one shuffle on the series key. RMSE/MAPE match
  * model.py:251-279 (MAPE with the same 1e-8 guard).
  */
object Forecast {

  /** Seasonal-naive baseline: prediction = value `season` steps ago in
    * the per-key ordered series. The standard distributed baseline a
    * 1000-executor backtest runs per series. */
  def seasonalNaive(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                    valueCol: String, season: Int): DataFrame = {
    df.select(col(idCol), col(keyCol), date_trunc("second", col(tsCol)).as("period"), col(valueCol))
      .withColumn("prediction", lag(col(valueCol), season).over(
        Window.partitionBy(col(keyCol)).orderBy(col("period"), col(idCol))))
      .filter(col("prediction").isNotNull)
  }

  /** Per-key forecast evaluation: RMSE + MAPE (model.py:270-279,
    * same epsilon guard on the denominator). */
  def metrics(df: DataFrame, keyCol: String, actualCol: String, predCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        round(sqrt(avg(pow(col(actualCol) - col(predCol), 2))), 4).as("rmse"),
        round(avg(abs((col(actualCol) - col(predCol)) / (col(actualCol) + lit(1e-8)))) * 100, 4)
          .as("mape"))

  /** Per-key OLS trend via regr_slope/regr_intercept aggregates —
    * closed-form, fully distributed (map-side partials; no iteration).
    * x = epoch seconds of the second-truncated timestamp. Emits the
    * fitted line plus a point forecast `horizonSeconds` past each key's
    * last observation. */
  def linearTrend(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
                  horizonSeconds: Long): DataFrame = {
    df.select(col(keyCol),
        date_trunc("second", col(tsCol)).cast("long").cast("double").as("x"),
        col(valueCol).cast("double").as("y"))
      .groupBy(col(keyCol))
      .agg(
        expr("regr_slope(y, x)").as("slope"),
        expr("regr_intercept(y, x)").as("intercept"),
        max(col("x")).as("x_max"))
      .select(col(keyCol),
        round(col("slope") * 3600 * 24, 6).as("slope_per_day"),
        round(col("intercept") + col("slope") * (col("x_max") + horizonSeconds), 4)
          .as("forecast"))
  }

  /** Distribution-drift check (config.yaml:44-46): reference window
    * [max-37d, max-7d) vs current window [max-7d, max]; per-key relative
    * mean shift vs threshold. The global max-ts scalar is broadcast. */
  def drift(df: DataFrame, keyCol: String, tsCol: String, valueCol: String,
            referenceDays: Int, currentDays: Int, threshold: Double): DataFrame = {
    val maxTs = df.agg(max(date_trunc("second", col(tsCol))).as("max_ts"))
    val curStart = col("max_ts") - expr(s"INTERVAL $currentDays DAYS")
    val refStart = col("max_ts") - expr(s"INTERVAL ${currentDays + referenceDays} DAYS")
    df.select(col(keyCol), date_trunc("second", col(tsCol)).as("period"), col(valueCol))
      .crossJoin(broadcast(maxTs))
      .withColumn("bucket",
        when(col("period") >= curStart, "current")
          .when(col("period") >= refStart, "reference"))
      .filter(col("bucket").isNotNull)
      // means from exact integer cents: order-independent sums, so the
      // rounded output is reproducible across engines/partitionings
      .withColumn("cents", round(col(valueCol) * 100, 0))
      .groupBy(col(keyCol))
      .agg(
        sum(when(col("bucket") === "reference", col("cents"))).as("s_ref"),
        count(when(col("bucket") === "reference", lit(1))).as("n_ref"),
        sum(when(col("bucket") === "current", col("cents"))).as("s_cur"),
        count(when(col("bucket") === "current", lit(1))).as("n_cur"))
      .filter(col("n_ref") > 0 && col("n_cur") > 0)
      // displayed means use the exact-integer-cents rounding (see
      // roundMeanE4): round(s/n/100, 4) half-up-rounds a double that can
      // sit exactly on a ...5 boundary, where engines disagree. shift/
      // drifted stay on the raw double means (scale-invariant ratio).
      .select(col(keyCol),
        graft.functions.roundMeanE4(col("s_ref"), col("n_ref")).as("ref_mean"),
        graft.functions.roundMeanE4(col("s_cur"), col("n_cur")).as("cur_mean"),
        round(abs(col("s_cur") / col("n_cur") - col("s_ref") / col("n_ref")) /
          (col("s_ref") / col("n_ref")), 6).as("shift"),
        (abs(col("s_cur") / col("n_cur") - col("s_ref") / col("n_ref")) /
          (col("s_ref") / col("n_ref")) > threshold).as("drifted"))
  }

  /** Rolling-origin backtest: the per-key series is cut into `folds`
    * equal time slices and the (causal) seasonal-naive forecast is
    * scored per slice — RMSE/MAPE per (key, fold), the distributed form
    * of evaluating a forecaster across held-out windows rather than one
    * final split (model.py evaluate() generalized). One window pass +
    * one aggregation; no refitting needed because the baseline is
    * causal by construction. */
  def backtest(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
               valueCol: String, season: Int, folds: Int): DataFrame = {
    val fc = seasonalNaive(df, keyCol, tsCol, idCol, valueCol, season)
    val ow = Window.partitionBy(col(keyCol)).orderBy(col("period"), col(idCol))
    val cw = Window.partitionBy(col(keyCol))
    fc.withColumn("__rn", row_number().over(ow))
      .withColumn("__n", count(lit(1)).over(cw))
      .withColumn("fold",
        least(floor((col("__rn") - 1) * folds / col("__n")), lit(folds - 1)).cast("int"))
      .groupBy(col(keyCol), col("fold"))
      .agg(
        count(lit(1)).as("n"),
        round(sqrt(avg(pow(col(valueCol) - col("prediction"), 2))), 4).as("rmse"),
        round(avg(abs((col(valueCol) - col("prediction")) / (col(valueCol) + lit(1e-8)))) * 100, 4)
          .as("mape"))
  }

  /** Distributed ridge regression on lag features via normal equations.
    *
    * The scalable stand-in for the reference's lag-window → horizon
    * model: per key, accumulate the Gram matrix X'X and X'y with one
    * aggregation pass (map-side combinable sums), then solve the tiny
    * (p×p) system per key. The solve touches one row per key — the
    * 100 TB of observations never leave the executors.
    * Features: [1, lag1, lagSeason]; target: value.
    */
  def ridgeLagForecast(df: DataFrame, keyCol: String, tsCol: String, idCol: String,
                       valueCol: String, season: Int, lambda: Double): DataFrame = {
    val feats = df
      .select(col(keyCol), date_trunc("second", col(tsCol)).as("period"), col(idCol), col(valueCol))
      .withColumn("x1", lag(col(valueCol), 1).over(
        Window.partitionBy(col(keyCol)).orderBy(col("period"), col(idCol))))
      .withColumn("x2", lag(col(valueCol), season).over(
        Window.partitionBy(col(keyCol)).orderBy(col("period"), col(idCol))))
      .filter(col("x1").isNotNull && col("x2").isNotNull)
    // Gram matrix sums for features [1, x1, x2] — 6 unique entries + 3 X'y.
    val sums = feats.groupBy(col(keyCol)).agg(
      count(lit(1)).cast("double").as("s00"),
      sum(col("x1")).as("s01"), sum(col("x2")).as("s02"),
      sum(col("x1") * col("x1")).as("s11"), sum(col("x1") * col("x2")).as("s12"),
      sum(col("x2") * col("x2")).as("s22"),
      sum(col(valueCol)).as("b0"),
      sum(col("x1") * col(valueCol)).as("b1"),
      sum(col("x2") * col(valueCol)).as("b2"))
    val spark = df.sparkSession
    import spark.implicits._
    val keyIdx = sums.schema.fieldIndex(keyCol)
    sums.map { r =>
      val key = r.get(keyIdx).toString
      val a = Array(
        Array(r.getDouble(1) + lambda, r.getDouble(2), r.getDouble(3)),
        Array(r.getDouble(2), r.getDouble(4) + lambda, r.getDouble(5)),
        Array(r.getDouble(3), r.getDouble(5), r.getDouble(6) + lambda))
      val b = Array(r.getDouble(7), r.getDouble(8), r.getDouble(9))
      val x = solve3(a, b)
      (key, x(0), x(1), x(2))
    }.toDF(keyCol, "intercept", "coef_lag1", "coef_lag_season")
      .select(col(keyCol),
        round(col("intercept"), 4).as("intercept"),
        round(col("coef_lag1"), 6).as("coef_lag1"),
        round(col("coef_lag_season"), 6).as("coef_lag_season"))
  }

  /** Gaussian elimination with partial pivoting for a 3×3 system. */
  private def solve3(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val n = 3
    val m = Array.tabulate(n, n + 1)((i, j) => if (j < n) a(i)(j) else b(i))
    for (c <- 0 until n) {
      val p = (c until n).maxBy(r => math.abs(m(r)(c)))
      val tmp = m(c); m(c) = m(p); m(p) = tmp
      if (math.abs(m(c)(c)) > 1e-12) {
        for (r <- c + 1 until n) {
          val f = m(r)(c) / m(c)(c)
          for (j <- c to n) m(r)(j) -= f * m(c)(j)
        }
      }
    }
    val x = new Array[Double](n)
    for (r <- (n - 1) to 0 by -1) {
      var s = m(r)(n)
      for (j <- r + 1 until n) s -= m(r)(j) * x(j)
      x(r) = if (math.abs(m(r)(r)) > 1e-12) s / m(r)(r) else 0.0
    }
    x
  }
}
