package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Forecaster-ladder backtest probe (round 11): holds out each key's
  * LAST 3 observations, fits every ladder tier on the remaining
  * history, and scores the held-out rows with the c7 RMSE/MAPE — the
  * apples-to-apples comparison behind SURVEY's "c30 is the strongest
  * closed-form tier" claim. c29/c31 forecast the holdout via their
  * h=1..3 vectors (fit window = the newest 48 TRAIN rows); c30 is
  * refit with the holdout as its eval tail; c6's seasonal-naive lag
  * is computed causally over the full series and scored on the same
  * rows. Not part of the library surface. */
object C30Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.build("local[16]", 32, "graft-c30probe")
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables.events(spark, sfDir).filter(col("value").isNotNull)
    val ow = Window.partitionBy(col("user_id"))
      .orderBy(col("period").desc, col("event_id").desc)
    val ranked = ev.select(col("user_id"),
        date_trunc("second", col("ts")).as("period"),
        col("event_id"), col("value"), col("ts"))
      .withColumn("__rd", row_number().over(ow))
      .localCheckpoint(false)
    val train = ranked.filter(col("__rd") > 3)
    val hold = ranked.filter(col("__rd") <= 3)
      .select(col("user_id"), (lit(4) - col("__rd")).cast("int").as("h"),
        col("value"), col("event_id"), col("period"))

    def score(name: String, preds: org.apache.spark.sql.DataFrame): Unit = {
      // preds: (user_id, h, prediction)
      val j = hold.join(preds, Seq("user_id", "h"))
      val m = j.agg(count(lit(1)).as("n"),
        sqrt(avg(pow(col("value") - col("prediction"), 2))).as("rmse"),
        (avg(abs((col("value") - col("prediction")) / (col("value") + lit(1e-8)))) * 100)
          .as("mape")).collect()(0)
      println(f"$name%-28s n=${m.getLong(0)}%8d rmse=${m.getDouble(1)}%10.4f mape=${m.getDouble(2)}%8.3f")
    }

    // c6 seasonal-naive: causal lag over the FULL series, scored on holdout
    val naive = graft.timeseries.Forecast.seasonalNaive(
        ev, "user_id", "ts", "event_id", "value", 24)
      .join(hold.select(col("user_id"), col("event_id"), col("h")),
        Seq("user_id", "event_id"))
      .select(col("user_id"), col("h"), col("prediction"))
    score("c6_seasonal_naive", naive)

    // c29 / c31: fit on train, h=1..3 forecast columns -> holdout rows
    def hw(name: String, phi: Option[Double]): Unit = {
      val fc = phi match {
        case None => graft.timeseries.Forecast.holtWintersForecast(
          train, "user_id", "ts", "event_id", "value", 0.5, 0.25, 0.5, 24, 48, Seq(1, 2, 3))
        case Some(p) => graft.timeseries.Forecast.holtWintersDampedForecast(
          train, "user_id", "ts", "event_id", "value", 0.5, 0.25, 0.5, p, 24, 48, Seq(1, 2, 3))
      }
      val preds = Seq(1, 2, 3).map(h =>
        fc.select(col("user_id"), lit(h).as("h"), col(s"f_h$h").as("prediction")))
        .reduce(_ unionByName _)
      score(name, preds)
    }
    hw("c29_holt_winters", None)
    hw("c31_hw_damped_phi0.9", Some(0.9))

    // c30: refit with trainFrac such that eval covers the holdout, then
    // keep only the holdout rows (c30 predicts its whole eval tail)
    val c30 = graft.timeseries.Forecast.seasonalRidgeForecast(
        ev, "user_id", "ts", "event_id", "value", 7, 10, 10.0)
      .join(hold.select(col("user_id"), col("event_id"), col("h")),
        Seq("user_id", "event_id"))
      .select(col("user_id"), col("h"), col("prediction"))
    score("c30_seasonal_ridge", c30)
    spark.stop()
  }
}
