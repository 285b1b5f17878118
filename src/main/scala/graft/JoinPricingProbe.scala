package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec

/** Calibration probe for the measured-size join planning in
  * [[graft.text.Dedup]] (SURVEY §8 rule 8): prints the gram-join byte
  * model's inputs/outputs next to the ACTUAL BroadcastExchange
  * dataSize metrics of the executed plan, so the model's per-row
  * layout and HashedRelation-overhead factors stay calibrated against
  * measurement, not guesswork. Not part of the query surface.
  * Usage: runMain graft.JoinPricingProbe <sfDir> <n> [jaccard|containment]
  */
object JoinPricingProbe {
  private def pad8(e: org.apache.spark.sql.Column) =
    floor((e + lit(7)) / lit(8)) * lit(8)

  private def broadcastSizes(p: SparkPlan): Seq[(Long, Long)] = {
    val self = p match {
      case b: BroadcastExchangeExec =>
        Seq((b.metrics("dataSize").value, b.metrics("numOutputRows").value))
      case _ => Seq.empty
    }
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case other                    => other.children
    }
    self ++ kids.flatMap(broadcastSizes)
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val n = args(1).toInt
    val which = if (args.length > 2) args(2) else "containment"
    System.setProperty("spark.driver.maxResultSize", "8g")
    val spark = GraftSession.build("local[32]", 32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)

    // Recompute the operator's gram-stats aggregate (same math as
    // Dedup.gramStats) to print the model's inputs.
    val block = concat_ws("", Seq("lang", "source").map(col): _*)
    val base = docs
      .select(col("doc_id"), block.as("block"),
        graft.functions.normalizeText(col("text")).as("norm"))
      .select(col("doc_id"), col("block"),
        when(col("norm").isNotNull,
          graft.functions.StringExpressions.packedGrams(col("norm"), n))
          .otherwise(array().cast("array<bigint>")).as("grams"))
      .withColumn("n_grams", size(col("grams")))
    val docB = pad8(octet_length(col("doc_id")))
    val blockB = pad8(octet_length(col("block")))
    val r = base.agg(count(lit(1)), sum(col("n_grams")),
      sum(col("n_grams") * (docB + blockB)), sum(docB)).head()
    val (nDocs, totalGrams, varGram, varDoc) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val full = totalGrams * 48L + varGram
    val arr = nDocs * 56L + varDoc + totalGrams * 8L
    val t = 0.8 - 1e-4
    val prefRows = ((1 - t) * totalGrams).toLong + nDocs
    val pref = (full.toDouble * prefRows / totalGrams).toLong
    println(f"STATS nDocs=$nDocs totalGrams=$totalGrams varGram=$varGram varDoc=$varDoc")
    println(f"MODEL full=${full / 1e9}%.2fGB prefix=${pref / 1e9}%.2fGB array=${arr / 1e9}%.2fGB")

    val t0 = System.nanoTime
    val pairs =
      if (which == "jaccard")
        graft.text.Dedup.ngramJaccardPairs(docs, "doc_id", "text",
          Seq("lang", "source"), n, 0.8)
      else
        graft.text.Dedup.ngramContainmentPairs(docs, "doc_id", "text",
          Seq("lang", "source"), n, 0.8)
    val qe = pairs.queryExecution
    val rows = qe.toRdd.count()
    val secs = (System.nanoTime - t0) / 1e9
    println(f"PROBE_N=$n WHICH=$which ROWS=$rows SECS=$secs%.1f")
    broadcastSizes(qe.executedPlan).foreach { case (bytes, nr) =>
      println(f"BCAST actual=${bytes / 1e9}%.3fGB rows=$nr")
    }
    spark.stop()
  }
}
