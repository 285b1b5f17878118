package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Canonical table loader for the test corpus (TESTDATA.md).
  *
  * At 100 TB these would be partitioned/bucketed external tables; the
  * loader is the single place a deployment re-points. All operators take
  * DataFrames, never paths, so the engine is storage-agnostic.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  /** The events feed carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark's vectorized reader rejects; read them as nanos-since-epoch
    * longs (the nanosAsLong conf is set once in [[GraftSession.build]])
    * and convert to a microsecond TimestampType (truncation — exactly
    * what Spark's own ns→µs narrowing would do). */
  def events(s: SparkSession, d: String): DataFrame =
    table(s, d, "events").withColumn("ts",
      org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
