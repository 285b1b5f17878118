package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  val schema = StructType.fromDDL("id BIGINT, name STRING, value DOUBLE")

  test("csv roundtrip preserves typed rows") {
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.25)).toDF("id", "name", "value")
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString + "/out"
    Sources.writeCsv(df, tmp)
    val back = Sources.validRecords(Sources.readCsv(spark, tmp, schema))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("corrupt csv lines are quarantined, not fatal") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bad").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(tmp, "part.csv"),
      "id,name,value\n1,a,1.5\nnot_a_long,b,xyz\n3,c,3.0\n")
    val raw = Sources.readCsv(spark, tmp, schema)
    assert(Sources.validRecords(raw).count() == 2)
    assert(Sources.corruptRecords(raw).count() == 1)
  }

  test("partitioned parquet sink prunes partitions for key filters") {
    val df = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "x", 3.0)).toDF("id", "k", "value")
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq").toString + "/out"
    Sources.writePartitionedParquet(df, tmp, Seq("k"))
    val back = Sources.readParquet(spark, tmp).filter(col("k") === "x")
    assert(back.count() == 2)
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
  }
}
