package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Streams

/** Checkpoint-recovery proof for the F-group streaming twins: kill a
  * query mid-stream, restart it from `checkpointLocation`, and the
  * file sink must equal the uninterrupted batch result — no duplicated
  * windows/rows (the sink's _spark_metadata commit log is the
  * exactly-once surface `spark.read` respects), no holes (the restarted
  * query resumes from the recovered offsets + state store + watermark,
  * not from scratch). This is the Structured Streaming failure mode the
  * batch-parity and late-data specs can't cover: state (dedup keys,
  * open windows, watermark) surviving process death. The reference
  * pipeline leans on Airflow task retries for the same guarantee
  * (reference airflow_dag.py: retries on every task) — here the
  * contract is the engine's, not the orchestrator's.
  */
class StreamRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def ts(hm: String) = Timestamp.valueOf(s"2024-01-01 $hm:00")

  private def freshDirs(name: String): (String, String, String) = {
    val base = s"/tmp/graft_recovery_$name"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    (s"$base/in", s"$base/chk", s"$base/out")
  }

  private def land(df: DataFrame, dir: String): Unit =
    df.coalesce(1).write.mode("append").parquet(dir)

  /** Run one "process everything currently landed, then die" lifetime
    * of a streaming query — the crash/restart boundary under test. */
  private def runLifetime(build: DataFrame => DataFrame, schema: StructType,
                          inDir: String, chkDir: String, outDir: String): Unit = {
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1") // several micro-batches per lifetime
      .parquet(inDir)
    val q = build(src).writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", chkDir)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  test("f2 tumblingWindowStream restarted from checkpoint equals the uninterrupted batch result") {
    val (inDir, chkDir, outDir) = freshDirs("f2")
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    def build(df: DataFrame) =
      Streams.tumblingWindowStream(df, "ts", "event_type", "value", "1 hour", "10 minutes")

    // lifetime 1: two files; watermark reaches 11:20, closing [10,11)
    land(Seq((ts("10:05"), "view", 1.0), (ts("10:40"), "view", 2.0))
      .toDF("ts", "event_type", "value"), inDir)
    land(Seq((ts("11:30"), "view", 4.0)).toDF("ts", "event_type", "value"), inDir)
    runLifetime(build, schema, inDir, chkDir, outDir)
    val afterCrash = spark.read.parquet(outDir)
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value")).collect()
    assert(afterCrash.map(r => (r.getAs[Timestamp]("window_start"),
      r.getAs[Long]("n"), r.getAs[Double]("sum_value"))).toSet ==
      Set((ts("10:00"), 2L, 3.0)), "lifetime 1 must emit exactly the closed window")

    // lifetime 2 (the restart under test): more rows for the OPEN
    // window [11,12) — the recovered state must still hold its partial
    // aggregate (1 row, 4.0) or the window under-counts — plus rows
    // advancing the watermark to close [11,12) and [13,14)
    land(Seq((ts("11:45"), "view", 8.0)).toDF("ts", "event_type", "value"), inDir)
    land(Seq((ts("13:00"), "view", 16.0)).toDF("ts", "event_type", "value"), inDir)
    land(Seq((ts("15:00"), "view", 0.5)).toDF("ts", "event_type", "value"), inDir)
    runLifetime(build, schema, inDir, chkDir, outDir)

    // lifetime 3: restart with NOTHING new — replay must be a no-op
    // (re-emitting an already-committed batch would duplicate windows)
    runLifetime(build, schema, inDir, chkDir, outDir)

    val sink = spark.read.parquet(outDir)
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
    // uninterrupted batch truth over every row whose window closed
    // (the 15:00 sentinel's window is still open, so it never emits)
    val allRows = spark.read.schema(schema).parquet(inDir)
      .filter(col("ts") < ts("15:00"))
    val batch = Streams.tumblingWindow(allRows, "ts", "event_type", "value", "hour")
    assert(sink.count() == batch.count(), "no duplicated and no missing windows")
    assert(sink.collect().map(r => (r.getAs[Timestamp]("window_start"),
      r.getAs[String]("event_type"), r.getAs[Long]("n"),
      r.getAs[Double]("sum_value"))).toSet ==
      batch.collect().map(r => (r.getAs[Timestamp]("window_start"),
        r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("sum_value"))).toSet)
  }

  test("f1 sessionizeStream: an OPEN session's custom state survives restart and closes correctly") {
    // the hardest state surface: flatMapGroupsWithState with an
    // event-time timeout. A session left OPEN at the crash must be
    // recovered from the state store — its later events extend it, and
    // the recovered timeout still fires when the watermark passes.
    val (inDir, chkDir, outDir) = freshDirs("f1")
    val schema = StructType(Seq(StructField("key", LongType),
      StructField("ts", TimestampType), StructField("value", DoubleType)))
    def build(df: DataFrame) = {
      import df.sparkSession.implicits._
      Streams.sessionizeStream(df.as[Streams.SessionEvent], 1800L).toDF()
    }
    def ev(key: Long, epochSec: Long, value: Double) =
      (key, new Timestamp(epochSec * 1000), value)

    // lifetime 1: session A (1000..1600) closes in-batch when the 9999
    // burst begins; session B (start 9999) is OPEN at the "crash"
    land(Seq(ev(7L, 1000L, 1.0), ev(7L, 1600L, 2.0)).toDF("key", "ts", "value"), inDir)
    land(Seq(ev(7L, 9999L, 4.0)).toDF("key", "ts", "value"), inDir)
    runLifetime(build, schema, inDir, chkDir, outDir)
    val mid = spark.read.parquet(outDir).collect()
    assert(mid.map(r => (r.getAs[Long]("sessionStart"), r.getAs[Long]("n"))).toSet ==
      Set((1000L, 2L)), "only session A may have closed before the crash")

    // lifetime 2: 10500 is within the gap of B's last event (9999) —
    // ONLY recovered state can merge it into B instead of starting a
    // fresh session; 20000 then pushes the watermark past B's timeout
    land(Seq(ev(7L, 10500L, 8.0)).toDF("key", "ts", "value"), inDir)
    land(Seq(ev(8L, 20000L, 16.0)).toDF("key", "ts", "value"), inDir)
    runLifetime(build, schema, inDir, chkDir, outDir)

    // lifetime 3: nothing new — no re-emission of committed sessions
    runLifetime(build, schema, inDir, chkDir, outDir)

    val sessions = spark.read.parquet(outDir).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("sessionStart"),
        r.getAs[Long]("sessionEnd"), r.getAs[Long]("n"), r.getAs[Double]("sum")))
      .toSet
    assert(sessions == Set(
      (7L, 1000L, 1600L, 2L, 3.0),   // A: closed pre-crash
      (7L, 9999L, 10500L, 2L, 12.0)  // B: spans the restart — state recovered
    ), s"unexpected sessions: $sessions")
  }

  test("f3 streamDedupStream restarted from checkpoint keeps dedup state — replayed rows stay dropped") {
    val (inDir, chkDir, outDir) = freshDirs("f3")
    val schema = StructType(Seq(StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType)))
    def build(df: DataFrame) =
      Streams.streamDedupStream(df, "ts", Seq("user_id", "event_type"), "1 hour")

    // lifetime 1: first occurrences + an in-flight duplicate
    land(Seq((ts("10:00"), 7L, "view"), (ts("10:05"), 8L, "click"))
      .toDF("ts", "user_id", "event_type"), inDir)
    land(Seq((ts("10:00"), 7L, "view")).toDF("ts", "user_id", "event_type"), inDir)
    runLifetime(build, schema, inDir, chkDir, outDir)
    assert(spark.read.parquet(outDir).count() == 2,
      "lifetime 1: duplicate within the run must be dropped")

    // lifetime 2: the upstream re-delivers a row from BEFORE the crash
    // (the at-least-once source the operator exists to absorb); only
    // recovered state-store contents can catch it
    land(Seq((ts("10:00"), 7L, "view"), (ts("10:10"), 7L, "view"))
      .toDF("ts", "user_id", "event_type"), inDir)
    runLifetime(build, schema, inDir, chkDir, outDir)

    // lifetime 3: nothing new — committed batches must not re-emit
    runLifetime(build, schema, inDir, chkDir, outDir)

    val sink = spark.read.parquet(outDir)
    val batch = Streams.streamDedup(
      spark.read.schema(schema).parquet(inDir).withColumn("__id", lit(0L)),
      Seq("user_id", "event_type", "ts"), "__id").drop("__id")
    assert(sink.count() == 3, "exactly one row per (key, ts) across both lifetimes")
    assert(sink.count() == batch.count())
    assert(sink.collect().map(r => (r.getAs[Timestamp]("ts"),
      r.getAs[Long]("user_id"), r.getAs[String]("event_type"))).toSet ==
      batch.collect().map(r => (r.getAs[Timestamp]("ts"),
        r.getAs[Long]("user_id"), r.getAs[String]("event_type"))).toSet)
  }

  test("f8 streamUpsert: maintained table equals batch keep-latest across kill/restart; merges are idempotent") {
    val (inDir, chkDir, tableDir) = freshDirs("f8")
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("ts", TimestampType), StructField("key", LongType),
      StructField("value", DoubleType)))
    def lifetime(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // several merge commits per lifetime
        .parquet(inDir)
      val q = graft.streaming.Upsert.streamUpsert(
        src, tableDir, chkDir, "key", "ts", "id", nBuckets = 4)
      q.awaitTermination() // AvailableNow: drains landed files, then stops
    }
    def table(): Set[(Long, Timestamp, Long, Double)] =
      graft.streaming.Upsert.readTable(spark, tableDir).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Timestamp]("ts"),
          r.getAs[Long]("key"), r.getAs[Double]("value"))).toSet

    // lifetime 1: key 1 upserted twice across two micro-batches (the
    // second file's later row must replace the first's), key 2 once
    land(Seq((1L, ts("10:00"), 1L, 1.0), (2L, ts("10:00"), 2L, 10.0))
      .toDF("id", "ts", "key", "value"), inDir)
    land(Seq((3L, ts("11:00"), 1L, 2.0)).toDF("id", "ts", "key", "value"), inDir)
    lifetime()
    assert(table() == Set((3L, ts("11:00"), 1L, 2.0), (2L, ts("10:00"), 2L, 10.0)),
      "pre-crash table must already hold the per-key latest")

    // lifetime 2 (the restart under test): key 2 advances, and a LATE
    // out-of-order row for key 1 arrives — older seq must NOT displace
    // the maintained winner (the merge is keep-latest, not keep-last-write)
    land(Seq((4L, ts("12:00"), 2L, 20.0), (5L, ts("10:30"), 1L, 99.0))
      .toDF("id", "ts", "key", "value"), inDir)
    lifetime()

    // lifetime 3: nothing new — committed batches must not re-merge
    lifetime()

    val expected = Set((3L, ts("11:00"), 1L, 2.0), (4L, ts("12:00"), 2L, 20.0))
    assert(table() == expected, s"got ${table()}")

    // batch truth: the table IS keep-latest over everything ever landed
    val batch = graft.ingest.Ingest.dedupKeepLatest(
      spark.read.schema(schema).parquet(inDir), Seq("key"), "ts", "id")
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Timestamp]("ts"),
        r.getAs[Long]("key"), r.getAs[Double]("value"))).toSet
    assert(table() == batch)

    // idempotence directly (the property that upgrades foreachBatch's
    // at-least-once replay to exactly-once contents): re-merging an
    // already-applied batch changes nothing
    val replay = Seq((4L, ts("12:00"), 2L, 20.0), (5L, ts("10:30"), 1L, 99.0))
      .toDF("id", "ts", "key", "value")
    graft.streaming.Upsert.upsertIntoTable(spark, replay, tableDir,
      "key", "ts", "id", nBuckets = 4)
    assert(table() == expected, "replayed merge must be a no-op")
  }

  test("f13 quality ledger: batching-invariant totals across kill/restart; appends idempotent") {
    val (inDir, chkDir, ledgerDir) = freshDirs("f13")
    val schema = StructType(Seq(StructField("event_id", LongType),
      StructField("period", TimestampType), StructField("value", DoubleType)))
    def lifetime(): Unit = {
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1") // several ledger versions per lifetime
        .parquet(inDir)
      graft.streaming.LedgerSink.streamQualityLedger(
        src, ledgerDir, chkDir, "period", "value").awaitTermination()
    }
    def totals(): Map[Timestamp, (Long, Long, Double)] =
      graft.streaming.LedgerSink.readQualityLedger(spark, ledgerDir).collect()
        .map(r => r.getAs[Timestamp]("bucket") ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("n_nulls"),
            r.getAs[Double]("sum_value"))).toMap
    // lifetime 1: two files -> two batches, overlapping hour buckets
    land(Seq((1L, Some(ts("10:05")), Some(1.5)), (2L, Some(ts("10:40")), None))
      .toDF("event_id", "period", "value"), inDir)
    land(Seq((3L, Some(ts("10:55")), Some(2.25)), (4L, Some(ts("11:05")), Some(4.0)))
      .toDF("event_id", "period", "value"), inDir)
    lifetime()
    assert(totals() == Map(
      ts("10:00") -> ((3L, 1L, 3.75)), ts("11:00") -> ((1L, 0L, 4.0))))
    // lifetime 2 (the restart): one more file; committed batches must
    // not re-append (totals would double)
    land(Seq((5L, Some(ts("11:30")), Some(1.0))).toDF("event_id", "period", "value"), inDir)
    lifetime()
    // lifetime 3: nothing new — a pure-replay drain appends nothing
    lifetime()
    assert(totals() == Map(
      ts("10:00") -> ((3L, 1L, 3.75)), ts("11:00") -> ((2L, 0L, 5.0))))
    // the per-batch partials really are separate ledger versions
    assert(graft.sources.Sources.listVersions(spark, ledgerDir).size == 3)
    // appendBatch idempotence directly (the at-least-once -> exactly-
    // once upgrade): replaying the NEWEST batch id is a no-op...
    import spark.implicits._
    val rep = Seq((ts("12:00"), 9L)).toDF("bucket", "n_rows")
      .withColumn("n_nulls", lit(0L)).withColumn("sum_cents", lit(0L))
    val v = graft.sources.RunLedger.appendBatch(rep, spark, ledgerDir, 2L)
    assert(v == 3L && graft.sources.Sources.listVersions(spark, ledgerDir).size == 3)
    // ...while a torn attempt (data landed, no manifest) is invisible
    // and the healed re-append lands once
    rep.withColumn("__batch_id", lit(3L)).write.parquet(s"$ledgerDir/data/v4")
    assert(totals().size == 3 || totals().size == 2) // torn dir never read
    val v2 = graft.sources.RunLedger.appendBatch(rep, spark, ledgerDir, 3L)
    assert(v2 == 4L && totals()(ts("12:00")) == ((9L, 0L, 0.0)))
    // round 12: mixing appendRun into an appendBatch table must fail
    // with the named contract, not an unresolved-column AnalysisException
    graft.sources.RunLedger.appendRun(
      Seq(("op", "m", 1.0)).toDF("operator", "metric", "value"),
      spark, ledgerDir, ts("13:00"))
    val ex = intercept[IllegalArgumentException] {
      graft.sources.RunLedger.appendBatch(rep, spark, ledgerDir, 4L)
    }
    assert(ex.getMessage.contains("mixes appendRun and appendBatch"))
  }

  test("f8 upsert partial maintenance: untouched buckets are byte-identical after a merge") {
    val (_, _, tableDir) = freshDirs("f8partial")
    // keys 0..3 hash into distinct buckets with nBuckets=4? not
    // guaranteed — probe: find two keys in DIFFERENT buckets
    val probe = (1L to 50L).map(k => (k, ts("10:00"), k, 1.0))
      .toDF("id", "ts", "key", "value")
      .withColumn("bucket", pmod(hash(col("key")), lit(4)))
      .select("key", "bucket").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (kA, bA) = probe.head
    val (kB, _) = probe.find(_._2 != bA).get
    def land(k: Long, id: Long, v: Double): Unit =
      graft.streaming.Upsert.upsertIntoTable(spark,
        Seq((id, ts("10:00"), k, v)).toDF("id", "ts", "key", "value"),
        tableDir, "key", "ts", "id", 4)
    land(kA, 1L, 1.0)
    land(kB, 2L, 2.0)
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def bucketFiles(b: Int): Map[String, (Long, Long)] = {
      val dir = new org.apache.hadoop.fs.Path(tableDir, s"bucket=$b")
      fs.listStatus(dir).filter(_.getPath.getName.endsWith(".parquet"))
        .map(st => st.getPath.getName -> ((st.getLen, st.getModificationTime))).toMap
    }
    val aBefore = bucketFiles(bA)
    // merge a new version of kB only: kA's bucket must not be rewritten
    land(kB, 3L, 20.0)
    assert(bucketFiles(bA) == aBefore,
      s"bucket=$bA (untouched by the merge) must keep identical files")
    val rows = graft.streaming.Upsert.readTable(spark, tableDir).collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Double]("value"))).toSet
    assert(rows == Set((kA, 1.0), (kB, 20.0)))
  }

  test("f8 upsert lease: a second live writer fails fast, a stale lease is taken over") {
    val (_, _, tableDir) = freshDirs("f8lease")
    val batch = Seq((1L, ts("10:00"), 1L, 1.0)).toDF("id", "ts", "key", "value")
    graft.streaming.Upsert.upsertIntoTable(spark, batch, tableDir, "key", "ts", "id", 4)
    val fs = new org.apache.hadoop.fs.Path(tableDir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    def plantLease(expiryMs: Long): Unit = {
      val out = fs.create(new org.apache.hadoop.fs.Path(tableDir, "_LOCK"), true)
      try out.write(s"someone-else\n$expiryMs".getBytes("UTF-8")) finally out.close()
    }
    // live lease from "another writer": the merge must refuse to run
    plantLease(System.currentTimeMillis() + 600000)
    intercept[graft.sources.LandingLease.ConcurrentLandingException] {
      graft.streaming.Upsert.upsertIntoTable(spark,
        Seq((2L, ts("11:00"), 1L, 2.0)).toDF("id", "ts", "key", "value"),
        tableDir, "key", "ts", "id", 4)
    }
    assert(graft.streaming.Upsert.readTable(spark, tableDir).count() == 1,
      "the refused merge must not have touched the table")
    // stale lease (writer crashed): taken over, merge proceeds, lease released
    plantLease(System.currentTimeMillis() - 1000)
    graft.streaming.Upsert.upsertIntoTable(spark,
      Seq((2L, ts("11:00"), 1L, 2.0)).toDF("id", "ts", "key", "value"),
      tableDir, "key", "ts", "id", 4)
    assert(graft.streaming.Upsert.readTable(spark, tableDir)
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(tableDir, "_LOCK")),
      "lease must be released after a successful merge")
  }
}
