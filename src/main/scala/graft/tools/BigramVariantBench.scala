package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.normalizeText

/** Measurement harness (not library surface) for e50's plan choices at
  * large SF: (a) shipped form — tf2 localCheckpoint materialized for
  * its two consumers; (b) no-checkpoint — the corpus re-shingles for
  * each consumer (ReuseExchange may dedupe); (c) hash-keyed join-back —
  * the (doc, pair) table keyed by the packed 62-bit window hash so the
  * two corpus-side joins ship longs instead of pair strings (the
  * e30/e44 window-identity precedent), strings surviving only into the
  * vocab-sized tables. Prints one JSON line of min-of-N seconds. */
object BigramVariantBench {
  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "bigram-bench")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def docs = Tables.documents(spark, sfDir)
    val minCount = 5L

    def shipped(): DataFrame =
      graft.text.TextOps.bigramLogProb(docs, "doc_id", "text", minCount)

    def noCheckpoint(): DataFrame = {
      val tf2 = docs.select(col("doc_id"),
          explode(graft.functions.StringExpressions.shingleStrings(
            normalizeText(col("text")), 2)).as("pair"))
        .groupBy(col("doc_id"), col("pair")).agg(count(lit(1)).as("tf"))
      val pairCounts = tf2.groupBy(col("pair")).agg(sum(col("tf")).as("__c2"))
        .withColumn("__prev", substring_index(col("pair"), " ", 1))
        .localCheckpoint(false)
      val ctx = pairCounts.groupBy(col("__prev")).agg(sum(col("__c2")).as("__nctx"))
      val vocabV = ctx.filter(col("__nctx") >= minCount)
        .agg((count(lit(1)) + 1L).as("__v"))
      val kept = pairCounts.filter(col("__c2") >= minCount)
        .select(col("pair"), col("__c2"))
      tf2.withColumn("__prev", substring_index(col("pair"), " ", 1))
        .join(kept, Seq("pair"), "left")
        .join(ctx, Seq("__prev"), "left")
        .crossJoin(broadcast(vocabV))
        .withColumn("__lpq", floor(log(
          (coalesce(col("__c2"), lit(0L)) + 1L).cast("double") /
            (col("__nctx") + col("__v")).cast("double")) * 1e6).cast("long"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_bigrams"),
          sum(when(col("__c2").isNull, col("tf")).otherwise(lit(0L))).as("rare_bigrams"),
          (floor(sum(col("__lpq") * col("tf")).cast("double") /
            (lit(100.0) * sum(col("tf")))) / 10000.0).as("logprob"))
    }

    def hashKeyed(): DataFrame = {
      // corpus side carries ONLY (doc_id, h2-long, prev-hash-long)
      val tf2 = docs.select(col("doc_id"),
          arrays_zip(
            graft.functions.StringExpressions.shingleHashes(
              normalizeText(col("text")), 2),
            graft.functions.StringExpressions.shingleHashes(
              normalizeText(col("text")), 1)).as("z"))
        .select(col("doc_id"), explode(col("z")).as("p"))
        .select(col("doc_id"), col("p.0").as("h2"), col("p.1").as("hp"))
        .filter(col("h2").isNotNull)
        .groupBy(col("doc_id"), col("h2"), col("hp")).agg(count(lit(1)).as("tf"))
        .localCheckpoint(false)
      val pairCounts = tf2.groupBy(col("h2"), col("hp")).agg(sum(col("tf")).as("__c2"))
        .localCheckpoint(false)
      val ctx = pairCounts.groupBy(col("hp")).agg(sum(col("__c2")).as("__nctx"))
      val vocabV = ctx.filter(col("__nctx") >= minCount)
        .agg((count(lit(1)) + 1L).as("__v"))
      val kept = pairCounts.filter(col("__c2") >= minCount)
        .select(col("h2"), col("__c2"))
      tf2.join(kept, Seq("h2"), "left")
        .join(ctx, Seq("hp"), "left")
        .crossJoin(broadcast(vocabV))
        .withColumn("__lpq", floor(log(
          (coalesce(col("__c2"), lit(0L)) + 1L).cast("double") /
            (col("__nctx") + col("__v")).cast("double")) * 1e6).cast("long"))
        .groupBy(col("doc_id"))
        .agg(sum(col("tf")).as("n_bigrams"),
          sum(when(col("__c2").isNull, col("tf")).otherwise(lit(0L))).as("rare_bigrams"),
          (floor(sum(col("__lpq") * col("tf")).cast("double") /
            (lit(100.0) * sum(col("tf")))) / 10000.0).as("logprob"))
    }

    def reap(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }

    def time(f: () => DataFrame): Double =
      (1 to runs).map { _ =>
        reap()
        val t = System.nanoTime()
        f().foreach(_ => ())
        (System.nanoTime() - t) / 1e9
      }.min

    // cross-check the hash-keyed variant BEFORE timing it: poly
    // hashes live mod PolyP ≈ 2^30 and the pair-key population grows
    // with the corpus, so collisions silently merge counts at scale —
    // measured DIVERGED at sf30 (birthday bound: ~1M distinct bigrams
    // against 2^30 expects hundreds of collisions), equal at sf0.1.
    // That divergence is WHY the shipped operator keys the join-backs
    // on the pair STRING.
    val a = shipped().orderBy("doc_id").collect()
    val c = hashKeyed().orderBy("doc_id").collect()
    val hashExact = a.sameElements(c)

    val tShipped = time(shipped)
    val tNoCkpt = time(noCheckpoint)
    val tHash = if (hashExact) time(hashKeyed) else -1.0
    println(s"""{"metric":"e50_variants","shipped":$tShipped,"no_checkpoint":$tNoCkpt,"hash_keyed":$tHash,"hash_exact":$hashExact,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
