package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.VectorExpressions
import graft.sources.ParquetStats
import graft.vector.Similarity

/** One-off measurement harness (not library surface): does e22's pair
  * join win by shuffling NARROW band rows (id, band, key) and joining
  * vectors back per unique candidate pair, instead of carrying the
  * float vector through the ×bands explode + repartition?
  *
  * MEASURED ANSWER (round 8): NO — decisively. At sf0.1 the join-back
  * shape loses 2.57 vs 2.16 s (two extra joins' fixed cost); at sf30
  * it DIED ON DISK, spilling >74 GB of shuffle before the candidate
  * distinct. The carry shape's "score before dedup" is load-bearing:
  * the cosine filter is a MAP-SIDE collapse of the candidate multiset
  * (billions of rows at sf30 under a loose 0.25 threshold), so only
  * scored survivors ever enter a shuffle — while join-back must move
  * the raw multiset through a distinct before it can fetch vectors.
  * Shuffling ~7× more bytes per row (the carried vector) on a
  * billions-times-smaller row count wins. Kept as the recorded
  * negative result (BASELINE.md round-8 section) so the idea is not
  * re-tried; the Similarity.cosineDupPairsLsh scaladoc's
  * score-before-dedup note is the binding design rule. */
object LshVariantBench {

  private def dot(a: Column, b: Column): Column = VectorExpressions.arrayDot(a, b)

  /** The join-back variant of [[Similarity.cosineDupPairsLsh]] —
    * identical output by construction (same candidates, same exact
    * cosine, same threshold). */
  def joinBack(emb: DataFrame, idCol: String, vecCol: String,
               numPlanes: Int, bands: Int, threshold: Double,
               maxBucket: Int = 10000): DataFrame = {
    require(numPlanes % bands == 0)
    val per = numPlanes / bands
    val dim = emb.filter(col(vecCol).isNotNull)
      .select(size(col(vecCol)).as("d")).limit(1).collect()
      .headOption.map(_.getInt(0)).getOrElse(0)
    val planes = Similarity.planeMatrix(numPlanes, dim)
    val folded = numPlanes <= 64
    val base = emb.select(col(idCol).as("id"), col(vecCol))
      .withColumn("v", col(vecCol))
      .withColumn("n2", VectorExpressions.arrayNorm2(col("v")))
    val sigd = {
      if (folded)
        base.withColumn("__sig", VectorExpressions.planeSignature(col("v"), planes))
      else
        base.select(Seq(col("id"), col("v"), col("n2")) ++ (0 until bands).map { b =>
          VectorExpressions.planeSignature(col("v"),
            planes.slice(b * per, (b + 1) * per)).as(s"__k$b")
        }: _*)
    }
    sigd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandStructs = array((0 until bands).map { b =>
      val key =
        if (folded) shiftright(col("__sig"), b * per).bitwiseAND((1L << per) - 1L)
        else col(s"__k$b")
      struct(lit(b).as("band"), key.as("key"))
    }: _*)
    // NARROW banded table: the vector stays home in sigd
    val pre = sigd.select(col("id"), explode(bandStructs).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val hot = sigd.select(explode(bandStructs).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"))
      .groupBy(col("band"), col("key")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket).select(col("band"), col("key"))
    val pruned = pre.join(broadcast(hot), Seq("band", "key"), "left_anti")
      .repartition(col("band"), col("key"))
    val a = pruned.select(col("band"), col("key"), col("id").as("id_a"))
    val b = pruned.select(col("band"), col("key"), col("id").as("id_b"))
    val cands = a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    // vectors fetched once per UNIQUE pair; the sigd exchange on id is
    // canonically identical for both sides, so ReuseExchange dedupes it
    val va = sigd.select(col("id").as("id_a"), col("v").as("va"), col("n2").as("na2"))
    val vb = sigd.select(col("id").as("id_b"), col("v").as("vb"), col("n2").as("nb2"))
    cands.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .withColumn("cosine",
        round(dot(col("va"), col("vb")) / (sqrt(col("na2")) * sqrt(col("nb2"))), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  def main(args: Array[String]): Unit = {
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt, "lsh-variant")
    spark.sparkContext.setLogLevel("WARN")
    val n = ParquetStats.rowCount(spark, s"$sfDir/embeddings.parquet")
    val planes = Similarity.autoPlanes(n, 8)
    def reap(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    def time(f: => DataFrame): (Double, Long) = {
      val t0 = System.nanoTime()
      val c = f.count()
      ((System.nanoTime() - t0) / 1e9, c)
    }
    var results = Map.empty[String, (Double, Long)]
    // SPARK_GRAFT_VARIANT=carry|joinback runs one side only (large-SF
    // legs where one run's shuffle spill is most of the disk budget)
    val which = sys.env.get("SPARK_GRAFT_VARIANT")
    for (_ <- 1 to runs; (label, mk) <- Seq(
      "carry" -> (() => Similarity.cosineDupPairsLsh(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding", planes, 8, 0.25)),
      "joinback" -> (() => joinBack(
        Tables.embeddings(spark, sfDir), "vec_id", "embedding", planes, 8, 0.25)))
      if which.forall(_ == label)) {
      val (dt, c) = time(mk())
      reap()
      val prev = results.get(label)
      if (prev.forall(_._1 > dt)) results += label -> (dt, c)
    }
    spark.stop()
    val qs = results.map { case (k, (v, c)) => f""""$k":{"sec":$v%.3f,"rows":$c}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"lsh_variant","sf":"$sfDir","planes":$planes,"results":$qs}""")
  }
}
