package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._

/** Embedding similarity search.
  *
  * Brute-force cosine top-k is the exact baseline: the (small) query
  * side is broadcast against the 100 TB corpus — a narrow map + per-query
  * top-k, no corpus shuffle. The scale path is random-hyperplane LSH:
  * bucket signatures computed in a narrow pass, candidate join only
  * inside buckets.
  */
object Similarity {

  /** Near-duplicate embedding pairs (cosine ≥ threshold) inside blocks.
    * Block column bounds the pair space (use an LSH bucket or cluster id
    * at scale). */
  def cosineDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                     blockCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col(blockCol).as("block"), col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = emb.select(col(blockCol).as("block"), col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosineSim(col("va"), col("vb")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Exact brute-force cosine top-k neighbors for a query set.
    * The query side is broadcast; ranking is deterministic (rounded
    * cosine desc, then neighbor id). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(cosineSim(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"),
        col("rank").cast("long").as("rank"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 folded to [-1, 1). Seeded so every executor derives the
    * same planes with zero driver state. */
  private def planeComponent(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit("graft-lsh"), lit(plane), dim), lit(2000001L)) - 1000000L)
      .cast("double") / 1000000.0

  /** Random-hyperplane LSH bucket signature (numPlanes sign bits). */
  def lshSignature(vecCol: Column, numPlanes: Int): Column = {
    val dims = sequence(lit(0), size(vecCol) - 1)
    val bits = (0 until numPlanes).map { p =>
      val dot = aggregate(
        zip_with(vecCol, dims, (v, i) => v.cast("double") * planeComponent(p, i)),
        lit(0.0d), (acc, x) => acc + x)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** ANN top-k via hyperplane-LSH buckets: exact cosine computed only
    * against same-bucket candidates. Recall/latency trades on
    * numPlanes; multi-probe = OR of per-band signatures. */
  def annLshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, numPlanes: Int, bands: Int, k: Int): DataFrame = {
    require(numPlanes % bands == 0)
    val per = numPlanes / bands
    def banded(df: DataFrame, role: String): DataFrame = {
      val sig = lshSignature(col(vecCol), numPlanes)
      df.select(col(idCol).as(s"${role}_id"), col(vecCol).as(s"${role}_v"), sig.as("sig"))
        .select(col(s"${role}_id"), col(s"${role}_v"),
          explode(array((0 until bands).map { b =>
            struct(lit(b).as("band"),
              shiftright(col("sig"), b * per).bitwiseAND((1L << per) - 1L).as("key"))
          }: _*)).as("bk"))
        .select(col(s"${role}_id"), col(s"${role}_v"),
          col("bk.band").as("band"), col("bk.key").as("key"))
    }
    val c = banded(corpus, "neighbor")
    val q = banded(queries, "query")
    val cand = c.join(broadcast(q), Seq("band", "key"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), col("query_v"), col("neighbor_v"))
      .distinct()
    val scored = cand.withColumn("cosine", round(cosineSim(col("query_v"), col("neighbor_v")), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"),
        col("rank").cast("long").as("rank"))
  }
}
