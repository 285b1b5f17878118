package graft.vector

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's) and IVF approximate nearest neighbor —
  * the centroid-based scale path for similarity search (the alternative
  * to the hyperplane-LSH path in [[Similarity.annLshTopK]]).
  *
  * Scale shape: the corpus never moves. Assignment broadcasts the k
  * centroids (k·dim doubles — bounded, driver-held, exactly MLlib's
  * layout) against the corpus as a narrow map; the centroid update is
  * one posexplode + groupBy (cluster, dim) average, so only k·dim
  * partial sums cross the wire per iteration. IVF probing computes
  * exact cosine only inside the nprobe nearest cells per query —
  * corpus-side work scales with nprobe/k of the corpus.
  */
object Cluster {

  private def asDouble(vecCol: String) = transform(col(vecCol), _.cast("double"))

  /** Lloyd's k-means, deterministic hash-ordered seeding. Returns the
    * centroids as (cluster, centroid: array<double>). */
  def fitCentroids(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    val base = emb.select(col(idCol).as("__id"), asDouble(vecCol).as("v"))
      .filter(col("v").isNotNull)
    // deterministic seed sample: k smallest id-hashes
    var centroids: Array[(Int, Seq[Double])] = base
      .withColumn("__h", xxhash64(lit("graft-kmeans"), col("__id")))
      .withColumn("__rn", row_number().over(Window.orderBy(col("__h"), col("__id"))))
      .filter(col("__rn") <= k)
      .select((col("__rn") - 1).cast("int").as("cluster"), col("v"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
    for (_ <- 1 to iters) {
      val cdf = centroidsDF(spark, centroids)
      val assigned = assignInternal(base, cdf)
      val updated = assigned
        .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim")).agg(avg(col("x")).as("m"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("dim"), col("m")))).as("dm"))
        .select(col("cluster"), transform(col("dm"), s => s.getField("m")).as("centroid"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))
      // keep seeds for clusters that lost all members (stable arity)
      val byId = updated.toMap
      centroids = centroids.map { case (cid, c) => (cid, byId.getOrElse(cid, c)) }
    }
    centroidsDF(spark, centroids)
  }

  private def centroidsDF(spark: SparkSession, cs: Array[(Int, Seq[Double])]): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("cluster", IntegerType),
      StructField("centroid", ArrayType(DoubleType))))
    spark.createDataFrame(
      java.util.Arrays.asList(cs.map(c => Row(c._1, c._2)): _*), schema)
  }

  private def dist2(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0d), (acc, v) => acc + v)

  /** Nearest-centroid assignment: broadcast centroids, min_by distance. */
  private def assignInternal(base: DataFrame, centroids: DataFrame): DataFrame =
    base.crossJoin(broadcast(centroids))
      .withColumn("__d2", dist2(col("v"), col("centroid")))
      .groupBy(col("__id"))
      .agg(min_by(col("cluster"), struct(col("__d2"), col("cluster"))).as("cluster"),
        first(col("v")).as("v"))

  /** Assign every row to its nearest centroid; adds a `cluster` column. */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame): DataFrame = {
    val base = emb.select(col(idCol).as("__id"), asDouble(vecCol).as("v"))
      .filter(col("v").isNotNull)
    assignInternal(base, centroids)
      .select(col("__id").as(idCol), col("v"), col("cluster"))
  }

  /** IVF ANN top-k: cluster the corpus, probe the `nprobe` nearest
    * cells per query, exact cosine only inside probed cells. */
  def annIvfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, iters: Int, nprobe: Int,
                 topK: Int): DataFrame = {
    val centroids = fitCentroids(corpus, idCol, vecCol, k, iters)
    val c = assign(corpus, idCol, vecCol, centroids)
      .select(col(idCol).as("neighbor_id"), col("v").as("cv"), col("cluster"))
      .withColumn("cn2", aggregate(col("cv"), lit(0.0d), (acc, x) => acc + x * x))
    val qBase = queries.select(col(idCol).as("query_id"), asDouble(vecCol).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("qn2", aggregate(col("qv"), lit(0.0d), (acc, x) => acc + x * x))
    // probe list: nprobe nearest centroids per query
    val probes = qBase.crossJoin(broadcast(centroids))
      .withColumn("__d2", dist2(col("qv"), col("centroid")))
      .withColumn("__pr", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("__d2"), col("cluster"))))
      .filter(col("__pr") <= nprobe)
      .select(col("query_id"), col("qv"), col("qn2"), col("cluster"))
    val dot = aggregate(zip_with(col("qv"), col("cv"), (x, y) => x * y),
      lit(0.0d), (acc, v) => acc + v)
    val scored = c.join(broadcast(probes), Seq("cluster"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", round(dot / (sqrt(col("qn2")) * sqrt(col("cn2"))), 6))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 4).as("cosine"),
        col("rank").cast("long").as("rank"))
  }
}
