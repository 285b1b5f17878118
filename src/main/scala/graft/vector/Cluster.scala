package graft.vector

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions

/** Distributed k-means (Lloyd's) and IVF approximate nearest neighbor —
  * the centroid-based scale path for similarity search (the alternative
  * to the hyperplane-LSH path in [[Similarity.annLshTopK]]).
  *
  * Scale shape: the corpus never moves. The k centroids (k·dim doubles —
  * bounded, driver-held, exactly MLlib's layout) are embedded as a
  * broadcast-sized array literal, so assignment is a NARROW per-row
  * argmin — zero shuffle, no crossJoin, no window. The centroid update
  * is one posexplode + groupBy (cluster, dim) average, so only k·dim
  * partial sums cross the wire per iteration. Seeding picks the k
  * smallest id-hashes via a distributed partial top-k
  * (TakeOrderedAndProject), never a single-partition global sort.
  * IVF probing computes exact cosine only inside the nprobe nearest
  * cells per query — corpus-side work scales with nprobe/k of the corpus.
  */
object Cluster {

  private def asDouble(vecCol: String) = transform(col(vecCol), _.cast("double"))

  /** The k centroids as a plain double matrix indexed by cluster id —
    * handed to the native codegen'd expressions ([[graft.functions
    * .VectorExpressions]]) as a reference object: k·dim doubles ship
    * with the task closure exactly like a broadcast, and every
    * distance/argmin runs as a primitive loop inside whole-stage
    * codegen (the HOF transform/aggregate equivalent is interpreted
    * with boxed Doubles — it cost e13 ~15 s at sf0.1). */
  private def centroidMatrix(cs: Array[(Int, Seq[Double])]): Array[Array[Double]] =
    cs.sortBy(_._1).map(_._2.toArray)

  /** Narrow nearest-centroid argmin (ties → lowest cluster). */
  private def nearestCluster(v: Column, cents: Array[Array[Double]]): Column =
    VectorExpressions.nearestCentroid(v, cents)

  /** Seed-ordering hash: Knuth multiplicative on the row id — chosen
    * over xxhash64 because it is expressible verbatim in the DuckDB
    * oracle (the e19 stratified-sample precedent), which is what lets
    * e13 carry a full hash oracle instead of a rows-only check. Ids
    * are non-negative in every graft table, so plain `%` matches
    * DuckDB's; the product stays far from Long overflow (DuckDB would
    * error where the JVM wraps) for any realistic id space. */
  private def seedHash(id: Column): Column =
    (id * lit(2654435761L)) % lit(1000000007L)

  /** Lloyd's k-means, deterministic hash-ordered seeding. Returns the
    * centroids as (cluster, centroid: array<double>).
    *
    * ORACLE-REPLAYABLE DETERMINISM: every per-row computation
    * (distance folds, argmin ties → lowest cluster) is a fixed-order
    * IEEE-double loop the DuckDB oracle reproduces bit-for-bit with
    * `list_reduce`. The one aggregation whose partial-sum order the
    * engines cannot agree on — the centroid-update `avg` — is rounded
    * to 6 decimals each iteration in BOTH engines, truncating the
    * ~1e-13 sum-order noise so the converged centroids are identical
    * doubles. Rounding centroids at 1e-6 is quality-neutral for
    * clustering. */
  def fitCentroids(emb: DataFrame, idCol: String, vecCol: String,
                   k: Int, iters: Int): DataFrame = {
    val spark = emb.sparkSession
    // raw vector column (float or double) — the native expressions read
    // either element type directly, so no per-row array-copy cast pass
    val base = emb.select(col(idCol).as("__id"), col(vecCol).as("v"))
      .filter(col("v").isNotNull)
    // deterministic seed sample: k smallest id-hashes. limit-after-orderBy
    // compiles to TakeOrderedAndProject — a distributed partial top-k, not
    // a global single-partition sort.
    var centroids: Array[(Int, Seq[Double])] = base
      .withColumn("__h", seedHash(col("__id")))
      .orderBy(col("__h"), col("__id"))
      .limit(k)
      .select(col("__h"), transform(col("v"), _.cast("double")).as("v"))
      .collect()
      .sortBy(_.getLong(0)) // stable: ties keep Spark's (__h, __id) order
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1)) }
    for (_ <- 1 to iters) {
      val centArr = centroidMatrix(centroids)
      val updated = base
        .select(nearestCluster(col("v"), centArr).as("cluster"),
          posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(round(avg(col("x").cast("double")), 6).as("m"))
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

  private def collectCentroids(centroids: DataFrame): Array[(Int, Seq[Double])] =
    centroids.select(col("cluster"), col("centroid"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1)))

  /** Assign every row to its nearest centroid; adds a `cluster` column
    * carrying the centroid table's OWN cluster ids (which need not be
    * contiguous — the argmin runs over matrix positions, then maps the
    * position back through the id array; ties resolve to the lowest
    * cluster id). The centroid table is k rows — collected once,
    * embedded as a literal, so assignment is shuffle-free. */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroids: DataFrame): DataFrame = {
    val pairs = collectCentroids(centroids).sortBy(_._1)
    val centArr = pairs.map(_._2.toArray)
    val ids: Seq[Int] = pairs.toSeq.map(_._1)
    emb.select(col(idCol), asDouble(vecCol).as("v"))
      .filter(col("v").isNotNull)
      .withColumn("cluster",
        element_at(typedLit(ids), nearestCluster(col("v"), centArr) + 1))
  }

  /** IVF ANN top-k: cluster the corpus, probe the `nprobe` nearest
    * cells per query, exact cosine only inside probed cells. */
  def annIvfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, iters: Int, nprobe: Int,
                 topK: Int): DataFrame = {
    val centroids = collectCentroids(fitCentroids(corpus, idCol, vecCol, k, iters))
    val centArr = centroidMatrix(centroids)
    val kActual = centroids.length
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .filter(col("cv").isNotNull)
      .withColumn("cluster", nearestCluster(col("cv"), centArr))
      .withColumn("cn2", VectorExpressions.arrayNorm2(col("cv")))
    val qBase = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .filter(col("qv").isNotNull)
      .withColumn("qn2", VectorExpressions.arrayNorm2(col("qv")))
    // probe list: nprobe nearest centroids per query, computed NARROWLY —
    // sort the (distance, cluster) pairs per row, slice nprobe, explode.
    val probes = qBase
      .withColumn("__pl", slice(array_sort(
        zip_with(VectorExpressions.centroidDistances(col("qv"), centArr),
          sequence(lit(0), lit(kActual - 1)),
          (d, i) => struct(d.as("d"), i.as("cluster")))), 1, nprobe))
      .select(col("query_id"), col("qv"), col("qn2"),
        explode(col("__pl")).as("__p"))
      .select(col("query_id"), col("qv"), col("qn2"),
        col("__p.cluster").cast("int").as("cluster"))
    val dot = VectorExpressions.arrayDot(col("qv"), col("cv"))
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
