package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Deduplication operators for LLM training-data pipelines.
  *
  * Exact dedup is a hash-groupBy (one shuffle). Near-dup families
  * (MinHash+LSH, SimHash, n-gram Jaccard) all follow the same scale
  * pattern: per-doc signatures computed in a narrow pass, candidate
  * pairs generated only inside small buckets/blocks — never an O(n²)
  * cross join — then exact similarity only on candidates.
  */
object Dedup {

  /** Exact dedup groups via md5 of normalized text: canonical doc =
    * min id, plus group size. */
  def exactDedupGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(normalizeText(col(textCol))).as("text_hash"))
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("dup_count"))

  /** Seeded 64-bit shingle hash (xxhash64 with a per-function salt). */
  private def seededHash(shingle: Column, seed: Int): Column =
    xxhash64(lit(seed), shingle)

  /** MinHash + LSH banding candidate pairs.
    *
    * k minhashes over word shingles, grouped into bands; docs sharing
    * any band signature become a candidate pair. Pair generation is a
    * self-join on (band, signature) — linear in bucket sizes. Bucket
    * skew at 100 TB is handled by dropping degenerate buckets (all-equal
    * boilerplate) above `maxBucket`.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleSize: Int, numHashes: Int, bands: Int,
                      maxBucket: Int = 1000): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val shingled = docs
      .select(col(idCol).as("doc_id"),
        explode(wordShingles(normalizeText(col(textCol)), shingleSize)).as("shingle"))
    val mhAggs = (0 until numHashes).map(i => min(seededHash(col("shingle"), i)).as(s"mh_$i"))
    val minhashes = shingled.groupBy(col("doc_id")).agg(mhAggs.head, mhAggs.tail: _*)
    // band signature = hash of the band's minhash tuple
    val banded = minhashes.select(col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh_$i")): _*)
            .as("sig"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
    val pruned = banded
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("band"), col("sig"))))
      .filter(col("__n") <= maxBucket).drop("__n")
    val a = pruned.select(col("band"), col("sig"), col("doc_id").as("doc_a"))
    val b = pruned.select(col("band"), col("sig"), col("doc_id").as("doc_b"))
    a.join(b, Seq("band", "sig"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** 64-bit SimHash per doc: sign-aggregated bit votes of token hashes.
    * 64 plain sum aggregates over the exploded token hashes — all inside
    * whole-stage codegen with map-side partials (higher-order-function
    * lambdas would fall back to interpreted eval), so it stays one
    * narrow pass + one shuffle on doc_id at any corpus size. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokens = docs.select(col(idCol).as("doc_id"),
      explode(split(normalizeText(col(textCol)), "\\s+")).as("token"))
    val hashed = tokens.select(col("doc_id"), xxhash64(col("token")).as("h"))
    // bit b of simhash = 1 iff sum over tokens of (+1 if bit set else -1) > 0
    val voteAggs = (0 until 64).map { b =>
      sum(shiftright(col("h"), b).bitwiseAND(1) * 2 - 1).as(s"v_$b")
    }
    val votes = hashed.groupBy(col("doc_id")).agg(voteAggs.head, voteAggs.tail: _*)
    val bits = (0 until 64).map { b =>
      when(col(s"v_$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }
    votes.select(col("doc_id"), bits.reduce((a, b) => a.bitwiseOR(b)).as("simhash"))
  }

  /** Near-dup pairs within a Hamming radius of SimHash fingerprints.
    * Pigeonhole blocking: split 64 bits into `radius+1` chunks; any pair
    * within the radius must agree on ≥1 chunk — join per chunk, then
    * exact Hamming filter. */
  def simhashPairs(sim: DataFrame, radius: Int): DataFrame = {
    val chunks = radius + 1
    val bitsPer = 64 / chunks
    val withChunks = sim.select(col("doc_id"), col("simhash"),
      explode(array((0 until chunks).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * bitsPer)
            .bitwiseAND((1L << bitsPer) - 1L).as("key"))
      }: _*)).as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk").as("chunk"), col("ck.key").as("key"))
    val a = withChunks.select(col("chunk"), col("key"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = withChunks.select(col("chunk"), col("key"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        hamming64(col("sim_a"), col("sim_b")).as("hamming")).distinct()
      .filter(col("hamming") <= radius)
  }

  /** Character n-gram Jaccard similarity over blocked candidate pairs.
    * Blocking key keeps the pair space linear-ish; the exact Jaccard is
    * computed by exploding distinct n-grams and joining inside blocks.
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String], n: Int, minJaccard: Double): DataFrame = {
    val block = concat_ws("", blockCols.map(col): _*)
    val base = docs.select(col(idCol).as("doc_id"), block.as("block"),
      charNgrams(normalizeText(col(textCol)), n).as("grams"))
      .withColumn("n_grams", size(col("grams")))
    val exploded = base.select(col("doc_id"), col("block"), col("n_grams"),
      explode(col("grams")).as("gram"))
    val a = exploded.select(col("block"), col("gram"),
      col("doc_id").as("doc_a"), col("n_grams").as("na"))
    val b = exploded.select(col("block"), col("gram"),
      col("doc_id").as("doc_b"), col("n_grams").as("nb"))
    a.join(b, Seq("block", "gram"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"), first(col("na")).as("na"), first(col("nb")).as("nb"))
      .withColumn("jaccard",
        round(col("inter").cast("double") / (col("na") + col("nb") - col("inter")), 4))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
