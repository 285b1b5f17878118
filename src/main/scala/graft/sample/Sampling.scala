package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data curation.
  *
  * A 100 TB corpus build needs reproducible, engine-independent
  * sampling — re-running the pipeline (or auditing it from another
  * engine) must select the SAME documents. `rand()` is neither, so
  * rows are bucketed by a Knuth multiplicative hash of the record id
  * (id × 2654435761 mod 10000 — plain 64-bit integer arithmetic any
  * engine reproduces bit-exactly) and kept when the bucket falls under
  * the stratum's rate. Entirely narrow: the predicate sits on the
  * scan, no shuffle, no state.
  */
object Sampling {

  private val buckets = 10000L

  /** Hash bucket in [0, 10000) from a non-negative integral id. */
  def hashBucket(id: Column): Column =
    pmod(id.cast("long") * lit(2654435761L), lit(buckets))

  /** Per-stratum deterministic sampling: keep a row when its id bucket
    * is below `rates(stratum) * 10000` (`defaultRate` for strata not in
    * the map). Rates are a compile-time literal map — the whole filter
    * is one codegen'd predicate, no join. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Double], defaultRate: Double): DataFrame = {
    val rate = coalesce(
      element_at(typedLit(rates), col(strataCol).cast("string")),
      lit(defaultRate))
    df.filter(hashBucket(col(idCol)) < rate * buckets)
  }
}
