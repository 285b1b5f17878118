package graft.sample

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Temperature-scaled mixture sampling (T = 2): derive each source's
    * sampling rate from the corpus itself so the sampled mixture
    * up-weights small sources relative to their raw share — the
    * standard multilingual/multi-source training-data mixing move
    * (weight ∝ n^(1/T); T = 2 is the sqrt form, hardwired because
    * IEEE-754 requires sqrt correctly rounded, so every engine
    * computes the identical weight — a general-T pow() carries no such
    * guarantee). The overall take targets `budgetNum/budgetDen` of the
    * corpus; a source's per-row rate is
    *   rate_s = budget · N · w_s / (W · n_s),  w_s = ⌊√n_s·1000⌋,
    * capped at 1, applied via the same deterministic id-hash bucket as
    * [[stratifiedSample]]. Thresholds are computed entirely in integer
    * arithmetic (decimal(38,0) here, HUGEINT in the SQL oracle) so the
    * bucket comparison is bit-identical across engines — no float
    * normalizer whose summation order could flip a boundary row.
    *
    * Scale shape: per-source counts are one partial-aggregated
    * groupBy over a column that is typically low-cardinality (sources
    * number thousands, not billions); the S-row rate table broadcasts
    * back and selection is a narrow filter — the corpus itself never
    * shuffles. Intermediate products stay under 10^4·num·N·w_s ≈
    * 10^23·num at N = 10^11 docs — inside decimal(38,0)/HUGEINT range.
    */
  /** Per-group top-quantile filter (round 8) — the quality-filtering
    * step every pretraining corpus build runs (CCNet/FineWeb shape):
    * within each group keep the rows whose `valueCol` lands in the top
    * `keepNum/keepDen` fraction, ties at the boundary ALL kept (so the
    * kept count is ⌈keepFrac·n⌉ plus boundary ties — deterministic,
    * never an arbitrary tie pick).
    *
    * Exactness and scale come from the same move: the quantile is NOT
    * computed by ranking the corpus (a per-group global sort — the
    * window-on-unbounded-key anti-pattern) but from a value HISTOGRAM.
    * Values quantize to integer micro-units (⌊v·10⁶⌋ — one double
    * multiply + floor, bit-identical cross-engine), the per-(group,
    * value) counts partial-aggregate map-side into a tiny table
    * (groups × distinct values), a cumulative window over THAT finds
    * each group's threshold — smallest value whose top-down cumulative
    * count reaches ⌈n·keepNum/keepDen⌉, in pure integer arithmetic —
    * and the G-row threshold table broadcasts back as a narrow filter.
    * The corpus is scanned twice (histogram + filter) and never
    * shuffled. Null values never count toward n and are never kept;
    * null group keys are dropped (no quantile is defined for them). */
  def quantileTopFilter(df: DataFrame, valueCol: String, groupCol: String,
                        keepNum: Long, keepDen: Long): DataFrame = {
    require(keepNum > 0 && keepDen >= keepNum,
      "keep fraction must be in (0, 1]")
    val withU = df
      .withColumn("__vu", floor(col(valueCol) * 1e6).cast("long"))
      .filter(col("__vu").isNotNull)
    val hist = withU.groupBy(col(groupCol), col("__vu"))
      .agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy(groupCol).orderBy(col("__vu").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val thr = hist
      .withColumn("__cum", sum(col("__c")).over(cumW))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(groupCol)))
      .filter(col("__cum") >= expr(s"(__n * $keepNum + $keepDen - 1) div $keepDen"))
      .groupBy(col(groupCol)).agg(max(col("__vu")).as("__thr"))
    withU.join(broadcast(thr), Seq(groupCol))
      .filter(col("__vu") >= col("__thr"))
      .drop("__vu", "__thr")
  }

  def temperatureMixSample(df: DataFrame, idCol: String, srcCol: String,
                           budgetNum: Long, budgetDen: Long): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0, "budget must be a positive fraction")
    val dec = "decimal(38,0)"
    // S rows, but TWO consumers (the totals aggregate and the rate
    // table) — without materialization each consumer re-runs the full
    // corpus count scan, turning a two-pass operator into three passes
    val stats = df.groupBy(col(srcCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double")) * 1000).cast("long"))
      .localCheckpoint(false)
    val tot = stats.agg(sum(col("__n")).as("__totn"), sum(col("__w")).as("__totw"))
    val rates = stats.crossJoin(broadcast(tot))
      .withColumn("__t", least(lit(buckets),
        floor((lit(buckets).cast(dec) * lit(budgetNum).cast(dec) *
                col("__totn").cast(dec) * col("__w").cast(dec)) /
              (lit(budgetDen).cast(dec) * col("__totw").cast(dec) *
                col("__n").cast(dec))).cast("long")))
      .select(col(srcCol), col("__t"))
    df.join(broadcast(rates), Seq(srcCol))
      .filter(hashBucket(col(idCol)) < col("__t"))
      .drop("__t")
  }
}
