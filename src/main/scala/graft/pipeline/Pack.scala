package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sequence packing — the LM-pretraining shard-assignment
  * operator: documents, taken in a deterministic order, are CONCATENATED
  * into a single token stream and split into fixed-`budget` bins (training
  * contexts / output shards). Each doc gets its bin coordinates:
  *
  *   - `bin_start`     = floor(prefixTokens ∕ budget) — the bin its first
  *                       token lands in;
  *   - `offset_in_bin` = prefixTokens mod budget;
  *   - `bins_spanned`  — docs longer than the remaining bin space straddle
  *                       into following bins (concat-and-split semantics —
  *                       the standard pretraining packing; bin-exclusive
  *                       greedy packing is a different operator).
  *
  * The whole computation is ONE exact prefix sum over the doc order. The
  * naive form — `sum() over (ORDER BY …)` with no partitioning — is a
  * single-task sort at any scale (Spark warns "No Partition Defined"); the
  * 10^10-doc form here is the same two-pass trick the politeness scheduler
  * uses for ranks ([[graft.frontier.Scheduler.perHostRankSalted]]): exact
  * per-bucket prefix sums within ordered SEGMENTS of the order key, plus a
  * tiny cumulated per-bucket offset frame joined back — per-task work is
  * bounded by segment width, the offsets frame by the segment count.
  */
object Pack {

  /** Exact exclusive prefix sum of `valueCol` over `orderCol` order,
    * skew-proof. Adds `prefix_sum` (sum of all values STRICTLY before this
    * row). `orderCol` must be integral, non-negative, and UNIQUE per row
    * (it is the total order; ties would make "before" ill-defined).
    *
    * `segments` sizes the pass: the key range is cut into that many ordered
    * buckets; each bucket's internal window is one task, and the offsets
    * frame holds ≤ `segments` rows. Results are IDENTICAL for any segment
    * count — it is purely a parallelism knob.
    */
  def prefixSumExclusive(df: DataFrame, orderCol: String, valueCol: String,
      segments: Int = 64): DataFrame = {
    require(segments >= 1, s"segments: $segments")
    // cast to long: the doc only demands "integral" — an INT order column
    // would otherwise surface as Integer and break getAs[Long]
    val mm = df.agg(min(col(orderCol).cast("long")).as("lo"),
      max(col(orderCol).cast("long")).as("hi")).collect()(0)
    if (mm.isNullAt(0)) return df.withColumn("prefix_sum", lit(0L))
    val lo = mm.getAs[Long]("lo")
    val hi = mm.getAs[Long]("hi")
    val width = math.max(1L, (hi - lo) / segments + 1L)
    // integer DIV, not double '/': a double quotient loses exactness past
    // 2^53 — precisely the 10-trillion-token regime this operator targets
    val bucketed = df.withColumn("_seg",
      expr(s"(`$orderCol` - ${lo}L) DIV ${width}L"))
    val wIn = Window.partitionBy(col("_seg")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val inSeg = bucketed.withColumn("_cum_in",
      coalesce(sum(col(valueCol)).over(wIn), lit(0L)))
    // ≤ `segments` rows: cumulate bucket totals into exclusive offsets.
    // The window here is over the tiny aggregate, not the data; the
    // constant partition key keeps the semantics (one partition) while
    // silencing WindowExec's global-window warning — on a frame this
    // size the warning is noise that buries real regressions in logs.
    val offsets = bucketed.groupBy(col("_seg"))
      .agg(sum(col(valueCol)).as("_n"))
      .withColumn("_offset",
        coalesce(sum(col("_n")).over(
          Window.partitionBy(lit(0)).orderBy(col("_seg"))
            .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("_seg"), col("_offset"))
    inSeg.join(broadcast(offsets), Seq("_seg"))
      .withColumn("prefix_sum", col("_offset") + col("_cum_in"))
      .drop("_seg", "_cum_in", "_offset")
  }

  /** Assign every doc its bin coordinates under concat-and-split packing.
    * Output: input columns + (tokens, bin_start, offset_in_bin,
    * bins_spanned). Zero-token docs occupy no space: they "land" at their
    * prefix position and span 1 bin by convention.
    */
  def packByTokenBudget(docs: DataFrame, orderCol: String, tokenCol: String,
      budget: Long, segments: Int = 64): DataFrame = {
    require(budget >= 1, s"budget: $budget")
    prefixSumExclusive(docs, orderCol, tokenCol, segments)
      .withColumn("bin_start", expr(s"prefix_sum DIV ${budget}L"))
      .withColumn("offset_in_bin", col("prefix_sum") % budget)
      .withColumn("bins_spanned",
        when(col(tokenCol) > 0,
          expr(s"(prefix_sum + `$tokenCol` - 1) DIV ${budget}L")
            - col("bin_start") + 1L)
          .otherwise(1L))
      .drop("prefix_sum")
  }

  /** Deterministic GLOBAL SHUFFLE + exactly-even sharding — the step
    * between packing and shard writing in a pretraining pipeline: training
    * order must be pseudo-random (adjacent crawl order = same host =
    * correlated batches) yet REPRODUCIBLE, and shard files must be even
    * (stragglers in the data loader otherwise). `orderCol` supplies the
    * shuffle order — production passes a hash (`xxhash64(id)`); it MUST be
    * unique per row (hash + id tiebreak if collisions matter) or ties
    * make the rank nondeterministic across runs. `global_rank` = exact
    * 0-based position in orderCol order via the same segment-partials +
    * broadcast-offsets machinery as [[prefixSumExclusive]] (never a
    * single-task global window), `shard` = rank mod nShards — round-robin
    * over the shuffled order, so shards differ by ≤ 1 row AND each shard
    * is itself a uniform slice of the shuffle.
    */
  def shuffleShards(docs: DataFrame, orderCol: String, nShards: Int,
      segments: Int = 64): DataFrame = {
    require(nShards >= 1, s"nShards: $nShards")
    prefixSumExclusive(docs.withColumn("_one", lit(1L)), orderCol, "_one",
        segments)
      .withColumn("global_rank", col("prefix_sum"))
      .withColumn("shard",
        pmod(col("prefix_sum"), lit(nShards.toLong)).cast("int"))
      .drop("_one", "prefix_sum")
  }
}
