package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact quantiles of an INTEGER-valued column — the score-cutoff
  * computation the CCNet bucketing contract assumes exists offline
  * ([[graft.text.LangModel.bucketize]] takes the cutoffs as constants;
  * this is where they come from, in-engine and exact).
  *
  * `percentile_approx` would be the built-in answer, but approximate
  * cutoffs make the head/middle/tail split irreproducible across runs —
  * the opposite of what the fixed-point scoring discipline bought. For
  * integer scores the EXACT computation has a scalable shape: the
  * distinct-value HISTOGRAM (one map-side-combined count — fixed-point
  * scores have bounded cardinality, ≪ rows at corpus scale), then the
  * skew-proof exact prefix sum over distinct values
  * ([[Pack.prefixSumExclusive]] — ordered segments + broadcast offsets,
  * no global window), then one aggregate probing every requested q.
  * Nothing anywhere is proportional to the row count after the first
  * pass.
  *
  * Definition: `quantile(q)` = the smallest value v whose cumulative
  * count reaches `ceil(q·n)` (percentile_disc — an actual data value,
  * no interpolation, engine-exact on integers).
  */
object Quantiles {

  /** Exact q-quantiles of `valueCol` (integral). `qs` in (0, 1]. */
  def exactQuantiles(df: DataFrame, valueCol: String, qs: Seq[Double],
      segments: Int = 64): Seq[Long] = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q <= 1.0), s"qs: $qs")
    val hist = df.groupBy(col(valueCol).cast("long").as("v"))
      .agg(count(lit(1)).as("c"))
    val n = hist.agg(sum(col("c"))).collect()(0)
    require(!n.isNullAt(0), "exactQuantiles of an empty input")
    val total = n.getLong(0)
    val cum = Pack.prefixSumExclusive(hist, "v", "c", segments)
    val probes = qs.zipWithIndex.map { case (q, i) =>
      val target = math.max(1L, math.ceil(q * total).toLong)
      min(when(col("prefix_sum") + col("c") >= target, col("v"))).as(s"_q$i")
    }
    val row = cum.agg(probes.head, probes.tail: _*).collect()(0)
    qs.indices.map(i => row.getLong(i))
  }
}
