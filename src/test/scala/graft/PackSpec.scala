package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.pipeline.Pack

class PackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(n: Int, seed: Long = 7L) = {
    val rnd = new scala.util.Random(seed)
    // sparse, shuffled-magnitude keys: the segment bucketing must not
    // assume dense or small order keys
    (0 until n).map(i => (i.toLong * 977L + 13L, rnd.nextInt(900).toLong))
      .toDF("ord", "tokens")
  }

  test("salted prefix sum == naive global-window prefix sum, any segment count") {
    val df = corpus(5000)
    val naive = df.withColumn("prefix_sum",
        coalesce(sum(col("tokens")).over(
          Window.orderBy(col("ord")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("ord", "prefix_sum").as[(Long, Long)].collect().toMap
    for (segs <- Seq(1, 7, 64)) {
      val got = Pack.prefixSumExclusive(df, "ord", "tokens", segments = segs)
        .select("ord", "prefix_sum").as[(Long, Long)].collect().toMap
      assert(got == naive, s"segments=$segs")
    }
  }

  test("packByTokenBudget: bin coordinates are the concat-and-split invariants") {
    val budget = 512L
    val rows = Pack.packByTokenBudget(corpus(3000), "ord", "tokens", budget)
      .select("ord", "tokens", "bin_start", "offset_in_bin", "bins_spanned")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    var cum = 0L
    for ((_, tokens, binStart, offset, spanned) <- rows) {
      assert(binStart == cum / budget)
      assert(offset == cum % budget)
      val expectSpan =
        if (tokens > 0) (cum + tokens - 1) / budget - cum / budget + 1 else 1L
      assert(spanned == expectSpan)
      cum += tokens
    }
    // totals line up: the last doc's end == total token count
    assert(cum == rows.map(_._2).sum)
  }

  test("a doc longer than the budget spans multiple bins; empty docs span one") {
    val df = Seq((1L, 100L), (2L, 2000L), (3L, 0L), (4L, 10L)).toDF("ord", "tokens")
    val m = Pack.packByTokenBudget(df, "ord", "tokens", budget = 512L)
      .select("ord", "bins_spanned").as[(Long, Long)].collect().toMap
    assert(m(1L) == 1L)
    assert(m(2L) == 5L) // 100..2100 covers bins 0..4
    assert(m(3L) == 1L)
    assert(m(4L) == 1L)
  }
}
