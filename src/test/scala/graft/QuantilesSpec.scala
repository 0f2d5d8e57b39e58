package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Quantiles

/** Exact integer quantiles via the distinct-value histogram + skew-proof
  * prefix sum. Checked against the literal sorted-array definition.
  */
class QuantilesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naive(values: Seq[Long], q: Double): Long = {
    val sorted = values.sorted
    sorted((math.max(1L, math.ceil(q * sorted.length).toLong) - 1).toInt)
  }

  test("matches the sorted-array definition on skewed duplicated data") {
    val rnd = new scala.util.Random(7)
    val values = Seq.fill(5000)(rnd.nextInt(40).toLong * rnd.nextInt(3))
    val df = rnd.shuffle(values).toDF("v").repartition(9)
    val qs = Seq(0.1, 0.3, 0.5, 0.9, 0.999, 1.0)
    val got = Quantiles.exactQuantiles(df, "v", qs)
    assert(got == qs.map(naive(values, _)))
  }

  test("segment count is a pure parallelism knob") {
    val values = (1 to 1000).map(_.toLong % 97)
    val df = values.toDF("v")
    val a = Quantiles.exactQuantiles(df, "v", Seq(0.25, 0.75), segments = 1)
    val b = Quantiles.exactQuantiles(df, "v", Seq(0.25, 0.75), segments = 64)
    assert(a == b)
  }

  test("single distinct value and tiny inputs") {
    assert(Quantiles.exactQuantiles(Seq(5L, 5L, 5L).toDF("v"), "v",
      Seq(0.01, 0.5, 1.0)) == Seq(5L, 5L, 5L))
    assert(Quantiles.exactQuantiles(Seq(9L).toDF("v"), "v", Seq(0.5)) == Seq(9L))
  }

  test("empty input rejects loudly") {
    intercept[IllegalArgumentException] {
      Quantiles.exactQuantiles(Seq.empty[Long].toDF("v"), "v", Seq(0.5))
    }
  }
}
