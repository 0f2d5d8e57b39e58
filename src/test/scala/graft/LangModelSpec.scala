package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.text.LangModel

/** Bigram LM quality scoring (the CCNet perplexity signal). The expected
  * values are computed HERE with string-keyed counts and the same
  * fixed-point formula — the hash-keyed Spark path must agree exactly.
  */
class LangModelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val scale = 1000000L
  private def fp(x: Double): Long = math.floor(math.log(x) * scale + 0.5).toLong

  // ref corpus: vocab = {the, cat, sat, ran, a, dog} (V = 6)
  // bigrams: "the cat"×2, "cat sat"×1, "cat ran"×1, "a dog"×1, "dog sat"×1
  // contexts: the×2, cat×2, a×1, dog×1
  private val refDocs = Seq("the cat sat", "the cat ran", "a dog sat")

  private def trained = LangModel.train(
    refDocs.toDF("text"), "text", scale = scale)

  test("train: vocab size and count tables match string-keyed ground truth") {
    val lm = trained
    assert(lm.vocab == 6L)
    assert(lm.bigramLp.count() == 5)
    assert(lm.contextLp.count() == 4)
  }

  test("score matches the hand-computed fixed-point log-likelihood") {
    val lm = trained
    val rows = LangModel.scoreDocs(
        Seq((1L, "the cat sat"), (2L, "zz qq"), (3L, "hello")).toDF("id", "text"),
        "id", "text", lm)
      .select("id", "n_bigrams", "ll_fp", "nll_tok_fp")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 1: (the,"the cat") → fp(2+1)−fp(2+6); (cat,"cat sat") → fp(1+1)−fp(2+6)
    val ll1 = (fp(3) - fp(8)) + (fp(2) - fp(8))
    assert(rows(1L) == ((2L, ll1, (-ll1) / 2)))
    // doc 2: fully OOV position → 0 − fp(V)
    val ll2 = 0L - fp(6)
    assert(rows(2L) == ((1L, ll2, -ll2)))
    // doc 3: single token → zero evidence, present with zeros
    assert(rows(3L) == ((0L, 0L, 0L)))
  }

  test("in-distribution text scores better (lower nll) than gibberish") {
    val lm = trained
    val rows = LangModel.scoreDocs(
        Seq((1L, "the cat sat the cat ran"), (2L, "qq zz ww vv xx yy"))
          .toDF("id", "text"), "id", "text", lm)
      .select("id", "nll_tok_fp").as[(Long, Long)].collect().toMap
    assert(rows(1L) < rows(2L))
  }

  test("scores are partition-count independent (fixed-point exactness)") {
    val lm = trained
    val docsDf = (0 until 200)
      .map(i => (i.toLong, s"the cat ${if (i % 3 == 0) "sat" else "ran"} a dog x$i"))
      .toDF("id", "text")
    val a = LangModel.scoreDocs(docsDf, "id", "text", lm)
      .orderBy("id").collect().toSeq
    val b = LangModel.scoreDocs(docsDf.repartition(7), "id", "text", lm,
        broadcastLm = false)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("bucketize: head/middle/tail by nll cutoffs") {
    val scored = Seq((1L, 10L), (2L, 50L), (3L, 99L))
      .toDF("id", "nll_tok_fp")
    val got = LangModel.bucketize(scored, headMax = 20L, middleMax = 60L)
      .select("id", "bucket").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "head", 2L -> "middle", 3L -> "tail"))
  }
}
