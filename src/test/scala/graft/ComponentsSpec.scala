package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Components
import graft.text.Repetition

class ComponentsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def clusters(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(pairs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap

  test("chain collapses to the min id (the diameter killer)") {
    // a 30-long chain: naive label propagation needs 30 rounds, star ~log
    val got = clusters((1L until 30L).map(i => (i, i + 1)))
    assert(got.keySet == (1L to 30L).toSet)
    assert(got.values.toSet == Set(1L))
  }

  test("multiple components, input order and orientation irrelevant") {
    val got = clusters(Seq((9L, 7L), (3L, 5L), (5L, 4L), (20L, 21L), (7L, 9L)))
    assert(got == Map(9L -> 7L, 7L -> 7L, 3L -> 3L, 5L -> 3L, 4L -> 3L,
      20L -> 20L, 21L -> 20L))
  }

  test("star + bridge merges into one cluster") {
    val star = (1L to 10L).map(i => (100L, 100L + i))
    val bridge = Seq((105L, 2L), (2L, 1L))
    val got = clusters(star ++ bridge)
    assert(got.values.toSet == Set(1L))
    assert(got.keySet.size == 13)
  }

  test("empty pair set yields empty labels; self-loops ignored") {
    assert(clusters(Seq.empty).isEmpty)
    assert(clusters(Seq((4L, 4L))).isEmpty)
    assert(clusters(Seq((4L, 4L), (4L, 6L))) == Map(4L -> 4L, 6L -> 4L))
  }

  test("a 1000-node chain converges in O(log n) rounds, not O(n)") {
    val (labels, rounds) = Components.connectedComponentsWithRounds(
      (1L until 1000L).map(i => (i, i + 1)).toDF("id_a", "id_b"))
    assert(labels.select("cluster_id").distinct().as[Long].collect().toSeq == Seq(1L))
    assert(labels.count() == 1000)
    // naive min-label propagation would need ~1000 rounds here; alternating
    // star needs ~log₂(1000) ≈ 10 (+1 to observe the fixed point)
    assert(rounds <= 15, s"took $rounds rounds")
  }

  test("matches brute-force closure on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = (0 until 120).map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find reference
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val want = parent.keys.map(k => k -> find(k)).toMap
    assert(clusters(pairs) == want)
  }
}

class RepetitionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def stats(text: String): (Long, Double, Double, Double) =
    Seq(Tuple1(text)).toDF("t").select(
      Repetition.nLines(col("t")).cast("long"),
      Repetition.dupLineFrac(col("t")),
      Repetition.excessCharFrac(col("t")),
      Repetition.topBigramFrac(col("t")))
      .as[(Long, Double, Double, Double)].collect()(0)

  test("kernel matches the column-composition reference on mixed inputs") {
    // the interpreted HOF formulation, kept ONLY as a test reference
    import org.apache.spark.sql.Column
    def linesRef(t: Column) =
      filter(transform(split(t, "\n"), l => trim(l)), l => length(l) > 0)
    def sumLen(a: Column) = aggregate(a, lit(0L), (acc, x) => acc + length(x))
    val texts = Seq("a b\na b\nc", "x", "", "one two one two one",
      "  pad  \n\tpad\n pad", "q r\nq r\nq r\nq r")
    for (t <- texts) {
      val df = Seq(Tuple1(t)).toDF("t")
      val ls = linesRef(col("t"))
      val want = df.select(
        size(ls).cast("long"),
        when(size(ls) === 0, 0.0)
          .otherwise((size(ls) - size(array_distinct(ls))).cast("double") / size(ls)),
        when(sumLen(ls) === 0L, 0.0)
          .otherwise((sumLen(ls) - sumLen(array_distinct(ls))).cast("double") / sumLen(ls)))
        .as[(Long, Double, Double)].collect()(0)
      val got = stats(t)
      assert((got._1, got._2, got._3) == want, s"input: ${t.replace("\n", "\\n")}")
    }
  }

  test("clean text: no duplicate lines, distinct bigrams") {
    val (n, dl, ec, tb) = stats("one two three\nfour five six")
    assert(n == 2 && dl == 0.0 && ec == 0.0)
    // \s+ tokenization crosses the newline: 6 tokens → 5 bigrams, all unique
    assert(math.abs(tb - 1.0 / 5.0) < 1e-12)
  }

  test("duplicated line mass") {
    // 3 lines, one exact repeat of 'aa bb' (5 chars each, 12 total line chars)
    val (n, dl, ec, _) = stats("aa bb\ncc\naa bb")
    assert(n == 3)
    assert(math.abs(dl - 1.0 / 3.0) < 1e-12)
    assert(math.abs(ec - 5.0 / 12.0) < 1e-12)
  }

  test("blank and whitespace-only lines are dropped before the fractions") {
    val (n, dl, _, _) = stats("x y\n\n   \nx y")
    assert(n == 2 && math.abs(dl - 0.5) < 1e-12)
  }

  test("top bigram fraction catches the repeated phrase") {
    // 'spam ham' appears 3 times in 7 bigrams
    val (_, _, _, tb) = stats("spam ham x spam ham y spam ham")
    assert(math.abs(tb - 3.0 / 7.0) < 1e-12)
  }

  test("degenerate inputs: empty, single token") {
    assert(stats("") == ((0L, 0.0, 0.0, 0.0)))
    assert(stats("word") == ((1L, 0.0, 0.0, 0.0)))
  }
}

class CorpusFilterSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._
  import graft.text.CorpusFilter

  private val docs = Seq(
    (1L, "a clean document with exactly ten ordinary word tokens here now"),
    (2L, "short one"),                                          // too_short
    (3L, "aaaaaaaaaaaaaaaaa " * 12),                            // word_len high
    (4L, "x y\nx y\nx y\nunique line words here padd pad more"), // dup_lines
    (5L, "go go go go go go go go go go go go")                 // repeated bigram
  ).toDF("id", "text")

  test("gate emits the right reasons per document") {
    val got = CorpusFilter.withGate(docs, "text")
      .select("id", "reasons").as[(Long, Seq[String])].collect().toMap
    assert(got(1L) == Seq.empty)
    assert(got(2L).contains("too_short"))
    assert(got(3L).contains("word_len_out_of_range"))
    assert(got(4L).contains("dup_lines"))
    assert(got(5L).contains("repeated_bigram"))
  }

  test("survivors keep original schema and only clean rows") {
    val s = CorpusFilter.survivors(docs, "text")
    assert(s.columns.toSeq == Seq("id", "text"))
    assert(s.select("id").as[Long].collect().toSeq == Seq(1L))
  }
}
