package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.{Dedup, SigLedger}
import graft.text.CorpusFilter

class LineDedupSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("corpus-wide boilerplate lines drop; order and unique lines survive") {
    val corpus = Seq(
      (1L, "boiler\nalpha one\nboiler tail"),
      (2L, "boiler\nbeta two\nboiler tail"),
      (3L, "boiler\ngamma three\nboiler tail"),
      (4L, "boiler\ndelta four\nkept solo")).toDF("id", "text")
    val out = Dedup.dropDuplicateLines(corpus, "id", "text", maxDocFreq = 3)
      .orderBy("id").collect()
    // "boiler" df=4 dropped; "boiler tail" df=3 dropped (>= cap); rest kept
    assert(out.map(_.getAs[String]("text_clean")).toSeq ==
      Seq("alpha one", "beta two", "gamma three", "delta four\nkept solo"))
    assert(out.forall(_.getAs[Long]("n_lines") == 3))
    assert(out.map(_.getAs[Long]("n_kept")).toSeq == Seq(1L, 1L, 1L, 2L))
  }

  test("within-doc repeats do not inflate doc frequency") {
    // "spam" appears 5x in doc 1 but only 2 DOCS carry it — under cap 3 it
    // must survive everywhere (occurrence-counting would kill it)
    val corpus = Seq(
      (1L, "spam\nspam\nspam\nspam\nspam"),
      (2L, "spam\nunique middle"),
      (3L, "clean only")).toDF("id", "text")
    val out = Dedup.dropDuplicateLines(corpus, "id", "text", maxDocFreq = 3)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("text_clean") == "spam\nspam\nspam\nspam\nspam")
    assert(out(1).getAs[String]("text_clean") == "spam\nunique middle")
  }

  test("a fully-boilerplate document survives with empty text, exact counts") {
    val corpus = Seq(
      (1L, "b1\nb2"), (2L, "b1\nb2"), (3L, "b1\nb2"),
      (4L, "b1\nown line")).toDF("id", "text")
    val out = Dedup.dropDuplicateLines(corpus, "id", "text", maxDocFreq = 3)
      .orderBy("id").collect()
    assert(out(0).getAs[String]("text_clean") == "")
    assert(out(0).getAs[Long]("n_kept") == 0L)
    assert(out(0).getAs[Long]("n_lines") == 2L)
    assert(out(3).getAs[String]("text_clean") == "own line")
  }

  test("host-level gate: low-pass hosts out, evidence bar spares tiny hosts") {
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val rows =
      Seq.tabulate(10)(i => (i.toLong, "spamhost.test", "a b c")) ++ // all fail
      Seq.tabulate(10)(i => (100L + i, "goodhost.test", s"$good n$i")) ++
      Seq.tabulate(3)(i => (200L + i, "tiny.test", "x y")) // all fail, but only 3 docs
    val gated = CorpusFilter.withGate(
      spark.createDataFrame(rows).toDF("id", "host", "text"), "text")
    val hq = CorpusFilter.hostQuality(gated, "host",
        minDocs = 5L, minPassPpm = 500000L)
      .orderBy("host").collect()
    assert(hq.map(r => (r.getAs[String]("host"), r.getAs[Boolean]("host_ok"))).toSeq ==
      Seq(("goodhost.test", true), ("spamhost.test", false), ("tiny.test", true)))
    assert(hq.find(_.getAs[String]("host") == "spamhost.test").get
      .getAs[Long]("pass_ppm") == 0L)
    // survivors: only goodhost docs (pass AND ok host); tiny's docs fail the
    // per-doc gate even though the host itself was not condemned
    val surv = CorpusFilter.survivorsByHost(gated, "host",
      minDocs = 5L, minPassPpm = 500000L)
    assert(surv.select("host").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("goodhost.test"))
    assert(surv.count() == 10)
  }

  test("host gate drops a passing document when its host is condemned") {
    val good = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    // badhost: 9 failing docs + 1 genuinely good one → ppm 100000 < bar;
    // the good doc must NOT survive (that is the point of a host gate)
    val rows =
      Seq.tabulate(9)(i => (i.toLong, "badhost.test", "a b c")) ++
      Seq((9L, "badhost.test", good))
    val gated = CorpusFilter.withGate(
      spark.createDataFrame(rows).toDF("id", "host", "text"), "text")
    assert(CorpusFilter.survivorsByHost(gated, "host",
      minDocs = 5L, minPassPpm = 300000L).count() == 0)
  }

  test("custom separator (paragraph mode) treats the separator literally") {
    val corpus = Seq(
      (1L, "same para|only here"), (2L, "same para|unique"),
      (3L, "same para|third")).toDF("id", "text")
    val out = Dedup.dropDuplicateLines(corpus, "id", "text",
        maxDocFreq = 3, sep = "|")
      .orderBy("id").collect()
    assert(out.map(_.getAs[String]("text_clean")).toSeq ==
      Seq("only here", "unique", "third"))
  }
}

class Bm25Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("tf and idf ordering: more hits rank higher, rare terms weigh more") {
    val docs = Seq(
      (1L, "apple banana cherry date elder fig"),
      (2L, "apple apple apple banana cherry date"),
      (3L, "banana cherry date elder fig grape"),
      (4L, "zebra cherry date elder fig grape")).toDF("id", "text")
    // tf: doc 2 (3× apple) over doc 1 (1× apple), same length
    val q1 = Seq((0L, "apple")).toDF("qid", "qtext")
    val r1 = graft.text.Bm25.topK(docs, "id", "text", q1, "qid", "qtext", k = 5)
      .orderBy("rank").collect()
    assert(r1.map(_.getAs[Long]("id")).toSeq == Seq(2L, 1L))
    // idf: "zebra" (df=1) dominates "banana" (df=3) → doc 4 first
    val q2 = Seq((0L, "zebra banana")).toDF("qid", "qtext")
    val r2 = graft.text.Bm25.topK(docs, "id", "text", q2, "qid", "qtext", k = 1)
      .collect()
    assert(r2(0).getAs[Long]("id") == 4L)
  }

  test("out-of-vocabulary query matches nothing; k truncates; ties break by id") {
    val docs = Seq((1L, "same words here"), (2L, "same words here"),
      (3L, "same words here")).toDF("id", "text")
    val qs = Seq((0L, "nosuchterm"), (1L, "same words")).toDF("qid", "qtext")
    val out = graft.text.Bm25.topK(docs, "id", "text", qs, "qid", "qtext", k = 2)
      .orderBy("qid", "rank").collect()
    assert(out.forall(_.getAs[Long]("qid") == 1L)) // qid 0 empty
    // identical docs → identical scores → id ascending, truncated at k=2
    assert(out.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
  }

  test("salted two-phase top-k equals the single-window rank exactly") {
    val docs = spark.range(200).select(col("id"),
      concat_ws(" ",
        lit("alpha"),
        when(col("id") % 3 === 0, lit("beta beta")).otherwise(lit("gamma")),
        when(col("id") % 7 === 0, lit("delta epsilon zeta")).otherwise(lit("eta")),
        lit("theta iota")).as("text"))
    val qs = Seq((0L, "beta delta"), (1L, "alpha eta")).toDF("qid", "qtext")
    def run(s: Int) = graft.text.Bm25
      .topK(docs, "id", "text", qs, "qid", "qtext", k = 15, salts = s)
      .orderBy("qid", "rank").collect().toSeq
    assert(run(1) == run(16))
  }
}

class SigLedgerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val a = "the quick brown fox jumps over the lazy dog again and again today"
  private val b = "completely different vocabulary nothing shared with any other text here"
  private val c = "third corpus member with its own words entirely separate from both"

  test("wave-over-wave screen + append: dups rejected across waves") {
    val dir = java.nio.file.Files.createTempDirectory("sigledger").toString
    val path = s"$dir/bands"
    def bandsOf(docs: org.apache.spark.sql.DataFrame) =
      Dedup.bandRows(Dedup.minHashSigs(docs, "id", "text"))

    // wave 1: empty ledger accepts everything
    val w1 = Seq((1L, a), (2L, b)).toDF("id", "text")
    val s1 = SigLedger.screen(SigLedger.read(spark, path), w1, "id", "text")
      .orderBy("id").collect()
    assert(s1.forall(_.getAs[Boolean]("novel")))
    SigLedger.append(bandsOf(w1), path)

    // wave 2: near-dup of doc 1 (one-word tail change) + fresh doc
    val w2 = Seq((10L, a + " extra"), (11L, c)).toDF("id", "text")
    val s2 = SigLedger.screen(SigLedger.read(spark, path), w2, "id", "text")
      .orderBy("id").collect()
    assert(!s2(0).getAs[Boolean]("novel") && s2(0).getAs[Long]("dup_of") == 1L)
    assert(s2(1).getAs[Boolean]("novel"))
    val novel2 = w2.where(col("id") === 11L)
    SigLedger.append(bandsOf(novel2), path)

    // wave 3: exact copy of the doc accepted in wave 2 → rejected now
    val w3 = Seq((20L, c)).toDF("id", "text")
    val s3 = SigLedger.screen(SigLedger.read(spark, path), w3, "id", "text")
      .collect()
    assert(!s3(0).getAs[Boolean]("novel") && s3(0).getAs[Long]("dup_of") == 11L)
    // exact copy shares every band
    assert(s3(0).getAs[Long]("n_hit_bands") == 8L)
  }

  test("hot ledger bucket: probe output stays bounded by bands, dup_of = min") {
    // 500 ledger docs all in the same single bucket — the rep-collapse must
    // keep the probe to ONE hit row, with the smallest member as dup_of
    val ledger = spark.range(500).select((col("id") + 7L).as("id"),
      org.apache.spark.sql.functions.lit(0).as("band"),
      org.apache.spark.sql.functions.lit(42).as("bucket"))
    val probe = Seq((1000L, 0, 42)).toDF("id", "band", "bucket")
    val out = SigLedger.screenBands(ledger, probe).collect()
    assert(out.length == 1)
    assert(out(0).getAs[Long]("n_hit_bands") == 1L)
    assert(out(0).getAs[Long]("dup_of") == 7L)
  }

  test("screen of an empty batch returns an empty frame, not a failure") {
    val ledger = Seq((1L, 0, 5)).toDF("id", "band", "bucket")
    val empty = spark.range(0).select(col("id"),
      org.apache.spark.sql.functions.lit(0).as("band"),
      org.apache.spark.sql.functions.lit(0).as("bucket"))
    assert(SigLedger.screenBands(ledger, empty).count() == 0)
  }
}
