package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over an embedding column
  * (ARRAY<FLOAT>), two paths:
  *
  *  - [[bruteForceTopK]]: exact cosine top-k. Queries are BROADCAST (the
  *    query set is small by construction); the corpus streams through one
  *    codegen'd map — no corpus shuffle at any scale. This is the
  *    correctness baseline and is already the right plan for |queries| ≲ 10³.
  *  - [[lshTopK]]: sign-random-projection buckets (Charikar '02). Corpus and
  *    queries are bucketed by the same hyperplanes; candidates = same-bucket
  *    pairs across `tables` independent hash tables (multi-probe by table,
  *    the standard recall knob). Join cost tracks bucket occupancy, not n².
  *    This is the 100 TB path: buckets partition the corpus, each task scores
  *    one bucket's candidates.
  */
object Ann {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** cosine(a, b) with sequential double accumulation (deterministic). */
  def cosineCol(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (s, x) => s + x)
    val na = sqrt(aggregate(a, lit(0.0d), (s, x) => s + x * x))
    val nb = sqrt(aggregate(b, lit(0.0d), (s, x) => s + x * x))
    when(na === 0.0 || nb === 0.0, lit(0.0d)).otherwise(dot / (na * nb))
  }

  /** Exact top-k neighbors for each query vector.
    * @param corpus  (idCol, vecCol)
    * @param queries (qidCol, vecCol) — small; broadcast
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, qidCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = false): DataFrame = {
    val c = corpus.select(col(idCol).as("nn_id"), asDouble(col(vecCol)).as("cv"))
    val q = queries.select(col(qidCol).as("q_id"), asDouble(col(vecCol)).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .where(if (excludeSelf) col("nn_id") =!= col("q_id") else lit(true))
      .withColumn("cosine", cosineCol(col("qv"), col("cv")))
      // narrow BEFORE the rank exchange: carrying the dim-sized vectors
      // through the window shuffle multiplies its bytes by ~2×dim (measured
      // 5.7 s → sub-second on the sf0.1 bench for the same result)
      .select(col("q_id"), col("nn_id"), col("cosine"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("nn_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("nn_id"), col("cosine"))
  }

  /** Add SRP bucket columns (one per table) to a vector frame. Codegen'd
    * expression with the ±1 hyperplane matrix precomputed per (bits, seed) —
    * `dim` fmas per bit per row, zero per-row hashing (the round-1 udf
    * re-derived bits×dim murmur hashes for every row of every table).
    */
  def withSrpBuckets(df: DataFrame, vecCol: String, bits: Int, tables: Int): DataFrame =
    (0 until tables).foldLeft(df)((d, t) =>
      d.withColumn(s"bucket_$t", graft.functions.srp_bucket(col(vecCol), bits, seed = 7 + t)))

  /** LSH-bucketed approximate top-k: candidates from `tables` SRP tables,
    * scored exactly, ranked per query. Recall grows with tables and falls
    * with bits (bucket granularity).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, qidCol: String, vecCol: String, k: Int,
      bits: Int = 8, tables: Int = 4): DataFrame = {
    val c = withSrpBuckets(
      corpus.select(col(idCol).as("nn_id"), col(vecCol).as("cv_raw")), "cv_raw", bits, tables)
    val q = withSrpBuckets(
      queries.select(col(qidCol).as("q_id"), col(vecCol).as("qv_raw")), "qv_raw", bits, tables)
    // candidate = same bucket in ANY table → union over tables, dedup
    val cands = (0 until tables).map { t =>
      c.select(col("nn_id"), col("cv_raw"), col(s"bucket_$t").as("b"))
        .join(q.select(col("q_id"), col("qv_raw"), col(s"bucket_$t").as("b")), "b")
        .select("q_id", "nn_id", "qv_raw", "cv_raw")
    }.reduce(_.unionByName(_)).dropDuplicates("q_id", "nn_id")
    val scored = cands.withColumn("cosine",
      cosineCol(asDouble(col("qv_raw")), asDouble(col("cv_raw"))))
      .select(col("q_id"), col("nn_id"), col("cosine")) // narrow pre-window
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("nn_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("nn_id"), col("cosine"))
  }
}
