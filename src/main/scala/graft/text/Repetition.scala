package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Repetition-based quality signals (the Gopher/MassiveText family,
  * Rae et al. 2021 §A1.1): documents dominated by duplicated lines or by
  * one repeated n-gram are boilerplate/spam and get filtered before
  * training. All signals are pure Column compositions over Spark's native
  * array/higher-order functions — per-row, no shuffle, no UDF — so the
  * filter runs inside the scan projection at any scale.
  *
  * Definitions (kept exactly SQL-expressible for the DuckDB oracle):
  *  - lines = trimmed '\n'-split segments, empties dropped;
  *  - dup_line_frac   = 1 − |distinct lines| / |lines|;
  *  - excess_char_frac = (Σ len(lines) − Σ len(distinct lines)) / Σ len —
  *    the character mass that would vanish if repeated lines kept one copy;
  *  - top_bigram_frac = occurrences of the most frequent word bigram /
  *    total bigrams (0 when fewer than 2 tokens).
  */
object Repetition {

  /** Trimmed non-empty lines of `text`. */
  def linesCol(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  private def sumLen(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + length(x))

  /** Fraction of lines that are repeats of an earlier line. */
  def dupLineFrac(text: Column): Column = {
    val ls = linesCol(text)
    when(size(ls) === 0, lit(0.0d))
      .otherwise((size(ls) - size(array_distinct(ls))).cast("double") / size(ls))
  }

  /** Fraction of line characters beyond one copy per distinct line. */
  def excessCharFrac(text: Column): Column = {
    val ls = linesCol(text)
    val total = sumLen(ls)
    when(total === 0L, lit(0.0d))
      .otherwise((total - sumLen(array_distinct(ls))).cast("double") / total)
  }

  /** Whitespace-token bigrams of `text` (the q19-oracle shingle recipe at
    * k=2, duplicates KEPT — frequency is the point here).
    */
  def bigramsCol(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    when(size(toks) < 2, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
  }

  /** Fraction of bigram slots taken by the single most frequent bigram.
    * The inner count is O(|distinct|·|bigrams|) per ROW — document-length
    * bounded (cap inputs upstream), never a join.
    */
  def topBigramFrac(text: Column): Column = {
    val bg = bigramsCol(text)
    val top = array_max(transform(array_distinct(bg),
      x => size(filter(bg, y => y === x))))
    when(size(bg) === 0, lit(0.0d))
      .otherwise(top.cast("double") / size(bg))
  }
}
