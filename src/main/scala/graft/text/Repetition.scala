package graft.text

import org.apache.spark.sql.Column

/** Repetition-based quality signals (the Gopher/MassiveText family,
  * Rae et al. 2021 §A1.1): documents dominated by duplicated lines or by
  * one repeated n-gram are boilerplate/spam and get filtered before
  * training.
  *
  * All four signals come from ONE codegen'd kernel pass per row
  * ([[TextStats.repetitionStats]] via `repetition_stats`): the obvious
  * Column-composition over higher-order array functions runs interpreted
  * and re-evaluates the embedded tokenizer per lambda element —
  * O(tokens² × distinct) regex work per row, measured as a single-task
  * multi-minute stall at sf0.1. Catalyst's subexpression elimination
  * collapses the four field reads to one kernel call per row when they
  * share a projection.
  *
  * Definitions (kept exactly SQL-expressible for the DuckDB oracle):
  *  - lines = space-trimmed '\n'-split segments, empties dropped;
  *  - dup_line_frac   = 1 − |distinct lines| / |lines|;
  *  - excess_char_frac = (Σ len(lines) − Σ len(distinct lines)) / Σ len —
  *    the character mass that would vanish if repeated lines kept one copy;
  *  - top_bigram_frac = occurrences of the most frequent word bigram /
  *    total bigrams (0 when fewer than 2 tokens).
  */
object Repetition {

  /** STRUCT(n_lines, dup_line_frac, excess_char_frac, top_bigram_frac). */
  def statsCol(text: Column): Column = graft.functions.repetition_stats(text)

  /** Trimmed non-empty line count. */
  def nLines(text: Column): Column = statsCol(text).getField("n_lines")

  /** Fraction of lines that are repeats of an earlier line. */
  def dupLineFrac(text: Column): Column = statsCol(text).getField("dup_line_frac")

  /** Fraction of line characters beyond one copy per distinct line. */
  def excessCharFrac(text: Column): Column = statsCol(text).getField("excess_char_frac")

  /** Fraction of bigram slots taken by the single most frequent bigram. */
  def topBigramFrac(text: Column): Column = statsCol(text).getField("top_bigram_frac")
}
