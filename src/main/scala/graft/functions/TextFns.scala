package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-processing column combinators for the training-data pipeline.
  * Pure built-in functions (codegen'd, no UDFs) so they hold up on
  * 100 TB of documents.
  */
object TextFns {

  /** Whitespace-collapse + trim + lowercase — the canonical form used
    * by fingerprints and dedup. */
  def normalizeText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** md5 fingerprint of the normalized text. */
  def fingerprint(c: Column): Column = md5(normalizeText(c))

  /** Whitespace tokenization; empty/blank text → empty array. */
  def tokens(c: Column): Column =
    when(length(trim(c)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(c), "\\s+"))

  /** Whitespace token count (empty-safe). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token count: alpha runs, digit runs, and single
    * punctuation marks each count as one token — a cheap, deterministic
    * stand-in for a subword tokenizer's pre-tokenization. */
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  /** Count of tokens that appear in `vocab`. */
  def tokenHits(c: Column, vocab: Seq[String]): Column =
    size(filter(tokens(c), t => t.isin(vocab.map(v => v: Any): _*)))

  /** Character n-gram shingles over an ALREADY-NORMALIZED column.
    *
    * IMPORTANT: pass a materialized attribute (a real column), not an
    * expression — `norm` is referenced from inside the per-element
    * lambda, so an embedded expression subtree (e.g. the normalize
    * regex) would be re-evaluated once per shingle instead of once per
    * document. That exact mistake made signature builds ~30× slower. */
  def shinglesFromNorm(norm: Column, n: Int): Column =
    when(length(norm) < n, array(norm)).otherwise(
      transform(sequence(lit(1), length(norm) - (n - 1)),
        i => norm.substr(i, lit(n))))

  /** Distinct shingles (set semantics) of a normalized column —
    * native codegen'd expression (see graft.plans.CharShingles). */
  def shingleSetFromNorm(norm: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.plans.CharShingles(GraftColumnBridge.expression(norm), n))
  }

  /** Composed-builtins variant of shingleSetFromNorm — kept as the
    * semantic reference for CharShingles (tests compare the two). */
  def shingleSetFromNormComposed(norm: Column, n: Int): Column =
    array_distinct(shinglesFromNorm(norm, n))

  /** Word n-gram shingles over a materialized token-array column;
    * fewer than n tokens yield one whole-doc shingle. */
  def wordNgramsFromToks(toks: Column, n: Int): Column =
    when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** Distinct word n-grams of a token-array column — composed
    * builtins; the SEMANTIC REFERENCE for [[wordNgramSetFromNorm]]
    * (tests compare the two). */
  def wordNgramSetFromToks(toks: Column, n: Int): Column =
    array_distinct(wordNgramsFromToks(toks, n))

  /** Distinct word n-grams straight from an ALREADY-NORMALIZED
    * column (single-space separated) — native codegen'd kernel
    * (graft.plans.WordNgramSet): one owned byte copy per document,
    * zero-copy n-gram views, no interpreted higher-order chain.
    * Equals `wordNgramSetFromToks(tokens(norm), n)` exactly. */
  def wordNgramSetFromNorm(norm: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      graft.plans.WordNgramSet(GraftColumnBridge.expression(norm), n))
  }
}
