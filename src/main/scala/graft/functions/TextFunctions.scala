package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines:
  * tokenization, token counting, quality scoring, language ID, shingling,
  * and document fingerprinting.
  *
  * Everything here is a narrow, codegen-friendly projection built from
  * Spark SQL builtins and higher-order array functions — no UDFs, so the
  * expressions fuse into WholeStageCodegen and scale linearly with the
  * scan. Functions that must agree bit-for-bit with an external SQL
  * oracle avoid libm and RNG (integer arithmetic + IEEE +,*,- only).
  */
object TextFunctions {

  /** Whitespace tokens (single-space delimited corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: runs of word chars or single non-space symbols —
    * a cheap proxy for subword tokenizer counts over raw text.
    */
  def regexTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))

  /** Share of non-alphanumeric, non-space characters. */
  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[A-Za-z0-9 ]", "")).cast("double") /
      length(text).cast("double")

  /** Share of tokens found in `stopwords` (duplicates counted — a quality
    * signal, not set membership).
    */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(lit): _*)))
      .cast("double") / tokenCount(text).cast("double")

  /** Mean token length in characters. */
  def meanWordLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))
      .cast("double") / tokenCount(text).cast("double")

  /** Language ID by stopword-hit voting over per-language marker lists.
    * Ties break by list order (first wins) — deterministic.
    */
  def langId(text: Column, markers: Seq[(String, Seq[String])]): Column = {
    val scores = markers.map { case (lang, words) =>
      lang -> size(filter(tokens(text), t => t.isin(words.map(lit): _*)))
    }
    // First language whose score >= every later language's score wins.
    scores.init.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, sc), i), els) =>
        val later = scores.drop(i + 1).map(_._2)
        when(later.foldLeft(lit(true))((a, m) => a && sc >= m), lit(lang)).otherwise(els)
    }
  }

  /** Word n-gram shingles (distinct), n >= 2; rows with fewer than n
    * tokens produce an empty list.
    */
  def shingles(text: Column, n: Int = 2): Column =
    // bind the token array once per row: element_at(t, ..) appears n
    // times inside the gram lambda, and a val-named subtree would
    // re-tokenize at every reference (see keptSegments note)
    bind1(tokens(text)) { t =>
      val gram = (i: Column) =>
        concat_ws(" ", (0 until n).map(k => element_at(t, i + lit(k + 1))): _*)
      array_distinct(
        when(size(t) >= n, transform(sequence(lit(0), size(t) - n), gram))
          .otherwise(array()))
    }

  /** PII scrubbing for training corpora: replace emails, IPv4 addresses,
    * and phone-like digit runs with typed placeholder tags. Order matters —
    * emails first (their digits/dots would otherwise be chewed by the ip/
    * phone passes), then IPs, then phones. Patterns stay inside the
    * RE2-compatible subset (no backreferences, no lookaround) so an
    * external SQL engine running RE2 produces identical output.
    */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>")
    regexp_replace(ip, "\\+?[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>")
  }

  /** Rolling-hash document fingerprint: per-token hash (len*131 + first
    * char code) folded left with (acc*31 + h) mod 1000003. Stays in int64,
    * reproducible in any engine with 64-bit integer arithmetic.
    */
  def fingerprint(text: Column): Column =
    aggregate(
      transform(tokens(text), t => length(t) * lit(131L) + ascii(substring(t, 1, 1))),
      lit(7L),
      (acc, h) => (acc * 31 + h) % 1000003L)

  /** Adjacent token pairs as "left right" strings — the counting
    * primitive of BPE vocabulary induction (the merge loop is a small
    * driver-side iteration around a global pair count). One-token and
    * empty docs yield an empty array.
    */
  def adjacentPairs(text: Column): Column =
    bind1(tokens(text)) { t =>
      zip_with(
        slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (l, r) => concat(l, lit(" "), r))
    }

  /** Within-document boilerplate filter (repetition-removal rules in the
    * Gopher/C4 family): chop the doc into `segTokens`-token segments and
    * keep a segment only if it is the FIRST occurrence of its content in
    * the doc and has at least `minDistinct` distinct tokens. Returns the
    * kept segments, in order. Entirely per-row array algebra — no
    * explode, no shuffle; the reassembled doc is one projection.
    */
  def keptSegments(text: Column, segTokens: Int, minDistinct: Int): Column = {
    // Bind intermediates ONCE per row via single-element-array transform:
    // a lambda variable is a bound value, so references inside the body
    // cost O(1) — naming the subexpression with a val and referencing it
    // in a lambda would instead INLINE the whole subtree at every
    // reference site (Catalyst expressions are trees, not DAGs), making
    // each filter step re-tokenize the doc and re-build the segment
    // array: O(nseg^2 * len) per row. Measured 4.7x on t25 at sf0.1
    // after the testdata refresh lengthened documents.
    bind1(tokens(text)) { t =>
      val nseg = ceil(size(t) / lit(segTokens.toDouble)).cast("long")
      bind1(transform(sequence(lit(0L), nseg - 1),
          i => array_join(slice(t, (i * segTokens + 1).cast("int"),
            lit(segTokens)), " "))) { segs =>
        filter(segs, (seg, i) =>
          array_position(segs, seg) === (i + 1).cast("long") &&
            size(array_distinct(split(seg, " "))) >= minDistinct)
      }
    }
  }

  /** Fixed-token context windows at a stride (training-sequence prep):
    * window w starting every `stride` tokens, short final window kept,
    * docs with <= (window - stride) tokens produce one window when they
    * have any token beyond... concretely: n windows = ceil((len -
    * overlap) / stride) for len > overlap, where overlap = window -
    * stride. Intermediates bound once per row (see keptSegments note).
    */
  def contextChunks(text: Column, window: Int, stride: Int): Column = {
    require(stride > 0 && window >= stride, "need window >= stride > 0")
    val overlap = window - stride
    bind1(tokens(text)) { t =>
      val n = ceil((size(t) - lit(overlap)) / lit(stride.toDouble))
        .cast("long")
      // guard: sequence(0, n-1) with n <= 0 would generate a DESCENDING
      // sequence (Spark's default step is sign-inferred), not an empty one
      when(size(t) > overlap,
        transform(sequence(lit(0L), n - 1),
          i => array_join(
            slice(t, (i * stride + 1).cast("int"), lit(window)), " ")))
        .otherwise(array())
    }
  }

  /** Evaluate `e` once per row and pass the bound value to `body` — the
    * expression-DAG escape hatch for array-valued common subexpressions
    * referenced from inside higher-order-function lambdas (where codegen
    * subexpression elimination cannot reach). */
  private[graft] def bind1(e: Column)(body: Column => Column): Column =
    element_at(transform(array(e), body), 1)
}
