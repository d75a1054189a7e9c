package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for training-data pipelines.
  *
  * Everything here compiles to built-in Catalyst expressions (split,
  * md5, transform, aggregate, ...) — no UDFs — so it stays inside
  * whole-stage codegen and is safe in 100 TB-scan projections. The
  * hash primitives are md5-based rather than Spark's murmur3 `hash()`
  * on purpose: md5 is engine-independent, which lets every operator
  * built on them be verified against an external SQL oracle.
  */
object TextFunctions {

  /** Whitespace tokens. Testdata documents are single-space separated;
    * for general text use `tokensRegex`. */
  def tokens(c: Column): Column = split(c, " ")

  /** Regex word tokens (a BPE-ish lowercase-alpha segmentation). */
  def tokensRegex(c: Column): Column = regexp_extract_all(lower(c), lit("[a-z0-9']+"), lit(0))

  /** Engine-independent 32-bit hash: first 8 hex chars of md5 as a long
    * in [0, 2^32). */
  def hash32(c: Column): Column = conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Word k-shingles: overlapping k-grams of the token array (the
    * MinHash input). Empty array when the doc has fewer than k tokens. */
  def wordShingles(toks: Column, k: Int = 3): Column =
    when(
      size(toks) >= k,
      transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", (1 to k).map(j => element_at(toks, i + j)): _*)
      )
    ).otherwise(array().cast("array<string>"))

  // MinHash lives in Dedup.minhashSignatures as explode → md5-per-row →
  // grouped min-of-slices. Deliberately NOT offered as array-transform
  // column functions here: a digests-array column consumed by several
  // slice expressions gets inlined into each by CollapseProject,
  // recomputing every md5 once per slice (measured 8× slower).

  /** Count of non-overlapping occurrences of `pat` in `c` via
    * length-difference — engine-independent (same formula runs in the
    * DuckDB oracles). */
  def occurrences(c: Column, pat: String): Column =
    ((length(c) - length(replace(c, lit(pat), lit("")))) / pat.length).cast("int")

  /** Stopword marker lists for the language-ID heuristic. Scores count
    * space-padded stopword occurrences, so partial-word hits don't
    * fire. zh uses CJK function-word characters. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " to "),
    "es" -> Seq(" el ", " la ", " que ", " los "),
    "de" -> Seq(" der ", " die ", " und ", " nicht "),
    "fr" -> Seq(" le ", " les ", " et ", " une "),
    "zh" -> Seq("的", "是", "了", "在")
  )

  /** Per-language stopword score over space-padded text. */
  def langScore(c: Column, lang: String): Column = {
    val padded = concat(lit(" "), c, lit(" "))
    langMarkers
      .collectFirst { case (`lang`, pats) => pats }
      .get
      .map(p => occurrences(padded, p))
      .reduce(_ + _)
  }

  /** Heuristic language ID: argmax of the marker scores with a fixed
    * tiebreak cascade (en > es > de > fr > zh). Returns "und" when no
    * marker fires. */
  def langId(c: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(c, l) }
    val best = greatest(scores.map(_._2): _*)
    scores
      .foldLeft(when(best === 0, "und")) { case (acc, (l, s)) => acc.when(s === best, l) }
      .otherwise("und")
  }

  /** Canonical text normalization for dedup keys: lowercase, strip
    * non-alphanumerics, collapse whitespace runs, trim. Run this BEFORE
    * exact/minhash dedup so trivial formatting variants collide. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " "))

  def tokenCount(c: Column): Column = size(tokens(c))

  /** Mean token length ×1e6-rounded (engine-stable arithmetic). */
  def meanTokenLen(c: Column): Column =
    round(length(replace(c, lit(" "), lit(""))).cast("double") / tokenCount(c), 6)

  /** English stopword ratio — a cheap quality signal. */
  def stopwordRatio(c: Column): Column =
    round(langScore(c, "en").cast("double") / tokenCount(c), 6)

  /** Composite quality score in [0,1]-ish: length band + stopword
    * presence + sane mean word length. Deterministic, documented
    * weights; thresholds tuned for ~100-600 char training docs. */
  def qualityScore(c: Column): Column = {
    val lenOk = when(length(c).between(100, 2000), 0.4).otherwise(0.0)
    val stopOk = when(langScore(c, "en") > 0, 0.3).otherwise(0.0)
    val wlen = length(replace(c, lit(" "), lit(""))).cast("double") / tokenCount(c)
    val wlenOk = when(wlen.between(2.0, 12.0), 0.3).otherwise(0.0)
    round(lenOk + stopOk + wlenOk, 1)
  }
}
