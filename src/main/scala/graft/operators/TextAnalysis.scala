package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language identification, quality scoring, and document
  * fingerprinting over a text column (the harness `documents` table).
  *
  * The reference has no text analytics (its only text ops are rename/cast,
  * `/root/reference/dags/posts_etl.py:92-94`); these extend the engine per
  * the north star. Everything here is a pure `Column` expression built from
  * `org.apache.spark.sql.functions` — codegen'd, no UDFs, no shuffles of
  * their own — so each stays inside whole-stage codegen and scales as a
  * map-side transform: at 100 TB these run at scan speed and the only
  * shuffles are whatever aggregation the caller adds on top.
  */
object TextAnalysis {

  /** Lowercase word tokens (runs of [a-z0-9]); empty tokens dropped.
    * Whitespace-and-punctuation tokenizer — the exact semantics the DuckDB
    * oracle mirrors with `string_split_regex`. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))

  /** Word-token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword token count: letter runs, digit runs, and each
    * non-space symbol count as one token — a cheap, deterministic proxy
    * for LLM tokenizer counts (no vocab needed). */
  def subwordTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("""\p{L}+|\p{N}+|[^\s\p{L}\p{N}]"""), lit(0)))

  /** Ratio of [a-z0-9 ] characters after lowercasing (1.0 = clean prose,
    * low = symbol soup). NULL-safe: empty text → 0.0. */
  def alphaRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, lit(0.0)).otherwise(
      length(regexp_replace(lower(text), "[^a-z0-9 ]", "")).cast("double") / len)
  }

  private val stopwordsEn = Seq(
    "the", "a", "and", "of", "to", "in", "is", "you", "that", "it")

  /** Fraction of tokens that are (English) stopwords — a standard
    * fluency/quality signal; near 0 on keyword spam. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t => t.isInCollection(stopwordsEn)))
    when(size(toks) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(toks))
  }

  /** Composite quality score in [0, 1]: length band + alphanumeric purity
    * + stopword presence. Deliberately simple and fully SQL-expressible so
    * the DuckDB oracle can replicate it bit-for-bit (after rounding). */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val alpha = alphaRatio(text)
    val stop = least(stopwordRatio(text) * 5.0, lit(1.0))
    (lenScore * 0.3 + alpha * 0.4 + stop * 0.3)
  }

  // Per-language function-word sets for the n-gram/stopword language-ID
  // heuristic. ASCII-only on purpose: the tokenizer strips diacritics, so
  // accented forms would never match anyway.
  private val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> stopwordsEn,
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "ser", "se", "no"),
    "de" -> Seq("der", "die", "und", "den", "von", "zu", "das", "mit", "sich", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"))

  /** CJK character count — a script-based fast path for zh/ja/ko. */
  def cjkCharCount(text: Column): Column =
    length(regexp_replace(text, "[^一-鿿]", ""))

  /** Language-ID heuristic: CJK script wins outright; otherwise the
    * language with the most function-word token hits (ties resolved in
    * fixed en→es→de→fr precedence); no hits → "und".
    *
    * Scale note: one pass over the token array per language — O(langs ×
    * tokens) map-side work, no shuffle, no broadcast state. A production
    * fastText-style model would slot in behind the same Column contract.
    */
  def langId(text: Column): Column =
    langIdFromParts(tokens(text), cjkCharCount(text))

  /** Staged form of [[langId]]: callers doing per-document work at scale
    * should tokenize once (`.select(tokens(text).as("toks"), ...)`) and
    * pass the attributes here — the score CASE chain references its
    * inputs many times, and only attribute references are free
    * (re-tokenizing per reference is the HOF-staging trap; see the
    * `Dedup.shingles` contract). */
  def langIdFromParts(toks: Column, cjkCount: Column): Column = {
    val scores = langStopwords.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isInCollection(words)))
    }
    // CASE chain in fixed precedence order: first language whose score is
    // maximal and positive.
    val maxScore = greatest(scores.map(_._2): _*)
    val chain = scores.foldRight(lit("und"): Column) { case ((lang, score), el) =>
      when(score === maxScore && score > 0, lit(lang)).otherwise(el)
    }
    when(cjkCount > 0, lit("zh")).otherwise(chain)
  }

  /** Fixed-point basis points: `floor(x * 10000 + 0.5)` as a long —
    * the engine-portable projection for derived ratios (double division
    * of exact integers is IEEE-identical across engines; `round()`
    * half-way ties are not). */
  def bp(x: Column): Column = floor(x * 10000.0 + 0.5)

  /** Gopher-style repetition/format quality rules (Rae et al. 2021,
    * table A1) as one staged signal computation. Inputs are ATTRIBUTES
    * (`text`/`toks`/`lines` staged by the caller via a select), never
    * composed expressions — each signal references its input many times,
    * and only attribute references are free under Catalyst inlining (the
    * HOF-staging contract, see [[langIdFromParts]]).
    *
    * Signals (all exact integers or basis-point fixed-point, so the
    * DuckDB oracle replays them bit-for-bit):
    *  - `n_words`, `mwl_bp` (mean word length ×10⁴)
    *  - `symbol_bp`: (`#` + `...` occurrences) / words
    *  - `alpha_bp`: fraction of words containing a letter
    *  - `bullet_bp` / `ellipsis_bp`: fraction of lines starting with a
    *    bullet / ending with an ellipsis
    *  - `n_stop`: distinct required-stopword hits
    *
    * Scale: pure map-side Column math over one scan — no shuffle, no
    * UDF; at 100 TB this runs at scan speed and feeds a filter. */
  def gopherSignals(text: Column, toks: Column, lines: Column): Seq[(String, Column)] = {
    val nWords = size(toks)
    val denomW = greatest(nWords, lit(1)).cast("double")
    val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val hashes = length(text) - length(replace(text, lit("#"), lit("")))
    val ellipses = (length(text) - length(replace(text, lit("..."), lit("")))) / 3
    val alphaWords = size(filter(toks, t => t.rlike("[a-z]")))
    val nLines = greatest(size(lines), lit(1)).cast("double")
    val bulletLines = size(filter(lines,
      l => ltrim(l).startsWith("- ") || ltrim(l).startsWith("* ")))
    val ellipsisLines = size(filter(lines, l => rtrim(l).endsWith("...")))
    Seq(
      "n_words" -> nWords.cast("long"),
      "mwl_bp" -> bp(sumLen.cast("double") / denomW),
      "symbol_bp" -> bp((hashes + ellipses).cast("double") / denomW),
      "alpha_bp" -> bp(alphaWords.cast("double") / denomW),
      "bullet_bp" -> bp(bulletLines.cast("double") / nLines),
      "ellipsis_bp" -> bp(ellipsisLines.cast("double") / nLines),
      "n_stop" -> size(array_intersect(toks,
        array(gopherStopwords.map(lit): _*))).cast("long"))
  }

  /** Gopher required stopwords (Rae et al. 2021). The keep rule uses a
    * ≥1 hit threshold instead of the paper's ≥2 — the harness corpus is
    * synthetic vocabulary where only "the" occurs. */
  val gopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The Gopher keep decision from [[gopherSignals]] OUTPUT attributes —
    * all comparisons on exact integers (counts and basis points), so the
    * boundary cases cannot diverge between engines. */
  def gopherKeep(
      nWords: Column, mwlBp: Column, symbolBp: Column, alphaBp: Column,
      bulletBp: Column, ellipsisBp: Column, nStop: Column): Column =
    (nWords.between(50, 100000) && mwlBp.between(30000, 100000) &&
      symbolBp < 1000 && bulletBp < 9000 && ellipsisBp < 3000 &&
      alphaBp > 8000 && nStop >= 1).cast("int")

  /** Canonical text normalization for fingerprinting/dedup: lowercase,
    * collapse every non-alphanumeric run to a single space, trim. */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** 128-bit content fingerprint of the normalized text (hex md5 —
    * engine-portable, matches DuckDB's `md5`). */
  def fingerprint(text: Column): Column = md5(normalizeText(text).cast("binary"))

  /** Per-token 31-bit seed hash, portable across engines: the first 8
    * hex chars of `md5(token)` as an integer, mod 2^31-1. Exactly
    * reproducible in DuckDB as
    * `CAST('0x' || substr(md5(t),1,8) AS BIGINT) % 2147483647`, which is
    * what lets [[rollingHash]] be oracle-verified end to end. */
  def tokenSeed(tok: Column): Column =
    pmod(conv(substring(md5(tok.cast("binary")), 1, 8), 16, 10).cast("long"),
      lit(2147483647L))

  /** 62-bit rolling (polynomial) hash over word tokens: two independent
    * 31-bit Rabin-style hashes `h = (h * mult + seed(token)) mod 2^31-1`
    * (mults 31 and 131) packed into one long. The modulus keeps every
    * intermediate < 2^39, so the arithmetic can never overflow — Spark 4
    * runs ANSI mode by default, where a long overflow is an error, not a
    * wrap. Pure `aggregate` higher-order functions, no UDF. The token
    * seed is [[tokenSeed]] (md5-derived) rather than xxhash64 so the
    * whole fingerprint is engine-portable and DuckDB-oracled. */
  def rollingHash(text: Column): Column = {
    val m = lit(2147483647L) // 2^31 - 1 (prime)
    def poly(mult: Long) = aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * lit(mult) + tokenSeed(t), m))
    poly(31L) * lit(2147483648L) + poly(131L)
  }
}
