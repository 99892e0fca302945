package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text primitives for the dedup / text-analysis operators.
  *
  * Every helper is a pure `Column` expression (codegen'd builtins + higher-
  * order functions, zero UDFs) and has a 1:1 DuckDB-SQL mirror used in the
  * oracle queries, so results hash-match cell-exact:
  *
  *   - tokens:      `split(lower(text), "\\s+")`   ↔ `string_split_regex(lower(text), '\s+')`
  *   - shingles3:   3-token sliding window          ↔ list comprehension over `t[i:i+2]`
  *   - polyHash:    fold `(acc*31 + codepoint) % 1e9+7` ↔ `list_reduce(list_prepend(0, …))`
  */
object TextFns {

  /** Whitespace tokenization of lowercased text. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Word 3-grams ("shingles") of a token array column named `toks` —
    * empty below 3 tokens. Codegen'd [[ShingleJoin]] kernel; replaces the
    * interpreted-HOF form
    * `CASE WHEN size(toks) < 3 THEN array() ELSE transform(sequence(1,
    * size(toks) - 2), i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))
    * END`, whose per-gram lambda interpretation was the dedup family's
    * hottest stage at the sf100 probe (byte-identical output —
    * ShingleJoinSpec pins the equivalence property).
    */
  val shingles3FromToks: Column = ShingleJoin(col("toks"), 3)

  /** Portable polynomial rolling hash of a string column (codepoint fold,
    * base 31, mod 1e9+7) — deterministic and replicable in DuckDB SQL, unlike
    * xxhash64/crc32 whose exact bits differ across engines. Codegen'd
    * Catalyst expression ([[PolyHash]]) — the per-character HOF fold it
    * replaces ran interpreted, the repo's measured 15× anti-pattern.
    */
  def polyHash(text: Column): Column = PolyHash(text)

  /** PII patterns for the scrub pass. RE2-safe by construction (no
    * backreferences, no lookaround): the same pattern string runs
    * identically under Java's regex (Spark) and RE2 (DuckDB oracle) —
    * a fancier pattern that only Java accepts could never be oracled.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?\\d[\\d -]{7,}\\d"

  /** Redact emails then phone numbers with placeholder tokens. */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Number of replacements [[scrubPii]] actually performs: phones are
    * counted on the email-scrubbed text, mirroring the sequential
    * application — an all-digit email local part must not double-count as
    * a phone it never left behind.
    */
  def piiRedactionCount(text: Column): Column = {
    val emailless = regexp_replace(text, EmailRe, "<EMAIL>")
    (size(regexp_extract_all(text, lit(EmailRe), lit(0))) +
      size(regexp_extract_all(emailless, lit(PhoneRe), lit(0)))).cast("long")
  }

  /** Language-ID stopword lists: tiny, deterministic, mirrored verbatim in
    * the oracle SQL. The heuristic is an n-gram/stopword overlap score — the
    * standard cheap language-ID signal for web-scale corpus filtering.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von"),
    "fr" -> Seq("le", "la", "les", "et", "est", "de"),
    "es" -> Seq("el", "los", "las", "y", "es", "que"))

  /** Fraction of tokens that appear in `words` (0 when the doc is empty).
    *
    * Interpreted-HOF audit (the polyHash precedent): this filter() lambda
    * stays a higher-order function on purpose — the body is one
    * array_contains against ≤7 literals, the cheap-lambda case where
    * interpretation overhead is noise (text_langid references each score
    * column several times post-CollapseProject and still runs ~4× per
    * data decade at the sf10 probe). If the word lists ever grow to real
    * lexicons, move the membership test to a broadcast join or a codegen'd
    * expression BEFORE widening this — re-evaluation cost scales with
    * lambda weight, not with corpus size.
    */
  def stopwordRatio(toks: Column, words: Seq[String]): Column = {
    val arr = array(words.map(lit): _*)
    val hits = size(filter(toks, t => array_contains(arr, t)))
    when(size(toks) === 0, 0.0).otherwise(hits.cast("double") / size(toks))
  }
}
