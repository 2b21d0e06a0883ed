package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks for the LLM-data operators (dedup,
  * fingerprinting, language ID, quality scoring) — all pure Column
  * expressions / narrow maps, so they run with no shuffle until the
  * explicit aggregation step.
  *
  * Evaluation-cost rule baked into this API: higher-order functions
  * (transform/filter/aggregate) are not whole-stage-codegen'd, and any
  * outer expression they reference is RE-EVALUATED per array element. So
  * every derived array (tokens -> shingles -> hashes) must be
  * materialized as its own projection column before the next step refers
  * to it — [[withShingles]] does exactly that, and Catalyst keeps the
  * stages separate because collapsing would duplicate non-cheap
  * expressions. Skipping this (computing shingles straight over the
  * split() expression) re-runs the regex tokenizer ~3x per shingle and
  * turned out to dominate round-1 bench time.
  *
  * Hash family: md5 over a salted key, sliced into 32-bit chunks. md5 is
  * exactly reproducible in any engine (the DuckDB oracle mirrors it via
  * ('0x' || substr(md5(k), a, b))::bigint), unlike engine-native hash().
  * One md5 yields four 32-bit hashes, so an 8-hash MinHash family costs
  * two md5 evaluations per shingle, not eight.
  */
object TextOps {

  /** Whitespace tokens with empties removed (split keeps boundary empties
    * in both Spark and DuckDB; the filter makes that irrelevant). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** SQL mirror of [[tokens]]. */
  def sqlTokens(text: String): String =
    s"list_filter(regexp_split_to_array($text, '\\s+'), x -> x <> '')"

  /** 32-bit salted hash of a string as a non-negative long. */
  def saltedHash(salt: Int, c: Column): Column =
    conv(substring(md5(concat(lit(s"$salt:"), c)), 1, 8), 16, 10).cast("long")

  /** SQL mirror of [[saltedHash]]. */
  def sqlSaltedHash(salt: Int, expr: String): String =
    s"(('0x' || substr(md5('$salt:' || ($expr)), 1, 8))::BIGINT)"

  /** 60-bit salted md5 hash of a string as a long — fixed-width join /
    * shuffle keys for text grams (15 hex chars < 2^60, fits a signed
    * long identically in both engines). */
  def hash60(salt: String, c: Column): Column =
    conv(substring(md5(concat(lit(s"$salt:"), c)), 1, 15), 16, 10).cast("long")

  /** SQL mirror of [[hash60]]. */
  def sqlHash60(salt: String, expr: String): String =
    s"(('0x' || substr(md5('$salt:' || ($expr)), 1, 15))::BIGINT)"

  /** Distinct word n-gram shingles over an ALREADY-MATERIALIZED token
    * array column (`toks` must be a plain attribute, not an expression —
    * see the class doc). Empty array when the doc has < n tokens. */
  def shinglesOf(toks: Column, n: Int = 3): Column = {
    val grams = transform(
      sequence(lit(1), size(toks) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** documents projected to (doc_id, extra..., sh) with tokens and
    * shingles materialized stage-by-stage; docs with no shingles
    * (< n tokens) are dropped, matching the exploded-index semantics.
    *
    * The short-doc guard is `size(toks) >= n`, NOT `size(sh) > 0`: the
    * two are equivalent (n tokens always yield >= 1 distinct gram), but a
    * predicate over `sh` would be pushed below the projections and
    * re-inline the whole shingle pipeline into a per-row filter — the
    * dominant cost of round-1's dedup queries. */
  def withShingles(docs: DataFrame, extra: String*): DataFrame = {
    val keep = col("doc_id") +: extra.map(col)
    val n = 3
    docs.select(keep :+ tokens(col("text")).as("toks"): _*)
      .where(size(col("toks")) >= n)
      .select(keep :+ shinglesOf(col("toks"), n).as("sh"): _*)
  }

  /** SQL mirror of [[withShingles]] over a token-list variable `tVar`
    * (DuckDB lists are 1-indexed; range(1, m) is empty when m < 2,
    * covering the short-doc case). */
  def sqlShingleList(tVar: String, n: Int = 3): String = {
    val gram = (0 until n).map(k => s"$tVar[i+$k]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len($tVar) - ${n - 2}), i -> $gram))"
  }

  /** Per-language marker lexicons for the heuristic language identifier.
    * Tiny on purpose: the operator is the deliverable; swap in real
    * frequency tables for production. Shared verbatim with the oracle. */
  val lexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "les", "et", "des", "une", "est"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht"))

  /** CJK-codepoint presence (the zh signal). */
  def hasCjk(text: Column): Column = text.rlike("[\\u4e00-\\u9fff]")

  /** PII redaction for corpus cleaning: URLs first (they may embed
    * user@host, which the email pattern would otherwise split), then
    * emails, then phone-shaped digit runs (>= 9 chars of digits with
    * separators, so prose numerals survive). Pure codegen'd
    * regexp_replace chain — a narrow map at any corpus size; patterns
    * avoid lookarounds so they stay portable across regex engines. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          "https?://[^\\s]+", "<URL>"),
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
      "\\+?[0-9][0-9()\\-\\s]{7,}[0-9]", "<PHONE>")
}
