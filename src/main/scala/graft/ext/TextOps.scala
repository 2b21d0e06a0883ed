package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline building blocks for the LLM-data operators (dedup,
  * fingerprinting, language ID, quality scoring) — all pure Column
  * expressions / narrow maps, so they run inside whole-stage codegen and
  * scale linearly with no shuffle until the explicit aggregation step.
  *
  * Hash family: the low 32 bits of md5 over a salted key. md5 is exactly
  * reproducible in any engine (the DuckDB oracle mirrors it via
  * ('0x' || substr(md5(k), 1, 8))::bigint), unlike engine-native hash().
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

  /** Distinct word n-gram shingles as an array column — pure map, no
    * shuffle (vs the window/lead formulation, which would shuffle by
    * doc). Empty array when the doc has fewer than n tokens. */
  def shingles(text: Column, n: Int = 3): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(1), size(toks) - lit(n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(toks, i + lit(k))): _*))
    array_distinct(when(size(toks) >= n, grams).otherwise(array()))
  }

  /** SQL mirror of [[shingles]] over a token-list variable `tVar` (DuckDB
    * lists are 1-indexed; range(1, m) is empty when m < 2, covering the
    * short-doc case). Use inside a CTE that binds `tVar` to sqlTokens. */
  def sqlShingleList(tVar: String, n: Int = 3): String = {
    val gram = (0 until n).map(k => s"$tVar[i+$k]").mkString(" || ' ' || ")
    s"list_distinct(list_transform(range(1, len($tVar) - ${n - 2}), i -> $gram))"
  }

  /** Exploded (doc_id, shingle) inverted-index relation. */
  def shingleIndex(docs: DataFrame, n: Int = 3): DataFrame =
    docs.select(col("doc_id"), explode(shingles(col("text"), n)).as("shingle"))

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
}
