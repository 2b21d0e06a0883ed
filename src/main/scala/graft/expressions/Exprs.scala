package graft.expressions

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-facade over the custom Catalyst expressions. */
object Exprs {
  private def c(e: Expression): Column = ColumnBridge.column(e)
  private def e(col: Column): Expression = ColumnBridge.expression(col)

  /** 8-hash MinHash signature (array<long>, null if < 3 tokens). */
  def minhashSig(text: Column): Column = c(MinHashSignature(e(text)))

  /** Distinct 3-gram shingle hashes (array<long>, null if < 3 tokens). */
  def shingleHashes(text: Column): Column = c(ShingleHashes(e(text)))

  /** Distinct winnowing fingerprints over k-char grams with w-wide
    * sliding-min windows (array<long>, null if shorter than k+w-1). */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    c(WinnowFingerprints(e(text), k, w))

  /** struct(total, rep) bigram repetition stats (null if < 2 tokens). */
  def repetitionStats(text: Column): Column = c(RepetitionStats(e(text)))

  /** struct of the 13 Gopher repetition fractions (see [[TextHash.gopherRepetition]]). */
  def gopherRepetition(text: Column): Column = c(GopherRepetition(e(text)))

  /** Kept token positions after k-token span-cover excision (array<int>,
    * 1-based; `starts` must be coalesced non-null by the caller). */
  def spanCoverKept(nTok: Column, starts: Column, k: Int): Column =
    c(SpanCoverKept(e(nTok), e(starts), k))

  /** Exact DECIMAL(27,12)-folded dot product of two array<double>. */
  def decimalDot(a: Column, b: Column): Column = c(DecimalDotProduct(e(a), e(b)))

  /** Tie-free 1e-12-quantized dot product of two array<double> (q75's
    * IEEE floor construction — see [[QuantDotProduct]]). */
  def quantDot(a: Column, b: Column): Column = c(QuantDotProduct(e(a), e(b)))

  /** Ratio-pruned oriented candidate pairs from a posting list of
    * (doc_id, n) structs — the PPJoin expansion step. */
  def prefixPairs(ds: Column): Column = c(PrefixPairExpand(e(ds)))

  /** Chunk-pair (binary) form of [[prefixPairs]] for hot posting lists. */
  def crossPairs(a: Column, b: Column): Column = c(CrossPairExpand(e(a), e(b)))
}

/** SparkSessionExtensions installer: exposes the custom expressions as
  * SQL functions (`SELECT minhash_signature(text) ...`) for sessions
  * built with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.expressions.GraftExtensions`; use
  * [[GraftExtensions.register]] for an already-running session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[MinHashSignature].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(text) - 8-hash MinHash signature as array<bigint>"),
      (args: Seq[Expression]) => MinHashSignature(args.head)),
    (FunctionIdentifier("shingle_hashes"),
      info("shingle_hashes", "shingle_hashes(text) - distinct word 3-gram hashes as array<bigint>"),
      (args: Seq[Expression]) => ShingleHashes(args.head)),
    (FunctionIdentifier("decimal_dot"),
      info("decimal_dot", "decimal_dot(a, b) - exact decimal-folded dot product of two double arrays"),
      (args: Seq[Expression]) => DecimalDotProduct(args.head, args(1))),
    (FunctionIdentifier("quant_dot"),
      info("quant_dot", "quant_dot(a, b) - tie-free 1e-12-floor-quantized dot product of two double arrays"),
      (args: Seq[Expression]) => QuantDotProduct(args.head, args(1))),
    (FunctionIdentifier("winnow_fingerprints"),
      info("winnow_fingerprints", "winnow_fingerprints(text) - distinct 8-char-gram winnowing fingerprints (w=4) as array<bigint>"),
      (args: Seq[Expression]) => WinnowFingerprints(args.head, 8, 4)),
    (FunctionIdentifier("gopher_repetition"),
      info("gopher_repetition", "gopher_repetition(text) - struct of the 13 Gopher repetition fractions (Rae et al. Table A1)"),
      (args: Seq[Expression]) => GopherRepetition(args.head)))

  /** Register the functions on a live session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, i, b) =>
      ColumnBridge.registerFunction(spark, id.funcName, i, b)
    }
}
