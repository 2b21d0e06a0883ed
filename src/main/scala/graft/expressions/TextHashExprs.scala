package graft.expressions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for the text-dedup hot loop.
  *
  * The Column-expression formulation (tokens -> shingle strings -> md5
  * arrays -> array_min slices) is semantically right but runs through
  * interpreted higher-order functions: per-element lambda dispatch plus
  * an intermediate string array per stage. These expressions compute the
  * same values in one pass of straight JVM code — the (b) tier of the
  * custom-op ladder (native Expression beats UDF beats mapPartitions).
  *
  * Hash family parity: chunk k of md5(salt:shingle) read as hex chars
  * [8k+1, 8k+8] equals bytes [4k, 4k+4) big-endian unsigned — the DuckDB
  * oracle mirror (('0x' || substr(md5(...), 1+8k, 8))::BIGINT) is
  * unchanged. Equivalence against the Column pipeline is asserted in
  * ExprEquivalenceSpec.
  */
object TextHash {

  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  private def md5(s: String): Array[Byte] = {
    val d = digest.get()
    d.reset()
    d.digest(s.getBytes(StandardCharsets.UTF_8))
  }

  /** Unsigned big-endian int from bytes [off, off+4) — == parsing md5 hex
    * chars [8*(off/4)+1 .. +8] base 16. */
  private def chunk32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  /** First 60 bits big-endian — == parsing the first 15 md5 hex chars. */
  private def chunk60(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** JVM form of [[graft.ext.TextOps.hash60]]: first 15 md5 hex chars
    * of "salt:s" as a long — bit-identical to the Column and DuckDB
    * mirrors (the HLL register aggregator hashes with it so the oracle
    * can restate every register). */
  private[graft] def hash60(salt: String, s: String): Long = chunk60(md5(salt + ":" + s))

  /** JVM form of [[graft.ext.TextOps.saltedHash]] (int salt): first 8
    * md5 hex chars of "salt:s" as a long — the CMS/Bloom row hash.
    * Goes through the ThreadLocal digest above: the sketch aggregators
    * call this once per salt per INPUT ROW, where a
    * MessageDigest.getInstance per call would be pure provider-lookup
    * and allocation overhead on the path the sketches exist to make
    * cheap. */
  private[graft] def hash32(salt: Int, s: String): Long = chunk32(md5(salt + ":" + s), 0)

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Whitespace tokens, empties removed — same result as
    * filter(split(text, "\\s+"), _ != ""). Precompiled pattern:
    * String.split would recompile the regex on every document. */
  def tokens(text: String): Array[String] =
    ws.split(text).filter(_.nonEmpty)

  /** 8-hash MinHash signature over word 3-gram shingles; null when the
    * doc has < 3 tokens (the short-doc filter). Duplicate shingles can't
    * change a min, so no distinct pass is needed. */
  def minhash(text: UTF8String): GenericArrayData = {
    val toks = tokens(text.toString)
    if (toks.length < 3) return null
    val mins = Array.fill(8)(Long.MaxValue)
    var i = 0
    while (i + 2 < toks.length) {
      val sh = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      val b0 = md5("0:" + sh)
      val b1 = md5("1:" + sh)
      var k = 0
      while (k < 4) {
        val v0 = chunk32(b0, 4 * k); if (v0 < mins(k)) mins(k) = v0
        val v1 = chunk32(b1, 4 * k); if (v1 < mins(k + 4)) mins(k + 4) = v1
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 60-bit hashes of the DISTINCT word 3-gram shingles (salt "g:");
    * null when the doc has < 3 tokens. Distinctness matters here — the
    * array feeds intersection counts. */
  def shingleHashes(text: UTF8String): GenericArrayData = {
    val toks = tokens(text.toString)
    if (toks.length < 3) return null
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + 2 < toks.length) {
      seen.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = chunk60(md5("g:" + it.next())); j += 1 }
    new GenericArrayData(out)
  }

  /** Per-doc bigram repetition stats in one pass: total = #bigram
    * occurrences (n_tok - 1), rep = occurrences of bigrams seen more
    * than once in the doc. Null when the doc has < 2 tokens. Same
    * values as exploding bigrams and double-aggregating, without the
    * corpus-sized (doc, gram) shuffle — per-doc stats never need to
    * leave the row. */
  def repetition(text: UTF8String): InternalRow = {
    val toks = tokens(text.toString)
    if (toks.length < 2) return null
    val counts = new java.util.HashMap[String, Int]()
    var i = 0
    while (i + 1 < toks.length) {
      counts.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
      i += 1
    }
    var rep = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > 1) rep += c }
    new GenericInternalRow(Array[Any](toks.length - 1L, rep))
  }

  /** All thirteen Gopher repetition fractions (Rae et al.,
    * arXiv:2112.11446 Table A1) of ONE document in one JVM pass — the
    * [[repetition]] argument widened to the full battery: per-doc
    * stats never need to leave the row, so the whole operator is a
    * pure narrow map at any corpus scale instead of nine corpus-sized
    * (doc, gram) shuffles. Field order matches
    * CurationQueries.repetitionSignals' output columns:
    * dup_line_frac, dup_line_char_frac, dup_para_frac,
    * dup_para_char_frac, top2..4gram_frac, dup5..10gram_frac.
    *
    * Null when the doc has no tokens; an n with fewer than n tokens
    * scores 0 (no evidence). Lengths count Unicode CODE POINTS (SQL
    * length semantics, the winnow() precedent — Java String.length
    * over-counts astral characters). Duplicate-unit rule: ALL
    * occurrences of a unit occurring more than once count. Top-gram
    * tie rule: max by (count, coverage) — the tied value is the same
    * either way, so no string comparison is needed. Per-doc state is
    * one hash map per unit family, bounded by the doc's own size and
    * freed per row (a 1M-token doc holds ~9M entries transiently —
    * the documented per-task bound). */
  def gopherRepetition(text: UTF8String): InternalRow = {
    val s = text.toString
    val toks = tokens(s)
    if (toks.length == 0) return null
    def cp(x: String): Long = x.codePointCount(0, x.length).toLong
    def unitFracs(units: Array[String]): (Double, Double) = {
      val counts = new java.util.HashMap[String, Int]()
      var i = 0
      while (i < units.length) { counts.merge(units(i), 1, (a, b) => a + b); i += 1 }
      var n = 0L; var dup = 0L; var chars = 0L; var dupChars = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next(); val c = e.getValue.toLong; val len = cp(e.getKey)
        n += c; chars += c * len
        if (c > 1) { dup += c; dupChars += c * len }
      }
      (dup.toDouble / n.toDouble, dupChars.toDouble / chars.toDouble)
    }
    val out = new Array[Any](13)
    val (dlf, dlcf) = unitFracs(s.split("\n").filter(_.nonEmpty))
    val (dpf, dpcf) = unitFracs(s.split("\n\n").filter(_.nonEmpty))
    out(0) = dlf; out(1) = dlcf; out(2) = dpf; out(3) = dpcf
    val sb = new java.lang.StringBuilder()
    var n = 2
    while (n <= 10) {
      if (toks.length < n) out(n + 2) = 0.0
      else {
        val counts = new java.util.HashMap[String, Int]()
        var i = 0
        while (i + n <= toks.length) {
          sb.setLength(0)
          var k = 0
          while (k < n) { if (k > 0) sb.append(' '); sb.append(toks(i + k)); k += 1 }
          counts.merge(sb.toString, 1, (a, b) => a + b)
          i += 1
        }
        var tot = 0L; var dup = 0L; var bestC = 0L; var bestCov = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next(); val c = e.getValue.toLong; val cov = c * cp(e.getKey)
          tot += cov
          if (c > 1) dup += cov
          if (c > bestC || (c == bestC && cov > bestCov)) { bestC = c; bestCov = cov }
        }
        out(n + 2) =
          if (n <= 4) bestCov.toDouble / tot.toDouble else dup.toDouble / tot.toDouble
      }
      n += 1
    }
    new GenericInternalRow(out)
  }

  /** Kept (1-based) token positions after excising every k-token span
    * that starts at a matched gram position: position j is removed when
    * any matched start s satisfies s <= j <= s + k - 1 (the span-cover
    * rule of decontaminateSpans / dedupRepeatedSpans). One forward pass
    * over positions with a sorted-starts pointer — O(n_tok + m log m)
    * per doc. The higher-order-function formulation
    * (filter(sequence(1, n), j -> !exists(starts, ...))) is
    * O(n_tok * m): a heavily contaminated production doc (thousands of
    * tokens, most grams matched) turns that quadratic, which is why the
    * cover runs as a compiled kernel. */
  def spanKept(nTok: Int, starts: ArrayData, k: Int): GenericArrayData = {
    val m = starts.numElements()
    val ss = new Array[Int](m)
    var x = 0
    while (x < m) { ss(x) = starts.getInt(x); x += 1 }
    java.util.Arrays.sort(ss)
    val out = new Array[Int](nTok)
    var nOut = 0
    var si = 0
    var coverUntil = 0
    var j = 1
    while (j <= nTok) {
      // every start at or before j extends the cover to s + k - 1; a
      // start after j cannot cover j, so the pointer never backtracks
      while (si < m && ss(si) <= j) {
        val e = ss(si) + k - 1
        if (e > coverUntil) coverUntil = e
        si += 1
      }
      if (j > coverUntil) { out(nOut) = j; nOut += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, nOut))
  }

  /** Winnowing fingerprints: hash every k-char gram (first 32 md5 bits,
    * == conv(substring(md5(gram),1,8),16,10)), take the min of each
    * w-wide sliding window of those hashes with a monotonic deque (O(n),
    * vs the O(n*w) slice+array_min HOF), dedup preserving first
    * occurrence (array_distinct order). Null when the doc is shorter
    * than k+w-1 CHARACTERS — substrings count code points to match SQL
    * substr semantics, not Java char units. */
  def winnow(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val s = text.toString
    // code-point start offsets: off(p) = char index of the p-th character
    val n = s.codePointCount(0, s.length)
    if (n < k + w - 1) return null
    val off = new Array[Int](n + 1)
    var ci = 0
    var p = 0
    while (ci < s.length) { off(p) = ci; ci += Character.charCount(s.codePointAt(ci)); p += 1 }
    off(n) = s.length
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = chunk32(md5(s.substring(off(i), off(i + k))), 0); i += 1 }
    // monotonic deque of indices: values increasing head->tail, head is
    // the current window min
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0
    var j = 0
    while (j < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
      dq(tail) = j; tail += 1
      if (dq(head) <= j - w) head += 1
      if (j >= w - 1) seen.add(hs(dq(head)))
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var q = 0
    while (it.hasNext) { out(q) = it.next(); q += 1 }
    new GenericArrayData(out)
  }
}

/** array<long>(8) MinHash signature of a text column (null if < 3
  * tokens). Codegen emits a static call, so the projection stays inside
  * whole-stage codegen. */
case class MinHashSignature(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null for docs with < 3 tokens
  override protected def nullSafeEval(input: Any): Any =
    TextHash.minhash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.TextHash.minhash($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** struct(total, rep) bigram repetition stats (null if < 2 tokens). */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("total", LongType, nullable = false),
    StructField("rep", LongType, nullable = false)))
  override def nullable: Boolean = true // null for docs with < 2 tokens
  override protected def nullSafeEval(input: Any): Any =
    TextHash.repetition(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.TextHash.repetition($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** array<long> of distinct winnowing fingerprints (null if the text has
  * fewer than k+w-1 characters). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null for docs shorter than k+w-1
  override protected def nullSafeEval(input: Any): Any =
    TextHash.winnow(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.TextHash.winnow($c, $k, $w);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** struct of the thirteen Gopher repetition fractions (null if the doc
  * has no tokens) — see [[TextHash.gopherRepetition]]. */
case class GopherRepetition(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(
    (Seq("dup_line_frac", "dup_line_char_frac", "dup_para_frac", "dup_para_char_frac")
      ++ (2 to 4).map(n => s"top${n}gram_frac")
      ++ (5 to 10).map(n => s"dup${n}gram_frac"))
      .map(StructField(_, DoubleType, nullable = false)))
  override def nullable: Boolean = true // null for docs with no tokens
  override protected def nullSafeEval(input: Any): Any =
    TextHash.gopherRepetition(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.TextHash.gopherRepetition($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): GopherRepetition =
    copy(child = newChild)
}

/** array<int> of kept 1-based token positions after k-token span-cover
  * excision (see [[TextHash.spanKept]]). `starts` must be non-null —
  * callers coalesce a missing match list to an empty array. */
case class SpanCoverKept(nTok: Expression, starts: Expression, k: Int)
    extends BinaryExpression {
  override def left: Expression = nTok
  override def right: Expression = starts
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def nullSafeEval(n: Any, st: Any): Any =
    TextHash.spanKept(n.asInstanceOf[Int], st.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (n, st) =>
      s"${ev.value} = graft.expressions.TextHash.spanKept($n, $st, $k);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpanCoverKept =
    copy(nTok = newLeft, starts = newRight)
}

/** array<long> of distinct 3-gram shingle hashes (null if < 3 tokens). */
case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // null for docs with < 3 tokens
  override protected def nullSafeEval(input: Any): Any =
    TextHash.shingleHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.expressions.TextHash.shingleHashes($c);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}
