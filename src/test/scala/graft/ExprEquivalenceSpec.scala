package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import graft.engine.Tables
import graft.expressions.Exprs
import graft.ext.TextOps

/** The compiled kernels must be BIT-IDENTICAL to the Column-expression
  * formulations they replace (same oracle SQL keeps passing only if so).
  * Each test evaluates both forms over real testdata and diffs. */
class ExprEquivalenceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The original HOF formulation of the 8-hash signature (kept here as
    * the executable spec of the hash family). */
  private def columnSig(k: Int, src: String): Column =
    array_min(transform(col(src), m =>
      conv(substring(m, 1 + 8 * (k % 4), 8), 16, 10).cast("long")))

  test("MinHashSignature == tokens->shingles->md5->array_min pipeline") {
    val base = TextOps.withShingles(Tables.documents(spark, sf))
      .withColumn("m0", transform(col("sh"), x => md5(concat(lit("0:"), x))))
      .withColumn("m1", transform(col("sh"), x => md5(concat(lit("1:"), x))))
    val old = base.select(col("doc_id") +:
      (0 until 8).map(k => columnSig(k, if (k < 4) "m0" else "m1").as(s"h$k")): _*)
    val neu = Tables.documents(spark, sf)
      .withColumn("sig", Exprs.minhashSig(col("text")))
      .where(col("sig").isNotNull)
      .select(col("doc_id") +: (0 until 8).map(k => element_at(col("sig"), k + 1).as(s"h$k")): _*)
    assert(neu.count() == old.count())
    assert(neu.exceptAll(old).count() == 0 && old.exceptAll(neu).count() == 0)
  }

  test("ShingleHashes == shingles->md5->conv pipeline (as multisets)") {
    val old = TextOps.withShingles(Tables.documents(spark, sf))
      .select(col("doc_id"), explode(transform(col("sh"),
        x => conv(substring(md5(concat(lit("g:"), x)), 1, 15), 16, 10).cast("long"))).as("h"))
    val neu = Tables.documents(spark, sf)
      .withColumn("hs", Exprs.shingleHashes(col("text")))
      .where(col("hs").isNotNull)
      .select(col("doc_id"), explode(col("hs")).as("h"))
    assert(neu.exceptAll(old).count() == 0 && old.exceptAll(neu).count() == 0)
  }

  test("WinnowFingerprints == per-char md5 HOF + slice/array_min windows") {
    val k = 8; val w = 4
    // the original HOF formulation (kept as the executable spec)
    val old = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .where(length(col("text")) >= k + w - 1)
      .withColumn("hs", transform(
        sequence(lit(1), length(col("text")) - (k - 1)),
        i => conv(substring(md5(col("text").substr(i, lit(k))), 1, 8), 16, 10).cast("long")))
      .withColumn("fps", array_distinct(transform(
        sequence(lit(0), size(col("hs")) - w),
        j => array_min(slice(col("hs"), j + 1, lit(w))))))
      .select(col("doc_id"), col("fps"))
    val neu = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.expressions.Exprs.winnowFingerprints(col("text"), k, w).as("fps"))
      .where(col("fps").isNotNull)
    assert(neu.count() == old.count())
    // bit-identical arrays INCLUDING element order (array_distinct keeps
    // first occurrence; so does the kernel)
    assert(neu.exceptAll(old).count() == 0 && old.exceptAll(neu).count() == 0)
  }

  test("WinnowFingerprints counts characters, not Java chars, and nulls short docs") {
    import spark.implicits._
    val df = Seq(
      ("bmp", "abcdefghijk"),            // exactly k+w-1 = 11 chars: 1 window
      ("astral", "a😀bcdefghij"), // 11 code points, 12 Java chars
      ("short", "abcdefghij")            // 10 chars: below threshold -> null
    ).toDF("id", "text")
      .select(col("id"), graft.expressions.Exprs.winnowFingerprints(col("text"), 8, 4).as("fps"))
    val rows = df.collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(rows("bmp").isDefined && rows("astral").isDefined && rows("short").isEmpty)
    // the HOF spec on the astral row agrees (substr counts code points)
    val hof = Seq(("astral", "a😀bcdefghij")).toDF("id", "text")
      .withColumn("hs", transform(
        sequence(lit(1), length(col("text")) - 7),
        i => conv(substring(md5(col("text").substr(i, lit(8))), 1, 8), 16, 10).cast("long")))
      .withColumn("fps", array_distinct(transform(
        sequence(lit(0), size(col("hs")) - 4),
        j => array_min(slice(col("hs"), j + 1, lit(4))))))
      .select(col("fps")).collect()(0).getSeq[Long](0)
    assert(rows("astral").get.asInstanceOf[scala.collection.Seq[Long]] == hof)
  }

  test("RepetitionStats == explode-bigrams double aggregation") {
    val toks = Tables.documents(spark, sf)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 2)
    val grams = toks.select(col("doc_id"),
      explode(transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + 1)))).as("gram"))
    val old = grams.groupBy(col("doc_id"), col("gram")).agg(count(lit(1)).as("n"))
      .groupBy(col("doc_id"))
      .agg(sum(col("n")).as("total"),
        sum(when(col("n") > 1, col("n")).otherwise(0L)).as("rep"))
    val neu = Tables.documents(spark, sf)
      .withColumn("rs", graft.expressions.Exprs.repetitionStats(col("text")))
      .where(col("rs").isNotNull)
      .select(col("doc_id"), col("rs.total").as("total"), col("rs.rep").as("rep"))
    assert(neu.count() == old.count())
    assert(neu.exceptAll(old).count() == 0 && old.exceptAll(neu).count() == 0)
  }

  test("GopherRepetition == driver-side model on real docs and edge corpora") {
    import spark.implicits._
    // independent restatement of the battery in plain collections code
    def model(text: String): Option[Seq[Double]] = {
      val toks = text.split("\\s+").filter(_.nonEmpty)
      if (toks.isEmpty) return None
      def cp(x: String): Long = x.codePointCount(0, x.length).toLong
      def unit(units: Seq[String]): Seq[Double] = {
        val g = units.groupBy(identity).values.map(v => (v.size.toLong, cp(v.head))).toSeq
        val n = g.map(_._1).sum; val ch = g.map(x => x._1 * x._2).sum
        val d = g.filter(_._1 > 1)
        Seq(d.map(_._1).sum.toDouble / n, d.map(x => x._1 * x._2).sum.toDouble / ch)
      }
      val lines = unit(text.split("\n").filter(_.nonEmpty).toSeq)
      val paras = unit(text.split("\n\n").filter(_.nonEmpty).toSeq)
      val grams = (2 to 10).map { n =>
        if (toks.length < n) 0.0
        else {
          val gs = toks.sliding(n).map(_.mkString(" ")).toSeq
            .groupBy(identity).values.map(v => (v.size.toLong, v.size.toLong * cp(v.head))).toSeq
          val tot = gs.map(_._2).sum
          if (n <= 4) gs.max._2.toDouble / tot
          else gs.filter(_._1 > 1).map(_._2).sum.toDouble / tot
        }
      }
      Some(lines ++ paras ++ grams)
    }
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ++ Seq(
      (9001L, "aa bb\naa bb\naa bb\ncc"),            // duplicated lines
      (9002L, "p q\n\np q\n\nr s"),                  // duplicated paragraphs
      (9003L, Seq.fill(7)("x1 x2 x3 x4 x5").mkString(" ")), // period-5 span
      (9004L, "a😀b c😀d a😀b c😀d a😀b c😀d"),      // astral chars in duplicated grams
      (9005L, "solo"),                               // no gram evidence
      (9006L, " \n \nword\n\n\nword"))               // blank lines/paragraph edges
    val got = docs.toDF("doc_id", "text")
      .select(col("doc_id"), graft.expressions.Exprs.gopherRepetition(col("text")).as("rs"))
      .collect().map(r => r.getLong(0) ->
        Option(r.getStruct(1)).map(st => (0 until 13).map(st.getDouble))).toMap
    docs.foreach { case (id, text) =>
      assert(got(id) == model(text), s"doc $id: kernel ${got(id)} vs model ${model(text)}")
    }
  }

  test("QuantDotProduct == zip_with/aggregate floor fold") {
    def oldQDot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => floor(x * y * lit(1e12) + lit(0.5e0))),
        lit(0L), (acc, x) => acc + x).cast(DoubleType) / lit(1e12)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    // self- and cross-products (shift pairs the row with its neighbor's
    // vector, exercising negative products too)
    val shifted = vecs.select((col("vec_id") + 1).as("vec_id"), col("v").as("w"))
    val both = vecs.join(shifted, Seq("vec_id"))
      .select(col("vec_id"),
        oldQDot(col("v"), col("w")).as("d_old"),
        Exprs.quantDot(col("v"), col("w")).as("d_new"))
    // bit-identical, not approximately equal
    assert(both.where(col("d_old") =!= col("d_new")).count() == 0)
    assert(both.where(col("d_new").isNull).count() == 0)
    // null semantics: mismatched lengths and null elements poison both
    import spark.implicits._
    val edge = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0))
    ).toDF("a", "b")
    val e2 = edge.select(oldQDot(col("a"), col("b")).as("o"),
      Exprs.quantDot(col("a"), col("b")).as("n")).collect()
    assert(e2.forall(r => r.isNullAt(0) && r.isNullAt(1)),
      "mismatched lengths / null elements must poison both formulations")
  }

  test("DecimalDotProduct == zip_with/aggregate decimal fold") {
    val D12 = DecimalType(27, 12)
    def oldDot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x * y).cast(D12)), lit(0).cast(D12),
        (acc, v) => (acc + v).cast(D12)).cast(DoubleType)
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val both = vecs.select(col("vec_id"),
      oldDot(col("v"), col("v")).as("d_old"),
      Exprs.decimalDot(col("v"), col("v")).as("d_new"))
    // bit-identical, not approximately equal
    assert(both.where(col("d_old") =!= col("d_new")).count() == 0)
    assert(both.where(col("d_new").isNull).count() == 0)
  }

  test("DecimalDot fast path == pure BigDecimal fold on adversarial values") {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    def reference(vs: Array[Double]): Double =
      vs.map(p => JBD.valueOf(p).setScale(12, RoundingMode.HALF_UP))
        .foldLeft(JBD.ZERO)(_ add _).doubleValue()
    def kernel(vs: Array[Double]): Double =
      graft.expressions.DecimalDot.dot(
        new GenericArrayData(vs.map(v => v: Any)),
        new GenericArrayData(vs.map(_ => 1.0: Any))).doubleValue()
    val rnd = new scala.util.Random(7)
    // near the HALF_UP boundary at scale 12 (the fast path must bail
    // to BigDecimal here), plus magnitude sweeps and exact halves
    val adversarial = (0 until 2000).flatMap { _ =>
      val k = rnd.nextLong() % 1000000000000L
      val half = (k + 0.5) / 1e12
      Seq(half, Math.nextUp(half), Math.nextDown(half), -half)
    } ++ (-330 to 300).flatMap { e =>
      val v = rnd.nextDouble() * math.pow(10, e / 10.0)
      Seq(v, -v)
    } ++ Seq(0.0, -0.0, Double.MinPositiveValue, 1e15, -1e15, 4.9e15)
    adversarial.foreach { v =>
      assert(kernel(Array(v)) == reference(Array(v)), s"mismatch at $v")
    }
    // accumulation incl. the long-spill path (|unscaled| > Long.Max/2)
    val big = Array.fill(8)(4.0e6 + rnd.nextDouble())
    assert(kernel(big) == reference(big))
    val mixed = Array.fill(64)(rnd.nextGaussian())
    assert(kernel(mixed) == reference(mixed))
  }

  test("PrefixPairExpand == sorted HOF triangle enumeration + ratio prune") {
    val base = Tables.documents(spark, sf)
      .withColumn("hs0", Exprs.shingleHashes(col("text")))
      .where(col("hs0").isNotNull)
      .select(col("doc_id"), array_sort(col("hs0")).as("hs"))
      .withColumn("n", size(col("hs")))
      .withColumn("plen", col("n") - expr("(4*n + 4) div 5") + lit(1))
    val posting = base
      .select(col("doc_id"), col("n"), explode(slice(col("hs"), lit(1), col("plen"))).as("h"))
      .groupBy(col("h"))
      .agg(collect_list(struct(col("doc_id"), col("n"))).as("ds"))
      .where(size(col("ds")) > 1)
    // the HOF formulation the kernel replaced (needs a sorted list)
    val old = posting
      .withColumn("ds", array_sort(col("ds")))
      .withColumn("ps", flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + 2, size(col("ds"))), y => struct(
          x.getField("doc_id").as("doc_a"), x.getField("n").as("na"),
          y.getField("doc_id").as("doc_b"), y.getField("n").as("nb"))))))
      .select(explode(col("ps")).as("p"))
      .select(col("p.doc_a"), col("p.na"), col("p.doc_b"), col("p.nb"))
      .where(col("na") * 5 >= col("nb") * 4 && col("nb") * 5 >= col("na") * 4)
    val neu = posting
      .select(explode(Exprs.prefixPairs(col("ds"))).as("p"))
      .select(col("p.doc_a"), col("p.na"), col("p.doc_b"), col("p.nb"))
    assert(neu.count() == old.count())
    assert(neu.exceptAll(old).count() == 0 && old.exceptAll(neu).count() == 0)
  }

  test("chunked CrossPair expansion covers exactly the full-list triangle") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(11)
    def row(id: Long, n: Int): InternalRow = new GenericInternalRow(Array[Any](id, n))
    def arr(rows: Seq[InternalRow]) = new GenericArrayData(rows.toArray)
    def pairSet(g: GenericArrayData): Set[(Long, Int, Long, Int)] =
      (0 until g.numElements()).map { k =>
        val r = g.getStruct(k, 4)
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3))
      }.toSet
    // 1500-entry posting list with clustered sizes so the ratio prune
    // both keeps and drops pairs
    val full = (0 until 1500).map(i => row(rnd.nextInt(100000).toLong, 40 + rnd.nextInt(20)))
      .distinctBy(_.getLong(0))
    val direct = pairSet(graft.expressions.PrefixPair.expand(arr(full)))
    val chunks = full.grouped(512).map(arr).toSeq
    val chunked = (for {
      i <- chunks.indices; j <- i until chunks.size
    } yield pairSet(graft.expressions.CrossPair.expand(chunks(i), chunks(j))))
      .reduce(_ ++ _)
    assert(chunked == direct)
  }

  test("SQL function registration via GraftExtensions") {
    graft.expressions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT size(minhash_signature('a b c d')) AS n, " +
        "size(shingle_hashes('a b c d')) AS m, " +
        "decimal_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d, " +
        "size(winnow_fingerprints('abcdefghijklmno')) AS w")
      .collect()(0)
    assert(r.getInt(0) == 8 && r.getInt(1) == 2 && r.getDouble(2) == 11.0)
    assert(r.getInt(3) >= 1)
  }
}
