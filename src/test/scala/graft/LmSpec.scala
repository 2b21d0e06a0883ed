package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** r21 window-equivalence pins for the text-LM family rewrite (the r20
  * verdict's lead item): q91/q97/q102's vocabulary-frame windows were
  * replaced by partial-aggregable forms — q91's fused sum+TopKStrAgg
  * heap, q97's groupBy total + broadcast join-back, q102's per-source
  * heap with a broadcast winner join. These tests re-run the RETIRED
  * window formulations (inlined here as controls, exactly as SkewSpec
  * does for the ANN family) against the shipped operators on tie-heavy
  * corpora and assert row equality — the same contract TopKAggSpec pins
  * for the long-keyed heap.
  */
class LmSpec extends SparkSpec {

  import graft.ext.TextOps.tokens

  /** Deterministic tie-heavy corpus: 40-token vocabulary over ~6k
    * bigrams forces repeated (n_pair, score) ties so the string
    * tie-break is actually exercised. */
  private lazy val corpus: DataFrame = {
    import spark.implicits._
    (1L to 200L).map { i =>
      val rnd = new scala.util.Random(i)
      val toks = Seq.fill(30)("t" + (math.abs(rnd.nextInt(1000)) % 40))
      (i, toks.mkString(" "), "s" + (i % 5))
    }.toDF("doc_id", "text", "source")
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq.sorted

  test("bigramLmTop: fused sum+heap aggregation row-equals the retired window formulation") {
    val counts = corpus
      .select(tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS w1, tk[i] AS w2))"))
        .as("b"))
      .groupBy(col("b.w1").as("context"), col("b.w2").as("next_tok"))
      .agg(count(lit(1)).as("n_pair"))
    // CONTROL: the pre-r21 shape (windows over the context partition)
    val byCtx = Window.partitionBy(col("context"))
    val control = counts
      .withColumn("n_ctx", sum(col("n_pair")).over(byCtx))
      .withColumn("rk", row_number().over(
        byCtx.orderBy(col("n_pair").desc, col("next_tok"))))
      .where(col("n_ctx") >= 50 && col("rk") <= 3)
      .select(col("context"), col("next_tok"), col("n_pair"), col("n_ctx"),
        (col("n_pair").cast("double") / col("n_ctx")).as("p"))
    val engine = graft.queries.TextQueries.bigramLmTop(corpus, minCtx = 50, topK = 3)
    assert(rows(engine) == rows(control),
      "heap cut must reproduce the window formulation row-for-row")
    assert(engine.count() > 10, "corpus must actually exercise the cut")
    spark.catalog.clearCache()
  }

  test("tfidfTopTerms: per-source heap + winner join row-equals the retired rank window") {
    val toks = corpus.select(col("source"), col("doc_id"),
      explode(tokens(col("text"))).as("term"))
    val tf = toks.groupBy(col("source"), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = toks.select(col("doc_id"), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = corpus.select(count(lit(1)).as("n_docs"))
    // CONTROL: the pre-r21 shape (row_number over the source partition)
    val control = tf.join(dfq, Seq("term")).crossJoin(broadcast(n))
      .withColumn("qidf", (length(bin(expr("n_docs div df"))) - 1).cast("long"))
      .withColumn("score", col("tf") * col("qidf"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("score").desc, col("term").asc)))
      .where(col("rk") <= 5)
      .select(col("source"), col("term"), col("tf"), col("df"),
        col("qidf"), col("score"), col("rk"))
    val engine = graft.queries.TextQueries.tfidfTopTerms(corpus, 5)
    assert(rows(engine) == rows(control),
      "heap cut must reproduce the rank window row-for-row")
    assert(engine.count() == 25, "5 sources x k=5")
    spark.catalog.clearCache()
  }

  test("lmSurprisal: groupBy total + broadcast join-back row-equals the retired n_ctx window") {
    val bg = corpus.select(col("doc_id"), tokens(col("text")).as("tk"))
      .where(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(tk) - 1), i -> struct(tk[i-1] AS w1, tk[i] AS w2))")).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // CONTROL: the pre-r21 shape (window sum over the w1 partition)
    val lmControl = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_pair"))
      .withColumn("n_ctx", sum(col("n_pair")).over(Window.partitionBy(col("w1"))))
    val control = bg.join(lmControl, Seq("w1", "w2"))
      .withColumn("s", (length(bin(expr("n_ctx div n_pair"))) - 1).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("s")).as("sum_surprisal"))
      .withColumn("mean_surprisal",
        col("sum_surprisal").cast("double") / col("n_bigrams"))
      .orderBy(col("doc_id"))
    val engine = graft.queries.TextQueries.lmSurprisal(corpus)
    assert(rows(engine) == rows(control),
      "join-back n_ctx must reproduce the window sum row-for-row")
    spark.catalog.clearCache()
  }

  test("codePointLess: matches Spark's string sort order, including supplementary-plane chars") {
    import spark.implicits._
    // "" (private-use BMP) vs "😀" (U+1F600, supplementary):
    // java.lang.String's UTF-16 code-unit order puts the surrogate pair
    // FIRST; Spark's UTF8String binary order (= code-point order) puts
    // the BMP char first. The heap's tie-break must follow Spark.
    val toks = Seq("zz", "\uE000", "\uD83D\uDE00", "a", "\uFFFD", "t10", "t2", "")
    val sparkOrder = toks.toDF("t").orderBy(col("t")).collect().map(_.getString(0)).toSeq
    val heapOrder = toks.sortWith(graft.ext.TopKAgg.codePointLess)
    assert(heapOrder == sparkOrder,
      s"comparator order $heapOrder must equal Spark sort order $sparkOrder")
    // and the two orders genuinely differ from UTF-16 natural order on
    // this input — i.e. the custom comparator is load-bearing
    assert(toks.sorted != sparkOrder,
      "corpus must contain a supplementary/BMP inversion or the pin is vacuous")
  }

  test("TopKStrAgg: ties cut lexicographically; k > group size keeps all; buffer skip path") {
    import spark.implicits._
    val df = Seq(
      ("g1", 5L, "b"), ("g1", 5L, "a"), ("g1", 5L, "c"), ("g1", 1L, "z"),
      ("g2", 2L, "only")).toDF("g", "n", "tok")
    val topk = udaf(new graft.ext.TopKStrAgg(2),
      org.apache.spark.sql.Encoders.product[graft.ext.TopKAgg.SEntry])
    val out = df.groupBy(col("g"))
      .agg(topk(col("n").cast("double"), col("tok")).as("tk"))
      .select(col("g"), posexplode(col("tk.items")).as(Seq("p", "e")))
      .select(col("g"), col("p"), col("e.payload"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq.sorted
    assert(out == Seq(("g1", 0, "a"), ("g1", 1, "b"), ("g2", 0, "only")),
      s"tie-break and k-cut: $out")
  }
}
