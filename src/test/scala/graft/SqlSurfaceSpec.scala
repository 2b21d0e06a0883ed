package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.engine.Tables
import graft.expressions.{Exprs, GraftExtensions}

/** The SQL entry surface (SURVEY.md §2.4 / §7.3): a downstream user's
  * first act is `SELECT ... FROM documents` — so the engine must be
  * drivable entirely through `spark.sql` strings over registered views,
  * with the compiled kernels available as SQL functions. Each test runs
  * a query BOTH ways and pins result equality, so the SQL surface can
  * never drift from the oracle-checked DataFrame forms. */
class SqlSurfaceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Views + kernel SQL functions registered once for the suite. */
  private lazy val ready: Unit = {
    GraftExtensions.register(spark)
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "documents", "embeddings")
      .foreach(t => Tables.read(spark, sf, t).createOrReplaceTempView(t))
    // events goes through Tables.events (nanos conversion — a raw read
    // of the parquet would throw)
    Tables.events(spark, sf).createOrReplaceTempView("events")
  }

  private def assertSame(viaSql: DataFrame, viaDf: DataFrame): Unit = {
    assert(viaSql.schema.map(f => (f.name, f.dataType)) ==
      viaDf.schema.map(f => (f.name, f.dataType)),
      s"schema drift: SQL ${viaSql.schema.treeString} vs DF ${viaDf.schema.treeString}")
    assert(viaSql.exceptAll(viaDf).count() == 0 && viaDf.exceptAll(viaSql).count() == 0,
      "SQL and DataFrame forms must return identical rows")
  }

  test("aggregation (q04) runs as a plain SQL string over the events view") {
    ready
    val viaSql = spark.sql(
      """SELECT event_type, COUNT(*) AS n FROM events
        |GROUP BY event_type ORDER BY n DESC, event_type""".stripMargin)
    assertSame(viaSql, SparkEntry.queries("q04_event_type_counts")(spark, sf))
  }

  test("join + decimal-parity aggregate (q21) runs as SQL") {
    ready
    val viaSql = spark.sql(
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_odate, o_orderpriority,
        |       CAST(SUM(CAST((l_extendedprice * (1e0 - l_discount)) AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |  AND l_shipdate  > TIMESTAMP '1998-01-01'
        |GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
    assertSame(viaSql, SparkEntry.queries("q21_top_revenue_orders")(spark, sf))
  }

  test("tumbling window aggregate (q08) runs as SQL with window()") {
    ready
    val viaSql = spark.sql(
      """SELECT unix_micros(window.start) AS hour_start_us, event_type,
        |       CAST(SUM(CAST(value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(value) AS avg_value,
        |       COUNT(*) AS n
        |FROM events
        |GROUP BY window(ts, '1 hour'), event_type
        |ORDER BY hour_start_us, event_type""".stripMargin)
    assertSame(viaSql, SparkEntry.queries("q08_tumbling_hour")(spark, sf))
  }

  test("compiled kernels are callable as SQL functions: minhash_signature, shingle_hashes") {
    ready
    val viaSql = spark.sql(
      "SELECT doc_id, minhash_signature(text) AS sig, shingle_hashes(text) AS sh FROM documents")
    val viaDf = Tables.documents(spark, sf).select(col("doc_id"),
      Exprs.minhashSig(col("text")).as("sig"),
      Exprs.shingleHashes(col("text")).as("sh"))
    assertSame(viaSql, viaDf)
    // and the SQL form composes into the q41 signature shape
    val sigSql = spark.sql(
      s"""SELECT doc_id, ${(0 until 8).map(k => s"element_at(minhash_signature(text), ${k + 1}) AS h$k").mkString(", ")}
         |FROM documents
         |WHERE size(filter(split(text, '\\\\s+'), t -> t != '')) >= 3
         |ORDER BY doc_id""".stripMargin)
    assertSame(sigSql, SparkEntry.queries("q41_minhash_signatures")(spark, sf))
    // the repetition battery's kernel too: SQL struct access == facade
    val repSql = spark.sql(
      "SELECT doc_id, gopher_repetition(text).dup_line_frac AS dlf, " +
        "gopher_repetition(text).dup5gram_frac AS d5 FROM documents")
    val repDf = Tables.documents(spark, sf).select(col("doc_id"),
      Exprs.gopherRepetition(col("text")).getField("dup_line_frac").as("dlf"),
      Exprs.gopherRepetition(col("text")).getField("dup5gram_frac").as("d5"))
    assertSame(repSql, repDf)
  }

  test("removeRepeatedLines runs as a plain SQL string over a registered view") {
    ready
    // dirty view: a universal boilerplate line over every doc (df = n)
    spark.sql("""SELECT doc_id, concat_ws('\n', 'shared boilerplate line', text) AS text
                |FROM documents""".stripMargin).createOrReplaceTempView("dirty_docs")
    val viaSql = spark.sql(
      """WITH l AS (
        |  SELECT doc_id, posexplode(split(text, '\\n')) AS (pos, line) FROM dirty_docs),
        |hot AS (
        |  SELECT md5(line) AS hh FROM l GROUP BY md5(line)
        |  HAVING COUNT(DISTINCT doc_id) >= 3),
        |f AS (SELECT l.*, hot.hh IS NOT NULL AS is_hot
        |      FROM l LEFT JOIN hot ON md5(l.line) = hot.hh)
        |SELECT doc_id,
        |       array_join(transform(array_sort(
        |         collect_list(CASE WHEN NOT is_hot THEN struct(pos, line) END)),
        |         x -> x.line), '\n') AS clean,
        |       count(CASE WHEN NOT is_hot THEN 1 END) AS kept_lines,
        |       count(CASE WHEN is_hot THEN 1 END) AS removed_lines
        |FROM f GROUP BY doc_id""".stripMargin)
    val viaDf = graft.queries.CurationQueries.removeRepeatedLines(
      spark.table("dirty_docs"), minDf = 3)
    assertSame(viaSql, viaDf)
    // the boilerplate really dropped (non-vacuousness)
    assert(viaSql.where(col("removed_lines") === 0).count() == 0)
  }

  test("urlFilter runs as a plain SQL string over a registered view") {
    ready
    spark.sql(
      """SELECT doc_id,
        |       concat(text, ' see https://a.bad.example/x and https://ok.example.org/y') AS text
        |FROM documents""".stripMargin).createOrReplaceTempView("url_docs")
    val viaSql = spark.sql(
      """WITH u AS (
        |  SELECT doc_id,
        |         transform(regexp_extract_all(text, '(?i)https?://([A-Za-z0-9.-]+)', 1),
        |                   h -> lower(regexp_replace(h, '\\.+$', ''))) AS urls
        |  FROM url_docs)
        |SELECT doc_id, urls, CAST(size(urls) AS BIGINT) AS n_urls,
        |       filter(urls, h -> h = 'bad.example' OR endswith(h, '.bad.example')) AS blocked_hosts,
        |       CAST(size(filter(urls, h -> h = 'bad.example' OR endswith(h, '.bad.example'))) AS BIGINT) AS n_blocked
        |FROM u""".stripMargin)
    val viaDf = graft.queries.CurationQueries.urlFilter(
      spark.table("url_docs"), Seq("bad.example"))
      .select(col("doc_id"), col("urls"), col("n_urls"), col("blocked_hosts"), col("n_blocked"))
    assertSame(viaSql, viaDf)
    // both branches of the URL extraction really fired
    assert(viaSql.where(col("n_urls") =!= 2 || col("n_blocked") =!= 1).count() == 0)
  }

  test("budgetSelect's result is expressible as a per-source SQL window (and matches)") {
    ready
    // the SQL states the SEMANTICS (per-source quality-ranked cumsum,
    // keep while end_tok <= budget) as a plain window — the library
    // function computes the same result via the sharded prefix-sum
    // that avoids per-source single-reducer sorts at corpus scale
    val stop = graft.ext.TextOps.lexicons.head._2.map(w => s"'$w'").mkString(", ")
    val viaSql = spark.sql(
      s"""WITH tk AS (
         |  SELECT source, doc_id, text, filter(split(text, '\\\\s+'), t -> t != '') AS toks
         |  FROM documents),
         |pd AS (
         |  SELECT source, doc_id, CAST(size(toks) AS BIGINT) AS n_tok,
         |         least(size(toks) / 100e0, 1e0) * 0.4e0
         |           + least((aggregate(transform(toks, t -> length(t)), 0, (acc, x) -> acc + x) / size(toks)) / 8e0, 1e0) * 0.3e0
         |           + (1e0 - (size(filter(toks, t -> t IN ($stop))) / size(toks))) * 0.2e0
         |           + (1e0 - ((length(text) - length(regexp_replace(text, '[.,!?;:]', ''))) / length(text))) * 0.1e0 AS quality
         |  FROM tk WHERE size(toks) > 0),
         |c AS (
         |  SELECT source, doc_id, n_tok, quality,
         |         SUM(n_tok) OVER (PARTITION BY source ORDER BY quality DESC, doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_tok
         |  FROM pd)
         |SELECT source, doc_id, n_tok, quality, end_tok FROM c WHERE end_tok <= 600""".stripMargin)
    val viaDf = graft.queries.CurationQueries.budgetSelect(
      Tables.documents(spark, sf), 600L)
    assertSame(viaSql, viaDf)
    // the budget really binds (strict subset per source)
    assert(viaSql.count() < Tables.documents(spark, sf).count())
  }

  test("the COMPOSED curation pipeline runs as a TEMP VIEW chain via spark.sql") {
    ready
    // A downstream SQL-only user must be able to run the STAGED pipeline,
    // not just its individual operators: four composed stages (URL
    // blocklist -> exact dedup -> MinHash-LSH near-dup -> quality floor),
    // each a CREATE TEMP VIEW over the previous one, row-equal to
    // curatedDocsOf with the same config. Corpus: every 7th doc gets an
    // exact replica (id + 100000) and every 3rd doc a blocked URL, so the
    // first two stages provably fire; near-dups come from the corpus's
    // own near-duplicate structure plus replicas whose URL tail made them
    // inexact copies.
    spark.sql(
      """SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 0
        |            THEN concat(text, ' see https://x.bad.example/p') ELSE text END AS text,
        |       lang, source, n_chars
        |FROM (SELECT * FROM documents
        |      UNION ALL
        |      SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
        |      FROM documents WHERE doc_id % 7 = 0)""".stripMargin)
      .createOrReplaceTempView("dirty_curation")
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW cur_url AS
        |SELECT * FROM dirty_curation
        |WHERE size(filter(
        |        transform(regexp_extract_all(text, '(?i)https?://([A-Za-z0-9.-]+)', 1),
        |                  h -> lower(regexp_replace(h, '\\.+$', ''))),
        |        h -> h = 'bad.example' OR endswith(h, '.bad.example'))) = 0""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW cur_exact AS
        |SELECT d.* FROM cur_url d
        |LEFT SEMI JOIN (SELECT min(doc_id) AS doc_id FROM cur_url GROUP BY md5(text)) c
        |ON d.doc_id = c.doc_id""".stripMargin)
    // near-dup: the q42 semantics as SQL — 4 bands of 2 hashes over the
    // compiled minhash_signature kernel, candidates from band-bucket
    // equality (never all-pairs), est_sim from the full signatures,
    // higher id of each pair loses
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW cur_losers AS
         |WITH sig AS (
         |  SELECT doc_id, minhash_signature(text) AS s FROM cur_exact
         |  WHERE size(filter(split(text, '\\\\s+'), t -> t != '')) >= 3),
         |k AS (
         |  SELECT doc_id, s, explode(array(
         |    struct(0 AS band, s[0] AS k1, s[1] AS k2),
         |    struct(1 AS band, s[2] AS k1, s[3] AS k2),
         |    struct(2 AS band, s[4] AS k1, s[5] AS k2),
         |    struct(3 AS band, s[6] AS k1, s[7] AS k2))) AS bk
         |  FROM sig)
         |SELECT DISTINCT b.doc_id
         |FROM k a JOIN k b ON a.bk = b.bk AND a.doc_id < b.doc_id
         |WHERE aggregate(zip_with(a.s, b.s, (x, y) -> IF(x = y, 1, 0)),
         |                0, (acc, v) -> acc + v) / 8e0 >= 0.5""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW cur_neardup AS
        |SELECT d.* FROM cur_exact d LEFT ANTI JOIN cur_losers l ON d.doc_id = l.doc_id""".stripMargin)
    val stop = graft.ext.TextOps.lexicons.head._2.map(w => s"'$w'").mkString(", ")
    spark.sql(
      s"""CREATE OR REPLACE TEMP VIEW cur_final AS
         |SELECT doc_id, text, lang, source, n_chars,
         |       least(size(toks) / 100e0, 1e0) * 0.4e0
         |         + least((aggregate(transform(toks, t -> length(t)), 0, (acc, x) -> acc + x) / size(toks)) / 8e0, 1e0) * 0.3e0
         |         + (1e0 - (size(filter(toks, t -> t IN ($stop))) / size(toks))) * 0.2e0
         |         + (1e0 - ((length(text) - length(regexp_replace(text, '[.,!?;:]', ''))) / length(text))) * 0.1e0 AS quality
         |FROM (SELECT *, filter(split(text, '\\\\s+'), t -> t != '') AS toks
         |      FROM cur_neardup)
         |WHERE size(toks) > 0""".stripMargin)
    val viaSql = spark.sql("SELECT * FROM cur_final WHERE quality >= 0.5e0")
    val viaDf = graft.queries.TextQueries.curatedDocsOf(
      spark.table("dirty_curation"),
      graft.queries.TextQueries.CurationStages(blockedDomains = Seq("bad.example")))
    assertSame(viaSql, viaDf)
    // every composed stage really fired
    val nDirty = spark.table("dirty_curation").count()
    val nUrl = spark.table("cur_url").count()
    val nExact = spark.table("cur_exact").count()
    assert(nUrl < nDirty, "the URL stage must drop the injected blocked docs")
    assert(nExact < nUrl, "the exact-dedup stage must drop the injected replicas")
    assert(spark.table("cur_losers").count() > 0,
      "the near-dup stage must find at least one LSH loser in this corpus")
  }

  test("the sketch aggregators register as SQL aggregate functions (udaf) and match the typed forms") {
    ready
    import spark.implicits._
    import org.apache.spark.sql.{Encoders, functions => F}
    spark.udf.register("cms_sketch", F.udaf(new graft.ext.CmsAgg(4, 256), Encoders.STRING))
    spark.udf.register("hll_registers", F.udaf(new graft.ext.HllAgg(8), Encoders.STRING))
    spark.udf.register("bloom_bits", F.udaf(new graft.ext.BloomAgg(512, 3), Encoders.scalaLong))
    val toks = spark.sql(
      """SELECT explode(filter(split(text, '\\s+'), x -> x != '')) AS tok FROM documents""")
    toks.createOrReplaceTempView("toks")
    val viaSqlCms = spark.sql("SELECT cms_sketch(tok) AS s FROM toks")
      .collect().head.getSeq[Long](0)
    val typedCms = toks.as[String]
      .select(new graft.ext.CmsAgg(4, 256).toColumn).collect().head
    assert(viaSqlCms == typedCms.toSeq, "SQL cms_sketch must equal the typed aggregation")
    val viaSqlHll = spark.sql("SELECT hll_registers(tok) AS s FROM toks")
      .collect().head.getSeq[Long](0)
    val typedHll = toks.as[String]
      .select(new graft.ext.HllAgg(8).toColumn).collect().head
    assert(viaSqlHll == typedHll.toSeq, "SQL hll_registers must equal the typed aggregation")
    val viaSqlBloom = spark.sql(
      "SELECT bloom_bits(CAST(hash(tok) AS BIGINT)) AS s FROM toks")
      .collect().head.getSeq[Long](0)
    val typedBloom = toks.selectExpr("CAST(hash(tok) AS BIGINT) AS h").as[Long]
      .select(new graft.ext.BloomAgg(512, 3).toColumn).collect().head
    assert(viaSqlBloom == typedBloom.toSeq, "SQL bloom_bits must equal the typed aggregation")
  }

  test("q97's LM surprisal chain runs as ONE spark.sql string and matches lmSurprisal") {
    ready
    val viaSql = spark.sql(
      """WITH t AS (SELECT doc_id, filter(split(text, '\\s+'), x -> x != '') AS tk FROM documents),
        |bb AS (SELECT doc_id, b.w1, b.w2 FROM (
        |  SELECT doc_id, explode(transform(sequence(1, size(tk) - 1),
        |           i -> struct(tk[i-1] AS w1, tk[i] AS w2))) AS b
        |  FROM t WHERE size(tk) >= 2)),
        |lm AS (SELECT w1, w2, COUNT(*) AS n_pair FROM bb GROUP BY 1, 2),
        |lm2 AS (SELECT w1, w2, n_pair, SUM(n_pair) OVER (PARTITION BY w1) AS n_ctx FROM lm),
        |sc AS (SELECT bb.doc_id, CAST(length(bin(n_ctx div n_pair)) - 1 AS BIGINT) AS s
        |       FROM bb JOIN lm2 USING (w1, w2))
        |SELECT doc_id, COUNT(*) AS n_bigrams, CAST(SUM(s) AS BIGINT) AS sum_surprisal,
        |       CAST(SUM(s) AS DOUBLE) / COUNT(*) AS mean_surprisal
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    val viaDf = graft.queries.TextQueries.lmSurprisal(Tables.documents(spark, sf))
    assertSame(viaSql, viaDf)
    spark.catalog.clearCache()
  }

  test("winnow_fingerprints and decimal_dot SQL functions match the Column facade") {
    ready
    val viaSql = spark.sql(
      "SELECT doc_id, winnow_fingerprints(text) AS fp FROM documents")
    val viaDf = Tables.documents(spark, sf).select(col("doc_id"),
      Exprs.winnowFingerprints(col("text"), 8, 4).as("fp"))
    assertSame(viaSql, viaDf)
    // the kernel contract is array<double>; EmbeddingQueries casts
    // explicitly at the projection, and the declared inputTypes cover
    // the undeclared-SQL path (pinned by the float-array test below)
    val dotSql = spark.sql(
      """SELECT vec_id, decimal_dot(v, v) AS sq
        |FROM (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings)""".stripMargin)
    val dotDf = Tables.read(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), Exprs.decimalDot(col("v"), col("v")).as("sq"))
    assertSame(dotSql, dotDf)
    val qdotSql = spark.sql(
      """SELECT vec_id, quant_dot(v, v) AS sq
        |FROM (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings)""".stripMargin)
    val qdotDf = Tables.read(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), Exprs.quantDot(col("v"), col("v")).as("sq"))
    assertSame(qdotSql, qdotDf)
  }

  test("dot kernels on a raw float array: analysis widens, never a wrong-stride read") {
    // Without declared inputTypes, calling the SQL functions on the
    // embeddings table's native array<float> made ArrayData.getDouble
    // read the float-backed array at the wrong element stride — silent
    // garbage. The declared array<double> contract makes analysis insert
    // the (exact) float->double widening cast instead, so the undeclared
    // form now equals the explicitly-cast form bit-for-bit.
    ready
    for (fn <- Seq("quant_dot", "decimal_dot")) {
      val bare = spark.sql(
        s"SELECT vec_id, $fn(embedding, embedding) AS sq FROM embeddings")
      val cast = spark.sql(
        s"""SELECT vec_id, $fn(v, v) AS sq
           |FROM (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings)""".stripMargin)
      assertSame(bare, cast)
    }
    // incompatible element types fail at analysis, not at runtime
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT quant_dot(array('a', 'b'), array('c', 'd'))").collect()
    }
  }
}
