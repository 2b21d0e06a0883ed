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
  }

  test("winnow_fingerprints and decimal_dot SQL functions match the Column facade") {
    ready
    val viaSql = spark.sql(
      "SELECT doc_id, winnow_fingerprints(text) AS fp FROM documents")
    val viaDf = Tables.documents(spark, sf).select(col("doc_id"),
      Exprs.winnowFingerprints(col("text"), 8, 4).as("fp"))
    assertSame(viaSql, viaDf)
    // the kernel contract is array<double> (EmbeddingQueries casts at
    // the projection; an implicit cast would push float->double widening
    // into the dictionary-encoded scan, which the vectorized reader
    // rejects)
    val dotSql = spark.sql(
      """SELECT vec_id, decimal_dot(v, v) AS sq
        |FROM (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings)""".stripMargin)
    val dotDf = Tables.read(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"), Exprs.decimalDot(col("v"), col("v")).as("sq"))
    assertSame(dotSql, dotDf)
  }
}
