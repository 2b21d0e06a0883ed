package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Source-side utilities (SURVEY.md §2.1): latest-artifact selection,
  * config-driven source switching, and the ingestion retry loop. The
  * HTTP extract itself is outside the engine boundary (landed JSON is
  * the contract, S1/S3); Spark tasks already retry internally, so the
  * retry helper exists for driver-side ingestion code (S2).
  */
object Sources {

  /** S6 — latest-file selection: lexicographically-last path matching
    * the glob (the reference's timestamped-name convention makes name
    * order == time order: ETL_Weather_API/transform.py:89-92,
    * ETL_Multi_Lvl_API/load.py:40-44). Driver-side listing, like the
    * reference. */
  def latestFile(spark: SparkSession, glob: String): Option[String] = {
    val p = new Path(glob)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    val matches = Option(fs.globStatus(p)).getOrElse(Array.empty)
    matches.map(_.getPath.toString).sorted.lastOption
  }

  /** S14 — dual-source switch: route the analysis input to the staged
    * layer or the warehouse by configuration
    * (ETL_Multi_Lvl_API/etl_analysis.py:41,138-142). The warehouse
    * reader is the standard JDBC source (S12), exercised against
    * embedded Derby in JdbcSpec. */
  def analysisInput(spark: SparkSession, useStaged: Boolean,
                    stagedPath: String, jdbcUrl: String = "",
                    dbtable: String = ""): DataFrame =
    if (useStaged) spark.read.parquet(stagedPath)
    else warehouseRead(spark, jdbcUrl, dbtable)

  /** S12 — warehouse SELECT source. `partitioning` turns the scan into
    * a PARALLEL read (one task per stride of the numeric column) — the
    * only JDBC shape that survives a large table; a single-connection
    * scan is the classic warehouse-ingest bottleneck. Spark pushes
    * WHERE predicates into the generated SQL (JdbcSpec asserts
    * PushedFilters reaches the scan). */
  def warehouseRead(spark: SparkSession, url: String, dbtable: String,
                    partitioning: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url).option("dbtable", dbtable)
    partitioning match {
      case Some((column, lower, upper, n)) =>
        r.option("partitionColumn", column)
          .option("lowerBound", lower).option("upperBound", upper)
          .option("numPartitions", n).load()
      case None => r.load()
    }
  }

  /** S10 — batched warehouse INSERT: one round-trip per `batchSize`
    * rows per task (the JDBC `batchsize` option == psycopg2's
    * execute_batch page_size, ETL_Weather_API/load.py:67-103). Append
    * into a pre-created table so the warehouse keeps its own types
    * (Derby/Postgres VARCHAR widths, not the dialect's CLOB default). */
  def warehouseWrite(df: DataFrame, url: String, dbtable: String,
                     batchSize: Int = 1000,
                     mode: SaveMode = SaveMode.Append): Unit =
    df.write.format("jdbc")
      .option("url", url).option("dbtable", dbtable)
      .option("batchsize", batchSize)
      .mode(mode).save()

  /** S13 (warehouse flavor) — idempotent CREATE TABLE
    * (ETL_Weather_API/load.py:24-52). Databases without IF NOT EXISTS
    * (Derby) get metadata-probe idempotence; a lost race to another
    * writer is also treated as "exists". */
  def ensureJdbcTable(url: String, table: String, columnsDdl: String): Unit = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(
        null, null, table.toUpperCase(java.util.Locale.ROOT), null)
      val exists = try rs.next() finally rs.close()
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(s"CREATE TABLE $table ($columnsDdl)")
        catch { case e: java.sql.SQLException =>
          val again = conn.getMetaData.getTables(
            null, null, table.toUpperCase(java.util.Locale.ROOT), null)
          try { if (!again.next()) throw e } finally again.close()
        } finally st.close()
      }
    } finally conn.close()
  }

  /** S13 (catalog flavor) — idempotent CREATE TABLE in the Spark
    * catalog over an explicit parquet location. */
  def ensureCatalogTable(spark: SparkSession, name: String,
                         columnsDdl: String, location: String): Unit =
    spark.sql(s"CREATE TABLE IF NOT EXISTS $name ($columnsDdl) " +
      s"USING parquet LOCATION '$location'")

  /** S2 — bounded retry with exponential backoff (2^(n-1) seconds, like
    * ETL_Multi_Lvl_API/extract.py:76-106), for driver-side ingestion
    * calls. Sleeps are injectable so tests don't wait. */
  def retry[A](attempts: Int, sleep: Long => Unit = ms => Thread.sleep(ms))
              (body: => A): A = {
    var n = 0
    var last: Throwable = null
    while (n < attempts) {
      try return body
      catch {
        case e: Throwable =>
          last = e; n += 1
          if (n < attempts) sleep(1000L << (n - 1))
      }
    }
    throw last
  }

  /** One fetch's outcome — the reference's per-city result dict
    * (ETL_Multi_Lvl_API/extract.py:89,106): a failed key reports its
    * error and does NOT abort the run. */
  final case class FetchResult(key: String, success: Boolean,
                               rawPath: Option[String], error: Option[String])

  /** S1 — the HTTP JSON extract: GET each (key, url, query-params)
    * request with bounded exponential-backoff retry ([[retry]]'s
    * 2^(n-1)-second schedule, extract.py:76-106) and land every
    * response as `<key>_raw_<utc-timestamp>.json` under `rawDir` —
    * exactly the raw layer the engine boundary starts at (S3/S4 scan
    * these files; SURVEY.md §2.1). Non-JSON bodies land wrapped as
    * `{"raw_text": …}` (extract.py:85-86), so the raw layer is always
    * valid JSON for the downstream multiLine scan.
    *
    * Driver-side and sequential BY DESIGN: the reference paces a public
    * API politely (SLEEP_BETWEEN_CALLS) and the request list is a
    * handful of cities — distribution belongs to the scan that follows,
    * not the fetch. The transport is injectable (url, timeoutMs) ⇒ body
    * — FetchSpec drives every arm (retry schedule, exhaustion,
    * non-JSON wrap, param encoding) without a network; the default is a
    * JDK HttpClient GET that raises on non-2xx like requests'
    * raise_for_status (extract.py:80-81). `rawDir` resolves through the
    * Hadoop FileSystem of its scheme, so the raw layer can be local
    * (the reference's data/raw) or hdfs://-/s3a://-style storage. */
  def fetchJsonToRaw(requests: Seq[(String, String, Map[String, String])],
                     rawDir: String,
                     transport: (String, Int) => String = httpGet,
                     maxRetries: Int = 3,
                     timeoutMs: Int = 10000,
                     sleep: Long => Unit = ms => Thread.sleep(ms),
                     now: () => java.time.Instant = () => java.time.Instant.now(),
                     hadoopConf: org.apache.hadoop.conf.Configuration =
                       new org.apache.hadoop.conf.Configuration()): Seq[FetchResult] = {
    val dir = new Path(rawDir)
    val fs = FileSystem.get(dir.toUri, hadoopConf)
    fs.mkdirs(dir)
    // FAIL_ON_TRAILING_TOKENS: readTree otherwise accepts
    // '{"a":1}garbage' (it stops at the first complete tree), landing a
    // partially-JSON body verbatim and breaking the raw layer's
    // "always valid JSON for the multiLine scan" contract (r20 ADVICE)
    // — such bodies must take the raw_text wrap path instead.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      .enable(com.fasterxml.jackson.databind.DeserializationFeature.FAIL_ON_TRAILING_TOKENS)
    val stamp = java.time.format.DateTimeFormatter
      .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
    requests.map { case (key, url, params) =>
      val full =
        if (params.isEmpty) url
        else url + "?" + params.toSeq.sortBy(_._1).map { case (k, v) =>
          java.net.URLEncoder.encode(k, "UTF-8") + "=" +
            java.net.URLEncoder.encode(v, "UTF-8")
        }.mkString("&")
      try {
        val body = retry(maxRetries, sleep)(transport(full, timeoutMs))
        val payload =
          try { mapper.readTree(body); body }
          catch { case _: java.io.IOException =>
            mapper.writeValueAsString(
              mapper.createObjectNode().put("raw_text", body))
          }
        // sanitize to a safe charset, not just spaces: a key containing
        // path separators ('a/b', '../x') would resolve OUTSIDE rawDir
        // via new Path(dir, name) and silently land files out of the
        // raw layer (r20 ADVICE). The sanitizer is lossy ('a/b', 'a b',
        // 'a:b' all map to 'a_b') and fs.create(out, overwrite=true)
        // would let same-second distinct keys silently clobber each
        // other's payloads (r21 ADVICE) — an 8-hex digest of the RAW
        // key keeps distinct keys on distinct files.
        val tag = java.security.MessageDigest.getInstance("MD5")
          .digest(key.getBytes("UTF-8")).take(4)
          .map(b => f"${b & 0xff}%02x").mkString
        val name = s"${key.toLowerCase(java.util.Locale.ROOT)
          .replaceAll("[^a-z0-9._-]", "_")}_$tag" +
          s"_raw_${stamp.format(now())}.json"
        val out = new Path(dir, name)
        val os = fs.create(out, true)
        try os.write(payload.getBytes("UTF-8")) finally os.close()
        FetchResult(key, success = true, Some(out.toString), None)
      } catch {
        case e: Exception =>
          FetchResult(key, success = false, None, Some(e.toString))
      }
    }
  }

  /** The default [[fetchJsonToRaw]] transport: a JDK HttpClient GET
    * with per-request timeout, following redirects, raising on any
    * non-2xx status (requests.raise_for_status). */
  def httpGet(url: String, timeoutMs: Int): String = {
    val client = java.net.http.HttpClient.newBuilder()
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
      .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
    val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new java.io.IOException(s"HTTP ${resp.statusCode()} for $url")
    resp.body()
  }
}
