package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.engine.{Parity, Tables}
import Parity.{dsum12, sqlDsum12}

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float> (64-dim), label): brute-force cosine top-k as the
  * baseline, sign-LSH bucketing and IVF-style coarse quantization as the
  * scale paths.
  *
  * Numeric parity strategy: dot products and norms are computed
  * relationally — explode to (vec_id, i, x), join on the position, sum
  * per-element double products through Parity.dsum12 — so the result is
  * order-independent and bit-identical to the DuckDB oracle. (A fused
  * array expression — zip_with + aggregate — is faster per pair but its
  * fold order is engine-specific; the relational form is also the shape
  * that distributes: the small side broadcasts, the big side never
  * shuffles until the final per-pair partial aggregation.)
  *
  * "Hyperplanes"/centroids are the first `nSeeds` vectors by vec_id —
  * deterministic stand-ins for seeded random projections, so both engines
  * and every rerun agree.
  */
object EmbeddingQueries {

  private val dim = 64
  private val nSeeds = 8
  private val nQueries = 10

  // ---- Spark-side building blocks ----
  private def exploded(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id"),
      posexplode(col("embedding").cast("array<double>")).as(Seq("i", "x")))

  private def norms(ex: DataFrame): DataFrame =
    ex.groupBy(col("vec_id")).agg(sqrt(dsum12(col("x") * col("x"))).as("nrm"))

  /** Pairwise dots for (left ⋈ right on position); both renamed first. */
  private def dots(l: DataFrame, lId: String, r: DataFrame, rId: String): DataFrame =
    l.select(col("vec_id").as(lId), col("i"), col("x").as("lx"))
      .join(r.select(col("vec_id").as(rId), col("i"), col("x").as("rx")), Seq("i"))
      .groupBy(col(lId), col(rId))
      .agg(dsum12(col("lx") * col("rx")).as("dot"))

  // ---- DuckDB-side shared CTEs ----
  private val sqlEx =
    s"ex AS (SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x FROM embeddings, range(1, ${dim + 1}) t(i))"
  private val sqlNr =
    s"nr AS (SELECT vec_id, sqrt(${sqlDsum12("x * x")}) AS nrm FROM ex GROUP BY 1)"

  val defs: Map[String, Q] = Map(

    // Brute-force cosine top-k — the exact baseline every ANN variant is
    // measured against. Query side is tiny and broadcasts; the corpus side
    // is scanned once, never shuffled before the partial agg.
    "q45_ann_bruteforce_topk" -> Q(
      (s, d) => {
        val ex = exploded(s, d)
        val nr = norms(ex)
        val dt = dots(broadcast(ex.where(col("vec_id") < nQueries)), "query_id", ex, "cand_id")
          .where(col("cand_id") =!= col("query_id"))
        val cos = dt
          .join(broadcast(nr.select(col("vec_id").as("query_id"), col("nrm").as("qn"))), Seq("query_id"))
          .join(nr.select(col("vec_id").as("cand_id"), col("nrm").as("cn")), Seq("cand_id"))
          .withColumn("cosine", col("dot") / (col("qn") * col("cn")))
        val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("cand_id").asc)
        cos.withColumn("rank", row_number().over(w)).where(col("rank") <= 5)
          .select(col("query_id"), col("rank"), col("cand_id").as("neighbor_id"), col("cosine"))
          .orderBy(col("query_id"), col("rank"))
      },
      s"""WITH $sqlEx, $sqlNr,
         |dt AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS cand_id, ${sqlDsum12("q.x * c.x")} AS dot
         |  FROM ex q JOIN ex c ON q.i = c.i AND q.vec_id < $nQueries AND c.vec_id <> q.vec_id
         |  GROUP BY 1, 2),
         |cos AS (
         |  SELECT query_id, cand_id, dot / (nq.nrm * nc.nrm) AS cosine
         |  FROM dt JOIN nr nq ON nq.vec_id = query_id JOIN nr nc ON nc.vec_id = cand_id)
         |SELECT query_id, CAST(rn AS INTEGER) AS rank, cand_id AS neighbor_id, cosine
         |FROM (SELECT cos.*, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rn FROM cos) z
         |WHERE rn <= 5 ORDER BY query_id, rank""".stripMargin),

    // Sign-LSH near-dup search: 8-bit hyperplane-sign signature buckets
    // the corpus; pairs form only inside a bucket (the all-pairs cross
    // join never happens), then the top 20 bucket-local pairs by cosine.
    "q46_lsh_bucket_pairs" -> Q(
      (s, d) => {
        val ex = exploded(s, d)
        val nr = norms(ex)
        val seeds = ex.where(col("vec_id") < nSeeds)
        val bitExprs = (0 until nSeeds).map(k =>
          sum(when(col("seed") === k && col("dot") > 0, 1L << k).otherwise(0L)).as(s"s$k"))
        val sig = dots(ex, "v", broadcast(seeds), "seed")
          .groupBy(col("v")).agg(bitExprs.head, bitExprs.tail: _*)
          .select(col("v"), (0 until nSeeds).map(k => col(s"s$k")).reduce(_ + _).as("bucket"))
        val pairs = sig.select(col("v").as("doc_a"), col("bucket"))
          .join(sig.select(col("v").as("doc_b"), col("bucket")), Seq("bucket"))
          .where(col("doc_a") < col("doc_b"))
          .select(col("doc_a"), col("doc_b"), col("bucket"))
        val pd = pairs
          .join(ex.select(col("vec_id").as("doc_a"), col("i"), col("x").as("xa")), Seq("doc_a"))
          .join(ex.select(col("vec_id").as("doc_b"), col("i"), col("x").as("xb")),
            Seq("doc_b", "i"))
          .groupBy(col("doc_a"), col("doc_b"), col("bucket"))
          .agg(dsum12(col("xa") * col("xb")).as("dot"))
        pd.join(broadcast(norms(ex)).select(col("vec_id").as("doc_a"), col("nrm").as("na")), Seq("doc_a"))
          .join(broadcast(norms(ex)).select(col("vec_id").as("doc_b"), col("nrm").as("nb")), Seq("doc_b"))
          .withColumn("cosine", col("dot") / (col("na") * col("nb")))
          .select(col("doc_a"), col("doc_b"), col("bucket"), col("cosine"))
          .orderBy(col("cosine").desc, col("doc_a").asc, col("doc_b").asc)
          .limit(20)
      },
      s"""WITH $sqlEx, $sqlNr,
         |sd AS (
         |  SELECT v.vec_id AS v, s.vec_id AS seed, ${sqlDsum12("v.x * s.x")} AS dot
         |  FROM ex v JOIN ex s ON v.i = s.i AND s.vec_id < $nSeeds
         |  GROUP BY 1, 2),
         |sig AS (
         |  SELECT v, CAST(${(0 until nSeeds).map(k =>
             s"SUM(CASE WHEN seed = $k AND dot > 0 THEN ${1L << k} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS bucket
         |  FROM sd GROUP BY 1),
         |pairs AS (
         |  SELECT a.v AS doc_a, b.v AS doc_b, a.bucket
         |  FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.v < b.v),
         |pd AS (
         |  SELECT doc_a, doc_b, bucket, ${sqlDsum12("xa.x * xb.x")} AS dot
         |  FROM pairs
         |  JOIN ex xa ON xa.vec_id = doc_a
         |  JOIN ex xb ON xb.vec_id = doc_b AND xb.i = xa.i
         |  GROUP BY 1, 2, 3)
         |SELECT doc_a, doc_b, bucket, dot / (na.nrm * nb.nrm) AS cosine
         |FROM pd JOIN nr na ON na.vec_id = doc_a JOIN nr nb ON nb.vec_id = doc_b
         |ORDER BY cosine DESC, doc_a ASC, doc_b ASC LIMIT 20""".stripMargin),

    // IVF-style coarse quantization: assign every vector to its nearest
    // centroid (here: the first 8 vectors as deterministic centroids),
    // then answer top-3 neighbor queries inside the probe's cell only —
    // the classic recall-for-throughput trade at corpus scale.
    "q47_ivf_topk" -> Q(
      (s, d) => {
        val ex = exploded(s, d)
        val nr = norms(ex)
        val cents = ex.where(col("vec_id") < nSeeds)
        val cd = dots(ex, "v", broadcast(cents), "cent")
          .join(broadcast(nr.select(col("vec_id").as("v"), col("nrm").as("vn"))), Seq("v"))
          .join(broadcast(nr.select(col("vec_id").as("cent"), col("nrm").as("cn"))), Seq("cent"))
          .withColumn("ccos", col("dot") / (col("vn") * col("cn")))
        val wAssign = Window.partitionBy(col("v")).orderBy(col("ccos").desc, col("cent").asc)
        val assign = cd.withColumn("rn", row_number().over(wAssign)).where(col("rn") === 1)
          .select(col("v"), col("cent").as("cell"))
        val qAssign = assign.where(col("v") < nQueries)
          .select(col("v").as("query_id"), col("cell"))
        val cands = qAssign.join(assign.select(col("v").as("cand_id"), col("cell")), Seq("cell"))
          .where(col("cand_id") =!= col("query_id"))
        val pd = cands
          .join(ex.select(col("vec_id").as("query_id"), col("i"), col("x").as("qx")), Seq("query_id"))
          .join(ex.select(col("vec_id").as("cand_id"), col("i"), col("x").as("cx")), Seq("cand_id", "i"))
          .groupBy(col("query_id"), col("cand_id"), col("cell"))
          .agg(dsum12(col("qx") * col("cx")).as("dot"))
          .join(broadcast(nr.select(col("vec_id").as("query_id"), col("nrm").as("qn"))), Seq("query_id"))
          .join(broadcast(nr.select(col("vec_id").as("cand_id"), col("nrm").as("cn"))), Seq("cand_id"))
          .withColumn("cosine", col("dot") / (col("qn") * col("cn")))
        val w = Window.partitionBy(col("query_id")).orderBy(col("cosine").desc, col("cand_id").asc)
        pd.withColumn("rank", row_number().over(w)).where(col("rank") <= 3)
          .select(col("query_id"), col("cell"), col("rank"),
            col("cand_id").as("neighbor_id"), col("cosine"))
          .orderBy(col("query_id"), col("rank"))
      },
      s"""WITH $sqlEx, $sqlNr,
         |cd AS (
         |  SELECT v.vec_id AS v, c.vec_id AS cent, ${sqlDsum12("v.x * c.x")} AS dot
         |  FROM ex v JOIN ex c ON v.i = c.i AND c.vec_id < $nSeeds
         |  GROUP BY 1, 2),
         |ccos AS (
         |  SELECT v, cent, dot / (nv.nrm * nc.nrm) AS ccos
         |  FROM cd JOIN nr nv ON nv.vec_id = v JOIN nr nc ON nc.vec_id = cent),
         |assign AS (
         |  SELECT v, cent AS cell
         |  FROM (SELECT ccos.*, row_number() OVER (PARTITION BY v ORDER BY ccos DESC, cent ASC) AS rn FROM ccos) z
         |  WHERE rn = 1),
         |cands AS (
         |  SELECT q.v AS query_id, a.v AS cand_id, q.cell
         |  FROM assign q JOIN assign a ON q.cell = a.cell AND q.v < $nQueries AND a.v <> q.v),
         |pd AS (
         |  SELECT query_id, cand_id, cell, ${sqlDsum12("qx.x * cx.x")} AS dot
         |  FROM cands
         |  JOIN ex qx ON qx.vec_id = query_id
         |  JOIN ex cx ON cx.vec_id = cand_id AND cx.i = qx.i
         |  GROUP BY 1, 2, 3),
         |cos AS (
         |  SELECT query_id, cand_id, cell, dot / (nq.nrm * nc.nrm) AS cosine
         |  FROM pd JOIN nr nq ON nq.vec_id = query_id JOIN nr nc ON nc.vec_id = cand_id)
         |SELECT query_id, cell, CAST(rn AS INTEGER) AS rank, cand_id AS neighbor_id, cosine
         |FROM (SELECT cos.*, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS rn FROM cos) z
         |WHERE rn <= 3 ORDER BY query_id, rank""".stripMargin)
  )
}
