package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables
import graft.ext.TextOps

/** Stage-level cost account for the two most expensive queries (q57,
  * q53) under the DRIVER'S cold-bench state: fresh JVM, local[32],
  * single pass, sf0.1. Each stage is timed by materializing exactly
  * that stage's output (count), in query order, so stage 1 absorbs the
  * cold codegen/JIT/scan cost it also absorbs inside the real query.
  * The per-stage numbers explain where the cold single-pass seconds go
  * (BENCH_NOTES "cold-gap disposition") — they are diagnostic, not the
  * bench contract.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32
  *        sbt "runMain graft.StageProbe"
  * Dev harness — not part of the driver contract surface.
  */
object StageProbe {

  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    println(f"PROBE $label%-42s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(Tables.NanosFlag, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- q57 containment pairs: fps persist / rare persist / pair join
    {
      val k = 8; val w = 4; val dfCap = 32
      val fps = Tables.documents(spark, sfDir)
        .where(length(col("text")) >= k + w - 1)
        .select(col("doc_id"),
          explode(graft.expressions.Exprs.winnowFingerprints(col("text"), k, w)).as("fp"))
        .persist()
      t("q57 stage1: fps explode+persist (COLD)")(fps.count())
      val dfTab = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .where(col("df") <= dfCap)
      val rare = fps.join(dfTab, Seq("fp"))
        .select(col("doc_id"), col("fp")).persist()
      t("q57 stage2: df-cap join+persist")(rare.count())
      val nk = rare.groupBy(col("doc_id")).agg(count(lit(1)).as("n_kept"))
      val pairs = rare.select(col("doc_id").as("doc_a"), col("fp"))
        .join(rare.select(col("doc_id").as("doc_b"), col("fp")), Seq("fp"))
        .where(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("shared"))
      val out = pairs
        .join(nk.select(col("doc_id").as("doc_a"), col("n_kept").as("ka")), Seq("doc_a"))
        .join(nk.select(col("doc_id").as("doc_b"), col("n_kept").as("kb")), Seq("doc_b"))
        .where(col("shared") * 2 >= least(col("ka"), col("kb")))
      t("q57 stage3: pair join + score")(out.count())
      spark.catalog.clearCache()
      t("q57 FULL (warm kernels, own caches)")(
        SparkEntry.queries("q57_containment_pairs")(spark, sfDir).count())
      spark.catalog.clearCache()
    }

    // ---- q53 packing plan: range exchange / local window+persist / rest
    {
      val nShards = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val sharded = Tables.documents(spark, sfDir)
        .select(col("lang"), col("doc_id"), col("text"))
        .repartitionByRange(nShards, col("lang"), col("doc_id"))
        .withColumn("shard", spark_partition_id())
        .select(col("lang"), col("doc_id"), col("shard"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tok"))
        .where(col("n_tok") > 0)
      t("q53 stage1: range exchange + tokenize (COLD)")(sharded.count())
      val wLoc = Window.partitionBy(col("shard"), col("lang")).orderBy(col("doc_id"))
      val local = sharded.withColumn("local_end", sum(col("n_tok")).over(wLoc)).persist()
      t("q53 stage2: shard-local cumsum + persist")(local.count())
      spark.catalog.clearCache()
      t("q53 FULL (warm kernels, own caches)")(
        SparkEntry.queries("q53_packing_plan")(spark, sfDir).count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
