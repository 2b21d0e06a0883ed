package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config(graft.engine.Tables.NanosFlag, "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup on the smallest SF: JVM/codegen/parquet-reader init
    // and first-touch of every table must not be billed to whichever
    // query happens to run first
    try {
      SparkEntry.entry(spark).count()
      graft.engine.Tables.all.foreach(t =>
        graft.engine.Tables.read(spark, "/root/testdata/sf0.001", t).count())
    } catch { case _: Throwable => () }
    // deterministic name order: same warm-up position per query across
    // rounds, so per-query numbers are comparable run-to-run
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries that .persist() intermediates cannot unpersist in their
      // (lazy) bodies; drop cached blocks here so they don't accumulate
      // across the session and skew later queries' available memory
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
