package graft
import org.apache.spark.sql.SparkSession
object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def tryRead(glob: String): Unit =
      try {
        val n = spark.read.schema(engine.Schemas.aqHourlyRaw).option("multiLine", true).json(glob).count()
        println(s"DBG OK $glob -> $n")
      } catch { case e: Throwable => println(s"DBG ERR $glob -> ${e.getClass.getName}: ${e.getMessage.linesIterator.next()}") }
    tryRead("/root/reference/ETL_Multi_Lvl_API/data/raw/*_raw_*.json")
    tryRead("/root/reference/ETL_Multi_Lvl_API/data/raw/delhi_raw_20251211T083142Z.json")
    tryRead("/root/reference/ETL_Multi_Lvl_API/data/raw/")
    spark.stop()
  }
}
