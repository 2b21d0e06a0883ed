package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Restructuring operators (SURVEY.md §2.2): parallel-array flatten,
  * key-variant resolution, nested-list unnest, parameter normalization,
  * long->wide pivot. All narrow except the explicit pivot aggregation.
  */
object Restructure {

  /** R2 — key-variant resolution: coalesce over the variant columns that
    * exist in `df`'s schema (absent names contribute nothing), null if no
    * variant exists. Mirrors the reference's runtime key probing
    * (ETL_Multi_Lvl_API/transform.py:110-118) as a schema-time decision. */
  def firstPresent(df: DataFrame, names: Seq[String]): Column = {
    val present = names.filter(df.schema.fieldNames.contains)
    if (present.isEmpty) lit(null)
    else coalesce(present.map(n => col(s"`$n`")): _*)
  }

  /** R1 — parallel-array flatten: zip index-aligned array columns into
    * one row per index. The FIRST array drives the row count (the
    * reference enumerates `times` and index-guards every metric,
    * ETL_Weather_API/transform.py:31-36): a null driver yields zero
    * rows, null/short metric arrays null-pad, and metric entries beyond
    * the driver's length are dropped. `arrays` maps output name -> array
    * column; `keep` columns are carried through. */
  def flattenParallelArrays(df: DataFrame, keep: Seq[Column],
                            arrays: Seq[(String, Column)]): DataFrame = {
    val (dn, dc) = arrays.head
    val d = coalesce(dc, array())
    val zipped = arrays_zip(
      d.as(dn) +: arrays.tail.map { case (n, c) =>
        slice(coalesce(c, array()), lit(1), size(d)).as(n)
      }: _*)
    df.select(keep :+ explode(zipped).as("z"): _*)
      .select(keep ++ arrays.map { case (n, _) => col(s"z.$n").as(n) }: _*)
  }

  /** R4 — parameter-name normalization to canonical pollutant columns;
    * unknown names -> null (caller filters). Exact CASE mirror of
    * ETL_Multi_Lvl_API/transform.py:171-191. */
  def mapParam(p: Column): Column = {
    val t = lower(trim(p))
    when(t.isin("pm25", "pm2.5", "pm2_5"), "pm2_5")
      .when(t === "pm10", "pm10")
      .when(t.isin("co", "carbon_monoxide", "carbonmonoxide"), "carbon_monoxide")
      .when(t.isin("no2", "nitrogen_dioxide"), "nitrogen_dioxide")
      .when(t.isin("so2", "sulphur_dioxide"), "sulphur_dioxide")
      .when(t.isin("o3", "ozone"), "ozone")
      .when(t.isin("uv", "uv_index"), "uv_index")
      .otherwise(lit(null).cast("string"))
  }

  /** R5 — long->wide pivot with pre-mean at the (city,time,param) grain
    * then mean per cell (ETL_Multi_Lvl_API/transform.py:196-202; one
    * groupBy+pivot covers both steps). Explicit value list keeps the
    * plan deterministic (no distinct-collect job). */
  def pivotParams(long: DataFrame): DataFrame =
    long.groupBy(col("city"), col("time"))
      .pivot("param_col", Schemas.pollutants)
      .agg(avg(col("value")))
}
