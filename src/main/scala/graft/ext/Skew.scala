package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigations (SURVEY.md "salting for skew"). AQE's skew-join
  * split handles most runtime skew automatically; these helpers cover
  * the planned-skew cases where the key distribution is known hostile.
  * Both are result-identical transformations — SkewSpec asserts
  * equality against the unsalted forms.
  */
object Skew {

  /** Two-stage salted aggregation for ADDITIVE aggregates (sum/count)
    * over keys with pathological row counts: stage 1 aggregates on
    * (key, salt) — spreading one hot key over `salts` reducers — and
    * stage 2 combines the partials. The salt derives from a
    * row-identifying column, so the plan is deterministic. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String,
                saltSrc: Column, salts: Int): DataFrame = {
    val partial = df.withColumn("_salt", pmod(hash(saltSrc), lit(salts)))
      .groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(sum(col(valueCol)).as("_partial"), count(lit(1)).as("_pn"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as(s"sum_$valueCol"), sum(col("_pn")).as("n"))
  }

  /** Salted equi-join for a skewed BIG side against a smaller side that
    * still exceeds broadcast limits: the big side gets a deterministic
    * salt in [0, salts), the small side is replicated once per salt
    * value, and the join key becomes (key, salt). Result-identical to
    * the plain join; the hot key's rows now land on `salts` reducers. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 bigSaltSrc: Column, salts: Int): DataFrame = {
    val b = big.withColumn("_salt", pmod(hash(bigSaltSrc), lit(salts)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    b.join(s, Seq(key, "_salt")).drop("_salt")
  }
}
