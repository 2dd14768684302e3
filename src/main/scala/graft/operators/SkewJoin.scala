package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join helpers (SURVEY.md scale mandate: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join split handles most skew at runtime; salting is the
  * explicit fallback when one key dominates so heavily that even split
  * partitions bottleneck, or when AQE is unavailable (e.g. inside a
  * cached/reused exchange). The join RESULT is identical to the plain
  * join — only the shuffle distribution changes.
  */
object SkewJoin {

  /** Salted inner equi-join: the big (skewed) side gets a deterministic
    * salt in [0, salts); the small side is replicated `salts` times; the
    * join key becomes (key, salt), splitting each hot key's rows across
    * `salts` reducers.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    // any row-level attribute works for the salt (result is independent
    // of it); hashing all columns keeps it deterministic for a given row
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(salts)).cast("int"))
    val smallExpanded = small.withColumn("__salt",
      explode(lit((0 until salts).toArray)))
    bigSalted.join(smallExpanded, Seq(key, "__salt")).drop("__salt")
  }
}
