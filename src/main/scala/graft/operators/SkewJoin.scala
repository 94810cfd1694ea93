package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins.
  *
  * AQE's skew-join split (on by default) handles most runtime skew; the
  * explicit salted join below is for the extreme cases AQE can't fix —
  * one key holding a double-digit percentage of a 100 TB fact table —
  * where the *map side* must already spread the key across reducers.
  */
object SkewJoin {

  /** Inner equi-join with the large side salted into `salts` buckets
    * and the small side replicated `salts` times: each hot key spreads
    * over `salts` reducers instead of one. Result is exactly the plain
    * inner join on `key` (every large-side row meets the full set of
    * matching small-side rows at its own salt value).
    */
  def salted(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltCol = "__graft_salt"
    val saltedLarge = large
      .withColumn(saltCol, (rand(seed = 42) * salts).cast("int"))
    val replicatedSmall = small
      .withColumn(saltCol, explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(replicatedSmall, Seq(key, saltCol)).drop(saltCol)
  }
}
