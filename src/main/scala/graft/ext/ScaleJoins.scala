package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join scale-safety utilities beyond the J1-J6 query surface: explicit
  * skew salting and bucketed co-location. These aren't registered queries
  * (their OUTPUT equals a plain join's — equivalence is asserted in
  * ScaleJoinsSpec); they exist because at 100 TB the difference between a
  * working join and a dead executor is which of these shapes the plan
  * takes.
  */
object ScaleJoins {

  /** Equi inner join with the hot keys of `big` spread over `salts`
    * sub-partitions. AQE's skew-join split handles moderate skew by
    * re-chunking oversized partitions at runtime; explicit salting is for
    * the pathological single-key hotspot (one key's rows exceed an
    * executor) when the matching side is still too large to broadcast:
    * the big side salts each row by its position (partition id + row
    * index via monotonically_increasing_id — deterministic for a given
    * partition layout, including task retries, and NOT content-derived:
    * a hotspot of bit-identical duplicate rows, the common pathological
    * case, still spreads evenly where a row-hash salt would re-collapse
    * it onto one reducer), the small side replicates `salts`×, and the
    * join key becomes (key, salt) — the hotspot lands on `salts`
    * reducers instead of one.
    *
    * Contract: both frames carry `key` under the same name; `small`'s
    * shuffle size grows `salts`× — size salts to the skew factor, not
    * higher. */
  def saltedInnerJoin(big: DataFrame, small: DataFrame,
                      key: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // Collision-free temp name: withColumn silently OVERWRITES an existing
    // column, so a user frame that already carries `__salt` would lose it
    // (and the final drop would delete user data). Probe for a free name
    // in both schemas — CASE-INSENSITIVELY, because the analyzer resolves
    // column names case-insensitively by default, so a user column named
    // `__SALT0` would collide with `__salt0` even though the strings
    // differ.
    val taken = (big.columns ++ small.columns).map(_.toLowerCase).toSet
    val saltCol = Iterator.from(0).map(i => s"__salt$i")
      .find(n => !taken.contains(n)).get
    val b = big.withColumn(saltCol,
      pmod(monotonically_increasing_id(), lit(salts)).cast("int"))
    val s = small.withColumn(saltCol,
      explode(array((0 until salts).map(lit): _*)))
    b.join(s, Seq(key, saltCol)).drop(saltCol)
  }
}
