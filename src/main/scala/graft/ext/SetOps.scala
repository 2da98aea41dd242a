package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Set operators (SURVEY §2.7 E1-E3) over the star-schema keys. All three
  * are distinct-semantics set ops → Spark plans hash aggregates / left-anti
  * style joins with partial combine; the key columns are pruned straight
  * out of the parquet scans.
  */
object SetOps {

  /** E1 — union (distinct) of the two nation-key reference sets. */
  def e1Union(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_nationkey").as("nk"))
      .union(Tables.supplier(spark, dir).select(col("s_nationkey").as("nk")))
      .distinct()
      .orderBy(col("nk"))

  /** E2 — intersect: customers that actually placed orders. */
  def e2Intersect(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey").as("k"))
      .intersect(Tables.orders(spark, dir).select(col("o_custkey").as("k")))
      .orderBy(col("k"))
      .limit(200)

  /** E3 — except: customers with no orders. */
  def e3Except(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir).select(col("c_custkey").as("k"))
      .except(Tables.orders(spark, dir).select(col("o_custkey").as("k")))
      .orderBy(col("k"))
      .limit(200)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_union" -> e1Union,
    "e2_intersect" -> e2Intersect,
    "e3_except" -> e3Except
  )

  val oracle: Map[String, String] = Map(
    "e1_union" ->
      """SELECT c_nationkey AS nk FROM customer
        |UNION SELECT s_nationkey FROM supplier ORDER BY nk""".stripMargin,
    "e2_intersect" ->
      """SELECT c_custkey AS k FROM customer
        |INTERSECT SELECT o_custkey FROM orders ORDER BY k LIMIT 200""".stripMargin,
    "e3_except" ->
      """SELECT c_custkey AS k FROM customer
        |EXCEPT SELECT o_custkey FROM orders ORDER BY k LIMIT 200""".stripMargin
  )
}
