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

  /** E4 — intersectAll/exceptAll, the BAG-semantics twins of E2/E3:
    * multiplicities survive (a key ordering twice intersects twice).
    * Reported as one frame — per-key bag-intersect and bag-except
    * multiplicities between the order and lineitem custkey/orderkey
    * bags — because the multiplicity COUNTS are what distinguish these
    * from E2/E3, and counting makes the oracle exact. Spark plans both
    * as hash aggregates over (key, count) — still partial-combinable,
    * no row-level replication shuffle. */
  def e4BagOps(spark: SparkSession, dir: String): DataFrame = {
    val a = Tables.orders(spark, dir).select(col("o_custkey").as("k"))
    val b = Tables.customer(spark, dir).select(col("c_custkey").as("k"))
      .union(Tables.customer(spark, dir).select(col("c_custkey").as("k"))
        .filter(col("k") % 2 === 0)) // even keys appear twice in the bag
    val ia = a.intersectAll(b).groupBy(col("k")).agg(count(lit(1)).as("n_inter"))
    val ea = a.exceptAll(b).groupBy(col("k")).agg(count(lit(1)).as("n_except"))
    ia.join(ea, Seq("k"), "full_outer")
      .select(col("k"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        coalesce(col("n_except"), lit(0L)).as("n_except"))
      .orderBy(col("k")).limit(200)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_union" -> e1Union,
    "e2_intersect" -> e2Intersect,
    "e3_except" -> e3Except,
    "e4_bag_ops" -> e4BagOps
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
        |EXCEPT SELECT o_custkey FROM orders ORDER BY k LIMIT 200""".stripMargin,
    "e4_bag_ops" ->
      """WITH a AS (SELECT o_custkey AS k FROM orders),
        |b AS (SELECT c_custkey AS k FROM customer
        |      UNION ALL SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0),
        |ia AS (SELECT k, count(*) AS n_inter
        |       FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b)
        |       GROUP BY k),
        |ea AS (SELECT k, count(*) AS n_except
        |       FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
        |       GROUP BY k)
        |SELECT coalesce(ia.k, ea.k) AS k,
        |  coalesce(n_inter, 0) AS n_inter,
        |  coalesce(n_except, 0) AS n_except
        |FROM ia FULL OUTER JOIN ea ON ia.k = ea.k
        |ORDER BY k LIMIT 200""".stripMargin
  )
}
