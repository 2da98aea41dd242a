package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** P1+P2 — the reference's cleaning stage (spark_processing/
  * spark_processor.py:83-86): exact full-row dedup followed by IS NOT NULL
  * filters on the critical fields. Both stay fully declarative so Catalyst
  * pushes the null filters into the scan and plans the dedup as a hash
  * aggregate with map-side partial combine (one shuffle on the row hash).
  */
object Clean {

  /** Exact deduplication over all columns (spark_processor.py:83). */
  def dedup(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Drop rows with nulls in any critical field (spark_processor.py:84-86). */
  def requireFields(critical: Seq[String])(df: DataFrame): DataFrame =
    critical.foldLeft(df)((d, c) => d.filter(col(c).isNotNull))

  /** The reference's exact clean stage for air-quality records. */
  def apply(df: DataFrame): DataFrame =
    requireFields(Seq("location", "temp_c", "timestamp"))(dedup(df))
}
