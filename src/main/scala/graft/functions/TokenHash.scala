package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE hashed-feature bucket — the string-keyed sibling of [[IdHash]]:
  * maps any token to a bucket in [0, buckets) through the first 48 bits
  * of its MD5, so FEATURE tables can be fixed-width (`buckets` rows)
  * instead of vocabulary-width. This is the device that lets d20 score
  * a web-scale corpus with NO vocabulary cap at all: a 10⁹-token vocab
  * collapses to a `buckets`-row count table that is always
  * broadcastable (hashing-trick / DSIR-style featurization; collisions
  * are part of the estimator, not an error).
  *
  * 48 bits (12 hex chars) keeps the value exact in a double AND inside
  * BIGINT in both engines; MD5 is uniform, so unlike structured ids a
  * plain `% buckets` cannot stripe (the reason [[IdHash]] needs the
  * high-bits trick and this does not). One definition emits both the
  * Spark column and the DuckDB fragment so the two sides can never
  * drift — same contract as [[IdHash.sql]].
  */
object TokenHash {
  /** Bucket in [0, buckets) as a Spark column over a string column. */
  def bucket(tok: Column, buckets: Int): Column =
    (conv(substring(md5(tok.cast("binary")), 1, 12), 16, 10)
      .cast("long") % buckets).cast("int")

  /** The same bucket as a DuckDB SQL fragment over `tokExpr`. */
  def sql(tokExpr: String, buckets: Int): String =
    s"CAST(CAST(concat('0x', substr(md5($tokExpr), 1, 12)) AS BIGINT)" +
      s" % $buckets AS INT)"
}
