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

  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The same bucket as a driver/executor-side JVM function — the
    * per-row twin a codegen expression ([[LmScoreHashed]]) walks with,
    * pinned ≡ [[bucket]] over every corpus token in TextStatsSpec so
    * the three spellings (Column, DuckDB, JVM) can never drift. First
    * 48 bits of MD5 over the token's UTF-8 bytes (what both
    * `md5(tok.cast("binary"))` and DuckDB's `md5(tok)` hash), big-
    * endian — exactly the 12-hex-char prefix the other two parse. */
  def bucketJvm(tok: String, buckets: Int): Int = {
    val d = mdLocal.get().digest(
      tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val v = ((d(0) & 0xffL) << 40) | ((d(1) & 0xffL) << 32) |
      ((d(2) & 0xffL) << 24) | ((d(3) & 0xffL) << 16) |
      ((d(4) & 0xffL) << 8) | (d(5) & 0xffL)
    (v % buckets).toInt
  }
}
