package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE deterministic id-hash bucket — the single device behind every
  * pure-function-of-id selection (d8 sampling, d11 rebalancing, d16
  * split assignment, d17 token budgeting), done RIGHT for small bucket
  * counts: Knuth's multiplicative hash picks the bucket from the
  * product's HIGH bits (scaled division by 2^32), never `product mod
  * buckets` — the latter is LINEAR modulo the bucket count
  * (2654435761 ≡ 61 mod 100), so any id space with structure mod
  * `buckets` (ids minted as shard + 100·seq by parallel writers) would
  * stripe whole shards into one bucket and silently collapse a 98/1/1
  * split. The `% 100003` pre-reduction bounds the product far inside
  * Long/BIGINT (DuckDB errors on overflow; Spark wraps — either way the
  * engines would diverge). All arithmetic is integer + exact-double
  * (values < 2^53), so DuckDB replays it bit-for-bit via [[sql]] — ONE
  * definition emits both sides, so the Spark column and the oracle
  * can never drift.
  */
object IdHash {
  private val Prime = 100003L
  private val Knuth = 2654435761L
  private val Mod32 = 4294967296L // 2^32

  /** Bucket in [0, buckets) as a Spark column over a long id column. */
  def bucket(id: Column, buckets: Int): Column =
    floor(pmod((id % Prime) * Knuth, lit(Mod32)) *
      lit(buckets.toLong) / lit(Mod32.toDouble)).cast("long")

  /** The same bucket as a DuckDB SQL fragment over `idExpr`
    * ((+2^32) % 2^32 is DuckDB's pmod — its % keeps the sign). */
  def sql(idExpr: String, buckets: Int): String =
    // (idExpr) fully parenthesized: a compound argument like "a + b"
    // must hash the whole expression, not bind % tighter than +
    s"CAST(floor((((((($idExpr) % $Prime) * $Knuth) % $Mod32) + $Mod32) % $Mod32)" +
      s" * $buckets / $Mod32.0) AS BIGINT)"
}
