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

  /** The same bucket as driver-side Scala over a NON-NEGATIVE long id —
    * for literal-basis builders (sim19's sign matrix) that evaluate the
    * hash at plan-build time instead of per row. Arithmetic mirrors
    * [[bucket]] term for term (pmod of a non-negative product is plain
    * %; the scaled division is the same exact-double op). */
  def bucketLong(id: Long, buckets: Int): Long = {
    val h = ((id % Prime) * Knuth) % Mod32
    math.floor(h * buckets / Mod32.toDouble).toLong
  }

  /** The same bucket as a DuckDB SQL fragment over `idExpr`
    * ((+2^32) % 2^32 is DuckDB's pmod — its % keeps the sign). */
  def sql(idExpr: String, buckets: Int): String =
    // (idExpr) fully parenthesized: a compound argument like "a + b"
    // must hash the whole expression, not bind % tighter than +
    s"CAST(floor((((((($idExpr) % $Prime) * $Knuth) % $Mod32) + $Mod32) % $Mod32)" +
      s" * $buckets / $Mod32.0) AS BIGINT)"

  // --- Wide-period variant (advisor r16, a43) ---------------------
  // [[bucket]]'s `% 100003` pre-reduction caps the draw space at
  // 100003 residues — fine for its consumers (split/sample/budget
  // rates, where ids 100003 apart landing in the same bucket is
  // harmless), but WRONG for a resampling statistic: a43's bootstrap
  // draws one weight per (event, replica) key, and under the cap two
  // events whose ids differ by 100003 would share their ENTIRE weight
  // sequence across all replicas — structurally correlated replicas,
  // a silently invalid CI once a type holds ≳10^5 events. The wide
  // mix below lets the FULL 63-bit key participate: the key splits
  // into three 21-bit limbs (exact `%`/integer-division arithmetic —
  // every intermediate ≤ 3·(2^21·2^32) < 2^63, so BIGINT-exact in
  // both engines, and h < 2^32 keeps the final scaled division
  // double-exact), each limb multiplied by its own odd constant
  // (Knuth's multiplier + the two xxhash64 primes) and summed mod
  // 2^32. Keys must be NON-NEGATIVE (a43's event_id·B + b is), so
  // `%`/`div` agree across engines without sign gymnastics.
  private val Limb = 2097152L            // 2^21
  private val Limb2 = Limb * Limb        // 2^42
  private val K2 = 2246822519L           // xxhash64 prime 2
  private val K3 = 3266489917L           // xxhash64 prime 3

  /** Wide-period bucket in [0, buckets) over a NON-NEGATIVE long id
    * column — the resampling-grade variant of [[bucket]]. */
  def wideBucket(id: Column, buckets: Int): Column = {
    // limbs via bit shifts, NOT `/` (Column./ is double division,
    // inexact past 2^53) — for non-negative keys >>21/>>42 ARE the
    // integer divisions the SQL fragment spells with `//`
    val lo = id % Limb
    val hi = shiftright(id, 21) % Limb
    val top = shiftright(id, 42) % Limb
    floor(pmod(lo * Knuth + hi * K2 + top * K3, lit(Mod32)) *
      lit(buckets.toLong) / lit(Mod32.toDouble)).cast("long")
  }

  /** The same wide bucket as a DuckDB SQL fragment (` // ` is DuckDB
    * integer division; the SQL-parity respeller maps it to `div`). */
  def wideSql(idExpr: String, buckets: Int): String =
    s"CAST(floor((((($idExpr) % $Limb) * $Knuth" +
      s" + ((($idExpr) // $Limb) % $Limb) * $K2" +
      s" + ((($idExpr) // $Limb2) % $Limb) * $K3) % $Mod32)" +
      s" * $buckets / $Mod32.0) AS BIGINT)"
}
