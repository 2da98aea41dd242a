package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection over `documents` — the banded-LSH designs that
  * survive 100 TB: candidate pairs only ever come from equi-joins on small
  * bucket keys (band hash / simhash chunk), never from a cross join. The
  * expensive verify step (exact Jaccard / Hamming) runs only on the
  * candidate set.
  *
  * All stages are DataFrame ops with higher-order functions — shingling,
  * hashing, minhashing and banding are per-row codegen'd expressions, so
  * the pipeline is shuffle-bound (one shuffle to bucket, one to dedup
  * pairs), not CPU-bound.
  */
object Dedup {

  private val MersennePrime = 2147483647L // 2^31 - 1

  /** Deterministic (a,b) permutation parameters for the minhash family
    * h_i(x) = (a_i * x + b_i) mod p. Fixed seed → reproducible. */
  private[ext] def perms(k: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(k)((math.abs(rnd.nextLong()) % (MersennePrime - 1) + 1,
      math.abs(rnd.nextLong()) % MersennePrime))
  }

  /** docs → (doc_id, distinct word-3-gram shingle set + per-shingle hashes). */
  private def shingled(df: DataFrame): DataFrame =
    df.withColumn("words", split(lower(col("text")), " "))
      .filter(size(col("words")) >= 3)
      .withColumn("shingles", expr(
        """array_distinct(transform(sequence(0, size(words) - 3),
          |  i -> concat_ws(' ', slice(words, i + 1, 3))))""".stripMargin))
      .withColumn("sh_hashes",
        expr("transform(shingles, s -> pmod(xxhash64(s), 2147483647))"))

  /** Minhash signature: sig[i] = min over shingle hashes of (a_i*h+b_i) mod p.
    * h < 2^31 and a_i < 2^31 keep a*h below 2^62 — no long overflow. */
  private def withSignature(df: DataFrame, k: Int): DataFrame = {
    val permArr = array(perms(k).map { case (a, b) =>
      struct(lit(a).as("a"), lit(b).as("b"))
    }: _*)
    df.withColumn("perms", permArr)
      .withColumn("sig", expr(
        "transform(perms, pr -> array_min(transform(sh_hashes, h -> pmod(pr.a * h + pr.b, 2147483647))))"))
  }

  /** MinHash + banded LSH near-dup pairs: 32-perm signatures in 8 bands of
    * 4; docs sharing any band bucket become candidates; candidates are
    * verified with exact Jaccard over the shingle sets. */
  def minhashPairs(spark: SparkSession, dir: String,
                   bands: Int = 8, rowsPerBand: Int = 4,
                   threshold: Double = 0.4): DataFrame =
    minhashPairsDf(Tables.documents(spark, dir), bands, rowsPerBand, threshold)

  /** Same pipeline over any (doc_id, text) frame — unit-testable on
    * in-memory data. */
  def minhashPairsDf(documents: DataFrame,
                     bands: Int = 8, rowsPerBand: Int = 4,
                     threshold: Double = 0.4): DataFrame = {
    // No cache: at 100 TB the signature frame doesn't fit executor storage
    // anyway (and a cached-but-never-unpersisted frame leaks storage memory
    // across a long-lived session). The verify re-join recomputes only the
    // shingle sets — the 32-perm minhash work runs once, on the band side.
    val docs = withSignature(shingled(documents), bands * rowsPerBand)
      .select(col("doc_id"), col("shingles"), col("sig"))
    // Band shuffle carries ONLY (doc_id, band keys) — never the shingle
    // payload. At 100 TB the payload re-joins by doc_id afterwards, so the
    // wide data moves once, not once per band.
    val banded = docs.select(col("doc_id"),
        explode(expr(
          s"""transform(sequence(0, ${bands - 1}),
             |  b -> struct(b AS band_id,
             |    xxhash64(concat_ws(',', transform(slice(sig, b * $rowsPerBand + 1, $rowsPerBand),
             |      x -> cast(x AS string)))) AS band_key))""".stripMargin)).as("band"))
      .select(col("doc_id"),
        col("band.band_id").as("band_id"), col("band.band_key").as("band_key"))
    val candidates = banded.as("l")
      .join(banded.as("r"), Seq("band_id", "band_key"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    val shingleSets = shingled(documents).select(col("doc_id"), col("shingles"))
    candidates
      .join(shingleSets.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
      .join(shingleSets.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** D3 — MinHash-LSH near-dup pairs (rows-only for the driver; recall vs
    * brute-force Jaccard is asserted in ScalaTest). */
  def d3MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashPairs(spark, dir)

  /** SimHash: 64-bit signature — per distinct-word-hash bit, sum +1/-1
    * weights; signature bit = sign of the sum. Computed by the fused
    * codegen expression [[graft.functions.SimHash64]]: one per-row loop,
    * NO shuffle (the earlier dataflow form exploded every token and
    * shuffled them into a 64-column aggregate — same bits, but the token
    * shuffle dominates at scale). */
  def simhash(df: DataFrame): DataFrame = {
    graft.functions.TextHash.register(df.sparkSession)
    df.select(col("doc_id"),
      call_function("simhash64",
        array_distinct(split(lower(col("text")), " "))).as("simhash"))
  }

  /** D4 — SimHash near-dup pairs: Hamming-LSH via 4×16-bit chunks (two
    * signatures within Hamming distance ≤3 of each other must agree on at
    * least one chunk), exact bit_count(xor) verify on candidates. */
  def d4SimhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val spark0 = spark
    val sh = simhash(Tables.documents(spark0, dir))
    val chunked = sh.select(col("doc_id"), col("simhash"),
        explode(expr(
          """transform(sequence(0, 3),
            |  c -> struct(c AS chunk_id,
            |    shiftright(simhash, c * 16) & 65535 AS chunk_key))""".stripMargin)).as("ch"))
      .select(col("doc_id"), col("simhash"),
        col("ch.chunk_id").as("chunk_id"), col("ch.chunk_key").as("chunk_key"))
    val l = chunked.select(col("chunk_id"), col("chunk_key"),
      col("doc_id").as("id_a"), col("simhash").as("sh_a"))
    val r = chunked.select(col("chunk_id"), col("chunk_key"),
      col("doc_id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("chunk_id", "chunk_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy(col("id_a"), col("id_b"))
  }

  /** D5 — exact n-gram Jaccard on a bounded pair set (the verify kernel in
    * isolation): all pairs within the first 40 docs, word-3-gram Jaccard
    * ≥ 0.2. Bounded driver-side only by doc_id, still executed
    * distributed. Rows-only. */
  def d5NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = shingled(Tables.documents(spark, dir))
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), col("shingles"))
    val l = docs.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val r = docs.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= 0.2)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d3_minhash_lsh" -> d3MinhashLsh,
    "d4_simhash_pairs" -> d4SimhashPairs,
    "d5_ngram_jaccard" -> d5NgramJaccard
  )

  /** d5 is SQL-expressible in DuckDB via list functions — the exact
    * Jaccard verify kernel gets a real oracle; the LSH pipelines are
    * engine-specific and stay rows-only. */
  val oracle: Map[String, String] = Map(
    "d5_ngram_jaccard" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    list_distinct(
        |      list_transform(range(len(string_split(lower(text), ' ')) - 2),
        |        i -> array_to_string(string_split(lower(text), ' ')[i + 1 : i + 3], ' '))
        |    ) AS shingles
        |  FROM documents
        |  WHERE doc_id < 40 AND len(string_split(lower(text), ' ')) >= 3)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin
  )
}
