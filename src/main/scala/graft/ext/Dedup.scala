package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection over `documents` — the banded-LSH designs that
  * survive 100 TB: candidate pairs only ever come from equi-joins on small
  * bucket keys (band hash / simhash chunk), never from a cross join. The
  * expensive verify step (exact Jaccard / Hamming) runs only on the
  * candidate set.
  *
  * All stages are per-row DataFrame ops: shingling/hashing use built-in
  * higher-order functions (O(words) per doc), and the hot minhash+band
  * step is the fused codegen expression [[graft.functions.MinHashBands]]
  * (O(k × shingles) tight JIT'd loop, not interpreted lambdas) — so the
  * pipeline is shuffle-bound (one shuffle to bucket, one to dedup pairs),
  * not CPU-bound.
  */
object Dedup {

  /** docs → (doc_id, distinct word-3-gram shingle set + per-shingle hashes).
    * HOF formulation — kept for d5, whose DuckDB oracle needs the shingle
    * STRINGS; the LSH hot path uses [[hashedDocs]] instead. */
  private def shingled(df: DataFrame): DataFrame =
    df.withColumn("words", split(lower(col("text")), " "))
      .filter(size(col("words")) >= 3)
      .withColumn("shingles", array_distinct(graft.functions.TextGrams.gramsExpr(3)))
      .withColumn("sh_hashes",
        expr("transform(shingles, s -> pmod(xxhash64(s), 2147483647))"))

  /** docs → (doc_id, distinct word-3-gram shingle HASH set) via the fused
    * [[graft.functions.ShingleHashes]] codegen pass — no shingle strings,
    * no intermediate arrays. Short docs (empty hash set) are dropped:
    * they cannot be LSH-banded (degenerate signature) or Jaccard-compared
    * (0/0). */
  private def hashedDocs(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    df.select(col("doc_id"),
        graft.functions.ShingleHashes.shingleHashes(spark, col("text"), 3)
          .as("sh_hashes"))
      .filter(size(col("sh_hashes")) > 0)
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
                     threshold: Double = 0.4): DataFrame =
    minhashPairsUnsorted(documents, bands, rowsPerBand, threshold)
      .orderBy(col("id_a"), col("id_b"))

  /** The pair pipeline WITHOUT the final global sort — the shape to
    * compose with downstream set-consumers (connected components, the
    * dedup anti-join) that don't care about order: a global sort of the
    * pair set is a full range-partition shuffle bought purely for
    * display. */
  def minhashPairsUnsorted(documents: DataFrame,
                           bands: Int = 8, rowsPerBand: Int = 4,
                           threshold: Double = 0.4): DataFrame = {
    // No cache: at 100 TB the signature frame doesn't fit executor storage
    // anyway (and a cached-but-never-unpersisted frame leaks storage memory
    // across a long-lived session). The verify re-join recomputes only the
    // shingle sets — the k-perm minhash work runs once, on the band side.
    //
    // Minhashing + banding is ONE fused codegen loop (MinHashBands): per
    // doc, the k permutation minima fold straight into `bands` 64-bit
    // bucket keys — no interpreted lambda per (perm × shingle), no
    // intermediate signature column. The band shuffle then carries ONLY
    // (doc_id, band_key) — never the shingle payload; the wide data
    // re-joins by doc_id for the verify step, so it moves once, not once
    // per band.
    val banded = bandedDocs(documents, bands, rowsPerBand)
    val candidates = banded.as("l")
      .join(banded.as("r"), Seq("band_id", "band_key"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    jaccardVerify(candidates, documents, threshold)
  }

  /** (doc_id, band_id, band_key) rows for the banded-LSH candidate join —
    * THE banding step, shared by the self-join (d3) and bipartite (d15)
    * pipelines so the two can never band differently. `oph = true`
    * swaps the k-permutation kernel for one-permutation hashing
    * ([[graft.functions.MinHashBandsOph]]): O(1) per shingle instead of
    * O(k) — the right default when shingle counts comfortably exceed
    * bands×rowsPerBand (real web documents), measured ~0 recall loss
    * there (DedupSpec parity test) and a large CPU win on the banding
    * pass, which is where a 100 TB dedup spends its cycles. */
  private def bandedDocs(documents: DataFrame,
                         bands: Int, rowsPerBand: Int,
                         oph: Boolean = false): DataFrame = {
    val spark = documents.sparkSession
    val bandsCol =
      if (oph) graft.functions.MinHashOph.minhashBandsOph(spark,
        col("sh_hashes"), bands, rowsPerBand)
      else graft.functions.MinHash.minhashBands(spark,
        col("sh_hashes"), bands, rowsPerBand)
    hashedDocs(documents)
      .select(col("doc_id"),
        posexplode(bandsCol).as(Seq("band_id", "band_key")))
  }

  /** [[minhashPairsUnsorted]] with OPH banding — identical candidate
    * join and exact-Jaccard verify (so precision is identical by
    * construction; only candidate RECALL can differ, and only when a
    * true pair never shares a band). */
  def minhashPairsOphDf(documents: DataFrame,
                        bands: Int = 8, rowsPerBand: Int = 4,
                        threshold: Double = 0.4): DataFrame = {
    val banded = bandedDocs(documents, bands, rowsPerBand, oph = true)
    val candidates = banded.as("l")
      .join(banded.as("r"), Seq("band_id", "band_key"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    jaccardVerify(candidates, documents, threshold)
  }

  /** Verify candidate (id_a, id_b) pairs with exact Jaccard over the
    * shingle HASH sets — set identity up to 2^31 hash collisions
    * (~1e-5 per overlapping pair), standard for minhash dedup, and
    * long-array intersects beat string-array intersects by the length
    * of the shingle text. Shared verify kernel for every banded-LSH
    * caller. */
  private def jaccardVerify(candidates: DataFrame, documents: DataFrame,
                            threshold: Double): DataFrame = {
    val hashSets = hashedDocs(documents)
    jaccardVerifySets(candidates, hashSets, hashSets, threshold)
  }

  /** Same verify with the two sides' (doc_id, sh_hashes) frames supplied
    * separately — the incremental path reads the index side from a
    * persisted hash table instead of recomputing it. */
  private def jaccardVerifySets(candidates: DataFrame,
                                setsA: DataFrame, setsB: DataFrame,
                                threshold: Double): DataFrame =
    candidates
      .join(setsA.select(col("doc_id").as("id_a"), col("sh_hashes").as("sh_a")), Seq("id_a"))
      .join(setsB.select(col("doc_id").as("id_b"), col("sh_hashes").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Fuzzy benchmark decontamination — d10's exact n-gram rule catches
    * verbatim eval leaks; this catches PARAPHRASED ones: a training doc
    * is contaminated if it is a MinHash near-duplicate (banded-LSH
    * candidates, exact-Jaccard verify) of ANY doc in the (separate)
    * `bench` frame — same two-frame contract as
    * [[graft.ext.Curate.decontaminateDf]], so a caller with a real
    * eval-suite corpus can run both passes. BIPARTITE by construction:
    * both frames band into the same key space and candidates come from
    * the train↔bench band equi-join — never a |train|×|bench| product,
    * and train↔train near-dups (d3's business) never enter the verify.
    * doc_ids must be unique ACROSS the two frames (they key the verify
    * re-join). Returns per-source counts over both frames — bench-only
    * sources appear with n_train = 0, so a reader can tell "fully held
    * out" apart from "missing from the corpus". */
  def fuzzyDecontaminateDf(train: DataFrame, bench: DataFrame,
                           bands: Int = 8, rowsPerBand: Int = 4,
                           threshold: Double = 0.4): DataFrame = {
    val candidates = bandedDocs(train, bands, rowsPerBand).as("l")
      .join(bandedDocs(bench, bands, rowsPerBand).as("r"),
        Seq("band_id", "band_key"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))
      .distinct()
    val corpus = train.select(col("doc_id"), col("text"))
      .unionByName(bench.select(col("doc_id"), col("text")))
    val flagged = jaccardVerify(candidates, corpus, threshold)
      .select(col("id_a").as("doc_id")).distinct()
    // `f` marks contaminated docs; flagged ids are train-side only by
    // construction, so count(f) is the per-source contaminated count.
    train.select(col("doc_id"), col("source"), lit(true).as("is_train"))
      .unionByName(
        bench.select(col("doc_id"), col("source"), lit(false).as("is_train")))
      .join(flagged.withColumn("f", lit(1)), Seq("doc_id"), "left")
      .groupBy(col("source")).agg(
        sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
        count(col("f")).as("n_contaminated"))
      .orderBy(col("source"))
  }

  /** D15 — the registered harness shape: the benchmark split is the
    * id-mod slice of the one testdata corpus (same rule and shared
    * constant as d10). VALUE-oracled like d7/d18: the per-source counts
    * are pure threshold decisions (Jaccard >= 0.4 against any bench
    * doc), which DuckDB replays directly on the bimodal corpus —
    * bipartite semantics additionally asserted in DedupSpec. */
  def d15FuzzyDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val isBench = col("doc_id") % Curate.BenchMod === 0
    fuzzyDecontaminateDf(docs.filter(!isBench), docs.filter(isBench))
  }

  /** D3 — MinHash-LSH near-dup pairs (rows-only for the driver; recall vs
    * brute-force Jaccard is asserted in ScalaTest). */
  def d3MinhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashPairs(spark, dir)

  /** SimHash: 64-bit signature — per distinct-word-hash bit, sum +1/-1
    * weights; signature bit = sign of the sum. Computed by the fused
    * codegen expression [[graft.functions.SimHashText]] straight from the
    * text: one per-row loop, no token-array materialization, NO shuffle
    * (the earlier dataflow form exploded every token and shuffled them
    * into a 64-column aggregate — same bits, but the token shuffle
    * dominates at scale). */
  def simhash(df: DataFrame): DataFrame = {
    graft.functions.TextHash.register(df.sparkSession)
    df.select(col("doc_id"),
      call_function("simhash64_text", col("text")).as("simhash"))
  }

  /** Memoized per-(session, dir) documents row count — sizing
    * [[blocksFor]] needs |corpus| but must not pay a count() job per
    * query invocation. Same immutability contract as
    * `Similarity.corpusSize`; refreshed by
    * [[graft.ext.Similarity.invalidateCaches]]. Weak session keys: a
    * stopped session's entries become collectable. */
  private val docCountCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Long]]()
  private[graft] def docsCount(spark: SparkSession, dir: String): Long =
    Similarity.perSession(docCountCache, spark)
      .getOrElseUpdate(dir, Tables.documents(spark, dir).count())
  private[ext] def invalidateCaches(spark: SparkSession): Unit = {
    docCountCache.synchronized(docCountCache.remove(spark))
    bandIndexCache.synchronized(bandIndexCache.remove(spark))
    d49Cache.synchronized(d49Cache.remove(spark))
  }

  /** Block boundaries for a b-block decomposition of the 64-bit
    * signature: (shift, width) per block, widths differing by at most
    * one bit. */
  private[ext] def blockBounds(b: Int): Seq[(Int, Int)] = {
    val base = 64 / b
    val rem = 64 % b
    var off = 0
    (0 until b).map { i =>
      val w = base + (if (i < rem) 1 else 0)
      val out = (off, w)
      off += w
      out
    }
  }

  /** Block count sized to the corpus — the Hamming analog of
    * `Similarity.planesFor`. Joining on every (b−d)-block agreement key
    * finds EXACTLY the pairs within Hamming distance d for ANY b ≥ d+1
    * (d differing bits can touch at most d blocks, so some d-block
    * complement agrees bit-for-bit — the block-permutation trick of
    * Manku et al., WWW'07 §3), so b is a pure performance knob: C(b, d)
    * join tables, but a key of ~64·(b−d)/b bits. A FIXED b=4 caps the
    * key space at 2^16 buckets regardless of corpus size — expected
    * candidates O(N²/2^16), quadratic asymptotically; growing b keeps
    * the per-table candidate count linear in N. Chooses the smallest b
    * (≤ 8; 40-bit keys ≈ 10^12 buckets, past any realistic corpus)
    * whose WORST key (the d-block complement with the fewest bits)
    * still gives ≥ 16 buckets per expected row under a uniform-bits
    * model. */
  private[graft] def blocksFor(n: Long, maxHamming: Int = 3): Int =
    (maxHamming + 1 to 8).find { b =>
      val keyBits =
        blockBounds(b).map(_._2).sorted.take(b - maxHamming).sum
      keyBits >= 62 || n.toDouble * 16 <= math.pow(2.0, keyBits)
    }.getOrElse(8)

  /** The C(b, b−d) agreement keys for one signature, in a fixed combo
    * order (array position = combo id): each key packs the bits of one
    * (b−d)-subset of blocks into a long. Arithmetic shift then mask, so
    * the sign bit can't smear across a block. */
  private[graft] def comboKeys(simhash: Column, blocks: Int,
                               maxHamming: Int): Column = {
    val bounds = blockBounds(blocks)
    val combos = (0 until blocks).combinations(blocks - maxHamming).toSeq
    array(combos.map { combo =>
      var packed = 0
      var key: Column = lit(0L)
      combo.foreach { i =>
        val (sh, w) = bounds(i)
        val block = shiftright(simhash, sh).bitwiseAND(lit((1L << w) - 1L))
        key = key.bitwiseOR(shiftleft(block, packed))
        packed += w
      }
      key
    }: _*)
  }

  /** D4 — SimHash near-dup pairs: Hamming-LSH via b-block agreement
    * keys (signatures within Hamming distance ≤ maxHamming must agree
    * exactly on some (b−maxHamming)-block subset), exact
    * bit_count(xor) verify on candidates. The pair set is
    * b-INDEPENDENT (asserted in DedupSpec): b only shapes the candidate
    * join. */
  def d4SimhashPairs(spark: SparkSession, dir: String): DataFrame =
    simhashPairsDf(Tables.documents(spark, dir),
      blocks = blocksFor(docsCount(spark, dir)))

  /** Same pipeline over any (doc_id, text) frame — unit-testable, with
    * the block count injectable so specs can pin pair-set invariance
    * across b. */
  def simhashPairsDf(documents: DataFrame, blocks: Int = 4,
                     maxHamming: Int = 3): DataFrame = {
    // Null signatures (null/empty text) drop here rather than riding the
    // explode as C(b,d) null-key rows the join would discard anyway.
    val sh = simhash(documents).filter(col("simhash").isNotNull)
    hammingPairs(sh, "simhash", blocks, maxHamming)
  }

  /** The Hamming-LSH pair kernel over ANY (doc_id, <sigCol>: long)
    * signature frame — shared by d4 (text simhash) and mm5 (media
    * perceptual hash), so every 64-bit-signature near-dup path gets the
    * same corpus-scaled b-block candidate join and the same
    * verify-before-distinct shuffle discipline. */
  private[graft] def hammingPairs(sigs: DataFrame, sigCol: String,
                                  blocks: Int, maxHamming: Int): DataFrame = {
    require(blocks > maxHamming && blocks <= 16,
      s"need maxHamming < blocks <= 16, got blocks=$blocks maxHamming=$maxHamming")
    val keyed = sigs.select(col("doc_id"), col(sigCol).as("sig"),
      posexplode(comboKeys(col(sigCol), blocks, maxHamming))
        .as(Seq("combo_id", "combo_key")))
    val l = keyed.select(col("combo_id"), col("combo_key"),
      col("doc_id").as("id_a"), col("sig").as("sh_a"))
    val r = keyed.select(col("combo_id"), col("combo_key"),
      col("doc_id").as("id_b"), col("sig").as("sh_b"))
    l.join(r, Seq("combo_id", "combo_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(sh_a ^ sh_b)").as("hamming"))
      // Hamming verify BEFORE distinct: the filter is per-row and free,
      // while distinct is a shuffle — shuffling only surviving pairs
      // instead of every key-collision candidate.
      .filter(col("hamming") <= maxHamming)
      .distinct()
      .orderBy(col("id_a"), col("id_b"))
  }

  /** D5 — exact n-gram Jaccard on a bounded pair set (the verify kernel in
    * isolation): all pairs within the first 80 docs, word-3-gram Jaccard
    * ≥ 0.02. The synthetic docs are near-disjoint (max pairwise Jaccard
    * ≈0.03 at sf0.01), so the threshold is set low enough that the DuckDB
    * oracle compares real values — a production run would use ≥0.8 with
    * the same kernel. Bounded driver-side only by doc_id, still executed
    * distributed. */
  def d5NgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val docs = shingled(Tables.documents(spark, dir))
      .filter(col("doc_id") < 80)
      .select(col("doc_id"), col("shingles"))
    val l = docs.select(col("doc_id").as("id_a"), col("shingles").as("sh_a"))
    val r = docs.select(col("doc_id").as("id_b"), col("shingles").as("sh_b"))
    l.crossJoin(r)
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))), 4))
      .filter(col("jaccard") >= 0.02)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** The word-gram size for d19 (5-gram spans) — interpolated into the
    * oracle so both sides move together. */
  private[ext] val D19N = 5

  /** Per-doc duplicated-SPAN statistics: the fraction of a doc's
    * distinct word n-grams that also occur in at least one OTHER doc —
    * the exact-substring-dedup signal (Lee et al. 2022,
    * arXiv:2107.06499, reduced from suffix-array character spans to
    * word n-grams). Where d3/d4 flag whole near-dup DOCUMENTS, this
    * catches boilerplate: templated headers, licence blocks, quoted
    * passages — docs that are globally unique but locally copied.
    * Production trims or drops flagged spans; here each doc gets its
    * accounting row.
    *
    * 100 TB shape: every shuffle carries a 16-hex-char MD5 PREFIX of
    * the gram, never the gram text (the d2 fingerprint device applied
    * to grams), and — decisive for THIS op — every stage survives a
    * pathological gram. d19 is the boilerplate detector, so its input
    * by definition contains grams with corpus-scale df; a count-WINDOW
    * over the fingerprint (the tempting one-scan formulation) puts all
    * df rows of a hot gram in ONE partition that AQE cannot split —
    * the 10⁹-row straggler on exactly the doc the op exists to find.
    * Instead: per-doc n_grams comes straight off the scan (array size,
    * NO shuffle), the duplicated-fingerprint set comes from a
    * map-side-combined aggregate (hot keys collapse per task), and
    * per-doc dup counts come from a left-semi join against it — a join
    * AQE's skew handling CAN split. Nothing here has an unsplittable
    * hot partition. */
  def dupSpanStats(docs: DataFrame, n: Int = D19N): DataFrame = {
    def gramsOf(d: DataFrame) = d
      .withColumn("words", split(lower(col("text")), " "))
      .filter(size(col("words")) >= n)
      .withColumn("grams", array_distinct(graft.functions.TextGrams.gramsExpr(n)))
    def fp(gram: Column) = substring(md5(gram.cast("binary")), 1, 16)
    val exploded = gramsOf(docs)
      .select(col("doc_id"), col("source"), col("grams"))
      .select(col("doc_id"), col("source"),
        explode(col("grams")).as("gram"))
      .select(col("doc_id"), col("source"), fp(col("gram")).as("fp"))
    // duplicated-fp set: partial aggregation bounds a hot fp to one row
    // per map task; typically far smaller than the full df table
    val dupFps = exploded.groupBy(col("fp"))
      .agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") >= 2).select(col("fp"))
    val dupCounts = exploded
      .join(dupFps, Seq("fp"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup_grams"))
    gramsOf(docs)
      .select(col("doc_id"), col("source"),
        size(col("grams")).cast("long").as("n_grams"))
      .join(dupCounts, Seq("doc_id"), "left")
      .withColumn("n_dup_grams", coalesce(col("n_dup_grams"), lit(0L)))
      .withColumn("dup_frac",
        col("n_dup_grams").cast("double") / col("n_grams"))
  }

  /** D19 — registered duplicated-span report: per source, the doc count
    * (docs long enough to carry an n-gram), mean duplicated fraction,
    * and how many docs are ≥ half duplicated material. The 0.5 compare
    * is on an EXACT small-int ratio (k/m in double), so it cannot
    * diverge between engines the way a libm-product threshold could. */
  def d19DupSpans(spark: SparkSession, dir: String): DataFrame =
    dupSpanStats(Tables.documents(spark, dir))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("dup_frac")), 4).as("avg_dup_frac"),
        sum(when(col("dup_frac") >= 0.5, 1L).otherwise(0L))
          .as("n_flagged"))
      .orderBy(col("source"))

  /** D45 — the boilerplate-span LEADERBOARD: d19 tells each SOURCE how
    * duplicated its docs are; this answers the editor's follow-up —
    * WHICH spans, verbatim, so the worst offenders can become scrub
    * rules (the c4/FineWeb "most common paragraphs" audit; Lee et al.
    * 2022 §5's repeated-substring inspection). Reports the `topK`
    * n-gram spans appearing in ≥ `minDocs` distinct docs, with doc
    * count and the earliest carrying doc as the example pointer.
    *
    * 100 TB shape, two corpus passes and no full-text shuffle:
    * pass 1 reduces (xxhash64(gram), doc_id) pairs — 16 bytes a row —
    * through a map-side-combined count to the ≥minDocs hash set (the
    * boilerplate slice, orders of magnitude smaller than the gram
    * stream); pass 2 re-derives grams and recovers span TEXT only for
    * hashes in that broadcast set, so text crosses the wire solely for
    * actual boilerplate. At a corpus where even the ≥2-doc set is huge,
    * `minDocs` is the knob — boilerplate worth scrubbing repeats
    * thousands of times, not twice. Span identity is (64-bit hash,
    * byte length) — the length rides beside the hash for ~4 bytes a
    * row and cuts collision odds to same-length collisions only (the
    * r10 advice; a collision would merge two spans' doc counts), while
    * text still never shuffles; the recovered text is min() over the
    * key's grams, deterministic either way. */
  def boilerplateSpans(docs: DataFrame, n: Int = D19N, minDocs: Long = 2L,
                       topK: Int = 20): DataFrame = {
    val grams = docs
      .withColumn("words", split(lower(col("text")), " "))
      .filter(size(col("words")) >= n)
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.TextGrams.gramsExpr(n)))
          .as("gram"))
    val hot = grams
      .select(xxhash64(col("gram")).as("h"), length(col("gram")).as("hl"),
        col("doc_id"))
      .groupBy(col("h"), col("hl"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc_id"))
      .filter(col("n_docs") >= minDocs)
    grams
      .select(xxhash64(col("gram")).as("h"), length(col("gram")).as("hl"),
        col("gram"))
      .join(broadcast(hot), Seq("h", "hl"))
      .groupBy(col("h"), col("hl"), col("n_docs"), col("first_doc_id"))
      .agg(min(col("gram")).as("span"))
      .select(col("span"), col("n_docs"), col("first_doc_id"))
      .orderBy(col("n_docs").desc, col("span"))
      .limit(topK)
  }

  def d45BoilerplateSpans(spark: SparkSession, dir: String): DataFrame =
    boilerplateSpans(Tables.documents(spark, dir))

  /** Word-window size for d21 segments and the corpus document-frequency
    * at which a segment counts as boilerplate — interpolated into the
    * oracle so both sides move together. */
  private[ext] val D21K = 3
  private[ext] val D21MinDf = 2

  /** Segment-level dedup (CCNet-style line dedup, arXiv:1911.00359 §4.1,
    * reduced from newline-delimited lines to fixed word windows because
    * the corpus is single-line): split each doc into consecutive k-word
    * segments, scrub every segment whose occurrence count across the
    * WHOLE corpus reaches `minDf`, and reassemble the survivors in
    * order. Where d19 FLAGS a doc by its duplicated-span fraction, this
    * is the REPAIR op: the doc survives with the boilerplate cut out.
    *
    * 100 TB shape, same skew discipline as d19: segments shuffle only as
    * 16-hex MD5 fingerprints, never text; the duplicated-fingerprint set
    * comes from a map-side-combined aggregate (a corpus-hot segment
    * collapses to one row per map task, no unsplittable window
    * partition); the per-doc dropped-POSITION sets come from a left-semi
    * join AQE can skew-split. Reassembly re-derives segments from the
    * doc row itself and filters by position with an index-aware HOF —
    * so document text never shuffles at all: the only wide movement is
    * the final doc_id join of the (tiny) dropped-position sets back onto
    * the corpus scan. */
  def scrubSegments(docs: DataFrame, k: Int = D21K,
                    minDf: Int = D21MinDf): DataFrame = {
    val segged = docs
      .filter(col("text").isNotNull)
      .withColumn("words", split(col("text"), " "))
      // integer ceil — (n + k - 1) / k — so the engine arithmetic cannot
      // drift from the oracle's integer division on a double boundary
      .withColumn("segs", expr(
        s"""transform(sequence(0, (size(words) + ${k - 1}) div $k - 1),
           |  i -> array_join(slice(words, i * $k + 1, $k), ' '))""".stripMargin))
    val exploded = segged
      .select(col("doc_id"), posexplode(col("segs")).as(Seq("i", "seg")))
      .select(col("doc_id"), col("i"),
        substring(md5(col("seg").cast("binary")), 1, 16).as("fp"))
    val dupFps = exploded.groupBy(col("fp"))
      .agg(count(lit(1)).as("n")).filter(col("n") >= minDf).select(col("fp"))
    val droppedIdx = exploded.join(dupFps, Seq("fp"), "left_semi")
      .groupBy(col("doc_id")).agg(collect_set(col("i")).as("dropped"))
    segged
      .join(droppedIdx, Seq("doc_id"), "left")
      .withColumn("dropped",
        coalesce(col("dropped"), array().cast("array<int>")))
      .withColumn("kept",
        expr("filter(segs, (s, i) -> NOT array_contains(dropped, i))"))
      .select(col("doc_id"),
        size(col("segs")).cast("long").as("n_segs"),
        (size(col("segs")) - size(col("kept"))).cast("long").as("n_dropped"),
        array_join(col("kept"), " ").as("cleaned_text"))
  }

  /** D21 — registered segment scrub: the cleaned text plus accounting
    * for the first 20 docs (df still computed over the FULL corpus).
    * Fully deterministic, so unlike the LSH tiers this repair op gets a
    * real value-level oracle. */
  def d21SegmentScrub(spark: SparkSession, dir: String): DataFrame =
    scrubSegments(Tables.documents(spark, dir))
      .filter(col("doc_id") < 20)
      .orderBy(col("doc_id"))

  /** Connected components over a near-dup pair graph: every node labeled
    * with its component's minimum id — the canonical representative a
    * dedup pass keeps.
    *
    * SEMANTICS: components are computed over `nodes` ∪ all pair
    * endpoints (connectivity relays through endpoints even if they are
    * missing from `nodes`, and the component minimum may be such an
    * endpoint); the OUTPUT is restricted to `nodes`. Ids are treated as
    * longs — integer id columns are widened, never ClassCast. Both
    * execution paths (driver union-find for small graphs, distributed
    * iteration for large) implement this same contract and are
    * cross-checked in DedupSpec.
    *
    * Large-graph path: min-label propagation with POINTER JUMPING (each
    * round also rewrites label ← label(label)), so remaining chain
    * lengths halve per round and convergence is O(log diameter) — a
    * 2^20-hop chain fits in the default 20-round cap. Each round is two
    * key-partitioned joins plus one cheap aggregate (no driver-side
    * data); `localCheckpoint` truncates the growing iteration lineage so
    * the plan stays O(1) per round. Failure to converge inside `maxIter`
    * throws rather than silently returning a split component. */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
                          maxIter: Int = 20,
                          smallGraphEdges: Long = 100000L): DataFrame =
    // Checkpoint pairs BEFORE the symmetric union: the union embeds its
    // input in both branches, and without the checkpoint the entire
    // upstream pair pipeline (for d6: shingle + cross join + Jaccard)
    // would execute twice in the first edges job.
    connectedComponentsPinned(nodes, pairs.localCheckpoint(true), maxIter,
      smallGraphEdges)

  /** Same iteration over an ALREADY-materialized (checkpointed/cached)
    * pair frame — the entry point for a caller that pinned the pairs for
    * its own reuse ([[dedupedCorpus]]), so the pair set isn't
    * materialized and stored twice.
    *
    * `checkpointEvery` sets the lineage-truncation cadence of the
    * distributed path, the [[graft.ext.Graph.pageRank]] contract:
    * labels are cadence-INVARIANT (identical joins over identical
    * data — only where the plan is cut changes), the convergence sum
    * still runs every round, and un-pinned rounds re-execute their
    * join lineage from the last pin inside the next sum job. Exists
    * for the d12 cadence probe ([[graft.D12CadenceProbe]], r17
    * verdict ask #2); stays at 1 unless a probe shows a gated win. */
  private[ext] def connectedComponentsPinned(nodes: DataFrame, p: DataFrame,
                                             maxIter: Int = 20,
                                             smallGraphEdges: Long = 100000L,
                                             checkpointEvery: Int = 1): DataFrame = {
    // Normalize ids to long up front: both paths then agree on output
    // types, and integer-typed pair frames can't ClassCast in the
    // driver path's Row.getLong.
    val n0 = nodes.select(col("node").cast("long").as("node"))
    val pr = p.select(col("id_a").cast("long").as("id_a"),
      col("id_b").cast("long").as("id_b"))
    val init = n0.select(col("node"), col("node").as("label"))
    // ONE count serves both the trivial-graph fast path (no pairs →
    // every node its own component — the routine CLEAN-corpus case,
    // which must not hit the convergence aggregate: over an empty node
    // frame it is null) and the size dispatch below. p is already
    // materialized, so the count is a block-local pass, not a recompute.
    val nEdges = p.count()
    if (nEdges == 0) return init
    // SIZE-ADAPTIVE small-graph path — the broadcast-join idea applied to
    // the component problem. The pair graph of a healthy corpus is TINY
    // relative to the corpus (near-dups are the exception), so the
    // routine case is a few thousand edges: solving those with a driver
    // union-find (min-root union ⇒ every root IS its component minimum)
    // costs one bounded collect + one broadcast join, instead of
    // O(log diameter) distributed join rounds whose per-round scheduling
    // dominates at this size. Graphs above the threshold (~a few MB of
    // edge ids) take the iterative path, which scales to any size.
    if (nEdges <= smallGraphEdges) {
      val edges = pr.collect()
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var root = x
        while (parent.getOrElse(root, root) != root) root = parent(root)
        var cur = x // path compression
        while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
        root
      }
      edges.foreach { r =>
        val ra = find(r.getLong(0)); val rb = find(r.getLong(1))
        // min-root union: the smaller id stays root, so after all unions
        // find(n) is exactly the component's minimum id — no second pass
        if (ra < rb) parent(rb) = ra else if (rb < ra) parent(ra) = rb
      }
      val spark = nodes.sparkSession
      import scala.jdk.CollectionConverters._
      val labelRows: java.util.List[org.apache.spark.sql.Row] =
        parent.keys.toSeq.map(n =>
          org.apache.spark.sql.Row(n, find(n)): org.apache.spark.sql.Row).asJava
      val labelDf = spark.createDataFrame(labelRows,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node",
            org.apache.spark.sql.types.LongType, nullable = false),
          org.apache.spark.sql.types.StructField("clabel",
            org.apache.spark.sql.types.LongType, nullable = false))))
      // Non-incident nodes (and incident roots, absent from `parent`)
      // label themselves; the node frame can be arbitrarily large — the
      // broadcast side is bounded by the edge threshold, never by nodes.
      return n0
        .join(broadcast(labelDf), Seq("node"), "left")
        .select(col("node"),
          coalesce(col("clabel"), col("node")).as("label"))
    }
    // The iteration runs over nodes ∪ pair endpoints so connectivity
    // relays through endpoints missing from `nodes` — the same contract
    // as the union-find path; output is restricted back to `nodes` at
    // the end.
    val allNodes = n0
      .union(pr.select(col("id_a").as("node")))
      .union(pr.select(col("id_b").as("node"))).distinct()
    val initAll = allNodes.select(col("node"), col("node").as("label"))
    // edges stays un-checkpointed: per round it's two projections of the
    // already-checkpointed p — cheaper to recompute than to pay another
    // materialization job up front.
    val edges = pr.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pr.select(col("id_b").as("src"), col("id_a").as("dst")))
    // LAZY localCheckpoint fused with the convergence aggregate: ONE
    // helper both truncates lineage and measures convergence, so each
    // round is a single job instead of an eager-materialize job plus an
    // aggregate job. The fusion is load-bearing — a lazy checkpoint is
    // only fully materialized by a FULL-partition action, and sum() is
    // one; keeping checkpoint+sum inside a single helper means no future
    // edit can slip a partial action (take/isEmpty/limit) between them
    // and leave a truncated-lineage frame half-checkpointed.
    //
    // Labels only ever decrease (least of mins), so sum(label) strictly
    // decreases on any change — convergence detection needs no extra
    // join. Decimal sum: immune to Long overflow at any n. Null-safe
    // (empty node set with non-empty pairs): null sum → ZERO.
    def checkpointAndSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val cp = df.localCheckpoint(false)
      val s = Option(
        cp.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
      (cp, s)
    }
    // un-pinned rounds (cadence > 1) still measure convergence — the
    // sum just runs over the growing lineage instead of a fresh pin
    def plainSum(df: DataFrame): (DataFrame, java.math.BigDecimal) =
      (df, Option(
        df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO))
    var (labels, prevSum) = checkpointAndSum(initAll)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("node").as("dst"), col("label")), "dst")
        .groupBy(col("src")).agg(min(col("label")).as("nlabel"))
      val propagated = labels
        .join(neighborMin.withColumnRenamed("src", "node"), Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
      // Pointer jumping: label ← label(label). Labels are node ids, so a
      // self-join resolves each label's own current label, halving the
      // distance to the component minimum every round.
      val jumped = propagated.as("u")
        .join(propagated.select(col("node").as("label"), col("label").as("ll")),
          Seq("label"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("ll"), col("label"))).as("label"))
      // Pointer jumping done — checkpoint + convergence measure in one job.
      val (updated, curSum) =
        if ((i + 1) % checkpointEvery == 0) checkpointAndSum(jumped)
        else plainSum(jumped)
      converged = curSum.compareTo(prevSum) == 0
      prevSum = curSum
      labels = updated
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(component diameter > 2^maxIter?) — raise maxIter")
    // Restrict the (nodes ∪ endpoints) labeling back to the caller's
    // node set — endpoints that were only relays drop out here.
    labels.join(n0, Seq("node"), "left_semi")
  }

  /** Canonical-selection POLICY: production dedup rarely keeps a
    * cluster's minimum id — it keeps the BEST member (longest text,
    * highest quality score, preferred source) and drops the rest.
    * Returns (doc_id, keeper_id): each doc mapped to the member of its
    * duplicate cluster that maximizes `priority` (ties broken toward
    * the smaller id, so the policy is total and rerun-stable).
    *
    * 100 TB shape: the argmax is a map-side-combinable `max_by`
    * aggregate over the (tiny) labeled pair graph — never a per-cluster
    * sort window over the corpus; docs in no pair keep themselves
    * without entering the aggregate at all (the same incident-ids-only
    * discipline as [[dedupedCorpus]]). */
  def keepBest(docs: DataFrame, pairs: DataFrame,
               priority: Column): DataFrame = {
    val p = pairs.localCheckpoint(true)
    val incident = p.select(col("id_a").as("node"))
      .union(p.select(col("id_b").as("node"))).distinct()
    val labeled = connectedComponentsPinned(incident, p)
    val withPrio = labeled.join(
      docs.select(col("doc_id").as("node"), priority.as("prio")), Seq("node"))
    val keepers = withPrio.groupBy(col("label")).agg(
      max_by(col("node"), struct(col("prio"), (-col("node")).as("neg")))
        .as("keeper_id"))
    val clustered = withPrio.join(keepers, Seq("label"))
      .select(col("node").as("doc_id"), col("keeper_id"))
    docs.select(col("doc_id"))
      .join(clustered, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("keeper_id"), col("doc_id")).as("keeper_id"))
  }

  /** D23 — keep-best over the d5/d6 bounded exact-Jaccard graph with
    * priority = text length (the "keep the longest member" heuristic),
    * so DuckDB replays policy AND closure end to end. */
  def d23CanonicalKeep(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") < 80)
    val pairs = pairGraphFor(spark, dir).select(col("id_a"), col("id_b"))
    keepBest(docs, pairs, col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** The dedup END PRODUCT: keep one document per duplicate cluster (the
    * canonical minimum id), drop the rest. Composition of any pair
    * source (minhash/simhash/exact Jaccard) with [[connectedComponents]].
    * The iteration runs ONLY over pair-incident ids — docs in no pair
    * can't be non-singleton, so the (typically tiny) dup graph iterates
    * without dragging the full corpus through every round; the corpus is
    * touched once, by the final anti-join against the drop set. */
  def dedupedCorpus(documents: DataFrame, pairs: DataFrame): DataFrame =
    dedupedCorpusCadence(documents, pairs, checkpointEvery = 1)

  /** [[dedupedCorpus]] with an explicit components checkpoint cadence —
    * the [[graft.D12CadenceProbe]] entry point (r17 verdict ask #2);
    * output is cadence-invariant, only the lineage cut points move. */
  private[graft] def dedupedCorpusCadence(documents: DataFrame,
      pairs: DataFrame, checkpointEvery: Int): DataFrame = {
    // Checkpoint the pair pipeline ONCE before fanning out: `incident`
    // and the component iteration both consume it, and without this the
    // first label materialization would re-execute the entire upstream
    // LSH pipeline a second time just to list the incident nodes. The
    // Pinned entry point skips connectedComponents' own defensive
    // checkpoint — one materialization, one stored copy.
    val p = pairs.localCheckpoint(true)
    val incident = p.select(col("id_a").as("node"))
      .union(p.select(col("id_b").as("node"))).distinct()
    val drop = connectedComponentsPinned(incident, p,
      checkpointEvery = checkpointEvery)
      .filter(col("node") =!= col("label"))
      .select(col("node").as("doc_id"))
    documents.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Cluster-SIZE distribution over a near-dup pair graph: for each
    * component size, how many clusters and docs sit there. The one-page
    * answer to "how duplicated is this corpus?" — a long tail of huge
    * clusters means boilerplate mirrors (act BEFORE training); all-size-1
    * means dedup is a no-op. Two map-side-combinable aggregates over the
    * component labeling; the corpus never re-enters. */
  def clusterSizeHistogram(nodes: DataFrame, pairs: DataFrame): DataFrame =
    connectedComponents(nodes, pairs)
      .groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(
        count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"))
      .orderBy(col("cluster_size"))

  /** D27 — registered histogram over the d5/d6 bounded exact-Jaccard
    * graph, so DuckDB replays closure AND histogram. */
  def d27ClusterSizes(spark: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.documents(spark, dir)
      .filter(col("doc_id") < 80).select(col("doc_id").as("node"))
    val pairs = pairGraphFor(spark, dir).select(col("id_a"), col("id_b"))
    clusterSizeHistogram(nodes, pairs)
  }

  /** D6 — duplicate-cluster resolution over the exact-Jaccard pair graph
    * (d5's bounded window, so DuckDB replays the whole dataflow with a
    * recursive CTE): every doc < 80 mapped to its canonical
    * representative; docs in no pair map to themselves. */
  def d6DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val nodes = Tables.documents(spark, dir)
      .filter(col("doc_id") < 80).select(col("doc_id").as("node"))
    // the memoized pair graph is already checkpointed — Pinned skips
    // connectedComponents' re-materialization
    val pairs = pairGraphFor(spark, dir).select(col("id_a"), col("id_b"))
    connectedComponentsPinned(nodes, pairs)
      .select(col("node").as("doc_id"), col("label").as("canonical_id"))
      .orderBy(col("doc_id"))
  }

  /** D36 — cluster QUALITY audit: for every duplicate cluster (≥ 2
    * members), its size, how many of its possible member pairs the
    * similarity kernel actually observed (edge density), and the
    * min/avg pair Jaccard — the "is this cluster really one document?"
    * check a curator runs BEFORE deleting members. The failure mode it
    * exists to catch is transitive CHAINING: A~B and B~C pull an
    * unrelated A,C into one component; that cluster shows edge density
    * < 1 and a low min Jaccard, while a true duplicate cluster is a
    * clique of high-Jaccard pairs. Runs entirely on the pair graph +
    * label frame (pair-graph-sized, the d23 discipline — the corpus
    * never re-enters); swapping d5's bounded kernel for d3's LSH pairs
    * gives the corpus-scale variant unchanged. */
  def d36ClusterQuality(spark: SparkSession, dir: String): DataFrame =
    clusterQualityDf(d6DedupClusters(spark, dir), pairGraphFor(spark, dir))

  /** The audit kernel over caller-supplied (doc_id, canonical_id) labels
    * and (id_a, id_b, jaccard) pairs — split out so DedupSpec pins the
    * chaining diagnosis on a planted graph. */
  def clusterQualityDf(labels: DataFrame, pairs: DataFrame): DataFrame = {
    val sizes = labels.groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("size"))
    val pairStats = pairs
      .join(labels.withColumnRenamed("doc_id", "id_a"), Seq("id_a"))
      .groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("jaccard")).as("min_jaccard"),
        round(avg(col("jaccard")), 4).as("avg_jaccard"))
    sizes.filter(col("size") >= 2)
      .join(pairStats, Seq("canonical_id"))
      .withColumn("edge_density",
        round(col("n_pairs") * 2.0 / (col("size") * (col("size") - 1)), 4))
      .select(col("canonical_id"), col("size"), col("n_pairs"),
        col("edge_density"), col("min_jaccard"), col("avg_jaccard"))
      .orderBy(col("canonical_id"))
  }

  /** D7 — the full dedup pipeline as the end product a training-data run
    * ships: MinHash-LSH pairs → connected components → keep one doc per
    * cluster, reported as per-source kept/dropped accounting (the
    * number a data curator actually reads off a dedup pass). VALUE-
    * oracled against the exact ">= 0.4 word-3-gram Jaccard" semantics
    * replayed in DuckDB (shingle-join candidates + recursive-CTE
    * closure + min-id keep): LSH banding is the execution strategy, the
    * pair SET is the checked claim — the corpus Jaccard spectrum is
    * bimodal (<= 0.14 / >= 0.8), where 8×4 banding's recall is
    * empirically complete, and any future recall miss fails the oracle
    * loudly instead of shipping an over-kept corpus. The cluster
    * arithmetic is additionally cross-checked in DedupSpec on a planted
    * corpus. */
  def d7DedupedCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val kept = dedupedCorpus(docs,
      minhashPairsUnsorted(docs).select(col("id_a"), col("id_b")))
    val total = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
    val keptN = kept.groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
    total.join(keptN, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_docs") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
      .orderBy(col("source"))
  }

  /** (doc_id, idx_key) band rows with band_id and band_key folded into
    * ONE 64-bit key: a persisted index bucketed by `idx_key` then joins
    * new batches on exactly its bucket column, which is the strongest
    * no-shuffle guarantee Spark's bucketing gives (a multi-column join
    * over a single-column bucketing depends on shuffle-spec
    * compatibility; a single-column equi-join does not). A cross-band
    * hash collision only creates a false CANDIDATE, which the Jaccard
    * verify removes. */
  private def indexKeyed(documents: DataFrame,
                         bands: Int, rowsPerBand: Int): DataFrame =
    bandedDocs(documents, bands, rowsPerBand)
      .select(col("doc_id"),
        xxhash64(col("band_id"), col("band_key")).as("idx_key"))

  /** D18 ingest half — persist a corpus's LSH dedup index as two
    * bucketed catalog tables: `<name>_bands` (doc_id, idx_key) bucketed
    * by idx_key for the candidate join, and `<name>_hashes`
    * (doc_id, sh_hashes) bucketed by doc_id for the Jaccard verify. The
    * banding/hashing shuffle is paid ONCE at ingest; every subsequent
    * batch dedups against the index with no corpus-side shuffle — the
    * daily-crawl production shape (a 100 TB corpus re-bands in the
    * all-pairs design on EVERY ingest; here it never re-bands). */
  def writeBandIndex(documents: DataFrame, name: String, nBuckets: Int = 8,
                     bands: Int = 8, rowsPerBand: Int = 4): Unit = {
    graft.sources.Sources.writeBucketed(
      indexKeyed(documents, bands, rowsPerBand),
      nBuckets, "idx_key", s"${name}_bands")
    graft.sources.Sources.writeBucketed(
      hashedDocs(documents), nBuckets, "doc_id", s"${name}_hashes")
  }

  /** The batch↔index candidate join, pre-verify — exposed for the plan
    * spec, which pins "no Exchange on the index side". */
  private[graft] def incrementalCandidates(batch: DataFrame, indexName: String,
                                           bands: Int, rowsPerBand: Int): DataFrame =
    indexKeyed(batch, bands, rowsPerBand).as("l")
      .join(batch.sparkSession.table(s"${indexName}_bands").as("r"), Seq("idx_key"))
      .select(col("l.doc_id").as("id_a"), col("r.doc_id").as("id_b"))

  /** D18 serve half — near-dup pairs between a NEW batch and the
    * persisted index: batch bands (tiny) equi-join the bucketed index,
    * Jaccard verify reads batch hashes fresh and index hashes from the
    * persisted hash table. Both index-side joins run against bucketed
    * layouts, so the existing corpus is never shuffled — only scanned.
    * doc_ids must be unique across batch and index (they key the
    * verify). */
  def incrementalPairs(batch: DataFrame, indexName: String,
                       bands: Int = 8, rowsPerBand: Int = 4,
                       threshold: Double = 0.4): DataFrame = {
    val spark = batch.sparkSession
    val candidates = incrementalCandidates(batch, indexName, bands, rowsPerBand)
      .distinct()
    val setsA = hashedDocs(batch)
    val setsB = spark.table(s"${indexName}_hashes")
    jaccardVerifySets(candidates, setsA, setsB, threshold)
  }

  /** Memoized per-(session, dir) D18 index registration: the registered
    * harness query must not rebuild the index on every invocation —
    * ingest runs once, serving is the measured path (same memo contract
    * as sim4's IVF index). */
  /** Memoized-per-(session, dir) exact-Jaccard pair graph — d5's bounded
    * kernel materialized ONCE and served to every consumer (d6 closure,
    * d23 keep-best, d27 histogram, d36 quality audit). In production
    * the near-dup pair graph is an ingest artifact computed by the
    * dedup pass and read by every downstream audit — rebuilding it per
    * query would bill the candidate-generation cross product four
    * times. Same memo contract as the IVF/band indexes (immutable dirs,
    * weak session keys); d5's own registered query stays un-memoized —
    * its bench line IS the build cost, these lines are serving. */
  // The cached value is a temp-view NAME (plain String, bandIndexCache's
  // contract), never the DataFrame itself: a cached frame strongly
  // references its SparkSession through QueryExecution, and WeakHashMap
  // VALUES hold strong refs — so a frame-valued entry would pin the
  // weak session key (and the checkpoint blocks) forever, defeating the
  // weak-key contract. The view (and through it the checkpointed plan)
  // lives in the session's own catalog and dies with the session.
  private val pairGraphCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, String]]()
  private[graft] def pairGraphFor(spark: SparkSession, dir: String): DataFrame = {
    val view = Similarity.perSession(pairGraphCache, spark).getOrElseUpdate(dir, {
      val name = "d5pairs_" + Similarity.dirTag(dir)
      d5NgramJaccard(spark, dir).localCheckpoint(true)
        .createOrReplaceTempView(name)
      name
    })
    spark.table(view)
  }

  private val bandIndexCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, String]]()
  private[graft] def bandIndexFor(spark: SparkSession, dir: String): String =
    Similarity.perSession(bandIndexCache, spark).getOrElseUpdate(dir, {
      // Table name derived from the FULL dir (sanitized), not a 32-bit
      // hash: a hash collision between two served dirs would silently
      // dedup one dir's batch against the other's index.
      val name = "d18idx_" + Similarity.dirTag(dir)
      writeBandIndex(
        Tables.documents(spark, dir).filter(col("doc_id") % Curate.BenchMod =!= 0),
        name)
      name
    })

  /** D18 — incremental dedup report: treat the id-mod slice as today's
    * batch (same convention as d10/d15's bench split), dedup it against
    * the persisted index of the REST of the corpus, and report per-source
    * batch size and duplicate count. VALUE-oracled like d7 (band keys
    * are engine-specific, the batch↔rest pair set is not: DuckDB
    * replays the ">= 0.4 Jaccard against the rest of the corpus"
    * predicate directly); batch-vs-index ≡ full-recompute equivalence
    * is additionally pinned in DedupSpec. */
  def d18IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val idx = bandIndexFor(spark, dir)
    val batch = Tables.documents(spark, dir)
      .filter(col("doc_id") % Curate.BenchMod === 0)
    val dup = incrementalPairs(batch, idx)
      .select(col("id_a").as("doc_id")).distinct().withColumn("d", lit(1))
    batch.join(dup, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_batch"), count(col("d")).as("n_dup"))
      .orderBy(col("source"))
  }

  /** Evaluation-slice width for [[d49DedupScorecard]]: ground truth is
    * every pair whose LOWER id falls in the first `D49EvalDocs` ids —
    * slice × corpus, not slice² (the planted dup pairs span distant
    * ids, so a prefix² slice would see an empty truth at sf0.1) and
    * not corpus² (which exists at no scale). O(slice · N): at any
    * corpus size the slice side broadcasts — the d5 verify economics
    * with pair-complete coverage for the audited ids. Shared with the
    * spec's bar pins. */
  private[graft] val D49EvalDocs = 1000L

  /** D49 — dedup-tier candidate-recall scorecard (r13 verdict ask #4):
    * the sim20 device for the LSH dedup family. One card ranking every
    * near-dup candidate generator — d3 MinHash banding, d4 SimHash
    * blocks, mm5 aHash and mm9 pHash through the same Hamming kernel —
    * against its own EXACT brute-force pair set on the audit slice,
    * with the brute truth riding along as the =1.0 sanity row; the
    * go/no-go table a dedup migration reads before trusting candidates
    * from an index instead of a cross join.
    *
    * Two truth geometries, matching what each family actually promises:
    * the Jaccard families (brute = the d5 kernel at d3's 0.4 threshold
    * over the shingle-hash sets) and the Hamming families (brute =
    * all-pairs bit_count ≤ 3 over each family's OWN 64-bit signatures —
    * a signature family can only be asked to find what its signature
    * space contains; the signature's fidelity to pixels/text is each
    * op's separate planted-spec concern). The Hamming rows must score
    * EXACTLY 1.0: (b−3)-of-b block agreement with b > 3 cannot miss a
    * pair at Hamming ≤ 3 (pigeonhole — DedupSpec/MultimodalSpec pin set
    * equality per op, the spec here pins the card's rows). The MinHash
    * row is genuinely probabilistic (catch P = 1−(1−J^r)^b, the
    * S-curve) — its measured recall is the number the card exists to
    * publish, spec-pinned ≥ its documented bar.
    *
    * Scale shape: every SERVED set comes from the registered operating
    * point over the FULL corpus (corpus-scaled bands/blocks — the card
    * measures serving behavior, not a toy re-run) and only the
    * slice-restricted pairs collect (bounded by the slice, not the
    * corpus); the truth cross-joins are slice² — the one place a
    * cartesian is the SPEC, allowlisted like d5's. Rows-only: the card
    * ranks OUR index implementations, no SQL counterpart.
    *
    * The card is an INGEST-TIME AUDIT artifact (a migration computes
    * it once per corpus, then reads it): it publishes through the
    * [[IndexStore]] keyed over documents AND embeddings (r14 verdict
    * ask #2), so the ~49–87 s brute-truth build runs once per corpus
    * FINGERPRINT — every later session, including every future JVM,
    * pays one tiny parquet read. The per-(session, dir) memo below
    * only skips the store round-trip within a session — plain tuples,
    * no frame pinning the weak session key. The bench's
    * `warmState("d49-card")` prices whichever of build/load the store
    * state implies; IndexStoreSpec pins the fresh-session zero-build
    * serve. */
  private val d49Cache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String,
        Seq[(String, Long, Long, Long, Double)]]]()

  def d49DedupScorecard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Similarity.perSession(d49Cache, spark)
      .getOrElseUpdate(dir, {
        // Cross-SESSION persistence (r14 verdict ask #2): the card is
        // a deterministic once-per-corpus audit artifact whose inputs
        // are exactly the fingerprint-keyed tables the IndexStore
        // already versions — so it publishes there too, keyed over
        // BOTH source tables (media derives from documents; the
        // semantic row from embeddings). A fresh JVM serves it with
        // one tiny parquet read instead of re-paying the ~49–87 s
        // brute-truth build; the session memo above only skips the
        // store round-trip.
        val served = IndexStore.loadOrBuild(spark, dir,
          Seq("documents", "embeddings"), "d49card") {
          Seq("card" -> d49Compute(spark, dir).toDF("method",
            "n_true_pairs", "n_served_pairs", "n_hit",
            "candidate_recall"))
        }("card")
        served.select(col("method"), col("n_true_pairs"),
            col("n_served_pairs"), col("n_hit"), col("candidate_recall"))
          .collect().toSeq
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
            r.getLong(3), r.getDouble(4)))
      })
      .toDF("method", "n_true_pairs", "n_served_pairs", "n_hit",
        "candidate_recall")
      .orderBy(col("candidate_recall").desc, col("method"))
  }

  private def d49Compute(spark: SparkSession, dir: String)
      : Seq[(String, Long, Long, Long, Double)] = {
    val docs = Tables.documents(spark, dir)
    val n = docsCount(spark, dir)
    def inSlice = col("id_a") < D49EvalDocs
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.filter(inSlice).select(col("id_a"), col("id_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // Jaccard truth: the d5 verify kernel at d3's threshold, audited
    // slice (broadcast) × full corpus
    val allSets = hashedDocs(docs)
    val jaccTrue = pairSet(
      broadcast(allSets.filter(col("doc_id") < D49EvalDocs)
          .select(col("doc_id").as("id_a"), col("sh_hashes").as("sh_a")))
        .crossJoin(allSets.select(col("doc_id").as("id_b"),
          col("sh_hashes").as("sh_b")))
        .filter(col("id_a") < col("id_b"))
        .filter(size(array_intersect(col("sh_a"), col("sh_b")))
          .cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))) >= 0.4))
    // Hamming truth: every audited pair at distance ≤ 3 in the
    // family's own signature space, same slice × corpus shape
    def hammingTrue(sigs: DataFrame, sigCol: String): Set[(Long, Long)] = {
      val s = sigs.select(col("doc_id"), col(sigCol).as("sig"))
      pairSet(broadcast(s.filter(col("doc_id") < D49EvalDocs)
          .select(col("doc_id").as("id_a"), col("sig").as("sig_a")))
        .crossJoin(s.select(col("doc_id").as("id_b"),
          col("sig").as("sig_b")))
        .filter(col("id_a") < col("id_b"))
        .filter(expr("bit_count(sig_a ^ sig_b)") <= 3))
    }
    val b = blocksFor(n)
    val shSigs = simhash(docs).filter(col("simhash").isNotNull)
    val aSigs = Multimodal.perceptualHash(
      Multimodal.mediaWithPlantedPng(spark, dir), ImageIoDecoder)
    val pSigs = Multimodal.dctPerceptualHash(
      Multimodal.mediaWithPlantedPng(spark, dir), ImageIoDecoder)
    // Semantic truth: round-4 cosine ≥ τ over the SAME planted-union
    // embedding frame d50 serves (slice side broadcasts — O(slice·N)
    // fused flops); served = d50's within-cell pair set. The gap
    // between the two IS the cross-cell loss the SemDeDup paper
    // accepts — the row the d50 docstring promised this card, now
    // measured beside the lexical families instead of assumed.
    val (semAssigned, semCenters, _) = d50Assigned(spark, dir)
    val semE = semAssigned.select(col("vec_id"), col("emb"))
      .localCheckpoint(true)
    val semTrue = pairSet(
      broadcast(semE.filter(col("vec_id") < D49EvalDocs)
          .select(col("vec_id").as("id_a"), col("emb").as("emb_a")))
        .crossJoin(semE.select(col("vec_id").as("id_b"),
          col("emb").as("emb_b")))
        .filter(col("id_a") < col("id_b"))
        // fused codegen cosine (r21) — bit-identical to the HOF form;
        // this slice×corpus truth scan dominated the cold d49 build
        .filter(round(graft.functions.VectorOps.vecCosine(spark,
          col("emb_a"), col("emb_b")), 4) >= D50Tau))
    val semServed = pairSet(
      semDedupParts(semAssigned, semCenters, D50Tau)._1
        .select(col("id_a"), col("id_b")))
    val rows = Seq(
      ("brute_jaccard", jaccTrue, jaccTrue),
      ("minhash_lsh", jaccTrue,
        pairSet(minhashPairsUnsorted(docs))),
      ("simhash", hammingTrue(shSigs, "simhash"),
        pairSet(hammingPairs(shSigs, "simhash", b, 3))),
      ("ahash", hammingTrue(aSigs, "phash"),
        pairSet(hammingPairs(aSigs, "phash", b, 3))),
      ("phash", hammingTrue(pSigs, "phash"),
        pairSet(hammingPairs(pSigs, "phash", b, 3))),
      ("semdedup_cosine", semTrue, semServed))
    rows.map { case (name, truth, served) =>
      val hit = (served & truth).size.toLong
      val recall = if (truth.isEmpty) 1.0
        else BigDecimal(hit.toDouble / truth.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (name, truth.size.toLong, served.size.toLong, hit, recall)
    }
  }

  private[graft] val D50Tau = 0.95

  /** D50 — semantic dedup (SemDeDup, Abbas et al. 2023): near-duplicate
    * removal by EMBEDDING similarity rather than lexical overlap — the
    * pass that catches paraphrases and re-renders d3/d4's n-gram
    * machinery cannot see (same meaning, different words). The
    * published recipe: cluster the embedding space, call two members
    * semantic dups when their cosine clears tau WITHIN a cluster, and
    * keep from each dup group the member FARTHEST from its cluster
    * centroid (the least redundant representative). Clustering is the
    * scale device: candidate pairs form only inside a cell, so the
    * pair stage is O(Σ cellsize²) — never corpus², PROVIDED the cell
    * count grows with the corpus: d50 serves from the CORPUS-SCALED
    * quantizer ([[Similarity.cellsFor]] — k = max(16, N/256), the d12
    * device; r14 verdict ask #1) published through the IndexStore
    * ([[Similarity.ivfIndexFor]] — k-means trained once per corpus
    * fingerprint per k), so cells hold ~256 members at any N and the
    * pair stage stays O(N·256). At both test SFs cellsFor lands on
    * Sim4K, so the served artifact IS sim4's index and the pass adds
    * no second clustering job to the pipeline. Cross-cell near-dups are sacrificed by construction —
    * the paper's own approximation — and that loss is PRICED, not
    * hidden: it is exactly what d49's recall-card discipline measures
    * for the lexical tier (a d50 row there would read the co-celled
    * fraction of true pairs).
    *
    * Keep rule: connected components over the tau graph (pair-incident
    * ids only, the d7 discipline) + [[keepBest]] with priority = LOW
    * centroid similarity; `cent_sim` rounds(4) before the compare so a
    * float-noise tie cannot flip the keeper, and exact ties keep the
    * LOWEST id. */
  private[graft] def semDedupParts(assigned: DataFrame,
      centers: Array[Array[Double]], tau: Double)
      : (DataFrame, DataFrame) = {
    // within-cell candidates through the ONE shared keyed kernel
    // ([[Similarity.keyedNearDupPairs]] — the same cell-join +
    // rounded-threshold + NaN guard d12 rides via
    // [[Curate.cellNearDupPairs]], r14 verdict ask #3: a threshold or
    // kernel edit now cannot drift the two SemDeDup surfaces apart).
    // The equi-join co-partitions both sides on the cell key — each
    // vector rides the shuffle twice, and the pair fan-out happens
    // post-shuffle, bounded by the cell size.
    val pairs = Similarity.keyedNearDupPairs(
        assigned.select(col("cell"), col("vec_id"), col("emb")),
        "cell", tau)
      .select(col("cell"), col("id_a"), col("id_b"))
      .localCheckpoint(true)
    // one folded Literal for the k×d matrix (the ivfAssign note: a
    // CreateArray tree costs k·d plan nodes at cellsFor-scale k)
    val cLit = typedLit(centers.map(_.toSeq).toSeq)
    val prioDocs = assigned.select(col("vec_id").as("doc_id"),
      col("cell"),
      // fused codegen cosine (r21) — same ascending-i sums and division
      // as the zip_with/aggregate HOF it replaces, bit-identical on the
      // equal-dim (emb, centroid) inputs every caller feeds
      round(graft.functions.VectorOps.vecCosine(assigned.sparkSession,
        col("emb"), element_at(cLit, col("cell") + 1)), 4).as("cent_sim"))
    val kept = keepBest(prioDocs,
      pairs.select(col("id_a"), col("id_b")), -col("cent_sim"))
      .join(prioDocs.select(col("doc_id"), col("cell")), Seq("doc_id"))
    (pairs, kept)
  }

  /** The d50 census card: per IVF cell, members / within-cell dup
    * pairs / dropped members / keep rate. */
  def semDedupReport(spark: SparkSession, assigned: DataFrame,
                     centers: Array[Array[Double]],
                     tau: Double = D50Tau): DataFrame = {
    val (pairs, kept) = semDedupParts(assigned, centers, tau)
    assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
      .join(pairs.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_dup_pairs")), Seq("cell"), "left")
      .join(kept.filter(col("doc_id") =!= col("keeper_id"))
        .groupBy(col("cell")).agg(count(lit(1)).as("n_dropped")),
        Seq("cell"), "left")
      .na.fill(0L, Seq("n_dup_pairs", "n_dropped"))
      .withColumn("keep_rate",
        round(lit(1.0) - col("n_dropped") / col("n_members"), 4))
      .orderBy(col("cell"))
  }

  /** The registered query plants the sim23 batch device (every 7th
    * vector re-keyed past max id, scaled 1.02 — cosine with its source
    * exactly 1.0, cosine-to-centroid IDENTICAL because cosine is
    * scale-invariant, so the tie rule visibly keeps the ORIGINAL)
    * because the synthetic corpus has no natural semantic dups (max
    * pairwise cosine 0.60 at sf0.1); a production pass calls
    * [[semDedupReport]] on the corpus index directly. Rows-only:
    * k-means cells have no SQL counterpart; DedupSpec pins the
    * hand-built-cell semantics (farthest-from-centroid keeper, tie →
    * lowest id, cross-cell pair NOT formed) and the planted-copy
    * census at sf0.01. */
  /** The corpus index + the planted scaled-copy batch, separately —
    * d50 unions them; d51 keeps them apart (batch vs served index). */
  private[graft] def d50Parts(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, Array[Array[Double]], Long) = {
    // CORPUS-SCALED quantizer (r14 verdict ask #1): cellsFor keeps the
    // within-cell pair stage O(N · targetCell) as the corpus grows — a
    // constant k would make Σ cellsize² = N²/k, corpus-quadratic at
    // 100×. Same device as d12 (Curate.scala); at both test SFs
    // cellsFor lands exactly on Sim4K, so the served artifact is the
    // SAME published `ivf_k16` index sim4 trains — answers and pins
    // hold bit-identical while the 100× posture becomes real.
    val k = Similarity.cellsFor(Similarity.corpusSize(spark, dir))
    val base = Similarity.ivfIndexFor(spark, dir, k)
    val emb = base.assigned.select(col("vec_id"), col("emb"), col("cell"))
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    val planted = Similarity.ivfAssign(
      emb.filter(col("vec_id") % 7 === 3)
        .select((col("vec_id") + maxId + 1).as("vec_id"),
          transform(col("emb"), x => x * 1.02).as("emb")),
      base.centers)
      .select(col("vec_id"), col("emb"), col("cell"))
    (emb, planted, base.centers, maxId)
  }

  private[graft] def d50Assigned(spark: SparkSession, dir: String)
      : (DataFrame, Array[Array[Double]], Long) = {
    val (corpus, planted, centers, maxId) = d50Parts(spark, dir)
    (corpus.unionByName(planted), centers, maxId)
  }

  def d50SemDedup(spark: SparkSession, dir: String): DataFrame = {
    // sim32 gate (r18 verdict ask #7): semantic dedup DELETES by
    // cosine, which is noise on a collapsed corpus — veto before any
    // cell work (one memoized sketch pass per session)
    Similarity.requireHealthyGeometry(spark, dir, "d50 semantic dedup")
    val (assigned, centers, _) = d50Assigned(spark, dir)
    semDedupReport(spark, assigned, centers)
  }

  /** D51 — INCREMENTAL semantic dedup: d18's daily-crawl discipline
    * lifted to the embedding tier. A new batch assigns to the EXISTING
    * IVF cells (frozen centroids — sim23's maintenance verb) and
    * compares ONLY against the served index members of exactly those
    * cells: per day the work is O(batch · cellsize), and the corpus is
    * never re-clustered, re-scanned pairwise, or re-shuffled — at
    * scale the published `assigned` artifact is stored bucketed by
    * cell (the IvfIndex docstring's layout), so the batch-side shuffle
    * is the only exchange the join needs, exactly d18's zero-index-
    * side-Exchange economics. The keep rule is the incremental one:
    * the corpus member WINS (it is already served); a batch doc with
    * any ≥ τ match is rejected. Because cells are frozen, incremental
    * candidates are EXACTLY the full d50 pair set restricted to
    * batch × corpus — an equality, not an approximation, and the spec
    * pins it as one. */
  /** The frozen-cell SCORED candidate kernel shared by d51 (threshold
    * consumer) and d55 (max-cosine consumer): batch rows equi-join the
    * corpus on the frozen cell key, exact fused cosine on candidates
    * only, rounded(4), NaN (zero-norm) candidates dropped — the same
    * cosine/round/NaN discipline as the d50/d12 pair kernel
    * ([[Similarity.keyedNearDupPairs]]), so neither consumer can drift
    * from the full-corpus pass on a borderline or zero-norm vector. */
  private[graft] def batchCellCosines(batch: DataFrame,
      corpus: DataFrame): DataFrame = {
    val spark = batch.sparkSession
    // The sim27 fan-out treatment (r16 verdict ask #1) on the LARGER
    // side: when the batch is small enough to broadcast, the
    // O(batch·cellsize) cosine fan-out's parallelism falls to the
    // corpus side's file count — and the corpus here is typically a
    // store-served index artifact with few files. One explicit cell
    // exchange pins the fan-out's parallelism to the shuffle
    // partition count; in the sort-merge regime it is absorbed (the
    // join needs hash partitioning on cell anyway).
    batch.select(col("cell"), col("vec_id").as("id_b"),
        col("emb").as("emb_b"))
      .join(corpus.select(col("cell"), col("vec_id").as("id_a"),
        col("emb").as("emb_a")).repartition(col("cell")), Seq("cell"))
      .select(col("cell"), col("id_a"), col("id_b"),
        round(graft.functions.VectorOps.vecCosine(spark,
          col("emb_a"), col("emb_b")), 4).as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
  }

  private[graft] def incrementalSemPairs(batch: DataFrame,
      corpus: DataFrame, tau: Double): DataFrame =
    batchCellCosines(batch, corpus)
      .filter(col("cos_sim") >= tau)
      .select(col("cell"), col("id_a"), col("id_b"))

  def d51IncrementalSemDedup(spark: SparkSession, dir: String): DataFrame = {
    Similarity.requireHealthyGeometry(spark, dir,
      "d51 incremental semantic dedup")
    val (corpus, batch, _, _) = d50Parts(spark, dir)
    val pairs = incrementalSemPairs(batch, corpus, D50Tau)
      .localCheckpoint(true)
    batch.groupBy(col("cell")).agg(count(lit(1)).as("n_batch"))
      .join(corpus.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_index")), Seq("cell"), "left")
      .join(pairs.groupBy(col("cell")).agg(
        count(lit(1)).as("n_matches"),
        count_distinct(col("id_b")).as("n_rejected")),
        Seq("cell"), "left")
      .na.fill(0L, Seq("n_index", "n_matches", "n_rejected"))
      .withColumn("accept_rate",
        round(lit(1.0) - col("n_rejected") / col("n_batch"), 4))
      .orderBy(col("cell"))
  }

  /** D52 — chunk-level CONTAINMENT detection: document pairs sharing a
    * large fraction of content-defined chunk fingerprints — the
    * partial-duplication case whole-document dedup cannot see. A doc
    * quoting half of another is invisible to d2's md5 and scores low
    * Jaccard for d3's whole-doc MinHash (the shared half drowns in the
    * union); Broder 1997 separates resemblance from CONTAINMENT for
    * exactly this case, and CDC chunking (t4's rolling hash) makes the
    * shared passage keep its fingerprints under insertion because
    * boundaries re-align by content.
    *
    * Scale devices: (1) candidates come from a fingerprint EQUI-JOIN
    * (posting lists), never all-pairs; (2) fingerprints appearing in
    * more than `cap` docs are DROPPED before the join — the classic
    * posting-list cap: boilerplate chunks (d45's subject) would
    * otherwise fan out quadratically and claim every doc contains
    * every other. The cap is a RECALL trade priced in the spec (a
    * passage shared by more than `cap` docs stops being containment
    * evidence and starts being boilerplate — exactly d45's
    * definition). Containment = shared / min-side distinct chunks,
    * rounds(4) before the threshold compare. Rows-only: the chunking
    * scheme is engine-specific (the t4 treatment); planted specs pin
    * full-prefix containment, insertion survival, the unrelated-pair
    * zero, and the boilerplate-cap refusal. */
  def d52ChunkContainment(spark: SparkSession, dir: String): DataFrame =
    chunkContainment(Tables.documents(spark, dir))

  private[graft] def chunkContainment(docs: DataFrame, cap: Int = 20,
      threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    val fps = docs.select(col("doc_id"),
        explode(graft.functions.RollingChunks.rollingChunks(
          spark, col("text"), 16, 5)).as("fp"))
      .distinct()
    val sizes = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_chunks"))
    val fpFreq = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
    // pin the capped posting frame: BOTH sides of the self-join read it
    val kept = fps.join(fpFreq.filter(col("df") <= cap), Seq("fp"))
      .select(col("fp"), col("doc_id"))
      .localCheckpoint(true)
    val pairs = kept.select(col("fp"), col("doc_id").as("id_a"))
      .join(kept.select(col("fp"), col("doc_id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("doc_id").as("id_a"),
        col("n_chunks").as("ca")), Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"),
        col("n_chunks").as("cb")), Seq("id_b"))
      .withColumn("containment",
        round(col("shared") / least(col("ca"), col("cb")), 4))
      .filter(col("containment") >= threshold)
      .select(col("id_a"), col("id_b"), col("shared"),
        least(col("ca"), col("cb")).as("smaller_chunks"),
        col("containment"))
      .orderBy(col("containment").desc, col("id_a"), col("id_b"))
  }

  /** D53 — leakage-safe train/val/test split: d16's hash rule applied
    * to each document's DEDUP-COMPONENT representative instead of its
    * own id, so every member of a near-dup group lands on the SAME
    * side. This is the split-time fix for the leak d32 detects after
    * the fact: a train doc's near-copy sitting in val is an eval leak
    * even though the per-doc hash is perfectly deterministic — which
    * is why serious pretraining pipelines dedup ACROSS the split
    * boundary, not within sides. Docs in no near-dup pair keep their
    * own id as representative, so for the singleton majority d53 ≡ d16
    * exactly; group-aware assignment costs only the minority that
    * needs it.
    *
    * The card carries its own argument: per-split doc counts plus the
    * cross-split near-dup pair census under BOTH rules — exactly 0
    * under the group rule BY CONSTRUCTION (both members share a
    * representative, and one input to a pure function gives one
    * output), and the measured nonzero leak the same corpus suffers
    * under the per-doc rule. Components run over pair-incident ids
    * only (the d7 discipline); the corpus is touched once to attach
    * representatives. Rows-only: the pair source is d3's engine-
    * specific LSH (the d50/d52 treatment); the planted spec pins the
    * forced-leak pair, the zero under the group rule, and singleton
    * d53 ≡ d16. */
  def d53LeakSafeSplit(spark: SparkSession, dir: String): DataFrame =
    leakSafeSplit(Tables.documents(spark, dir),
      minhashPairsUnsorted(Tables.documents(spark, dir)))

  private[graft] def leakSafeSplit(docs: DataFrame,
                                   pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("id_a"), col("id_b")).localCheckpoint(true)
    val incident = p.select(col("id_a").as("node"))
      .union(p.select(col("id_b").as("node"))).distinct()
    val labels = connectedComponentsPinned(incident, p)
    val assigned = docs.select(col("doc_id"))
      .join(labels.select(col("node").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        Curate.splitOf(coalesce(col("label"), col("doc_id")))
          .as("split"),
        Curate.splitOf(col("doc_id")).as("split_doc_rule"))
      .localCheckpoint(true)
    val crossed = p
      .join(assigned.select(col("doc_id").as("id_a"),
        col("split").as("sa"), col("split_doc_rule").as("da")), Seq("id_a"))
      .join(assigned.select(col("doc_id").as("id_b"),
        col("split").as("sb"), col("split_doc_rule").as("db")), Seq("id_b"))
      .agg(
        coalesce(sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)),
          lit(0L)).as("leaked_pairs_group_rule"),
        coalesce(sum(when(col("da") =!= col("db"), 1L).otherwise(0L)),
          lit(0L)).as("leaked_pairs_doc_rule"))
    assigned.groupBy(col("split")).agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(crossed))
      .orderBy(col("split"))
  }

  /** D54 — LSH tuning curve: the (r, b) S-curve for the REGISTERED
    * MinHash configuration (8 bands × 4 rows), published as a card. A
    * banded-LSH deployment has exactly two knobs, and their entire
    * effect is the catch probability P(J) = 1 − (1 − J^r)^b plus the
    * threshold J* = (1/b)^(1/r) where the curve crosses ~0.5; teams
    * either derive this table by hand per retune or copy folklore
    * values. The card makes the engine's own operating point
    * inspectable — read beside d49's measured recall, it separates
    * "the family cannot catch J = 0.4 pairs" (this curve) from "the
    * implementation lost pairs it should catch" (d49's job).
    *
    * Pure scalar math over a 19-point literal Jaccard grid — zero
    * table scans, constant at ANY corpus size; the only floats are
    * pow/round with both engines evaluating the same expression
    * shapes. The grid points are i/20 with i integer, so both engines
    * start from identical doubles. */
  def d54LshTuningCurve(spark: SparkSession, dir: String): DataFrame =
    lshTuningCurve(spark, bands = 8, rowsPerBand = 4)

  private[graft] def lshTuningCurve(spark: SparkSession, bands: Int,
                                    rowsPerBand: Int): DataFrame =
    spark.range(1, 20)
      .select((col("id") / 20.0).as("jaccard"))
      .withColumn("p_catch", round(lit(1.0)
        - pow(lit(1.0) - pow(col("jaccard"), lit(rowsPerBand.toDouble)),
          lit(bands.toDouble)), 4))
      .withColumn("threshold",
        round(pow(lit(1.0 / bands), lit(1.0 / rowsPerBand)), 4))
      .withColumn("catches_half", col("p_catch") >= 0.5)
      .orderBy(col("jaccard"))

  /** D55 — SEMANTIC benchmark decontamination (r15 verdict ask #1):
    * the missing embedding-space leg of the decontamination matrix. A
    * PARAPHRASED eval item — same meaning, different words — sails
    * past every lexical leg (d10's exact 4-grams, d15's fuzzy
    * shingles, d35's Bloom pre-filter, d47's per-item containment)
    * because it shares no n-gram with its training source; it is
    * exactly the within-corpus case d50 catches, replayed across the
    * train/bench boundary. The machinery is d51's frozen-cell device
    * VERBATIM: bench embeddings assign to the PUBLISHED IVF cells
    * (frozen centroids — [[Similarity.cellsFor]]-scaled, served
    * through the IndexStore), candidates form only against train
    * members of exactly those cells through the shared scored kernel
    * ([[batchCellCosines]] — the same fused-cosine/round(4)/NaN
    * discipline as d50/d51/d12), and the card reports PER BENCH ITEM
    * the max train cosine plus a contaminated flag at τ =
    * [[D50Tau]]. Per-item (not per-source) because decontamination is
    * actionable per item: the flagged rows ARE the eval questions to
    * drop or re-source.
    *
    * Scale shape: O(bench · cellsize) — the corpus is never
    * re-clustered or re-scanned pairwise, the bench side is the only
    * exchange the cell join needs at the published bucketed layout
    * (d18/d51 economics), and cellsFor keeps cells ~256 members at
    * any N. Because the synthetic corpus has no natural paraphrases
    * (max pairwise cosine 0.60 at sf0.1), the registered query plants
    * the sim23/d50 scaled-copy device on a train subset: every
    * (BenchMod·13)th train vector rides in scaled ×1.02 and re-keyed
    * past max id — cosine with its source exactly 1.0 (scale
    * invariance), so the τ rule visibly fires where a gram rule on a
    * reworded text would not (DedupSpec pins that contrast
    * explicitly). Rows-only: k-means cells have no SQL form (the
    * d50/d51 treatment). */
  def d55SemDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    Similarity.requireHealthyGeometry(spark, dir,
      "d55 semantic decontamination")
    val k = Similarity.cellsFor(Similarity.corpusSize(spark, dir))
    val base = Similarity.ivfIndexFor(spark, dir, k)
    val emb = base.assigned.select(col("vec_id"), col("emb"), col("cell"))
    val isBench = col("vec_id") % Curate.BenchMod === 0
    val train = emb.filter(!isBench)
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    // planted paraphrases: scaled copies of a sparse train subset,
    // re-keyed past max id and assigned to the FROZEN cells (never
    // re-trained) — the d50 planting discipline at the d51 boundary
    val planted = Similarity.ivfAssign(
      train.filter(col("vec_id") % (Curate.BenchMod * 13) === 5)
        .select((col("vec_id") + maxId + 1).as("vec_id"),
          transform(col("emb"), x => x * 1.02).as("emb")),
      base.centers)
      .select(col("vec_id"), col("emb"), col("cell"))
    val bench = emb.filter(isBench).unionByName(planted)
    semDecontaminate(bench, train, maxId)
  }

  /** The d55 kernel on explicit frames (unit-testable with hand-built
    * cells): per bench item, max train cosine within its frozen cell +
    * the contaminated flag at `tau`. Items whose cells hold no train
    * member (or only NaN candidates) report NULL max and FALSE flag —
    * nothing to compare against is clean, not an error. */
  private[graft] def semDecontaminate(bench: DataFrame, train: DataFrame,
      plantedAboveId: Long, tau: Double = D50Tau): DataFrame = {
    val scored = batchCellCosines(bench, train)
      .groupBy(col("id_b").as("bench_id"))
      .agg(max(col("cos_sim")).as("max_train_cos"))
    bench.select(col("vec_id").as("bench_id"), col("cell"),
        (col("vec_id") > plantedAboveId).as("planted"))
      .join(scored, Seq("bench_id"), "left")
      .withColumn("contaminated",
        coalesce(col("max_train_cos") >= tau, lit(false)))
      .orderBy(col("max_train_cos").desc_nulls_last, col("bench_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d55_sem_decontaminate" -> d55SemDecontaminate,
    "d54_lsh_tuning_curve" -> d54LshTuningCurve,
    "d53_leak_safe_split" -> d53LeakSafeSplit,
    "d52_chunk_containment" -> d52ChunkContainment,
    "d49_dedup_scorecard" -> d49DedupScorecard,
    "d50_semdedup" -> d50SemDedup,
    "d51_incremental_semdedup" -> d51IncrementalSemDedup,
    "d3_minhash_lsh" -> d3MinhashLsh,
    "d4_simhash_pairs" -> d4SimhashPairs,
    "d5_ngram_jaccard" -> d5NgramJaccard,
    "d6_dedup_clusters" -> d6DedupClusters,
    "d7_deduped_corpus" -> d7DedupedCorpus,
    "d15_fuzzy_decontaminate" -> d15FuzzyDecontaminate,
    "d18_incremental_dedup" -> d18IncrementalDedup,
    "d19_dup_spans" -> d19DupSpans,
    "d45_boilerplate_spans" -> d45BoilerplateSpans,
    "d21_segment_scrub" -> d21SegmentScrub,
    "d23_canonical_keep" -> d23CanonicalKeep,
    "d27_cluster_sizes" -> d27ClusterSizes,
    "d36_cluster_quality" -> d36ClusterQuality
  )

  /** Shared oracle fragment: the d5 shingle CTE + pair predicate. ONE
    * definition interpolated into both d5 and d6, so a threshold or
    * window change cannot drift the two oracles apart. */
  private val shingleCte =
    """s AS (
      |  SELECT doc_id,
      |    list_distinct(
      |      list_transform(range(len(string_split(lower(text), ' ')) - 2),
      |        i -> array_to_string(string_split(lower(text), ' ')[i + 1 : i + 3], ' '))
      |    ) AS shingles
      |  FROM documents
      |  WHERE doc_id < 80 AND len(string_split(lower(text), ' ')) >= 3)""".stripMargin

  private val pairPredicate =
    """FROM s a JOIN s b ON a.doc_id < b.doc_id
      |WHERE round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |    len(list_distinct(list_concat(a.shingles, b.shingles))), 4) >= 0.02""".stripMargin

  /** d5/d6 are SQL-expressible in DuckDB (list functions + a recursive
    * CTE for the closure) — the exact kernels get real oracles; the LSH
    * pipelines are engine-specific and stay rows-only. */
  val oracle: Map[String, String] = Map(
    // d54: same i/20 grid, same pow/round expression shapes — the
    // interpolated (bands, rows) constants come from ONE Scala source
    "d54_lsh_tuning_curve" ->
      """SELECT i / 20.0 AS jaccard,
        |  round(1.0 - pow(1.0 - pow(i / 20.0, 4.0), 8.0), 4) AS p_catch,
        |  round(pow(1.0 / 8.0, 1.0 / 4.0), 4) AS threshold,
        |  round(1.0 - pow(1.0 - pow(i / 20.0, 4.0), 8.0), 4) >= 0.5
        |    AS catches_half
        |FROM generate_series(1, 19) t(i)
        |ORDER BY jaccard""".stripMargin,
    "d21_segment_scrub" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        |segs AS (
        |  SELECT doc_id, i,
        |    array_to_string(words[i*$D21K+1 : i*$D21K+$D21K], ' ') AS seg
        |  FROM w, LATERAL (SELECT unnest(
        |    range((len(words)+${D21K - 1})//$D21K)) AS i)),
        |fps AS (SELECT doc_id, i, seg, substr(md5(seg), 1, 16) AS fp FROM segs),
        |dup AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) >= $D21MinDf),
        |kept AS (SELECT f.doc_id, f.i, f.seg, (d.fp IS NOT NULL) AS dropped
        |         FROM fps f LEFT JOIN dup d USING (fp))
        |SELECT doc_id,
        |  count(*) AS n_segs,
        |  CAST(sum(CASE WHEN dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
        |  coalesce(array_to_string(
        |      list(seg ORDER BY i) FILTER (WHERE NOT dropped), ' '), '')
        |    AS cleaned_text
        |FROM kept WHERE doc_id < 20
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d19_dup_spans" -> {
      // gram construction interpolated from D19N exactly like d10's —
      // the list_transform window matches TextGrams.gramsExpr
      val gramConcat = (0 until D19N)
        .map(j => if (j == 0) "w[i]" else s"w[i+$j]").mkString(" || ' ' || ")
      s"""WITH words AS (
        |  SELECT doc_id, source, string_split(lower(text), ' ') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id, source,
        |    list_distinct(list_transform(range(1, len(w) - ${D19N - 2}),
        |      i -> $gramConcat)) AS gs
        |  FROM words WHERE len(w) >= $D19N),
        |g AS (SELECT doc_id, source, unnest(gs) AS gram FROM grams),
        |g2 AS (SELECT doc_id, source, substr(md5(gram), 1, 16) AS fp FROM g),
        |f AS (SELECT fp, count(*) AS ndocs FROM g2 GROUP BY fp),
        |ds AS (
        |  SELECT doc_id, source, count(*) AS n_grams,
        |    sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS n_dup
        |  FROM g2 JOIN f USING (fp) GROUP BY doc_id, source)
        |SELECT source, count(*) AS n_docs,
        |  round(avg(CAST(n_dup AS DOUBLE) / n_grams), 4) AS avg_dup_frac,
        |  CAST(sum(CASE WHEN CAST(n_dup AS DOUBLE) / n_grams >= 0.5
        |           THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM ds GROUP BY source ORDER BY source""".stripMargin
    },
    "d45_boilerplate_spans" -> {
      // DuckDB needs no hash leg — it groups the span TEXT directly,
      // which doubles as the hash-identity check on the Spark side
      val gramConcat = (0 until D19N)
        .map(j => if (j == 0) "w[i]" else s"w[i+$j]").mkString(" || ' ' || ")
      s"""WITH words AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |    list_distinct(list_transform(range(1, len(w) - ${D19N - 2}),
        |      i -> $gramConcat)) AS gs
        |  FROM words WHERE len(w) >= $D19N),
        |g AS (SELECT doc_id, unnest(gs) AS gram FROM grams),
        |c AS (
        |  SELECT gram AS span, count(*) AS n_docs,
        |    min(doc_id) AS first_doc_id
        |  FROM g GROUP BY gram HAVING count(*) >= 2)
        |SELECT span, CAST(n_docs AS BIGINT) AS n_docs, first_doc_id
        |FROM c ORDER BY n_docs DESC, span LIMIT 20""".stripMargin
    },
    "d5_ngram_jaccard" ->
      s"""WITH $shingleCte
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
        |$pairPredicate
        |ORDER BY id_a, id_b""".stripMargin,
    "d23_canonical_keep" ->
      s"""WITH RECURSIVE $shingleCte,
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  $pairPredicate),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(node, other) AS (
        |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 80
        |  UNION
        |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.other),
        |comp AS (SELECT node, min(other) AS cid FROM reach GROUP BY node),
        |ranked AS (
        |  SELECT c.node, c.cid,
        |    ROW_NUMBER() OVER (PARTITION BY c.cid
        |      ORDER BY d.n_chars DESC, c.node ASC) AS rn
        |  FROM comp c JOIN documents d ON d.doc_id = c.node),
        |keep AS (SELECT cid, node AS keeper_id FROM ranked WHERE rn = 1)
        |SELECT c.node AS doc_id, k.keeper_id
        |FROM comp c JOIN keep k USING (cid) ORDER BY doc_id""".stripMargin,
    "d27_cluster_sizes" ->
      s"""WITH RECURSIVE $shingleCte,
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  $pairPredicate),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(node, other) AS (
        |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 80
        |  UNION
        |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.other),
        |comp AS (SELECT node, min(other) AS cid FROM reach GROUP BY node),
        |sizes AS (SELECT cid, count(*) AS cluster_size FROM comp GROUP BY cid)
        |SELECT cluster_size, count(*) AS n_clusters,
        |  CAST(sum(cluster_size) AS BIGINT) AS n_docs
        |FROM sizes GROUP BY cluster_size ORDER BY cluster_size""".stripMargin,
    "d36_cluster_quality" ->
      s"""WITH RECURSIVE $shingleCte,
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |    round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
        |      len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
        |  $pairPredicate),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(node, other) AS (
        |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 80
        |  UNION
        |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.other),
        |labels AS (
        |  SELECT node AS doc_id, min(other) AS canonical_id
        |  FROM reach GROUP BY node),
        |sizes AS (
        |  SELECT canonical_id, count(*) AS size
        |  FROM labels GROUP BY canonical_id),
        |stats AS (
        |  SELECT l.canonical_id, count(*) AS n_pairs,
        |    min(jaccard) AS min_jaccard,
        |    round(avg(jaccard), 4) AS avg_jaccard
        |  FROM p JOIN labels l ON p.id_a = l.doc_id
        |  GROUP BY l.canonical_id)
        |SELECT s.canonical_id, s.size, n_pairs,
        |  round(n_pairs * 2.0 / (s.size * (s.size - 1)), 4) AS edge_density,
        |  min_jaccard, avg_jaccard
        |FROM sizes s JOIN stats USING (canonical_id)
        |WHERE s.size >= 2 ORDER BY s.canonical_id""".stripMargin,
    "d6_dedup_clusters" ->
      s"""WITH RECURSIVE $shingleCte,
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  $pairPredicate),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(node, other) AS (
        |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 80
        |  UNION
        |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.other)
        |SELECT node AS doc_id, min(other) AS canonical_id
        |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin,
    // d7/d18 replay the LSH pipelines' RESULT semantics — "all pairs
    // with word-3-gram Jaccard >= 0.4" — via a shingle equi-join for
    // candidates (never an n² cross join; only docs SHARING a shingle
    // can clear any positive threshold) + exact verify, exactly the
    // candidates→verify dataflow the Spark side runs. Valid as a VALUE
    // oracle because banded LSH at 8×4 provably recalls J=1 pairs
    // (identical sets ⇒ identical signatures) and empirically recalls
    // every J >= 0.8 pair on these corpora, and the corpus Jaccard
    // spectrum is bimodal (<= 0.14 or >= 0.8 at both SFs — measured) —
    // a miss would fail this oracle loudly, which is the graduation
    // contract (VERDICT r8 #2): sketch recall becomes a CHECKED claim.
    "d7_deduped_corpus" ->
      s"""WITH RECURSIVE $fullCorpusShingleCte,
        |p AS ($fullCorpusPairPredicate),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM p
        |  UNION ALL SELECT id_b, id_a FROM p),
        |reach(node, other) AS (
        |  SELECT DISTINCT a, a FROM edges
        |  UNION
        |  SELECT r.node, e.b FROM reach r JOIN edges e ON e.a = r.other),
        |drops AS (
        |  SELECT node AS doc_id FROM reach
        |  GROUP BY node HAVING node <> min(other)),
        |total AS (
        |  SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        |kept AS (
        |  SELECT d.source, count(*) AS n_kept
        |  FROM documents d LEFT JOIN drops dr ON d.doc_id = dr.doc_id
        |  WHERE dr.doc_id IS NULL GROUP BY d.source)
        |SELECT t.source, n_docs,
        |  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        |  CAST(n_docs - coalesce(n_kept, 0) AS BIGINT) AS n_dropped
        |FROM total t LEFT JOIN kept k USING (source)
        |ORDER BY t.source""".stripMargin,
    "d18_incremental_dedup" ->
      s"""WITH $fullCorpusShingleCte,
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM g a JOIN g b ON a.sh = b.sh
        |  WHERE a.doc_id % ${Curate.BenchMod} = 0
        |    AND b.doc_id % ${Curate.BenchMod} <> 0
        |  GROUP BY 1, 2),
        |dup AS (
        |  SELECT DISTINCT id_a AS doc_id
        |  FROM cand
        |  JOIN s sa ON sa.doc_id = cand.id_a
        |  JOIN s sb ON sb.doc_id = cand.id_b
        |  WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
        |      len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4) >= 0.4),
        |b AS (
        |  SELECT doc_id, source FROM documents
        |  WHERE doc_id % ${Curate.BenchMod} = 0)
        |SELECT b.source, count(*) AS n_batch, count(dup.doc_id) AS n_dup
        |FROM b LEFT JOIN dup ON b.doc_id = dup.doc_id
        |GROUP BY b.source ORDER BY b.source""".stripMargin,
    // d15 graduates on the same grounds as d7/d18: its output is
    // per-source COUNTS of threshold decisions (a train doc is
    // contaminated iff word-3-gram Jaccard >= 0.4 against ANY bench
    // doc), and on a bimodal Jaccard spectrum the decisions are exactly
    // replayable — the bipartite band join is the execution strategy,
    // the contaminated SET is the checked claim. Mirrors d18's predicate
    // with the sides reversed (train flagged against bench, not batch
    // against rest).
    "d15_fuzzy_decontaminate" ->
      s"""WITH $fullCorpusShingleCte,
        |cand AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM g a JOIN g b ON a.sh = b.sh
        |  WHERE a.doc_id % ${Curate.BenchMod} <> 0
        |    AND b.doc_id % ${Curate.BenchMod} = 0
        |  GROUP BY 1, 2),
        |dup AS (
        |  SELECT DISTINCT id_a AS doc_id
        |  FROM cand
        |  JOIN s sa ON sa.doc_id = cand.id_a
        |  JOIN s sb ON sb.doc_id = cand.id_b
        |  WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
        |      len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4) >= 0.4),
        |d AS (
        |  SELECT doc_id, source,
        |    (doc_id % ${Curate.BenchMod} <> 0) AS is_train
        |  FROM documents)
        |SELECT d.source,
        |  CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_train,
        |  count(dup.doc_id) AS n_contaminated
        |FROM d LEFT JOIN dup ON d.doc_id = dup.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin
  )

  /** Full-corpus variants of the d5 shingle/pair fragments (no doc_id
    * window — d7/d18 dedup the WHOLE corpus): `s` is every doc's
    * distinct word-3-gram set, `g` its unnested form for the candidate
    * equi-join. ONE definition interpolated into both oracles. */
  private lazy val fullCorpusShingleCte =
    """s AS (
      |  SELECT doc_id,
      |    list_distinct(
      |      list_transform(range(len(string_split(lower(text), ' ')) - 2),
      |        i -> array_to_string(string_split(lower(text), ' ')[i + 1 : i + 3], ' '))
      |    ) AS shingles
      |  FROM documents
      |  WHERE len(string_split(lower(text), ' ')) >= 3),
      |g AS (SELECT doc_id, unnest(shingles) AS sh FROM s)""".stripMargin

  private lazy val fullCorpusPairPredicate =
    """SELECT cand.id_a, cand.id_b
      |FROM (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM g a JOIN g b ON a.sh = b.sh AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2) cand
      |JOIN s sa ON sa.doc_id = cand.id_a
      |JOIN s sb ON sb.doc_id = cand.id_b
      |WHERE round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE) /
      |    len(list_distinct(list_concat(sa.shingles, sb.shingles))), 4) >= 0.4""".stripMargin
}
