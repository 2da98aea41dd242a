package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.VectorOps

/** Similarity search over the `embeddings` table (ArrayType(FloatType),
  * dim 64). Two paths:
  *
  *  - brute-force cosine top-k: the correctness baseline. One broadcast of
  *    the single query vector; the scan side streams through with O(d)
  *    work per row and a TakeOrderedAndProject top-k — no shuffle of the
  *    embedding column at all.
  *  - random-hyperplane LSH ANN: the 100 TB path. Vectors bucket by a
  *    16-bit signature; the query probes its own bucket plus all 1-bit
  *    flips (multi-probe), so candidate generation is an equi-join on the
  *    bucket key — never an all-pairs product.
  *
  * Cosine is computed with higher-order functions (zip_with + aggregate)
  * in DOUBLE — codegen'd, no UDF.
  */
object Similarity {

  /** Dot product of two array<double> columns via higher-order fns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Memoized per-(session, dir) embeddings row count: sizing the LSH
    * plane count ([[planesFor]]) needs |corpus| but must not pay a full
    * count() job on every query invocation. CONTRACT: a dir's data is
    * immutable while a session serves it (the ingest/serve split every
    * ANN deployment already assumes) — after rewriting a dir in place,
    * call [[invalidateCaches]]. Sessions are WEAK keys: a stopped,
    * dereferenced session's entries (and any checkpoint blocks they pin)
    * become collectable instead of leaking for the JVM lifetime. */
  private val sizeCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Long]]()

  /** Collision-proof temp-view/table name tag for a data dir: the
    * readable sanitized form PLUS a hex hash of the RAW string. The
    * sanitizer alone is lossy — `/tmp/sf0.1` and `/tmp/sf0_1` both
    * sanitize to `_tmp_sf0_1`, and `createOrReplaceTempView` under the
    * shared name would silently rebind the first dir's cache entry to
    * the second dir's data, serving wrong-index results (r10 advice).
    * Every *IndexFor-style cache keys its view/table through this. */
  private[graft] def dirTag(dir: String): String =
    dir.replaceAll("[^A-Za-z0-9]", "_") +
      f"_${dir.hashCode & 0xffffffffL}%08x"
  private[ext] def perSession[K, V](
      cache: java.util.WeakHashMap[SparkSession,
        scala.collection.concurrent.TrieMap[K, V]],
      spark: SparkSession): scala.collection.concurrent.TrieMap[K, V] =
    cache.synchronized {
      var m = cache.get(spark)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[K, V]
        cache.put(spark, m)
      }
      m
    }
  private[graft] def corpusSize(spark: SparkSession, dir: String): Long =
    perSession(sizeCache, spark).getOrElseUpdate(dir,
      Tables.embeddings(spark, dir).count())

  /** Drop this session's memoized corpus sizes (embeddings AND
    * documents) and IVF indexes — the one public invalidation entry
    * point; call after rewriting a served dir's data in place. Also
    * drops the [[IndexStore]] publishes for every (dir, table) this
    * session served through the store: an in-place rewrite that
    * preserves file names/sizes/mtimes leaves the store's dataset
    * fingerprint unchanged, so clearing the session memo alone would
    * let the NEXT serve reload the stale published index (advisor
    * r13 — the exact case this doc names). */
  def invalidateCaches(spark: SparkSession): Unit = {
    sizeCache.synchronized(sizeCache.remove(spark))
    covSketchCache.synchronized(covSketchCache.remove(spark))
    knnTruthCache.synchronized(knnTruthCache.remove(spark))
    gateCache.synchronized(gateCache.remove(spark))
    ivfCache.synchronized(ivfCache.remove(spark))
    commitCardCache.synchronized(commitCardCache.remove(spark))
    pqCache.synchronized(pqCache.remove(spark))
    IndexStore.invalidateServed(spark)
    Dedup.invalidateCaches(spark)
    Classify.invalidateCaches(spark)
    TextStats.invalidateCaches(spark)
    Graph.invalidateCaches(spark)
    WindowFns.invalidateCaches(spark)
  }

  /** SIM1 — brute-force cosine top-k vs the vec_id=0 query vector. */
  def sim1CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val q = e.filter(col("vec_id") === 0).select(col("emb").as("qemb"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorOps.vecCosine(spark, col("emb"), col("qemb")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** SIM18 — FILTERED (hybrid) similarity search: top-k among only the
    * vectors satisfying a metadata predicate — here "the query's own
    * label", the same-category-neighbors ask every production vector
    * store now serves (filtered kNN). The strategy choice is the
    * pre/post-filter debate: POST-filtering an ANN candidate pool
    * starves under a selective predicate (a pool of p×k candidates may
    * contain fewer than k survivors — recall collapses exactly when the
    * filter matters), while PRE-filtering scores only the qualifying
    * slice and stays exact: at selectivity s the scan costs s×N fused
    * cosine rows, which beats IVF-plus-overfetch for every s that makes
    * filtering worth doing. This op takes the pre-filter side and makes
    * it the registered, oracle-checked baseline; the predicate lands
    * BEFORE the cosine in the plan, so non-qualifying vectors are never
    * scored (and on a label-partitioned layout the scan itself would
    * prune). */
  def sim18FilteredAnn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") === 0)
      .select(asDouble(col("embedding")).as("qemb"),
        col("label").as("qlabel"))
    e.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("label"),
        asDouble(col("embedding")).as("emb"))
      .crossJoin(broadcast(q))
      .filter(col("label") === col("qlabel"))
      .select(col("vec_id"), col("label"),
        round(VectorOps.vecCosine(spark, col("emb"), col("qemb")), 4)
          .as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** SIM19 — random-projection (Johnson–Lindenstrauss) dimensionality
    * reduction QC: project 64-dim embeddings onto k=16 dims through a
    * DETERMINISTIC ±1 matrix (Achlioptas 2001 — database-friendly JL:
    * sign entries, no Gaussians needed) and report, per label, how much
    * pairwise cosine geometry the projection kept. This is the go/no-go
    * card before flipping an ANN fleet to reduced-dim vectors (4×
    * memory + 4× scan speed, the same decision sim12 grades for int8):
    * if avg |cos₆₄ − cos₁₆| is small, downstream LSH/IVF can run in the
    * cheap space.
    *
    * Engine-portable randomness: entry s(i,j) = ±1 from the shared
    * [[graft.functions.IdHash]] bucket of (i·16+j) — the d22/d41 device,
    * so the DuckDB oracle reconstructs the IDENTICAL matrix and the
    * whole report value-checks. No RNG state, no broadcast matrix (the
    * matrix is ARITHMETIC, materialized nowhere on either engine).
    *
    * Scale shape: projection is 64×16 codegen fused multiply-adds per
    * row in ONE scan, zero shuffle; the QC pairs are id-adjacent
    * (vec_id, vec_id+1) — a self-join on an equi-key, never all pairs —
    * and the report collapses to label-count rows. Cosines round(4)
    * before the abs-error arithmetic (the t6 libm discipline). */
  def sim19RandomProjection(spark: SparkSession, dir: String,
                            k: Int = 16, dim: Int = 64): DataFrame = {
    // The ±1 sign matrix is a pure function of (i, j) — evaluate the
    // hash at PLAN-BUILD time into a folded literal basis and project
    // through the fused codegen [[graft.functions.VecProject]] (r21:
    // the k·dim-term interpreted HOF this replaces ran ~1024 lambda
    // terms per row, twice per row across the self-join — the same
    // ~1.4 µs/term class the r19/r20 receipts measured; VecProject
    // accumulates ascending-i from 0.0 with (x − 0.0) = x, so the
    // projection is BIT-IDENTICAL, differential-checked at both SFs).
    val basis = IndexedSeq.tabulate(k) { j =>
      IndexedSeq.tabulate(dim) { i =>
        if (graft.functions.IdHash.bucketLong((i * k + j).toLong, 2) == 0L)
          1.0 else -1.0
      }
    }
    val muZero = IndexedSeq.fill(dim)(0.0)
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        asDouble(col("embedding")).as("emb"))
      .withColumn("proj", VectorOps.vecProject(spark, col("emb"),
        typedlit(muZero), typedlit(basis)))
    val a = e.select(col("vec_id"), col("label"), col("emb").as("emb_a"),
      col("proj").as("proj_a"))
    val b = e.select((col("vec_id") - 1).as("vec_id"),
      col("emb").as("emb_b"), col("proj").as("proj_b"))
    // Rounded cosines convert to an EXACT INTEGER basis (×10⁴) before
    // any aggregate: per-pair values are engine-identical after
    // round(4), but a float SUM of them is summation-order-dependent
    // and can land either side of the report's own rounding boundary —
    // integer sums cannot (the a21/d40 exact-moments discipline).
    a.join(b, Seq("vec_id"))
      // fused codegen cosine (same ascending-i sums, same division —
      // bit-identical to the zip_with/aggregate HOF on equal-dim inputs)
      .withColumn("cos_orig",
        round(VectorOps.vecCosine(spark, col("emb_a"), col("emb_b")), 4))
      .withColumn("cos_proj",
        round(VectorOps.vecCosine(spark, col("proj_a"), col("proj_b")), 4))
      .filter(!isnan(col("cos_orig")) && !isnan(col("cos_proj")))
      .withColumn("co", round(col("cos_orig") * 10000, 0).cast("long"))
      .withColumn("cp", round(col("cos_proj") * 10000, 0).cast("long"))
      .withColumn("err", abs(col("co") - col("cp")))
      .groupBy(col("label")).agg(
        count(lit(1)).as("n_pairs"),
        round(sum(col("co")) / 10000.0 / count(lit(1)), 4).as("avg_cos_orig"),
        round(sum(col("cp")) / 10000.0 / count(lit(1)), 4).as("avg_cos_proj"),
        round(sum(col("err")) / 10000.0 / count(lit(1)), 4).as("avg_abs_err"),
        round(max(col("err")) / 10000.0, 4).as("max_abs_err"))
      .orderBy(col("label"))
  }

  /** SIM20 — ANN recall scorecard: one table comparing EVERY index
    * family in the tier (LSH bands / IVF / binary-quantized / IVF-PQ /
    * int8) against the brute-force ground truth on the shared
    * benchmark lookup — the go/no-go card an ANN migration reads
    * before flipping a fleet from exact to approximate (sim17 sweeps
    * ONE index's probe axis; this compares ACROSS indexes at their
    * registered operating points). Methods are ranked by recall@10;
    * brute force rides along as the =1.0 sanity row. Every SERVING row
    * must clear 0.6 recall@10 at sf0.1 (pinned in SimilaritySpec —
    * the bar that caught sim2's radius-1 point serving 0.2 in r11).
    *
    * Shape: every method serves off its memoized per-(session, dir)
    * index (ingest already split from serving — the scorecard adds
    * zero index builds), and the comparison is driver arithmetic over
    * six 10-row results (bounded collect). Rows-only by design: the
    * ranking compares OUR index implementations, which have no DuckDB
    * counterpart; the per-method semantics are each oracle/spec-pinned
    * in their own right. */
  def sim20AnnScorecard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def ids(q: String): Set[Long] =
      queries(q)(spark, dir).select(col("vec_id"))
        .collect().map(_.getLong(0)).toSet
    val methods = Seq("brute" -> "sim1_cosine_topk",
      "lsh" -> "sim2_ann_lsh", "ivf" -> "sim4_ivf_ann",
      "binary" -> "sim15_binary_ann", "ivfpq" -> "sim16_ivfpq_ann",
      "int8" -> "sim21_int8_ann",
      "matryoshka" -> "sim26_matryoshka_ann")
    // The seven sibling serves are INDEPENDENT top-10 jobs (each reads
    // its own memoized index or the raw corpus); overlap them from a
    // bounded driver pool (guide §2.6, the s19 device — r22) instead
    // of running seven corpus scans back to back. Each method's result
    // set is exactly the sequential one (the methods never read each
    // other); the scorecard arithmetic below waits for all of them.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContextExecutorService =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val byMethod: Map[String, Set[Long]] = try {
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(methods.map { case (name, q) =>
          scala.concurrent.Future(name -> ids(q))
        }),
        scala.concurrent.duration.Duration.Inf).toMap
    } finally pool.shutdown()
    val truth = byMethod("brute")
    methods.map { case (name, _) =>
      val got = byMethod(name)
      val hit = (got & truth).size.toLong
      (name, got.size.toLong, hit,
        BigDecimal(hit.toDouble / truth.size)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("method", "k", "n_true_neighbors", "recall_at_10")
      .orderBy(col("recall_at_10").desc, col("method"))
  }

  /** SIM26 — Matryoshka (coarse-to-fine) ANN: score the corpus on the
    * FIRST d0 dims only, keep a top-C overfetch, rerank those C
    * exactly at full dimension (Kusupati et al. 2022, "Matryoshka
    * Representation Learning" — the serving pattern MRL embeddings are
    * trained for; the "shortened embeddings" contract hosted model
    * APIs now ship). The scale economics: stage 1 touches d0/d of the
    * vector arithmetic per row — and at scale the prefix is stored as
    * its OWN column (the MRL deployment shape), so the SCAN shrinks
    * d/d0× too; stage 2 is O(C·d) on a candidate set that fits one
    * task. On UNTRAINED near-random embeddings a d/4 prefix carries
    * only ~1/4 of the signal — the worst case for this index, which is
    * exactly why the registered operating point overfetches C = 10·k
    * and the sf0.1 recall rides sim20's ≥ 0.6 serving bar beside the
    * other families (MRL-trained embeddings concentrate leading-dim
    * variance so real deployments do strictly better).
    *
    * Exactness devices: prefix cosine = the same fused `vec_cosine`
    * over `slice`d arrays (the DuckDB oracle replays with [1:d0] list
    * slices); both scores round(4) BEFORE ranking with vec_id
    * tie-breaks, so the candidate SET and the final order are
    * engine-identical; NaN (zero-norm-prefix) rows drop explicitly at
    * each stage (the keyedNearDupPairs guard — a zero prefix must not
    * outrank every number). C ≥ corpus degenerates to brute force,
    * spec-pinned ≡ sim1. */
  def sim26MatryoshkaAnn(spark: SparkSession, dir: String): DataFrame =
    matryoshkaTopK(spark, Tables.embeddings(spark, dir))

  private[graft] def matryoshkaTopK(spark: SparkSession,
      embeddings: DataFrame, d0: Int = 16, overfetch: Int = 100,
      k: Int = 10): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      asDouble(col("embedding")).as("emb"))
    val q = e.filter(col("vec_id") === 0).select(col("emb").as("qemb"))
    // stage 1: prefix-dim scan, fused top-C (TakeOrderedAndProject —
    // per-partition heads + one singleton merge, never a full sort)
    val coarse = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("cos_coarse",
        round(VectorOps.vecCosine(spark,
          slice(col("emb"), 1, d0), slice(col("qemb"), 1, d0)), 4))
      .filter(!isnan(col("cos_coarse")))
      .orderBy(col("cos_coarse").desc, col("vec_id"))
      .limit(overfetch)
    // stage 2: exact full-dim rerank of the C candidates
    coarse
      .withColumn("cos_sim",
        round(VectorOps.vecCosine(spark, col("emb"), col("qemb")), 4))
      .filter(!isnan(col("cos_sim")))
      .select(col("vec_id"), col("cos_coarse"), col("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** SIM27 — approximate kNN GRAPH construction (r15 verdict ask #3):
    * top-k neighbors for EVERY vector, not a point lookup — the verb
    * dataset cartography, cluster labeling, and graph-based dedup
    * variants start from (sim1–26 answer "neighbors of THIS query";
    * this answers "the neighborhood structure of the whole corpus").
    * The pair stage is the [[keyedNearDupPairs]] SHAPE on the
    * published IVF cells ([[cellsFor]]-scaled, served through the
    * IndexStore): a co-partitioned cell self-join bounds candidates
    * to O(N · ~256) at any corpus size — all-pairs never
    * materializes — and a per-source top-k window replaces the
    * threshold (rounded(4) score + nbr_id tie-break, the sim6
    * discipline, so the edge SET and order are rerun-stable).
    *
    * Approximation is priced, not hidden: edges only form INSIDE a
    * cell (the d50/SemDeDup sacrifice — a true neighbor in another
    * cell is missed; SimilaritySpec prices the slice recall against
    * global brute force), candidates-within-cell are EXACT (the spec
    * pins slice×corpus brute equivalence under the same cell
    * discipline), and zero-norm sources drop with their NaN scores
    * rather than ranking above numbers. Sources in cells with no
    * other member emit no edges — an honest isolate, not an error.
    * At scale the window shuffle partitions by source id over the
    * cell-bounded pair frame; nothing corpus-quadratic exists in the
    * plan. Rows-only: k-means cells have no SQL form (the d50/d51
    * treatment). */
  def sim27KnnGraph(spark: SparkSession, dir: String): DataFrame = {
    val k = cellsFor(corpusSize(spark, dir))
    val base = ivfIndexFor(spark, dir, k)
    knnGraph(base.assigned.select(col("cell"), col("vec_id"), col("emb")),
      kNeighbors = 5)
  }

  /** The sim27 kernel on an explicit cell assignment (unit-testable
    * with hand-built cells). */
  private[graft] def knnGraph(assigned: DataFrame,
                              kNeighbors: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = assigned.sparkSession
    // The pair fan-out is this operator's dominant cost by
    // construction, so its parallelism must not be hostage to the
    // PROBE side's partition count: a store-served `assigned` small
    // enough to broadcast (or loaded from few files) would otherwise
    // run the whole O(N·cellsize) cosine stage on however many tasks
    // the artifact's layout happened to give the left scan — measured
    // at the 10× receipt: a BroadcastHashJoin probe side of TWO
    // partitions doing 5.1M cosines serially (7.5 s → 1.9 s with the
    // explicit cell exchange). One N-row shuffle buys fan-out
    // parallelism that scales with the cell count (= N/256 under
    // cellsFor), which is the trade every keyed pair kernel here
    // already makes implicitly when both sides are too big to
    // broadcast.
    val l = assigned.select(col("cell"), col("vec_id").as("src_id"),
      col("emb").as("emb_a"))
      .repartition(col("cell"))
    val r = assigned.select(col("cell"), col("vec_id").as("nbr_id"),
      col("emb").as("emb_b"))
    val scored = l.join(r, Seq("cell"))
      .filter(col("src_id") =!= col("nbr_id"))
      .select(col("src_id"), col("nbr_id"),
        round(VectorOps.vecCosine(spark, col("emb_a"), col("emb_b")), 4)
          .as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("cos_sim").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNeighbors)
      .select(col("src_id"), col("rank"), col("nbr_id"), col("cos_sim"))
      .orderBy(col("src_id"), col("rank"))
  }

  /** SIM28 — cell-occupancy drift between corpus GENERATIONS on the
    * FROZEN published cells (r16 verdict ask #2): the staleness signal
    * the IVF index lifecycle lacks. Every frozen-cell consumer (d51's
    * incremental dedup, d55's decontamination, sim23's delta serving)
    * assumes new data still looks like the corpus the centroids were
    * trained on; a new crawl that shifts the embedding distribution
    * silently degrades all of them — cells overflow or empty out, and
    * nothing says "retrain" ([[graft.ext.IndexStore.gcStore]] collects
    * garbage but has no staleness trigger). This card is that trigger:
    * the population stability index of the CELL-OCCUPANCY distribution
    * between the older and newer id half ("previous generation" vs
    * "this generation" — the t26/a35 midpoint split device), computed
    * on the published assignment itself. PSI ≥ 0.2 (the industry
    * folklore rung t26 publishes for quality drift) reads
    * `drift_major` = time to retrain; `top_cell` names the
    * most-shifted cell (ties → lowest id), which is where an operator
    * looks first. The arithmetic is t26's PSI kernel verbatim —
    * Laplace-smoothed proportions over the FIXED k-cell domain (a cell
    * empty on one side reads a large finite term, never ln(0); two
    * literally identical generations read exactly 0.0), per-term
    * round(6) before the sum's round(4).
    *
    * Scale shape: ONE pass over the (vec_id, cell) assignment to
    * 2·k group counts — never the vectors — then all arithmetic on a
    * k-row frame; the only data-sized exchange is the count
    * aggregation, which combines map-side. Rows-only: k-means cells
    * have no SQL form (the d50/d51 treatment); SimilaritySpec pins the
    * kernel on hand generations (identical → exactly 0; shifted → past
    * the 0.2 rung). */
  def sim28CellDrift(spark: SparkSession, dir: String): DataFrame = {
    val k = cellsFor(corpusSize(spark, dir))
    val base = ivfIndexFor(spark, dir, k)
    val a = base.assigned.select(col("vec_id"), col("cell"))
    val span = graft.etl.Analyze.idMidpoint(a, col("vec_id"))
    val tagged = a.crossJoin(broadcast(span))
    cellOccupancyPsi(
      tagged.filter(col("vec_id") < col("split")).select(col("cell")),
      tagged.filter(col("vec_id") >= col("split")).select(col("cell")), k)
  }

  /** The sim28 kernel on explicit generation frames (each holding a
    * `cell` column over the SAME frozen k-cell domain — unit-testable
    * with hand assignments). One row: sizes, PSI, the most-shifted
    * cell, and the ≥ 0.2 retrain flag. */
  private[graft] def cellOccupancyPsi(ref: DataFrame, cur: DataFrame,
                                      k: Int): DataFrame =
    cellPsiFromCounts(
      ref.groupBy(col("cell")).agg(count(lit(1)).as("cr")),
      cur.groupBy(col("cell")).agg(count(lit(1)).as("cc")), k)

  /** The PSI chain over pre-reduced per-cell counts — the shared
    * serve kernel ([[graft.streaming.CellDriftFold]] folds exactly
    * these counts and serves THIS, so stream ≡ batch parity is by
    * construction, the a41/a43 fold discipline). */
  private[graft] def cellPsiFromCounts(refCounts: DataFrame,
      curCounts: DataFrame, k: Int): DataFrame = {
    val spark = refCounts.sparkSession
    val cr = refCounts
    val cc = curCounts
    // the FIXED published domain: all k cells, so a cell present in
    // one generation and absent from the other still contributes its
    // (smoothed) term on BOTH sides — t26's missing-bin discipline
    val domain = spark.range(k.toLong)
      .select(col("id").cast("int").as("cell"))
    // pin the k-row count frame: it feeds TWO consumers (the totals
    // and the term chain) — without the pin each re-runs the
    // assignment scan and both count aggregates (t26's lesson:
    // 10 exchanges measured; 5 with it)
    val full = domain.join(cr, Seq("cell"), "left")
      .join(cc, Seq("cell"), "left")
      .na.fill(0L, Seq("cr", "cc"))
      .localCheckpoint(true)
    val tot = full.agg(sum(col("cr")).as("n_ref"),
      sum(col("cc")).as("n_cur"))
    full.crossJoin(broadcast(tot))
      .withColumn("p",
        (col("cr") + lit(0.5)) / (col("n_ref") + lit(k * 0.5)))
      .withColumn("q",
        (col("cc") + lit(0.5)) / (col("n_cur") + lit(k * 0.5)))
      .withColumn("term",
        round((col("q") - col("p")) * log(col("q") / col("p")), 6))
      .agg(max(col("n_ref")).as("n_ref"), max(col("n_cur")).as("n_cur"),
        count(lit(1)).as("n_cells"),
        round(sum(col("term")), 4).as("psi"),
        // most-shifted cell, ties → LOWEST cell id (negate inside the
        // struct max so the comparison stays one deterministic max)
        max(struct(abs(col("term")).as("t"), (-col("cell")).as("nc")))
          .as("top"))
      .select(col("n_ref"), col("n_cur"), col("n_cells"), col("psi"),
        (-col("top.nc")).as("top_cell"),
        col("top.t").as("top_term_abs"),
        (col("psi") >= 0.2).as("drift_major"))
  }

  /** SIM30 — RETRAIN what-if card: the action side of sim28's alarm.
    * sim28 says "the new generation no longer looks like the corpus
    * the centroids were trained on"; the operator's next question is
    * "what would retraining actually buy?" — retraining invalidates
    * every published frozen-cell artifact (d51/d55's incremental
    * economics, sim23's deltas), so it should be priced, not reflexive.
    * This card retrains the quantizer (same k, same deterministic
    * trainer/seed) on the CURRENT generation only and scores BOTH
    * quantizers on those same current rows: mean squared quantization
    * error (the k-means objective — how well cells fit the data now)
    * and occupancy balance (CV and max cell share — a drifted corpus
    * piles into few cells, which is exactly what breaks the
    * O(N·targetCell) pair-stage economics every cellsFor consumer
    * relies on). `retrain_recommended` fires when the what-if cuts
    * MSE by ≥ 5%.
    *
    * Scale shape: the what-if training is an INGEST-TIME artifact —
    * it publishes through the IndexStore (`ivf_whatif_g2_k<k>`) like
    * every other index generation, so the registered query's serving
    * plan is two assignment scans + label-space-bounded aggregates;
    * per-row error is three fused vec_dot calls (no interpreted HOF in
    * the hot path), k-row occupancy frames carry the balance math.
    * Rows-only: k-means internals (the d50/d51 treatment);
    * SimilaritySpec pins the directional contract on hand data — a
    * generation the old centroids have never seen reads a large MSE
    * gain and fires the flag; an identical generation reads ≈ 0 gain
    * and stays quiet. */
  def sim30RetrainWhatif(spark: SparkSession, dir: String): DataFrame = {
    val k = cellsFor(corpusSize(spark, dir))
    val base = ivfIndexFor(spark, dir, k)
    // the CURRENT generation = the newer id half, cut by the SHARED
    // midpoint helper in ONE agg(min, max) driver read (r17 verdict
    // ask #4 / advisor: the old form ran TWO separate .head() scans
    // at query-construction time). Driver-side — not the broadcast
    // span device — because the split must also be a plain Long for
    // the store-build closure and the commit verb
    // ([[sim31RetrainCommit]]) to cut the SAME generation boundary;
    // probed: the broadcast form re-runs the span agg once per
    // consumer (+4 exchanges).
    val (parts, split) = whatifFor(spark, dir, k, base)
    val cur = base.assigned.select(col("vec_id"), col("emb"))
      .filter(col("vec_id") >= split)
    retrainWhatif(cur, base.centers, collectCenters(parts("centers")),
      parts("assigned").select(col("vec_id"), col("cell")))
  }

  /** Store name of the what-if generation (the candidate sim30 prices
    * and sim31 promotes) and of the COMMITTED serving generation — one
    * definition each so the two verbs can never address different
    * artifacts. */
  private[graft] def whatifName(k: Int): String = s"ivf_whatif_g2_k$k"
  private[graft] def committedIvfName(k: Int): String = s"ivf_g2_k$k"

  /** The published what-if generation for (dir, k): the quantizer
    * retrained on the CURRENT (newer-id-half) generation only,
    * load-or-built under the ONE shared [[whatifName]] — sim30 (the
    * pricing verb) and sim31 (the commit verb) both come through here,
    * so the committed candidate is BY CONSTRUCTION the priced one:
    * same boundary, same trainer, same published artifact. Returns the
    * artifact parts and the generation split. */
  private[graft] def whatifFor(spark: SparkSession, dir: String, k: Int,
      base: IvfIndex): (Map[String, DataFrame], Long) = {
    val split = generationSplit(spark, base)
    val cur = base.assigned.select(col("vec_id"), col("emb"))
      .filter(col("vec_id") >= split)
    val parts = IndexStore.loadOrBuild(spark, dir, "embeddings",
      whatifName(k)) {
      val idx = ivfIndex(cur.select(col("vec_id"),
        col("emb").as("embedding")), k)
      Seq("assigned" -> idx.assigned,
        "centers" -> centersFrame(spark, idx.centers))
    }
    (parts, split)
  }

  /** SIM31 — retrain COMMIT: the ACT verb that closes the index
    * lifecycle loop sim28 (drift alarm) and sim30 (retrain price)
    * opened. Promotes the priced what-if generation to the SERVED
    * index and retires the generation it replaces:
    *
    *  1. the committed serving artifact ([[committedIvfName]]) is the
    *     what-if centroids over the FULL corpus — the current half's
    *     assignment REUSED verbatim from the published what-if (the
    *     training and that half's encode were already paid by sim30,
    *     so the commit prices them as a rename), the older half
    *     frozen-centroid ENCODED ([[ivfAssign]] — encode, never
    *     train). It publishes through the store's marker-gated path,
    *     so the cutover is complete-or-invisible like every other
    *     generation switch (the sim25 compaction precedent);
    *  2. every serving path cuts over: [[ivfIndexFor]] prefers a
    *     committed generation over the base artifact (the marker IS
    *     the generation pointer), so all frozen-cell consumers —
    *     d50/d51/d55's semantic dedup, sim27/sim29's kNN graph,
    *     sim28's drift card, sim23-25's maintenance verbs, sim4's
    *     serve — ride the new generation with zero code awareness; the
    *     session memo drops so the cutover is same-session too;
    *  3. the pre-retrain generation is DECLARED superseded to
    *     [[graft.ext.IndexStore.gcStore]] — the old base index and the
    *     delta/tombstone/compacted maintenance artifacts encoded
    *     against its centroids (meaningless under the new quantizer;
    *     their consumers re-derive cheap frozen-centroid encodes
    *     against the committed generation on next use). This is the
    *     production caller the `superseded` contract was written for.
    *
    * The card: per committed cell — total occupancy, rows REUSED from
    * the what-if artifact vs rows re-encoded — plus the commit's
    * flags: `priced_match` (the committed current-half assignment is
    * row-identical to the artifact sim30 scored — the commit IS the
    * priced candidate), `serve_match` (the serve path read the
    * committed generation when audited), `superseded_gone` (the
    * transition's sweep completed and was verified empty),
    * `whatif_reused` (no training ran at commit — false only when
    * sim30 never priced this corpus), `first_commit` / `swept_now`
    * (idempotency receipts: a re-run reuses everything and sweeps
    * nothing), and `spectrum_top1_share` / `spectrum_pr` (the sim32
    * geometry card measured at the gate — see below).
    *
    * AUDIT AT PUBLISH, SERVE THE RECEIPT (r18 verdict ask #1 — the
    * engine's own s17 write-audit-publish discipline applied to its
    * newest verb): the four corpus-sized `except` audits, the gc
    * sweep, and its gone-verification run exactly ONCE per generation
    * transition, inside the build closure of a RECEIPT artifact
    * ([[commitReceiptName]]) published beside the committed index.
    * The served card is then one map-side-combined occupancy agg ×
    * the one-row flag frame COLLECTED from the receipt — zero
    * except/join jobs on a warm read (IndexStoreSpec pins the job
    * count). The receipt also closes the commit/sweep atomicity
    * window (r18 advisor, medium): a crash after the committed
    * publish but before the sweep leaves the receipt UNPUBLISHED, so
    * the next run's load-or-build RE-ATTEMPTS the audit + sweep until
    * the receipt exists — `superseded_gone` is never reported
    * vacuously; it is either verified-now or read from a receipt that
    * was verified when written. (Residual window: a consumer in
    * another session can still read a stale gen1 maintenance artifact
    * between the crash and the re-attempting run — the receipt bounds
    * staleness to one sim31 invocation, which is the lifecycle job's
    * own cadence.)
    *
    * The superseded set is DERIVED from the store listing (r18
    * verdict ask #3): every published artifact under this dataset
    * root named `ivf_k<k>` or `ivf_k<k>_*` — the retired base and
    * whatever maintenance artifacts were actually encoded against its
    * centroids — rather than a hardcoded suffix list, so a changed
    * batch size or tombstone mod cannot orphan artifacts the commit
    * should retire. The gen2 names (`ivf_g2_*`, `ivf_whatif_g2_*`)
    * live under a different prefix and are never matched. The sweep
    * still belongs to the TRANSITION only: after the cutover the
    * maintenance verbs legitimately re-derive artifacts under the
    * superseded names against the committed centroids, and a re-run
    * (receipt already published) must not collect those.
    *
    * SPECTRUM GATE (r18 verdict ask #7): before publishing a first
    * commit, the sim32 collapse verdict is read once — a
    * `collapse_major` corpus VETOES the commit (throws), because
    * cosine cell geometry is exactly what representation collapse
    * invalidates: promoting a quantizer trained on collapsed
    * embeddings would migrate every frozen-cell consumer
    * (d50/d51/d55, sim23-25, sim27-29, sim4) onto cells that
    * partition noise. The measured top1_share / participation_ratio
    * ride into the receipt as the commit's geometry-health
    * annotation. Consumers of the committed generation are protected
    * transitively: no committed generation can exist whose training
    * corpus flunked the gate.
    *
    * Scale shape: the only corpus-sized work is at publish time — the
    * one-off older-half encode (O(N·k·d) fused-codegen argmin), one
    * CovarianceSketch pass for the gate, and the one-time audits; the
    * SERVED card is one occupancy aggregate over the memoized gen2
    * view plus a one-row LOCAL flag frame — after the session's first
    * read of the receipt, card construction runs zero spark jobs (the
    * split + flags ride a per-session memo validated by one job-free
    * marker probe). d49's recall card is deliberately NOT
    * superseded: it is a fingerprint-keyed audit SNAPSHOT, not a
    * serving artifact. Rows-only: audits OUR index lifecycle;
    * IndexStoreSpec pins the full verb — fresh-session zero-build
    * gen2 serve, the derived gc sweep set (including a planted
    * non-default-parameter delta), crash-window re-attempt, consumer
    * parity, idempotency, the collapse veto, and the warm serve's
    * job budget. */
  def sim31RetrainCommit(spark: SparkSession, dir: String): DataFrame = {
    val k = cellsFor(corpusSize(spark, dir))
    import spark.implicits._
    def flagsDf(firstCommit: Boolean, sweptNow: Int, f: CommitFlags) =
      Seq((firstCommit, f.whatifReused, sweptNow, f.gone, f.priced,
        f.serve, f.share, f.pr))
        .toDF("first_commit", "whatif_reused", "swept_now",
          "superseded_gone", "priced_match", "serve_match",
          "spectrum_top1_share", "spectrum_pr")
    def card(assigned: DataFrame, split: Long, flags: DataFrame) =
      assigned.groupBy(col("cell")).agg(
        count(lit(1)).as("n_total"),
        count(when(col("vec_id") >= split, 1)).as("n_reused"),
        count(when(col("vec_id") < split, 1)).as("n_reencoded"))
        .crossJoin(broadcast(flags))
        .orderBy(col("cell"))
    // WARM FAST PATH: after a session has read the transition receipt
    // once, the card is servable with ZERO spark jobs at construction
    // — occupancy over the memoized gen2 view (serve_match is exactly
    // the audit that licenses this substitution) × the memoized flag
    // row. The memo is valid only while the receipt it was read from
    // is still published (one job-free marker probe): if the receipt
    // vanished (interrupted transition being re-attempted elsewhere,
    // or an invalidation), fall through to the slow path, which
    // re-audits.
    val cardMemo = perSession(commitCardCache, spark)
    cardMemo.get((dir, k)) match {
      // The memo is valid only while BOTH markers hold (advisor r19):
      // the receipt's AND the committed generation's — if ivf_g2_k<k>
      // was deleted out-of-band while the receipt survived,
      // ivfIndexFor below would silently rebuild and serve the BASE
      // index under receipt-verified flags (serve_match=true) that no
      // longer describe the served artifact. Both probes are job-free
      // marker checks.
      case Some((split, pf))
          if IndexStore.isPublished(spark, dir, "embeddings",
            commitReceiptName(k)) &&
          IndexStore.isPublished(spark, dir, "embeddings",
            committedIvfName(k)) =>
        return card(ivfIndexFor(spark, dir, k).assigned, split,
          flagsDf(firstCommit = false, sweptNow = 0, pf))
      case Some(_) => cardMemo.remove((dir, k)): Unit
      case None =>
    }
    val firstCommit = IndexStore
      .loadIfPublished(spark, dir, "embeddings", committedIvfName(k)).isEmpty
    // the sim32 gate runs BEFORE anything publishes: a vetoed commit
    // must leave the store exactly as it found it
    val gateAtCommit: Option[(Double, Double, Boolean)] =
      if (firstCommit) Some(spectrumGateCached(spark, dir)) else None
    gateAtCommit.foreach { case (share, pr, collapse) =>
      if (collapse) throw new IllegalStateException(
        f"sim32 collapse_major vetoes the retrain commit " +
          f"(top1_share=$share%.4f, participation_ratio=$pr%.4f): " +
          "cosine cell geometry is undefined on a collapsed corpus — " +
          "fix the embedding pipeline before promoting a quantizer " +
          "trained on it")
    }
    val whatifReused = IndexStore
      .loadIfPublished(spark, dir, "embeddings", whatifName(k)).nonEmpty
    // pre-commit this serves the OLD generation (the one being
    // retired); on a re-run it already serves the committed one — both
    // carry the same vec_ids, so the boundary below is identical
    val base = ivfIndexFor(spark, dir, k)
    val (whatif, split) = whatifFor(spark, dir, k, base)
    val committed = IndexStore.loadOrBuild(spark, dir, "embeddings",
      committedIvfName(k)) {
      val newCenters = collectCenters(whatif("centers"))
      val older = ivfAssign(
        base.assigned.filter(col("vec_id") < split)
          .select(col("vec_id"), col("emb")), newCenters)
      Seq(
        "assigned" -> older.select(col("vec_id"), col("emb"), col("cell"))
          .unionByName(whatif("assigned")
            .select(col("vec_id"), col("emb"), col("cell"))),
        "centers" -> whatif("centers"))
    }
    // session-side cutover; fresh sessions cut over via the marker
    dropIvfMemo(spark, dir)
    val gen2 = ivfIndexFor(spark, dir, k)
    // The transition receipt: audits + sweep run once, inside this
    // build closure; every later call loads the published flag row.
    // `sweptNow` observes whether THIS call performed the sweep (the
    // idempotency column) — the closure runs synchronously, so the
    // var is settled before the flag frame below reads it.
    var sweptNow = 0
    val receipt = IndexStore.loadOrBuild(spark, dir, "embeddings",
      commitReceiptName(k)) {
      // derive the retired set from what is actually published under
      // the gen1 prefix — never a constant suffix list, and ANY k
      // (advisor r19): if the corpus grew between generations so
      // cellsFor changed, gen1 artifacts named with the OLD k are just
      // as superseded — keying the filter on the current k would
      // orphan them forever. The gen2 namespace (ivf_g2_/
      // ivf_whatif_g2_) never matches ivf_k<digits>.
      val gen1 = IndexStore.listArtifacts(spark, dir, "embeddings")
        .filter(_.matches("""ivf_k\d+(_.*)?"""))
      val swept = IndexStore.gcStore(spark, Seq(dir), superseded = gen1)
      sweptNow = swept.size
      val gone = gen1.forall(n =>
        IndexStore.loadIfPublished(spark, dir, "embeddings", n).isEmpty)
      def ids(df: DataFrame) = df.select(col("vec_id"), col("cell"))
      val curCommitted = ids(committed("assigned"))
        .filter(col("vec_id") >= split)
      val pricedMatch =
        curCommitted.except(ids(whatif("assigned"))).isEmpty &&
          ids(whatif("assigned")).except(curCommitted).isEmpty
      val serveMatch =
        ids(gen2.assigned).except(ids(committed("assigned"))).isEmpty &&
          ids(committed("assigned")).except(ids(gen2.assigned)).isEmpty
      // a crash-window RE-ATTEMPT re-measures the gate (the pre-commit
      // read is only taken on the call that actually commits)
      val (share, pr, _) = gateAtCommit.getOrElse(spectrumGateCached(spark, dir))
      Seq(
        "flags" -> Seq((whatifReused, swept.size, gone, pricedMatch,
          serveMatch, share, pr))
          .toDF("whatif_reused", "swept_at_commit", "superseded_gone",
            "priced_match", "serve_match", "spectrum_top1_share",
            "spectrum_pr"),
        // the audited set itself, for forensic reads — the served
        // card never scans this
        "superseded" -> gen1.toDF("name"))
    }
    val fr = receipt("flags").collect().head
    val pf = CommitFlags(fr.getBoolean(0), fr.getBoolean(2),
      fr.getBoolean(3), fr.getBoolean(4), fr.getDouble(5),
      fr.getDouble(6))
    cardMemo.update((dir, k), (split, pf))
    card(committed("assigned"), split, flagsDf(firstCommit, sweptNow, pf))
  }

  /** The persisted (receipt-verified) half of sim31's flag row — what
    * the per-session card memo caches; the live half (`first_commit`,
    * `swept_now`) is computed per call. */
  private case class CommitFlags(whatifReused: Boolean, gone: Boolean,
    priced: Boolean, serve: Boolean, share: Double, pr: Double)

  /** Per-session (dir, k) → (generation split, receipt flags) — makes
    * the warm sim31 card constructible with zero spark jobs (the
    * IndexStoreSpec job-budget pin). Validated against the receipt's
    * marker on every read; dropped by [[dropIvfMemo]] and
    * [[invalidateCaches]]. */
  private val commitCardCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, Int),
        (Long, CommitFlags)]]()

  /** Store name of sim31's transition RECEIPT — the commit-time audit
    * artifact (verified flags + the swept set) published beside the
    * committed generation; its absence while the committed index
    * exists marks an interrupted transition to re-attempt. */
  private[graft] def commitReceiptName(k: Int): String =
    committedIvfName(k) + "_receipt"

  /** sim32's collapse verdict as a one-row gate read for the
    * lifecycle verbs: (top1_share, participation_ratio,
    * collapse_major) — one CovarianceSketch pass over the corpus. An
    * empty corpus reads healthy (nothing to veto; the commit would
    * fail on emptiness long before geometry matters). */
  private[graft] def spectrumGate(spark: SparkSession, dir: String)
      : (Double, Double, Boolean) = {
    val rows = sim32EmbeddingSpectrum(spark, dir)
      .select(col("top1_share"), col("participation_ratio"),
        col("collapse_major")).collect()
    if (rows.isEmpty) (0.0, 0.0, false)
    else (rows.head.getDouble(0), rows.head.getDouble(1),
      rows.head.getBoolean(2))
  }

  /** Store name of the PERSISTED gate verdict (r19 verdict ask #3) —
    * one tiny flag row published beside the indexes it fronts. The
    * store's dataset root already keys on the corpus fingerprint, so
    * "keyed by corpus_fp" is by construction: a rewritten corpus makes
    * the published verdict UNREACHABLE (recompute + republish), and a
    * matching fingerprint serves it to every fresh session for one
    * tiny parquet read — never a corpus-sized sketch pass. */
  private[graft] val SpectrumVerdictName = "spectrum_verdict"

  /** The gate read MEMOIZED per (session, dir, corpus-fingerprint) and
    * PERSISTED through the [[IndexStore]] (r19 verdict ask #3) — for
    * serve-path consumers that run per query rather than per
    * generation transition (the d12/d50/d51/d55 semantic-dedup vetoes
    * and sim31's commit gate). The old memo keyed on (session, dir)
    * alone, which coupled freshness to cost BOTH ways: every fresh
    * 100 TB session paid one full corpus pass before its first
    * semantic-dedup call, and a long-lived session kept trusting a
    * verdict for a corpus that had been rewritten under it. The
    * fingerprint in the memo key (ONE file listing, no jobs — the
    * store's own freshness probe) fixes the staleness half; the
    * published verdict artifact fixes the cost half. The sketch pass
    * now runs once per (corpus content, store lifetime) — every
    * session after the first reads the one-row artifact.
    * [[invalidateCaches]] drops the memo with the other corpus memos;
    * store invalidation drops the artifact. */
  private val gateCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, String),
        (Double, Double, Boolean)]]()
  private[graft] def spectrumGateCached(spark: SparkSession, dir: String)
      : (Double, Double, Boolean) = {
    val fp = IndexStore.fingerprint(spark, dir, "embeddings")
    perSession(gateCache, spark).getOrElseUpdate((dir, fp), {
      import spark.implicits._
      val verdict = IndexStore.loadOrBuild(spark, dir, "embeddings",
        SpectrumVerdictName) {
        val (share, pr, collapse) = spectrumGate(spark, dir)
        Seq("verdict" -> Seq((share, pr, collapse))
          .toDF("top1_share", "participation_ratio", "collapse_major"))
      }
      val r = verdict("verdict").collect().head
      (r.getDouble(0), r.getDouble(1), r.getBoolean(2))
    })
  }

  /** VETO a cosine-geometry consumer on a collapsed corpus (r18
    * verdict ask #7, second half): semantic dedup DELETES data by
    * cosine similarity, and representation collapse is exactly the
    * condition under which everything reads similar — running it
    * would mass-delete on noise. Throws with the measured spectrum;
    * healthy corpora pay one memoized sketch pass per session. */
  private[graft] def requireHealthyGeometry(spark: SparkSession,
      dir: String, consumer: String): Unit = {
    val (share, pr, collapse) = spectrumGateCached(spark, dir)
    if (collapse) throw new IllegalStateException(
      f"sim32 collapse_major vetoes $consumer " +
        f"(top1_share=$share%.4f, participation_ratio=$pr%.4f): " +
        "cosine similarity is noise on a collapsed corpus — fix the " +
        "embedding pipeline before trusting geometry consumers")
  }

  /** Drop this session's served-index memo for `dir` — the commit
    * verb's session-side cutover ([[sim31RetrainCommit]]); fresh
    * sessions cut over through the committed artifact's marker alone. */
  private[graft] def dropIvfMemo(spark: SparkSession, dir: String): Unit = {
    val m = perSession(ivfCache, spark)
    m.keys.filter(_._1 == dir).toSeq.foreach(m.remove)
    val c = perSession(commitCardCache, spark)
    c.keys.filter(_._1 == dir).toSeq.foreach(c.remove)
  }

  /** The generation boundary sim30 prices and sim31 commits: the
    * id-midpoint of the served assignment, via the shared helper
    * ([[graft.etl.Analyze.idMidpoint]]) in one agg(min, max) read —
    * both verbs MUST cut the same boundary or the committed index
    * would not be the priced one. */
  private def generationSplit(spark: SparkSession, base: IvfIndex): Long =
    graft.etl.Analyze.idMidpoint(
      base.assigned.select(col("vec_id")), col("vec_id"))
      .head().getLong(0)

  /** The sim30 kernel on explicit frames: `cur` = (vec_id, emb) rows
    * of the current generation, old/new centroid sets, and the new
    * quantizer's assignment of `cur`. One row. */
  private[graft] def retrainWhatif(cur: DataFrame,
      oldCenters: Array[Array[Double]], newCenters: Array[Array[Double]],
      newAssigned: DataFrame): DataFrame = {
    val spark = cur.sparkSession
    def scored(assigned: DataFrame,
               centers: Array[Array[Double]]): DataFrame = {
      import spark.implicits._
      val cf = centers.toIndexedSeq.zipWithIndex
        .map { case (c, i) => (i, c.toIndexedSeq) }.toDF("cell", "ctr")
      // ‖v − c‖² = v·v − 2 v·c + c·c, three fused codegen dots — the
      // quantization error each row pays under this quantizer
      assigned.join(broadcast(cf), Seq("cell"))
        .select(col("cell"),
          (graft.functions.VectorOps.vecDot(spark, col("emb"), col("emb"))
            - lit(2.0) * graft.functions.VectorOps.vecDot(spark,
              col("emb"), col("ctr"))
            + graft.functions.VectorOps.vecDot(spark, col("ctr"),
              col("ctr"))).as("sqd"))
    }
    def card(s: DataFrame, tag: String): DataFrame = {
      val occ = s.groupBy(col("cell")).agg(count(lit(1)).as("n"))
      val bal = occ.agg(
        (stddev_pop(col("n")) / avg(col("n"))).as(s"cv_$tag"),
        (max(col("n")).cast("double") / sum(col("n")))
          .as(s"max_share_$tag"))
      s.agg(avg(col("sqd")).as(s"mse_$tag"), count(lit(1)).as(s"n_$tag"))
        .crossJoin(broadcast(bal))
    }
    val oldSide = card(scored(ivfAssign(cur, oldCenters)
      .select(col("cell"), col("emb")), oldCenters), "old")
    val newSide = card(scored(
      cur.join(newAssigned, Seq("vec_id")).select(col("cell"), col("emb")),
      newCenters), "new")
    oldSide.crossJoin(newSide)
      .select(col("n_old").as("n_cur"),
        round(col("mse_old"), 4).as("mse_old"),
        round(col("mse_new"), 4).as("mse_new"),
        // Guarded gain (advisor r17): on a PERFECTLY-quantized
        // generation mse_old is 0.0 and the raw 1 − new/old is NaN —
        // which Spark orders ABOVE every number, so the ≥ 0.05 rung
        // would fire a spurious retrain on the one corpus that needs
        // it least. Zero error to improve on ⇒ gain is exactly 0.
        when(col("mse_old") > 0,
          round(lit(1.0) - col("mse_new") / col("mse_old"), 4))
          .otherwise(lit(0.0)).as("mse_gain"),
        round(col("cv_old"), 4).as("cv_old"),
        round(col("cv_new"), 4).as("cv_new"),
        round(col("max_share_old"), 4).as("max_share_old"),
        round(col("max_share_new"), 4).as("max_share_new"))
      .withColumn("retrain_recommended", col("mse_gain") >= 0.05)
  }

  /** SIM29 — dataset cartography over the sim27 kNN graph (r16 verdict
    * ask #3): the readout that makes the corpus-wide neighbor
    * structure actionable. Per frozen cell — member count, the mean
    * and min of its members' top-k neighbor cosines, and the isolate
    * share (members that emitted no edges: singleton cells, or
    * zero-norm vectors whose NaN scores dropped). Dense near-dup
    * swamps read high mean_knn_cos at low isolate_share (candidates
    * for d50-style pruning); sparse frontier cells read the opposite
    * (where new data adds information). `region` names the rung:
    * `dense_swamp` at mean ≥ [[graft.ext.Dedup.D50Tau]] (the dedup
    * τ — neighbors this close are deletion candidates, so the cell is
    * REDUNDANT), `sparse_frontier` when isolates dominate or nothing
    * scores, `mid` otherwise. Isolation takes PRECEDENCE: a cell
    * where isolates dominate reads sparse_frontier even if its few
    * scoring members average past τ (advisor r17 — the branch order
    * now matches this sentence, pinned on a contested hand cell).
    *
    * Scale shape: one aggregate over sim27's cell-bounded edge output
    * (O(N·k_neighbors) rows) per-source, then a left join back to the
    * k-cell assignment census and a k-row report — nothing
    * corpus-quadratic, and every aggregate combines map-side. Float
    * discipline: edge cosines are already round(4); the per-cell means
    * re-round(4) after averaging ≤ 5·cellsize rounded values (drift
    * bounded at the 16th decimal, three orders below the rounding).
    * Rows-only: k-means cells have no SQL form; SimilaritySpec pins
    * hand-cell extremes (a planted identical cluster reads
    * dense_swamp at cos 1.0; a singleton reads isolate_share 1.0
    * sparse_frontier). */
  def sim29KnnCartography(spark: SparkSession, dir: String): DataFrame = {
    val k = cellsFor(corpusSize(spark, dir))
    val base = ivfIndexFor(spark, dir, k)
    val assigned = base.assigned
      .select(col("cell"), col("vec_id"), col("emb"))
    knnCartography(assigned, knnGraph(assigned, kNeighbors = 5))
  }

  /** The sim29 kernel on explicit frames (unit-testable): `assigned`
    * is the (cell, vec_id, …) membership, `edges` the sim27 output. */
  private[graft] def knnCartography(assigned: DataFrame,
                                    edges: DataFrame): DataFrame = {
    val perSrc = edges.groupBy(col("src_id")).agg(
      avg(col("cos_sim")).as("src_mean"),
      min(col("cos_sim")).as("src_min"))
    assigned.select(col("cell"), col("vec_id").as("src_id"))
      .join(perSrc, Seq("src_id"), "left")
      .groupBy(col("cell")).agg(
        count(lit(1)).as("n_members"),
        round(avg(col("src_mean")), 4).as("mean_knn_cos"),
        round(min(col("src_min")), 4).as("min_knn_cos"),
        round(avg(when(col("src_mean").isNull, 1.0).otherwise(0.0)), 4)
          .as("isolate_share"))
      .withColumn("region",
        // Precedence per the docstring (advisor r17): isolates
        // DOMINATING a cell names it sparse_frontier even when its
        // few scoring members average past the dedup τ — half the
        // cell having no neighbors at all is the stronger signal
        // about the cell than the other half's tight cluster.
        when(col("isolate_share") >= 0.5 || col("mean_knn_cos").isNull,
            "sparse_frontier")
          .when(col("mean_knn_cos") >= Dedup.D50Tau, "dense_swamp")
          .otherwise("mid"))
      .orderBy(col("cell"))
  }

  /** Deterministic pseudo-random hyperplanes (fixed seed — reproducible
    * across runs and engines; no runtime entropy). */
  private[ext] def hyperplanes(nPlanes: Int, dim: Int): Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Plane count sized to the corpus: 2^planes buckets grow with N so the
    * expected bucket stays ≤ targetBucket rows and the within-bucket
    * self-join is O(N · targetBucket) — with a CONSTANT plane count it
    * degrades to O(N² / 2^planes), quadratic at 100 TB. Clamped to
    * [minPlanes, 24] (24 planes = 16M buckets — beyond that, recall loss
    * outweighs bucket shrinkage at any realistic corpus). */
  private[graft] def planesFor(n: Long, minPlanes: Int,
                               targetBucket: Int = 256): Int = {
    val needed = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.min(24, math.max(minPlanes, needed))
  }

  /** Cell count for a coarse quantizer used as a near-dup candidate key
    * ([[graft.ext.Curate.cellNearDupPairs]]): N/targetCell cells keep the
    * within-cell self-join O(N · targetCell) — a CONSTANT k degrades to
    * O(N²/k), quadratic at 100 TB, the same trap [[planesFor]] exists to
    * avoid. Floor of [[Sim4K]] so test-scale corpora land on the same
    * (dir, k) memo key as sim4 and the quantizer trains once for both. */
  private[graft] def cellsFor(n: Long, targetCell: Int = 256): Int =
    math.max(Sim4K, math.ceil(n.toDouble / targetCell).toInt)

  /** Keyed near-duplicate candidate+verify kernel, shared by sim3 (LSH
    * bucket key) and SemDeDup (k-means cell key): co-partitioned
    * self-join on `key`, exact cosine on candidates only, threshold
    * applied to the ROUNDED value (4 dp — the repo's float-determinism
    * rule, so both callers agree on borderline pairs). NaN cosines
    * (zero-norm vectors, e.g. failed or padded encodes) are dropped
    * explicitly: Spark orders NaN ABOVE every number, so without the
    * guard a single zero vector would pass any threshold, pair with its
    * entire bucket, and link the bucket into one dedup component — mass
    * false deletion downstream. */
  private[graft] def keyedNearDupPairs(keyed: DataFrame, key: String,
                                       threshold: Double): DataFrame = {
    val spark = keyed.sparkSession
    // The sim27 fan-out treatment (r16 verdict ask #1): the pair
    // stage's O(N·keysize) cosine fan-out is this kernel's dominant
    // cost, and its parallelism must not be hostage to the PROBE
    // side's partition count — a `keyed` frame small enough for one
    // side to broadcast (a store-served artifact loaded from few
    // files) would otherwise run the whole cosine stage on however
    // many tasks the input layout happened to give the left scan
    // (sim27 measured 5.1M cosines on TWO partitions, 7.5→1.76 s
    // with the explicit key exchange). In the sort-merge regime the
    // exchange is absorbed — the join needs hash partitioning on the
    // key anyway — so the extra shuffle materializes exactly where
    // the hazard does.
    val l = keyed.select(col(key), col("vec_id").as("id_a"), col("emb").as("emb_a"))
      .repartition(col(key))
    val r = keyed.select(col(key), col("vec_id").as("id_b"), col("emb").as("emb_b"))
    l.join(r, Seq(key))
      .filter(col("id_a") < col("id_b"))
      // the key rides along (SemDeDup's census groups by cell; sim3
      // drops it before its distinct) — r14 verdict ask #3: ONE pair
      // kernel for every keyed near-dup caller
      .select(col(key), col("id_a"), col("id_b"),
        round(VectorOps.vecCosine(spark, col("emb_a"), col("emb_b")), 4)
          .as("cos_sim"))
      .filter(!isnan(col("cos_sim")) && col("cos_sim") >= threshold)
  }

  private def planeLit(p: Array[Double]): Column = array(p.toIndexedSeq.map(lit): _*)

  /** Signature bucket: one bit per hyperplane (sign of the projection).
    * Projections use the fused codegen vec_dot — one loop per plane, no
    * per-element interpreted lambdas on the bucketing scan. */
  private def signature(spark: SparkSession, emb: Column,
                        planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(VectorOps.vecDot(spark, emb, planeLit(p)) > 0, lit(1L << i))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** Probe radius for sim2's registered serving point. A true neighbor
    * at angle θ agrees with the query on each sign bit with p = 1−θ/π,
    * so its signature lands within Hamming distance r of the query's
    * with probability Σ_{i≤r} C(b,i)·p^(b−i)·(1−p)^i. On near-random
    * corpora (θ≈60°, p≈0.67 — LSH's worst case, and exactly what the
    * testdata embeddings are) radius 1 at 8 planes caught ≈0.20 of the
    * true top-10 (sim20's r11 scorecard measured 0.2 — the formula and
    * the measurement agree); radius 3 lifts the same formula to ≈0.74.
    * Candidate volume stays CONSTANT in the corpus: Σ_{i≤3} C(b,i)
    * probe buckets × the [[planesFor]]-bounded ~256-row target bucket
    * (≈24k rows at 8 planes, ≈0.6M at the 24-plane clamp) — the probes
    * grow with the plane count, the plane count grows with log N, and
    * the bucket size stays flat, so serving cost is O(polylog N). */
  private[ext] val Sim2ProbeRadius = 3

  /** SIM2 — LSH-bucketed ANN top-k: candidates come from the query's
    * signature bucket plus all probe buckets within Hamming distance
    * [[Sim2ProbeRadius]] (multi-probe LSH, Lv et al. VLDB'07); exact
    * cosine only on candidates. The plane count scales with the corpus
    * ([[planesFor]], min 8) so bucket size stays bounded as data
    * grows. Rows-only for the driver — near-uniform cosine spectra are
    * LSH's worst case and no exact oracle can replay an approximate
    * result whose value IS the approximation. Recall vs brute force is
    * asserted in ScalaTest and priced against every other index family
    * in sim20's scorecard (≥0.6 at the registered operating point —
    * the r11 radius-1 point served 0.2, below serving grade). */
  def sim2AnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    sim2AnnLshDf(spark, e, planesFor(corpusSize(spark, dir), minPlanes = 8))
  }

  /** All XOR masks over `nPlanes` bits with popcount ≤ radius —
    * driver-side query planning (≤ 2,325 longs at the 24-plane clamp,
    * radius 3), broadcast as the probe list. */
  private[ext] def probeMasks(nPlanes: Int, radius: Int): Seq[Long] = {
    def combos(start: Int, left: Int): Seq[Long] =
      if (left == 0) Seq(0L)
      else (start until nPlanes).flatMap(i =>
        combos(i + 1, left - 1).map(_ | (1L << i)))
    (0 to radius).flatMap(combos(0, _))
  }

  /** Same ANN pipeline with an explicit plane count (unit-testable). */
  def sim2AnnLshDf(spark: SparkSession, embeddings: DataFrame,
                   nPlanes: Int, radius: Int = Sim2ProbeRadius): DataFrame = {
    val planes = hyperplanes(nPlanes, 64)
    val e = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("bucket", signature(spark, col("emb"), planes))
    val q = e.filter(col("vec_id") === 0)
      .select(col("emb").as("qemb"), col("bucket").as("qbucket"))
    val masks = probeMasks(nPlanes, radius)
    val probes = q.select(col("qemb"),
      explode(array(masks.map(lit): _*)).as("flip"), col("qbucket"))
      .select(col("qemb"), (col("qbucket").bitwiseXOR(col("flip"))).as("bucket"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(probes), Seq("bucket"))
      .select(col("vec_id"),
        round(VectorOps.vecCosine(spark, col("emb"), col("qemb")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** SIM3 — embedding near-duplicate pairs at scale: bucket both sides by
    * LSH signature, equi-join on the bucket, verify exact cosine on the
    * candidates. The join key makes this a co-partitioned hash join —
    * all-pairs never materializes — and the plane count scales with the
    * corpus ([[planesFor]], min 6) so the within-bucket self-join stays
    * linear in N as data grows. The testdata embeddings are near-random
    * (max pairwise cosine ≈0.51), so the report threshold is 0.25; a
    * production near-dup run would use ≥0.9 with the same plan.
    * Rows-only — the single-bucket pair set is a recall SAMPLE by
    * design (a 0.25-cosine pair shares all ~11 sign bits with
    * probability ≈(1−θ/π)^planes ≈ 0.04), so unlike d7/d15/d18 there
    * is no exact predicate an oracle could replay; subset-monotonicity
    * in the plane count is what ScalaTest pins instead. */
  def sim3NearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    val e0 = Tables.embeddings(spark, dir)
    sim3NearDupPairsDf(spark, e0, planesFor(corpusSize(spark, dir), minPlanes = 6))
  }

  /** Same near-dup pipeline with an explicit plane count (unit-testable). */
  def sim3NearDupPairsDf(spark: SparkSession, embeddings: DataFrame,
                         nPlanes: Int): DataFrame = {
    val planes = hyperplanes(nPlanes, 64)
    val e = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("bucket", signature(spark, col("emb"), planes))
    keyedNearDupPairs(e, "bucket", threshold = 0.25)
      // a pair co-bucketed under several keys must report once: drop
      // the key before the distinct
      .select(col("id_a"), col("id_b"), col("cos_sim"))
      .distinct()
      .orderBy(col("id_a"), col("id_b"))
  }

  /** SIM4 — IVF (inverted-file) ANN: a k-means coarse quantizer learned
    * from the corpus partitions vectors into `k` cells; a query probes
    * only its `nProbe` nearest cells and runs exact cosine there.
    * Complementary to LSH (sim2): IVF cells are data-adaptive (they
    * follow the embedding distribution; hyperplanes are oblivious), so
    * candidate quality per probe is higher — at the cost of a training
    * pass. At 100 TB: train on a sample, broadcast the k×d centroid
    * table, assignment is one map pass, and cells map to bucketed
    * storage so probing prunes partitions. Choosing probe cells is
    * driver-side argmin over k centroids — query planning, not data
    * work. Rows-only (cell layout is engine-specific); nProbe=k
    * equivalence with brute force is asserted in ScalaTest. */
  /** The registered query's cell count — shared with Bench's
    * serving-state warmup so the two can't drift onto different cache
    * keys (a mismatch would silently time index REBUILD, not serving). */
  val Sim4K = 16

  def sim4IvfAnn(spark: SparkSession, dir: String): DataFrame =
    ivfServe(spark, ivfIndexFor(spark, dir, Sim4K), queryVecId = 0L, nProbe = 3)

  /** A built IVF index: the per-vector cell assignment plus the k×d
    * centroid table. Build ONCE, serve many queries — training and the
    * corpus-wide assignment amortize across the query stream (and at
    * scale `assigned` would be written bucketed by cell so probes prune
    * storage partitions). */
  final case class IvfIndex(assigned: DataFrame, centers: Array[Array[Double]])

  /** Index phase: train the coarse quantizer (5 Lloyd iterations —
    * cell quality only affects recall-per-probe, never correctness) and
    * assign every vector to its cell in one map pass. */
  def ivfIndex(embeddings: DataFrame, k: Int): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("features", array_to_vector(col("emb")))
    val model = new KMeans().setK(k).setSeed(7).setMaxIter(5).fit(e)
    IvfIndex(
      model.transform(e)
        .select(col("vec_id"), col("emb"), col("prediction").as("cell")),
      model.clusterCenters.map(_.toArray))
  }

  /** Query phase: probe the `nProbe` cells nearest the query vector and
    * run exact cosine there. Probe selection is driver-side argmin over
    * the k broadcast centroids — query planning, not data work.
    * `excludeVecId = None` excludes nothing (no in-band sentinel — any
    * id value is a legal corpus member). */
  def ivfQuery(spark: SparkSession, index: IvfIndex, q: Array[Double],
               nProbe: Int, excludeVecId: Option[Long] = None): DataFrame = {
    require(q.length == index.centers.head.length,
      s"query dim ${q.length} != index dim ${index.centers.head.length}")
    require(nProbe >= 1,
      s"nProbe must be >= 1, got $nProbe (0 probes = silently empty result)")
    val probeCells = index.centers.zipWithIndex
      .map { case (c, i) =>
        val d = c.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    val qDf = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(q.toSeq)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qemb",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType, containsNull = false)))))
    index.assigned
      .filter(excludeVecId.map(col("vec_id") =!= _).getOrElse(lit(true)) &&
        col("cell").isin(probeCells.toIndexedSeq.map(Integer.valueOf): _*))
      .crossJoin(broadcast(qDf))
      .select(col("vec_id"),
        round(VectorOps.vecCosine(spark, col("emb"), col("qemb")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(10)
  }

  /** Memoized per-(session, dir, k) IVF index — the SERVING shape. The
    * expensive phases (k-means training + corpus-wide cell assignment)
    * run ONCE per session and materialize via `localCheckpoint`; every
    * subsequent query is probe-planning against the broadcast centroids
    * plus a scan of the probed cells only — no training job, no
    * re-assignment. This is the 100 TB contract: an ANN index is built by
    * an ingest job and serves a query STREAM; rebuilding the quantizer
    * per query would make query cost O(corpus), which no scale survives.
    * Keyed by session so separate sessions never share lineage; the
    * testdata dirs are immutable for a session's lifetime, matching the
    * memoization contract (same as [[corpusSize]]; refresh with
    * [[invalidateCaches]]); weak session keys stop a dead session from
    * pinning its checkpointed index forever. */
  // The cached value is (temp-view NAME, centers) — never the IvfIndex
  // itself: its `assigned` DataFrame strongly references the
  // SparkSession through QueryExecution, and WeakHashMap VALUES hold
  // strong refs, so an index-valued entry would pin the weak session
  // key (and the checkpoint blocks) forever (the pairGraphFor
  // contract). The view lives in the session's own catalog and dies
  // with it; the centers are plain arrays.
  private val ivfCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, Int),
        (String, Array[Array[Double]])]]()
  def ivfIndexFor(spark: SparkSession, dir: String, k: Int): IvfIndex = {
    val (view, centers) =
      perSession(ivfCache, spark).getOrElseUpdate((dir, k), {
        // Load-or-train through the per-DATASET store (r13): k-means +
        // corpus assignment run in whichever session first serves this
        // (dataset fingerprint, k); every later session — including
        // every future JVM — reads the published parquet and pays zero
        // training jobs. The eager localCheckpoint then pins the LOADED
        // assignment for this session's query stream, exactly as the
        // freshly-trained copy was pinned before (and a second builder
        // racing through getOrElseUpdate just loads the winner's copy).
        //
        // A COMMITTED retrain generation (sim31) outranks the base
        // artifact: its marker-gated publish IS the generation pointer
        // — complete-or-invisible, so the cutover is atomic by the
        // store's existing correctness carrier, every consumer of this
        // serve path migrates with zero code awareness, and the swept
        // base can never be resurrected by a later serve (its build
        // closure below only runs when NO committed generation exists).
        val parts = IndexStore
          .loadIfPublished(spark, dir, "embeddings", committedIvfName(k))
          .getOrElse {
            IndexStore.loadOrBuild(spark, dir, "embeddings",
              s"ivf_k$k") {
              val idx = ivfIndex(Tables.embeddings(spark, dir), k)
              Seq("assigned" -> idx.assigned,
                "centers" -> centersFrame(spark, idx.centers))
            }
          }
        val name = s"ivf_idx_${k}_" + dirTag(dir)
        parts("assigned").localCheckpoint(true).createOrReplaceTempView(name)
        (name, collectCenters(parts("centers")))
      })
    IvfIndex(spark.table(view), centers)
  }

  /** Driver-side training constants (centroids, codebooks) rendered as
    * tiny frames, so ONE atomic [[IndexStore]] publish carries the code
    * frames AND the constants they were encoded against — a reader can
    * never pair one training's codes with another's codebooks. */
  private def centersFrame(spark: SparkSession,
                           centers: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    centers.toIndexedSeq.zipWithIndex
      .map { case (c, i) => (i, c.toIndexedSeq) }.toDF("cell", "center")
  }
  private def collectCenters(df: DataFrame): Array[Array[Double]] =
    df.select(col("cell"), col("center")).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).map(_._2)
  private def booksFrame(spark: SparkSession,
                         books: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    (for {
      (bk, j) <- books.toIndexedSeq.zipWithIndex
      (c, code) <- bk.toIndexedSeq.zipWithIndex
    } yield (j, code, c.toIndexedSeq)).toDF("subspace", "code", "center")
  }
  private def collectBooks(df: DataFrame): Array[Array[Array[Double]]] =
    df.select(col("subspace"), col("code"), col("center")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_._2).map(_._3).toArray).toArray

  /** Serve one ANN lookup (query = a corpus member by id) from a BUILT
    * index. Missing query id → empty result, not a crash. */
  def ivfServe(spark: SparkSession, index: IvfIndex, queryVecId: Long,
               nProbe: Int): DataFrame = {
    val qRows = index.assigned.filter(col("vec_id") === queryVecId)
      .select(col("emb")).take(1)
    if (qRows.isEmpty)
      return index.assigned.select(col("vec_id"),
        lit(0.0).as("cos_sim")).limit(0)
    ivfQuery(spark, index, qRows.head.getSeq[Double](0).toArray,
      nProbe, excludeVecId = Some(queryVecId))
  }

  /** Index + one query in a single call (unit-test shape — production
    * and the registered query serve from [[ivfIndexFor]] instead). */
  def ivfAnn(spark: SparkSession, embeddings: DataFrame,
             k: Int, nProbe: Int): DataFrame =
    ivfServe(spark, ivfIndex(embeddings, k), queryVecId = 0L, nProbe)

  /** SIM5 — per-label embedding centroids (class prototypes) through the
    * mergeable [[graft.functions.VectorMean]] Aggregator: one d-dim sum
    * buffer per (partition, label) shuffles — NOT the posexplode
    * formulation, whose shuffle is d× the corpus. The (tiny) k×d result
    * is then exploded only for display/oracle comparison (first 8 dims,
    * rounded). The primitive behind class-balanced sampling, centroid
    * initialization, and embedding-drift monitoring. */
  def sim5LabelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val vmean = udaf(new graft.functions.VectorMean(64))
    Tables.embeddings(spark, dir)
      .select(col("label"), asDouble(col("embedding")).as("emb"))
      .groupBy(col("label"))
      // count(emb), not count(*): null embeddings are skipped by the
      // aggregator AND by the oracle's unnest, so n_vecs must be the
      // centroid's actual denominator
      .agg(count(col("emb")).as("n_vecs"), vmean(col("emb")).as("centroid"))
      .select(col("label"), col("n_vecs"),
        posexplode(col("centroid")).as(Seq("dim", "c")))
      .filter(col("dim") < 8)
      .select(col("label"), col("n_vecs"), col("dim"),
        round(col("c"), 4).as("centroid"))
      .orderBy(col("label"), col("dim"))
  }

  /** Batch k-NN join: exact top-k cosine neighbors for every vector in
    * `queries` (sim1's single-query shape generalized — the retrieval
    * primitive behind dataset linking, hard-negative mining, and
    * eval-set neighbor audits). The query FRAME is the caller's
    * boundedness contract — a query workload, not a corpus — and it
    * BROADCASTS; the corpus streams through the nested-loop scoring pass
    * once, and only narrow (q_id, vec_id, cos_sim) rows reach the
    * per-query top-k window — embeddings never shuffle. Ranking compares
    * the ROUNDED score with vec_id tie-break (the t6 lesson: round
    * BEFORE ranking, so libm ulps can't flip ranks between engines).
    * NaN cosines are dropped (same hazard [[keyedNearDupPairs]] guards:
    * both Spark and DuckDB sort NaN ABOVE every number, so one zero-norm
    * embedding would silently occupy a top-k slot of EVERY query — and
    * the oracle would agree, hiding it). Shuffle volume is N·|Q| narrow
    * rows; for |Q| beyond a workload's worth of queries the IVF path
    * (sim4) is the right tool instead. */
  def knnJoinDf(spark: SparkSession, embeddings: DataFrame,
                queries: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val q = queries.select(col("vec_id").as("q_id"),
      asDouble(col("embedding")).as("qemb"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorOps.vecCosine(spark, col("emb"), col("qemb")), 4)
          .as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")
      .orderBy(col("q_id"), col("cos_sim").desc, col("vec_id"))
  }

  /** SIM6 — registered batch k-NN join: top-3 neighbors for every 97th
    * vector, CAPPED at 32 queries (ordered by id, so the cap is
    * deterministic). The cap is what makes the registered query's
    * broadcast side genuinely bounded — an uncapped corpus-fraction mod
    * would grow with N and turn the scoring pass quadratic. */
  def sim6KnnJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") % 97 === 0)
      .orderBy(col("vec_id")).limit(32)
    knnJoinDf(spark, e, queries, k = 3)
  }

  /** Radius (range) similarity search: ALL neighbors within cosine ≥
    * `tau` of each query — the retrieval shape behind threshold-based
    * linking and near-duplicate audits, where k-NN's fixed k truncates
    * dense neighborhoods and pads sparse ones. Same scale contract as
    * [[knnJoinDf]]: the bounded query frame broadcasts, the corpus
    * streams through the scoring pass once, only narrow
    * (q_id, vec_id, cos_sim) rows come out — and unlike k-NN there is
    * no per-query window at all: the threshold is a per-row filter, so
    * the only shuffle anywhere is the presentation sort. Rounds BEFORE
    * comparing (the t6 device) so a libm ulp cannot flip a row across
    * the tau boundary between engines; NaN cosines drop for the sim6
    * reason. */
  def radiusJoinDf(spark: SparkSession, embeddings: DataFrame,
                   queries: DataFrame, tau: Double): DataFrame = {
    val e = embeddings.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val q = queries.select(col("vec_id").as("q_id"),
      asDouble(col("embedding")).as("qemb"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        round(VectorOps.vecCosine(spark, col("emb"), col("qemb")), 4)
          .as("cos_sim"))
      .filter(!isnan(col("cos_sim")) && col("cos_sim") >= tau)
      .orderBy(col("q_id"), col("cos_sim").desc, col("vec_id"))
  }

  /** SIM8 — registered radius search: sim6's capped query set, all
    * neighbors at cosine ≥ 0.3 (chosen above the synthetic corpus's
    * 99th-percentile pairwise cosine, so the result exercises the
    * threshold rather than returning everything). */
  def sim8RadiusSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") % 97 === 0)
      .orderBy(col("vec_id")).limit(32)
    radiusJoinDf(spark, e, queries, tau = 0.3)
  }

  /** SIM9 — embedding-norm QC report: per label, the count / rounded
    * avg/min/max of L2 norms plus zero-norm and small-norm counts. The
    * pre-indexing gate every ANN deployment runs: a zero-norm vector is
    * the NaN hazard sim6/sim8 must guard per query (catch it at ingest
    * instead), and a cluster of tiny norms usually means a broken
    * encoder batch. Pure per-row HOF arithmetic (one pass, no shuffle
    * before the per-label agg); thresholds compare the ROUNDED norm so
    * a libm ulp can't move a count between engines. Null embeddings are
    * excluded on both sides (Spark HOF and DuckDB unnest agree). */
  def sim9NormQc(spark: SparkSession, dir: String): DataFrame =
    normQcDf(Tables.embeddings(spark, dir))

  /** The same QC over any (label, embedding) frame — unit-testable on
    * planted vectors. */
  def normQcDf(embeddings: DataFrame): DataFrame =
    embeddings
      .filter(col("embedding").isNotNull)
      .select(col("label"),
        round(sqrt(aggregate(asDouble(col("embedding")), lit(0.0),
          (acc, x) => acc + x * x)), 4).as("norm"))
      .groupBy(col("label")).agg(
        count(lit(1)).as("n_vecs"),
        round(avg(col("norm")), 4).as("avg_norm"),
        min(col("norm")).as("min_norm"),
        max(col("norm")).as("max_norm"),
        sum(when(col("norm") === 0.0, 1L).otherwise(0L)).as("n_zero"),
        sum(when(col("norm") < 0.5, 1L).otherwise(0L)).as("n_small"))
      .orderBy(col("label"))

  /** Batch IVF serving scan for a bounded query frame at the LARGEST
    * nProbe a consumer will read: probe planning runs IN the plan — a
    * Q×k centroid cross join plus a per-query probe-rank window, both
    * query-workload-sized — so a query BATCH serves with no per-query
    * driver loop (the loop-shaped alternative schedules Q jobs; this is
    * one). The corpus-side work is one equi-join of the probed (q_id,
    * cell) pairs against the cell-assigned index — exactly the pruning
    * IVF exists to buy. Emits the probe rank alongside each scored
    * candidate because probe sets NEST (same (dist, cell) centroid
    * ordering for every nProbe): the nProbe-p serve is exactly the
    * rows with cell_rank ≤ p, so a recall GRID is per-point filters
    * over this one scan instead of one corpus scan per grid point
    * (r22, guide §2.3/§2.4). */
  private def ivfScoredScan(spark: SparkSession, index: IvfIndex,
                            queries: DataFrame, maxProbe: Int): DataFrame = {
    import spark.implicits._
    val centersDf = index.centers.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "cemb")
    val q = queries.select(col("vec_id").as("q_id"),
      asDouble(col("embedding")).as("qemb"))
    val wProbe = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id")).orderBy(col("dist"), col("cell"))
    val probed = q.crossJoin(broadcast(centersDf))
      .withColumn("dist", aggregate(zip_with(col("qemb"), col("cemb"),
        (a, b) => (a - b) * (a - b)), lit(0.0), (acc, x) => acc + x))
      .withColumn("cell_rank", row_number().over(wProbe))
      .filter(col("cell_rank") <= maxProbe)
      .select(col("q_id"), col("qemb"), col("cell"), col("cell_rank"))
    index.assigned.join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("cell_rank"),
        round(VectorOps.vecCosine(spark, col("emb"), col("qemb")), 4)
          .as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
  }

  /** The exact-kNN ground truth both recall audits (sim11, sim17)
    * compare against, memoized per (session, dir, nQueries, topK) —
    * the covSketch/sessionSpans device (r22): the benchmark query set
    * (every 97th vec_id, deterministic cap) and the brute-force
    * truth are IDENTICAL derivations in both queries, so the
    * corpus×queries cosine pass runs once per session instead of once
    * per grid invocation. Session-scoped only (weak key, eager
    * checkpoint behind a dir-tagged view — nothing persists across
    * runs); each audit's own serving scans, windows and recall
    * aggregates stay fully inside its timed line. */
  private val knnTruthCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, Int, Int), String]]()
  private def knnTruthFor(spark: SparkSession, dir: String,
                          nQueries: Int, topK: Int): DataFrame = {
    val view = perSession(knnTruthCache, spark)
      .getOrElseUpdate((dir, nQueries, topK), {
        val e = Tables.embeddings(spark, dir)
        val qs = e.filter(col("vec_id") % 97 === 0)
          .orderBy(col("vec_id")).limit(nQueries)
        val name = s"knn_truth_${nQueries}_${topK}_" + dirTag(dir)
        knnJoinDf(spark, e, qs, topK)
          .select(col("q_id"), col("vec_id"))
          .localCheckpoint(true).createOrReplaceTempView(name)
        name
      })
    spark.table(view)
  }

  /** SIM11 — the ANN self-evaluation every deployment runs to TUNE
    * nProbe: recall@topK of served IVF vs the exact k-NN ground truth
    * (sim6's kernel) over a bounded query sample, one row per probed
    * nProbe. Two invariants hold BY CONSTRUCTION and are pinned in
    * SimilaritySpec: probe sets nest as nProbe grows (same centroid
    * ordering), so with one total order on rounded scores the hit count
    * is monotone non-decreasing; and nProbe = k probes every cell, so
    * the last row is exactly recall 1.0 — the row that proves the
    * harness itself is sound. Rows-only (recall depends on the trained
    * cell layout). */
  def ivfRecallCurve(spark: SparkSession, dir: String, probes: Seq[Int],
                     nQueries: Int = 16, topK: Int = 10): DataFrame = {
    require(probes.nonEmpty, "need at least one nProbe to evaluate")
    val idx = ivfIndexFor(spark, dir, Sim4K)
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") % 97 === 0)
      .orderBy(col("vec_id")).limit(nQueries)
    // session-memoized brute truth (shared with sim17 — same query set,
    // same topK); the hit join and the denominator both read the pin
    val exact = knnTruthFor(spark, dir, nQueries, topK)
    val nExact = exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
    // ONE serving scan at max(probes), pinned narrow (r22, guide
    // §2.3/§2.4): probe sets nest, so every grid point's candidate set
    // is a cell_rank filter over this frame — |probes| corpus scans +
    // cosine passes collapse to one. The per-probe top-K windows and
    // recall aggregates likewise collapse into ONE probe-tagged pass
    // (explode the literal probe list, filter cell_rank ≤ n_probe,
    // window partitioned by (n_probe, q_id)): a row_number within the
    // (n_probe, q_id) partition over exactly the rows of that probe's
    // candidate set is the per-probe serve's own ranking, so outputs
    // are bit-identical while |probes| windows + |probes| aggregate
    // chains become one of each.
    val scored = ivfScoredScan(spark, idx, queries, probes.max)
      .localCheckpoint(true)
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_probe"), col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val hitCounts = scored
      .withColumn("n_probe", explode(typedlit(probes)))
      .filter(col("cell_rank") <= col("n_probe"))
      .withColumn("rn", row_number().over(wTop))
      .filter(col("rn") <= topK)
      .select(col("n_probe"), col("q_id"), col("vec_id"))
      .join(exact, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("n_probe"), col("q_id"))
      .agg(count(lit(1)).as("n_hit"))
    val perProbe = nExact
      .withColumn("n_probe", explode(typedlit(probes)))
      .join(hitCounts, Seq("n_probe", "q_id"), "left")
      .select(col("n_probe"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_exact")).as("recall"))
      .groupBy(col("n_probe"))
      .agg(count(lit(1)).as("n_queries"),
        round(avg(col("recall")), 4).as("avg_recall"),
        round(min(col("recall")), 4).as("min_recall"))
    // the probe spine keeps the zero-query corpus contract: the grid
    // always emits one row per probe (n_queries 0, null recalls), the
    // shape the per-point global aggregates produced
    val spine = spark.range(1)
      .select(explode(typedlit(probes)).as("n_probe"))
    spine.join(perProbe, Seq("n_probe"), "left")
      .select(col("n_probe"),
        coalesce(col("n_queries"), lit(0L)).as("n_queries"),
        col("avg_recall"), col("min_recall"))
      .orderBy(col("n_probe"))
  }

  /** SIM11 registered shape: the nProbe sweep up to full coverage. */
  def sim11IvfRecall(spark: SparkSession, dir: String): DataFrame =
    ivfRecallCurve(spark, dir, Seq(1, 2, 4, Sim4K))

  /** SIM10 — centroid-separation audit: pairwise cosine between the
    * per-label class prototypes (sim5's centroids). The embedding-space
    * answer to "are my labels separable?" — two prototypes near cosine 1
    * mean the classes collide (mislabeled data or a collapsed encoder)
    * BEFORE anyone trains on them. Scale shape: the corpus collapses to
    * L mergeable `VectorMean` buffers (one d-dim row per label, partial
    * aggregation); the pairwise stage is an L-row self-join — L² pairs
    * of LABELS, never of vectors — scored by the fused codegen cosine.
    * NaN (zero-norm centroid) pairs are dropped on both sides, the
    * sim8 guard. */
  def sim10CentroidSeparation(spark: SparkSession, dir: String): DataFrame =
    centroidSeparationDf(Tables.embeddings(spark, dir), dim = 64)

  /** The same audit over any (label, embedding) frame — dim-injectable
    * for planted-cluster specs. */
  def centroidSeparationDf(embeddings: DataFrame, dim: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val vmean = udaf(new graft.functions.VectorMean(dim))
    val cents = embeddings
      .filter(col("embedding").isNotNull)
      .select(col("label"), asDouble(col("embedding")).as("emb"))
      .groupBy(col("label")).agg(vmean(col("emb")).as("centroid"))
    val l = cents.select(col("label").as("label_a"), col("centroid").as("ca"))
    val r = cents.select(col("label").as("label_b"), col("centroid").as("cb"))
    l.join(r, col("label_a") < col("label_b"))
      .select(col("label_a"), col("label_b"),
        round(graft.functions.VectorOps.vecCosine(spark, col("ca"), col("cb")), 4)
          .as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
      .orderBy(col("label_a"), col("label_b"))
  }

  /** SIM13 — embedding drift between two corpus snapshots: per label,
    * 1 − cosine of the v1 and v2 centroids — the MLOps monitor beside
    * d26's content diff (a re-embedding run, encoder upgrade, or data
    * shift moves class centroids BEFORE it moves eval metrics; this is
    * the number a retraining alarm thresholds). Scale shape: each
    * snapshot collapses to L mergeable `VectorMean` buffers (sim5's
    * partial-agg discipline — the corpus never shuffles vectors), the
    * comparison is an L-row equi-join, and the drift arithmetic runs on
    * L rows. `+ 0.0` normalizes the IEEE −0.0 an undrifted label can
    * round to (cos marginally above 1 from fp accumulation) so both
    * engines print identical zeros. */
  def embeddingDriftDf(v1: DataFrame, v2: DataFrame, dim: Int): DataFrame = {
    val spark = v1.sparkSession
    val vmean = udaf(new graft.functions.VectorMean(dim))
    def cents(df: DataFrame, cName: String, keepN: Boolean): DataFrame = {
      val base = df.filter(col("embedding").isNotNull)
        .select(col("label"), asDouble(col("embedding")).as("emb"))
        .groupBy(col("label"))
      if (keepN) base.agg(count(col("emb")).as("n_vecs"), vmean(col("emb")).as(cName))
      else base.agg(vmean(col("emb")).as(cName))
    }
    cents(v1, "c1", keepN = true)
      .join(cents(v2, "c2", keepN = false), Seq("label"))
      .select(col("label"), col("n_vecs"),
        (round(lit(1.0) - VectorOps.vecCosine(spark, col("c1"), col("c2")), 4)
          + lit(0.0)).as("drift"))
      .filter(!isnan(col("drift")))
      .orderBy(col("drift").desc, col("label"))
  }

  /** SIM32 — embedding SPECTRUM / anisotropy QC card: the covariance
    * eigen-spectrum of the corpus embedding distribution, read as an
    * effective-dimensionality card — the representation-collapse
    * detector (Ethayarajh 2019's anisotropy; Gao et al. 2019's
    * representation degeneration) a pipeline checks BEFORE trusting
    * any geometry consumer: every ANN index (sim2/4/7/15/16/21), the
    * semantic dedup tier (d50/d51/d55), and the k-means quantizer
    * itself silently degrade when the corpus collapses toward a few
    * directions, and none of the per-vector QC cards (sim9 norms,
    * sim12 quantization, sim13 drift) can see it — collapse is a
    * property of the DISTRIBUTION, not of any row.
    *
    * Card (one row): n_vecs, dim, trace (total variance), top-3
    * eigenvalues, top1_share (λ₁/trace — the anisotropy dominance),
    * participation_ratio PR = (Σλ)²/Σλ² ∈ [1, d] (the effective
    * number of variance-carrying directions; the physics estimator
    * Roy & Vetterli 2007 relate to effective rank), and
    * `collapse_major` at the rung top1_share ≥ 0.5 ∨ PR ≤ d/8 ∨
    * trace = 0 (half the variance in ONE direction, or fewer than
    * d/8 effective dimensions, or a constant corpus).
    *
    * Scale shape: ONE aggregate through the [[graft.functions
    * .CovarianceSketch]] Aggregator — each partition folds its
    * vectors into a constant-size (1 + d + d(d+1)/2 doubles) buffer
    * locally and ships exactly one partial per partition (the
    * VectorMean discipline: the posexplode² dataflow alternative
    * inflates the scan by d² = 4096×); the buffer is an additive
    * monoid, so partial agg / AQE / a streaming fold combine it
    * identically. Covariance assembly and the cyclic-Jacobi eigen
    * solve (deterministic: fixed sweep order, off-diagonal-norm
    * convergence) are O(d³) driver arithmetic on the ONE collected
    * 2145-double row — the g7/sim14 bounded-collect contract.
    * Numerically-negative eigenvalues (Jacobi noise at machine eps)
    * clamp to 0 before the share/PR sums so PR stays in [1, d];
    * an all-null or empty corpus returns an EMPTY card (nothing to
    * report), and a zero-variance corpus reads trace 0 / shares 0 /
    * collapse_major true. Rows-only by design (no SQL engine replays
    * an eigen solve — the g7 treatment); SimilaritySpec pins
    * hand-computed spectra (axis-aligned exact eigenvalues, rotation
    * invariance, rank-1 collapse, zero-variance, null-skip) and the
    * registered card's healthy-corpus reading. */
  def sim32EmbeddingSpectrum(spark: SparkSession, dir: String): DataFrame =
    spectrumCardFromFlat(spark, covSketchFlatFor(spark, dir, 64), 64)

  /** The sim32 kernel on an explicit (embedding: array) frame. */
  private[graft] def embeddingSpectrum(df: DataFrame, dim: Int): DataFrame =
    spectrumCardFromFlat(df.sparkSession, covSketchFlat(df, dim), dim)

  /** ONE CovarianceSketch pass over (embedding) rows → the flattened
    * sufficient statistic [n, sums…, upper-tri cross…] — the shared
    * corpus-sized stage of the sim32 spectrum card and sim33's PCA
    * basis (each partition ships one constant-size buffer; everything
    * after is driver arithmetic on the ONE collected row). The sketch
    * runs TOLERANT (advisor r19): a NaN/Inf row skips — alongside the
    * existing null skip — so the gate measures the finite sub-corpus
    * the dedup kernels actually operate on (they deliberately drop NaN
    * cosines to tolerate failed or padded encodes; a gate that threw
    * on those rows would turn previously-working queries into errors).
    * The skip lives inside the Aggregator's typed reduce loop, not a
    * per-element interpreted-HOF filter in front of it (the house
    * ~1.4 µs/term receipt) — zero extra scan cost. The strict sketch
    * API keeps the throw. */
  private[graft] def covSketchFlat(df: DataFrame, dim: Int): Seq[Double] = {
    val sketch =
      udaf(new graft.functions.CovarianceSketch(dim, tolerateNonFinite = true))
    df.filter(col("embedding").isNotNull)
      .select(asDouble(col("embedding")).as("emb"))
      .agg(sketch(col("emb")).as("flat"))
      .collect().head.getSeq[Double](0)
  }

  /** The corpus sketch memoized per (session, dir, dim) — the
    * co-presence-graph device applied to the spectrum/PCA tier (r22,
    * r21 verdict ask #4): sim32's card, sim33's basis and sim35's rank
    * curve all start from the SAME flattened sufficient statistic of
    * the same corpus, so the corpus-sized sketch pass runs once per
    * session and every consumer's tail is driver arithmetic on the one
    * collected row. Session-scoped only (WeakHashMap on the session —
    * nothing persists across runs); the value is the plain collected
    * Seq, which pins no DataFrame and therefore can't leak the weak
    * session key. Frame-level kernels keep calling [[covSketchFlat]]
    * directly, so planted-frame specs never share state. */
  private val covSketchCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[(String, Int), Seq[Double]]]()
  private[graft] def covSketchFlatFor(spark: SparkSession, dir: String,
                                      dim: Int): Seq[Double] =
    perSession(covSketchCache, spark).getOrElseUpdate((dir, dim),
      covSketchFlat(Tables.embeddings(spark, dir).select(col("embedding")),
        dim))

  /** The sim32 card tail from a flattened covariance sketch
    * ([n, sums…, upper-tri cross…]) — ONE definition shared by the
    * batch kernel above and the [[graft.streaming.SpectrumFold]] live
    * twin, so serve ≡ batch is by construction at the card level. */
  private[graft] def spectrumCardFromFlat(spark: SparkSession,
      flat: Seq[Double], dim: Int): DataFrame = {
    import spark.implicits._
    val (n, cov) = graft.functions.CovarianceSketch.covarianceOf(flat, dim)
    val empty = Seq.empty[(Long, Int, Double, Double, Double, Double,
      Double, Double, Boolean)].toDF("n_vecs", "dim", "trace", "top1",
      "top2", "top3", "top1_share", "participation_ratio", "collapse_major")
    if (n == 0) return empty
    val eigs = graft.functions.CovarianceSketch.jacobiEigenvalues(cov)
      .map(l => math.max(l, 0.0))
    val trace = eigs.sum
    // Non-finite values pass through unrounded (advisor r18:
    // BigDecimal(NaN) throws NumberFormatException — the sketch already
    // fails fast on non-finite INPUT, so this is defense in depth for
    // accumulator overflow, which should read as an Inf in the card,
    // not crash the rounding).
    def rd(x: Double, s: Int): Double =
      if (!java.lang.Double.isFinite(x)) x
      else BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val (share, pr) =
      if (trace > 0) (eigs.head / trace,
        trace * trace / eigs.map(l => l * l).sum)
      else (0.0, 0.0)
    val collapse = trace <= 0 || share >= 0.5 || pr <= dim / 8.0
    Seq((n, dim, rd(trace, 6), rd(eigs(0), 6),
      rd(if (dim > 1) eigs(1) else 0.0, 6),
      rd(if (dim > 2) eigs(2) else 0.0, 6),
      rd(share, 4), rd(pr, 4), collapse))
      .toDF("n_vecs", "dim", "trace", "top1", "top2", "top3",
        "top1_share", "participation_ratio", "collapse_major")
  }

  /** SIM33 — PCA projection: the spectrum tier's ACT verb (r18
    * verdict ask #2), exactly as sim31 is sim28/sim30's. sim32
    * DIAGNOSES how many directions carry the corpus's variance; this
    * operator ACTS on that reading — projects every embedding onto
    * the top-r principal directions (optionally whitened) and PROVES
    * the act with the sim20 recall device: top-10 cosine retrieval in
    * the r-dim projected space scored against the full-space brute
    * truth on the shared benchmark lookup (vec_id 0). The card is the
    * go/no-go a fleet reads before flipping ANN serving to
    * PCA-reduced vectors (dim/r × memory and scan speed — the same
    * decision sim19 grades for random projection, except PCA spends
    * its r dimensions on the MEASURED variance-carrying directions,
    * so on low-rank corpora it keeps geometry JL provably cannot):
    * high variance_captured + high recall ⇒ reduce; an isotropic
    * corpus reads low on both ⇒ don't — the honest no-go.
    *
    * Scale shape: the basis is the sim32 sketch re-read — ONE
    * constant-buffer-per-partition CovarianceSketch pass
    * ([[covSketchFlat]]) + O(d³) driver Jacobi, now with the rotation
    * product accumulated into eigenVECTORS
    * ([[graft.functions.CovarianceSketch.jacobiEigen]] — the
    * rotations were already computed; keeping them is one d-length
    * column update each). The projection is ONE typed mapPartitions
    * scan against the broadcast r·d-double basis
    * ([[pcaProjectFrame]] — the PQ-encoder resource pattern: a tight
    * scalar loop beats the r·d-term interpreted HOF alternative ~40×,
    * measured), zero shuffle; the recall probe is two broadcast-
    * singleton top-10 scans (the sim1 shape). Rows-only by design (no
    * SQL engine replays an eigen solve); SimilaritySpec pins the
    * planted-subspace EXACT recovery (axis-aligned corpus: the top-2
    * basis vectors are ±e₀/±e₅ exactly, variance_captured = 1,
    * recall = 1), whitening's unit variances, rotation invariance,
    * and the low-rank-plus-noise go case. */
  def sim33PcaProject(spark: SparkSession, dir: String): DataFrame =
    pcaProjectCard(Tables.embeddings(spark, dir), dim = 64, r = Sim33R,
      basis = Some(basisFromFlat(covSketchFlatFor(spark, dir, 64), 64)))

  /** The projection rank the sim33 card grades and sim34 serves —
    * matching sim19's JL budget so the two reduction cards compare at
    * equal memory. */
  private[graft] val Sim33R = 16

  /** The PCA basis from one sketch pass: (n, μ, eigenvalues clamped
    * ≥ 0 descending, aligned unit eigenvectors). */
  private[graft] def pcaBasis(df: DataFrame, dim: Int)
      : (Long, Array[Double], Array[Double], Array[Array[Double]]) =
    basisFromFlat(covSketchFlat(df, dim), dim)

  /** The basis tail from a flattened covariance sketch — ONE
    * definition shared by the batch kernel and the
    * [[graft.streaming.SpectrumFold]] live serve (the sim32
    * card-tail device), so serve ≡ batch holds at the basis level by
    * construction. */
  private[graft] def basisFromFlat(flat: Seq[Double], dim: Int)
      : (Long, Array[Double], Array[Double], Array[Array[Double]]) = {
    val (n, cov) = graft.functions.CovarianceSketch.covarianceOf(flat, dim)
    val mu = Array.tabulate(dim)(i => if (n == 0) 0.0 else flat(1 + i) / n)
    val (eigs, vecs) = graft.functions.CovarianceSketch.jacobiEigen(cov)
    (n, mu, eigs.map(l => math.max(l, 0.0)), vecs)
  }

  /** Centered projection of a (vec_id, emb: array&lt;double&gt;) frame
    * onto the rows of `basis`, scaled per-coordinate by `scales`:
    * y_j = Σ_i (x_i − μ_i)·(s_j·B_{j,i}), appended as `proj` (the
    * scale folds INTO the basis row, so unit scales are bit-exactly
    * the plain projection and a zero scale zeroes the coordinate
    * exactly). Plain projection passes unit scales; whitening passes
    * [[whitenScales]].
    *
    * ONE fused codegen expression against the folded literal basis
    * ([[graft.functions.VecProject]] — r20: the typed-mapPartitions
    * form this replaces round-tripped every row through the Dataset
    * codec; the Expression keeps the scan inside whole-stage codegen,
    * measured 1.47×/1.21×/1.19× faster at sf0.1/10×/100× with
    * BIT-IDENTICAL output, BENCH_LOCAL_r20_projection_expr.json. The
    * interpreted-HOF draft both replaced stays receipted at ~1.4 ms
    * per row — 40× worse — in BENCH_LOCAL_r19_newops_alpha.json.)
    * One scan, zero shuffle; only (vec_id, emb, proj) rows come out. */
  private[graft] def pcaProjectFrame(df: DataFrame, mu: Array[Double],
      basis: Array[Array[Double]], scales: Array[Double]): DataFrame = {
    val spark = df.sparkSession
    val scaled = basis.zip(scales)
      .map { case (b, s) => b.map(_ * s).toIndexedSeq }.toIndexedSeq
    df.select(col("vec_id").cast("long").as("vec_id"), col("emb"),
      VectorOps.vecProject(spark, col("emb"),
        typedlit(mu.toIndexedSeq), typedlit(scaled)).as("proj"))
  }

  /** Whitening scales for the kept coordinates: 1/√λ_j, with a
    * zero-variance direction scaling to 0 (its coordinate is exactly
    * the corpus mean — there is nothing to whiten and 1/√0 would
    * poison the row). */
  private[graft] def whitenScales(eigs: Array[Double], r: Int): Array[Double] =
    eigs.take(r).map(l => if (l > 1e-12) 1.0 / math.sqrt(l) else 0.0)

  /** Everything sim33's go/no-go rests on, computed in one place: the
    * basis (one sketch pass), the variance capture, and the sim20
    * recall probe. `recall` is None when the benchmark lookup row
    * (vec_id 0) is absent or null-embedded (`probeOk` false — advisor
    * r19: a missing probe must never read as a fake 0.0). None overall
    * when the corpus is empty. */
  private[graft] case class PcaDecision(n: Long, mu: Array[Double],
      eigs: Array[Double], vecs: Array[Array[Double]], varCap: Double,
      recall: Option[Double], probeOk: Boolean)

  private[graft] def pcaDecisionOf(embeddings: DataFrame, dim: Int,
      r: Int, basis: Option[(Long, Array[Double], Array[Double],
        Array[Array[Double]])] = None): Option[PcaDecision] = {
    val spark = embeddings.sparkSession
    val (n, mu, eigs, vecs) = basis.getOrElse(pcaBasis(embeddings, dim))
    if (n == 0) return None
    val trace = eigs.sum
    val varCap = if (trace > 0) eigs.take(r).sum / trace else 0.0
    val e = pcaProjectFrame(
      embeddings.filter(col("embedding").isNotNull)
        .select(col("vec_id"), asDouble(col("embedding")).as("emb")),
      mu, vecs.take(r), Array.fill(r)(1.0))
    // the benchmark lookup is ONE row — collect it (the g7/sim14
    // bounded-collect contract) and inline it as literals, instead of
    // the crossJoin(broadcast(q)) that re-ran the projection scan to
    // BUILD the broadcast for every probe (r21)
    val qRows = e.filter(col("vec_id") === 0)
      .select(col("emb").as("qemb"), col("proj").as("qproj")).take(1)
    val probeOk = qRows.nonEmpty
    def rd4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    val recall: Option[Double] = if (!probeOk) None else {
      val qemb = typedlit(qRows.head.getSeq[Double](0))
      val qproj = typedlit(qRows.head.getSeq[Double](1))
      // round-4 BEFORE ranking with vec_id tie-breaks (the sim1/sim26
      // exactness device) — the candidate set is engine-identical, so
      // the DuckDB oracle can replay the whole probe from the basis
      // literals (r19 verdict ask #5). BOTH scores come out of ONE
      // projection scan pinned as a narrow (vec_id, ct, cp) frame
      // (r21: the truth and reduced top-10s previously each re-ran the
      // full projection scan); the two rank probes are limit-10 sorts
      // over the pinned narrow rows.
      val scored = e.filter(col("vec_id") =!= 0)
        .select(col("vec_id"),
          round(VectorOps.vecCosine(spark, col("emb"), qemb), 4).as("ct"),
          round(VectorOps.vecCosine(spark, col("proj"), qproj), 4).as("cp"))
        .localCheckpoint(true)
      def top10(c: String): Set[Long] = scored
        .select(col("vec_id"), col(c).as("c"))
        .filter(!isnan(col("c")))
        .orderBy(col("c").desc, col("vec_id"))
        .limit(10).collect().map(_.getLong(0)).toSet
      val truth = top10("ct")
      val got = top10("cp")
      Some(if (truth.isEmpty) 0.0
      else rd4((got & truth).size.toDouble / truth.size))
    }
    Some(PcaDecision(n, mu, eigs, vecs, rd4(varCap), recall, probeOk))
  }

  /** The sim33 kernel on an explicit (vec_id, embedding) frame. */
  private[graft] def pcaProjectCard(embeddings: DataFrame, dim: Int,
      r: Int, basis: Option[(Long, Array[Double], Array[Double],
        Array[Array[Double]])] = None): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    pcaDecisionOf(embeddings, dim, r, basis) match {
      case None =>
        Seq.empty[(Long, Int, Int, Double, Option[Double], Boolean)]
          .toDF("n_vecs", "dim", "r", "variance_captured", "recall_at_10",
            "probe_ok")
      case Some(d) =>
        Seq((d.n, dim, r, d.varCap, d.recall, d.probeOk))
          .toDF("n_vecs", "dim", "r", "variance_captured", "recall_at_10",
            "probe_ok")
    }
  }

  /** SIM35 — PCA RANK CURVE (r19 verdict ask #2): sim33 grades ONE
    * operating point (r = 16); the migration decision a fleet actually
    * faces is "which r" — so sweep the whole variance/recall/memory
    * trade in one card: a row per r ∈ {4, 8, 16, 32, 64} with
    * variance_captured (Σ top-r λ / trace — monotone in r by
    * construction), recall_at_10 against the full-space brute truth,
    * and memory_ratio (r/d). The d54 LSH tuning-curve / sim17
    * recall-grid device applied to the projection rank.
    *
    * Scale shape — ONE of everything corpus-sized: one CovarianceSketch
    * pass (the shared [[covSketchFlat]]), one Jacobi solve, ONE
    * projection scan onto the FULL d-dim eigenbasis (eager
    * localCheckpoint pins it) — the rank-r projection is the PREFIX of
    * the full one because the basis rows are variance-ordered, so
    * every r's probe is a `slice` over the same checkpointed frame,
    * and the brute truth is computed ONCE and shared by all r
    * (per-r cost = one broadcast-singleton top-10 over r-dim slices,
    * the sim1 shape). Rows-only by design (eigen solve — the sim32/g7
    * treatment); SimilaritySpec pins monotone variance, r = d
    * recovering the brute truth EXACTLY on a mean-zero corpus
    * (rotation preserves cosine when μ = 0), and the r = 16 row
    * sitting in lockstep with sim33's card (shared kernels). */
  def sim35PcaRankCurve(spark: SparkSession, dir: String): DataFrame =
    pcaRankCurve(Tables.embeddings(spark, dir), dim = 64,
      rs = Seq(4, 8, 16, 32, 64),
      basis = Some(basisFromFlat(covSketchFlatFor(spark, dir, 64), 64)))

  /** The sim35 kernel on an explicit (vec_id, embedding) frame. */
  private[graft] def pcaRankCurve(embeddings: DataFrame, dim: Int,
      rs: Seq[Int], basis: Option[(Long, Array[Double], Array[Double],
        Array[Array[Double]])] = None): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (n, mu, eigs, vecs) = basis.getOrElse(pcaBasis(embeddings, dim))
    val empty = Seq.empty[(Long, Int, Int, Double, Option[Double],
      Boolean, Double)]
      .toDF("n_vecs", "dim", "r", "variance_captured", "recall_at_10",
        "probe_ok", "memory_ratio")
    if (n == 0) return empty
    val trace = eigs.sum
    def rd4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    // one projection pass onto the FULL basis; each rank's coordinates
    // are a prefix of it (variance-ordered rows)
    val proj = pcaProjectFrame(
      embeddings.filter(col("embedding").isNotNull)
        .select(col("vec_id"), asDouble(col("embedding")).as("emb")),
      mu, vecs, Array.fill(dim)(1.0))
    // the benchmark lookup is ONE row — collect it and inline it as
    // literals (the pcaDecisionOf r21 device): every per-r probe then
    // reads a narrow pinned score frame instead of re-broadcasting the
    // probe and re-scanning d-dim rows
    val qRows = proj.filter(col("vec_id") === 0)
      .select(col("emb").as("qemb"), col("proj").as("qproj")).take(1)
    val probeOk = qRows.nonEmpty
    // round-4 before ranking, vec_id tie-breaks — the same device as
    // pcaDecisionOf, so the r = 16 row stays in LOCKSTEP with sim33.
    // ONE corpus-sized scan computes the full-space cosine AND every
    // rank's prefix cosine (prefix slices of the same projection);
    // what pins is the (vec_id, ct, c_r…) frame — 1 + |rs| doubles per
    // row instead of the 2·d-double projection frame the per-r probes
    // previously re-scanned (r21: 6 wide scans → 1 wide + |rs|+1
    // narrow limit-10 sorts).
    val scored: DataFrame = if (!probeOk) null else {
      val qemb = typedlit(qRows.head.getSeq[Double](0))
      val qproj = qRows.head.getSeq[Double](1)
      proj.filter(col("vec_id") =!= 0)
        .select(col("vec_id") +:
          round(VectorOps.vecCosine(spark, col("emb"), qemb), 4).as("ct") +:
          rs.sorted.map(r =>
            round(VectorOps.vecCosine(spark, slice(col("proj"), 1, r),
              typedlit(qproj.take(r))), 4).as(s"c_$r")): _*)
        .localCheckpoint(true)
    }
    def top10(c: String): Set[Long] = scored
      .select(col("vec_id"), col(c).as("c"))
      .filter(!isnan(col("c")))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(10).collect().map(_.getLong(0)).toSet
    val truth: Set[Long] = if (!probeOk) Set.empty else top10("ct")
    val rows = rs.sorted.map { r =>
      val varCap = if (trace > 0) eigs.take(r).sum / trace else 0.0
      val recall: Option[Double] =
        if (!probeOk) None
        else if (truth.isEmpty) Some(0.0)
        else {
          val got = top10(s"c_$r")
          Some(rd4((got & truth).size.toDouble / truth.size))
        }
      (n, dim, r, rd4(varCap), recall, probeOk, rd4(r.toDouble / dim))
    }
    rows.toDF("n_vecs", "dim", "r", "variance_captured", "recall_at_10",
      "probe_ok", "memory_ratio").orderBy(col("r"))
  }

  // ---- SIM34: the sim33 card's CONSUMER (r19 verdict ask #1) ---------

  /** GO thresholds for flipping ANN serving to PCA-reduced vectors:
    * the reduction must keep most of the measured variance AND prove
    * near-perfect retrieval agreement on the benchmark probe. An
    * isotropic corpus (variance_captured ≈ r/d) or a missing probe
    * reads no-go — the honest refusal. */
  private[graft] val PcaGoVarCap = 0.7
  private[graft] val PcaGoRecall = 0.9

  private[graft] def pcaDecisionName(r: Int): String = s"pca_r${r}_decision"
  private[graft] def pcaIndexName(r: Int): String = s"pca_r${r}_index"

  /** sim33's decision as a PUBLISHED store artifact (the d49/receipt
    * device): one flag row (the card + the GO verdict) plus the solved
    * basis (top-r eigenvectors, eigenvalues, mean) — so the sketch
    * pass, the Jacobi solve, and the recall probe run once per corpus
    * CONTENT (fingerprint-keyed root), and the index build below can
    * project without re-deriving anything. Returns the loaded parts. */
  private[graft] def pcaDecisionFor(spark: SparkSession, dir: String,
      dim: Int, r: Int): Map[String, DataFrame] =
    IndexStore.loadOrBuild(spark, dir, "embeddings", pcaDecisionName(r)) {
      import spark.implicits._
      val d = pcaDecisionOf(Tables.embeddings(spark, dir), dim, r,
          basis = Some(basisFromFlat(covSketchFlatFor(spark, dir, dim), dim)))
        .getOrElse(PcaDecision(0L, new Array[Double](dim),
          new Array[Double](dim), Array.fill(r)(new Array[Double](dim)),
          0.0, None, probeOk = false))
      val go = d.probeOk && d.varCap >= PcaGoVarCap &&
        d.recall.exists(_ >= PcaGoRecall)
      Seq(
        "decision" -> Seq((d.n, dim, r, d.varCap, d.recall, d.probeOk, go))
          .toDF("n_vecs", "dim", "r", "variance_captured", "recall_at_10",
            "probe_ok", "go"),
        "basis" -> d.vecs.take(r).toIndexedSeq.zipWithIndex
          .map { case (v, j) => (j, v.toIndexedSeq, d.eigs(j)) }
          .toDF("j", "vec", "eig"),
        "mean" -> Seq(Tuple1(d.mu.toIndexedSeq)).toDF("mu"))
    }

  /** One projection scan emitting BOTH serving representations: the
    * plain r-dim projection (cosine geometry — what the recall probe
    * proved) and the whitened one (unit per-coordinate variance — the
    * downstream-training normalization). Two [[graft.functions
    * .VecProject]] calls in one codegen'd select (plain basis +
    * scale-folded basis) — a one-off publish-time scan, kept in
    * Tungsten like [[pcaProjectFrame]] (same r20 receipt). Only
    * (vec_id, proj, white) rows come out — never the d-dim input. */
  private[graft] def pcaProjectBoth(df: DataFrame, mu: Array[Double],
      basis: Array[Array[Double]], eigs: Array[Double]): DataFrame = {
    val spark = df.sparkSession
    val r = basis.length
    val s = whitenScales(eigs, r)
    val plain = basis.map(_.toIndexedSeq).toIndexedSeq
    val white = basis.zipWithIndex
      .map { case (b, j) => b.map(_ * s(j)).toIndexedSeq }.toIndexedSeq
    val muLit = typedlit(mu.toIndexedSeq)
    df.select(col("vec_id").cast("long").as("vec_id"),
      VectorOps.vecProject(spark, col("emb"), muLit, typedlit(plain))
        .as("proj"),
      VectorOps.vecProject(spark, col("emb"), muLit, typedlit(white))
        .as("white"))
  }

  /** The REDUCED serving index — published only when the sim33 card
    * cleared GO. Direct consumers of a no-go corpus are VETOED (the
    * sim32 gate discipline): serving ANN off r dims that don't carry
    * the geometry would silently return noise neighbors, which is
    * strictly worse than refusing. */
  private[graft] def reducedIndexFor(spark: SparkSession, dir: String,
      dim: Int, r: Int): Map[String, DataFrame] = {
    val dec = pcaDecisionFor(spark, dir, dim, r)
    val drow = dec("decision").collect().head
    if (!drow.getBoolean(6)) throw new IllegalStateException(
      f"sim33 no-go vetoes reduced ANN serving (variance_captured=" +
        f"${drow.getDouble(3)}%.4f, recall_at_10=" +
        s"${if (drow.isNullAt(4)) "null" else drow.getDouble(4).toString}," +
        s" probe_ok=${drow.getBoolean(5)}): projecting this corpus onto " +
        s"$r dims would destroy its geometry — serve the full-dim index " +
        "or re-examine the embedding pipeline")
    IndexStore.loadOrBuild(spark, dir, "embeddings", pcaIndexName(r)) {
      val basis = dec("basis").select(col("j"), col("vec"), col("eig"))
        .collect().map(rw => (rw.getInt(0), rw.getSeq[Double](1).toArray,
          rw.getDouble(2))).sortBy(_._1)
      val mu = dec("mean").collect().head.getSeq[Double](0).toArray
      val corpus = Tables.embeddings(spark, dir)
        .filter(col("embedding").isNotNull)
        .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      Seq("projected" -> pcaProjectBoth(corpus, mu, basis.map(_._2),
        basis.map(_._3)))
    }
  }

  /** SIM34 — reduced-index ANN SERVE: the sim33 card's consumer (r19
    * verdict ask #1), closing the PCA loop exactly as sim31 closed
    * sim28/sim30's: sim32 diagnoses the spectrum, sim33 prices the
    * reduction, sim34 ACTS — when the card clears GO
    * ([[PcaGoVarCap]]/[[PcaGoRecall]]), it publishes the r-dim
    * projected AND whitened vectors with the basis as one
    * fingerprint-keyed store artifact and serves top-10 cosine ANN off
    * the reduced vectors (dim/r = 4× less memory and scan work per
    * serve); when the card reads no-go it REFUSES — the registered
    * card returns the one-row refusal (go=false, the measured
    * variance/recall, null serve columns) and the serving kernel
    * ([[reducedIndexFor]]) throws for direct consumers, the sim32 gate
    * discipline. The registered surface reports rather than throws
    * because a structured refusal IS the verb's output on a no-go
    * corpus (the driver's zero-error contract; the throwing kernel is
    * spec-pinned on the same corpus shape).
    *
    * Scale shape: decision + basis + recall proof run ONCE per corpus
    * content (published — the [[pcaDecisionFor]] artifact); the GO
    * path's projection is ONE mapPartitions scan at publish
    * ([[pcaProjectBoth]]), and every serve after that is a parquet
    * read of r-dim vectors + one broadcast-singleton top-10 (the sim1
    * shape at r/d the width). Warm serves re-project NOTHING — the
    * IndexStoreSpec builds-log pin. Rows-only by design (eigen solve;
    * the sim32/g7 treatment); IndexStoreSpec pins the planted GO
    * corpus end-to-end (publish once, serve = full-dim brute top-10
    * exactly, fresh session zero builds) and the no-go refusal card +
    * kernel veto. */
  def sim34ReducedAnnServe(spark: SparkSession, dir: String): DataFrame = {
    val dim = 64
    val r = Sim33R
    val dec = pcaDecisionFor(spark, dir, dim, r)
    val flags = dec("decision")
      .select(col("go"), col("variance_captured"), col("recall_at_10"),
        col("probe_ok"))
    val drow = dec("decision").collect().head
    if (drow.isNullAt(6) || !drow.getBoolean(6))
      return flags.select(col("go"), col("variance_captured"),
        col("recall_at_10"), col("probe_ok"),
        lit(null).cast("int").as("rank"),
        lit(null).cast("long").as("neighbor_id"),
        lit(null).cast("double").as("cos_sim"))
    val proj = reducedIndexFor(spark, dir, dim, r)("projected")
      .select(col("vec_id"), col("proj"))
    val q = proj.filter(col("vec_id") === 0)
      .select(col("proj").as("qproj"))
    val top = proj.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("neighbor_id"),
        round(VectorOps.vecCosine(spark, col("proj"), col("qproj")), 4)
          .as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
      .limit(10)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    top.crossJoin(broadcast(flags))
      .select(col("go"), col("variance_captured"), col("recall_at_10"),
        col("probe_ok"), row_number().over(w).as("rank"),
        col("neighbor_id"), col("cos_sim"))
  }

  /** SIM13 registered — v2 simulates a partial re-embedding: vectors
    * with vec_id ≡ 0 (mod Sim13Mod) flip sign (the worst-case drifted
    * subset), everything else unchanged; the oracle replays the same
    * rule. */
  def sim13EmbeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    val v2 = e.withColumn("embedding",
      when(col("vec_id") % Sim13Mod === 0,
        transform(col("embedding"), x => -x))
        .otherwise(col("embedding")))
    embeddingDriftDf(e, v2, dim = 64)
  }

  private[graft] val Sim13Mod = 7

  /** SIM12 — int8 symmetric quantization QC: per-vector scale =
    * max|v|/127, codes = round(v/scale), and the report is the
    * reconstruction-cosine distribution per label — the go/no-go a team
    * reads before flipping an ANN fleet from float32 to int8 (4× memory,
    * the simple companion to sim7's PQ: PQ compresses harder, int8
    * preserves more and needs no codebook training). Pure per-row HOF
    * arithmetic, no shuffle before the per-label agg; zero vectors are
    * excluded (scale 0 → cosine undefined; sim9 counts them). */
  def sim12Int8Quant(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .filter(col("embedding").isNotNull)
      .select(col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("scale",
        array_max(transform(col("v"), x => abs(x))) / 127.0)
      .filter(col("scale") > 0)
      .withColumn("c", round(VectorOps.vecCosine(spark, col("v"),
        transform(col("v"), x => round(x / col("scale"), 0) * col("scale"))), 4))
      .groupBy(col("label")).agg(
        count(lit(1)).as("n_vecs"),
        round(avg(col("c")), 4).as("avg_recon_cos"),
        min(col("c")).as("min_recon_cos"),
        round(avg(col("scale")), 6).as("avg_scale"))
      .orderBy(col("label"))

  /** SIM7 — Product Quantization ANN (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): the vector splits into
    * `m` subvectors, each quantized by its own k-codeword codebook, so
    * a d-float embedding compresses to m SMALL INTS (64×4B floats →
    * 4×1B codes here, 64×) and search never touches the original
    * vectors. This is the memory leg of the scale story: IVF (sim4)
    * prunes WHICH vectors to score, PQ shrinks WHAT a score costs —
    * production ANN at 10⁹+ vectors is IVF+PQ composed, and both halves
    * exist here with the same index/serve split.
    *
    * Vectors are L2-normalized before subspace quantization, so ADC's
    * squared-L2 ordering equals cosine ordering (‖a−b‖² = 2−2cosθ on
    * the unit sphere) and results are directly comparable to
    * sim1/sim4. Zero-norm vectors are dropped at index build (the sim6
    * NaN hazard, handled at ingest rather than per query). */
  final case class PqIndex(codes: DataFrame,
                           codebooks: Array[Array[Array[Double]]])

  val PqM = 4 // subspaces
  val PqK = 16 // codewords per subspace

  private def l2unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Index phase: per-subspace k-means codebooks (seeded, 5 Lloyd
    * iterations — codebook quality affects recall, never correctness)
    * + ONE encode pass over the corpus. The encoder is a typed
    * `mapPartitions` against the broadcast m×k×(d/m) codebook — the
    * Deflater/decoder resource pattern: tight scalar loops beat an
    * m×k-term Catalyst expression here, and only (vec_id, m codes)
    * rows come out, which is the entire point of PQ. */
  /** L2-normalized (vec_id, nemb) rows — PQ's input space (zero-norm
    * vectors drop; they cannot be cosine-served anyway). */
  private[graft] def pqNormalize(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("n", norm(col("emb")))
      .filter(col("n") > 0)
      .select(col("vec_id"),
        transform(col("emb"), x => x / col("n")).as("nemb"))

  /** Encode normalized vectors against EXISTING codebooks — the
    * quantizer-frozen maintenance verb (sim23's PQ sibling: an
    * appended batch encodes in O(batch · m · k · dsub) against the
    * published books, never retraining them; int8 needs no analogue —
    * its per-vector scale has no trained state at all). One
    * mapPartitions pass over the broadcast books. */
  private[graft] def pqEncode(normalized: DataFrame,
                              books: Array[Array[Array[Double]]]): DataFrame = {
    val spark = normalized.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(books)
    normalized.as[(Long, Seq[Double])].mapPartitions { it =>
      val bks = bc.value
      it.map { case (id, v) =>
        val code = Array.tabulate(bks.length) { j =>
          val ds = bks(j)(0).length
          val off = j * ds
          var best = 0
          var bd = Double.MaxValue
          var c = 0
          while (c < bks(j).length) {
            var d = 0.0
            var i = 0
            while (i < ds) {
              val t = v(off + i) - bks(j)(c)(i); d += t * t; i += 1
            }
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          best
        }
        (id, code)
      }
    }.toDF("vec_id", "code")
  }

  def pqIndex(embeddings: DataFrame, m: Int = PqM, k: Int = PqK): PqIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = pqNormalize(embeddings)
    val dim = e.select(size(col("nemb"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val books = (0 until m).map { j =>
      val sub = e.select(
        array_to_vector(slice(col("nemb"), j * dsub + 1, dsub))
          .as("features"))
      new KMeans().setK(k).setSeed(7 + j).setMaxIter(5).fit(sub)
        .clusterCenters.map(_.toArray)
    }.toArray
    PqIndex(pqEncode(e, books), books)
  }

  /** Query phase (ADC — asymmetric distance computation): the query
    * stays un-quantized; the driver precomputes the m×k table of
    * subvector→codeword squared distances, and every corpus vector's
    * distance is m table lookups on its CODE — the original embeddings
    * are never read. The table is a broadcast literal (m×k doubles);
    * approximate cosine = 1 − adc/2 is rounded BEFORE ranking with a
    * vec_id tie-break (the t6/sim6 device). */
  def pqQuery(spark: SparkSession, index: PqIndex, q: Array[Double],
              topK: Int = 10, excludeVecId: Option[Long] = None): DataFrame = {
    val m = index.codebooks.length
    val dsub = index.codebooks.head.head.length
    require(q.length == m * dsub,
      s"query dim ${q.length} != index dim ${m * dsub}")
    val qn = l2unit(q)
    val dt = index.codebooks.zipWithIndex.map { case (book, j) =>
      book.map { c =>
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val t = qn(j * dsub + i) - c(i); d += t * t; i += 1
        }
        d
      }
    }
    val dtLit = array(dt.toIndexedSeq.map(row =>
      array(row.toIndexedSeq.map(lit): _*)): _*)
    val adc = (0 until m).map(j =>
      element_at(element_at(dtLit, j + 1),
        element_at(col("code"), j + 1) + 1)).reduce(_ + _)
    index.codes
      .filter(excludeVecId.map(col("vec_id") =!= _).getOrElse(lit(true)))
      .select(col("vec_id"),
        round(lit(1.0) - adc / 2, 4).as("cos_approx"))
      .orderBy(col("cos_approx").desc, col("vec_id"))
      .limit(topK)
  }

  /** Memoized per-(session, dir) PQ index — the same serving contract
    * as [[ivfIndexFor]]: codebooks + corpus-wide encode run ONCE and
    * checkpoint; queries are table-lookup scans over the code frame. */
  // (view name, codebooks) for the same reason as ivfCache: a PqIndex
  // value would pin the weak session key through its codes DataFrame.
  private val pqCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String,
        (String, Array[Array[Array[Double]]])]]()
  def pqIndexFor(spark: SparkSession, dir: String): PqIndex = {
    val (view, books) = perSession(pqCache, spark).getOrElseUpdate(dir, {
      // load-or-train through the per-dataset store (ivfIndexFor note)
      val parts = IndexStore.loadOrBuild(spark, dir, "embeddings", "pq") {
        val idx = pqIndex(Tables.embeddings(spark, dir))
        Seq("codes" -> idx.codes,
          "books" -> booksFrame(spark, idx.codebooks))
      }
      val name = "pq_idx_" + dirTag(dir)
      parts("codes").localCheckpoint(true).createOrReplaceTempView(name)
      (name, collectBooks(parts("books")))
    })
    PqIndex(spark.table(view), books)
  }

  /** PQ retrieve-then-rerank (the "+R" of Jégou's IVFADC+R, and how
    * every production PQ system actually serves): ADC ranks the WHOLE
    * corpus from codes alone and keeps a candidate pool of
    * `pool × topK`; only those few candidates' original vectors are
    * read back for an exact cosine rerank. Pure ADC ordering is too
    * coarse for close top-k calls (quantization error rivals the
    * cosine gaps between near-ties — measured recall@10 of 0.2 on the
    * unstructured test embeddings), but it is an excellent FILTER: the
    * exact pass touches pool×topK vectors instead of N, which is the
    * scale contract. The candidate id set is tiny and broadcasts into
    * a semi-join against the embedding table. */
  def pqQueryReranked(spark: SparkSession, embeddings: DataFrame,
                      index: PqIndex, q: Array[Double], topK: Int = 10,
                      pool: Int = 8,
                      excludeVecId: Option[Long] = None): DataFrame = {
    val cand = pqQuery(spark, index, q, topK * pool, excludeVecId)
      .select(col("vec_id"))
    val qn = l2unit(q)
    val qLit = array(qn.toIndexedSeq.map(lit): _*)
    embeddings
      .join(broadcast(cand), Seq("vec_id"), "left_semi")
      .select(col("vec_id"),
        round(VectorOps.vecCosine(spark,
          asDouble(col("embedding")), qLit), 4).as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(topK)
  }

  /** Serve one PQ lookup for a corpus member by id (missing id → empty
    * result, mirroring [[ivfServe]]). The query vector comes from the
    * ORIGINAL table — ADC is asymmetric by design. */
  def pqServe(spark: SparkSession, dir: String, index: PqIndex,
              queryVecId: Long, topK: Int = 10): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val qRows = emb.filter(col("vec_id") === queryVecId)
      .select(asDouble(col("embedding"))).take(1)
    if (qRows.isEmpty)
      return index.codes.select(col("vec_id"),
        lit(0.0).as("cos_sim")).limit(0)
    pqQueryReranked(spark, emb, index,
      qRows.head.getSeq[Double](0).toArray, topK,
      excludeVecId = Some(queryVecId))
  }

  def sim7PqAnn(spark: SparkSession, dir: String): DataFrame =
    pqServe(spark, dir, pqIndexFor(spark, dir), queryVecId = 0L)

  // --------------------------------------------------------------------
  // SIM16 — IVF-PQ: the composed index (Jégou et al., "Product
  // Quantization for Nearest Neighbor Search", §IVFADC). sim4's IVF
  // prunes WHICH vectors a query reads but stores full-width vectors;
  // sim7's PQ shrinks every vector to m byte codes but still scans ALL
  // of them. IVFADC does both: a coarse quantizer routes each vector to
  // a cell, PQ encodes the RESIDUAL (vector − its cell centroid, where
  // the variance that survives coarse quantization lives — codebooks
  // spent on residuals carry far more precision per bit than codebooks
  // spent on raw position), and a query scans only the probed cells'
  // code rows: cost ≈ (nProbe/kCoarse) × N table lookups on m-byte
  // rows, memory ≈ N×m bytes. At 100 TB the code frame is written
  // bucketed by cell so a probe prunes STORAGE partitions, and the
  // exact rerank reads back only the broadcast candidate pool — the
  // two-level pruning no single-level index can match.
  // --------------------------------------------------------------------

  /** A built IVF-PQ index: (vec_id, cell, code) rows + the coarse
    * centroid table + per-subspace RESIDUAL codebooks. */
  final case class IvfPqIndex(codes: DataFrame,
                              centers: Array[Array[Double]],
                              codebooks: Array[Array[Array[Double]]])

  /** Index phase: coarse k-means over the unit vectors, residual
    * computation per vector, per-subspace k-means over the residuals,
    * one encode pass. The residual+encode passes are typed
    * `mapPartitions` against broadcast centroid/codebook arrays (the
    * pqIndex precedent: tight scalar argmin loops with only
    * (id, cell, m codes) coming out). */
  def ivfPqIndex(embeddings: DataFrame, kCoarse: Int = Sim4K,
                 m: Int = PqM, k: Int = PqK): IvfPqIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = embeddings.sparkSession
    import spark.implicits._
    val e = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .withColumn("n", norm(col("emb")))
      .filter(col("n") > 0)
      .select(col("vec_id"),
        transform(col("emb"), x => x / col("n")).as("nemb"))
    val dim = e.select(size(col("nemb"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val dsub = dim / m
    val coarse = new KMeans().setK(kCoarse).setSeed(7).setMaxIter(5)
      .fit(e.select(array_to_vector(col("nemb")).as("features")))
    val centers = coarse.clusterCenters.map(_.toArray)
    val bcC = spark.sparkContext.broadcast(centers)
    // residuals materialize ONCE (they feed m codebook trainings + the
    // encode pass); localCheckpoint over cache for the d35/pairGraph
    // lifetime reasons
    val res = e.as[(Long, Seq[Double])].mapPartitions { it =>
      val cs = bcC.value
      it.map { case (id, v) =>
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < cs.length) {
          var d = 0.0; var i = 0
          while (i < v.length) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        (id, best, Array.tabulate(v.length)(i => v(i) - cs(best)(i)))
      }
    }.toDF("vec_id", "cell", "res").localCheckpoint(true)
    val books = (0 until m).map { j =>
      val sub = res.select(
        array_to_vector(slice(col("res"), j * dsub + 1, dsub)).as("features"))
      new KMeans().setK(k).setSeed(7 + j).setMaxIter(5).fit(sub)
        .clusterCenters.map(_.toArray)
    }.toArray
    val bcB = spark.sparkContext.broadcast(books)
    val codes = res.as[(Long, Int, Seq[Double])].mapPartitions { it =>
      val bks = bcB.value
      it.map { case (id, cell, r) =>
        val code = Array.tabulate(bks.length) { j =>
          val ds = bks(j)(0).length
          val off = j * ds
          var best = 0; var bd = Double.MaxValue
          var c = 0
          while (c < bks(j).length) {
            var d = 0.0; var i = 0
            while (i < ds) { val t = r(off + i) - bks(j)(c)(i); d += t * t; i += 1 }
            if (d < bd) { bd = d; best = c }
            c += 1
          }
          best
        }
        (id, cell, code)
      }
    }.toDF("vec_id", "cell", "code")
    IvfPqIndex(codes, centers, books)
  }

  /** Driver-side coarse routing shared by every IVFPQ consumer: the
    * nProbe cells nearest the (unit) query — one definition, so the
    * literal-plan serve (sim16) and the batch recall sweep (sim17)
    * can never probe differently. */
  private def coarseProbes(centers: Array[Array[Double]],
                           qn: Array[Double], nProbe: Int): Seq[Int] =
    coarseProbesRanked(centers, qn, nProbe).map(_._1)

  /** The same routing with the 1-based probe rank attached: nProbe-p
    * probes are EXACTLY the cells with rank ≤ p (stable sort on the
    * same distances), which is what lets a recall grid share one
    * max-probe scan across its probe axis (r22). One definition under
    * both entry points, so the ranked and unranked consumers can never
    * probe differently. */
  private def coarseProbesRanked(centers: Array[Array[Double]],
                                 qn: Array[Double],
                                 nProbe: Int): Seq[(Int, Int)] =
    centers.zipWithIndex.map { case (c, i) =>
      (i, c.zip(qn).map { case (a, b) => (a - b) * (a - b) }.sum)
    }.sortBy(_._2).take(nProbe).zipWithIndex
      .map { case ((cell, _), r) => (cell, r + 1) }.toSeq

  /** The per-cell residual ADC table shared by the same consumers:
    * dt(j)(codeword) = ‖(qn − center_cell)[j·dsub ..] − codeword‖². */
  private def residualAdcTable(index: IvfPqIndex, qn: Array[Double],
                               cell: Int): Array[Array[Double]] = {
    val dsub = index.codebooks.head.head.length
    val ctr = index.centers(cell)
    val qres = Array.tabulate(qn.length)(i => qn(i) - ctr(i))
    index.codebooks.zipWithIndex.map { case (book, j) =>
      book.map { cw =>
        var d = 0.0; var i = 0
        while (i < dsub) { val t = qres(j * dsub + i) - cw(i); d += t * t; i += 1 }
        d
      }
    }
  }

  /** Query phase (IVFADC): probe the `nProbe` nearest cells
    * (driver-side argmin over the broadcast centroids — query planning,
    * not data work), precompute ONE m×k residual distance table PER
    * probed cell (the residual the query has in cell c is q − center_c,
    * so the table is cell-specific), and score each probed code row
    * with m lookups into ITS cell's table, selected by a
    * probed-cell-count CASE — all literals, fully codegen. Unit
    * vectors: ‖q−x‖² = 2−2cos ⟹ approx cos = 1 − d²/2, rounded before
    * ranking with the vec_id tie-break (the sim7 device). */
  def ivfPqQuery(spark: SparkSession, index: IvfPqIndex, q: Array[Double],
                 nProbe: Int, topK: Int = 10,
                 excludeVecId: Option[Long] = None): DataFrame = {
    val m = index.codebooks.length
    val dsub = index.codebooks.head.head.length
    require(q.length == m * dsub,
      s"query dim ${q.length} != index dim ${m * dsub}")
    require(nProbe >= 1,
      s"nProbe must be >= 1, got $nProbe (0 probes = silently empty result)")
    val qn = l2unit(q)
    val probed = coarseProbes(index.centers, qn, nProbe)
    def cellAdc(cell: Int): org.apache.spark.sql.Column = {
      val dt = residualAdcTable(index, qn, cell)
      val dtLit = array(dt.toIndexedSeq.map(row =>
        array(row.toIndexedSeq.map(lit): _*)): _*)
      (0 until m).map(j =>
        element_at(element_at(dtLit, j + 1),
          element_at(col("code"), j + 1) + 1)).reduce(_ + _)
    }
    val adc = probed.tail.foldLeft(
      when(col("cell") === probed.head, cellAdc(probed.head))) {
      (acc, cell) => acc.when(col("cell") === cell, cellAdc(cell))
    }
    index.codes
      .filter(col("cell").isin(probed.toIndexedSeq.map(Integer.valueOf): _*) &&
        excludeVecId.map(col("vec_id") =!= _).getOrElse(lit(true)))
      .select(col("vec_id"),
        round(lit(1.0) - adc / 2, 4).as("cos_approx"))
      .orderBy(col("cos_approx").desc, col("vec_id"))
      .limit(topK)
  }

  /** Memoized per-(session, dir) IVF-PQ index — the ivfIndexFor /
    * pqIndexFor serving contract: coarse training, residual codebooks
    * and the corpus encode run ONCE and checkpoint behind a temp view;
    * queries are probe-planning plus a pruned code scan. (View name +
    * plain arrays cached, never the index value — a DataFrame-holding
    * value would pin the weak session key.) */
  private val ivfPqCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String,
        (String, Array[Array[Double]], Array[Array[Array[Double]]])]]()
  def ivfPqIndexFor(spark: SparkSession, dir: String): IvfPqIndex = {
    val (view, centers, books) =
      perSession(ivfPqCache, spark).getOrElseUpdate(dir, {
        // load-or-train through the per-dataset store (ivfIndexFor note)
        val parts = IndexStore.loadOrBuild(spark, dir, "embeddings",
          "ivfpq") {
          val idx = ivfPqIndex(Tables.embeddings(spark, dir))
          Seq("codes" -> idx.codes,
            "centers" -> centersFrame(spark, idx.centers),
            "books" -> booksFrame(spark, idx.codebooks))
        }
        val name = "ivfpq_idx_" + dirTag(dir)
        parts("codes").localCheckpoint(true).createOrReplaceTempView(name)
        (name, collectCenters(parts("centers")),
          collectBooks(parts("books")))
      })
    IvfPqIndex(spark.table(view), centers, books)
  }

  /** IVF-PQ retrieve-then-rerank serve for a corpus member by id: ADC
    * over the probed cells keeps pool×topK candidates; only those read
    * their original vectors back for the exact cosine (the sim7 "+R"
    * pass — candidate ids broadcast into a semi-join). Missing id →
    * empty result. */
  def ivfPqServe(spark: SparkSession, dir: String, index: IvfPqIndex,
                 queryVecId: Long, nProbe: Int = 3, topK: Int = 10,
                 pool: Int = 8): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val qRows = emb.filter(col("vec_id") === queryVecId)
      .select(asDouble(col("embedding"))).take(1)
    if (qRows.isEmpty)
      return index.codes.select(col("vec_id"),
        lit(0.0).as("cos_sim")).limit(0)
    val q = qRows.head.getSeq[Double](0).toArray
    val cand = ivfPqQuery(spark, index, q, nProbe, topK * pool,
      excludeVecId = Some(queryVecId)).select(col("vec_id"))
    val qLit = array(l2unit(q).toIndexedSeq.map(lit): _*)
    emb.join(broadcast(cand), Seq("vec_id"), "left_semi")
      .select(col("vec_id"),
        round(VectorOps.vecCosine(spark,
          asDouble(col("embedding")), qLit), 4).as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(topK)
  }

  /** Batch IVF-PQ ADC scan for a bounded query set at the LARGEST
    * nProbe a consumer will read: the per-(query, cell) ADC tables are
    * DATA here, not literals — driver-computed for the capped query
    * array (the sim14 workload-sized-driver-work contract), broadcast
    * as rows WITH their probe rank, equi-joined onto the code frame by
    * cell, scored by the same element_at lookups. One plan for Q×P
    * work instead of Q×P plans — and because probe sets nest (same
    * stable centroid ordering) while the ADC table of a (query, cell)
    * pair never depends on how many OTHER cells are probed, the
    * nProbe-p candidate scores are exactly the rows with cell_rank ≤ p:
    * a recall grid shares this one corpus scan across every grid point
    * (r22, guide §2.3/§2.4). */
  private def ivfPqScoredScan(spark: SparkSession, index: IvfPqIndex,
                              qRows: Array[(Long, Array[Double])],
                              maxProbe: Int): DataFrame = {
    import spark.implicits._
    val m = index.codebooks.length
    val tabRows = qRows.toSeq.flatMap { case (qid, q) =>
      val qn = l2unit(q)
      coarseProbesRanked(index.centers, qn, maxProbe).map { case (cell, r) =>
        (qid, cell, r, residualAdcTable(index, qn, cell).map(_.toSeq).toSeq)
      }
    }.toDF("q_id", "cell", "cell_rank", "dt")
    val adc = (0 until m).map(j =>
      element_at(element_at(col("dt"), j + 1),
        element_at(col("code"), j + 1) + 1)).reduce(_ + _)
    index.codes.join(broadcast(tabRows), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), col("cell_rank"),
        round(lit(1.0) - adc / 2, 4).as("cos_approx"))
  }

  /** SIM17 — the composed index's recall observability (sim11's
    * discipline applied to sim16): avg/min recall@topK of the FULL
    * IVFPQ+rerank serving path vs exact brute force, on a (nProbe ×
    * rerank-pool) GRID. Two axes because the path has two recall
    * ceilings and one curve cannot attribute a miss to either: routing
    * (the true neighbor's cell was never probed — more probes fix it)
    * vs pool truncation (the cell was probed but ADC quantization noise
    * ranked the neighbor below the pool cut — a bigger exact-rerank
    * pool fixes it). The r10 single-axis curve DIPPED at full probe
    * (0.65 → 0.60): probing everything floods the fixed pool with the
    * whole corpus's quantization noise, so pool quality binds exactly
    * when routing stops being the constraint — visible only with the
    * pool axis separated. Ground truth materializes once
    * (localCheckpoint) and every grid point re-joins it.
    *
    * r22 (guide §2.3/§2.4): the grid shares ONE max-probe ADC corpus
    * scan and ONE exact-rerank corpus scan instead of one of each per
    * grid point. Soundness: (a) probe sets nest and a (query, cell)
    * ADC table is independent of the probe count, so nProbe-p scores
    * are the max-probe rows with cell_rank ≤ p; (b) per probe, the
    * pool window at the largest pool assigns the SAME row_number the
    * per-point window would (identical candidate rows, identical
    * (cos_approx desc, vec_id) total order), so a smaller pool's
    * candidate set is the rn ≤ topK·pool prefix; (c) the exact cosine
    * of a (query, candidate) pair doesn't depend on which grid point
    * asked, so one rerank scan over the unioned candidates feeds every
    * point's own top-K window. Each point's rows are therefore
    * bit-identical to the per-point serve it replaces. */
  def ivfPqRecallCurve(spark: SparkSession, dir: String, probes: Seq[Int],
                       pools: Seq[Int] = Seq(8),
                       nQueries: Int = 16, topK: Int = 10): DataFrame = {
    import spark.implicits._
    require(probes.nonEmpty, "need at least one nProbe to evaluate")
    require(pools.nonEmpty, "need at least one pool size to evaluate")
    val idx = ivfPqIndexFor(spark, dir)
    val e = Tables.embeddings(spark, dir)
    val queries = e.filter(col("vec_id") % 97 === 0)
      .orderBy(col("vec_id")).limit(nQueries)
    // session-memoized brute truth (shared with sim11 — same query set,
    // same topK)
    val exact = knnTruthFor(spark, dir, nQueries, topK)
    val nExact = exact.groupBy(col("q_id")).agg(count(lit(1)).as("n_exact"))
    val qRows = queries
      .select(col("vec_id"), asDouble(col("embedding")).as("q"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // one ADC scan of the code frame at max(probes), pinned narrow
    val scored = ivfPqScoredScan(spark, idx, qRows, probes.max)
      .localCheckpoint(true)
    val poolMax = pools.max
    // ONE probe-tagged pool window (explode the literal probe list,
    // filter cell_rank ≤ n_probe, rank within (n_probe, q_id)) cut at
    // the largest pool; a smaller pool's candidate set is the
    // rn ≤ topK·pool prefix. Candidates stay (n_probe, q_id, vec_id,
    // rn) — a few hundred rows per (probe, query).
    val wPool = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_probe"), col("q_id"))
      .orderBy(col("cos_approx").desc, col("vec_id"))
    val cand = scored
      .withColumn("n_probe", explode(typedlit(probes)))
      .filter(col("cell_rank") <= col("n_probe"))
      .withColumn("rn", row_number().over(wPool))
      .filter(col("rn") <= topK * poolMax)
      .select(col("n_probe"), col("q_id"), col("vec_id"), col("rn"))
    val qDf = qRows.toSeq.map { case (id, q) => (id, l2unit(q).toSeq) }
      .toDF("q_id", "qemb")
    // one exact-rerank scan: every grid point's pool candidates get
    // their true cosine from the same pass over the original vectors
    val exactScored = e
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .join(broadcast(cand), Seq("vec_id"))
      .join(broadcast(qDf), Seq("q_id"))
      .select(col("n_probe"), col("q_id"), col("vec_id"), col("rn"),
        round(VectorOps.vecCosine(spark, col("emb"), col("qemb")), 4)
          .as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
      .localCheckpoint(true)
    // the grid's 8 per-point top-K windows + aggregate chains likewise
    // collapse to one of each: tag the pool axis (pool candidates are
    // rn prefixes), rank within (n_probe, pool, q_id) — the per-point
    // serve's own ranking over exactly its rows — then one grouped
    // recall aggregate over the (probe × pool × query) lattice.
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("n_probe"), col("pool"), col("q_id"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
    val hitCounts = exactScored
      .withColumn("pool", explode(typedlit(pools)))
      .filter(col("rn") <= lit(topK) * col("pool"))
      .withColumn("rnk", row_number().over(wTop))
      .filter(col("rnk") <= topK)
      .select(col("n_probe"), col("pool"), col("q_id"), col("vec_id"))
      .join(exact, Seq("q_id", "vec_id"), "left_semi")
      .groupBy(col("n_probe"), col("pool"), col("q_id"))
      .agg(count(lit(1)).as("n_hit"))
    val perPoint = nExact
      .withColumn("n_probe", explode(typedlit(probes)))
      .withColumn("pool", explode(typedlit(pools)))
      .join(hitCounts, Seq("n_probe", "pool", "q_id"), "left")
      .select(col("n_probe"), col("pool"),
        (coalesce(col("n_hit"), lit(0L)).cast("double") /
          col("n_exact")).as("recall"))
      .groupBy(col("n_probe"), col("pool"))
      .agg(count(lit(1)).as("n_queries"),
        round(avg(col("recall")), 4).as("avg_recall"),
        round(min(col("recall")), 4).as("min_recall"))
    // grid spine: one row per (probe, pool) even on a zero-query
    // corpus — the shape the per-point global aggregates produced
    val spine = spark.range(1)
      .select(explode(typedlit(probes)).as("n_probe"))
      .select(col("n_probe"), explode(typedlit(pools)).as("pool"))
    spine.join(perPoint, Seq("n_probe", "pool"), "left")
      .select(col("n_probe"), col("pool"),
        coalesce(col("n_queries"), lit(0L)).as("n_queries"),
        col("avg_recall"), col("min_recall"))
      .orderBy(col("n_probe"), col("pool"))
  }

  /** Probe settings bracket the sim16 default (6); the pool axis
    * brackets the sim16 default (8) with the 4× setting that un-binds
    * pool truncation at full probe — the sim15 discipline (size the
    * exact-rerank pool so the approximate pre-rank can no longer cost
    * recall at the operating point you read off the curve). At full
    * probe the candidate set is the corpus, so pool=32 reranks
    * 32·topK exact cosines and recall must approach 1 — holding the
    * probe axis honest: any sub-1 recall THERE is pool truncation,
    * never routing. */
  def sim17IvfPqRecall(spark: SparkSession, dir: String): DataFrame =
    ivfPqRecallCurve(spark, dir, Seq(1, 2, 6, Sim4K), pools = Seq(8, 32))

  /** Registered at nProbe=6 (of kCoarse=16), rerank pool=32: on
    * UNSTRUCTURED embeddings the true top-k scatter across cells, so
    * routing (sim11's effect for plain IVF) and ADC pool truncation
    * BOTH bind — the sim17 grid separates them, and at the 6-probe
    * knee the pool axis is the cheaper lever: pool 8→32 lifts sf0.1
    * avg recall 0.40→0.68 (measured r12) for 240 extra exact cosines
    * per query, while more probes would rescan corpus cells. 6/16
    * probes still prunes ~5/8 of the corpus scan; the registered point
    * clears sim20's ≥0.6 serving bar. Clustered corpora (the
    * planted-cluster spec) reach recall 1 at nProbe=1 — the structure
    * IVF exists to exploit. */
  def sim16IvfPqAnn(spark: SparkSession, dir: String): DataFrame =
    ivfPqServe(spark, dir, ivfPqIndexFor(spark, dir), queryVecId = 0L,
      nProbe = 6, pool = 32)

  /** Sign signature of a 64-dim embedding: bit i set iff dim i > 0 —
    * the whole vector packs into ONE long. */
  private def signBits(embCol: String): org.apache.spark.sql.Column =
    expr(s"""aggregate(
      |  transform(sequence(0, 63),
      |    i -> if(element_at($embCol, i + 1) > 0D,
      |            shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))),
      |  CAST(0 AS BIGINT), (a, x) -> a | x)""".stripMargin)

  /** SIM15 — binary-quantized ANN + exact rerank: the 32× memory leg
    * that completes the quantization family (sim7 PQ = m byte codes,
    * sim12 int8 = 4×, here sign bits = d bits, 64× vs float32 — one
    * LONG per 64-dim vector). Cosine of sign patterns is monotone in
    * Hamming distance of the signatures, so candidates come from a
    * fully-codegen `bit_count(sig XOR qsig)` scan — integer ops on one
    * column, the cheapest possible first pass over 100 TB of vectors —
    * with TakeOrderedAndProject keeping the pool. The exact rerank is
    * sim7's verbatim: broadcast left-semi of the pool ids against the
    * original vectors, true cosine, top-k; candidates are approximate,
    * the SERVED scores are exact. Pool ≥ corpus degenerates to brute
    * force (pinned — the sim11 nProbe=k discipline). */
  def binaryAnn(spark: SparkSession, emb: DataFrame, queryVecId: Long,
                topK: Int = 10, pool: Int = 8): DataFrame = {
    val sigs = emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), signBits("embedding").as("sig"))
    val qRow = sigs.filter(col("vec_id") === queryVecId).take(1)
    val qVecRow = emb.filter(col("vec_id") === queryVecId)
      .select(asDouble(col("embedding"))).take(1)
    if (qRow.isEmpty || qVecRow.isEmpty)
      return emb.select(col("vec_id"), lit(0.0).as("cos_sim")).limit(0)
    val qSig = qRow.head.getLong(1)
    val cand = sigs.filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"),
        expr(s"bit_count(sig ^ ${qSig}L)").as("hamming"))
      .orderBy(col("hamming"), col("vec_id"))
      .limit(topK * pool)
    val qn = l2unit(qVecRow.head.getSeq[Double](0).toArray)
    val qLit = array(qn.toIndexedSeq.map(lit): _*)
    emb.join(broadcast(cand.select(col("vec_id"))), Seq("vec_id"), "left_semi")
      .select(col("vec_id"),
        round(VectorOps.vecCosine(spark,
          asDouble(col("embedding")), qLit), 4).as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(topK)
  }

  def sim15BinaryAnn(spark: SparkSession, dir: String): DataFrame =
    binaryAnn(spark, Tables.embeddings(spark, dir), queryVecId = 0L)

  /** SIM21 — int8 asymmetric ANN + exact rerank: the serving leg of
    * sim12's quantization QC (sim12 grades whether int8 preserves the
    * corpus; this query actually SEARCHES with it), completing the
    * family's middle rung: binary (64×, sign only) < PQ (64×, trained)
    * < int8 (4×, no training, near-lossless) < float32. Per-vector
    * symmetric quantization (scale = max|v|/127, sim12's exact
    * formula), and the first-pass score is the cosine of the CODE
    * vector against the float query — asymmetric distance computation:
    * the query stays full-precision, so the only error is the corpus
    * side's direction snap, and the per-vector scale cancels out of
    * the cosine entirely (s·c/‖s·c‖ = c/‖c‖). Where sim15's sign bits
    * collapse every same-orthant vector onto ONE signature (Hamming 0
    * to all of them), int8 keeps 255 levels per dimension — the
    * recall-vs-memory trade the scorecard (sim20) prices.
    *
    * 100 TB shape: one codegen arithmetic pass over int codes (4× the
    * scan density of float32, no codebook, no training job),
    * TakeOrderedAndProject keeps the pool, and the exact rerank is
    * sim7's verbatim: broadcast left-semi of pool ids, true cosine,
    * top-k — approximate candidates, EXACT served scores. Zero-scale
    * (all-zero) vectors drop at quantization (sim12's guard). */
  /** The int8 corpus encode as a standalone frame — (vec_id, code). */
  private def int8Codes(emb: DataFrame): DataFrame =
    emb.filter(col("embedding").isNotNull)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("scale",
        array_max(transform(col("v"), x => abs(x))) / 127.0)
      .filter(col("scale") > 0)
      .withColumn("code",
        transform(col("v"), x => round(x / col("scale"), 0)))
      .select(col("vec_id"), col("code"))

  /** Memoized per-(session, dir) int8 code frame — the ivfIndexFor /
    * pqIndexFor serving contract applied to the quantization family's
    * no-training rung: sim21's r11 registration re-encoded the corpus
    * on EVERY query (the per-query index rebuild j11's r10 fix removed
    * for bucketed layout — 1.2 s of the 1.23 s bench line was encode,
    * not search). Encode ONCE, checkpoint behind a temp view, serve the
    * codegen scan + rerank. */
  private val int8Cache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, String]]()
  private[graft] def int8CodesFor(spark: SparkSession, dir: String): DataFrame = {
    val view = perSession(int8Cache, spark).getOrElseUpdate(dir, {
      // load-or-encode through the per-dataset store (ivfIndexFor note)
      val parts = IndexStore.loadOrBuild(spark, dir, "embeddings", "int8") {
        Seq("codes" -> int8Codes(Tables.embeddings(spark, dir)))
      }
      val name = "int8_codes_" + dirTag(dir)
      parts("codes").localCheckpoint(true).createOrReplaceTempView(name)
      name
    })
    spark.table(view)
  }

  def int8Ann(spark: SparkSession, emb: DataFrame, queryVecId: Long,
              topK: Int = 10, pool: Int = 8): DataFrame =
    int8AnnFromCodes(spark, emb, int8Codes(emb), queryVecId, topK, pool)

  /** Serve pass against a PRE-BUILT code frame (the registered query
    * path; the inline-encode [[int8Ann]] remains the spec shape). */
  private def int8AnnFromCodes(spark: SparkSession, emb: DataFrame,
                               codes: DataFrame, queryVecId: Long,
                               topK: Int, pool: Int): DataFrame = {
    // NULL-embedding query must hit the empty-result early return, not
    // NPE inside l2unit — read the query row null-filtered, like sim15
    // reads its qRow from the null-filtered sigs frame.
    val qVecRow = emb.filter(col("vec_id") === queryVecId &&
        col("embedding").isNotNull)
      .select(asDouble(col("embedding"))).take(1)
    if (qVecRow.isEmpty)
      return emb.select(col("vec_id"), lit(0.0).as("cos_sim")).limit(0)
    val qn = l2unit(qVecRow.head.getSeq[Double](0).toArray)
    val qLit = array(qn.toIndexedSeq.map(lit): _*)
    val cand = codes.filter(col("vec_id") =!= queryVecId)
      .select(col("vec_id"),
        VectorOps.vecCosine(spark, col("code"), qLit).as("acos"))
      .filter(!isnan(col("acos")))
      .orderBy(col("acos").desc, col("vec_id"))
      .limit(topK * pool)
    emb.join(broadcast(cand.select(col("vec_id"))), Seq("vec_id"), "left_semi")
      .select(col("vec_id"),
        round(VectorOps.vecCosine(spark,
          asDouble(col("embedding")), qLit), 4).as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(topK)
  }

  def sim21Int8Ann(spark: SparkSession, dir: String): DataFrame =
    int8AnnFromCodes(spark, Tables.embeddings(spark, dir),
      int8CodesFor(spark, dir), queryVecId = 0L, topK = 10, pool = 8)

  /** Pool depth per retriever leg and the standard RRF constant
    * (Cormack et al. 2009 use k=60) — shared with the oracle. */
  private[ext] val Sim22Pool = 20
  private[ext] val Sim22RrfK = 60

  /** SIM22 — hybrid lexical + dense retrieval fused by reciprocal rank
    * fusion: BM25 over the document text (t19's kernel, the fixed
    * lexical query) and exact cosine against item 0's embedding (the
    * mm-tier doc_id ≡ vec_id alignment), each keeping a top-[[Sim22Pool]]
    * pool, fused by RRF(d) = Σ_legs 1/(k + rank_leg(d)) with k=60 —
    * the score-free fusion every hybrid search stack runs, because
    * BM25 logits and cosines live on incomparable scales and RRF only
    * consumes RANKS. A doc in one pool only still scores (its missing
    * leg contributes 0); the query item itself is excluded from both
    * legs.
    *
    * Scale shape: each leg is its own documented serving pattern (BM25:
    * literal-term tf filters + one broadcast stats row, no token
    * explode; dense: one corpus scan against the broadcast query — at
    * index scale the dense leg plugs any sim-tier ANN index, the pool
    * contract is identical); fusion is a full-outer join of two
    * ≤[[Sim22Pool]]-row frames — workload-sized, never corpus-sized.
    * Determinism: ranks are row_numbers over (rounded score, doc_id),
    * so both engines rank identically; RRF sums unit fractions of
    * small integers, rounds(6). */
  def sim22HybridRrf(spark: SparkSession, dir: String): DataFrame =
    hybridRrf(spark, Tables.documents(spark, dir),
      Tables.embeddings(spark, dir), queryVecId = 0L)

  def hybridRrf(spark: SparkSession, docs: DataFrame, emb: DataFrame,
                queryVecId: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wLex = Window.orderBy(col("bm25").desc, col("doc_id"))
    val lex = TextStats.bm25Scores(docs.filter(col("doc_id") =!= queryVecId))
      .orderBy(col("bm25").desc, col("doc_id")).limit(Sim22Pool)
      .withColumn("lex_rank", row_number().over(wLex))
      .select(col("doc_id"), col("bm25"), col("lex_rank"))
    val q = emb.filter(col("vec_id") === queryVecId &&
        col("embedding").isNotNull)
      .select(asDouble(col("embedding")).as("qemb"))
    val wDen = Window.orderBy(col("cos_sim").desc, col("doc_id"))
    val den = emb.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        round(VectorOps.vecCosine(spark,
          asDouble(col("embedding")), col("qemb")), 4).as("cos_sim"))
      .filter(!isnan(col("cos_sim")))
      .orderBy(col("cos_sim").desc, col("doc_id")).limit(Sim22Pool)
      .withColumn("dense_rank", row_number().over(wDen))
    lex.join(den, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("lex_rank"), col("dense_rank"),
        col("bm25"), col("cos_sim"),
        round(
          coalesce(lit(1.0) / (lit(Sim22RrfK) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(Sim22RrfK) + col("dense_rank")),
              lit(0.0)), 6).as("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(10)
  }

  /** Pool, k, and trade-off weight shared with SimilaritySpec. */
  private[ext] val Sim14Pool = 50
  private[ext] val Sim14K = 10
  private[ext] val Sim14Lambda = 0.7

  /** SIM14 — MMR diversified top-k (maximal marginal relevance,
    * Carbonell & Goldstein 1998): retrieval that refuses to spend its k
    * slots on near-duplicates of one result — each pick maximizes
    * λ·rel(q,d) − (1−λ)·max_{s∈selected} sim(d,s). The RAG/eval-set
    * retrieval shape: a plain top-k over a corpus with duplicate
    * clusters returns k copies of the best match; MMR returns the best
    * match plus what ELSE the corpus knows.
    *
    * 100 TB shape: the sim7 exact-rerank split. Stage 1 (all the
    * corpus-sized work) is the sim1 brute kernel — broadcast query
    * vector, fused codegen cosine, TakeOrderedAndProject top-POOL; only
    * pool×d doubles ever reach the driver (workload-sized by the
    * caller's pool contract, the sim6 discipline). Stage 2 is the
    * greedy MMR loop over the pool — O(k·pool) driver arithmetic on
    * frames that no longer scale with the corpus. Scores round(4)
    * before every argmax with vec_id tie-break, so selection order is
    * deterministic across runs, partitionings, and JVMs. Rows-only by
    * nature (the greedy recurrence has no SQL form); SimilaritySpec
    * pins λ=1 ≡ plain top-k and the planted-cluster diversification
    * property. */
  def mmrTopK(spark: SparkSession, emb: DataFrame, queryVecId: Long,
              pool: Int = Sim14Pool, k: Int = Sim14K,
              lambda: Double = Sim14Lambda): DataFrame = {
    import spark.implicits._
    val e = emb.select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val q = e.filter(col("vec_id") === queryVecId).select(col("emb").as("qemb"))
    val cands = e.filter(col("vec_id") =!= queryVecId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(VectorOps.vecCosine(spark, col("emb"), col("qemb")), 4)
          .as("rel"),
        col("emb"))
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(pool)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Double](2).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0) 0.0 else d / denom
    }
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val selected = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Long, Double, Double, Double)] // rank, id, rel, maxSim, mmr
    val chosen = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val remaining = scala.collection.mutable.LinkedHashMap(
      cands.map(c => c._1 -> c): _*)
    while (selected.size < math.min(k, cands.length)) {
      val scored = remaining.values.map { case (id, rel, v) =>
        val maxSim =
          if (chosen.isEmpty) 0.0 else r4(chosen.map(cos(v, _)).max)
        (id, rel, maxSim, r4(lambda * rel - (1 - lambda) * maxSim))
      }
      val best = scored.minBy { case (id, _, _, mmr) => (-mmr, id) }
      selected += ((selected.size + 1, best._1, best._2, best._3, best._4))
      chosen += remaining(best._1)._3
      remaining.remove(best._1)
    }
    selected.toSeq
      .toDF("sel_rank", "vec_id", "rel", "max_sim_selected", "mmr")
  }

  def sim14MmrTopK(spark: SparkSession, dir: String): DataFrame =
    mmrTopK(spark, Tables.embeddings(spark, dir), queryVecId = 0L)

  /** Assign vectors to EXISTING IVF centroids — the quantizer-frozen
    * maintenance verb (encode, never train). One map pass: per row the
    * k squared distances fold over the broadcast center literal and
    * argmin picks the cell (first index on ties — KMeans' own
    * scanning order). This is what a daily vector append costs:
    * O(batch · k · d) arithmetic, zero iterations, zero shuffles. */
  private[graft] def ivfAssign(batch: DataFrame,
                               centers: Array[Array[Double]]): DataFrame =
    // The fused codegen argmin ([[graft.functions.VecArgminCell]])
    // replaces the old HOF form (k interpreted zip_with/aggregate
    // lambdas per row + a k-element distance array re-scanned by
    // array_min and array_position) — bit-identical assignment
    // (sequential per-center sums, first minimal index on ties;
    // VectorOpsSpec pins it against the HOF form), so every published
    // delta/assignment is unchanged. The k×d centroid matrix rides in
    // ONE folded Literal (typedLit) — a CreateArray tree of k·d nodes
    // measurably bloats plan analysis once cellsFor pushes k into the
    // hundreds (the r15 10× probe's dominant cost).
    batch.withColumn("cell", graft.functions.VectorOps.vecArgminCell(
      batch.sparkSession, col("emb"),
      typedLit(centers.map(_.toSeq).toSeq)))

  /** SIM23 — incremental ANN index maintenance (r13 verdict ask #2):
    * the d18 batch-vs-persisted-index discipline applied to the
    * quantization family. An appended vector batch assigns to the
    * EXISTING published IVF centroids ([[ivfAssign]] — encode, never
    * train) and the delta publishes into the [[IndexStore]] BESIDE the
    * base index; the maintained index is base ∪ delta. This is the
    * daily-crawl shape for vectors: without it an append-only corpus
    * pays a full k-means retrain + corpus re-encode per batch — O(corpus)
    * per day — where the maintenance path is O(batch).
    *
    * The card per delta-touched cell: base/delta occupancy plus two
    * VERIFIED flags — `encode_match` (the incrementally-maintained
    * assignment is row-identical to a frozen-centroid encode of the
    * full union: execution strategy, not semantics — the j10/s20
    * discipline) and `serve_match` (the top-10 serve for the standard
    * query is identical from either index). The planted batch derives
    * deterministically from the corpus itself (tail ids re-keyed past
    * max(vec_id), dimensions rolled by one so the appends are new
    * vectors, not exact dups — the sfx10 replica device). Rows-only:
    * the flags and census compare OUR index maintenance, which has no
    * SQL counterpart; IndexStoreSpec pins the zero-retrain property
    * through the `builds` log and the scorecard-grade serve.
    *
    * The full-union re-encode here is the card's self-check, priced
    * O(corpus · k · d) — a production run maintains the index WITHOUT
    * it (the delta branch alone) and audits on a sampled slice, the
    * d5-verify economics. */
  /** The sim23 planted-append device: tail ids re-keyed past max id,
    * dimensions rolled by one so the appends are NEW vectors, not
    * exact dups. Shared by sim23 and sim25's lifecycle composition. */
  private[graft] def appendBatchFor(spark: SparkSession,
                                    dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    val maxId = emb.agg(max(col("vec_id"))).head().getLong(0)
    emb.filter(col("vec_id") % 5 === 0)
      .select((col("vec_id") + maxId + 1).as("vec_id"),
        concat(expr("slice(emb, 2, size(emb) - 1)"),
          expr("slice(emb, 1, 1)")).as("emb"))
  }

  /** The published sim23 delta artifact (frozen-centroid encode of the
    * planted append batch) — load-or-build through the store. */
  private[graft] def ivfDeltaFor(spark: SparkSession, dir: String,
                                 k: Int): DataFrame = {
    val base = ivfIndexFor(spark, dir, k)
    IndexStore.loadOrBuild(spark, dir, "embeddings",
      s"ivf_k${k}_delta_b5")(
      Seq("assigned" ->
        ivfAssign(appendBatchFor(spark, dir), base.centers)))("assigned")
  }

  /** The published sim24 tombstone artifact ((vec_id, cell) rows for
    * the deterministic forget set) — load-or-build through the store. */
  private[graft] def ivfTombstonesFor(spark: SparkSession, dir: String,
                                      k: Int): DataFrame = {
    val base = ivfIndexFor(spark, dir, k)
    IndexStore.loadOrBuild(spark, dir, "embeddings",
      s"ivf_k${k}_tombstones_m101")(
      Seq("tombstones" -> base.assigned
        .filter(col("vec_id") % 101 === 7)
        .select(col("vec_id"), col("cell"))))("tombstones")
  }

  def sim23IncrementalIvf(spark: SparkSession, dir: String): DataFrame = {
    val k = Sim4K
    val base = ivfIndexFor(spark, dir, k)
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
    def batchRaw = appendBatchFor(spark, dir)
    // the delta publishes through the store — a fresh session serves
    // base AND delta with zero jobs of any kind; the build closure,
    // when it does run, is the cheap frozen-centroid encode
    val delta = ivfDeltaFor(spark, dir, k)
    val inc = base.assigned.select(col("vec_id"), col("emb"), col("cell"))
      .unionByName(delta.select(col("vec_id"), col("emb"), col("cell")))
    val full = ivfAssign(emb.unionByName(batchRaw), base.centers)
    val mismatches = inc.select(col("vec_id"), col("cell"))
      .join(full.select(col("vec_id"), col("cell").as("cell_full")),
        Seq("vec_id"))
      .filter(col("cell") =!= col("cell_full")).count()
    val qEmb = emb.filter(col("vec_id") === 0).select(col("emb")).head()
      .getSeq[Double](0).toArray
    def serve(idx: IvfIndex) =
      ivfQuery(spark, idx, qEmb, nProbe = 3, excludeVecId = Some(0L))
        .collect().toSeq
    val serveMatch =
      serve(IvfIndex(inc, base.centers)) ==
        serve(IvfIndex(full, base.centers))
    base.assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_base"))
      .join(delta.groupBy(col("cell")).agg(count(lit(1)).as("n_delta")),
        Seq("cell"), "right")
      .na.fill(0L, Seq("n_base"))
      .select(col("cell"), col("n_base"), col("n_delta"),
        lit(mismatches == 0).as("encode_match"),
        lit(serveMatch).as("serve_match"))
      .orderBy(col("cell"))
  }

  /** SIM24 — delete from the published ANN index WITHOUT retraining:
    * the right-to-be-forgotten verb (d46's cascade) reaching the
    * vector store. A forget request becomes a TOMBSTONE artifact
    * published beside the base index through the [[IndexStore]]
    * (sim23's delta discipline in reverse): serving anti-joins the
    * tombstones, so a deletion costs O(|forgotten|) rows written once
    * — never a k-means retrain or a corpus re-encode — and a later
    * compaction can fold tombstones into the base at leisure (the s16
    * compaction shape). At 100 TB this is the difference between a
    * compliance deadline met in seconds and one gated on a full
    * training job. Tombstones carry (vec_id, cell) — the cell from the
    * base assignment rides along so the per-cell audit is join-free.
    *
    * Card per tombstone-touched cell: base/tombstone/after occupancy
    * plus two VERIFIED flags — `conservation` (after ≡ base −
    * tombstoned per cell, the d46 accounting device) and `purge_clean`
    * (a FULL-probe serve of the standard query returns zero forgotten
    * ids — the deletion reaches the SERVING path, not just the storage
    * view). The forget set is deterministic (vec_id % 101 = 7 — a GDPR
    * request is an id list, which is exactly what the tombstone
    * artifact is). Rows-only: the card audits OUR index maintenance;
    * IndexStoreSpec pins the zero-retrain property via the `builds`
    * log and that a fresh session serves the tombstoned index with
    * zero training jobs. */
  def sim24AnnForget(spark: SparkSession, dir: String): DataFrame = {
    val k = Sim4K
    val base = ivfIndexFor(spark, dir, k)
    val tomb = ivfTombstonesFor(spark, dir, k)
    val served = base.assigned
      .join(tomb.select(col("vec_id")), Seq("vec_id"), "left_anti")
    val qEmb = base.assigned.filter(col("vec_id") === 0)
      .select(col("emb")).head().getSeq[Double](0).toArray
    // full probe (nProbe = k): the strongest serving check — no cell
    // can hide a forgotten id behind probe selection
    val purgeClean = ivfQuery(spark, IvfIndex(served, base.centers),
      qEmb, nProbe = k, excludeVecId = Some(0L))
      .join(tomb.select(col("vec_id")), Seq("vec_id"), "left_semi")
      .isEmpty
    tomb.groupBy(col("cell")).agg(count(lit(1)).as("n_tomb"))
      .join(base.assigned.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_base")), Seq("cell"))
      .join(served.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_after")), Seq("cell"), "left")
      .na.fill(0L, Seq("n_after"))
      .select(col("cell"), col("n_base"), col("n_tomb"), col("n_after"),
        (col("n_after") === col("n_base") - col("n_tomb"))
          .as("conservation"),
        lit(purgeClean).as("purge_clean"))
      .orderBy(col("cell"))
  }

  /** SIM25 — index COMPACTION: the maintenance verbs close into a
    * lifecycle. sim23's delta-append and sim24's tombstone-delete keep
    * writes O(batch)/O(|forgotten|), but each leaves the SERVING plan
    * a little wider (a union, an anti-join); compaction folds
    * base ∪ delta ∖ tombstones into ONE published artifact (a new
    * store generation, `compacted_g1`) so serving returns to a single
    * scan — exactly parquet-compaction's s16 contract lifted to the
    * index tier: background cost buys back per-query plan width, and
    * the switch is atomic because the generation publishes through the
    * same marker-gated store path every artifact uses. No retraining:
    * compaction never touches the quantizer — it is a row-level
    * merge of already-encoded artifacts.
    *
    * Card per cell: base/delta/tombstone/compacted occupancy + two
    * VERIFIED flags — `compact_match` (the compacted artifact is
    * row-identical to the composed view, both directions) and
    * `serve_match` (the standard full-probe query serves identically
    * from the one-scan generation and the composed three-way plan).
    * Rows-only: audits OUR index maintenance; IndexStoreSpec pins
    * that compaction is the only build on a warm lifecycle and that a
    * fresh session serves the compacted generation with zero builds. */
  def sim25IndexCompaction(spark: SparkSession, dir: String): DataFrame = {
    val k = Sim4K
    val base = ivfIndexFor(spark, dir, k)
    val delta = ivfDeltaFor(spark, dir, k)
    val tomb = ivfTombstonesFor(spark, dir, k)
    def composed = base.assigned
      .select(col("vec_id"), col("emb"), col("cell"))
      .unionByName(delta.select(col("vec_id"), col("emb"), col("cell")))
      .join(tomb.select(col("vec_id")), Seq("vec_id"), "left_anti")
    val compacted = IndexStore.loadOrBuild(spark, dir, "embeddings",
      s"ivf_k${k}_compacted_g1")(Seq("assigned" -> composed))("assigned")
    val compactMatch =
      compacted.select(col("vec_id"), col("cell"))
        .except(composed.select(col("vec_id"), col("cell"))).isEmpty &&
      composed.select(col("vec_id"), col("cell"))
        .except(compacted.select(col("vec_id"), col("cell"))).isEmpty
    val qEmb = base.assigned.filter(col("vec_id") === 0)
      .select(col("emb")).head().getSeq[Double](0).toArray
    def serve(assigned: DataFrame) =
      ivfQuery(spark, IvfIndex(assigned, base.centers), qEmb,
        nProbe = k, excludeVecId = Some(0L)).collect().toSeq
    val serveMatch = serve(compacted) == serve(composed)
    base.assigned.groupBy(col("cell")).agg(count(lit(1)).as("n_base"))
      .join(delta.groupBy(col("cell")).agg(count(lit(1)).as("n_delta")),
        Seq("cell"), "left")
      .join(tomb.groupBy(col("cell")).agg(count(lit(1)).as("n_tomb")),
        Seq("cell"), "left")
      .join(compacted.groupBy(col("cell"))
        .agg(count(lit(1)).as("n_compacted")), Seq("cell"), "left")
      .na.fill(0L, Seq("n_delta", "n_tomb", "n_compacted"))
      .select(col("cell"), col("n_base"), col("n_delta"), col("n_tomb"),
        col("n_compacted"),
        (col("n_compacted") ===
          col("n_base") + col("n_delta") - col("n_tomb"))
          .as("conservation"),
        lit(compactMatch).as("compact_match"),
        lit(serveMatch).as("serve_match"))
      .orderBy(col("cell"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim27_knn_graph" -> sim27KnnGraph,
    "sim28_cell_drift" -> sim28CellDrift,
    "sim29_knn_cartography" -> sim29KnnCartography,
    "sim30_retrain_whatif" -> sim30RetrainWhatif,
    "sim31_retrain_commit" -> sim31RetrainCommit,
    "sim32_embedding_spectrum" -> sim32EmbeddingSpectrum,
    "sim33_pca_project" -> sim33PcaProject,
    "sim34_reduced_ann_serve" -> sim34ReducedAnnServe,
    "sim35_pca_rank_curve" -> sim35PcaRankCurve,
    "sim23_incremental_ivf" -> sim23IncrementalIvf,
    "sim24_ann_forget" -> sim24AnnForget,
    "sim25_index_compaction" -> sim25IndexCompaction,
    "sim16_ivfpq_ann" -> sim16IvfPqAnn,
    "sim17_ivfpq_recall" -> sim17IvfPqRecall,
    "sim15_binary_ann" -> sim15BinaryAnn,
    "sim21_int8_ann" -> sim21Int8Ann,
    "sim22_hybrid_rrf" -> sim22HybridRrf,
    "sim14_mmr_topk" -> sim14MmrTopK,
    "sim5_label_centroids" -> sim5LabelCentroids,
    "sim1_cosine_topk" -> sim1CosineTopK,
    "sim26_matryoshka_ann" -> sim26MatryoshkaAnn,
    "sim18_filtered_ann" -> sim18FilteredAnn,
    "sim19_random_projection" -> ((s, d) => sim19RandomProjection(s, d)),
    "sim20_ann_scorecard" -> sim20AnnScorecard,
    "sim2_ann_lsh" -> sim2AnnLsh,
    "sim3_neardup_pairs" -> sim3NearDupPairs,
    "sim4_ivf_ann" -> sim4IvfAnn,
    "sim6_knn_join" -> sim6KnnJoin,
    "sim7_pq_ann" -> sim7PqAnn,
    "sim8_radius_search" -> sim8RadiusSearch,
    "sim9_norm_qc" -> sim9NormQc,
    "sim10_centroid_separation" -> sim10CentroidSeparation,
    "sim11_ivf_recall" -> sim11IvfRecall,
    "sim12_int8_quant" -> sim12Int8Quant,
    "sim13_embedding_drift" -> sim13EmbeddingDrift
  )

  val oracle: Map[String, String] = Map(
    // sim22 replays both retriever legs — t19's BM25 formula verbatim
    // (stats over the query-item-excluded corpus, like the Spark side)
    // and the sim19-device explicit cosine folds — then the rank
    // assignment and the RRF sum with the same interpolated constants
    "sim22_hybrid_rrf" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS INT) AS dl,
        |    CAST(len(list_filter(w, x -> x = 'spark')) AS INT) AS tf_spark,
        |    CAST(len(list_filter(w, x -> x = 'vector')) AS INT) AS tf_vector,
        |    CAST(len(list_filter(w, x -> x = 'stream')) AS INT) AS tf_stream
        |  FROM (SELECT doc_id,
        |          string_split(lower(coalesce(text, '')), ' ') AS w
        |        FROM documents WHERE doc_id <> 0)),
        |s AS (
        |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
        |    sum(CASE WHEN tf_spark  > 0 THEN 1 ELSE 0 END) AS df_spark,
        |    sum(CASE WHEN tf_vector > 0 THEN 1 ELSE 0 END) AS df_vector,
        |    sum(CASE WHEN tf_stream > 0 THEN 1 ELSE 0 END) AS df_stream
        |  FROM t),
        |lexall AS (
        |  SELECT doc_id,
        |    round(
        |      ln((n_docs - df_spark + 0.5) / (df_spark + 0.5) + 1.0)
        |        * (tf_spark * 2.2)
        |        / (tf_spark + 1.2 * (0.25
        |             + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))
        |      + ln((n_docs - df_vector + 0.5) / (df_vector + 0.5) + 1.0)
        |        * (tf_vector * 2.2)
        |        / (tf_vector + 1.2 * (0.25
        |             + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))
        |      + ln((n_docs - df_stream + 0.5) / (df_stream + 0.5) + 1.0)
        |        * (tf_stream * 2.2)
        |        / (tf_stream + 1.2 * (0.25
        |             + 0.75 * dl / (CAST(sum_dl AS DOUBLE) / n_docs))), 4)
        |      AS bm25
        |  FROM t CROSS JOIN s
        |  WHERE tf_spark + tf_vector + tf_stream > 0),
        |lex AS (
        |  SELECT doc_id, bm25,
        |    CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
        |      AS lex_rank
        |  FROM lexall ORDER BY bm25 DESC, doc_id LIMIT $Sim22Pool),
        |q AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
        |  WHERE vec_id = 0 AND embedding IS NOT NULL),
        |denall AS (
        |  SELECT e.vec_id AS doc_id,
        |    round(
        |      list_sum(list_transform(range(1, 65), i -> e.v[i] * q.qe[i]))
        |      / (sqrt(list_sum(list_transform(range(1, 65),
        |            i -> e.v[i] * e.v[i])))
        |       * sqrt(list_sum(list_transform(range(1, 65),
        |            i -> q.qe[i] * q.qe[i])))), 4) AS cos_sim
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |        FROM embeddings
        |        WHERE vec_id <> 0 AND embedding IS NOT NULL) e
        |  CROSS JOIN q),
        |den AS (
        |  SELECT doc_id, cos_sim,
        |    CAST(ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS INT)
        |      AS dense_rank
        |  FROM denall WHERE NOT isnan(cos_sim)
        |  ORDER BY cos_sim DESC, doc_id LIMIT $Sim22Pool)
        |SELECT doc_id, lex_rank, dense_rank, bm25, cos_sim,
        |  round(coalesce(1.0 / ($Sim22RrfK + lex_rank), 0)
        |      + coalesce(1.0 / ($Sim22RrfK + dense_rank), 0), 6) AS rrf
        |FROM lex FULL JOIN den USING (doc_id)
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    // sim19's oracle reconstructs the ±1 matrix from the SAME IdHash
    // arithmetic (no matrix crosses engines — it exists only as the
    // interpolated expression below) and replays projection, cosines,
    // and the distortion report with explicit same-order list folds
    "sim19_random_projection" ->
      s"""WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |p AS (
        |  SELECT vec_id, label, emb,
        |    list_transform(range(0, 16), j ->
        |      list_sum(list_transform(range(0, 64), i ->
        |        emb[i + 1] *
        |        CASE WHEN ${graft.functions.IdHash.sql("(i * 16 + j)", 2)} = 0
        |             THEN 1.0 ELSE -1.0 END))) AS proj
        |  FROM e),
        |pairs AS (
        |  SELECT a.label,
        |    round(
        |      list_sum(list_transform(range(1, 65), i -> a.emb[i] * b.emb[i]))
        |      / (sqrt(list_sum(list_transform(range(1, 65),
        |            i -> a.emb[i] * a.emb[i])))
        |       * sqrt(list_sum(list_transform(range(1, 65),
        |            i -> b.emb[i] * b.emb[i])))), 4) AS cos_orig,
        |    round(
        |      list_sum(list_transform(range(1, 17), i -> a.proj[i] * b.proj[i]))
        |      / (sqrt(list_sum(list_transform(range(1, 17),
        |            i -> a.proj[i] * a.proj[i])))
        |       * sqrt(list_sum(list_transform(range(1, 17),
        |            i -> b.proj[i] * b.proj[i])))), 4) AS cos_proj
        |  FROM p a JOIN p b ON b.vec_id = a.vec_id + 1),
        |f AS (
        |  SELECT label,
        |    CAST(round(cos_orig * 10000, 0) AS BIGINT) AS co,
        |    CAST(round(cos_proj * 10000, 0) AS BIGINT) AS cp
        |  FROM pairs
        |  WHERE NOT isnan(cos_orig) AND NOT isnan(cos_proj))
        |SELECT label, count(*) AS n_pairs,
        |  round(sum(co) / 10000.0 / count(*), 4) AS avg_cos_orig,
        |  round(sum(cp) / 10000.0 / count(*), 4) AS avg_cos_proj,
        |  round(sum(abs(co - cp)) / 10000.0 / count(*), 4) AS avg_abs_err,
        |  round(max(abs(co - cp)) / 10000.0, 4) AS max_abs_err
        |FROM f GROUP BY label ORDER BY label""".stripMargin,
    "sim13_embedding_drift" ->
      s"""WITH v1 AS (
        |  SELECT label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |v2 AS (
        |  SELECT label,
        |    CASE WHEN vec_id % $Sim13Mod = 0
        |         THEN list_transform(CAST(embedding AS DOUBLE[]), x -> -x)
        |         ELSE CAST(embedding AS DOUBLE[]) END AS v
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |c1 AS (
        |  SELECT label, list(m ORDER BY dim) AS c FROM (
        |    SELECT label, dim, avg(x) AS m FROM (
        |      SELECT label, unnest(v) AS x,
        |        generate_subscripts(v, 1) AS dim FROM v1)
        |    GROUP BY label, dim) GROUP BY label),
        |c2 AS (
        |  SELECT label, list(m ORDER BY dim) AS c FROM (
        |    SELECT label, dim, avg(x) AS m FROM (
        |      SELECT label, unnest(v) AS x,
        |        generate_subscripts(v, 1) AS dim FROM v2)
        |    GROUP BY label, dim) GROUP BY label),
        |n AS (SELECT label, count(*) AS n_vecs FROM v1 GROUP BY label),
        |d AS (
        |  SELECT n.label, n_vecs,
        |    round(1 - list_cosine_similarity(c1.c, c2.c), 4) + 0 AS drift
        |  FROM n JOIN c1 USING (label) JOIN c2 USING (label))
        |SELECT label, n_vecs, drift FROM d
        |WHERE NOT isnan(drift)
        |ORDER BY drift DESC, label""".stripMargin,
    "sim12_int8_quant" ->
      """WITH e AS (
        |  SELECT label, CAST(embedding AS DOUBLE[]) AS v
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |s AS (
        |  SELECT label, v,
        |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
        |  FROM e),
        |q AS (
        |  SELECT label, scale,
        |    round(list_cosine_similarity(v,
        |      list_transform(v, x -> round(x / scale) * scale)), 4) AS c
        |  FROM s WHERE scale > 0)
        |SELECT label, count(*) AS n_vecs,
        |  round(avg(c), 4) AS avg_recon_cos,
        |  min(c) AS min_recon_cos,
        |  round(avg(scale), 6) AS avg_scale
        |FROM q GROUP BY label ORDER BY label""".stripMargin,
    "sim10_centroid_separation" ->
      """WITH x AS (
        |  SELECT label, generate_subscripts(embedding, 1) AS dim,
        |         unnest(CAST(embedding AS DOUBLE[])) AS v
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |d AS (SELECT label, dim, avg(v) AS av FROM x GROUP BY label, dim),
        |c AS (SELECT label, list(av ORDER BY dim) AS centroid
        |      FROM d GROUP BY label)
        |SELECT a.label AS label_a, b.label AS label_b,
        |  round(list_cosine_similarity(a.centroid, b.centroid), 4) AS cos_sim
        |FROM c a JOIN c b ON a.label < b.label
        |WHERE NOT isnan(list_cosine_similarity(a.centroid, b.centroid))
        |ORDER BY label_a, label_b""".stripMargin,
    "sim9_norm_qc" ->
      """WITH n AS (
        |  SELECT label,
        |    round(sqrt(coalesce(list_sum(list_transform(
        |      CAST(embedding AS DOUBLE[]), x -> x * x)), 0)), 4) AS norm
        |  FROM embeddings WHERE embedding IS NOT NULL)
        |SELECT label, count(*) AS n_vecs,
        |  round(avg(norm), 4) AS avg_norm,
        |  min(norm) AS min_norm, max(norm) AS max_norm,
        |  CAST(sum(CASE WHEN norm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  CAST(sum(CASE WHEN norm < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small
        |FROM n GROUP BY label ORDER BY label""".stripMargin,
    "sim5_label_centroids" ->
      """WITH x AS (
        |  SELECT label,
        |    unnest(CAST(embedding AS DOUBLE[])) AS v,
        |    generate_subscripts(embedding, 1) - 1 AS dim
        |  FROM embeddings)
        |SELECT label, count(*) AS n_vecs, CAST(dim AS INT) AS dim,
        |  round(avg(v), 4) AS centroid
        |FROM x WHERE dim < 8
        |GROUP BY label, dim ORDER BY label, dim""".stripMargin,
    "sim18_filtered_ann" ->
      """SELECT b.vec_id, b.label,
        |  round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
        |    CAST(a.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id = 0 AND b.vec_id <> 0 AND b.label = a.label
        |WHERE NOT isnan(list_cosine_similarity(
        |  CAST(b.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])))
        |ORDER BY cos_sim DESC, b.vec_id LIMIT 10""".stripMargin,
    // sim26 replays the two-stage shape: prefix-slice cosine top-C,
    // then exact full-dim rerank — both scores rounded BEFORE ranking
    // with vec_id tie-breaks so candidate set and order are identical
    "sim26_matryoshka_ann" ->
      """WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
        |c AS (
        |  SELECT b.vec_id, b.embedding,
        |    round(list_cosine_similarity(
        |      CAST(b.embedding[1:16] AS DOUBLE[]),
        |      CAST(a.embedding[1:16] AS DOUBLE[])), 4) AS cos_coarse
        |  FROM embeddings b, q a
        |  WHERE b.vec_id <> 0
        |    AND NOT isnan(round(list_cosine_similarity(
        |      CAST(b.embedding[1:16] AS DOUBLE[]),
        |      CAST(a.embedding[1:16] AS DOUBLE[])), 4))
        |  ORDER BY cos_coarse DESC, b.vec_id LIMIT 100)
        |SELECT c.vec_id, c.cos_coarse,
        |  round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]),
        |    CAST(a.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM c, q a
        |WHERE NOT isnan(round(list_cosine_similarity(
        |    CAST(c.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])), 4))
        |ORDER BY cos_sim DESC, c.vec_id LIMIT 10""".stripMargin,
    "sim1_cosine_topk" ->
      """SELECT b.vec_id,
        |  round(list_cosine_similarity(CAST(b.embedding AS DOUBLE[]),
        |    CAST(a.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id = 0 AND b.vec_id <> 0
        |ORDER BY cos_sim DESC, b.vec_id LIMIT 10""".stripMargin,
    // sim32 (r19 verdict ask #5, the literal device turned on its own
    // diagnosis): given the driver-solved eigenBASIS as a literal, the
    // eigenVALUES are data-derived — the population variance of the
    // corpus projected onto eigenvector j IS λ_j — so DuckDB reproduces
    // the whole spectrum card (trace, top-3, share, PR, the collapse
    // verdict) from per-projection var_pop aggregates. The solve's
    // CLAIM (these directions diagonalize the covariance) is exactly
    // what the replay cross-checks; only the solve itself stays
    // spec-pinned on hand spectra.
    "sim32_embedding_spectrum" ->
      """WITH fin AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE embedding IS NOT NULL
        |    AND len(list_filter(CAST(embedding AS DOUBLE[]),
        |          x -> NOT isfinite(x))) = 0),
        |p AS (
        |  SELECT list_transform(__PCA_BASIS64__, b ->
        |    list_sum(list_transform(range(1, 65),
        |      i -> (emb[i] - (__PCA_MU64__)[i]) * b[i]))) AS proj
        |  FROM fin),
        |lam AS (
        |  SELECT d.j AS j, var_pop(proj[d.j]) AS l
        |  FROM p, (SELECT unnest(range(1, 65)) AS j) d
        |  GROUP BY d.j),
        |agg AS (
        |  SELECT SUM(l) AS trace, SUM(l * l) AS l2,
        |    MAX(CASE WHEN j = 1 THEN l END) AS e1,
        |    MAX(CASE WHEN j = 2 THEN l END) AS e2,
        |    MAX(CASE WHEN j = 3 THEN l END) AS e3
        |  FROM lam)
        |SELECT
        |  (SELECT count(*) FROM fin) AS n_vecs,
        |  CAST(64 AS INT) AS dim,
        |  round(trace, 6) AS trace,
        |  round(e1, 6) AS top1, round(e2, 6) AS top2, round(e3, 6) AS top3,
        |  CASE WHEN trace > 0 THEN round(e1 / trace, 4)
        |    ELSE 0.0 END AS top1_share,
        |  CASE WHEN trace > 0 THEN round(trace * trace / l2, 4)
        |    ELSE 0.0 END AS participation_ratio,
        |  CASE WHEN trace <= 0 THEN TRUE
        |    ELSE (e1 / trace >= 0.5 OR trace * trace / l2 <= 8.0)
        |  END AS collapse_major
        |FROM agg""".stripMargin,
    // sim33 (r19 verdict ask #5): the FULL card replayed from the
    // driver-solved basis as literals (__PCA_*__ tokens expand at dump
    // time — graft.OracleLiterals; the Jacobi solve is deterministic,
    // so the literals are exactly what the Spark query used). DuckDB
    // value-checks the projection arithmetic, both round-before-rank
    // top-10 probes, the recall, and the variance share against a
    // DATA-derived trace (sum of per-dim population variances = Σλ) —
    // only the eigensolve itself stays spec-pinned.
    "sim33_pca_project" ->
      """WITH raw AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE embedding IS NOT NULL),
        |fin AS (
        |  SELECT * FROM raw
        |  WHERE len(list_filter(emb, x -> NOT isfinite(x))) = 0),
        |tr AS (
        |  SELECT SUM(v) AS trace FROM (
        |    SELECT var_pop(emb[d.d]) AS v
        |    FROM fin, (SELECT unnest(range(1, 65)) AS d) d
        |    GROUP BY d.d)),
        |p AS (
        |  SELECT vec_id, emb,
        |    list_transform(__PCA_BASIS16__, b ->
        |      list_sum(list_transform(range(1, 65),
        |        i -> (emb[i] - (__PCA_MU64__)[i]) * b[i]))) AS proj
        |  FROM raw),
        |q AS (SELECT emb AS qemb, proj AS qproj FROM p WHERE vec_id = 0),
        |truth AS (
        |  SELECT p.vec_id,
        |    round(list_cosine_similarity(p.emb, q.qemb), 4) AS c
        |  FROM p, q WHERE p.vec_id <> 0
        |    AND NOT isnan(list_cosine_similarity(p.emb, q.qemb))
        |  ORDER BY c DESC, p.vec_id LIMIT 10),
        |got AS (
        |  SELECT p.vec_id,
        |    round(list_cosine_similarity(p.proj, q.qproj), 4) AS c
        |  FROM p, q WHERE p.vec_id <> 0
        |    AND NOT isnan(list_cosine_similarity(p.proj, q.qproj))
        |  ORDER BY c DESC, p.vec_id LIMIT 10)
        |SELECT
        |  (SELECT count(*) FROM fin) AS n_vecs,
        |  CAST(64 AS INT) AS dim,
        |  CAST(16 AS INT) AS r,
        |  CASE WHEN (SELECT trace FROM tr) > 0
        |    THEN round(__PCA_EIGSUM16__ / (SELECT trace FROM tr), 4)
        |    ELSE 0.0 END AS variance_captured,
        |  CASE
        |    WHEN NOT EXISTS (SELECT 1 FROM q) THEN NULL
        |    WHEN (SELECT count(*) FROM truth) = 0 THEN 0.0
        |    ELSE round(
        |      CAST((SELECT count(*) FROM got JOIN truth USING (vec_id))
        |        AS DOUBLE)
        |      / (SELECT count(*) FROM truth), 4)
        |  END AS recall_at_10,
        |  EXISTS (SELECT 1 FROM q) AS probe_ok""".stripMargin,
    // sim35 (r19 verdict ask #5, same device as sim33's): the whole
    // rank curve replayed — projection onto the FULL 64-dim basis
    // literal, the rank-r probe sliced as its prefix (p.proj[1:r] ≡
    // slice(proj, 1, r)), per-r eigenvalue prefix sums as literals,
    // ONE shared truth. Built programmatically so every r's block is
    // the same text by construction.
    "sim35_pca_rank_curve" -> {
      val perR = Seq(4, 8, 16, 32, 64).map { r =>
        val mem = BigDecimal(r.toDouble / 64)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        s"""SELECT
           |  (SELECT count(*) FROM fin) AS n_vecs,
           |  CAST(64 AS INT) AS dim,
           |  CAST($r AS INT) AS r,
           |  CASE WHEN (SELECT trace FROM tr) > 0
           |    THEN round(__PCA_EIGSUM${r}__ / (SELECT trace FROM tr), 4)
           |    ELSE 0.0 END AS variance_captured,
           |  CASE
           |    WHEN NOT EXISTS (SELECT 1 FROM q) THEN NULL
           |    WHEN (SELECT count(*) FROM truth) = 0 THEN 0.0
           |    ELSE round(
           |      CAST((SELECT count(*) FROM got$r JOIN truth USING (vec_id))
           |        AS DOUBLE)
           |      / (SELECT count(*) FROM truth), 4)
           |  END AS recall_at_10,
           |  EXISTS (SELECT 1 FROM q) AS probe_ok,
           |  $mem AS memory_ratio""".stripMargin
      }.mkString("\n", "\nUNION ALL\n", "\nORDER BY r")
      val gotCtes = Seq(4, 8, 16, 32, 64).map { r =>
        s"""got$r AS (
           |  SELECT p.vec_id,
           |    round(list_cosine_similarity(p.proj[1:$r], q.qproj[1:$r]), 4)
           |      AS c
           |  FROM p, q WHERE p.vec_id <> 0
           |    AND NOT isnan(
           |      list_cosine_similarity(p.proj[1:$r], q.qproj[1:$r]))
           |  ORDER BY c DESC, p.vec_id LIMIT 10)""".stripMargin
      }.mkString(",\n")
      s"""WITH raw AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
         |  FROM embeddings WHERE embedding IS NOT NULL),
         |fin AS (
         |  SELECT * FROM raw
         |  WHERE len(list_filter(emb, x -> NOT isfinite(x))) = 0),
         |tr AS (
         |  SELECT SUM(v) AS trace FROM (
         |    SELECT var_pop(emb[d.d]) AS v
         |    FROM fin, (SELECT unnest(range(1, 65)) AS d) d
         |    GROUP BY d.d)),
         |p AS (
         |  SELECT vec_id, emb,
         |    list_transform(__PCA_BASIS64__, b ->
         |      list_sum(list_transform(range(1, 65),
         |        i -> (emb[i] - (__PCA_MU64__)[i]) * b[i]))) AS proj
         |  FROM raw),
         |q AS (SELECT emb AS qemb, proj AS qproj FROM p WHERE vec_id = 0),
         |truth AS (
         |  SELECT p.vec_id,
         |    round(list_cosine_similarity(p.emb, q.qemb), 4) AS c
         |  FROM p, q WHERE p.vec_id <> 0
         |    AND NOT isnan(list_cosine_similarity(p.emb, q.qemb))
         |  ORDER BY c DESC, p.vec_id LIMIT 10),
         |$gotCtes$perR""".stripMargin
    },
    "sim8_radius_search" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS qemb
        |  FROM embeddings WHERE vec_id % 97 = 0
        |  ORDER BY vec_id LIMIT 32)
        |SELECT q_id, e.vec_id,
        |  round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |    CAST(qemb AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings e CROSS JOIN q
        |WHERE e.vec_id <> q_id
        |  AND NOT isnan(list_cosine_similarity(
        |    CAST(e.embedding AS DOUBLE[]), CAST(qemb AS DOUBLE[])))
        |  AND round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |    CAST(qemb AS DOUBLE[])), 4) >= 0.3
        |ORDER BY q_id, cos_sim DESC, vec_id""".stripMargin,
    "sim6_knn_join" ->
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS qemb
        |  FROM embeddings WHERE vec_id % 97 = 0
        |  ORDER BY vec_id LIMIT 32),
        |scored AS (
        |  SELECT q_id, e.vec_id,
        |    round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |      CAST(qemb AS DOUBLE[])), 4) AS cos_sim
        |  FROM embeddings e CROSS JOIN q
        |  WHERE e.vec_id <> q_id
        |    AND NOT isnan(list_cosine_similarity(
        |      CAST(e.embedding AS DOUBLE[]), CAST(qemb AS DOUBLE[])))),
        |r AS (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY q_id ORDER BY cos_sim DESC, vec_id) AS rn
        |  FROM scored)
        |SELECT q_id, vec_id, cos_sim FROM r WHERE rn <= 3
        |ORDER BY q_id, cos_sim DESC, vec_id""".stripMargin
  )
}
