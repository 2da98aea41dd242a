package graft

import org.apache.spark.sql.SparkSession

/** Verify-time expansion of DRIVER-SOLVED constants into oracle SQL —
  * the a18 broadcast-literal device generalized (r19 verdict ask #5):
  * some queries rank on arithmetic DuckDB can replay exactly, but the
  * constants in that arithmetic come from a driver-side solve no SQL
  * engine performs (sim33's PCA basis is a Jacobi eigen-decomposition).
  * The solve is DETERMINISTIC (fixed sweep order, convergence on the
  * off-diagonal norm), so the literals the Spark query used are exactly
  * reproducible at dump time: [[Verify]] expands each `__PCA_*__` token
  * against the SAME sf dir the queries ran on, and the dumped
  * oracle_sql.json carries plain ANSI SQL with inline list literals —
  * DuckDB then value-checks the projection, ranking, and recall
  * arithmetic end-to-end, leaving only the eigensolve itself to the
  * spec-pinned hand spectra (SimilaritySpec's exact planted-subspace
  * recovery).
  *
  * Tokens: `__PCA_MU64__` (the 64-dim mean as a DuckDB list literal),
  * `__PCA_BASIS16__` (top-16 eigenvectors, list of lists),
  * `__PCA_EIGSUM16__` (Σ top-16 eigenvalues, scalar). Doubles render
  * via `Double.toString` — shortest round-trip, so DuckDB parses back
  * the exact bit pattern the Spark side computed with. */
object OracleLiterals {

  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, String]]

  private def fmt(x: Double): String = java.lang.Double.toString(x)
  private def list(xs: Seq[Double]): String =
    xs.map(fmt).mkString("[", ", ", "]")

  private def pcaTokens(spark: SparkSession, sfDir: String)
      : Map[String, String] = {
    val (_, mu, eigs, vecs) = ext.Similarity.pcaBasis(
      Tables.embeddings(spark, sfDir), dim = 64)
    Map(
      "__PCA_MU64__" -> list(mu.toIndexedSeq),
      "__PCA_BASIS16__" -> vecs.take(ext.Similarity.Sim33R)
        .map(v => list(v.toIndexedSeq)).mkString("[", ", ", "]"),
      "__PCA_BASIS64__" -> vecs
        .map(v => list(v.toIndexedSeq)).mkString("[", ", ", "]")) ++
      // per-rank eigenvalue prefix sums for sim35's curve (every r the
      // registered sweep grades). Longer token names FIRST would not
      // matter here — no name is a prefix of another ("…16__" ends in
      // its own underscores) — but keep them distinct by construction.
      Seq(4, 8, 16, 32, 64).map(r =>
        s"__PCA_EIGSUM${r}__" -> fmt(eigs.take(r).sum))
  }

  /** Expand every known token in `sql` for the given sf dir; SQL
    * without tokens passes through untouched (and pays nothing — the
    * solve runs once per dump, only if some query needs it). */
  def expand(spark: SparkSession, sfDir: String, sql: String): String =
    if (!sql.contains("__PCA_")) sql
    else cache.getOrElseUpdate(sfDir, pcaTokens(spark, sfDir))
      .foldLeft(sql) { case (s, (tok, lit)) => s.replace(tok, lit) }
}
