package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** LmScore — per-doc mean bigram log-probability as ONE per-row pass
  * with O(1) hash lookups (the t22/t23 scorer; SURVEY §2.10 tier (b)).
  *
  * Replaces the HOF formulation `aggregate(transform(sequence(...)),
  * element_at(bigramMapLiteral, ...) ...)`: Spark's map literals are
  * `ArrayBasedMapData`, and `element_at`/`GetMapValue` on them is a
  * LINEAR SCAN of the keys array — fine for the lookup tables this
  * corpus trains (vocabulary 31), catastrophic the moment the
  * vocabulary is real: at a 10×-replica corpus (vocab 310, bigram
  * table ~5k entries) the scoring pass measured 135 s against this
  * expression's 0.6 s, and the gap grows as O(|table|) per token —
  * a 65k-entry table at the documented cap would put the HOF form at
  * hours. The per-element interpreted lambda allocation goes with it.
  *
  * Semantics are EXACTLY the HOF form's (the DuckDB oracles and the
  * hand-computed Laplace specs pin both): tokens = split(lower(text),
  * ' ') with empties dropped; fewer than 2 tokens → NULL (callers
  * filter, replacing the old pre-filter on size(toks) ≥ 2); score =
  * Σ log10((c(wᵢ₋₁wᵢ)+1)/(c(wᵢ₋₁)+V)) / (n−1) folded in token order
  * (same float-sum order), log10 = StrictMath.log10 (what Spark's
  * `log10` compiles to — bit-identical), V = |unigram table|. Lookups
  * miss to 0 (the Laplace numerator already handles an unseen bigram;
  * the registered flows train on the corpus they score, so unigram
  * misses cannot occur there).
  *
  * The count tables ride the expression object itself into the task
  * closure (same broadcast-by-closure story as the old map literals)
  * and are indexed into java.util.HashMaps once per executor,
  * @transient lazily — never per row. */
case class LmScore(child: Expression,
                   uni: Map[String, Long],
                   bi: Map[String, Long]) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "lm_score"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lm_score requires string, got ${other.catalogString}")
  }

  @transient private lazy val uniIdx = {
    val m = new java.util.HashMap[String, Long](uni.size * 2)
    uni.foreach { case (k, v) => m.put(k, v) }
    m
  }
  @transient private lazy val biIdx = {
    val m = new java.util.HashMap[String, Long](bi.size * 2)
    bi.foreach { case (k, v) => m.put(k, v) }
    m
  }
  @transient private lazy val vocabV: Double = uni.size.toDouble

  /** Public: invoked from generated code; null when the doc has fewer
    * than two (non-empty) tokens. */
  def computeScore(text: UTF8String): java.lang.Double = {
    val raw = TextKernels.lowerWords(text)
    // drop empties in place (the old filter(toks, _ =!= "") step)
    val words = new Array[String](raw.length)
    var n = 0
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { words(n) = raw(i); n += 1 }
      i += 1
    }
    if (n < 2) return null
    var sum = 0.0
    val sb = new java.lang.StringBuilder
    i = 1
    while (i < n) {
      val prev = words(i - 1)
      sb.setLength(0)
      sb.append(prev).append(' ').append(words(i))
      val cBi = biIdx.getOrDefault(sb.toString, 0L)
      val cUni = uniIdx.getOrDefault(prev, 0L)
      sum += StrictMath.log10((cBi + 1.0) / (cUni + vocabV))
      i += 1
    }
    java.lang.Double.valueOf(sum / (n - 1))
  }

  override def nullSafeEval(input: Any): Any =
    computeScore(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, txt => {
      val ref = ctx.addReferenceObj("lmScorer", this,
        classOf[LmScore].getName)
      s"""
         |java.lang.Double ${ev.value}_r = $ref.computeScore($txt);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LmScore =
    copy(child = newChild)
}

object LmScore {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.call_function

  /** The scorer as a Column. The count tables can't ride SQL literals
    * (that IS the linear-scan trap this expression removes), so they
    * ride the registry builder's closure — under a name unique to the
    * table instances (the bigramCounts memo hands out stable Map
    * objects per (dir, caps)), because `call_function` resolves at
    * ANALYSIS time: a shared name would let a later registration for
    * another dir capture an earlier, still-unexecuted frame. */
  def score(spark: SparkSession, text: Column, uni: Map[String, Long],
            bi: Map[String, Long]): Column = {
    val name = "lm_score_" +
      java.lang.Integer.toHexString(System.identityHashCode(uni))
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => LmScore(exprs.head, uni, bi), "built-in")
    call_function(name, text)
  }
}
