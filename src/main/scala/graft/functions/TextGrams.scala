package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** THE word n-gram builder — the single tokenization-adjacent primitive
  * shared by decontamination (Curate.docGrams), the repetition rules
  * (Curate.qualityFilterDf, TextStats.t8Repetition), and the d5 shingle
  * set (Dedup.shingled), so the consumers can never drift onto different
  * gram definitions. Lives in `functions` (the Column-helper layer)
  * rather than on any one feature module, which would otherwise create
  * cross-feature dependencies for a text primitive.
  *
  * Operates on a `words` array column. Short rows yield an EMPTY array
  * rather than relying on every caller to guard: un-guarded,
  * sequence(0, size-n) descends through 0 and slice throws mid-job on
  * the first doc with fewer than n words.
  */
object TextGrams {
  def gramsExpr(n: Int): Column = expr(
    s"""if(size(words) < $n, array(),
       |  transform(sequence(0, size(words) - $n),
       |    i -> concat_ws(' ', slice(words, i + 1, $n))))""".stripMargin)
}
