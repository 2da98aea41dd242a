package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must execute at sf0.001 and produce a stable,
  * non-degenerate result: non-empty schema, and (for the rows-only ones the
  * DuckDB oracle can't see) at least one row. */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, dir)
      assert(df.schema.fields.nonEmpty)
      val n = df.count()
      assert(n >= 0)
      if (!SparkEntry.oracleSql.contains(name))
        assert(n > 0, s"rows-only query $name returned an empty result")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
