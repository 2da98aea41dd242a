package graft

import org.scalatest.funsuite.AnyFunSuite

/** Functions injected through SparkSessionExtensions must resolve in a
  * FRESH session clone — temp-function registration (the fallback path)
  * is session-scoped and would NOT survive newSession(), so this
  * discriminates real injection from a leftover register() call. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("injected expressions resolve by SQL name in a fresh session") {
    val fresh = spark.newSession()
    val dot = fresh.sql(
      "SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
      .head().getDouble(0)
    assert(dot == 11.0)
    val cos = fresh.sql(
      "SELECT vec_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d))")
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)
    val sh = fresh.sql("SELECT simhash64(array('a', 'b'))").head().getLong(0)
    assert(sh == fresh.sql("SELECT simhash64(array('b', 'a'))").head().getLong(0))
    assert(fresh.sql("SELECT size(shingle_hashes('one two three four', 3))")
      .head().getInt(0) == 2)
    assert(fresh.sql(
      "SELECT size(minhash_bands(shingle_hashes('one two three four', 3), 8, 4))")
      .head().getInt(0) == 8)
  }

  test("type errors from injected functions fail analysis, not execution") {
    val fresh = spark.newSession()
    val err = intercept[Exception] {
      fresh.sql("SELECT vec_dot(1, 2)").collect()
    }
    assert(err.getMessage.contains("DATATYPE_MISMATCH") ||
      err.getMessage.toLowerCase.contains("array"))
  }
}
