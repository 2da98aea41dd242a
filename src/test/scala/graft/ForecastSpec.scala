package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Projections
import graft.ext.Joins

/** P10 join-size forecast and J9 orphan audit: the forecast must be
  * EXACT (it is arithmetic, not an estimate), and the audit must find
  * precisely the planted orphans. */
class ForecastSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("forecast total equals the real inner-join cardinality, incl. skew (P10)") {
    // skewed left (key 1 hot), right with partial overlap and dup keys
    val left = (Seq.fill(40)(1L) ++ Seq(2L, 2L, 3L, 5L)).toDF("k")
    val right = (Seq.fill(3)(1L) ++ Seq(2L, 4L, 4L)).toDF("k")
    val forecast = Projections.joinForecast(left, right, "k")
    val total = forecast.agg(sum(col("n_pairs"))).head().getLong(0)
    val actual = left.join(right, Seq("k")).count()
    assert(total == actual)
    assert(total == 40L * 3 + 2L * 1) // hand arithmetic: key1 + key2
    // per-key rows: only keys present on BOTH sides
    val keys = forecast.select(col("k")).collect().map(_.getLong(0)).toSet
    assert(keys == Set(1L, 2L))
  }

  test("orphan audit finds exactly the planted gaps at sf0.001 (J9)") {
    val dir = "/root/testdata/sf0.001"
    val rows = Joins.j9OrphanAudit(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // replay the thinning rule directly per relationship
    val orders = Tables.orders(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val expLi = li.filter(col("l_orderkey") % 1000 === 7)
    val expOrd = orders.filter(col("o_custkey") % 100 === 3)
    assert(rows("lineitem->orders") ==
      ((li.count(), expLi.count(),
        expLi.agg(coalesce(sum(col("l_orderkey")), lit(0L))).head().getLong(0))))
    assert(rows("orders->customer") ==
      ((orders.count(), expOrd.count(),
        expOrd.agg(coalesce(sum(col("o_orderkey")), lit(0L))).head().getLong(0))))
  }

  test("schema audit stamps ok/retyped/missing/extra from planted schemas (P11)") {
    import org.apache.spark.sql.types._
    // events: value retyped to string, props absent, rogue column added
    val planted = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", StringType),          // retyped
      StructField("rogue", DoubleType)))         // extra
    val out = Projections.schemaAudit(spark, Map("events" -> Some(planted)))
      .filter(col("table_name") === "events").collect()
      .map(r => r.getString(1) -> ((r.getString(2),
        Option(r.getString(3)), Option(r.getString(4))))).toMap
    assert(out("event_id") == (("ok", Some("int64"), Some("int64"))))
    assert(out("ts")       == (("ok", Some("timestamp"), Some("timestamp"))))
    assert(out("value")    == (("retyped", Some("float64"), Some("string"))))
    assert(out("props")    == (("missing", Some("string"), None)))
    assert(out("rogue")    == (("extra", None, Some("float64"))))
    // NTZ canonicalizes like TIMESTAMP: the drift this op exists to name
    // is a retype AWAY from timestamp, not the tz flavor
    val ntz = Projections.schemaAudit(spark, Map("events" -> Some(
      StructType(Seq(StructField("ts", TimestampNTZType))))))
      .filter(col("col_name") === "ts").head()
    assert(ntz.getString(2) == "ok")
    // a table that fails to load entirely: every contract column missing
    val gone = Projections.schemaAudit(spark, Map("region" -> None))
      .filter(col("table_name") === "region").collect()
    assert(gone.length == 2 && gone.forall(_.getString(2) == "missing"))
  }

  test("schema audit over the real testdata is all-ok (P11)") {
    val dir = "/root/testdata/sf0.001"
    val bad = Projections.p11SchemaAudit(spark, dir)
      .filter(col("status") =!= "ok").collect()
    assert(bad.isEmpty, bad.mkString(", "))
  }

  test("pre-run gate names exactly the breaking drift rows; extras don't block") {
    import org.apache.spark.sql.types._
    // the r10 incident shape: one retyped column, one missing, one extra
    val planted = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType), // retyped
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType),                               // props missing
      StructField("rogue", DoubleType)))                              // extra
    val lines = Projections.violationLines(
      Projections.schemaAudit(spark, Map("events" -> Some(planted))))
    assert(lines.exists(l => l.startsWith("events.ts: retyped") &&
      l.contains("contract timestamp") && l.contains("observed int64")),
      s"gate lines: $lines")
    assert(lines.exists(_.startsWith("events.props: missing")), s"$lines")
    assert(!lines.exists(_.contains("rogue")),
      s"additive drift must not block: $lines")
    // and the real testdata passes the gate end-to-end (empty = no abort)
    assert(Projections.contractViolations(spark, "/root/testdata/sf0.001").isEmpty)
  }
}
