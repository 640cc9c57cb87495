package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every SparkEntry query runs at sf0.001, returns rows, and keeps the
  * column names its oracle declares (the driver's hash compare sorts by
  * column name, so a drift here is a silent gate failure). */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  for ((name, fn) <- SparkEntry.queries) {
    test(s"$name runs and returns rows") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle refers to a declared query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
