package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._
import graft.sources.{Bucketing, Tables}

/** Bucketed layout: the join on the bucket key must be exchange-free
  * and produce the same rows as the plain shuffled join. */
class BucketingSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ready: Unit = {
    Bucketing.writeBucketed(Tables.orders(spark, sf), "orders_b", "o_custkey", 8)
    Bucketing.writeBucketed(
      Tables.customer(spark, sf).withColumnRenamed("c_custkey", "cust_id"),
      "customer_b", "cust_id", 8)
  }

  test("co-located join has no Exchange in the plan") {
    ready
    val j = Bucketing.colocatedJoin(spark, "orders_b", "customer_b", "o_custkey", "cust_id")
    val plan = j.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange"), "bucketed join must not shuffle")
    assert(plan.contains("Bucketed: true"))
  }

  test("bucketed join result equals the shuffled join") {
    ready
    val bucketed = Bucketing.colocatedJoin(spark, "orders_b", "customer_b", "o_custkey", "cust_id")
      .select(col("o_orderkey"), col("cust_id")).collect().map(_.mkString("|")).toSet
    val plain = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey")).collect().map(_.mkString("|")).toSet
    assert(bucketed == plain)
  }
}
