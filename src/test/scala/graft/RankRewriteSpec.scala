package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** The RankFilterToTopK optimizer rule rewrites dead-rank window
  * filters into the TopKPerGroup operator — and leaves live-rank
  * plans alone. */
class RankRewriteSpec extends AnyFunSuite {
  import TestSpark._

  private def w = Window.partitionBy(col("o_custkey"))
    .orderBy(col("o_totalprice").desc, col("o_orderkey"))

  test("dead-rank filter rewrites to TopKPerGroup and keeps results") {
    val df = Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select("o_custkey", "o_orderkey") // rk dropped → rewrite is safe
    assert(df.queryExecution.optimizedPlan.toString.contains("TopKPerGroup"))
    val direct = Tables.orders(spark, sf)
      .transform(graft.plans.TopK.perGroup(
        Seq("o_custkey"), Seq("o_totalprice" -> false, "o_orderkey" -> true), 2))
      .select("o_custkey", "o_orderkey")
    assert(df.collect().map(_.mkString("|")).toSet ==
      direct.collect().map(_.mkString("|")).toSet)
  }

  test("live rank column blocks the rewrite") {
    val df = Tables.orders(spark, sf)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select("o_custkey", "o_orderkey", "rk") // rk survives → must stay a window
    assert(!df.queryExecution.optimizedPlan.toString.contains("TopKPerGroup"))
    assert(df.queryExecution.optimizedPlan.toString.contains("Window"))
  }

  test("lang_id picks up the rewrite transparently") {
    val plan = graft.operators.TextMetrics.langId(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
  }
}
