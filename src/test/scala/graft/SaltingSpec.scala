package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Salting
import graft.sources.Tables

/** Salted operators must be row-for-row equivalent to their unsalted
  * forms — salting changes the shuffle layout, never the result. */
class SaltingSpec extends AnyFunSuite {
  import TestSpark._

  test("saltedJoin equals the plain join") {
    val li = Tables.lineitem(spark, sf)
    val supp = Tables.supplier(spark, sf)
    val s = Salting.saltedJoin(
        li.withColumnRenamed("l_suppkey", "k"),
        supp.withColumnRenamed("s_suppkey", "k"), "k", "l_orderkey", 4)
      .select(col("l_orderkey"), col("l_linenumber"), col("k"), col("s_name"))
      .collect().map(_.mkString("|")).toSet
    val p = li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"), col("s_name"))
      .collect().map(_.mkString("|")).toSet
    assert(s == p)
  }

  test("skewAgg gate query: salted plan, unsalted semantics, partial agg bounded") {
    val out = Salting.skewAgg(spark, sf)
    // two logical aggregates: (key, salt) partial then key final
    val aggs = out.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a }
    assert(aggs.size == 2, "expected the two-phase (key,salt)->key aggregation")
    val got = out.collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val direct = Tables.orders(spark, sf).groupBy(col("o_orderstatus"))
      .agg(array_sort(collect_set(col("o_orderpriority"))).as("priorities"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got == direct)
  }

  test("saltedCollectSet equals the direct collect_set") {
    val ord = Tables.orders(spark, sf)
    val s = Salting.saltedCollectSet(ord, "o_custkey", "o_orderpriority", 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    val p = ord.groupBy(col("o_custkey"))
      .agg(array_sort(collect_set(col("o_orderpriority"))).as("values"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(s == p)
  }

  test("skew_detect separates the low-cardinality hot key from the benign key") {
    val rows = graft.operators.Salting.skewDetect(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getDouble(5), r.getDouble(6), r.getLong(7),
        r.getBoolean(8))).toMap
    val (nr, nk, mx, top, _, share, salts, flag) = rows("o_orderstatus")
    // replay from raw data
    val counts = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nk == counts.size && nr == counts.values.sum && mx == counts.values.max)
    assert(top == counts.filter(_._2 == mx).keys.min)
    assert(flag, "3-value key must be flagged: one reducer takes a third of the table")
    assert(salts == math.min(32L, (mx * 32 + nr - 1) / nr))
    assert(math.abs(share - mx.toDouble / nr) < 1e-6)
    val custFlag = rows("o_custkey")._8
    assert(!custFlag, "1500-key uniform-ish key must not be flagged")
  }
}
