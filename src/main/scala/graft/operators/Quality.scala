package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-quality rule suite — the validation gate a pipeline runs
  * before promoting a batch: null checks, range checks, referential
  * integrity, key uniqueness, and parse validity, each reported as a
  * (check, violations, rows_checked) row.
  *
  * Scale shape: all single-table rules for a table fold into ONE
  * conditional-aggregate pass over its scan (no per-rule scans); the
  * two referential checks are LEFT ANTI joins (existence only — no
  * row multiplication, AQE picks broadcast vs shuffle by dim size);
  * uniqueness is count−distinct inside the same single-row aggregate.
  * Every count is an exact long. */
object Quality {

  def dqChecks(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val ev = Tables.events(spark, sfDir)

    def one(name: String, violations: org.apache.spark.sql.Column,
        checked: org.apache.spark.sql.Column, df: DataFrame): DataFrame =
      df.agg(violations.cast("long").as("violations"), checked.cast("long").as("rows_checked"))
        .select(lit(name).as("check_name"), col("violations"), col("rows_checked"))

    val liChecks = li.agg(
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("q_null"),
        sum(when(col("l_extendedprice") <= 0, 1L).otherwise(0L)).as("p_nonpos"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L).otherwise(0L)).as("d_range"),
        count(lit(1)).as("n"))
      .select(explode(array(
        struct(lit("lineitem_quantity_null").as("check_name"), col("q_null").cast("long").as("violations"), col("n").as("rows_checked")),
        struct(lit("lineitem_price_nonpositive").as("check_name"), col("p_nonpos").cast("long").as("violations"), col("n").as("rows_checked")),
        struct(lit("lineitem_discount_range").as("check_name"), col("d_range").cast("long").as("violations"), col("n").as("rows_checked")))).as("r"))
      .select(col("r.check_name"), col("r.violations"), col("r.rows_checked"))

    val custUnique = one("customer_key_unique",
      count(lit(1)) - countDistinct(col("c_custkey")), count(lit(1)), cust)

    val evParse = one("events_props_unparsable",
      sum(when(col("props").isNotNull &&
        from_json(col("props"), lit("k INT")).isNull, 1L).otherwise(0L)),
      count(lit(1)), ev)

    // referential integrity: orphan counts via LEFT ANTI existence joins
    val orphanOrders = ord.join(cust, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .crossJoin(broadcast(ord.agg(count(lit(1)).as("rows_checked"))))
      .select(lit("orders_custkey_fk").as("check_name"), col("violations"), col("rows_checked"))
    val orphanLines = li.select(col("l_orderkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .crossJoin(broadcast(li.agg(count(lit(1)).as("rows_checked"))))
      .select(lit("lineitem_orderkey_fk").as("check_name"), col("violations"), col("rows_checked"))

    liChecks.unionByName(custUnique).unionByName(evParse)
      .unionByName(orphanOrders).unionByName(orphanLines)
  }
}
