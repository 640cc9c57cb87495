package graft

import org.apache.spark.sql.functions._

/** Scratch main for timing plan variants (dev tool). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("probe", 32)
    val sf = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val li = graft.sources.Tables.lineitem(spark, sf)
    li.count() // warm
    time("q1 full")(graft.queries.Relational.q1Agg(spark, sf).queryExecution.toRdd.count())
    time("q1 scan only")(li.filter(col("l_shipdate") <= "1998-09-02").queryExecution.toRdd.count())
    time("q1 double sums")(
      li.filter(col("l_shipdate") <= "1998-09-02")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")), sum(col("l_extendedprice")),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))),
          count(lit(1)))
        .queryExecution.toRdd.count())
    time("q1 one decimal sum")(
      li.filter(col("l_shipdate") <= "1998-09-02")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")), count(lit(1)))
        .queryExecution.toRdd.count())
    spark.stop()
  }
}
