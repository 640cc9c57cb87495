package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Dynamic partition pruning — the scan-side behavior a partitioned
  * 100 TB lake lives or dies by: a fact table partitioned on a key
  * must skip partition directories whose keys the (filtered) dimension
  * side cannot match, with the pruning predicate injected at RUNTIME
  * from the dim scan, not hand-written.
  *
  * The gate tables ship as single parquet files, so this spec builds a
  * partitioned copy once and asserts both the plan shape (a
  * dynamicpruning subquery on the partition column) and the result. */
class PartitionPruningSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val partDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.sources.Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    dir
  }

  test("a dim-filtered join prunes fact partitions at runtime") {
    val fact = spark.read.parquet(partDir)
    // the dim must be a SCANNED relation: a literal local table would
    // constant-fold its filter away and DPP sees no selective predicate
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dim").toString
    spark.createDataFrame(Seq(
        ("click", 1), ("purchase", 2), ("view", 3), ("signup", 4), ("error", 5)))
      .toDF("etype", "rank_weight")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
      .filter(col("rank_weight") <= 2) // survives: click, purchase
    val joined = fact.join(dim, col("event_type") === col("etype"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"partition filter must be injected at runtime:\n$plan")
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("static partition filters reach the file listing") {
    val fact = spark.read.parquet(partDir).filter(col("event_type") === "click")
    val plan = fact.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"static partition filter must prune directories:\n$plan")
    assert(fact.count() ==
      graft.sources.Tables.events(spark, sf).filter(col("event_type") === "click").count())
  }
}
