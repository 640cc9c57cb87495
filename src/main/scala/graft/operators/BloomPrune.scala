package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftbridge.Bridge
import graft.sources.Tables

/** Runtime-filter join pruning: a Bloom filter built from the
  * selective dimension side kills non-matching fact rows BEFORE the
  * join's shuffle — the single biggest lever for a 100 TB fact ⋈
  * filtered-dim join, and exactly what Spark's own InjectRuntimeFilter
  * rule materializes (a BloomFilterAggregate scalar subquery feeding
  * BloomFilterMightContain). Here the filter is built explicitly so
  * the gate exercises the operator deterministically.
  *
  * Correctness is UNCONDITIONAL: Bloom false positives (deterministic,
  * hash-based) survive the pre-filter but die in the exact join that
  * follows, so the result equals the plain join — the sketch only
  * changes how many rows reach the exchange. The sketch build is one
  * tiny scalar job (distributed partial filters OR-merged); its size
  * is fixed by the configured capacity (~1 MB here), independent of
  * fact-side volume. Undersizing the capacity at larger SF degrades
  * the FP rate, never the answer. */
object BloomPrune {

  /** Sketch capacity / false-positive rate: ~6 bits per key. */
  final val ExpectedKeys = 1000000L
  final val Fpp = 0.05

  /** Brand revenue by part type, fact side pre-pruned: only ~1/25 of
    * parts are Brand#1 (25 distinct brands), so ~96% of lineitem dies
    * at the scan filter instead of shuffling into the join. */
  def bloomPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = Tables.part(spark, sfDir)
      .filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey"), col("p_type"))
    val sketch = dim.select(col("p_partkey").cast("long").as("k"))
      .stat.bloomFilter("k", ExpectedKeys, Fpp)
    val bytes = new ByteArrayOutputStream()
    sketch.writeTo(bytes)
    val mightContain = Bridge.column(BloomFilterMightContain(
      Literal(bytes.toByteArray),
      Bridge.expression(col("l_partkey").cast("long"))))
    Tables.lineitem(spark, sfDir)
      .filter(mightContain)
      .join(dim, col("l_partkey") === col("p_partkey")) // exact: FPs drop here
      .groupBy(col("p_type"))
      .agg(count(lit(1)).as("n_items"),
        graft.functions.Money.sumFixed(graft.functions.Money.discPriceE4, 10000L, 4)
          .cast("double").as("revenue"))
  }
}
