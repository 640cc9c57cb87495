package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Data-layout optimization: Z-order (Morton) clustering.
  *
  * Interleaving the bits of two filter columns gives a 1-D sort key
  * whose ranges are 2-D rectangles — files written in z-order carry
  * tight min/max footer stats on BOTH columns, so a scan filtering on
  * either prunes most files (the Delta OPTIMIZE ZORDER / Iceberg
  * sort-order mechanism, public since Morton 1966). The operator
  * reports per-bucket extent stats — exactly the footer stats a
  * writer would persist — which makes the clustering property itself
  * gate-checkable: each z-bucket must cover a narrow partkey × suppkey
  * rectangle, not a random slice.
  *
  * The z-value is pure per-row bit arithmetic (codegen'd, no shuffle);
  * the only exchange is the per-bucket stats aggregate. At scale the
  * same key feeds `repartitionByRange(zval)` + sortWithinPartitions
  * before a parquet write — demonstrated in LayoutSpec.
  */
object Layout {

  /** Morton-interleave the low 16 bits of two long columns (a in even
    * bit positions, b in odd). Disjoint bit positions mean the lanes
    * combine with +, keeping the whole expression in codegen'd integer
    * arithmetic. */
  def zval(a: Column, b: Column): Column = {
    val terms: Seq[Column] = (0 until 16).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ + _)
  }

  /** Z-order lineitem on (l_partkey, l_suppkey): each key is first
    * rescaled to the fixed 16-bit domain by its own min/max (exact
    * integer multiply-then-div, so the mapping is scale-factor
    * independent and DuckDB reproduces it bit-for-bit), then Morton
    * interleaved; 64 buckets from the top 6 of the 32 z bits, with the
    * per-bucket rectangle stats a file writer would persist as footer
    * min/max. The min/max pre-pass is a 1-row aggregate broadcast into
    * the scan — at 100 TB that is footer metadata, effectively free. */
  def zorderLayout(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir).select(col("l_partkey"), col("l_suppkey"))
    val bounds = li.agg(
      min(col("l_partkey")).as("p_lo"), max(col("l_partkey")).as("p_hi"),
      min(col("l_suppkey")).as("s_lo"), max(col("l_suppkey")).as("s_hi"))
    li.crossJoin(broadcast(bounds))
      // `div` = exact integer division (truncating; operands nonneg)
      .withColumn("pq", expr(
        "((l_partkey - p_lo) * 65535) div greatest(p_hi - p_lo, 1)"))
      .withColumn("sq", expr(
        "((l_suppkey - s_lo) * 65535) div greatest(s_hi - s_lo, 1)"))
      .withColumn("z", zval(col("pq"), col("sq")))
      .withColumn("bucket", shiftright(col("z"), 26).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
  }

  /** Zone-map file count for zonemapPrune (both layouts). */
  final val ZmFiles = 64L

  /** ZONE-MAP PRUNING EFFECTIVENESS — the planning counterpart of
    * zorderLayout: simulate writing lineitem as ZmFiles files under
    * (a) insertion order (orderkey ranges — what a plain append
    * produces) and (b) z-order on (partkey, suppkey), collect each
    * file's min/max footer stats, and replay a deterministic grid of
    * point predicates on both filter columns against the footers,
    * reporting how many files each predicate must scan. This is the
    * number a warehouse actually buys with OPTIMIZE ZORDER: an
    * insertion-ordered file covers a random slice of either filter
    * column (footers wide → nothing prunes), a z-ordered file covers
    * a narrow rectangle (most files prune on EITHER column).
    *
    * Scale shape: ONE fact scan — each row tags itself with both
    * layout buckets and explodes into the two (layout, bucket) cells,
    * so both zone-map tables come out of one map-side-combined
    * aggregate; everything downstream (footers × predicate grid) is
    * metadata-scale (2·ZmFiles × 16 cells). Bounds are one-row
    * broadcasts. */
  def zonemapPrune(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val bounds = li.agg(
      min(col("l_orderkey")).as("o_lo"), max(col("l_orderkey")).as("o_hi"),
      min(col("l_partkey")).as("p_lo"), max(col("l_partkey")).as("p_hi"),
      min(col("l_suppkey")).as("s_lo"), max(col("l_suppkey")).as("s_hi"))
    val tagged = li.crossJoin(broadcast(bounds))
      .withColumn("pq", expr(
        "((l_partkey - p_lo) * 65535) div greatest(p_hi - p_lo, 1)"))
      .withColumn("sq", expr(
        "((l_suppkey - s_lo) * 65535) div greatest(s_hi - s_lo, 1)"))
      .withColumn("b_lin", expr(
        s"((l_orderkey - o_lo) * ${ZmFiles - 1}) div greatest(o_hi - o_lo, 1)"))
      .withColumn("b_z", shiftright(zval(col("pq"), col("sq")), 26).cast("long"))
      .select(col("l_partkey"), col("l_suppkey"),
        explode(array(
          struct(lit("linear").as("layout"), col("b_lin").as("bucket")),
          struct(lit("zorder").as("layout"), col("b_z").as("bucket")))).as("lb"))
      .select(col("lb.layout").as("layout"), col("lb.bucket").as("bucket"),
        col("l_partkey"), col("l_suppkey"))
    val footers = tagged.groupBy(col("layout"), col("bucket"))
      .agg(min(col("l_partkey")).as("min_part"), max(col("l_partkey")).as("max_part"),
        min(col("l_suppkey")).as("min_supp"), max(col("l_suppkey")).as("max_supp"))
    // deterministic predicate grid: 8 evenly spaced points per column
    val preds = bounds.select(explode(expr(
      """transform(sequence(0, 15), k -> named_struct(
        |  'pred_col', CASE WHEN k < 8 THEN 'partkey' ELSE 'suppkey' END,
        |  'pred_idx', CAST(k % 8 AS BIGINT),
        |  'pred_value', CASE WHEN k < 8
        |    THEN p_lo + ((p_hi - p_lo) * (2 * (k % 8) + 1)) div 16
        |    ELSE s_lo + ((s_hi - s_lo) * (2 * (k % 8) + 1)) div 16 END))"""
        .stripMargin)).as("p"))
      .select(col("p.pred_col").as("pred_col"), col("p.pred_idx").as("pred_idx"),
        col("p.pred_value").as("pred_value"))
    footers.crossJoin(broadcast(preds))
      .withColumn("scanned",
        when(col("pred_col") === "partkey",
          col("min_part") <= col("pred_value") && col("pred_value") <= col("max_part"))
          .otherwise(
            col("min_supp") <= col("pred_value") && col("pred_value") <= col("max_supp")))
      .groupBy(col("layout"), col("pred_col"), col("pred_idx"), col("pred_value"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("scanned").cast("long")).as("n_scanned"))
      .withColumn("prune_ratio",
        round(lit(1.0) - col("n_scanned").cast("double") / col("n_files").cast("double"), 6))
  }

  /** Compaction target size (chars here; bytes in a real table). */
  final val CompactTarget = 16384L

  /** SMALL-FILE COMPACTION PLANNING — the OPTIMIZE/rewrite-data-files
    * bin-packer (Delta/Iceberg compaction): assign each file of a
    * directory to an output bin so bins land near the target size.
    * The documents table stands in as the file listing (source =
    * directory, n_chars = file size). Deterministic packing rule:
    * within a directory, order files size-descending (id-tiebroken)
    * and cut the running sum at target boundaries — bin = floor((cum −
    * size)/target), the streaming form of next-fit-decreasing. Unlike
    * first-fit it is expressible as ONE prefix sum, so both engines
    * replay it exactly, and its fill factor is within one file of
    * first-fit on heavy-tailed size distributions.
    *
    * Scale shape: one directory-keyed shuffle; the prefix sum windows
    * per directory over file-COUNT rows — metadata scale (a 100 TB
    * table is ~10⁶ footer entries, not 10¹² rows). A directory with
    * extreme file counts swaps in the q_decile two-phase range-
    * partition rank; the rule itself is order-based, so the swap
    * changes no output. Output = the compaction manifest: per-bin file
    * count, payload, and fill ratio vs target. */
  def compactPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("cum", sum(col("n_chars")).over(w))
      .withColumn("bin", expr(s"(cum - n_chars) div ${CompactTarget}L"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("n_chars")).as("total_chars"),
        max(col("n_chars")).as("largest_file"),
        min(col("n_chars")).as("smallest_file"))
      // Exact-integer fill metric: ppm of the target, computed with
      // integer division so both engines produce bit-identical values
      // (a double ratio proved hash-unstable across float renderers).
      .withColumn("fill_ppm",
        expr(s"(total_chars * 1000000L) div ${CompactTarget}L"))
  }
}
