package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge.{column, expression}
import graft.expressions.{ArgminLong, L2Long, PqAdc, PqDists}
import graft.sources.Tables

/** Product-quantization ANN (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011) — the
  * codebook path a 100 TB vector corpus actually ships: 64-dim
  * embeddings split into M=8 subspaces of 8 dims, each subspace
  * k-means-coded to 4 bits (K=16 centroids), so a vector compresses
  * 64 floats → 8 nibbles and search scans codes against a per-query
  * ADC (asymmetric distance computation) lookup table instead of raw
  * floats.
  *
  * Cross-engine exactness follows the Cluster.scala discipline:
  * coordinates quantize to floor(x·2^20) longs, every subspace L2
  * distance is an exact integer sum ((x-y)² ≤ 2^42, ×8 dims ≤ 2^45 —
  * no overflow), the Lloyd update floor-divides integer sums via
  * pmod, and ADC totals are exact longs — the DuckDB oracle replays
  * the whole train → encode → search pipeline value-for-value.
  *
  * Scale shape: both codebook passes broadcast ≤ M×K centroid rows
  * against the subvector table; the Lloyd update shuffles M×K×8
  * partial sums, not vectors; search joins the corpus code table
  * against a broadcast M×K-per-query ADC table and reduces with the
  * bounded-heap TopKPerGroup — the corpus side never shuffles more
  * than k×queries rows. */
object Pq {

  val M = 8      // subspaces
  val Dsub = 8   // dims per subspace
  val K = 16     // centroids per subspace (4-bit codes)
  val TopN = 5
  val Shortlist = 20 // ADC candidates kept per query for exact rerank

  /** floor(x·2^20) per dimension — integer-exact quantization (the
    * Cluster.scala / HyperplaneLsh convention). */
  private def quantize(emb: Column): Column =
    transform(emb, x => floor(x.cast("double") * 1048576).cast("long"))

  /** Exact integer L2 distance — the codegen'd kernel. */
  private def l2(a: Column, b: Column): Column =
    column(L2Long(expression(a), expression(b)))

  /** Codebook pivoted to one row per subspace, `(s, cents[K][Dsub])`
    * ordered by c_id — the downstream kernels index `cents` BY POSITION,
    * so the contract is that every subspace carries exactly c_id 0..K-1
    * (seeded from vec_id < K). A 1-based or sparse id set would
    * otherwise mis-index silently; the guard raises at train time
    * instead (M rows pay one array compare — negligible). */
  private def centsWide(c: DataFrame): DataFrame =
    c.groupBy(col("s"))
      .agg(array_sort(collect_list(struct(col("c_id"), col("cq")))).as("packed"))
      .select(col("s"),
        when(transform(col("packed"), x => x.getField("c_id")) ===
            sequence(lit(0L), lit((K - 1).toLong)),
          transform(col("packed"), x => x.getField("cq")))
          .otherwise(raise_error(concat(
            lit("pq codebook: subspace "), col("s").cast("string"),
            lit(s" c_ids are not exactly 0..${K - 1}"))))
          .as("cents"))

  /** Row-local assignment: join each subvector with its subspace's
    * ONE broadcast codebook row, compute all K distances in a single
    * projection (`dists`), take the argmin (`c_id`; strict < keeps
    * the first minimum — ties toward the smaller centroid id, the
    * oracle's ORDER BY dist, c_id). No K-way row fan-out, no
    * aggregation, no shuffle — the corpus streams through one stage.
    * An earlier join+TopK formulation materialized corpus×K rows
    * through the grouping operator and cost 3× the whole pipeline; a
    * higher-order-function formulation of the K×Dsub sweep ran
    * interpreted with a lambda allocation per row — the PqDists /
    * ArgminLong kernels are single JIT'd loops inside codegen. */
  private def withCode(sub: DataFrame, cw: DataFrame): DataFrame =
    sub.join(broadcast(cw), Seq("s"))
      .withColumn("dists", column(PqDists(expression(col("subq")), expression(col("cents")))))
      .withColumn("c_id", column(ArgminLong(expression(col("dists")))))

  /** Train (seed + one exact Lloyd refinement per subspace), encode
    * the corpus, run ADC for the sampled query set, then exact-rerank
    * the per-query ADC shortlist (the FAISS refine stage — ADC alone
    * at 4 bits recalls ~0.24 of exact top-5 here; reranking the top-20
    * shortlist with true integer L2 doubles that while touching only
    * Shortlist×queries full vectors). Emits
    * `(q_id, neighbor_id, rank, adc_dist, l2_dist)`. */
  def annPq(spark: SparkSession, sfDir: String): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    // full quantized vectors: reused by the subvector cut AND the
    // rerank payload joins
    val qfull = Partitioning.spread(emb)
      .select(col("vec_id"), quantize(col("embedding")).as("q"))
      .persist()
    // (vec_id, s, subq): the corpus cut into M quantized subvectors;
    // reused by both assignment passes, the Lloyd update, and the
    // query-side ADC table — persist or the scan+quantize runs 4×
    val sub = qfull
      .select(col("vec_id"), posexplode(expr(
        s"transform(sequence(0, ${M - 1}), s -> slice(q, s*$Dsub+1, $Dsub))"))
        .as(Seq("s", "subq")))
      .persist()

    // seed codebook: subvectors of vec_id < K, per subspace
    val cents0 = sub.filter(col("vec_id") < K)
      .select(col("s"), col("vec_id").as("c_id"), col("subq").as("cq"))
    val a0 = withCode(sub, centsWide(cents0))

    // one Lloyd step: exact integer per-(s, c_id, j) sums, floor-div
    // mean (pmod keeps negative sums flooring identically on both
    // engines); an empty cluster keeps its seed centroid
    val sums = a0
      .select(col("s"), col("c_id"), posexplode(col("subq")).as(Seq("j", "qd")))
      .groupBy(col("s"), col("c_id"), col("j"))
      .agg(sum(col("qd")).as("sq"), count(lit(1)).as("cnt"))
      .withColumn("cd", expr("(sq - pmod(sq, cnt)) div cnt"))
    val seedDims = cents0
      .select(col("s"), col("c_id"), posexplode(col("cq")).as(Seq("j", "seed_qd")))
    val cents1 = seedDims
      .join(sums.select(col("s"), col("c_id"), col("j"), col("cd")),
        Seq("s", "c_id", "j"), "left")
      .withColumn("cd", coalesce(col("cd"), col("seed_qd")))
      .groupBy(col("s"), col("c_id"))
      .agg(transform(array_sort(collect_list(struct(col("j"), col("cd")))),
        x => x.getField("cd")).as("cq"))

    // encode: each corpus subvector → its 4-bit code (row-local argmin
    // against the refined broadcast codebook), then pivot the M rows
    // into one code array per vector — the PQ code layout a real index
    // stores (8 nibbles), and the shape that lets the ADC scan below
    // run row-local instead of fanning M rows per (query, vector) pair
    // through a shuffle. `enc` keeps the full per-subspace distance
    // row, which IS the query-side ADC table — computed once.
    val enc = withCode(sub, centsWide(cents1))
    val codes = enc.select(col("vec_id"), col("s"), col("c_id").as("code"))
    val codesWide = codes
      .groupBy(col("vec_id"))
      .agg(transform(array_sort(collect_list(struct(col("s"), col("code")))),
        x => x.getField("code")).as("codes"))

    // per-query ADC lookup table: the M distance rows flattened to one
    // M×K array per query, indexed dtab[s*K + code]
    val qtab = enc.filter(pmod(col("vec_id"), lit(100)) === 0)
      .groupBy(col("vec_id"))
      .agg(flatten(transform(array_sort(collect_list(struct(col("s"), col("dists")))),
        x => x.getField("dists"))).as("dtab"))
      .select(col("vec_id").as("q_id"), col("dtab"))

    // ADC scan: corpus codes × broadcast query tables, the distance a
    // pure 8-lookup integer fold — no join key, no aggregation, no
    // shuffle; the only exchange left is TopK's bounded k×queries rows
    val adc = codesWide
      .crossJoin(broadcast(qtab))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("adc_dist",
        column(PqAdc(expression(col("codes")), expression(col("dtab")), K)))
      .select(col("q_id"), col("vec_id"), col("adc_dist"))

    // exact rerank of the ADC shortlist: true integer L2 over the full
    // 64-dim quantized vectors, only Shortlist×queries pairs pay for it
    val short = adc.transform(graft.plans.TopK.perGroup(
      Seq("q_id"), Seq("adc_dist" -> true, "vec_id" -> true), Shortlist))
    val reranked = short
      .join(qfull.withColumnRenamed("q", "nv"), Seq("vec_id"))
      .join(broadcast(qfull.filter(pmod(col("vec_id"), lit(100)) === 0)
        .select(col("vec_id").as("q_id"), col("q").as("qv"))), Seq("q_id"))
      .withColumn("l2_dist", l2(col("qv"), col("nv")))

    val w = Window.partitionBy(col("q_id")).orderBy(col("l2_dist"), col("vec_id"))
    val result = reranked
      .transform(graft.plans.TopK.perGroup(
        Seq("q_id"), Seq("l2_dist" -> true, "vec_id" -> true), TopN))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"),
        col("adc_dist"), col("l2_dist"))
      // TopN×queries rows: materialize eagerly so the two pipeline
      // caches can be released here instead of leaking one full-vector
      // and one 8×-exploded cache per invocation (the graphPagerank /
      // dupClusters loop discipline)
      .localCheckpoint()
    qfull.unpersist()
    sub.unpersist()
    result
  }
}
