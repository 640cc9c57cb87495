package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Count-min sketch heavy hitters (Cormode & Muthukrishnan 2005) —
  * frequency estimation under FIXED memory, the sketch a streaming /
  * multi-tenant pipeline keeps when the exact vocabulary no longer
  * fits. Depth hash rows x Width counters; est(t) = min over rows of
  * the counter t hashes into; the estimate never undershoots and
  * overshoots by collision mass only.
  *
  * Build order is vocabulary-first: the corpus collapses to per-term
  * counts in one map-side-combined shuffle (needed anyway for the
  * exact audit column), and the sketch aggregates the VOCABULARY — a
  * Depth-row fan-out of the distinct-term table into Depth*Width cells,
  * never a second pass over the corpus. The cell table (2048 rows, a
  * few KB regardless of input scale — that is the point of the sketch)
  * broadcasts onto the candidate top-k, which arrives through the
  * bounded-heap TopK operator's no-grouping path. Output audits the
  * sketch: exact count, CMS estimate, and the (always >= 0)
  * overestimate per heavy hitter.
  *
  * Hash family is md5-derived ('cms{d}-' || term, mod 2^61-1, mod
  * Width) so the DuckDB oracle replays identical cell placement and
  * the gate checks estimated VALUES, not just shape.
  */
object Sketch {

  /** HLL registers (p = 8, m = 2^p). */
  final val HllM = 256
  /** Bias-corrected constant alpha_m * m^2 * 2^62 folded into ONE double
    * literal computed here and embedded verbatim in the oracle SQL, so
    * both engines divide the identical numerator. */
  final val HllC: Double =
    0.7213 / (1.0 + 1.079 / HllM) * HllM * HllM * math.pow(2.0, 62)

  /** Independent hash rows. */
  final val Depth = 4
  /** Counters per row. */
  final val Width = 512
  /** Heavy hitters reported. */
  final val TopN = 20

  /** 61-bit md5 hash of a token under the HLL salt. */
  private def hllHash(token: Column): Column =
    graft.functions.Similarity.md5Mod(concat(lit("hll-"), token))

  /** HLL register index: low 8 bits of the hash. Shared by the batch
    * operator and the streaming sketch so the two cannot drift. */
  def hllBucket(token: Column): Column =
    hllHash(token).bitwiseAND(lit((HllM - 1).toLong))

  /** HLL rho (leading-zero rank of the remaining 53 bits), computed
    * with integer/string ops only — no float log2. */
  def hllRho(token: Column): Column = {
    val w = shiftright(hllHash(token), 8)
    when(w === 0, lit(54)).otherwise(lit(54) - length(ltrim(bin(w), "0")))
  }

  /** CMS cell index for hash row d — shared by the batch operator and
    * the streaming heavy-hitter sketch so the two cannot drift. */
  def cmsBucket(term: Column, d: Column): Column =
    pmod(graft.functions.Similarity.md5Mod(
      concat(lit("cms"), d.cast("string"), lit("-"), term)), lit(Width.toLong))

  private def bucket(term: Column, d: Column): Column = cmsBucket(term, d)

  /** HyperLogLog distinct-count sketch (Flajolet et al. 2007) audited
    * against the exact NDV — the OTHER fixed-memory sketch a corpus
    * pipeline keeps (CMS answers "how often", HLL answers "how many
    * distinct"). Per source: m=256 max-rho registers over md5-derived
    * 61-bit hashes; bucket = low 8 bits, rho = leading-zero rank of the
    * remaining 53 bits, computed EXACTLY in both engines as
    * 54 - length(ltrim(bin(w),'0')) — no float log2, no engine-native
    * HLL (Spark's and DuckDB's built-in sketches hash differently, so
    * the estimate itself is the thing the gate must pin).
    *
    * The harmonic denominator sum(2^-reg) is kept EXACT as integers:
    * each register contributes 2^(62-r) (a power of two, exact through
    * the double->decimal cast), empties contribute 2^62, the decimal
    * sum collapses to one double cast and ONE division by the
    * Scala-computed constant HllC — deterministic IEEE in both engines,
    * independent of aggregation order (the float-sum trap a naive
    * sum(pow(2,-r)) would hit under Spark's nondeterministic partition
    * order).
    *
    * Scale shape: registers are max-aggregates — duplicate-insensitive
    * and mergeable, so map-side partial max does the heavy lifting and
    * only (source x 256) cells shuffle. The exact-NDV audit column is
    * the one genuinely heavy shuffle (distinct on (source, token));
    * at 100 TB the audit drops and the sketch IS the answer — 2 KB of
    * state per source, merged associatively across 1000 executors. */
  def hllDistinct(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .dropDuplicates("source", "token")
    // both branches (registers, exact NDV) share this distinct subtree;
    // ReusedExchange feeds the second — the cms_topk discipline
    val hashed = toks
      .withColumn("bucket", hllBucket(col("token")))
      .withColumn("rho", hllRho(col("token")))
    val regs = hashed.groupBy(col("source"), col("bucket"))
      .agg(max(col("rho")).as("r"))
    val perSource = regs.groupBy(col("source"))
      .agg(count(lit(1)).as("nb"),
        sum(pow(lit(2.0), lit(62) - col("r")).cast("decimal(38,0)")).as("s_ne"))
    val exact = toks.groupBy(col("source"))
      .agg(count(lit(1)).as("n_distinct_tokens"))
    val two62 = lit(4611686018427387904L).cast("decimal(38,0)")
    // standard two-regime estimator: the raw harmonic estimate biases
    // high when ndv << m (few registers hit), so below the 2.5m knee
    // with zero registers present, LINEAR COUNTING m*ln(m/zeros) takes
    // over — same branch, same ln, in both engines
    perSource.join(exact, Seq("source"))
      .withColumn("n_zero_regs", (lit(HllM) - col("nb")).cast("long"))
      .withColumn("reg_sum",
        (col("s_ne") + col("n_zero_regs").cast("decimal(38,0)") * two62)
          .cast("double"))
      .withColumn("hll_raw", lit(HllC) / col("reg_sum"))
      // round the ln-path estimate to 6 decimals (the events_anomaly /
      // bm25 discipline): Java's and DuckDB's ln differ in the last
      // ulp, and rel_err then derives from the ROUNDED estimate so
      // both engines divide identical inputs
      .withColumn("hll_est", round(
        when(col("hll_raw") <= lit(2.5 * HllM) && col("n_zero_regs") > 0,
          lit(HllM.toDouble) * log(lit(HllM.toDouble) / col("n_zero_regs").cast("double")))
          .otherwise(col("hll_raw")), 6))
      .select(col("source"), col("n_distinct_tokens"), col("n_zero_regs"),
        col("reg_sum"), col("hll_raw"), col("hll_est"),
        round((col("hll_est") - col("n_distinct_tokens").cast("double")) /
          col("n_distinct_tokens").cast("double"), 6).as("rel_err"))
  }

  def cmsTopk(spark: SparkSession, sfDir: String): DataFrame = {
    // both consumers (cells, cands) share this exact subtree, so the
    // corpus-token shuffle is built once and ReusedExchange feeds the
    // second branch — no persist needed
    val vocab = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))

    val cells = vocab
      .select(col("token"), col("cnt"),
        explode(sequence(lit(0), lit(Depth - 1))).as("d"))
      .withColumn("bucket", bucket(col("token"), col("d")))
      .groupBy(col("d"), col("bucket")).agg(sum(col("cnt")).as("cell"))

    val cands = vocab.transform(graft.plans.TopK.perGroup(
      Seq(), Seq("cnt" -> false, "token" -> true), TopN))

    cands
      .select(col("token"), col("cnt"),
        explode(sequence(lit(0), lit(Depth - 1))).as("d"))
      .withColumn("bucket", bucket(col("token"), col("d")))
      .join(broadcast(cells), Seq("d", "bucket"))
      .groupBy(col("token"), col("cnt"))
      .agg(min(col("cell")).as("cms_est"))
      .select(col("token"), col("cnt").as("exact_cnt"), col("cms_est"),
        (col("cms_est") - col("cnt")).as("over_est"))
  }

  /** JOIN-SIZE ESTIMATION by CMS inner product (AGMS/Count-Min dot
    * product, Cormode & Muthukrishnan §4.2): |A ⋈_k B| = Σ_k f_A(k)·
    * f_B(k), estimated as min over hash rows d of Σ_w cmsA[d][w]·
    * cmsB[d][w] — the optimizer-statistics primitive for sizing a join
    * WITHOUT running it, here audited on the hardest case (the
    * self-join on l_partkey, whose size Σ f² is pure skew signal).
    * The estimate never undershoots (hash collisions only add mass);
    * the audit column shows the per-depth overshoot against the exact
    * answer computed from the same frequency vector.
    *
    * Scale shape: ONE key-frequency aggregate feeds both the sketch
    * (Depth×Width cells — constant-size, mergeable, the same cells a
    * streaming deployment maintains incrementally) and the exact
    * audit; everything downstream is cell arithmetic in exact
    * decimal(38,0). */
  def cmsJoinEst(spark: SparkSession, sfDir: String): DataFrame = {
    val freq = Tables.lineitem(spark, sfDir)
      .groupBy(col("l_partkey").as("pk")).agg(count(lit(1)).as("cnt"))
    val exact = freq.agg(
      sum(col("cnt").cast("decimal(38,0)") * col("cnt")).as("exact_size"))
    val cells = freq
      .select(col("pk"), col("cnt"),
        explode(sequence(lit(0), lit(Depth - 1))).as("d"))
      .withColumn("bucket", bucket(col("pk").cast("string"), col("d")))
      .groupBy(col("d"), col("bucket")).agg(sum(col("cnt")).as("cell"))
    cells
      .groupBy(col("d"))
      .agg(sum(col("cell").cast("decimal(38,0)") * col("cell")).as("est"))
      .crossJoin(broadcast(exact))
      .select(col("d").cast("long").as("d"), col("est").cast("double").as("est_size"),
        col("exact_size").cast("double").as("exact_size"),
        round(col("est").cast("double") / col("exact_size").cast("double"), 6)
          .as("blowup"))
  }

  /** MinHash signature length for the source-similarity matrix. */
  final val MhPerms = 64

  /** SOURCE-SIMILARITY MATRIX by MinHash signatures (Broder 1997, the
    * signature-matrix form): each source's token SET reduces to
    * MhPerms min-hash values; pairwise signature agreement /64
    * estimates token-set Jaccard between sources — the corpus-level
    * "which domains overlap" diagnostic (domain mixing, redundant
    * crawl detection) that never materializes a cross join of
    * vocabularies at estimation time. Exact-Jaccard audit columns ride
    * alongside (test-scale luxury, dropped at 100 TB — the point of
    * the sketch).
    *
    * The per-(source, perm) min is COMMUTATIVE + idempotent — the same
    * merge the streaming twin (DocStreams.minhashSignature) maintains
    * in mapGroupsWithState with out-of-order parity. Scale shape: one
    * (source, token) distinct, a 64-row broadcast of seeds, one
    * (source, perm) min-aggregate (map-side combined); pairing is
    * |sources|²-bounded cell arithmetic. */
  def minhashSourceSim(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = sourceTokens(spark, sfDir)
    val sig = sourceSignature(toks)
    val pairs = sig.select(col("source").as("source_a"), col("i"), col("m").as("ma"))
      .join(sig.select(col("source").as("source_b"), col("i"), col("m").as("mb")),
        Seq("i"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(when(col("ma") === col("mb"), 1L).otherwise(0L)).as("mh_matches"))
    val sizes = toks.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = toks.select(col("source").as("source_a"), col("token"))
      .join(toks.select(col("source").as("source_b"), col("token")), Seq("token"))
      .filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b")).agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.select(col("source").as("source_a"), col("n").as("na")), Seq("source_a"))
      .join(sizes.select(col("source").as("source_b"), col("n").as("nb")), Seq("source_b"))
      .join(inter, Seq("source_a", "source_b"), "left")
      .na.fill(0L, Seq("inter"))
      .select(col("source_a"), col("source_b"), col("mh_matches"),
        (col("mh_matches").cast("double") / MhPerms).as("est_jaccard"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("exact_jaccard"),
        round(abs(col("mh_matches").cast("double") / MhPerms -
          col("inter").cast("double") /
            (col("na") + col("nb") - col("inter")).cast("double")), 6).as("abs_err"))
  }

  /** Distinct (source, token) pairs — the per-source token set. */
  private[graft] def sourceTokens(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .dropDuplicates("source", "token")

  /** The 64-row (i, a, b) permutation-seed table — the dedup_minhash
    * oracle convention (a nonzero mod P). Shared by the batch matrix
    * and the streaming twin so the hash family cannot drift. */
  private[graft] def mhSeeds(spark: SparkSession): DataFrame = {
    val P = graft.expressions.CrossHash.P
    spark.range(MhPerms).select(col("id").as("i"),
      (pmod(graft.functions.Similarity.md5Mod(
        concat(lit("srcmh-a-"), col("id").cast("string"))), lit(P - 1)) + 1).as("a"),
      pmod(graft.functions.Similarity.md5Mod(
        concat(lit("srcmh-b-"), col("id").cast("string"))), lit(P)).as("b"))
  }

  /** (a·h + b) mod P in decimal(38,0) — the 122-bit product is exact. */
  private[graft] def mhHash(hb: Column, a: Column, b: Column): Column =
    ((a.cast("decimal(38,0)") * hb + b) %
      lit(graft.expressions.CrossHash.P).cast("decimal(38,0)")).cast("long")

  /** The (source, perm, min-hash) signature table. Seed scheme and
    * modular arithmetic mirror the dedup_minhash oracle convention
    * ((a·h + b) mod P, a nonzero); shared by the batch matrix and the
    * streaming min-merge twin so the two cannot drift. */
  private[graft] def sourceSignature(toks: DataFrame): DataFrame =
    toks
      .withColumn("hb", graft.functions.Similarity.md5Mod(col("token")))
      .crossJoin(broadcast(mhSeeds(toks.sparkSession)))
      .withColumn("h", mhHash(col("hb"), col("a"), col("b")))
      .groupBy(col("source"), col("i"))
      .agg(min(col("h")).as("m"))

  /** KMV sketch size (k minimum hash values per set). */
  final val KmvK = 64

  /** KMV / theta-sketch AUDIENCE OVERLAP (Beyer et al. 2007; the
    * Theta-sketch set algebra): estimate |A∪B|, Jaccard, and |A∩B|
    * between every pair of event-type audiences from each side's K
    * MINIMUM md5 hash values — the mergeable fixed-size summary that
    * answers "how much do these segments overlap" without ever
    * co-shuffling the full id sets. Third sketch family next to CMS
    * (frequency) and HLL (cardinality): KMV is the one whose sketches
    * COMPOSE under set operations.
    *
    * Estimators: with U_K = the K smallest of the union (all of it
    * when the union is smaller), û = (|U_K|−1)·P / max(U_K) when
    * saturated and the exact size otherwise; Ĵ = |U_K ∩ A ∩ B|/|U_K|;
    * î = Ĵ·û. Everything until the two terminal divides is exact
    * integer selection over uniform [0,P) hashes, so both engines pick
    * identical sketch members. Exact union/intersection/Jaccard ride
    * along as audit columns (the cms/hll audit discipline).
    *
    * Scale shape: ONE distinct pass over (type, user), bounded-heap
    * TopK keeps K hashes per type (map tasks forward ≤ K rows), and
    * all pair algebra runs on types²·K sketch rows — constant-size
    * regardless of corpus. The exact audit is the only corpus-sized
    * aggregate, and a production deployment drops it. */
  def kmvOverlap(spark: SparkSession, sfDir: String): DataFrame = {
    val P = graft.expressions.CrossHash.P
    val members = Tables.events(spark, sfDir)
      .select(col("event_type"), col("user_id")).distinct()
    val hashes = members.select(col("event_type"),
      graft.functions.Similarity.md5Mod(concat(lit("kmv-"), col("user_id"))).as("h"))
    val sk = hashes.transform(graft.plans.TopK.perGroup(
      Seq("event_type"), Seq("h" -> true), KmvK))
    val types = sk.select(col("event_type")).distinct()
    val pairs = types.select(col("event_type").as("type_a"))
      .crossJoin(types.select(col("event_type").as("type_b")))
      .filter(col("type_a") < col("type_b"))
    // union the two sketches per pair; common hashes collapse with
    // both membership flags set (same user ⇒ same md5 on both sides)
    val u = pairs.join(sk.select(col("event_type").as("type_a"), col("h"),
          lit(1).as("in_a"), lit(0).as("in_b")), Seq("type_a"))
      .unionByName(pairs.join(sk.select(col("event_type").as("type_b"), col("h"),
          lit(0).as("in_a"), lit(1).as("in_b")), Seq("type_b")))
      .groupBy(col("type_a"), col("type_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val uk = u.transform(graft.plans.TopK.perGroup(
      Seq("type_a", "type_b"), Seq("h" -> true), KmvK))
    val est = uk.groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_uk"), max(col("h")).as("kth"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1L).otherwise(0L)).as("n_both"))
      .select(col("type_a"), col("type_b"), col("n_uk"), col("n_both"),
        when(col("n_uk") < KmvK, col("n_uk").cast("double"))
          .otherwise((col("n_uk") - 1).cast("double") * P / col("kth").cast("double"))
          .as("est_union"))
      .withColumn("est_jaccard",
        round(col("n_both").cast("double") / col("n_uk").cast("double"), 6))
      .withColumn("est_intersect",
        round(col("n_both").cast("double") / col("n_uk").cast("double")
          * col("est_union"), 6))
      .withColumn("est_union", round(col("est_union"), 6))
    // exact audit (corpus-sized; a production deployment drops this)
    val exact = pairs
      .join(members.select(col("event_type").as("type_a"), col("user_id")), Seq("type_a"))
      .unionByName(pairs.join(
        members.select(col("event_type").as("type_b"), col("user_id")), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("user_id")))
      .groupBy(col("type_a"), col("type_b"), col("user_id"))
      .agg(count(lit(1)).as("sides"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("exact_union"),
        sum(when(col("sides") === 2, 1L).otherwise(0L)).as("exact_intersect"))
    est.join(exact, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"), col("n_uk"), col("n_both"),
        col("est_union"), col("est_jaccard"), col("est_intersect"),
        col("exact_union"), col("exact_intersect"),
        round(col("exact_intersect").cast("double") / col("exact_union").cast("double"), 6)
          .as("exact_jaccard"))
  }
}
