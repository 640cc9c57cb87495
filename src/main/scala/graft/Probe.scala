package graft

import org.apache.spark.sql.functions._

/** Scratch main for timing plan variants (dev tool). Current shape:
  * a 10× scale probe for the corpus-composition operators — unions
  * ten id-shifted copies of the sf0.1 documents/embeddings tables into
  * /tmp/sfbig (500k docs / 100k vectors, with every doc duplicated
  * across shards so the dedup graph gets genuinely dense) and times
  * each operator end-to-end. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession("probe", 32)
    val sf = "/root/testdata/sf0.1"
    val big = "/tmp/sfbig"
    val shards = 10

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big/documents.parquet"))) {
      val docs = graft.sources.Tables.documents(spark, sf)
      (0 until shards).map(i => docs
          .withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$big/documents.parquet")
      val emb = graft.sources.Tables.embeddings(spark, sf)
      (0 until shards).map(i => emb
          .withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$big/embeddings.parquet")
    }
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big/events.parquet"))) {
      // 10M events / 1.5k users: ids and users shift per shard so the
      // funnel/retention state fans out instead of piling on 150 keys
      val ev = graft.sources.Tables.events(spark, sf)
      (0 until shards).map(i => ev
          .withColumn("event_id", col("event_id") + lit(i * 100000000L))
          .withColumn("user_id", col("user_id") + lit(i * 10000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$big/events.parquet")
    }
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big/lineitem.parquet"))) {
      val li = graft.sources.Tables.lineitem(spark, sf)
      (0 until shards).map(i => li
          .withColumn("l_orderkey", col("l_orderkey") + lit(i * 100000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$big/lineitem.parquet")
    }

    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big/orders.parquet"))) {
      // orders/customer shift together so the custkey join keys stay
      // consistent; part stays a single copy (lineitem keeps original
      // partkeys — a fixed dim under a 10× fact, the realistic shape)
      val ord = graft.sources.Tables.orders(spark, sf)
      (0 until shards).map(i => ord
          .withColumn("o_orderkey", col("o_orderkey") + lit(i * 100000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$big/orders.parquet")
      val cust = graft.sources.Tables.customer(spark, sf)
      (0 until shards).map(i => cust
          .withColumn("c_custkey", col("c_custkey") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$big/customer.parquet")
      graft.sources.Tables.part(spark, sf)
        .write.mode("overwrite").parquet(s"$big/part.parquet")
    }
    // label/dimension tables stay single copies: fixed dims under a
    // 10× fact side (needed by enrich_wide / q5 / entity ops); checked
    // per table so a killed build resumes with exactly the missing ones
    for (t <- Seq("nation", "region", "supplier"))
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$big/$t.parquet")))
        graft.sources.Tables.table(spark, sf, t)
          .write.mode("overwrite").parquet(s"$big/$t.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    def run(name: String): Unit =
      time(name)(SparkEntry.queries(name)(spark, big).queryExecution.toRdd.count())

    graft.sources.Tables.documents(spark, big).count() // warm fs cache
    val targets = if (args.nonEmpty) args.toSeq else Seq(
      "sample_stratified", "domain_mix", "seq_pack", "repetition_score",
      "bigram_lm_score", "doc_keywords", "cluster_assign", "dup_clusters",
      "decontaminate", "bpe_pairs", "col_profile", "zorder_layout",
      "events_funnel", "events_retention",
      // round-4 wave: warehouse / time-series / retrieval / graph
      "scd2_dim", "merge_upsert", "q_corr", "q_cube", "bloom_prune",
      "graph_triangles", "events_gapfill", "events_anomaly",
      "events_attribution", "vocab_coverage", "class_balance",
      "sample_group", "bm25_rank", "assoc_rules", "pareto_front",
      "dq_checks", "pipeline_tokens", "graph_pagerank")
    targets.foreach(run)
    spark.stop()
  }
}
