package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (Relational.q1Agg _),
    "q3_join" -> (Relational.q3Join _),
    "q5_starjoin" -> (Relational.q5StarJoin _),
    "q_window" -> (Relational.qWindow _),
    "q_rollup" -> (Relational.qRollup _),
    "q_exists" -> (Relational.qExists _),
    // A. reference-pipeline operators
    "tei_extract" -> (TeiXml.teiExtract _),
    "name_normalize" -> (ReferenceOps.nameNormalize _),
    "abbrev_expand" -> (ReferenceOps.abbrevExpand _),
    "name_classify" -> (ReferenceOps.nameClassify _),
    "year_extract" -> (ReferenceOps.yearExtract _),
    "entity_match" -> (EntityMatch.entityMatch _),
    "match_certitude" -> (EntityMatch.matchCertitude _),
    "id_dedup" -> (EntityMatch.idDedup _),
    "enrich_join" -> (EnrichJoin.enrichJoin _),
    "ref_inject" -> (RefInject.refInject _),
    "word_count" -> (WordCount.wordCount _)
  )

  /** DuckDB-runnable oracle for each query (same tables, same column
    * names, same explicit ordering). */
  def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_base_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS sum_disc_price,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DECIMAL(18,6)) AS sum_charge,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_starjoin" ->
      """SELECT n_name,
        |  CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q_window" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS spend,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY o_custkey
        |), ranked AS (
        |  SELECT c_nationkey, c_name, spend, n_orders,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY spend DESC, o_custkey) AS rank_in_nation,
        |    CAST(sum(spend) OVER (PARTITION BY c_nationkey ORDER BY spend DESC, o_custkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(28,2)) AS running_spend
        |  FROM spend JOIN customer ON o_custkey = c_custkey
        |)
        |SELECT * FROM ranked WHERE rank_in_nation <= 3
        |ORDER BY c_nationkey, rank_in_nation""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,
    "q_exists" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "tei_extract" ->
      """SELECT doc_id, 'CAT_' || CAST(doc_id AS VARCHAR) AS xml_id, source AS name,
        |  substr(text, 1, 40) AS trait, 'author' AS name_type
        |FROM documents ORDER BY doc_id""".stripMargin,
    "name_normalize" ->
      """SELECT c_custkey, c_name,
        |  trim(regexp_replace(regexp_replace(lower(c_name), '[^a-z0-9à-ÿ ]', ' ', 'g'), '\s+', ' ', 'g')) AS name_norm
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "abbrev_expand" ->
      """SELECT doc_id, array_to_string(list_transform(string_split(text, ' '),
        |  t -> CASE t WHEN 'agg' THEN 'aggregate' WHEN 'dup' THEN 'duplicate'
        |    WHEN 'col' THEN 'column' WHEN 'val' THEN 'value' WHEN 'cust' THEN 'customer'
        |    WHEN 'qty' THEN 'quantity' WHEN 'j' THEN 'jean' WHEN 'ch' THEN 'charles'
        |    WHEN 'fr' THEN 'françois' ELSE t END), ' ') AS text_expanded
        |FROM documents ORDER BY doc_id""".stripMargin,
    "name_classify" ->
      """SELECT doc_id,
        |  CASE WHEN regexp_matches(text, '(?i)(document|divers)') THEN 'document'
        |    WHEN regexp_matches(text, '(?i)charte') THEN 'charter'
        |    WHEN regexp_matches(text, '(?i)(table|region|nation)') THEN 'place'
        |    WHEN regexp_matches(text, '(?i)(stream|event|war|revolution)') THEN 'event'
        |    ELSE 'person' END AS kind
        |FROM documents ORDER BY doc_id""".stripMargin,
    "year_extract" ->
      """WITH t AS (SELECT doc_id,
        |  'N. ' || CAST(1800 + doc_id % 150 AS VARCHAR) || ' M. ' || CAST(1820 + doc_id % 160 AS VARCHAR) AS trait
        |  FROM documents)
        |SELECT doc_id, trait,
        |  CAST(nullif(regexp_extract(trait, '(?:^|[\s,.])[Nn](?:\.|é|ée)[^0-9]*([0-9]{4})', 1), '') AS int) AS birth_year,
        |  CAST(nullif(regexp_extract(trait, '(?:^|[\s,.])[Mm](?:\.|ort|orte)[^0-9]*([0-9]{4})', 1), '') AS int) AS death_year
        |FROM t ORDER BY doc_id""".stripMargin,
    "entity_match" ->
      """WITH scored AS (
        |  SELECT c_custkey, c_name, s_suppkey, s_name,
        |    levenshtein(c_name, s_name) AS distance,
        |    row_number() OVER (PARTITION BY c_custkey
        |      ORDER BY levenshtein(c_name, s_name), s_suppkey) AS rk
        |  FROM customer JOIN supplier ON c_nationkey = s_nationkey)
        |SELECT c_custkey, c_name, s_suppkey AS match_id, s_name AS match_name, distance
        |FROM scored WHERE rk = 1 ORDER BY c_custkey""".stripMargin,
    "match_certitude" ->
      """WITH scored AS (
        |  SELECT c_custkey, c_acctbal, s_suppkey, s_acctbal,
        |    levenshtein(c_name, s_name) AS distance,
        |    row_number() OVER (PARTITION BY c_custkey
        |      ORDER BY levenshtein(c_name, s_name), s_suppkey) AS rk
        |  FROM customer JOIN supplier ON c_nationkey = s_nationkey),
        |best AS (SELECT * FROM scored WHERE rk = 1),
        |params AS (SELECT c_custkey, s_suppkey AS match_id,
        |  CAST(distance <= 12 AS int) + CAST(abs(c_acctbal - s_acctbal) < 2000.0 AS int)
        |    + CAST(c_custkey % 10 = s_suppkey % 10 AS int) AS paramcount
        |  FROM best)
        |SELECT c_custkey, match_id, paramcount, paramcount >= 2 AS certitude
        |FROM params ORDER BY c_custkey""".stripMargin,
    "id_dedup" ->
      """WITH scored AS (
        |  SELECT c_custkey, s_suppkey,
        |    row_number() OVER (PARTITION BY c_custkey
        |      ORDER BY levenshtein(c_name, s_name), s_suppkey) AS rk
        |  FROM customer JOIN supplier ON c_nationkey = s_nationkey)
        |SELECT DISTINCT s_suppkey AS match_id FROM scored WHERE rk = 1
        |ORDER BY match_id""".stripMargin,
    "enrich_join" ->
      """WITH labels AS (
        |  SELECT n_nationkey, n_name AS nation_label, r_name AS region_label
        |  FROM nation JOIN region ON n_regionkey = r_regionkey),
        |facts AS (
        |  SELECT o_custkey, count(*) AS workcount,
        |    sum(CAST(o_orderpriority = '1-URGENT' AS BIGINT)) AS conflictcount,
        |    list_sort(list(DISTINCT o_orderstatus)) AS statuses,
        |    list_sort(list(DISTINCT o_orderpriority)) AS priorities,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_custkey, c_name, nation_label, region_label,
        |  coalesce(workcount, 0) AS workcount,
        |  coalesce(conflictcount, 0) AS conflictcount,
        |  coalesce(statuses, []) AS statuses,
        |  coalesce(priorities, []) AS priorities,
        |  coalesce(spend, CAST(0 AS DECIMAL(18,2))) AS spend
        |FROM customer
        |LEFT JOIN labels ON c_nationkey = n_nationkey
        |LEFT JOIN facts ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "ref_inject" ->
      """WITH map(term, wd) AS (VALUES ('spark','Q101'),('join','Q102'),('window','Q103'),('stream','Q104'),('customer','Q105')),
        |cand AS (
        |  SELECT doc_id, term, wd, ' ' || text || ' ' AS padded,
        |    strpos(' ' || text || ' ', ' ' || term || ' ') AS pos,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY strpos(' ' || text || ' ', ' ' || term || ' '), term) AS rk
        |  FROM documents JOIN map ON strpos(' ' || text || ' ', ' ' || term || ' ') > 0)
        |SELECT doc_id, term, wd,
        |  trim(substr(padded, 1, pos) || '<name ref="wd:' || wd || '">' || term || '</name>'
        |    || substr(padded, pos + length(term) + 1)) AS text_ref
        |FROM cand WHERE rk = 1 ORDER BY doc_id""".stripMargin,
    "word_count" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
        |WHERE word <> '' AND word NOT IN ('the','a','of','and','to','in')
        |GROUP BY word ORDER BY cnt DESC, word""".stripMargin
  )
}
