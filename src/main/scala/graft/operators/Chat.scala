package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Conversation-format QA — the validation pass an SFT/chat-tuning
  * pipeline runs over "role: text" transcripts before they become
  * training examples: parse the transcript into turns and check the
  * structural contract (optional leading system prompt, then strict
  * user/assistant alternation, conversation ends on an assistant
  * turn), plus the length stats a packing stage needs.
  *
  * The transcript column is synthesized deterministically from the
  * documents table (turn length and role pattern keyed off doc_id,
  * with a deliberate role-flip injected every 13th doc so the
  * alternation check has real negatives); the parse-and-validate path
  * is exactly what runs over real `spark.read` chat data.
  *
  * Scale shape: rendering, parsing, and validation are ONE row-local
  * projection (split / transform / aggregate collection expressions,
  * all codegen-adjacent, no UDF) — the whole operator is a single
  * corpus scan with zero shuffles. */
object Chat {

  def chatTurns(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .withColumn("nw", size(col("words")).cast("long"))
      .withColumn("tlen", (lit(3L) + pmod(col("doc_id"), lit(4))).cast("long"))
      .withColumn("nt", expr("(nw + tlen - 1) div tlen"))
    // rendered role of turn i: optional system prompt on every 5th doc,
    // then alternation — with the role at i=1 FLIPPED on every 13th doc
    // (the corrupt-transcript case the validator must catch)
    val roleSql =
      """CASE
        |  WHEN doc_id % 13 = 0 AND i = 1 THEN
        |    CASE WHEN doc_id % 5 = 0 THEN 'assistant' ELSE 'user' END
        |  WHEN doc_id % 5 = 0 THEN
        |    CASE WHEN i = 0 THEN 'system'
        |         WHEN i % 2 = 1 THEN 'user' ELSE 'assistant' END
        |  ELSE CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END
        |END""".stripMargin
    val rendered = docs.select(col("doc_id"),
      array_join(expr(
        s"""transform(sequence(0L, nt - 1),
           |  i -> concat($roleSql, ': ',
           |    array_join(slice(words, cast(i * tlen + 1 as int), cast(tlen as int)), ' ')))"""
          .stripMargin), "\n").as("transcript"))
    // parse back: the operator under test starts HERE
    rendered
      .withColumn("turns", split(col("transcript"), "\n"))
      .withColumn("roles", expr("transform(turns, t -> substring_index(t, ': ', 1))"))
      .withColumn("contents", expr(
        "transform(turns, t -> substring(t, length(substring_index(t, ': ', 1)) + 3))"))
      .select(col("doc_id"),
        size(col("turns")).cast("long").as("n_turns"),
        (element_at(col("roles"), 1) === "system").as("has_system"),
        // valid iff the role sequence matches one of the two legal
        // templates exactly (system-led or user-led alternation)
        expr(
          """roles = transform(sequence(0, size(roles) - 1),
            |  i -> CASE WHEN i = 0 THEN 'system'
            |       WHEN i % 2 = 1 THEN 'user' ELSE 'assistant' END)
            |OR roles = transform(sequence(0, size(roles) - 1),
            |  i -> CASE WHEN i % 2 = 0 THEN 'user' ELSE 'assistant' END)"""
            .stripMargin).as("alternation_ok"),
        (element_at(col("roles"), -1) === "assistant").as("ends_with_assistant"),
        round(expr("aggregate(contents, 0L, (a, c) -> a + length(c))").cast("double")
          / size(col("turns")).cast("double"), 6).as("avg_turn_chars"))
  }
}
