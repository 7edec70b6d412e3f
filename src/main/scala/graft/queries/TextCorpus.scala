package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.text
import graft.operators.InvertedIndex

/** The reference engine's query surface re-hosted on the parquet
  * `documents` table (doc_id plays the manifest file id; FIXTURES.md §B).
  * Posting lists are emitted as space-joined strings, not arrays — the
  * driver hash-compares column values, and a string round-trips
  * identically through Spark parquet and DuckDB.
  */
object TextCorpus {

  /** DuckDB expression producing the same normalized token list as
    * [[graft.functions.text.normalizedTokens]]: whitespace-run split,
    * ASCII-letters-only lowercase, empties dropped.
    */
  val tokensSql: String =
    "list_filter(list_transform(regexp_split_to_array(text, '\\s+')," +
      " t -> lower(regexp_replace(t, '[^A-Za-z]', '', 'g'))), t -> len(t) > 0)"

  private def words(s: SparkSession, d: String): DataFrame =
    InvertedIndex.words(Tables.documents(s, d), "doc_id", "text")

  /** Per-document token count (tokenize + normalize + filter as in
    * reference main.cpp:66-96, counted).
    */
  private def q16(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        size(text.normalizedTokens(col("text"))).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"))

  /** The inverted index itself (reference main.cpp:121-135): word ->
    * sorted distinct doc ids + doc frequency, ranked (main.cpp:137-148).
    */
  private def q17(s: SparkSession, d: String): DataFrame =
    words(s, d)
      .groupBy(col("word"))
      .agg(array_sort(collect_set(col("file_id"))).as("ids"))
      .select(
        col("word"),
        concat_ws(" ", col("ids")).as("doc_ids"),
        size(col("ids")).cast("long").as("doc_freq"),
      )
      .orderBy(col("doc_freq").desc, col("word"))

  /** Document-frequency ranking with the reference's letter partition key
    * (main.cpp:41-46): scalable count-distinct form, no posting list.
    */
  private def q18(s: SparkSession, d: String): DataFrame =
    words(s, d)
      .groupBy(col("word"))
      .agg(countDistinct(col("file_id")).as("doc_freq"))
      .select(col("word"), col("doc_freq"), text.firstLetter(col("word")).as("letter"))
      .orderBy(col("doc_freq").desc, col("word"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q16_doc_token_counts", q16,
      Some(s"""SELECT doc_id, len($tokensSql) AS n_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)),
    QueryDef("q17_inverted_index", q17,
      Some(s"""WITH w AS (
              |  SELECT DISTINCT doc_id, unnest($tokensSql) AS word FROM documents)
              |SELECT word, string_agg(CAST(doc_id AS VARCHAR), ' ' ORDER BY doc_id) AS doc_ids,
              |count(*) AS doc_freq
              |FROM w GROUP BY word ORDER BY doc_freq DESC, word""".stripMargin)),
    QueryDef("q18_word_doc_freq", q18,
      Some(s"""WITH w AS (
              |  SELECT DISTINCT doc_id, unnest($tokensSql) AS word FROM documents)
              |SELECT word, count(*) AS doc_freq, substr(word,1,1) AS letter
              |FROM w GROUP BY word ORDER BY doc_freq DESC, word""".stripMargin)),
  )
}
