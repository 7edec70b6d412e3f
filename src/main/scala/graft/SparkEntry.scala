package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Curation, DedupQueries, Extras, Pipeline, PipelineTxnQueries, QueryDef, Relational, ScalePatterns, Similarity, TextAnalysis, TextCorpus}

/** Driver contract — see SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (and the LLM-pipeline
  * extensions) is declared once as a [[graft.queries.QueryDef]]; `queries`
  * and `oracleSql` are projections of that single registry so the two can
  * never drift apart.
  */
object SparkEntry {

  def allDefs: Seq[QueryDef] =
    Relational.defs ++ TextCorpus.defs ++ TextAnalysis.defs ++
      DedupQueries.defs ++ Similarity.defs ++ Extras.defs ++ ScalePatterns.defs ++
      Curation.defs ++ Pipeline.defs ++ PipelineTxnQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's own query: document-frequency-ranked inverted index.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q17_inverted_index")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allDefs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    allDefs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
