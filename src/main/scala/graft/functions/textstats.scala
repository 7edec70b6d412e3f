package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for the training-data pipeline surface:
  * language ID, quality scoring, token statistics, fingerprinting. All
  * pure Catalyst built-ins / higher-order functions (codegen-friendly, no
  * UDFs), and all deterministic so a SQL oracle can replicate them.
  */
object textstats {

  /** Tiny per-language stopword inventories for the n-gram/stopword
    * language-ID heuristic. Deliberately small + fixed: the operator is
    * about the distributed scoring shape, not lexicography.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
    "es" -> Seq("el", "las", "los", "y", "es", "no", "por", "con"),
    "fr" -> Seq("le", "la", "les", "et", "est", "pas", "pour", "dans"),
  )

  /** Number of DISTINCT stopwords of `lang` present in the token array. */
  def stopwordHits(tokens: Column, lang: String): Column =
    size(array_distinct(array_intersect(tokens, lit(stopwords(lang).toArray)))).cast("long")

  /** Predicted language: max stopword hits, alphabetical tie-break
    * (deterministic CASE over the fixed language order).
    */
  def predictLang(tokens: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l => l -> stopwordHits(tokens, l))
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((l, s), els) =>
      when(s === best && best > 0, lit(l)).otherwise(els)
    }
  }

  /** Occurrences (not distinct) of English stopwords in the token array. */
  def stopwordOccurrences(tokens: Column): Column =
    size(filter(tokens, t => array_contains(lit(stopwords("en").toArray), t))).cast("long")

  /** Characters outside [A-Za-z0-9 ] — the punctuation/noise count. */
  def punctCount(textCol: Column): Column =
    length(regexp_replace(textCol, "[A-Za-z0-9 ]", "")).cast("long")

  /** Sum of token lengths (for average-token-length without a fold). */
  def totalTokenChars(tokens: Column): Column =
    length(concat_ws("", tokens)).cast("long")

  /** Tokens matching a BPE-ish word shape (letter runs / digit runs). */
  def wordShapeCount(textCol: Column): Column =
    regexp_count(textCol, lit("[A-Za-z]+|[0-9]+")).cast("long")

  /** Polynomial rolling hash of a string (base 31, mod 1e9+7). Matches
    * DuckDB's `list_reduce(list_transform(string_split(s,''),
    * c->ascii(c)), (a,b)->(a*31+b)%p)` exactly: with init 0, the
    * accumulator after the first character equals that character's code,
    * which is list_reduce's first-element seed; empty string hashes to 0.
    * Codegen'd custom expression — see
    * [[graft.expressions.StringPolyHash]] for why not a declarative fold.
    */
  def rollingHash(textCol: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(
      graft.expressions.StringPolyHash(ColumnBridge.expression(textCol)))
  }
}
