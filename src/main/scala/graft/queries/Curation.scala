package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The end-to-end training-data curation pipeline, composed from the
  * already-verified building blocks: language ID (q19) + quality scoring
  * (q20) + near-duplicate canonicalization (q43), joined on doc_id and
  * filtered to the kept corpus. This is the query an LLM-pipeline user
  * actually runs — "give me the clean, deduplicated, language-confident
  * documents" — and it exists here as ONE declarative plan: Catalyst sees
  * through the composition (all three branches share the documents scan)
  * rather than executing three materialized stages. The oracle composes
  * the exact same three oracle subqueries, so the two sides reuse the
  * per-stage verification.
  */
object Curation {

  private def find(defs: Seq[QueryDef], name: String): QueryDef =
    defs.find(_.name == name)
      .getOrElse(sys.error(s"curation building block $name missing"))

  private val langDef = find(TextAnalysis.defs, "q19_lang_id")
  private val qualityDef = find(TextAnalysis.defs, "q20_quality_score")
  private val dedupDef = find(DedupQueries.defs, "q43_dedup_pipeline")

  /** Kept = confidently language-identified, quality above threshold
    * (integer-milli-derived, so the comparison is float-safe in both
    * engines), and not a near-duplicate of an earlier document.
    */
  val qualityFloor = 0.25

  private def q46(s: SparkSession, d: String): DataFrame = {
    val lang = langDef.fn(s, d).select(col("doc_id"), col("pred_lang"))
    val quality = qualityDef.fn(s, d).select(col("doc_id"), col("quality"), col("n_tokens"))
    val dedup = dedupDef.fn(s, d).select(col("doc_id"), col("is_dup"))
    lang.join(quality, "doc_id").join(dedup, "doc_id")
      .where(col("pred_lang") =!= "und" && col("quality") >= qualityFloor
        && col("is_dup") === 0)
      .select(col("doc_id"), col("pred_lang"), col("quality"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q46_curation", q46, Some(
      s"""WITH lang AS (SELECT doc_id, pred_lang FROM (${langDef.oracle.get})),
         |q AS (SELECT doc_id, quality, n_tokens FROM (${qualityDef.oracle.get})),
         |dd AS (SELECT doc_id, is_dup FROM (${dedupDef.oracle.get}))
         |SELECT l.doc_id AS doc_id, pred_lang, quality, n_tokens
         |FROM lang l JOIN q ON q.doc_id = l.doc_id JOIN dd ON dd.doc_id = l.doc_id
         |WHERE pred_lang <> 'und' AND quality >= $qualityFloor AND is_dup = 0
         |ORDER BY doc_id""".stripMargin)),
  )
}
