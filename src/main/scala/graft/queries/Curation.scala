package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{text, textstats}

/** The end-to-end training-data curation pipeline: language ID (q19) +
  * quality scoring (q20) + near-duplicate removal (q43's verify stage),
  * filtered to the kept corpus. This is the query an LLM-pipeline user
  * actually runs — "give me the clean, deduplicated, language-confident
  * documents".
  *
  * Scale shape: the naive composition of the three registered queries
  * scans (and tokenizes!) the corpus once per branch — Spark does not
  * dedupe identical subtrees across join branches. Here the plan is
  * FUSED instead: one corpus pass computes every per-row feature
  * (language, quality, token count — tokenization runs once), the
  * dedup branch reads the shared MATERIALIZED verified-pair table
  * (DedupQueries.verifiedPairs — built once per JVM, maintained
  * incrementally in a deployment), and near-duplicates are removed
  * with a left-anti join against verified duplicate ids (doc_b of a
  * verified pair always exceeds doc_a, so "is a dup" == "appears as
  * doc_b"). One corpus read plus a candidate-sized table read — the
  * difference between 1x and 4x the scan bill at 100 TB. The oracle
  * still composes the three verified oracle subqueries, so the fused
  * plan is checked against the per-stage semantics.
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
    val toks = text.normalizedTokens(col("text"))
    val features = Tables.documents(s, d).select(
      col("doc_id"),
      textstats.predictLang(toks).as("pred_lang"),
      TextAnalysis.qualityCol(col("text"), toks).as("quality"),
      size(toks).cast("long").as("n_tokens"))
    val dupIds = DedupQueries.verifiedPairs(s, d)
      .where(lit(3) * col("n_common") >= col("n_a") + col("n_b"))
      .select(col("doc_b").as("doc_id"))
      .distinct()
    features
      .join(dupIds, Seq("doc_id"), "left_anti")
      .where(col("pred_lang") =!= "und" && col("quality") >= qualityFloor)
      .select(col("doc_id"), col("pred_lang"), col("quality"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Block-size cap for the fuzzy-match candidate join: an entity block
    * larger than this is degenerate blocking (the key stopped
    * discriminating) and is skipped rather than allowed to go quadratic —
    * the same admission rule as the LSH bucket cap (Dedup
    * .defaultMaxBucket), applied to record linkage.
    */
  val maxNameBlock = 1000

  /** Fuzzy entity matching by blocking + edit-distance verify — record
    * linkage done the only way that survives scale: first collapse the
    * record table to its DISTINCT entity names with counts (vocabulary-
    * sized, one map-side-combine shuffle — never pair raw records, where
    * identical names alone would make the join quadratic), then generate
    * candidates with a blocking equi-join (block key = the name's head
    * noun, i.e. last token) capped at [[maxNameBlock]], and verify with
    * exact Levenshtein <= 2 on the candidate set only. Output: the
    * merge-suggestion table with per-name record counts — what a
    * dedup/normalization pass applies back to the records.
    */
  /** The q117 core over any (p_name) record frame, exposed for the
    * degenerate-block-cap spec.
    */
  private[graft] def fuzzyNameMatches(parts: DataFrame, maxBlock: Int): DataFrame = {
    val names = parts
      .groupBy(col("p_name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("noun", element_at(split(col("p_name"), " "), -1))
      .localCheckpoint() // vocabulary-sized; reused for block sizing + both join sides
    // Block-size gate as a partial-agg groupBy + equi-join (q93's shape),
    // not a count window: a degenerate block key never lands n_names rows
    // on one window task — its size is combined map-side, and the join
    // back is AQE-skew-splittable before the cap drops it anyway.
    val blockOk = names.groupBy(col("noun"))
      .agg(count(lit(1)).as("block_n"))
      .where(col("block_n") <= maxBlock)
      .select(col("noun"))
    val capped = names.join(blockOk, Seq("noun"))
    val a = capped.select(col("noun"), col("p_name").as("name_a"), col("n_parts").as("n_a"))
    val b = capped.select(col("noun"), col("p_name").as("name_b"), col("n_parts").as("n_b"))
    a.join(b, "noun")
      .where(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .where(col("dist") <= 2)
      .select(col("name_a"), col("name_b"), col("dist"), col("n_a"), col("n_b"))
      .orderBy(col("name_a"), col("name_b"))
  }

  private def q117(s: SparkSession, d: String): DataFrame =
    fuzzyNameMatches(Tables.part(s, d), maxNameBlock)

  /** Curation rule attribution — the "WHY was each document dropped"
    * report behind q46's survivor list: per filter rule (language
    * unidentified, quality below floor, near-duplicate), how many
    * documents fail it, how many fail ONLY it (the rule's marginal
    * kill count — what relaxing just that rule would recover), how many
    * fail several, and how many survive. The numbers a pipeline owner
    * reads before touching a threshold. Same fused single-pass feature
    * computation as q46 (tokenize once, dup ids from the shared
    * materialized pair table), collapsed to ONE aggregation row of exact counts;
    * q46's kept count must equal n_kept (tied in spec).
    */
  private def q143(s: SparkSession, d: String): DataFrame = {
    val toks = text.normalizedTokens(col("text"))
    val features = Tables.documents(s, d).select(
      col("doc_id"),
      textstats.predictLang(toks).as("pred_lang"),
      TextAnalysis.qualityCol(col("text"), toks).as("quality"))
    val dupIds = DedupQueries.verifiedPairs(s, d)
      .where(lit(3) * col("n_common") >= col("n_a") + col("n_b"))
      .select(col("doc_b").as("doc_id"))
      .distinct()
    val fl = col("pred_lang") === "und"
    val fq = col("quality") < qualityFloor
    val fd = col("is_dup") === 1L
    val nf = (fl.cast("int") + fq.cast("int") + fd.cast("int")).as("n_fails")
    features
      .join(dupIds.withColumn("is_dup", lit(1L)), Seq("doc_id"), "left")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(0L)))
      .select(fl.as("fl"), fq.as("fq"), fd.as("fd"), nf)
      .agg(
        count(lit(1)).as("n_total"),
        sum(col("fl").cast("long")).as("n_lang_und"),
        sum(col("fq").cast("long")).as("n_low_quality"),
        sum(col("fd").cast("long")).as("n_near_dup"),
        sum((col("fl") && col("n_fails") === 1).cast("long")).as("n_only_lang"),
        sum((col("fq") && col("n_fails") === 1).cast("long")).as("n_only_quality"),
        sum((col("fd") && col("n_fails") === 1).cast("long")).as("n_only_dup"),
        sum((col("n_fails") >= 2).cast("long")).as("n_multi_rule"),
        sum((col("n_fails") === 0).cast("long")).as("n_kept"))
  }

  /** Regexes shared by q195's engine and oracle sides (Java and RE2
    * agree on this subset: classes, bounded repeats, no backrefs).
    */
  private val piiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val piiPhoneRe = "\\+1-555-[0-9]{4}"
  private val piiIpRe = "([0-9]{1,3}\\.){3}[0-9]{1,3}"

  /** PII DETECT-AND-REDACT — the scrub every training corpus passes
    * before anything else sees it: per-class match counts (email,
    * phone, IPv4) and the redacted text, aggregated per language with
    * a RESIDUAL check (re-running detection on the redacted text must
    * find nothing — computed, not assumed). The synthetic corpus is
    * digit-free, so the PII is INJECTED deterministically from doc_id
    * (`% 3 != 0` docs get one of each class; the rest stay clean) with
    * byte-identical synthesis on the oracle side — detection counts,
    * redacted lengths, and the clean-doc split all ride the hash. One
    * codegen'd scan (regexp built-ins, no UDF), then a ~languages-row
    * aggregate: at 100 TB this is a map-only pass whose cost is the
    * regex automaton per byte, the cheapest shape a scrub can have.
    */
  private def q195(s: SparkSession, d: String): DataFrame = {
    val synth = Tables.documents(s, d).withColumn("t",
      when(col("doc_id") % 3 =!= 0,
        concat(col("text"), lit(" reach user"), col("doc_id").cast("string"),
          lit("@mail.example.org or +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" at 192.168."), (col("doc_id") % 256).cast("string"),
          lit("."), ((col("doc_id") * 7) % 256).cast("string")))
        .otherwise(col("text")))
    val red = synth
      .withColumn("ne", regexp_count(col("t"), lit(piiEmailRe)).cast("long"))
      .withColumn("np", regexp_count(col("t"), lit(piiPhoneRe)).cast("long"))
      .withColumn("ni", regexp_count(col("t"), lit(piiIpRe)).cast("long"))
      .withColumn("red", regexp_replace(regexp_replace(regexp_replace(col("t"),
        piiEmailRe, "<EMAIL>"), piiPhoneRe, "<PHONE>"), piiIpRe, "<IP>"))
    red.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("ne") + col("np") + col("ni") > 0, 1)).as("docs_with_pii"),
        sum(col("ne")).as("n_emails"),
        sum(col("np")).as("n_phones"),
        sum(col("ni")).as("n_ips"),
        sum(length(col("red")).cast("long")).as("redacted_len"),
        count(when(regexp_count(col("red"), lit(piiEmailRe))
          + regexp_count(col("red"), lit(piiPhoneRe))
          + regexp_count(col("red"), lit(piiIpRe)) > 0, 1)).as("n_residual_docs"))
      .orderBy(col("lang"))
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q195_pii_scrub", q195, Some(
      s"""WITH p AS (SELECT lang,
         |    CASE WHEN doc_id % 3 <> 0 THEN text || ' reach user'
         |      || CAST(doc_id AS VARCHAR) || '@mail.example.org or +1-555-'
         |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         |      || ' at 192.168.' || CAST(doc_id % 256 AS VARCHAR)
         |      || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
         |    ELSE text END AS t
         |  FROM documents),
         |r AS (SELECT lang,
         |    len(regexp_extract_all(t, '$piiEmailRe')) AS ne,
         |    len(regexp_extract_all(t, '$piiPhoneRe')) AS np,
         |    len(regexp_extract_all(t, '$piiIpRe')) AS ni,
         |    regexp_replace(regexp_replace(regexp_replace(t,
         |      '$piiEmailRe', '<EMAIL>', 'g'),
         |      '$piiPhoneRe', '<PHONE>', 'g'),
         |      '$piiIpRe', '<IP>', 'g') AS red
         |  FROM p)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(CASE WHEN ne + np + ni > 0 THEN 1 END) AS BIGINT)
         |    AS docs_with_pii,
         |  CAST(sum(ne) AS BIGINT) AS n_emails,
         |  CAST(sum(np) AS BIGINT) AS n_phones,
         |  CAST(sum(ni) AS BIGINT) AS n_ips,
         |  CAST(sum(length(red)) AS BIGINT) AS redacted_len,
         |  CAST(count(CASE WHEN len(regexp_extract_all(red, '$piiEmailRe'))
         |    + len(regexp_extract_all(red, '$piiPhoneRe'))
         |    + len(regexp_extract_all(red, '$piiIpRe')) > 0 THEN 1 END) AS BIGINT)
         |    AS n_residual_docs
         |FROM r GROUP BY lang ORDER BY lang""".stripMargin)),
    QueryDef("q143_curation_attribution", q143, Some(
      s"""WITH lang AS (SELECT doc_id, pred_lang FROM (${langDef.oracle.get})),
         |q AS (SELECT doc_id, quality FROM (${qualityDef.oracle.get})),
         |dd AS (SELECT doc_id, is_dup FROM (${dedupDef.oracle.get})),
         |f AS (SELECT
         |        CASE WHEN pred_lang = 'und' THEN 1 ELSE 0 END AS fl,
         |        CASE WHEN quality < $qualityFloor THEN 1 ELSE 0 END AS fq,
         |        CASE WHEN is_dup = 1 THEN 1 ELSE 0 END AS fd
         |      FROM lang l JOIN q ON q.doc_id = l.doc_id JOIN dd ON dd.doc_id = l.doc_id)
         |SELECT count(*) AS n_total,
         |  CAST(sum(fl) AS BIGINT) AS n_lang_und,
         |  CAST(sum(fq) AS BIGINT) AS n_low_quality,
         |  CAST(sum(fd) AS BIGINT) AS n_near_dup,
         |  CAST(sum(CASE WHEN fl = 1 AND fl + fq + fd = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_only_lang,
         |  CAST(sum(CASE WHEN fq = 1 AND fl + fq + fd = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_only_quality,
         |  CAST(sum(CASE WHEN fd = 1 AND fl + fq + fd = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_only_dup,
         |  CAST(sum(CASE WHEN fl + fq + fd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_multi_rule,
         |  CAST(sum(CASE WHEN fl + fq + fd = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_kept
         |FROM f""".stripMargin)),
    QueryDef("q117_fuzzy_name_match", q117, Some(
      s"""WITH names AS (SELECT p_name, count(*) AS n_parts,
         |         list_extract(string_split(p_name, ' '), -1) AS noun
         |       FROM part GROUP BY p_name),
         |c AS (SELECT * FROM (
         |        SELECT *, count(*) OVER (PARTITION BY noun) AS block_n FROM names)
         |      WHERE block_n <= $maxNameBlock)
         |SELECT a.p_name AS name_a, b.p_name AS name_b,
         |  CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
         |  a.n_parts AS n_a, b.n_parts AS n_b
         |FROM c a JOIN c b ON a.noun = b.noun AND a.p_name < b.p_name
         |WHERE levenshtein(a.p_name, b.p_name) <= 2
         |ORDER BY name_a, name_b""".stripMargin)),
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
