package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal
import graft.streaming.EventStreams

/** Multimodal + event-sessionization queries. The streaming transforms in
  * [[graft.streaming.EventStreams]] are exercised here in BATCH mode (the
  * Structured Streaming unification makes that the same code path); the
  * streaming-mode equivalence is asserted in StreamingSpec.
  */
object Extras {

  /** Batched stub-decode feature extraction over binary media columns. */
  private def q31(s: SparkSession, d: String): DataFrame =
    Multimodal
      .extractFeatures(Multimodal.fromDocuments(Tables.documents(s, d)))
      .toDF()
      .orderBy(col("media_id"))

  /** Event-time session windows (8h gap) per user — the same transform
    * the streaming path runs.
    */
  private def q32(s: SparkSession, d: String): DataFrame =
    EventStreams.sessionWindows(Tables.events(s, d))
      .select(
        col("user_id"), col("session_start"), col("n_events"),
        round(col("session_value"), 2).as("session_value"))
      .orderBy(col("user_id"), col("session_start"))

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q31_multimodal_features", q31, Some {
      // encode() -> UTF-8 bytes; the corpus is ASCII so char ops == byte
      // ops (and the Spark side operates on the same UTF-8 payload bytes).
      val checksum = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(string_split(substr(text, 1, 64), ''), c -> CAST(ascii(c) AS BIGINT))), " +
        "(a, b) -> a + b)"
      s"""SELECT doc_id AS media_id, 'image' AS kind,
         |octet_length(encode(text)) AS n_bytes,
         |octet_length(encode(text)) % 640 AS width,
         |(octet_length(encode(text)) * 7) % 480 AS height,
         |$checksum AS checksum64
         |FROM documents ORDER BY media_id""".stripMargin
    }),
    QueryDef("q32_session_windows", q32, Some {
      val gapUs = 8L * 3600 * 1000000
      s"""WITH e AS (SELECT user_id, epoch_ns(ts) // 1000 AS us, value FROM events),
         |o AS (SELECT user_id, us, value,
         |        CASE WHEN lag(us) OVER w IS NULL OR us - lag(us) OVER w >= $gapUs
         |             THEN 1 ELSE 0 END AS brk
         |      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
         |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY us
         |        ROWS UNBOUNDED PRECEDING) AS sid FROM o)
         |SELECT user_id, min(us) // 1000000 AS session_start,
         |  count(*) AS n_events, round(sum(value), 2) AS session_value
         |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin
    }),
  )
}
