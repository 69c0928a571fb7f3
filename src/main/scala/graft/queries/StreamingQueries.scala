package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Kernel
import graft.streaming.StreamingSession

/** Streaming-operator queries, exercised in batch mode (session_window has
  * identical semantics in batch and streaming — the streaming path itself is
  * covered by StreamingSpec with a rate/memory source).
  */
object StreamingQueries {

  private def t(s: SparkSession, dir: String, n: String) = Kernel.table(s, dir, n)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_sessionize" -> ((s, dir) => {
      val e = t(s, dir, "events")
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
      StreamingSession.sessionizeStream(e, Seq("user_id"), "ts", "300 seconds")
    }),

    // streaming exact dedup, batch-mode twin: earliest event per
    // (user_id, event_type) — the steady-state outcome of
    // dropDuplicatesWithinWatermark, deterministically
    "q_stream_dedup" -> ((s, dir) => {
      val e = t(s, dir, "events").filter(col("user_id").isNotNull &&
        col("ts").isNotNull && col("event_type").isNotNull)
      graft.streaming.StreamingDedup.dedupStream(
        e, Seq("user_id", "event_type"), "ts")
    }),

    // streaming near-dup suppression, batch-mode twin: the SAME
    // flatMapGroupsWithState operator runs over the batch frame (one
    // invocation per block group, rows sorted by doc id inside `judge`),
    // so a doc is a dup iff some EARLIER doc shares a simhash block within
    // maxHamming — deterministic and SQL-expressible
    "q_stream_neardup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      graft.streaming.StreamingNearDup.verdicts(docs, "doc_id", "text")
        .groupBy(col("docId").as("doc_id"))
        .agg(max(col("isDup").cast("int")).as("is_dup"))
    })
  )

  val oracle: Map[String, String] = Map(
    // gaps-and-islands mirror of session_window: a session merges events
    // strictly closer than the gap to the previous event; window_end =
    // last event + gap
    "q_stream_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, ts FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |o AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 300000000
        |         THEN 1 ELSE 0 END AS b
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (
        |  SELECT *, sum(b) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM o)
        |SELECT user_id,
        |  min(ts) AS window_start,
        |  max(ts) + INTERVAL 300 SECOND AS window_end,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  min(ts) AS session_start,
        |  max(ts) AS session_end
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // first event per key: row_number mirror of min_by(payload, (ts, ...))
    // — (ts, event_id) is unique within a key, so the longer Spark
    // tie-break struct never gets past its second field
    "q_stream_dedup" ->
      """WITH e AS (
        |  SELECT * FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY ts, event_id) AS rn
        |  FROM e)
        |SELECT user_id, event_type, event_id, ts, value, props
        |FROM r WHERE rn = 1""".stripMargin,

    // pigeonhole-blocked prior-doc near-dup: doc b is a dup iff some a < b
    // shares one of the 4 simhash 16-bit blocks AND the full 64-bit hamming
    // distance is <= 3 (the simhash CTE mirrors Text.simhash64 bit-for-bit)
    "q_stream_neardup" ->
      s"""WITH ${DedupQueries.simhashCte},
         |blocked AS (
         |  SELECT id, sim, t.b AS b, (sim >> (t.b * 16)) & 65535 AS blk
         |  FROM sh CROSS JOIN (SELECT unnest(range(0, 4)) AS b) t),
         |dup AS (
         |  SELECT DISTINCT y.id
         |  FROM blocked x JOIN blocked y ON x.b = y.b AND x.blk = y.blk
         |    AND x.id < y.id
         |  WHERE bit_count(xor(x.sim, y.sim)) <= 3)
         |SELECT s.id AS doc_id,
         |  CAST(s.id IN (SELECT id FROM dup) AS INT) AS is_dup
         |FROM sh s""".stripMargin
  )
}
