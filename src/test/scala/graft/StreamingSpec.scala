package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import graft.streaming.StreamingSession

/** The streaming path proper: session_window aggregation over a MemoryStream
  * source, incrementally processed — the semantics the batch-mode oracle
  * (q_stream_sessionize) verifies must hold when fed as a stream.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("sessionizeStream aggregates sessions incrementally over a stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val source = MemoryStream[(Long, Timestamp)]
    val df = source.toDF().toDF("user_id", "ts")
    val sessions = StreamingSession.sessionizeStream(
      df, Seq("user_id"), "ts", "300 seconds", watermark = "1 minute")
    val query = sessions.writeStream
      .format("memory").queryName("t_sessions").outputMode("complete").start()
    try {
      def ts(s: String) = Timestamp.valueOf(s)
      source.addData((1L, ts("2021-01-01 00:00:00")),
        (1L, ts("2021-01-01 00:02:00")),   // same session
        (1L, ts("2021-01-01 01:00:00")),   // new session
        (2L, ts("2021-01-01 00:00:00")))
      query.processAllAvailable()
      val out = spark.table("t_sessions").collect()
        .map(r => (r.getLong(0), r.getAs[Long]("n_events"))).toSeq.sorted
      assert(out === Seq((1L, 1L), (1L, 2L), (2L, 1L)))
    } finally query.stop()
  }
}
