package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class StreamingSpec extends SparkTestBase {

  test("hour window counts equal the batch equivalent") {
    val streamed = Streaming.stream_hour_counts(spark, sf0001)
    val batch = Tables.load(spark, sf0001, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").cast("timestamp_ntz").as("h"),
        col("event_type"), col("cnt"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty)
  }

  test("session windows: totals partition all events") {
    val total = Tables.load(spark, sf0001, "events").count()
    val sessions = Streaming.stream_sessions(spark, sf0001)
    val inSessions = sessions
      .agg(sum("n_events")).collect().head.getLong(0)
    assert(inSessions == total)
    // session bounds sane: start < end, gap rule respected within a user
    val rows = sessions.collect()
    assert(rows.forall(r =>
      r.getAs[java.time.LocalDateTime]("session_start")
        .isBefore(r.getAs[java.time.LocalDateTime]("session_end"))))
  }

  test("stateful session count equals session-window session count") {
    val byState = Streaming.stream_state_sessions(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byWindow = Streaming.stream_sessions(spark, sf0001)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byState == byWindow)
  }
}
