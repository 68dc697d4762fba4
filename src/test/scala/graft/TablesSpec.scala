package graft

import org.apache.spark.sql.functions._

/** The `events.ts` normalization contract (Tables.events): epoch-nanos
  * BIGINT regardless of how the driver's generator wrote the parquet
  * column, and — for the TIMESTAMP_NTZ form — regardless of what
  * `spark.sql.session.timeZone` holds when the lazy plan finally executes
  * (the round-5 advice hazard: the old NTZ→TIMESTAMP cast reinterpreted
  * under the EXECUTION-time session timezone, so anything resetting the
  * timezone between plan build and collect silently shifted every ts).
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  /** Write an events.parquet whose ts column is TIMESTAMP_NTZ carrying
    * `wall` as the wall-clock, return the sfDir.
    */
  private def ntzEventsDir(wall: String*): String = {
    val dir = tmpDir("tables-ntz")
    wall.zipWithIndex.toDF("w", "i")
      .select(
        col("i").cast("long").as("event_id"),
        to_timestamp_ntz(col("w")).as("ts"),
        col("i").cast("long").as("user_id"),
        lit("click").as("event_type"),
        lit(1.0).as("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("NTZ ts is epoch-nanos of the wall clock read as UTC") {
    val dir = ntzEventsDir("2026-01-02 03:04:05.678901")
    val got = Tables.events(spark, dir).select("ts").as[Long].head()
    // 2026-01-02T03:04:05.678901Z epoch micros, times 1000
    val want = java.time.Instant.parse("2026-01-02T03:04:05.678901Z")
    assert(got == want.getEpochSecond * 1000000000L + want.getNano)
  }

  test("NTZ ts does not shift when session TZ changes after plan build") {
    val dir = ntzEventsDir("2026-01-02 03:04:05", "1970-01-01 00:00:00")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      // build the plan under UTC…
      val plan = Tables.events(spark, dir).select("ts")
      val utc = plan.as[Long].collect().sorted
      // …then yank the session timezone out from under the LAZY plan and
      // execute again: a cast-based conversion would shift by 9h
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val tokyo = plan.as[Long].collect().sorted
      assert(tokyo.sameElements(utc),
        s"ts shifted under a mid-plan session-TZ change: " +
          s"${utc.toSeq} vs ${tokyo.toSeq}")
      assert(utc.head == 0L) // epoch wall-clock ⇒ epoch instant
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("micros-TIMESTAMP ts normalizes to the same epoch-nanos contract") {
    val dir = tmpDir("tables-us")
    Seq((0L, java.sql.Timestamp.from(
        java.time.Instant.parse("2026-01-02T03:04:05.678901Z"))))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir).select("ts").as[Long].head()
    val want = java.time.Instant.parse("2026-01-02T03:04:05.678901Z")
    assert(got == want.getEpochSecond * 1000000000L + want.getNano)
  }
}
