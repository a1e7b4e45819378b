package graft

import org.scalatest.funsuite.AnyFunSuite

/** `timestamp with time zone` (functions/TimestampTzFunctions.scala) —
  * per-value zones, the fn_timetz struct design's timestamp twin. Pins
  * the reference semantics (SqlTimestampWithTimeZone /
  * DateTimeEncoding.java / DateTimeFunctions.java): wall-time parse in
  * the value's zone, DST-AWARE local extraction and offset components
  * for named zones, instant ordering across zones with the documented
  * zone-string tie-break refinement, AT-TIME-ZONE instant preservation
  * with calendar carry across midnight/year, fraction rounding to
  * millis, and raise/TRY behavior for malformed input. */
class TimestampTzSpec extends AnyFunSuite {
  import TestSpark._

  private def sess = graft.api.SqlSession.wrap(spark)

  private def row(sql: String) = sess.sql(sql).collect()(0)
  private def one(expr: String): Any = row(s"SELECT $expr AS v").get(0)

  test("literal, format, and local extraction (fixed offset)") {
    val lit = "TIMESTAMP '2020-03-05 03:04:05.321 +07:09'"
    val r = row(s"SELECT graft_tstz_format($lit) AS s, " +
      s"year($lit) AS y, month($lit) AS mo, day($lit) AS d, " +
      s"hour($lit) AS h, minute($lit) AS m, second($lit) AS se, " +
      s"millisecond($lit) AS ms, quarter($lit) AS q, " +
      s"timezone_hour($lit) AS tzh, timezone_minute($lit) AS tzm")
    assert(r.getString(0) == "2020-03-05 03:04:05.321 +07:09")
    assert(r.getInt(1) == 2020 && r.getInt(2) == 3 && r.getInt(3) == 5)
    assert(r.getInt(4) == 3 && r.getInt(5) == 4 && r.getInt(6) == 5)
    assert(r.getLong(7) == 321L)
    assert(r.getInt(8) == 1)
    assert(r.getLong(9) == 7L && r.getLong(10) == 9L)
  }

  test("builtin fallback untouched: year/month/day/hour on date/timestamp") {
    val r = row("SELECT year(DATE '2021-06-15') AS y, " +
      "month(TIMESTAMP '2021-06-15 12:34:56') AS mo, " +
      "day(DATE '2021-06-15') AS d, " +
      "hour(TIMESTAMP '2021-06-15 12:34:56') AS h, " +
      "quarter(DATE '2021-06-15') AS q")
    assert(r.getInt(0) == 2021 && r.getInt(1) == 6 && r.getInt(2) == 15)
    assert(r.getInt(3) == 12 && r.getInt(4) == 2)
  }

  test("instant ordering across zones; equal instants tie-break by zone") {
    // 12:00+05:00 is 07:00Z — an EARLIER instant than 12:00Z
    assert(one("TIMESTAMP '2020-01-01 12:00:00 +05:00' < " +
      "TIMESTAMP '2020-01-01 12:00:00 +00:00'") == true)
    // equal instants (12:00Z == 17:00+05:00): reference compares equal;
    // this engine's total-order refinement breaks the tie on the zone
    // string ('+00:00' < '+05:00') — documented, deterministic
    assert(one("TIMESTAMP '2020-01-01 12:00:00 +00:00' < " +
      "TIMESTAMP '2020-01-01 17:00:00 +05:00'") == true)
    assert(one("TIMESTAMP '2020-01-01 12:00:00 +00:00' = " +
      "TIMESTAMP '2020-01-01 17:00:00 +05:00'") == false)
  }

  test("DST-aware offsets for named zones (America/Los_Angeles)") {
    val r = row(
      "SELECT timezone_hour(TIMESTAMP '2021-03-13 12:00:00 America/Los_Angeles') AS winter, " +
        "timezone_hour(TIMESTAMP '2021-03-15 12:00:00 America/Los_Angeles') AS summer, " +
        "hour(TIMESTAMP '2021-03-13 12:00:00 America/Los_Angeles') AS hw, " +
        "hour(TIMESTAMP '2021-03-15 12:00:00 America/Los_Angeles') AS hs")
    assert(r.getLong(0) == -8L) // PST before the 2021-03-14 spring-forward
    assert(r.getLong(1) == -7L) // PDT after
    // local extraction returns the stated wall hour in BOTH regimes
    assert(r.getInt(2) == 12 && r.getInt(3) == 12)
  }

  test("at_timezone preserves the instant with calendar carry") {
    // UTC noon in LA summer reads 05:00 the same day
    assert(one("graft_tstz_format(at_timezone(" +
      "TIMESTAMP '2021-07-01 12:00:00 UTC', 'America/Los_Angeles'))") ==
      "2021-07-01 05:00:00.000 America/Los_Angeles")
    // backward date carry across midnight AND the year boundary
    assert(one("graft_tstz_format(at_timezone(" +
      "TIMESTAMP '2020-01-01 00:30:00 +02:00', '+00:00'))") ==
      "2019-12-31 22:30:00.000 +00:00")
    // the instant itself is unchanged
    assert(one("graft_tstz_unixtime(at_timezone(" +
      "TIMESTAMP '2021-07-01 12:00:00 UTC', 'America/Los_Angeles')) = " +
      "graft_tstz_unixtime(TIMESTAMP '2021-07-01 12:00:00 UTC')") == true)
  }

  test("CAST from varchar, timestamp, and identity") {
    assert(one("graft_tstz_format(CAST('2020-06-01 08:30:00+05:30' " +
      "AS TIMESTAMP WITH TIME ZONE))") == "2020-06-01 08:30:00.000 +05:30")
    // zoneless varchar attaches the session zone (UTC in tests)
    assert(one("graft_tstz_format(CAST('2020-06-01 08:30:00' " +
      "AS TIMESTAMP WITH TIME ZONE))") == "2020-06-01 08:30:00.000 UTC")
    // plain timestamp: the instant with the session zone
    assert(one("graft_tstz_format(CAST(TIMESTAMP '2020-06-01 08:30:00' " +
      "AS TIMESTAMP WITH TIME ZONE))") == "2020-06-01 08:30:00.000 UTC")
    assert(one("graft_tstz_format(CAST(" +
      "TIMESTAMP '2020-06-01 08:30:00 +03:00' AS TIMESTAMP WITH TIME ZONE))")
      == "2020-06-01 08:30:00.000 +03:00")
  }

  test("to-timestamp cast and unixtime read the instant") {
    assert(one("CAST(graft_tstz_to_timestamp(" +
      "TIMESTAMP '2020-06-01 08:30:00 +02:00') AS STRING)") ==
      "2020-06-01 06:30:00") // session UTC rendering of the instant
    assert(one("graft_tstz_unixtime(TIMESTAMP '1970-01-01 01:00:00 +01:00')")
      == 0.0)
  }

  test("fraction rounding, T separator, malformed input raises, TRY recovers") {
    assert(one("millisecond(TIMESTAMP '2020-01-01 00:00:00.1239 +00:00')")
      == 124L)
    assert(one("graft_tstz_format(graft_tstz('2020-01-01T06:07:08 +00:00'))")
      == "2020-01-01 06:07:08.000 +00:00")
    intercept[Exception](one("graft_tstz('not a timestamp')"))
    intercept[Exception](one("graft_tstz('2020-01-01 25:00:00 +00:00')"))
    assert(one("try_expr(graft_tstz('2020-13-45 10:00:00 +00:00'))") == null)
    assert(one("graft_tstz(CAST(NULL AS STRING))") == null)
  }

  test("DDL column-type position raises the documented dialect error") {
    // the guard fires in translate, before Spark would parse the text
    val e = intercept[UnsupportedOperationException](
      sess.sql("CREATE TABLE tstz_ddl (c TIMESTAMP WITH TIME ZONE)"))
    assert(e.getMessage.contains("timestamp with time zone"))
  }
}
