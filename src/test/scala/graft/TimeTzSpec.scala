package graft

import org.scalatest.funsuite.AnyFunSuite

/** `time with time zone` (functions/TimeTzFunctions.scala) — per-value
  * zone offsets. Pins the reference semantics (SqlTimeWithTimeZone /
  * DateTimeFunctions.java): local-field extraction, signed offset
  * components, instant ordering across zones with midnight wrap,
  * AT-TIME-ZONE instant preservation, named-zone offsets resolved at
  * 1970-01-01, fraction rounding to millis, and the documented
  * total-order refinement (equal instants in different zones order by
  * offset rather than comparing equal). */
class TimeTzSpec extends AnyFunSuite {
  import TestSpark._

  private def sess = graft.api.SqlSession.wrap(spark)

  private def row(sql: String) = sess.sql(sql).collect()(0)
  private def one(expr: String): Any = row(s"SELECT $expr AS v").get(0)

  test("literal, format, and local extraction") {
    val r = row(
      "SELECT graft_timetz_format(TIME '03:04:05.321 +07:09') AS s, " +
        "hour(TIME '03:04:05.321 +07:09') AS h, " +
        "minute(TIME '03:04:05.321 +07:09') AS m, " +
        "second(TIME '03:04:05.321 +07:09') AS se, " +
        "millisecond(TIME '03:04:05.321 +07:09') AS ms")
    assert(r.getString(0) == "03:04:05.321 +07:09")
    assert(r.getInt(1) == 3 && r.getInt(2) == 4 && r.getInt(3) == 5)
    assert(r.getLong(4) == 321L)
  }

  test("builtin fallback untouched: hour/minute/second on time and timestamp") {
    val r = row("SELECT hour(TIME '23:01:02') AS h1, " +
      "minute(TIMESTAMP '2021-06-15 12:34:56') AS m1, " +
      "second(TIME '23:01:02') AS s1, " +
      "millisecond(TIMESTAMP '2021-06-15 12:34:56.789') AS ms1")
    assert(r.getInt(0) == 23 && r.getInt(1) == 34 && r.getInt(2) == 2)
    assert(r.getLong(3) == 789L)
  }

  test("signed timezone_hour / timezone_minute (reference -08:30 → -8, -30)") {
    val r = row("SELECT timezone_hour(TIME '10:00:00 -08:30') AS th, " +
      "timezone_minute(TIME '10:00:00 -08:30') AS tm, " +
      "timezone_hour(TIME '10:00:00 +05:30') AS th2, " +
      "timezone_minute(TIME '10:00:00 +05:30') AS tm2")
    assert(r.getLong(0) == -8L && r.getLong(1) == -30L)
    assert(r.getLong(2) == 5L && r.getLong(3) == 30L)
  }

  test("at_timezone keeps the instant; rendering wraps across midnight") {
    // 01:00 +05:00 is 20:00 UTC of the PREVIOUS day-cycle: the reference
    // keeps the unnormalized instant and its printer wraps mod 24h
    assert(one("graft_timetz_format(at_timezone(TIME '01:00:00 +05:00', " +
      "'+00:00'))") == "20:00:00.000 +00:00")
    // same instant compares equal on the utc field, so ordering across the
    // two spellings is by offset only (documented total-order refinement);
    // note 'TIME 20:00 +00:00' is NOT the same unnormalized instant as
    // '01:00 +05:00' — like the reference's millisUtc they differ by 24h
    val r = row("SELECT TIME '01:00:00 +05:00' = at_timezone(TIME " +
      "'01:00:00 +05:00', '+05:00') AS eq, " +
      "at_timezone(TIME '01:00:00 +05:00', '+00:00') < " +
      "TIME '01:00:00 +05:00' AS lt, " +
      "TIME '01:00:00 +05:00' < TIME '20:00:00 +00:00' AS lt24")
    assert(r.getBoolean(0), "same instant same zone is equal")
    assert(r.getBoolean(1), "equal instants order by offset (refinement)")
    assert(r.getBoolean(2), "unnormalized instants keep the reference's " +
      "24h separation")
  }

  test("instant ordering across zones (reference compares millisUtc)") {
    // 23:30 -01:00 = 00:30 UTC(+1d); 01:00 +05:00 = 20:00 UTC(-1d)
    assert(one("TIME '01:00:00 +05:00' < TIME '23:30:00 -01:00'") ==
      true)
    assert(one("TIME '12:00:00 +00:00' < TIME '12:00:00 -00:30'") == true)
  }

  test("named zones resolve at 1970-01-01, like the reference's parse") {
    assert(one("timezone_hour(TIME '10:00:00 America/Los_Angeles')") == -8L)
    assert(one("timezone_minute(TIME '10:00:00 Asia/Kolkata')") == 30L)
    assert(one("graft_timetz_format(TIME '10:00:00 UTC')") ==
      "10:00:00.000 +00:00")
  }

  test("CAST dispatch: varchar (glued offset, session zone), timestamp") {
    assert(one("graft_timetz_format(CAST('12:00:00+05:30' AS TIME WITH " +
      "TIME ZONE))") == "12:00:00.000 +05:30")
    // no zone in the text → session zone (UTC in tests)
    assert(one("graft_timetz_format(CAST('07:08:09' AS TIME WITH TIME " +
      "ZONE))") == "07:08:09.000 +00:00")
    assert(one("graft_timetz_format(CAST(TIMESTAMP '2021-06-15 01:02:03' " +
      "AS TIME WITH TIME ZONE))") == "01:02:03.000 +00:00")
    assert(one("CAST(CAST(NULL AS STRING) AS TIME WITH TIME ZONE)") == null)
  }

  test("fraction digits beyond millis round half-up (reference rescale)") {
    assert(one("graft_timetz_format(TIME '00:00:01.1235 +00:00')") ==
      "00:00:01.124 +00:00")
    assert(one("graft_timetz_format(TIME '00:00:01.1234 +00:00')") ==
      "00:00:01.123 +00:00")
    assert(one("graft_timetz_format(TIME '00:00:01.5 +00:00')") ==
      "00:00:01.500 +00:00")
  }

  test("malformed text raises; TRY recovers; current_time is in range") {
    val e = intercept[Exception](
      sess.sql("SELECT CAST('not a time' AS TIME WITH TIME ZONE)").collect())
    assert(e.getMessage.contains("time with time zone") ||
      e.getMessage.contains("ASSERT"))
    assert(one("TRY(CAST('99:99:99 +05:00' AS TIME WITH TIME ZONE))") == null)
    val r = row("SELECT hour(current_time) AS h, " +
      "timezone_hour(current_time) AS th")
    assert(r.getInt(0) >= 0 && r.getInt(0) <= 23)
    assert(r.getLong(1) == 0L, "session zone is UTC in tests")
  }
}
