package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `timestamp with time zone` — instants carrying a PER-VALUE time zone
  * (reference StandardTypes.java:48, common SqlTimestampWithTimeZone and
  * DateTimeEncoding.java, which pack millisUtc + a TimeZoneKey into one
  * long; MAIN/operator/scalar/DateTimeFunctions.java for the field
  * extractors). The fn_timetz struct design's timestamp twin.
  *
  * Engine representation: a struct tagged by field names, `tstz_utc`
  * first (epoch millis UTC — the reference's millisUtc) and `tstz_zone`
  * second (the zone ID string: a named region zone with full DST rules,
  * or a fixed '+HH:MM' offset — the reference's TimeZoneKey keeps named
  * zones too, which is why extraction must be DST-aware). Struct
  * comparison is lexicographic by field order, so the natural ordering
  * IS the reference's instant ordering; the zone string is a
  * deterministic tie-break the reference doesn't apply (the reference
  * compares equal instants equal across zones — the total-order
  * refinement is pinned in TimestampTzSpec, the same convention as
  * TIME WITH TIME ZONE).
  *
  * All local-field math is session-zone-independent: the value's offset
  * at its own instant comes from `from_utc_timestamp(...).cast(long)`
  * (reading the shifted instant directly, not a session rendering), and
  * calendar fields derive from epoch-day arithmetic on DATE values.
  * Everything is `org.apache.spark.sql.functions` compositions —
  * whole-stage-codegen'd, no UDFs, safe in 100 TB hot paths. */
object TimestampTzFunctions {
  val UtcField = "tstz_utc"
  val ZoneField = "tstz_zone"
  private val DayMs = 86400000L

  /** Structural type tag (the repo's struct-tagging convention). */
  def isTimestampTz(dt: DataType): Boolean = dt match {
    case s: StructType => s.fieldNames.sameElements(Array(UtcField, ZoneField))
    case _ => false
  }

  def make(utcMillis: Column, zone: Column): Column =
    struct(utcMillis.cast("long").as(UtcField),
      zone.cast("string").as(ZoneField))

  /** DST-AWARE offset minutes of `zone` at the instant `utcMs` — named
    * zones resolve through their rules at that instant (reference
    * DateTimeZone.getOffset(millisUtc)). Unknown zone ids raise. */
  def offsetMinAt(utcMs: Column, zone: Column): Column = {
    val u = utcMs.cast("long")
    ((from_utc_timestamp(timestamp_millis(u), zone).cast("long") -
      floor(u.cast("double") / 1000d).cast("long")) / 60L).cast("int")
  }
  def offsetMin(t: Column): Column =
    offsetMinAt(t.getField(UtcField), t.getField(ZoneField))

  /** Local wall-clock millis since epoch (utc + offset-at-instant). */
  def localMs(t: Column): Column =
    t.getField(UtcField).cast("long") + offsetMin(t).cast("long") * 60000L

  /** Local calendar date via epoch-day arithmetic — zone-independent
    * (DATE carries no zone). */
  private def localDate(t: Column): Column =
    date_add(to_date(lit("1970-01-01")),
      floor(localMs(t).cast("double") / DayMs).cast("int"))
  private def msOfDay(t: Column): Column = pmod(localMs(t), lit(DayMs))

  // local-field extraction (reference DateTimeFunctions yearFromTimestamp-
  // WithTimeZone etc. — fields of the wall clock in the VALUE's zone)
  def yearTz(t: Column): Column = year(localDate(t))
  def quarterTz(t: Column): Column = quarter(localDate(t))
  def monthTz(t: Column): Column = month(localDate(t))
  def dayTz(t: Column): Column = dayofmonth(localDate(t))
  def hourTz(t: Column): Column = (msOfDay(t) / 3600000L).cast("int")
  def minuteTz(t: Column): Column =
    ((msOfDay(t) / 60000L).cast("long") % 60L).cast("int")
  def secondTz(t: Column): Column =
    ((msOfDay(t) / 1000L).cast("long") % 60L).cast("int")
  def millisecondTz(t: Column): Column = (msOfDay(t) % 1000L).cast("int")

  /** Offset hour/minute pair — both signed (reference
    * timezoneHourFromTimestampWithTimeZone), DST-aware for named zones. */
  def timezoneHour(t: Column): Column =
    (offsetMin(t).cast("double") / 60d).cast("long")
  def timezoneMinute(t: Column): Column =
    offsetMin(t).cast("long") - timezoneHour(t) * 60L

  /** Parse 'yyyy-MM-dd[ T]H:MM[:SS[.fraction]][ zone]'. No zone = the
    * session zone (the reference's varchar→tstz cast); the datetime text
    * is WALL TIME in that zone (make_timestamp applies the zone's rules,
    * DST gaps included); fraction digits beyond millis round half-up
    * (reference rescale(..., 3)). Malformed text raises
    * (TRY-recoverable). */
  def parse(s: Column): Column = {
    val str = trim(s)
    val re = "^(\\d{4})-(\\d{2})-(\\d{2})[ T](\\d{1,2}):(\\d{2})" +
      "(?::(\\d{2})(?:\\.(\\d+))?)?" +
      "(?:\\s*([+-]\\d{1,2}:?\\d{2})|\\s+([^\\s']+))?$"
    def g(i: Int) = regexp_extract(str, re, i)
    val h = g(4).cast("long")
    val mi = g(5).cast("long")
    val se = when(g(6) === "", 0L).otherwise(g(6).cast("long"))
    val frac = g(7)
    val ms = when(frac === "", 0L)
      .otherwise(((rpad(substring(frac, 1, 4), 4, "0").cast("long") + 5L) / 10L)
        .cast("long"))
    val zone = when(g(8) =!= "", g(8))
      .otherwise(when(g(9) =!= "", g(9)).otherwise(current_timezone()))
    val shapeOk = str.rlike(re) && h < 24 && mi < 60 && se < 60
    // wall fields in `zone` → instant (session-zone-independent: the
    // 7-arg make_timestamp takes the zone explicitly)
    val instant = call_function("make_timestamp",
      g(1).cast("int"), g(2).cast("int"), g(3).cast("int"),
      h.cast("int"), mi.cast("int"),
      se.cast("decimal(16,6)"), zone)
    val utcMs = unix_millis(instant) + ms
    val checked = when(
      assert_true((shapeOk && instant.isNotNull) || str.isNull,
        concat(lit("Invalid timestamp with time zone: '"), str, lit("'")))
        .isNull, utcMs)
    when(str.isNull,
      lit(null).cast(s"struct<$UtcField:bigint,$ZoneField:string>"))
      .otherwise(make(checked, zone))
  }

  /** Reference varchar rendering: 'yyyy-MM-dd HH:mm:ss.SSS <zone id>'
    * (the reference printer prints the wall time in the value's zone
    * followed by the zone ID). */
  def format(t: Column): Column = {
    val md = msOfDay(t)
    concat(
      date_format(localDate(t), "yyyy-MM-dd"), lit(" "),
      format_string("%02d:%02d:%02d.%03d ",
        (md / 3600000L).cast("long"), (md / 60000L).cast("long") % 60L,
        (md / 1000L).cast("long") % 60L, md % 1000L),
      t.getField(ZoneField))
  }

  /** Same instant, new zone (SQL AT TIME ZONE for tstz inputs). */
  def atTimezone(t: Column, zone: Column): Column =
    make(t.getField(UtcField), zone)

  /** with_timezone(timestamp, zone): the naive timestamp's wall reading
    * declared as zone-local (reference DateTimeFunctions.withTimezone). */
  def withTimezone(ts: Column, zone: Column): Column =
    make(unix_millis(to_utc_timestamp(ts.cast("timestamp"), zone)), zone)

  /** to_unixtime(tstz) — seconds since epoch as double (zone ignored:
    * the instant is the value). */
  def toUnixtime(t: Column): Column =
    t.getField(UtcField).cast("double") / 1000d

  /** Instant as a Spark timestamp (CAST(tstz AS TIMESTAMP): the instant,
    * rendered by Spark in the session zone — the reference's cast). */
  def toTimestamp(t: Column): Column =
    timestamp_millis(t.getField(UtcField).cast("long"))

  /** now() in the session zone (reference returns tstz). */
  def currentTimestampTz(): Column =
    make(unix_millis(current_timestamp()), current_timezone())
}
