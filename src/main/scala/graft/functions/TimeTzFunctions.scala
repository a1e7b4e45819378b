package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `time with time zone` — time-of-day values carrying a PER-VALUE zone
  * offset (reference StandardTypes.java:46, common SqlTimeWithTimeZone /
  * TimeWithTimeZoneType, MAIN/operator/scalar/DateTimeFunctions.java).
  *
  * Engine representation: a struct tagged by field names, `tztz_utc`
  * first (millis since local midnight MINUS the offset — may be negative
  * or exceed one day, exactly like the reference's unnormalized
  * `millisUtc`) and `tztz_off` second (offset minutes east of UTC,
  * [-840, 840]). Struct comparison is lexicographic by field order, so
  * the natural ordering IS the reference's instant ordering; the offset
  * is a deterministic tie-break the reference doesn't apply (the
  * reference compares equal instants equal across zones — this engine's
  * total-order refinement is pinned in TimeTzSpec and matches DuckDB's
  * TIMETZ ordering). Named zones resolve their offset at 1970-01-01,
  * like the reference's parse (a time-of-day has no date to apply DST
  * to). Rendering normalizes the instant into [00:00, 24:00) through the
  * calendar, as the reference's printer does.
  *
  * All kernels are `org.apache.spark.sql.functions` compositions —
  * whole-stage-codegen'd, no UDFs, safe in 100 TB hot paths. */
object TimeTzFunctions {
  val UtcField = "tztz_utc"
  val OffField = "tztz_off"
  private val DayMs = 86400000L

  /** Structural type tag (the repo's struct-tagging convention, like the
    * geometry kernels). */
  def isTimeTz(dt: DataType): Boolean = dt match {
    case s: StructType => s.fieldNames.sameElements(Array(UtcField, OffField))
    case _ => false
  }

  /** Offset minutes east of UTC for a zone id ('+05:30', 'UTC',
    * 'America/Los_Angeles') resolved at the 1970-01-01 epoch. Unknown
    * zone ids raise (from_utc_timestamp's zone resolution), matching the
    * reference's INVALID_FUNCTION_ARGUMENT on bad zones. */
  def zoneOffsetMin(zone: Column): Column =
    (from_utc_timestamp(timestamp_seconds(lit(0)), zone).cast("long") / 60L)
      .cast("int")

  /** Build from local millis-of-day [0, 86400000) + offset minutes. */
  def make(localMs: Column, offMin: Column): Column = {
    val off = offMin.cast("int")
    struct((localMs.cast("long") - off.cast("long") * 60000L).as(UtcField),
      off.as(OffField))
  }

  /** Local (wall-clock) millis-of-day, calendar-normalized to
    * [0, 86400000) — the reference printer renders the instant in the
    * value's zone, which wraps across midnight the same way. */
  def localMs(t: Column): Column =
    pmod(t.getField(UtcField).cast("long") +
      t.getField(OffField).cast("long") * 60000L, lit(DayMs))

  /** Parse 'H:MM[:SS[.fraction]][ zone]'. No zone = session zone (the
    * reference's varchar→timetz cast uses the session zone); fraction
    * digits beyond millis round half-up (reference rescale(..., 3)).
    * Malformed text raises (TRY-recoverable). */
  def parse(s: Column): Column = {
    val str = trim(s)
    // offsets may be glued ('12:00:00+05:30', reference/DuckDB both accept);
    // named zones need the separating space
    val re = "^(\\d{1,2}):(\\d{2})(?::(\\d{2})(?:\\.(\\d+))?)?" +
      "(?:\\s*([+-]\\d{1,2}:?\\d{2})|\\s+([^\\s']+))?$"
    def g(i: Int) = regexp_extract(str, re, i)
    val h = g(1).cast("long")
    val mi = g(2).cast("long")
    val se = when(g(3) === "", 0L).otherwise(g(3).cast("long"))
    val frac = g(4)
    val ms = when(frac === "", 0L)
      .otherwise(((rpad(substring(frac, 1, 4), 4, "0").cast("long") + 5L) / 10L)
        .cast("long"))
    val zone = when(g(5) =!= "", g(5))
      .otherwise(when(g(6) =!= "", g(6)).otherwise(current_timezone()))
    val shapeOk = str.rlike(re) && h < 24 && mi < 60 && se < 60
    val checked = when(
      assert_true(shapeOk || str.isNull,
        concat(lit("Invalid time with time zone: '"), str, lit("'"))).isNull,
      (h * 3600L + mi * 60L + se) * 1000L + ms)
    when(str.isNull,
      lit(null).cast(s"struct<$UtcField:bigint,$OffField:int>"))
      .otherwise(make(checked, zoneOffsetMin(zone)))
  }

  /** Reference varchar rendering: 'HH:mm:ss.SSS +HH:MM'. */
  def format(t: Column): Column = {
    val lm = localMs(t)
    val off = t.getField(OffField).cast("long")
    val sign = when(off < 0, "-").otherwise(lit("+"))
    val aoff = abs(off)
    concat(
      format_string("%02d:%02d:%02d.%03d ",
        (lm / 3600000L).cast("long"), (lm / 60000L).cast("long") % 60L,
        (lm / 1000L).cast("long") % 60L, lm % 1000L),
      sign,
      format_string("%02d:%02d",
        (aoff / 60L).cast("long"), aoff % 60L))
  }

  // local-field extraction (reference DateTimeFunctions hourFromTime-
  // WithTimeZone etc. — local values, int like Spark's builtins so the
  // overloaded names keep one return type per name)
  def hourTz(t: Column): Column = (localMs(t) / 3600000L).cast("int")
  def minuteTz(t: Column): Column =
    ((localMs(t) / 60000L).cast("long") % 60L).cast("int")
  def secondTz(t: Column): Column =
    ((localMs(t) / 1000L).cast("long") % 60L).cast("int")
  def millisecondTz(t: Column): Column = (localMs(t) % 1000L).cast("int")

  /** Offset hour/minute pair — both carry the offset's sign (reference
    * timezoneHourFromTimeWithTimeZone: -08:30 → (-8, -30)). */
  def timezoneHour(t: Column): Column =
    (t.getField(OffField).cast("double") / 60d).cast("long")
  def timezoneMinute(t: Column): Column =
    t.getField(OffField).cast("long") - timezoneHour(t) * 60L

  /** Same instant, new zone (the SQL AT TIME ZONE construct routes here
    * for timetz inputs via the dialect's at_timezone desugar). */
  def atTimezone(t: Column, zone: Column): Column =
    struct(t.getField(UtcField).cast("long").as(UtcField),
      zoneOffsetMin(zone).as(OffField))

  /** current_time: time-of-day now, in the session zone (reference
    * DateTimeFunctions.currentTime returns TIME WITH TIME ZONE). */
  def currentTimeTz(): Column = {
    val off = zoneOffsetMin(current_timezone())
    val nowMs = unix_millis(current_timestamp())
    make(pmod(nowMs + off.cast("long") * 60000L, lit(DayMs)), off)
  }
}
