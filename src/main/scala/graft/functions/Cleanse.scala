package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar cleanse/format function library — SURVEY §2.8.
  *
  * All pure `Column` expressions (whole-stage-codegen'd); no UDFs. Each
  * maps a reference utility:
  *   - F1/F2: utils/DateUtil.scala:22-41 (epoch-millis string →
  *     formatted datetime/date, null → epoch sentinel)
  *   - F3: utils/DateUtil.scala:16-20 (current date string)
  *   - F4: utils/MyStringUtil.scala:6-8 (null-or-empty test)
  *   - F6: dws/ProduceBrowseLogToDWS.scala:209 (date part of datetime)
  *   - F7: dm/ProcessBrowseLogInfoToDM.scala:72 (composite `$`-key)
  *   - F9: ods/ProduceKafkaLogDataToODS.scala:67 (map payload access)
  */
object Cleanse {

  val DatetimeSentinel = "1970-01-01 00:00:00"
  val DateSentinel     = "1970-01-01"

  /** F1: epoch-millis (string or numeric) → "yyyy-MM-dd HH:mm:ss",
    * null → 1970 sentinel. Reference DateUtil.scala:22-30. */
  def epochMillisToDateTime(c: Column): Column =
    coalesce(
      from_unixtime((c.cast("long") / lit(1000)).cast("long"), "yyyy-MM-dd HH:mm:ss"),
      lit(DatetimeSentinel))

  /** F2: epoch-millis → "yyyy-MM-dd", null → sentinel. DateUtil.scala:33-41. */
  def epochMillisToDate(c: Column): Column =
    coalesce(
      from_unixtime((c.cast("long") / lit(1000)).cast("long"), "yyyy-MM-dd"),
      lit(DateSentinel))

  /** Timestamp column → "yyyy-MM-dd HH:mm:ss" string with null sentinel
    * (the rebuild's typed-timestamp variant of F1). */
  def formatDateTime(c: Column): Column =
    coalesce(date_format(c, "yyyy-MM-dd HH:mm:ss"), lit(DatetimeSentinel))

  /** Timestamp column → "yyyy-MM-dd" string with null sentinel. */
  def formatDate(c: Column): Column =
    coalesce(date_format(c, "yyyy-MM-dd"), lit(DateSentinel))

  /** F3: wall-clock current date "yyyy-MM-dd". DateUtil.scala:16-20. */
  def currentDateStr(): Column = date_format(current_date(), "yyyy-MM-dd")

  /** F4: null-or-empty string test. MyStringUtil.scala:6-8. */
  def isNullOrEmpty(c: Column): Column = c.isNull || c === lit("")

  /** F6: date part of a "yyyy-MM-dd HH:mm:ss" string. */
  def datePart(c: Column): Column = substring(c, 1, 10)

  /** F7: composite `$`-separated grouping key (kept only for byte parity
    * with intermediates; group by the raw columns instead). */
  def compositeKey(cols: Column*): Column = concat_ws("$", cols: _*)

  /** F9: payload map access, `data['k']` → element_at. */
  def payload(m: Column, key: String): Column = element_at(m, key)

  /** P8: reparse a Flink-`Row.toString`-style map literal
    * `"{k=v, k2=v2}"` back into map<string,string>, tolerating empty
    * values (`"k="`). Reference CommonUtil.scala:29-39 /
    * ProduceKafkaLogDataToODS.scala:91-100 — an artifact of
    * stringifying the payload; the rebuild never stringifies, but the
    * function exists for parity with data written by the reference. */
  def parseRowMap(c: Column): Column =
    str_to_map(regexp_replace(c, "^\\{|\\}$", ""), lit(", "), lit("="))

  /** Tumbling-window start, as an epoch-floor. Deterministic analog of
    * `window(col, "N seconds").start` usable identically in the DuckDB
    * oracle. */
  def windowStart(ts: Column, seconds: Int): Column =
    from_unixtime(floor(unix_timestamp(ts) / lit(seconds)) * lit(seconds),
      "yyyy-MM-dd HH:mm:ss")
}
