package graft.model

/** Typed row models for the reference-shaped pipelines (reference
  * utils/Beans.scala:5-21 — all-String fields by design there; kept
  * String here for output parity, with `cnt: Long` the only numeric,
  * exactly as Beans.scala:21).
  */
final case class CdcEnvelope(
    database: String, table: String, tp: String, ts: String,
    data: Map[String, String])

/** ODS routing envelope (reference dwd/ProcessODSDataToDWD.scala:53-67). */
final case class OdsEnvelope(
    iceberg_ods_tbl_name: String, kafka_dwd_topic: String, data: String)

/** DWD generic record (reference Beans.scala `DwdInfo`). */
final case class DwdInfo(
    iceberg_ods_tbl_name: String, kafka_dwd_topic: String,
    id: String, user_id: String, ip: String,
    login_tm: String, logout_tm: String)

/** User login fact (reference Beans.scala `UserLogin`). */
final case class UserLogin(
    user_id: String, ip: String, login_tm: String, logout_tm: String)

/** Enriched login wide row (reference Beans.scala `UserLoginWideInfo`). */
final case class UserLoginWideInfo(
    user_id: String, ip: String, login_tm: String, logout_tm: String,
    member_growth_score: String, member_level: String, member_points: String,
    balance: String, gmt_create: String, province: String, city: String,
    area: String, address: String, phone_number: String, consignee_name: String)

/** Product visit window count (reference Beans.scala:21 — `cnt: Long` is
  * the reference's only non-String field). */
final case class ProductVisitInfo(
    current_dt: String, window_start: String, window_end: String,
    first_cat: String, second_cat: String, product: String, cnt: Long)

/** Session state for gap-based sessionization (mapGroupsWithState). */
final case class SessionState(
    sessionId: Long, nEvents: Long, startSec: Long, lastSec: Long)
final case class SessionOut(
    user_id: Long, session_id: Long, n_events: Long,
    start_sec: Long, end_sec: Long)
