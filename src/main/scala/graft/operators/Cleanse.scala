package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Ingest-side cleansing, re-expressing the reference worker's message
  * handling as pure Catalyst `Column` expressions (whole-stage
  * codegen'd; no UDFs).
  *
  * Reference behaviors covered (see SURVEY.md §1/§2 A+B):
  *  - name sanitization        ref src/app/controllers/player.py:23-24
  *  - epoch ms→s + range gate  ref src/main.py:124-137
  *  - SMALLINT clamp >32767→0  ref src/main.py:143-152
  *  - JSON payload parsing     ref src/app/views/report.py:11-67
  *  - version dispatch v1/v2   ref src/main.py:196-216
  *  - validation + dead-letter ref src/main.py:78-96,205-216
  *
  * The reference's Kafka payload maps onto `events` (`props` holds the
  * JSON body); `customer.c_name` stands in for player names. Derived
  * fields use exact int64 arithmetic so every oracle is hash-exact.
  */
object Cleanse {

  /** lower, '_'/'-' → ' ', trim — exactly player.py:23-24. */
  def sanitizeName(c: Column): Column =
    trim(regexp_replace(lower(c), "[_-]", " "))

  /** Reference gate: reject ts outside [2020-01-01, 2025-01-01] UTC. */
  val TsMin = 1577883600L
  val TsMax = 1735736400L

  /** ts > 1e10 ⇒ milliseconds; integer-divide down to seconds.
    * WHOLE-SECOND view — the range gate and second-keyed rollups use
    * it. Sub-second precision is NOT lost by the pipeline: pair with
    * [[normalizeEpochMicros]], which carries the reference's
    * fractional milliseconds (ref src/main.py:128-129 float-divides
    * and keeps them) as exact int64 microseconds.
    */
  def normalizeEpoch(raw: Column): Column =
    when(raw > 10000000000L, floor(raw / 1000).cast("long")).otherwise(raw)

  /** The millis-preserving twin of [[normalizeEpoch]]: epoch MICROS.
    * A v2 message stamped `1700000000123` lands at exactly
    * .123000 — the same instant the reference's float divide +
    * `datetime.fromtimestamp` produces (main.py:128-129) — while
    * staying pure int64 (`ms·1000` / `s·1000000`), so every oracle is
    * hash-exact where a float path would drift. `timestamp_micros`
    * turns it into the event-time column.
    */
  def normalizeEpochMicros(raw: Column): Column =
    when(raw > 10000000000L, raw * 1000L).otherwise(raw * 1000000L)

  /** Any equipment id over SMALLINT max is a client bug ⇒ 0. */
  def clampSmallint(c: Column): Column =
    when(c > 32767L, lit(0L)).otherwise(c)

  /** Synthetic "kafka-payload" view of events: the JSON key, a raw
    * epoch (s or ms depending on parity — mirrors the mixed producers
    * the reference guards against), and gear ids from int64 math.
    */
  private def payload(s: SparkSession, dir: String): DataFrame = {
    val rawS = lit(1577800000L) + col("event_id") * 40000L + col("user_id")
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .withColumn(
        "raw_ts",
        when(col("event_id") % 2 === 0, rawS * 1000).otherwise(rawS))
  }

  private val payloadSql =
    """SELECT *, CAST(props->>'k' AS BIGINT) AS k,
      |  CASE WHEN event_id % 2 = 0
      |       THEN (1577800000 + event_id*40000 + user_id) * 1000
      |       ELSE 1577800000 + event_id*40000 + user_id END AS raw_ts
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- A1
  val rParseProps: Q = Q(
    (s, dir) =>
      payload(s, dir)
        .select(col("event_id"), col("k"))
        .orderBy("event_id"),
    s"""WITH p AS ($payloadSql)
       |SELECT event_id, k FROM p ORDER BY event_id""".stripMargin)

  // ---------------------------------------------------------------- A2
  /** Version dispatch from REAL JSON metadata (ref main.py:196-216:
    * version in [None, "v1.0.0"] → v1 path, "v2.0.0" → v2): each event
    * is serialized as the Kafka wire value it stands in for —
    * `metadata.version` present for k%3∈{0,1}, metadata ABSENT
    * entirely otherwise (the reference's generator drops it half the
    * time) — then parsed back through the D6 wire schema
    * ([[graft.streaming.KafkaJson.reportSchema]]) and routed on the
    * PARSED version. Both the serialize and the parse are codegen'd
    * to_json/from_json column ops, so the dispatch stays map-only.
    */
  val rParseRoute: Q = Q(
    (s, dir) => {
      val wire = payload(s, dir).withColumn("json",
        to_json(struct(
          when(col("k") % 3 === 0, struct(lit("v1.0.0").as("version")))
            .when(col("k") % 3 === 1, struct(lit("v2.0.0").as("version")))
            .as("metadata"),
          col("user_id").as("reporter_id"))))
      val p = wire
        .withColumn("_r",
          from_json(col("json"), graft.streaming.KafkaJson.reportSchema))
        .withColumn("version", col("_r.metadata.version"))
      val v1 = p
        .filter(col("version").isNull || col("version") === "v1.0.0")
        .select(col("event_id"),
          coalesce(col("version"), lit("v1.0.0")).as("version"),
          col("_r.reporter_id").as("reporter_id"), lit("v1").as("route"))
      val v2 = p
        .filter(col("version") === "v2.0.0")
        .select(col("event_id"), col("version"),
          col("_r.reporter_id").as("reporter_id"), lit("v2").as("route"))
      v1.unionAll(v2).orderBy("event_id")
    },
    s"""WITH p AS ($payloadSql),
       |w AS (SELECT event_id,
       |        CASE WHEN k % 3 = 0 THEN
       |          '{"metadata":{"version":"v1.0.0"},"reporter_id":'
       |            || user_id || '}'
       |        WHEN k % 3 = 1 THEN
       |          '{"metadata":{"version":"v2.0.0"},"reporter_id":'
       |            || user_id || '}'
       |        ELSE '{"reporter_id":' || user_id || '}' END AS json
       |      FROM p),
       |v AS (SELECT event_id,
       |        json->'metadata'->>'version' AS version,
       |        CAST(json->>'reporter_id' AS BIGINT) AS reporter_id
       |      FROM w)
       |SELECT event_id, coalesce(version, 'v1.0.0') AS version,
       |       reporter_id,
       |       CASE WHEN version = 'v2.0.0' THEN 'v2' ELSE 'v1' END AS route
       |FROM v ORDER BY event_id""".stripMargin)

  // ---------------------------------------------------------------- A3
  private def validCond: Column =
    col("event_type") =!= "error" && col("value") <= 300.0 && col("k") < 90

  private val validSqlCond =
    "event_type <> 'error' AND value <= 300.0 AND k < 90"

  val rValidateSplit: Q = Q(
    (s, dir) =>
      payload(s, dir)
        .filter(validCond)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("k"))
        .orderBy("event_id"),
    s"""WITH p AS ($payloadSql)
       |SELECT event_id, user_id, event_type, value, k FROM p
       |WHERE $validSqlCond ORDER BY event_id""".stripMargin)

  // ---------------------------------------------------------------- A4
  /** Failed rows → dead-letter with the first failing rule as reason,
    * mirroring the reference's error-queue requeue (main.py:78-96).
    */
  val rDeadLetter: Q = Q(
    (s, dir) =>
      payload(s, dir)
        .filter(!validCond)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("k"),
          when(col("event_type") === "error", "bad_type")
            .when(col("value") > 300.0, "value_range")
            .otherwise("bad_k").as("reason"))
        .orderBy("event_id"),
    s"""WITH p AS ($payloadSql)
       |SELECT event_id, user_id, event_type, value, k,
       |  CASE WHEN event_type = 'error' THEN 'bad_type'
       |       WHEN value > 300.0 THEN 'value_range'
       |       ELSE 'bad_k' END AS reason
       |FROM p WHERE NOT ($validSqlCond) ORDER BY event_id""".stripMargin)

  // ---------------------------------------------------------------- B1
  val rSanitizeName: Q = Q(
    (s, dir) =>
      Tables.customer(s, dir)
        .select(col("c_custkey"), sanitizeName(col("c_name")).as("clean_name"))
        .orderBy("c_custkey"),
    """SELECT c_custkey,
      |  trim(replace(replace(lower(c_name), '_', ' '), '-', ' ')) AS clean_name
      |FROM customer ORDER BY c_custkey""".stripMargin)

  // ---------------------------------------------------------------- B2
  val rTsNormalize: Q = Q(
    (s, dir) =>
      payload(s, dir)
        .withColumn("ts_sec", normalizeEpoch(col("raw_ts")))
        .withColumn("ts_us", normalizeEpochMicros(col("raw_ts")))
        .filter(col("ts_sec").between(TsMin, TsMax))
        .select(col("event_id"), col("raw_ts"), col("ts_sec"),
          col("ts_us"),
          timestamp_micros(col("ts_us")).as("event_time"))
        .orderBy("event_id"),
    s"""WITH p AS ($payloadSql),
       |n AS (SELECT event_id, raw_ts,
       |        CASE WHEN raw_ts > 10000000000 THEN raw_ts // 1000
       |             ELSE raw_ts END AS ts_sec,
       |        CASE WHEN raw_ts > 10000000000 THEN raw_ts * 1000
       |             ELSE raw_ts * 1000000 END AS ts_us FROM p)
       |SELECT event_id, raw_ts, ts_sec, ts_us,
       |       make_timestamp(ts_us) AS event_time
       |FROM n WHERE ts_sec BETWEEN $TsMin AND $TsMax
       |ORDER BY event_id""".stripMargin)

  // ---------------------------------------------------------------- B3
  val rClampGear: Q = Q(
    (s, dir) =>
      Tables.events(s, dir)
        .withColumn("gear_raw",
          (col("user_id") * 7919L + col("event_id") * 13L) % 40000L)
        .select(col("event_id"), col("gear_raw"),
          clampSmallint(col("gear_raw")).as("gear_id"))
        .orderBy("event_id"),
    """SELECT event_id, (user_id*7919 + event_id*13) % 40000 AS gear_raw,
      |  CASE WHEN (user_id*7919 + event_id*13) % 40000 > 32767 THEN 0
      |       ELSE (user_id*7919 + event_id*13) % 40000 END AS gear_id
      |FROM events ORDER BY event_id""".stripMargin)

  val registry: Map[String, Q] = Map(
    "r_parse_props" -> rParseProps,
    "r_parse_route" -> rParseRoute,
    "r_validate_split" -> rValidateSplit,
    "r_dead_letter" -> rDeadLetter,
    "r_sanitize_name" -> rSanitizeName,
    "r_ts_normalize" -> rTsNormalize,
    "r_clamp_gear" -> rClampGear)
}
