package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Kafka wire format of the reference worker, as Spark schemas +
  * codegen'd JSON transforms (no broker needed to prove fidelity):
  *
  *  - value schema of the `report` topic (ref kafka_setup/src/main.py:
  *    14-39, app/views/report.py:11-52): a BaseReport plus EITHER v1
  *    name fields (`reporter`/`reported`) or v2 id fields
  *    (`reporter_id`/`reported_id`), discriminated by
  *    `metadata.version` — and `metadata` itself is OPTIONAL on v1
  *    (the generator drops it half the time, main.py:81-83), so a
  *    missing version means v1.
  *  - the dead-letter requeue format (ref main.py:79-97 +
  *    views/report.py convert_stg_to_kafka_report): failed rows are
  *    re-serialized as v2 `KafkaReport` JSON with
  *    `metadata.version = "v2.0.0"`, ts in MILLISECONDS, and all
  *    nullable world/equip fields defaulted to 0.
  *
  * Everything here is `from_json`/`to_json` over columns — map-only,
  * whole-stage-codegen, no UDFs — so parsing 100 TB of Kafka values
  * is embarrassingly parallel.
  */
object KafkaJson {

  /** ref views/report.py Equipment: all 9 slots nullable. */
  val equipmentSchema: StructType = StructType(Seq(
    "equip_head_id", "equip_amulet_id", "equip_torso_id", "equip_legs_id",
    "equip_boots_id", "equip_cape_id", "equip_hands_id", "equip_weapon_id",
    "equip_shield_id").map(StructField(_, LongType, nullable = true)))

  /** The union of ReportInQV1 and ReportInQV2 — v1 rows leave the id
    * fields null and vice versa; `metadata` may be absent entirely.
    */
  val reportSchema: StructType = StructType(Seq(
    StructField("metadata",
      StructType(Seq(StructField("version", StringType))), nullable = true),
    StructField("reporter", StringType, nullable = true),
    StructField("reported", StringType, nullable = true),
    StructField("reporter_id", LongType, nullable = true),
    StructField("reported_id", LongType, nullable = true),
    StructField("region_id", LongType),
    StructField("x_coord", LongType),
    StructField("y_coord", LongType),
    StructField("z_coord", LongType),
    StructField("ts", LongType),
    StructField("manual_detect", LongType),
    StructField("on_members_world", LongType),
    StructField("on_pvp_world", LongType),
    StructField("world_number", LongType),
    StructField("equipment", equipmentSchema, nullable = true),
    StructField("equip_ge_value", LongType, nullable = true)))

  /** Parse a `json` string column of Kafka values into typed report
    * columns + a resolved `version` (missing metadata ⇒ v1, matching
    * the worker's dispatch on absent metadata).
    */
  def parseReports(df: DataFrame, jsonCol: String = "json"): DataFrame =
    df.withColumn("_r", from_json(col(jsonCol), reportSchema))
      .withColumn("version",
        coalesce(col("_r.metadata.version"), lit("v1.0.0")))
      .select(col("version"), col("_r.*"))
      .drop("metadata")

  /** Re-serialize a resolved report row as the v2 `KafkaReport`
    * requeue payload (ref convert_stg_to_kafka_report,
    * views/report.py:173-208): version pinned to v2.0.0, ts promoted
    * to ms, nullable flags defaulted to 0. Input needs the resolved
    * `reporter_id`/`reported_id` plus the BaseReport columns; `ts`
    * may be a timestamp (converted) or epoch-seconds long.
    */
  def toV2Json(tsIsTimestamp: Boolean = true): Column = {
    val tsMs =
      // unix_millis keeps the sub-second component the v2 contract
      // carries (unix_timestamp would truncate to whole seconds)
      if (tsIsTimestamp) unix_millis(col("ts"))
      else (col("ts") * 1000L)
    to_json(struct(
      struct(lit("v2.0.0").as("version")).as("metadata"),
      col("reporter_id"), col("reported_id"),
      col("region_id"), col("x_coord"), col("y_coord"), col("z_coord"),
      tsMs.as("ts"),
      coalesce(col("manual_detect"), lit(0L)).as("manual_detect"),
      coalesce(col("on_members_world"), lit(0L)).as("on_members_world"),
      coalesce(col("on_pvp_world"), lit(0L)).as("on_pvp_world"),
      coalesce(col("world_number"), lit(0L)).as("world_number"),
      col("equipment"),
      coalesce(col("equip_ge_value"), lit(0L)).as("equip_ge_value")))
  }

  /** Assemble the nested `equipment` struct from flat slot columns
    * (the StgReport → KafkaReport step of the requeue path).
    */
  def equipmentStruct(
      head: Column, amulet: Column, torso: Column, legs: Column,
      boots: Column, cape: Column, hands: Column, weapon: Column,
      shield: Column): Column =
    struct(
      head.as("equip_head_id"), amulet.as("equip_amulet_id"),
      torso.as("equip_torso_id"), legs.as("equip_legs_id"),
      boots.as("equip_boots_id"), cape.as("equip_cape_id"),
      hands.as("equip_hands_id"), weapon.as("equip_weapon_id"),
      shield.as("equip_shield_id"))
}
