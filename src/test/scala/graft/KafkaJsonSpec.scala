package graft

import org.apache.spark.sql.functions._
import graft.streaming.{KafkaJson, ReportStream}

/** Wire-format fidelity for the Kafka value schema — the reference's
  * producer JSON (kafka_setup/src/main.py) pushed through
  * `parseReports`, and the dead-letter v2 requeue format
  * (views/report.py convert_stg_to_kafka_report) round-tripped
  * through the same schema. No broker needed: the format IS the
  * contract.
  */
class KafkaJsonSpec extends SparkSpec {
  import spark.implicits._

  private val v1WithMeta =
    """{"region_id":14652,"x_coord":3682,"y_coord":3851,"z_coord":0,
      |"ts":1704223737,"manual_detect":0,"on_members_world":1,
      |"on_pvp_world":0,"world_number":324,
      |"equipment":{"equip_head_id":13592,"equip_amulet_id":null,
      |"equip_torso_id":13596,"equip_legs_id":13598,"equip_boots_id":13602,
      |"equip_cape_id":13594,"equip_hands_id":13600,"equip_weapon_id":1381,
      |"equip_shield_id":null},"equip_ge_value":0,
      |"metadata":{"version":"v1.0.0"},
      |"reporter":"player1","reported":"player2"}""".stripMargin
      .replace("\n", "")

  // the generator drops metadata on half the v1 messages
  private val v1NoMeta =
    v1WithMeta.replace(""","metadata":{"version":"v1.0.0"}""", "")

  private val v2 =
    """{"metadata":{"version":"v2.0.0"},"reporter_id":17,"reported_id":42,
      |"region_id":10250,"x_coord":1,"y_coord":2,"z_coord":3,
      |"ts":1651363200,"manual_detect":1,"on_members_world":0,
      |"on_pvp_world":1,"world_number":483,
      |"equipment":{"equip_head_id":null,"equip_amulet_id":5,
      |"equip_torso_id":null,"equip_legs_id":null,"equip_boots_id":null,
      |"equip_cape_id":null,"equip_hands_id":null,"equip_weapon_id":9,
      |"equip_shield_id":null},"equip_ge_value":12345}""".stripMargin
      .replace("\n", "")

  test("v1/v2 producer JSON parses with correct routing and fields") {
    val parsed = KafkaJson.parseReports(
      Seq(v1WithMeta, v1NoMeta, v2).toDF("json"))
    assert(parsed.count() === 3)

    val v1Rows = parsed.filter(col("version") === "v1.0.0")
    assert(v1Rows.count() === 2, "missing metadata must default to v1")
    assert(v1Rows.filter(col("reporter") === "player1" &&
      col("reported") === "player2").count() === 2)
    assert(v1Rows.filter(col("reporter_id").isNull).count() === 2)

    val v2Row = parsed.filter(col("version") === "v2.0.0")
    assert(v2Row.count() === 1)
    val r = v2Row.head()
    assert(r.getAs[Long]("reporter_id") === 17L)
    assert(r.getAs[Long]("reported_id") === 42L)
    assert(r.getAs[Long]("ts") === 1651363200L)
    // nested nullable equipment survives: set slots keep values,
    // unset slots stay null
    val eq = v2Row.select("equipment.*")
    assert(eq.head().getAs[Long]("equip_amulet_id") === 5L)
    assert(eq.head().isNullAt(eq.columns.indexOf("equip_head_id")))
  }

  test("malformed JSON degrades to a null-field v1 row, never throws") {
    val junk = Seq("{not json", "", "[]", "42",
      """{"metadata":{"version":"v9.9.9"},"ts":"not-a-number"}""")
    val parsed = KafkaJson.parseReports(junk.toDF("json"))
    assert(parsed.count() === junk.length, "every input row survives")
    // unparseable values leave null fields; missing metadata ⇒ v1,
    // so downstream validation (A3/A4) routes them to the DLQ
    assert(parsed.filter(col("version") === "v1.0.0").count() >= 4)
    assert(parsed.filter(col("ts").isNull).count() >= 4)
  }

  test("dead-letter requeue serializes as v2.0.0 with ms ts and defaults") {
    val parsed = KafkaJson.parseReports(Seq(v1WithMeta).toDF("json"))
      .withColumn("reporter_id", lit(101L))
      .withColumn("reported_id", lit(202L))
      .withColumn("world_number", lit(null: java.lang.Long)) // force default
    val requeued = parsed.select(
      KafkaJson.toV2Json(tsIsTimestamp = false).as("json"))
    val back = KafkaJson.parseReports(requeued).head()

    assert(back.getAs[String]("version") === "v2.0.0")
    assert(back.getAs[Long]("reporter_id") === 101L)
    assert(back.getAs[Long]("reported_id") === 202L)
    assert(back.getAs[Long]("ts") === 1704223737L * 1000L,
      "requeue promotes ts to milliseconds")
    assert(back.getAs[Long]("world_number") === 0L,
      "nullable fields default to 0 in the requeue payload")
    assert(back.getAs[Long]("on_members_world") === 1L)
  }

  test("withRequeueJson on events: payload parses and keys resolve") {
    val dead = ReportStream.parsedEvents(Tables.eventsRaw(spark, sf))
      .limit(50).withColumn("reason", lit("bad_type"))
    val out = ReportStream.withRequeueJson(dead)
    assert(out.columns.contains("requeue_json"))
    assert(out.count() === 50)

    val back = KafkaJson.parseReports(
      out.select(col("requeue_json").as("json")))
    assert(back.filter(col("version") === "v2.0.0").count() === 50)
    // reporter resolves from user_id, reported from props.k — the
    // same derivation the batch star uses (set equality on pairs)
    val got = back.select("reporter_id", "reported_id").distinct()
    val expected = ReportStream.parsedEvents(Tables.eventsRaw(spark, sf))
      .limit(50)
      .select(col("user_id").as("reporter_id"), col("k").as("reported_id"))
      .distinct()
    assert(got.except(expected).count() === 0)
    assert(expected.except(got).count() === 0)
    // 9-slot equipment struct is present and typed
    assert(back.select("equipment.equip_weapon_id").count() === 50)
  }
}
