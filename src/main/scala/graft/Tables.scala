package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated test tables.
  *
  * Column pruning + predicate pushdown are left to Catalyst: every
  * operator declares projections/filters on top of these raw scans and
  * `.explain` shows them reaching the parquet reader (PushedFilters /
  * ReadSchema). At 100 TB these would be partitioned tables; the
  * loaders are the single place to swap in a catalog.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Generator-version tolerance, all at the SCAN level:
    //  - ts as TIMESTAMP(NANOS): Spark refuses by default — read the
    //    nanos as long and rebuild µs in nanosToTimestamp below.
    //  - ts as timestamp[us] WITHOUT timezone: with NTZ inference ON
    //    Spark surfaces TIMESTAMP_NTZ and every downstream
    //    unix_micros/watermark path needs a cast ABOVE the scan —
    //    which also blocks ts predicate pushdown. Inference OFF makes
    //    the scan deliver a session-tz TIMESTAMP directly (the
    //    session is pinned UTC, so the stored micros are read exactly
    //    as DuckDB's naive read does), no cast, filters pushable.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") nanosToTimestamp(df) else df
  }

  /** Normalize the `ts` column to a session-tz TIMESTAMP regardless of
    * how the generator wrote it: nanos-as-long (old testdata),
    * timestamp[us] without timezone → Spark TIMESTAMP_NTZ (new
    * testdata), or already TIMESTAMP (no-op). The session timezone is
    * pinned to UTC everywhere, so the NTZ→TZ cast is the identity on
    * the underlying micros — exactly how DuckDB reads the same file.
    */
  def nanosToTimestamp(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", df("ts").cast(
          org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  /** Events with `ts` still a raw long of nanos — the schema a file
    * stream over the same parquet must declare.
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.read.parquet(s"$dir/events.parquet")
  }

  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}

/** A named query plus (optionally) its DuckDB oracle SQL. */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(fn: (SparkSession, String) => DataFrame, sql: String): Q =
    Q(fn, Some(sql))
}
