package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Format-agnostic table loaders: every graft operator takes a
  * DataFrame (or a table dir it resolves through `Tables`), so any
  * source that yields the events/documents schema feeds the same
  * plans — these helpers cover the lake formats beyond parquet plus
  * their streaming twins. Explicit schemas everywhere: schema
  * inference is a full extra pass over the data at 100 TB (and a
  * correctness hazard — inferred types drift with the sample).
  */
object Sources {

  def jsonLines(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def csv(spark: SparkSession, path: String,
      schema: StructType, header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      // ISO timestamps with microseconds, matching what df.write.csv
      // emits in UTC sessions
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][XXX]")
      .csv(path)

  /** Bucketed lake layout — the co-located join. Both sides of a hot
    * equi-join written with `bucketBy(n, key)` + `sortBy(key)` hash
    * every row into the same bucket scheme AT WRITE TIME; a later
    * join on that key then needs NO shuffle and NO sort at all — the
    * scan itself delivers co-partitioned, pre-sorted inputs. This is
    * the 100 TB answer for the joins that run every batch (fact ⋈
    * player dim): pay the partitioning once when the table lands,
    * never again per query. The reference's MySQL analog is the
    * clustered PRIMARY KEY + secondary index pair it joins through
    * (ref mysql/.../01_tables.sql); a lake has no indexes, so the
    * bucket scheme IS the index.
    *
    * `bucketBy` requires a catalog table (the bucket spec lives in
    * the metastore, not the files); `path` keeps the data external so
    * callers control layout. Bucket counts must match across join
    * sides (Spark joins b and k·b buckets shuffle-free only for the
    * b side; keep them equal).
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Date-partitioned lake layout — partition PRUNING at the source.
    * The fact table's hottest predicate is time (the reference serves
    * it off `idx_heatmap`'s timestamp column; every backfill and
    * incremental job reads a date range), so the lake directory
    * layout IS that index: `partitionBy(dateCol)` writes one
    * directory per day, and a reader's date filter eliminates whole
    * directories before a single byte is scanned. At 100 TB with
    * ~daily partitions a one-week backfill touches 7/1800ths of the
    * data — the difference between a scan and a lookup. Readers keep
    * the partition column; `PlanAuditSpec` asserts the filter lands
    * in the scan's PartitionFilters, not a post-scan Filter.
    */
  def writeDatePartitioned(df: DataFrame, path: String,
      tsCol: String, partCol: String = "event_date"): Unit =
    df.withColumn(partCol,
        org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col(tsCol)))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Parquet read under SCHEMA EVOLUTION — the lake contract every
    * long-lived table eventually exercises: a column added to the
    * writer mid-corpus unions into the read schema, pre-evolution
    * files surfacing NULL for it. `mergeSchema` is a footer-level
    * union at planning time (parquet footers only — no data pages
    * read), NOT inference over rows; a reader that already knows the
    * final schema should pass it explicitly and skip even that footer
    * pass. Column pruning and predicate pushdown are unaffected — the
    * scan still reads only requested columns, old files simply
    * null-fill the missing ones (SourcesSpec pins both).
    */
  def parquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** ORC lake tables — the other columnar format Spark codecs
    * natively (predicate pushdown, column pruning, vectorized read
    * all apply exactly as for parquet). Schema passed explicitly for
    * the same no-inference-pass reason as the text formats; for a
    * written-by-Spark table the footer schema would also do.
    */
  def orc(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def orcStream(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.readStream.schema(schema).orc(path)

  def jsonLinesStream(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.readStream.schema(schema).json(path)

  def csvStream(spark: SparkSession, path: String,
      schema: StructType, header: Boolean = true): DataFrame =
    spark.readStream.schema(schema)
      .option("header", header.toString)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][XXX]")
      .csv(path)
}
