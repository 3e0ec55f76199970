package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Debezium-shaped CDC envelope parsing — the bridge from the
  * reference's MySQL write side to the lake's MERGE sink. A relational
  * CDC connector emits one JSON envelope per row change:
  * {{{ {"op": "c"|"u"|"d"|"r", "before": {...}, "after": {...},
  *      "ts_ms": ..., "seq": ...} }}}
  * (`c`reate / `u`pdate / snapshot-`r`ead carry the after-image,
  * `d`elete the before-image; `seq` is the log position — the total
  * order MERGE resolution needs). This module maps a stream of such
  * envelopes onto [[LakeMerge.merge]]'s batch contract, so
  * `kafka → parse → streamingMergeBatch` replicates the reference's
  * MySQL tables as lake tables end to end.
  *
  * Malformed rows follow the engine's dead-letter convention
  * (ref `main.py`'s reject path, same as operators/Cleanse A4): they
  * are never dropped silently — [[deadLetters]] returns the raw
  * payloads for requeue/inspection, and [[toMergeBatch]] returns only
  * rows that parsed AND carry a legal op. All parsing is
  * `from_json` + column expressions: codegen-friendly, no UDFs.
  */
object CdcEnvelope {

  val Ops: Seq[String] = Seq("c", "u", "d", "r")

  private def envelopeSchema(rowSchema: StructType): StructType =
    StructType(Seq(
      StructField("op", StringType),
      StructField("before", rowSchema),
      StructField("after", rowSchema),
      StructField("ts_ms", LongType),
      StructField("seq", LongType)))

  private def parsed(jsonCol: String, rowSchema: StructType): Column =
    from_json(col(jsonCol), envelopeSchema(rowSchema))

  /** An envelope is usable when it parses, has a legal op, its
    * image side (before for deletes, after otherwise) is present, and
    * it carries a log position (`seq`, or `ts_ms` as fallback). An
    * envelope with NEITHER has no place in the MERGE total order — a
    * lit(0) default made same-key winners in a batch nondeterministic
    * and sorted them below every real log position (r11 advice), so
    * such rows go to [[deadLetters]] instead.
    */
  private def valid(e: Column): Column =
    e.isNotNull && e.getField("op").isin(Ops: _*) &&
      when(e.getField("op") === "d", e.getField("before").isNotNull)
        .otherwise(e.getField("after").isNotNull) &&
      (e.getField("seq").isNotNull || e.getField("ts_ms").isNotNull)

  /** Valid envelopes as a merge-ready batch: the row image's columns,
    * plus `_cdc_op` (the lake's upsert/delete — pass as `opCol`) and
    * `_cdc_seq` (log position, falling back to ts_ms — rename to the
    * table's order column before merging).
    */
  def toMergeBatch(df: DataFrame, jsonCol: String,
      rowSchema: StructType): DataFrame = {
    val e = parsed(jsonCol, rowSchema)
    df.select(e.as("e")).filter(valid(col("e")))
      .select(
        when(col("e.op") === "d", col("e.before"))
          .otherwise(col("e.after")).as("_row"),
        when(col("e.op") === "d", lit(LakeMerge.Delete))
          .otherwise(lit(LakeMerge.Upsert)).as("_cdc_op"),
        coalesce(col("e.seq"), col("e.ts_ms")).as("_cdc_seq"))
      .select(col("_row.*"), col("_cdc_op"), col("_cdc_seq"))
  }

  /** The reject path: raw payloads that failed to parse, carried an
    * unknown op, lacked their image side, or carried no log position
    * (neither `seq` nor `ts_ms`) — never silently dropped.
    */
  def deadLetters(df: DataFrame, jsonCol: String,
      rowSchema: StructType): DataFrame =
    df.filter(!valid(parsed(jsonCol, rowSchema)))
      .select(col(jsonCol).as("raw"))
}
