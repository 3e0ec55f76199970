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
