package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Every implemented operator is registered here with its DuckDB
  * oracle; `Verify` dumps both for the driver's hash compare.
  */
object SparkEntry {

  private val all: Map[String, Q] =
    Cleanse.registry ++ Star.registry ++ Analytics.registry ++
      Dedup.registry ++ TextAnalysis.registry ++ Similarity.registry ++
      MultiModal.registry ++ Graph.registry ++
      graft.sources.LakeMerge.registry

  /** Flagship: the full star-schema normalization pipeline
    * (ref report.py:253-314) on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    Star.rFactAssemble.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (name, q) => name -> q.fn }

  /** Equivalent ANSI SQL runnable by DuckDB on the same parquet
    * tables; column names/aliases match the Spark output exactly.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (name, Q(_, Some(sql))) => name -> sql }
}
