package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Iterative graph analytics over the report relation — the edge list
  * the reference's whole schema exists to serve (`reportingID` →
  * `reportedID`, ref mysql 01_tables.sql `Reports`; here derived the
  * same way the star pipeline does: `user_id` → `props.k`,
  * operators/Cleanse.scala:35,55).
  *
  * The flagship is a damped power iteration ("suspicion rank"): a
  * player reported by many reporters — weighted by how suspicious
  * those reporters themselves look — ranks higher than one reported
  * by a single noisy account. This is PageRank's recurrence with the
  * report graph's direction, computed in EXACT int64 fixed-point
  * (micro-units, integer division) so Spark and the DuckDB oracle
  * agree bit-for-bit — float power iteration would drift with
  * summation order and can never hash-match across engines.
  *
  * == Scale design ==
  * Each round is one shuffle pair: join ranks to edges on `src`
  * (both sides hash-partition on src; the rank relation is
  * node-sized, far smaller than edges), then aggregate contributions
  * on `dst` with map-side partial sums. The edge relation is built
  * once and persisted — degree, node set, and every round reuse the
  * handle instead of re-parsing the corpus. Iterations are a FIXED
  * small count (3): lineage stays shallow, no checkpoint needed; a
  * to-convergence variant would add `localCheckpoint` every few
  * rounds, changing nothing else. At 100 TB the edge list is the only
  * corpus-sized relation; everything else is O(nodes).
  */
object Graph {

  /** Micro-unit fixed point: rank 1.0 ≡ 1,000,000. */
  private val One = 1000000L

  /** Report edges, deduplicated (a reporter counts once per target),
    * self-reports dropped.
    */
  private def edges(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id").as("src"),
        get_json_object(col("props"), "$.k").cast("long").as("dst"))
      .filter(col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()

  private val edgesSql =
    """SELECT DISTINCT user_id AS src,
      |                CAST(props->>'k' AS BIGINT) AS dst
      |FROM events
      |WHERE CAST(props->>'k' AS BIGINT) IS NOT NULL
      |  AND user_id <> CAST(props->>'k' AS BIGINT)""".stripMargin

  /** r_{t+1}(v) = 0.15 + 0.85 · Σ_{u→v} r_t(u) / outdeg(u), three
    * rounds from a uniform start, all in integer micro-units
    * (`div` = truncating division; every operand non-negative, so it
    * matches DuckDB's floor `//` exactly).
    */
  def suspicionRank(s: SparkSession, dir: String): DataFrame = {
    val e = edges(s, dir).persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
    var r = nodes.withColumn("r", lit(One))
    for (_ <- 1 to 3) {
      val contrib = e
        .join(deg, "src")
        .join(r.withColumnRenamed("id", "src"), "src")
        .selectExpr("dst AS id", "r div outdeg AS share")
        .groupBy("id").agg(sum("share").as("s"))
      r = nodes.join(contrib, Seq("id"), "left")
        .selectExpr("id", "150000 + (85 * coalesce(s, 0)) div 100 AS r")
    }
    r.select(col("id").as("player_id"), col("r").as("suspicion"))
      .orderBy("player_id")
  }

  private val suspicionSql = {
    def round(prev: String, next: String): String =
      s"""$next AS (
         |  SELECT n.id,
         |         CAST(150000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS id, CAST(sum(p.r // d.outdeg) AS BIGINT) AS s
         |    FROM edges e
         |    JOIN deg d ON d.src = e.src
         |    JOIN $prev p ON p.id = e.src
         |    GROUP BY e.dst) c ON c.id = n.id)""".stripMargin
    s"""WITH edges AS MATERIALIZED ($edgesSql),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
       |        FROM edges GROUP BY src),
       |nodes AS (SELECT src AS id FROM edges
       |          UNION SELECT dst FROM edges),
       |r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |${round("r0", "r1")},
       |${round("r1", "r2")},
       |${round("r2", "r3")}
       |SELECT id AS player_id, r AS suspicion FROM r3
       |ORDER BY player_id""".stripMargin
  }

  val qSuspicionRank: Q = Q(suspicionRank _, suspicionSql)

  val registry: Map[String, Q] = Map(
    "q_suspicion_rank" -> qSuspicionRank)
}
