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
    * self-reports dropped. An [[graft.Artifacts]] handle shared by all
    * four graph queries: built once per (session, corpus) and
    * eagerly checkpointed — the previous per-query `persist()` pinned
    * a fresh copy in the session's CacheManager on EVERY invocation
    * and never released it (r11 advice); an unreferenced checkpoint
    * handle is reclaimed by the ContextCleaner when the registry
    * drops it.
    */
  private val edgeCache = graft.Artifacts.cache[DataFrame]("graph.edges")

  def reportEdges(s: SparkSession, dir: String): DataFrame =
    edgeCache.getOrElseUpdate(s, dir)(
      graft.sources.ArtifactStore.materialize(s, "graph.edges", dir)(
        Tables.events(s, dir)
          .select(col("user_id").as("src"),
            get_json_object(col("props"), "$.k").cast("long").as("dst"))
          .filter(col("dst").isNotNull && col("src") =!= col("dst"))
          .distinct()))

  /** The undirected, deduplicated edge view (one row per unordered
    * pair) — shared by the triangle and component queries; same
    * artifact stance as [[reportEdges]].
    */
  private val undCache = graft.Artifacts.cache[DataFrame]("graph.und")

  private def undirectedEdges(s: SparkSession, dir: String): DataFrame =
    undCache.getOrElseUpdate(s, dir)(
      graft.sources.ArtifactStore.materialize(s, "graph.und", dir) {
        val e = reportEdges(s, dir)
        e.select(least(col("src"), col("dst")).as("a"),
            greatest(col("src"), col("dst")).as("b"))
          .distinct()
      })

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
    val e = reportEdges(s, dir)
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

  /** Mutual-report pairs (A reports B AND B reports A) — the simplest
    * collusion signal: organic reports rarely reciprocate, retaliation
    * and farmed accounts do. One semi-join of the edge list against
    * its own reversal; each pair emitted once (`a < b`).
    */
  def mutualReports(s: SparkSession, dir: String): DataFrame = {
    val e = reportEdges(s, dir)
    val rev = e.select(col("dst").as("rsrc"), col("src").as("rdst"))
    e.join(rev, col("src") === col("rsrc") && col("dst") === col("rdst"),
        "left_semi")
      .filter(col("src") < col("dst"))
      .select(col("src").as("a"), col("dst").as("b"))
      .orderBy("a", "b")
  }

  val qMutualReports: Q = Q(mutualReports _,
    s"""WITH e AS MATERIALIZED ($edgesSql)
       |SELECT x.src AS a, x.dst AS b
       |FROM e x JOIN e y ON y.src = x.dst AND y.dst = x.src
       |WHERE x.src < x.dst
       |ORDER BY a, b""".stripMargin)

  /** Triangles each player sits in, on the UNDIRECTED report graph —
    * collusion rings show up as dense triangle neighborhoods long
    * before any single account crosses a report threshold.
    *
    * Uses the degree-ordered orientation: every edge points from its
    * (degree, id)-smaller endpoint to the larger, turning the graph
    * into a DAG where each triangle is enumerated EXACTLY once and —
    * the scale point — the join fan-out per vertex is bounded by its
    * oriented out-degree, O(√m) on any graph, so the classic
    * power-law hub that would explode a naive src-joins-dst
    * enumeration contributes almost nothing (its edges all point AT
    * it). Two hash joins + one explode-aggregate; the DuckDB oracle
    * replays the same orientation with row-value comparisons.
    */
  def reportTriangles(s: SparkSession, dir: String): DataFrame = {
    val und = undirectedEdges(s, dir)
    val deg = und.select(col("a").as("id"))
      .unionAll(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    val da = deg.select(col("id").as("a"), col("d").as("da"))
    val db = deg.select(col("id").as("b"), col("d").as("db"))
    val aFirst = struct(col("da"), col("a")) < struct(col("db"), col("b"))
    val o = und.join(da, "a").join(db, "b")
      .select(when(aFirst, col("a")).otherwise(col("b")).as("u"),
        when(aFirst, col("b")).otherwise(col("a")).as("v"))
    val e1 = o.select(col("u").as("u1"), col("v").as("v1"))
    val e2 = o.select(col("u").as("u2"), col("v").as("v2"))
    val e3 = o.select(col("u").as("u3"), col("v").as("v3"))
    val tri = e1.join(e2, col("u2") === col("v1"))
      .join(e3, col("u3") === col("u1") && col("v3") === col("v2"))
      .select(col("u1").as("x"), col("v1").as("y"), col("v2").as("z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("player_id"))
      .groupBy("player_id").agg(count(lit(1)).as("n_triangles"))
      .orderBy("player_id")
  }

  val qReportTriangles: Q = Q(reportTriangles _,
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |und AS (SELECT DISTINCT least(src, dst) AS a,
       |                        greatest(src, dst) AS b FROM e),
       |deg AS (SELECT id, CAST(count(*) AS BIGINT) AS d
       |        FROM (SELECT a AS id FROM und
       |              UNION ALL SELECT b FROM und) GROUP BY id),
       |o AS MATERIALIZED (
       |  SELECT CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.a ELSE u.b END AS u,
       |         CASE WHEN (da.d, u.a) < (db.d, u.b) THEN u.b ELSE u.a END AS v
       |  FROM und u
       |  JOIN deg da ON da.id = u.a
       |  JOIN deg db ON db.id = u.b),
       |tri AS (
       |  SELECT e1.u AS x, e1.v AS y, e2.v AS z
       |  FROM o e1
       |  JOIN o e2 ON e2.u = e1.v
       |  JOIN o e3 ON e3.u = e1.u AND e3.v = e2.v)
       |SELECT player_id, CAST(count(*) AS BIGINT) AS n_triangles
       |FROM (SELECT x AS player_id FROM tri
       |      UNION ALL SELECT y FROM tri
       |      UNION ALL SELECT z FROM tri)
       |GROUP BY player_id
       |ORDER BY player_id""".stripMargin)

  /** Connected components of the undirected report graph — the
    * "report cluster" a player belongs to (labelled by its minimum
    * player id), reusing the engine's bounded min-label propagation
    * ([[Dedup.propagate]]: converge-early DataFrame loop with eager
    * checkpoints). The oracle is a DIFFERENT algorithm entirely — a
    * DuckDB recursive CTE computing the true reachability closure —
    * so a green row proves the iterative propagation reaches the
    * exact fixpoint, the same standard the GraphX cross-check applies
    * from a third implementation.
    */
  def reportComponents(s: SparkSession, dir: String): DataFrame = {
    val und = undirectedEdges(s, dir)
    val sym = und.select(col("a").as("doc_a"), col("b").as("doc_b"))
      .unionAll(und.select(col("b").as("doc_a"), col("a").as("doc_b")))
    val labels0 = sym.select(col("doc_a").as("doc_id")).distinct()
      .withColumn("label", col("doc_id"))
    Dedup.propagate(sym, labels0, 30)
      .select(col("doc_id").as("player_id"),
        col("label").as("component_id"))
      .orderBy("player_id")
  }

  val qReportComponents: Q = Q(reportComponents _,
    s"""WITH RECURSIVE e AS MATERIALIZED ($edgesSql),
       |und AS (SELECT DISTINCT least(src, dst) AS a,
       |                        greatest(src, dst) AS b FROM e),
       |sym AS (SELECT a, b FROM und UNION ALL SELECT b, a FROM und),
       |reach(id, l) AS (
       |  SELECT a AS id, a AS l FROM sym
       |  UNION
       |  SELECT s.a, r.l FROM sym s JOIN reach r ON r.id = s.b)
       |SELECT id AS player_id, CAST(min(l) AS BIGINT) AS component_id
       |FROM reach GROUP BY id
       |ORDER BY player_id""".stripMargin)

  // ---------------------------------------------------------------- J6
  /** Community detection by synchronous label propagation (LPA) over
    * the undirected report graph — the density-aware sibling of J5's
    * connected components: CC merges everything reachable (one bridge
    * fuses two tight groups into one component), LPA lets each node
    * adopt its neighborhood's MAJORITY label, so sparsely-bridged
    * dense groups keep distinct communities (spec pins exactly that
    * shape: two cliques + one bridge → two communities where CC
    * yields one). Fully deterministic — SYNCHRONIZED rounds (no
    * update-order dependence), majority ties broken by smallest
    * label — so the DuckDB oracle replays the identical fixed-round
    * chain. Per round: one edge⋈label join + one (node, label) count
    * + one per-node top-1 under a node-partitioned window — O(E)
    * work, `LpaRounds` fixed; the edge relation rides the
    * lake-resident graph artifact.
    */
  val LpaRounds = 4

  private[graft] def lpa(und: DataFrame): DataFrame = {
    val eb = und.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(und.select(col("b").as("src"), col("a").as("dst")))
    var labels = eb.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
    for (_ <- 1 to LpaRounds) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("node").orderBy(col("c").desc, col("label"))
      labels = eb.join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("node", "label")
    }
    labels.select(col("node"), col("label").as("community"))
  }

  private def lpaSql: String = {
    val rounds = (1 to LpaRounds).map { r =>
      s"""l$r AS (
         |  SELECT node, label FROM (
         |    SELECT node, label,
         |      row_number() OVER (PARTITION BY node
         |        ORDER BY c DESC, label) AS rn
         |    FROM (SELECT e2.src AS node, l.label,
         |            CAST(count(*) AS BIGINT) AS c
         |          FROM eb e2 JOIN l${r - 1} l ON l.node = e2.dst
         |          GROUP BY e2.src, l.label))
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED ($edgesSql),
       |und AS (SELECT DISTINCT least(src, dst) AS a,
       |                        greatest(src, dst) AS b FROM e),
       |eb AS MATERIALIZED (SELECT a AS src, b AS dst FROM und
       |      UNION ALL SELECT b AS src, a AS dst FROM und),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM eb),
       |$rounds
       |SELECT node, label AS community FROM l$LpaRounds
       |ORDER BY node""".stripMargin
  }

  val qCommunities: Q = Q(
    (s, dir) => lpa(undirectedEdges(s, dir)).orderBy("node"),
    lpaSql)

  val registry: Map[String, Q] = Map(
    "q_suspicion_rank" -> qSuspicionRank,
    "q_mutual_reports" -> qMutualReports,
    "q_report_triangles" -> qReportTriangles,
    "q_report_components" -> qReportComponents,
    "q_communities" -> qCommunities)
}
