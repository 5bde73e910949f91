package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph-analytics gates over data-derived graphs ([[graft.operators
  * .GraphOps]] beyond the r11 PageRank): connected components, BFS
  * levels, exact triangle count, degree histogram.
  *
  * Two graphs, both built from the testdata with structure the oracle
  * can replay in closed form while the ENGINE runs the generic
  * iterative operator:
  *   - the ORDER-CHAIN graph: consecutive orders of one customer are
  *     linked, so components = customers (≥2 orders) and BFS distance
  *     along a chain = rank distance — SQL-checkable without
  *     recursion, while the engine's CC/BFS know nothing of chains;
  *   - the CO-ORDER graph: parts appearing in the same order pair up
  *     (per-order cliques), giving a real triangle/degree structure
  *     whose oracle is the naive two-join closure (fine at gate
  *     scale; the engine side runs the degree-oriented form that
  *     survives skew).
  */
object GraphQueries {
  import QueryUtil._

  /** Consecutive-order chain edges per customer: (prev, next) order
    * keys, one partitioned lag window at order cardinality.
    */
  private def chainEdges(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("prev", lag(col("o_orderkey"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("prev").as("src"), col("o_orderkey").as("dst"))
  }

  /** Distinct co-ordered part pairs (u < v): per-order part cliques
    * from one self-join of lineitem on the order key — candidate rows
    * are bounded by Σ(per-order lines)², i.e. order-local, then
    * deduplicated to the part-domain-bounded edge set.
    */
  private def coorderEdges(s: SparkSession, dir: String): DataFrame = {
    val l = lineitem(s, dir).select(col("l_orderkey"), col("l_partkey"))
    l.as("a").join(l.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
      .distinct()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Generic min-label-propagation CC on the chain graph → one row
    // per component (canonical min-node label, size). The oracle
    // exploits the construction (components = multi-order customers);
    // the engine does not.
    "graph_components" -> ((s, dir) =>
      graft.operators.GraphOps
        .connectedComponents(chainEdges(s, dir), "src", "dst")
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("size"))
        .orderBy("cid")),

    // Generic multi-source BFS from the %100==0 order nodes → (node,
    // level) for every reached node; the oracle replays levels as
    // rank distance within each customer chain.
    "bfs_levels" -> ((s, dir) => {
      val e = chainEdges(s, dir)
      val nodes = e.select(col("src").as("n"))
        .union(e.select(col("dst").as("n"))).distinct()
      val seeds = nodes.where(col("n") % 100 === 0)
      graft.operators.GraphOps
        .bfsLevels(e, "src", "dst", seeds, "n")
        .select(col("node"), col("level").cast("int").as("level"))
        .orderBy("node")
    }),

    // Degree-oriented exact triangle count on the co-order graph —
    // the oracle closes wedges with the naive two-join form.
    "graph_triangles" -> ((s, dir) =>
      graft.operators.GraphOps
        .triangleCount(coorderEdges(s, dir), "u", "v")),

    // Degree histogram of the co-order graph.
    "graph_degrees" -> ((s, dir) =>
      graft.operators.GraphOps
        .degreeHistogram(coorderEdges(s, dir), "u", "v")
        .orderBy("degree"))
  )

  private def w(s: String) = s.stripMargin

  val oracle: Map[String, String] = Map(
    "graph_components" -> w(
      """SELECT min(o_orderkey) AS cid, count(*) AS size
        |FROM orders GROUP BY o_custkey HAVING count(*) >= 2
        |ORDER BY cid"""),

    "bfs_levels" -> w(
      """WITH ch AS (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_orderdate, o_orderkey) AS rn,
        |    count(*) OVER (PARTITION BY o_custkey) AS k
        |  FROM orders),
        |c2 AS (SELECT * FROM ch WHERE k >= 2),
        |sd AS (SELECT o_custkey, rn AS srn FROM c2 WHERE o_orderkey % 100 = 0)
        |SELECT c.o_orderkey AS node,
        |  CAST(min(abs(c.rn - s.srn)) AS INT) AS level
        |FROM c2 c JOIN sd s ON c.o_custkey = s.o_custkey
        |GROUP BY 1 ORDER BY 1"""),

    "graph_triangles" -> w(
      """WITH pp AS MATERIALIZED (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        |SELECT count(*) AS n_triangles
        |FROM pp e1
        |JOIN pp e2 ON e2.u = e1.v
        |JOIN pp e3 ON e3.u = e1.u AND e3.v = e2.v"""),

    "graph_degrees" -> w(
      """WITH pp AS MATERIALIZED (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |und AS (SELECT u, v FROM pp UNION SELECT v, u FROM pp),
        |deg AS (SELECT u, count(*) AS degree FROM und GROUP BY 1)
        |SELECT degree, count(*) AS n_nodes FROM deg
        |GROUP BY 1 ORDER BY 1""")
  )
}
