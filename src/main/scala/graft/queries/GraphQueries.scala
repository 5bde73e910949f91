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
  private[queries] def chainEdges(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("prev", lag(col("o_orderkey"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("prev").as("src"), col("o_orderkey").as("dst"))
  }

  /** Co-ordered part pairs (u < v) appearing in at least `minCo`
    * orders: per-order part cliques from one self-join of lineitem on
    * the order key — candidate rows are bounded by Σ(per-order
    * lines)², i.e. order-local — then aggregated to the
    * part-domain-bounded edge set. The part domain is FIXED while
    * orders scale, so the ≥1 graph saturates toward complete at
    * higher SF (every pair eventually co-occurs by chance); the
    * triangle gate uses minCo = 2 (repeat co-occurrence = signal),
    * which also keeps the wedge join off the dense regime.
    */
  private def coorderEdges(s: SparkSession, dir: String,
      minCo: Int = 1): DataFrame = {
    // Posting-list pair emission (r18; the DedupOps.exactJaccardPairs
    // shape) instead of distinct + self-join: ONE shuffle collects each
    // order's distinct part set (collect_set partial-aggregates
    // map-side, so repeated part lines collapse before the exchange —
    // the old separate distinct paid a full (order, part) shuffle just
    // for that), then a compiled flatMap emits each order's C(k,2)
    // id-ordered pairs and one aggregate counts co-orders. 4 Exchanges
    // → 2, and the quadratic term is unchanged (Σ per-order k² is the
    // candidate set either way; TPC-H order cliques are ≤ 7 parts).
    // Edges are identical: per order each unordered pair appears once,
    // so count(1) is the distinct co-order count, as before.
    import s.implicits._
    val pairs = lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy("l_orderkey").agg(collect_set(col("l_partkey")).as("parts"))
      .select(col("parts")).as[Seq[Long]]
      .flatMap { parts =>
        val a = parts.toArray
        java.util.Arrays.sort(a)
        for (i <- a.indices.iterator; j <- (i + 1) until a.length)
          yield (a(i), a(j))
      }
      .toDF("u", "v")
    pairs.groupBy("u", "v")
      .agg(count(lit(1)).as("nco"))
      .where(col("nco") >= minCo)
      .select("u", "v")
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

    // Generic multi-source BFS from the %100==0 part nodes over the
    // repeat-co-order graph. The GRAPH CHOICE is the scale decision:
    // BFS rounds = seed-set eccentricity, and the customer-chain
    // graph's eccentricity grows linearly with data (10× data made
    // chains 10× longer → an 18× probe ratio), while the part
    // co-order graph's diameter is bounded by its fixed node domain —
    // rounds stay constant and only per-round work grows. The oracle
    // replays BFS as a level-capped recursive CTE with a min-level
    // collapse.
    "bfs_levels" -> ((s, dir) => {
      // materialized (r18): consumed by the node/seed derivation AND
      // bfsLevels' symmetrization — the per-job profile showed the
      // whole collect_set edge build running twice (~0.9 s of 5.1 s)
      val e = coorderEdges(s, dir, minCo = 2).localCheckpoint()
      val nodes = e.select(col("u").as("n"))
        .union(e.select(col("v").as("n"))).distinct()
      val seeds = nodes.where(col("n") % 100 === 0)
      graft.operators.GraphOps
        .bfsLevels(e, "u", "v", seeds, "n")
        .select(col("node"), col("level").cast("int").as("level"))
        .orderBy("node")
    }),

    // Degree-oriented exact triangle count on the repeat-co-order
    // graph (pairs co-ordered ≥2 times) — the oracle closes wedges
    // with the naive two-join form.
    "graph_triangles" -> ((s, dir) =>
      graft.operators.GraphOps
        .triangleCount(coorderEdges(s, dir, minCo = 2), "u", "v")),

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

    // level-capped recursion: UNION dedups exact (node, level) rows,
    // so cycles keep emitting higher levels until the cap — 30 is far
    // above this domain-bounded graph's diameter, and if the true
    // eccentricity ever exceeded it the engine would return MORE rows
    // than the oracle and the gate would fail loudly
    "bfs_levels" -> w(
      """WITH RECURSIVE pp AS MATERIALIZED (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2),
        |und AS MATERIALIZED (SELECT u, v FROM pp UNION SELECT v, u FROM pp),
        |walk(node, level) AS (
        |  SELECT DISTINCT u, 0 FROM und WHERE u % 100 = 0
        |  UNION
        |  SELECT und.v, w.level + 1
        |  FROM walk w JOIN und ON und.u = w.node WHERE w.level < 30)
        |SELECT node, CAST(min(level) AS INT) AS level
        |FROM walk GROUP BY 1 ORDER BY 1"""),

    "graph_triangles" -> w(
      """WITH pp AS MATERIALIZED (
        |  SELECT a.l_partkey AS u, b.l_partkey AS v
        |  FROM lineitem a JOIN lineitem b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |  GROUP BY 1, 2 HAVING count(DISTINCT a.l_orderkey) >= 2)
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
