package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph centrality over aggregated edge tables (Page et al. 1999).
  *
  * The intended shape at scale: the raw corpus (events, hyperlinks,
  * session transitions) is first collapsed to a WEIGHTED EDGE TABLE by
  * a map-side-combinable count aggregate — that is the only pass over
  * big data. Power iteration then runs on the aggregated table: each
  * step is one equi-join of the rank table to the edge table on `src`
  * plus one aggregate on `dst` — a per-iteration cost of
  * O(|edges aggregated|), never O(|raw rows|), and a plain shuffle
  * join that needs no broadcast assumption when the node domain is
  * large (Catalyst broadcasts by itself when it is small, as with
  * event-type or host graphs).
  *
  * Determinism: the damping constants are written as `1.0 − d` and `d`
  * in BOTH engines (the oracle spells `(1.0 - 0.85)`, not `0.15` — the
  * IEEE subtraction result differs from the decimal literal by one
  * ulp), per-edge mass is the single expression r·w/wout, and the only
  * order-sensitive reduction is the incoming-mass sum whose ulp noise
  * the round(4) gate output absorbs.
  */
object GraphOps {

  /** Weighted PageRank with uniform teleport and dangling-mass
    * redistribution: r′(j) = (1−d)/N + d·(Σ_{i→j} r(i)·w_ij/wout_i
    * + dangling/N), iterated `iters` times from the uniform vector.
    * Returns (node, r).
    */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
      wCol: String, d: Double = 0.85, iters: Int = 5): DataFrame = {
    require(iters >= 1 && d > 0 && d < 1, s"need 0<d<1, iters>=1; got $d, $iters")
    // Materialize the aggregated edge table once: every iteration (and
    // the nodes/out-weight prep) re-references it, and without the cut
    // each reference re-executes the upstream corpus pass — the sf0.1
    // session graph paid the transitions window ~12×  (18.8 s → in-
    // family) before this. The edge table is the SMALL side by design
    // (post-aggregation), so the checkpoint is vocabulary-sized.
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(wCol).cast("double").as("w")).localCheckpoint()
    // Loop-invariant frames materialized ONCE (r18): nodes, the
    // wout-annotated edge table and the src set were previously part of
    // every iteration's plan — each of the 5 iterations re-ran the
    // node-domain distinct, the out-weight aggregate and the e⋈ow join.
    // All three are edge/node-domain-sized (post-aggregation, small by
    // design — see the header). The node COUNT is collected once and
    // folded into literals: (1−d)/n and the runtime dm/n use the same
    // IEEE doubles as the per-row divisions they replace, so ranks are
    // bit-identical.
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    val nn = nodes.count().toDouble
    val ow = e.groupBy("src").agg(sum("w").as("wout"))
    val enorm = e.join(ow, "src").localCheckpoint()
    val srcs = ow.select("src").localCheckpoint()
    var r = nodes.select(col("node"), lit(1.0 / nn).as("r"))
    for (k <- 1 to iters) {
      // Mass sitting on nodes with no outgoing edges teleports uniformly.
      val dm = r.join(srcs, r("node") === srcs("src"), "left_anti")
        .agg(coalesce(sum("r"), lit(0.0)).as("dm"))
      val inc = enorm.join(r, enorm("src") === r("node"))
        .groupBy("dst")
        .agg(sum(col("r") * col("w") / col("wout")).as("s"))
      r = nodes.crossJoin(broadcast(dm))
        .join(inc, col("node") === inc("dst"), "left")
        .select(col("node"),
          (lit((1.0 - d) / nn) +
            lit(d) * (coalesce(col("s"), lit(0.0)) + col("dm") / lit(nn))).as("r"))
      // Truncate lineage every step: the rank frame is node-domain-
      // sized (tiny next to the corpus), but an unbounded iteration
      // chain both doubles Catalyst's analysis work per step and
      // re-executes the whole chain each time the next step's
      // dangling-mass aggregate and incoming join reference it.
      if (k < iters) r = r.localCheckpoint()
    }
    r
  }

  /** Undirected edge list → canonical symmetric form, self-loops and
    * duplicates removed. All the verbs below run on this and require
    * INTEGRAL node ids (the long cast is the canonical label space the
    * min-propagation orders on; string-keyed graphs should surrogate
    * first — pagerank above stays type-agnostic).
    */
  private def sym(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v")).where(col("u") =!= col("v"))
    e.union(e.select(col("v").as("u"), col("u").as("v"))).distinct()
  }

  /** Connected components → (node, cid) with cid = the component's
    * minimum node id, a deterministic canonical label. Delegates to
    * the engine's proven alternating large-star/small-star CC
    * ([[graft.llmops.DedupOps.connectedComponents]], Kiveris et al.
    * SoCC '14), which contracts every component to a star around its
    * minimum in O(log² n) rounds REGARDLESS of diameter — a
    * round-per-hop min-propagation loop was tried here first and its
    * round count scaled with the longest entity chain (10× data →
    * 10×-longer order chains → 10× rounds on the probe corpus), which
    * is exactly the failure mode the star algorithm exists to avoid.
    * One implementation serves both the near-dup cluster verbs and
    * this graph verb.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 50): DataFrame =
    graft.llmops.DedupOps.connectedComponents(
        edges.select(col(srcCol).as("id_a"), col(dstCol).as("id_b")),
        "id_a", "id_b", maxIters)
      .select(col("id").as("node"), col("cluster_id").as("cid"))

  /** Multi-source BFS levels over an undirected graph: every seed is
    * level 0; each round the frontier's unvisited neighbors get the
    * next level. Returns (node, level) for REACHED nodes only.
    *
    * Scale shape: per round, one join of the frontier against the
    * edge table plus one anti-join against the visited set — frontier
    * and visited are node-domain-sized; rounds = eccentricity of the
    * seed set (levels ARE distances — no jumping shortcut exists),
    * each round's frames localCheckpointed. The same one-row count
    * drives termination; the loop cannot run forever (visited grows
    * strictly), so `maxIters` only fences a truly degenerate input.
    */
  def bfsLevels(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, seedCol: String, maxIters: Int = 10000): DataFrame = {
    val e = sym(edges, srcCol, dstCol).localCheckpoint()
    // LAZY per-round checkpoints materialized by the same count that
    // drives termination — one job per round instead of a probe job
    // plus an eager-checkpoint job (the connectedComponents lesson:
    // these loops are scheduling-bound, not data-bound, at gate scale)
    var visited = seeds.select(col(seedCol).cast("long").as("node"))
      .distinct().select(col("node"), lit(0).as("level"))
      .localCheckpoint(eager = false)
    var frontier = visited
    var frontierCount = frontier.count() // materializes the seed checkpoint
    var round = 0
    var sinceCp = 0
    while (frontierCount > 0) {
      round += 1
      require(round <= maxIters,
        s"bfsLevels: frontier alive after $maxIters rounds")
      frontier = e.join(frontier, e("u") === frontier("node"))
        .select(col("v").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .select(col("node"), lit(round).as("level"))
        .localCheckpoint(eager = false)
      frontierCount = frontier.count() // materialize + emptiness in one job
      // visited is a union TREE of already-checkpointed frontiers, so
      // it needs no eager materialization of its own each round (the
      // loop is round-sequential and scheduling-bound — every saved
      // job matters); re-checkpoint every 8 rounds only to keep the
      // anti-join's plan from growing linearly with eccentricity
      visited = visited.union(frontier)
      sinceCp += 1
      if (sinceCp == 8) { visited = visited.localCheckpoint(); sinceCp = 0 }
    }
    visited
  }

  /** Exact triangle count by degree orientation (Schank & Wagner 2005;
    * the MapReduce form in Suri & Vassilvitskii 2011): orient every
    * undirected edge from its lower-degree endpoint to the higher
    * (ties by id), join oriented wedges u→v, u→w (v<w by the same
    * order) against the oriented closing edge v→w. The orientation
    * bounds every node's out-degree by O(√m), so the wedge join emits
    * O(m^{3/2}) candidates — the quadratic hub fan-out a naive
    * neighbor self-join pays on skewed degree distributions never
    * materializes. One row: (n_triangles).
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = sym(edges, srcCol, dstCol).localCheckpoint()
    val deg = e.groupBy(col("u").as("n")).agg(count(lit(1)).as("d"))
    // orient: keep (u,v) iff (d(u), u) < (d(v), v)
    val oriented = e
      .join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .where(col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v")))
      .select("u", "v")
      .localCheckpoint()
    // each triangle's (deg, id)-minimum vertex emits exactly one
    // wedge (its two out-neighbors, id-ordered); the closing edge is
    // checked against the id-ordered undirected edge set
    val wedges = oriented.as("a").join(oriented.as("b"), col("a.u") === col("b.u"))
      .where(col("a.v") < col("b.v"))
      .select(col("a.v").as("x"), col("b.v").as("y"))
    wedges.join(e.where(col("u") < col("v"))
        .select(col("u").as("x"), col("v").as("y")),
        Seq("x", "y"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Degree histogram of an undirected graph: (degree, n_nodes). */
  def degreeHistogram(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    sym(edges, srcCol, dstCol)
      .groupBy(col("u").as("node")).agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
}
