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
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nRow = nodes.agg(count(lit(1)).cast("double").as("nn"))
    val ow = e.groupBy("src").agg(sum("w").as("wout"))
    var r = nodes.crossJoin(broadcast(nRow))
      .select(col("node"), (lit(1.0) / col("nn")).as("r"))
    for (k <- 1 to iters) {
      // Mass sitting on nodes with no outgoing edges teleports uniformly.
      val dm = r.join(ow, r("node") === ow("src"), "left_anti")
        .agg(coalesce(sum("r"), lit(0.0)).as("dm"))
      val inc = e.join(r, e("src") === r("node"))
        .join(ow, "src")
        .groupBy("dst")
        .agg(sum(col("r") * col("w") / col("wout")).as("s"))
      r = nodes.crossJoin(broadcast(nRow)).crossJoin(broadcast(dm))
        .join(inc, col("node") === inc("dst"), "left")
        .select(col("node"),
          (lit(1.0 - d) / col("nn") +
            lit(d) * (coalesce(col("s"), lit(0.0)) + col("dm") / col("nn"))).as("r"))
      // Truncate lineage every step: the rank frame is node-domain-
      // sized (tiny next to the corpus), but an unbounded iteration
      // chain both doubles Catalyst's analysis work per step and
      // re-executes the whole chain each time the next step's
      // dangling-mass aggregate and incoming join reference it.
      if (k < iters) r = r.localCheckpoint()
    }
    r
  }
}
