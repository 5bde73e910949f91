package graft.llmops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Metamorphic invariants of connected components over random graphs —
  * generative coverage for the large-star/small-star implementation
  * beyond the gates' fixed constructions:
  *
  *  - totality: every vertex of the edge set lands in exactly one
  *    component, labeled by its component's MINIMUM id (the pinned
  *    representative rule);
  *  - edge consistency: both endpoints of every input edge share a
  *    label;
  *  - monotonicity: adding edges never increases the component count;
  *  - ground truth: labels equal a driver-side union-find on the same
  *    random graph, exactly.
  */
class GraphInvariantSpec extends SparkSpec {
  import spark.implicits._
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val params = Gen.Parameters.default
  private var seed = Seed(61L)
  private def next[A](g: Gen[A]): A = {
    val v = g.pureApply(params, seed); seed = seed.next; v
  }

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // fully compress, then label every vertex by its root's MIN member
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = verts.groupBy(find)
    byRoot.flatMap { case (_, vs) =>
      val m = vs.min; vs.map(_ -> m)
    }.toMap
  }

  test("CC equals a driver-side union-find on 8 random graphs, and obeys its invariants") {
    (0 until 8).foreach { trial =>
      val nVerts = next(Gen.chooseNum(20, 300))
      val nEdges = next(Gen.chooseNum(10, 500))
      val edges = (0 until nEdges).map { _ =>
        (next(Gen.chooseNum(0L, nVerts.toLong)) * 7L,
          next(Gen.chooseNum(0L, nVerts.toLong)) * 7L)
      }.filter(e => e._1 != e._2)
      if (edges.nonEmpty) {
        val got = DedupOps.connectedComponents(
          edges.toDF("id_a", "id_b")).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = unionFind(edges)
        assert(got == want, s"trial $trial: CC != union-find " +
          s"(${got.size} vs ${want.size} vertices)")
        // totality + min-representative are implied by equality with
        // the model, but pin them independently so a model bug cannot
        // mask an engine bug
        assert(got.keySet == edges.flatMap(e => Seq(e._1, e._2)).toSet)
        got.groupBy(_._2).foreach { case (cid, members) =>
          assert(members.keys.min == cid, s"trial $trial: rep not min in $cid")
        }
        edges.foreach { case (a, b) =>
          assert(got(a) == got(b), s"trial $trial: edge ($a,$b) split")
        }
        // monotonicity: adding edges only COARSENS the partition over
        // the original vertices — two base vertices sharing a label
        // must still share one (new edges may add brand-new vertices,
        // so the raw component COUNT can grow; the refinement order
        // is the correct invariant)
        val extra = (0 until 5).map { _ =>
          (next(Gen.chooseNum(0L, nVerts.toLong)) * 7L,
            next(Gen.chooseNum(0L, nVerts.toLong)) * 7L)
        }.filter(e => e._1 != e._2)
        if (extra.nonEmpty) {
          val after = DedupOps.connectedComponents(
            (edges ++ extra).toDF("id_a", "id_b")).collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
          got.groupBy(_._2).values.foreach { members =>
            val labels = members.keys.map(after).toSet
            assert(labels.size == 1,
              s"trial $trial: adding edges SPLIT a component ($labels)")
          }
        }
      }
    }
  }
}
