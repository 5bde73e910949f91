package graft.store

import graft.SparkSpec
import graft.dsl.Tsdb
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Randomized crash-schedule sweep over the bucket store — the chaos
  * complement to BucketStoreSpec's fixed crash points: each trial runs
  * a random interleaving of writes (including LWW overwrites),
  * predicate deletes, full and fragmented compactions, with crashes
  * injected at random replaceDir retire/promote windows, and asserts
  * after every crash AND at the end that reads equal an independent
  * driver-side LWW model. A final sweep must converge (clean marker
  * re-armed, no `.old-`/`.tmp-` debris).
  */
class StoreChaosSpec extends SparkSpec {
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val params = Gen.Parameters.default
  private var seed = Seed(23L)
  private def next[A](g: Gen[A]): A = {
    val v = g.pureApply(params, seed); seed = seed.next; v
  }

  private val t0 = 1705276800L * 1000000000L // 2024-01-15 00:00 UTC ns
  private val dayNs = 86400L * 1000000000L

  test("reads equal the LWW model across 12 random op/crash schedules") {
    (0 until 12).foreach { trial =>
      val dir = Files.createTempDirectory(s"graft-chaos-$trial")
      val tsdb = Tsdb(spark, dir.toString)
      tsdb.catalog.createOrg("o"); tsdb.catalog.createBucket("b", "o")

      // independent model: (host, time_ns) -> value, LWW by op order
      val model = scala.collection.mutable.Map.empty[(String, Long), Double]

      def snapshot(): Map[(String, Long), Double] =
        tsdb.from("b").toDF
          .select(col("tags.host"), col("time_ns"), col("value_f"))
          .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
          .toMap

      def check(ctx: String): Unit =
        assert(snapshot() == model.toMap, s"trial $trial diverged after $ctx")

      val nOps = 6 + next(Gen.chooseNum(0, 3))
      (0 until nOps).foreach { op =>
        next(Gen.chooseNum(0, 9)) match {
          case k if k <= 4 => // write, possibly overwriting an existing key
            val host = s"h${next(Gen.chooseNum(1, 3))}"
            val ts = t0 + next(Gen.chooseNum(0, 2)) * dayNs +
              next(Gen.chooseNum(0, 5)) * 3600L * 1000000000L
            val v = next(Gen.chooseNum(1, 99)).toDouble
            tsdb.writeLp("b", Seq(s"m,host=$host f=$v $ts"))
            model((host, ts)) = v
          case 5 | 6 => // predicate delete over a random day
            val day = next(Gen.chooseNum(0, 2))
            val (lo, hi) = (t0 + day * dayNs, t0 + (day + 1) * dayNs)
            tsdb.store.delete("b", lo, hi)
            model.filterInPlace { case ((_, ts), _) => ts < lo || ts >= hi }
          case 7 => // clean compaction (random flavor)
            if (next(Gen.chooseNum(0, 1)) == 0) tsdb.store.compact("b")
            else tsdb.store.compactFragmented("b", maxFiles = 1)
          case _ => // compaction killed at a RANDOM replaceDir window:
            // the k-th partition's retire/promote gap, so multi-day
            // sweeps crash after a partial rewrite too, not only at
            // their first partition
            val killAt = next(Gen.chooseNum(0, 2))
            var calls = 0
            tsdb.store.replaceCrashHook = p => {
              if (calls == killAt) throw new RuntimeException(s"chaos kill at $p")
              calls += 1
            }
            try intercept[RuntimeException] { tsdb.store.compact("b"); () }
            catch { case _: org.scalatest.exceptions.TestFailedException =>
              () // fewer than killAt+1 dirty partitions -> no crash fired
            }
            finally tsdb.store.replaceCrashHook = _ => ()
            check(s"op $op (compact crashed at window $killAt)")
        }
      }
      check("final op")
      // convergence: one clean sweep restores the fast path and leaves
      // no transition debris
      tsdb.store.compact("b")
      check("converging sweep")
      if (model.nonEmpty) assert(tsdb.store.isClean("b"), s"trial $trial not clean")
      val names = tsdb.catalog.bucketPath("b").toFile.listFiles().map(_.getName)
      assert(!names.exists(n => n.startsWith(".old-") || n.startsWith(".tmp-")),
        s"trial $trial left debris: ${names.mkString(",")}")
    }
  }
}
