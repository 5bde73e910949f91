package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property-style stress over the sketch STATES (no Spark session —
  * pure JVM, hundreds of randomized cases): the invariants the
  * hash-gates can't sweep (they pin one dataset; these sweep sizes,
  * capacities, partitionings, and orders from a deterministic LCG).
  */
class SketchPropertiesSpec extends AnyFunSuite {

  private def lcg(seed: Long, n: Int, bound: Long): Array[Long] = {
    var x = seed
    Array.fill(n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      (x >>> 11) % bound
    }
  }

  test("KLL exact mode: any size/k with k >= n, any shard split, exact ranks") {
    for (seed <- 1 to 30) {
      val n = 50 + (seed * 97) % 900
      val vals = lcg(seed, n, 100000).map(_.toDouble)
      val shards = 1 + seed % 5
      val states = Array.fill(shards)(new KllState(1024))
      vals.zipWithIndex.foreach { case (v, i) => states(i % shards).update(v) }
      val merged = states.reduceLeft { (a, b) => a.merge(b); a }
      val sorted = vals.sorted
      for (q <- Seq(0.01, 0.25, 0.5, 0.9, 1.0)) {
        val want = sorted(math.max(1, math.ceil(q * n).toInt) - 1)
        val got = merged.quantiles(Array(q)).head
        assert(got == want, s"seed=$seed n=$n q=$q")
      }
    }
  }

  test("KLL compacted: rank error stays bounded across sizes and ks") {
    for ((k, maxErr) <- Seq(64 -> 0.08, 256 -> 0.03, 1024 -> 0.01); seed <- 1 to 5) {
      val n = 30000 + seed * 7000
      val vals = lcg(seed * 13, n, 1000000).map(_.toDouble)
      val st = new KllState(k)
      vals.foreach(st.update)
      val sorted = vals.sorted
      for (q <- Seq(0.1, 0.5, 0.9)) {
        val est = st.quantiles(Array(q)).head
        val rank = {
          // binary search: count of values <= est
          var lo = 0; var hi = sorted.length
          while (lo < hi) {
            val mid = (lo + hi) / 2
            if (sorted(mid) <= est) lo = mid + 1 else hi = mid
          }
          lo
        }
        val err = math.abs(rank.toDouble / n - q)
        assert(err <= maxErr, s"k=$k seed=$seed q=$q err=$err")
      }
    }
  }

  test("SpaceSaving: the presence guarantee holds under any stream order") {
    for (seed <- 1 to 20) {
      val capacity = 32 + seed % 64
      val n = 20000
      // one planted heavy item at ~3x the guarantee threshold
      val heavyCount = 3 * n / capacity
      val tail = lcg(seed, n - heavyCount, 4000).map(v => s"t$v")
      val stream = scala.util.Random.javaRandomToRandom(
        new java.util.Random(seed)).shuffle(
        (Array.fill(heavyCount)("HEAVY") ++ tail).toSeq)
      val st = new SpaceSavingState(capacity)
      stream.foreach(st.update)
      val top = st.topK(capacity).map(_._1)
      assert(top.contains("HEAVY"), s"seed=$seed capacity=$capacity")
      // count is an overestimate, never an underestimate
      val cnt = st.topK(capacity).find(_._1 == "HEAVY").get._2
      assert(cnt >= heavyCount)
    }
  }

  test("bitmap: cardinality equals distinct count over random sparse domains") {
    for (seed <- 1 to 20) {
      val ids = lcg(seed, 5000, if (seed % 2 == 0) 10000L else 1L << 40)
      val shards = 1 + seed % 4
      val states = Array.fill(shards)(new BitmapState)
      ids.zipWithIndex.foreach { case (v, i) => states(i % shards).add(v) }
      val merged = states.reduceLeft { (a, b) => a.merge(b); a }
      assert(merged.cardinality == ids.distinct.length.toLong, s"seed=$seed")
    }
  }

  test("HLL: sharded merge == direct registers; error within envelope") {
    for (seed <- 1 to 20) {
      val n = 2000 + (seed * 131) % 8000
      val keys = lcg(seed, n, 1L << 30).map(_.toString)
      val shards = 1 + seed % 5
      val states = Array.fill(shards)(new HllState(12))
      keys.zipWithIndex.foreach { case (k, i) => states(i % shards).add(k) }
      val merged = states.reduceLeft { (a, b) => a.merge(b); a }
      val direct = new HllState(12)
      keys.foreach(direct.add)
      assert(java.util.Arrays.equals(merged.registers, direct.registers), s"seed=$seed")
      val distinct = keys.distinct.length
      val err = math.abs(merged.estimate - distinct) / distinct
      assert(err < 0.08, s"seed=$seed n=$distinct est=${merged.estimate}")
    }
  }

  test("KMV: merge == direct set; exact below k; estimate sane above") {
    for (seed <- 1 to 20) {
      val n = 500 + (seed * 97) % 5000
      val keys = lcg(seed, n, 1L << 30).map(_.toString)
      val k = 16 + (seed * 7) % 240
      val shards = 1 + seed % 5
      val states = Array.fill(shards)(new KmvState(k))
      keys.zipWithIndex.foreach { case (key, i) => states(i % shards).addKey(key) }
      val merged = states.reduceLeft { (a, b) => a.merge(b); a }
      val direct = new KmvState(k)
      keys.foreach(direct.addKey)
      assert(merged.hashes == direct.hashes, s"seed=$seed")
      val distinct = keys.distinct.length
      if (distinct < k) assert(merged.estimate == distinct.toDouble, s"seed=$seed")
      else {
        val err = math.abs(merged.estimate - distinct) / distinct
        // relative SE ~ 1/sqrt(k-2); allow 4 sigma
        assert(err < 4.0 / math.sqrt(k - 2.0), s"seed=$seed k=$k err=$err")
      }
    }
  }

  test("Bloom: never a false negative under any sharding; FP bounded") {
    for (seed <- 1 to 15) {
      val n = 500 + (seed * 61) % 2000
      val members = lcg(seed, n, 1L << 40).map(v => s"m$v")
      val shards = 1 + seed % 4
      val states = Array.fill(shards)(new BloomState(65536, 4))
      members.zipWithIndex.foreach { case (m, i) => states(i % shards).add(m) }
      val merged = states.reduceLeft { (a, b) => a.merge(b); a }
      assert(members.forall(merged.contains), s"seed=$seed")
      val strangers = lcg(seed + 1000, 4000, 1L << 40).map(v => s"s$v")
        .filterNot(members.toSet)
      val fp = strangers.count(merged.contains).toDouble / strangers.length
      // design FP at n<=2500/65536/k=4 is < 2.6%; allow slack
      assert(fp < 0.06, s"seed=$seed fp=$fp")
    }
  }

  test("CMS: sharded add-merge == direct grid; never underestimates") {
    for (seed <- 1 to 20) {
      val items = lcg(seed, 8000, 300).map(v => s"i$v")
      val trueCounts = items.groupBy(identity).map { case (k, v) => k -> v.length }
      val shards = 1 + seed % 5
      val states = Array.fill(shards)(new CmsState(4, 256))
      items.zipWithIndex.foreach { case (it, i) => states(i % shards).add(it) }
      val merged = states.reduceLeft { (a, b) => a.merge(b); a }
      val direct = new CmsState(4, 256)
      items.foreach(direct.add)
      assert(merged.counts.sameElements(direct.counts), s"seed=$seed")
      trueCounts.foreach { case (it, c) =>
        assert(merged.estimate(it) >= c, s"seed=$seed item=$it")
      }
    }
  }
}
