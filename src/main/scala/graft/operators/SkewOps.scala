package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skewed shuffle joins — the manual fallback when a
  * hot key concentrates a join's work on one task and AQE's skew-join
  * split can't help (AQE only splits SORT-MERGE partitions; a hot key
  * inside an aggregation-fed join, or a deployment with AQE off, still
  * needs salting).
  *
  * Shape: the probe (big, skewed) side appends a salt drawn
  * deterministically from a row hash, `salts` values; the build side is
  * replicated `salts` times with every salt value. The join key becomes
  * (key, salt), so the hot key's rows spread over `salts` tasks while
  * each still finds its full build-side match set. Build-side cost:
  * `salts×` replication — use for moderate fan-out (8–64) on a side
  * that is much smaller than the probe side but too big to broadcast.
  *
  * Row-hash salting keeps results EXACTLY equal to the plain join for
  * equi-join semantics (inner/left) because every probe row still meets
  * every matching build row exactly once — pinned by the gate, which
  * hash-compares a salted star join to the plain-SQL oracle.
  */
object SkewOps {

  /** Inner/left equi-join with a salted key. `probe` is the big skewed
    * side; `build` is replicated `salts` times.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: Column,
                 buildKey: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // deterministic per-row salt: spread by a hash of the whole probe
    // row (NOT the join key — the hot key must fan out, so its salt has
    // to vary across its rows)
    val salted = probe.withColumn("_salt",
      pmod(hash(probe.columns.map(col): _*), lit(salts)))
    val replicated = build
      .withColumn("_salt", explode(lit((0 until salts).toArray)))
    salted.join(replicated,
        probeKey === buildKey && salted("_salt") === replicated("_salt"),
        joinType)
      .drop(salted("_salt")).drop(replicated("_salt"))
  }

  /** Bloom-prefiltered inner equi-join — the manual runtime filter for
    * the selective fact-fact join: when only a small fraction of the
    * probe side has a partner (a filtered dimension, a sparse fact),
    * the plain join still SHUFFLES every probe row just to drop most
    * of them at the merge. Build an m-bit Bloom filter over the build
    * side's keys (one small aggregation, OR-merged map-side), probe it
    * executor-side BEFORE the exchange, and only the ~matching slice
    * pays the shuffle. False positives let a few extra rows through
    * the filter — the join then drops them, so results are EXACTLY the
    * plain join's (what the gate pins); false negatives cannot happen.
    *
    * This is Spark's own runtime-filter idea surfaced as an explicit,
    * size-controllable operator: AQE's bloom runtime filters only fire
    * under cost heuristics and creation thresholds; at a known 100 TB
    * shape you want the filter unconditionally and sized by hand.
    */
  def bloomFilteredJoin(probe: DataFrame, build: DataFrame,
      probeKey: Column, buildKey: Column,
      mBits: Int = 1 << 20, kHashes: Int = 4): DataFrame = {
    // one aggregated blob (mBits/8 bytes) to the driver, re-emitted as
    // a LITERAL: every probe row then sees the same array INSTANCE, so
    // BloomContains' identity memo parses the filter once per task. A
    // broadcast column would hand each row a fresh defensive copy
    // (UnsafeRow getters copy) and force a per-row byte-compare —
    // measured 17 s vs 0.5 s on the sf0.1 gate. Driver payload is
    // filter-sized, never row-scale (same class as the IVF codebooks).
    val bloomBytes = build
      .agg(call_function("graft_bloom_bytes",
        buildKey, lit(mBits), lit(kHashes)).as("_bloom"))
      .head.getAs[Array[Byte]](0)
    probe
      .filter(call_function("graft_bloom_contains", lit(bloomBytes), probeKey))
      .join(build, probeKey === buildKey)
  }

  /** Shuffle-planning diagnostic: per-key frequency skew of a join/agg
    * key — row count, key cardinality, heaviest-key share, and Shannon
    * entropy of the key distribution (vs ln(n_keys) for uniform). The
    * measurement that decides whether a key needs [[saltedJoin]]
    * before it hits a 1000-executor shuffle. One groupBy at key
    * cardinality + one aggregate over the count frame — no windows.
    */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
    counts.agg(
        sum(col("c")).cast("long").as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("c")).cast("long").as("max_key_rows"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("_sclogc"))
      .select(lit(keyCol).as("key_col"), col("n_rows"), col("n_keys"),
        col("max_key_rows"),
        (col("max_key_rows").cast("double") / col("n_rows")).as("max_share"),
        // H = ln(n) − Σ c·ln(c) / n  (exact counts; one FP fold)
        (log(col("n_rows").cast("double")) - col("_sclogc") / col("n_rows"))
          .as("entropy"),
        log(col("n_keys").cast("double")).as("max_entropy"))
  }
}
