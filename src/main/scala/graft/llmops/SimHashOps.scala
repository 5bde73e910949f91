package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection.
  *
  * A 60-bit SimHash per document, derived from md5 hex digits of each
  * token occurrence (weighted by multiplicity), packed into four 15-bit
  * chunks. Pairs within Hamming distance 3 must share at least one
  * identical chunk (pigeonhole), so candidate generation is a chunk
  * equi-join — no all-pairs comparison. md5-derived bits keep the
  * construction engine-independent (the DuckDB oracle replicates it
  * bit-for-bit).
  */
object SimHashOps {

  val Bits = 60
  val Chunks = 4
  val ChunkBits = Bits / Chunks // 15

  /** Per-document chunk values: (id, c0, c1, c2, c3).
    *
    * Single pass per partition — each document's 60 bit-counters
    * accumulate locally over its tokens (bit i of a token = bit (i%4)
    * of hex digit i/4 of md5(token), identical to the SQL-replicable
    * definition the oracle uses). The explode-based formulation
    * (tokens × 60 bit-rows + two shuffles) costs ~10× at sf0.1 for the
    * same result.
    */
  def simHashChunks(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val counts = new Array[Int](Bits)
          val toks = text.toLowerCase.replaceAll("\\s+", " ").trim.split(" ")
          var t = 0
          while (t < toks.length) {
            md.reset()
            val digest = md.digest(toks(t).getBytes("UTF-8"))
            var i = 0
            while (i < Bits) {
              val hexIdx = i / 4 // md5 hex digit index; high nibble first
              val b = digest(hexIdx / 2) & 0xff
              val digit = if (hexIdx % 2 == 0) b >> 4 else b & 0xf
              counts(i) += (if (((digit >> (i % 4)) & 1) == 1) 1 else -1)
              i += 1
            }
            t += 1
          }
          val chunks = new Array[Long](Chunks)
          var i = 0
          while (i < Bits) {
            if (counts(i) > 0) chunks(i / ChunkBits) |= (1L << (i % ChunkBits))
            i += 1
          }
          (id, chunks(0), chunks(1), chunks(2), chunks(3))
        }
      }.toDF("id", "c0", "c1", "c2", "c3")
  }

  /** Pairs with Hamming distance <= maxHd (requires maxHd < Chunks so
    * the pigeonhole candidate join is exact). Returns (id_a, id_b, hd).
    */
  def simHashPairs(chunks: DataFrame, maxHd: Int = 3): DataFrame = {
    require(maxHd < Chunks, s"pigeonhole requires maxHd < $Chunks")
    val long = chunks.select(col("id"),
      explode(array((0 until Chunks).map(k =>
        struct(lit(k).as("k"), col(s"c$k").as("v"))): _*)).as("kv"))
      .select(col("id"), col("kv.k").as("k"), col("kv.v").as("v"))
    val cands = long.as("a")
      .join(long.as("b"),
        col("a.k") === col("b.k") && col("a.v") === col("b.v") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val hd = (0 until Chunks).map(k =>
      bit_count(col(s"ca.c$k").bitwiseXOR(col(s"cb.c$k")))).reduce(_ + _)
    cands
      .join(chunks.as("ca"), col("id_a") === col("ca.id"))
      .join(chunks.as("cb"), col("id_b") === col("cb.id"))
      .withColumn("hd", hd)
      .filter(col("hd") <= maxHd)
      .select(col("id_a"), col("id_b"), col("hd"))
  }
}
