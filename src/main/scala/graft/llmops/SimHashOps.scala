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

  /** Per-document chunk values: (id, c0, c1, c2, c3). */
  def simHashChunks(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
    // bit i of a token = bit (i%4) of hex digit i/4 of md5(tok)
    val bits = toks
      .withColumn("h", md5(col("tok")))
      .select(col("id"), col("h"), explode(sequence(lit(0), lit(Bits - 1))).as("i"))
      .withColumn("digit",
        instr(lit("0123456789abcdef"), substring(col("h"), (col("i") / 4).cast("int") + 1, lit(1))) - 1)
      .withColumn("bit",
        (floor(col("digit") / pow(lit(2.0), col("i") % 4)).cast("long") % 2))
      .withColumn("vote", when(col("bit") === 1, 1).otherwise(-1))
    val signs = bits.groupBy("id", "i")
      .agg(sum(col("vote")).as("s"))
      .withColumn("b", when(col("s") > 0, 1L).otherwise(0L))
    signs
      .withColumn("chunk", (col("i") / ChunkBits).cast("int"))
      .withColumn("contrib", col("b") * pow(lit(2.0), col("i") % ChunkBits).cast("long"))
      .groupBy("id")
      .pivot("chunk", Seq(0, 1, 2, 3))
      .agg(sum(col("contrib")))
      .withColumnsRenamed(Map("0" -> "c0", "1" -> "c1", "2" -> "c2", "3" -> "c3"))
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
