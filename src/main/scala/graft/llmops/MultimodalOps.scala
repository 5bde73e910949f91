package graft.llmops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads
  * with a typed metadata struct, processed by batched per-partition
  * functions — the Scala analogue of `mapInPandas` (iterator of
  * fixed-size batches per partition, so a real decoder amortizes model
  * / codec setup per batch, not per row).
  *
  * The byte-level decode itself is STUBBED with a deterministic fake —
  * this container has no image/audio codecs — but everything Spark-side
  * is real and tested: the schema, the binary payload flow, the batch
  * iterator shape, the partitioning, and the frame-explosion plumbing.
  * Swapping `StubCodec` for a JNI/ONNX decoder changes no plan shape.
  */
object MultimodalOps {

  /** media table schema: one row per asset. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType))), nullable = false)
  ))

  /** STUB decode/featurize: a real implementation calls the codec here
    * (per BATCH, not per row). The fake derives a deterministic feature
    * vector from the payload bytes so tests can assert end-to-end.
    */
  object StubCodec {
    def features(bytes: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L // deterministic FNV-ish fold of the payload
      var i = 0
      while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
      var d = 0
      while (d < dim) {
        h = h * 6364136223846793005L + 1442695040888963407L
        out(d) = ((h >>> 33).toInt % 1000) / 1000.0f
        d += 1
      }
      out
    }

    /** STUB resize: a real image codec re-encodes; the fake re-derives a
      * payload of the target size deterministically.
      */
    def resize(bytes: Array[Byte], w: Int, hgt: Int): Array[Byte] = {
      val out = new Array[Byte]((w.toLong * hgt % 4096).toInt max 16)
      var i = 0
      while (i < out.length) { out(i) = bytes(i % bytes.length); i += 1 }
      out
    }
  }

  /** Batched feature extraction — mapInPandas-shaped: each partition's
    * rows are consumed in `batchSize` groups, the codec is invoked once
    * per batch, and rows are emitted with an appended `features` column.
    * Repartition upstream by media_id to spread decode cost.
    */
  def extractFeatures(df: DataFrame, dim: Int, batchSize: Int = 64): DataFrame = {
    val outSchema = df.schema.add("features", ArrayType(FloatType, containsNull = false))
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(outSchema)
    val bytesIdx = df.schema.fieldIndex("bytes")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one codec call-site per batch (amortizes real-codec setup)
        batch.map { row =>
          val f = StubCodec.features(row.getAs[Array[Byte]](bytesIdx), dim)
          Row.fromSeq(row.toSeq :+ f.toSeq)
        }
      }
    }
  }

  /** Batched resize for image rows: new payload + updated meta. */
  def resizeImages(df: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    implicit val enc: ExpressionEncoder[Row] = ExpressionEncoder(df.schema)
    val bytesIdx = df.schema.fieldIndex("bytes")
    val metaIdx = df.schema.fieldIndex("meta")
    val kindIdx = df.schema.fieldIndex("kind")
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { row =>
          if (row.getString(kindIdx) != "image") row
          else {
            val nb = StubCodec.resize(row.getAs[Array[Byte]](bytesIdx), w, h)
            val m = row.getStruct(metaIdx)
            val nm = Row(m.get(0), w, h, m.get(3), m.get(4))
            Row.fromSeq(row.toSeq.updated(bytesIdx, nb).updated(metaIdx, nm))
          }
        }
      }
    }
  }

  /** Frame sampling for video rows: one output row per `everyMs` offset
    * within the asset duration — pure Spark explode (distributed, no
    * codec needed to *plan* the frames; the payload slice is the stub).
    */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.filter(col("kind") === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(everyMs))))
      .withColumn("frame_bytes", // STUB: a real codec seeks+decodes here
        substring(col("bytes"), (col("frame_ms") % 32).cast("int") + 1, lit(16)))
      .select(col("media_id"), col("frame_ms"), col("frame_bytes"))

  /** Deterministic synthetic media table for tests/bench. */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val bytes = Array.tabulate[Byte](64 + i % 64)(j => ((i * 31 + j * 7) % 251).toByte)
      val meta = kind match {
        case "image" => Row("image/png", 640, 480, null, null)
        case "audio" => Row("audio/wav", null, null, 16000, 2000L + i)
        case _       => Row("video/mp4", 1280, 720, null, 1000L * (1 + i % 5))
      }
      Row(i.toLong, kind, bytes, meta)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq, 4), mediaSchema)
  }
}
