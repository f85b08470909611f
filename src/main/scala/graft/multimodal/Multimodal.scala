package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: image/audio/video
  * travel as opaque `binary` payloads with a typed metadata struct; decoding
  * and feature extraction run per-partition so codec initialization is
  * amortized (the rich open/close lifecycle).
  *
  * The decode step itself is a STUB (`DeterministicFakeDecoder`) — this
  * container has no image/audio libraries — but everything Spark-side is
  * real and tested: the schema contract, the per-partition batch shape, the
  * payload-size-aware repartitioning, and the pure-Column operators
  * (resize arithmetic, frame sampling).
  *
  * Scale notes: payloads dominate row size, so partition sizing must follow
  * BYTES not row counts (`repartitionForDecode`); metadata-only transforms
  * prune the payload column away entirely at the scan.
  */
object Multimodal {

  /** Canonical media schema: the typed-metadata contract. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  /** Decoder contract. A real deployment binds libjpeg/ffmpeg here; the
    * expensive `open()` runs once per partition, never per record.
    */
  trait MediaDecoder extends Serializable {
    def open(): Unit = ()
    /** payload → fixed-width feature vector */
    def decodeFeatures(payload: Array[Byte], dims: Int): Array[Float]
    def close(): Unit = ()
  }

  /** Deterministic stand-in for a real codec: features derive from payload
    * bytes via a rolling hash, so tests are reproducible and the batch
    * plumbing is exercised with realistic shapes.
    */
  final class DeterministicFakeDecoder extends MediaDecoder {
    @transient private var opened = false
    override def open(): Unit = { opened = true }
    override def decodeFeatures(payload: Array[Byte], dims: Int): Array[Float] = {
      require(opened, "decoder used before open()")
      val out = new Array[Float](dims)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
      var d = 0
      while (d < dims) {
        val x = h ^ (d * 0x9E3779B97F4A7C15L)
        out(d) = ((x % 2000001L + 2000001L) % 2000001L - 1000000L) / 1000000.0f
        d += 1
      }
      out
    }
  }

  /** Decode payloads into feature vectors, one decoder per partition.
    * Output: (media_id, kind, features array<float>).
    */
  def decodeToFeatures(df: DataFrame, dims: Int,
                       decoder: () => MediaDecoder = () => new DeterministicFakeDecoder)
      : DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType), StructField("kind", StringType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("media_id"), col("kind"), col("payload"))
      .mapPartitions { it =>
        val d = decoder(); d.open()
        new Iterator[Row] {
          def hasNext: Boolean = { val h = it.hasNext; if (!h) d.close(); h }
          def next(): Row = {
            val r = it.next()
            val payload = Option(r.getAs[Array[Byte]]("payload")).getOrElse(Array.emptyByteArray)
            Row(r.getLong(0), r.getString(1), d.decodeFeatures(payload, dims).toSeq)
          }
        }
      }(enc)
  }

  /** Partition by payload BYTES, not rows: one aggregate pass estimates the
    * total, then ranges of media_id split it into `targetBytes` chunks.
    */
  def repartitionForDecode(df: DataFrame, targetBytes: Long): DataFrame = {
    val total = df.agg(sum(coalesce(length(col("payload")), lit(0)))).head().getLong(0)
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    df.repartitionByRange(parts, col("media_id"))
  }

  /** Resize metadata arithmetic (pure Column; the pixel work happens in the
    * decoder): scale longest edge to `maxEdge` preserving aspect.
    */
  def resizedDims(width: Column, height: Column, maxEdge: Int): Column = {
    val scale = lit(maxEdge.toDouble) / greatest(width, height).cast("double")
    val clamped = least(scale, lit(1.0))
    struct(round(width * clamped).cast("int").as("width"),
           round(height * clamped).cast("int").as("height"))
  }

  /** Frame-sample timestamps for video rows: every `stepMs` within
    * [0, duration_ms) — a pure `sequence` + `explode`, no decoder needed
    * for the planning pass.
    */
  def frameSamplePlan(df: DataFrame, stepMs: Long): DataFrame =
    df.where(col("kind") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(stepMs)))
          .as("frame_ts_ms"))
}
