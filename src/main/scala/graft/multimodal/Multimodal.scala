package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: image/audio/video
  * travel as opaque `binary` payloads with a typed metadata struct; decoding
  * and feature extraction run per-partition so codec initialization is
  * amortized (the rich open/close lifecycle).
  *
  * Image decode is REAL: `ImageIoDecoder` runs the JDK's bundled
  * `javax.imageio` codecs (PNG/JPEG/GIF/BMP, headless-safe, zero added
  * dependencies) and is oracle-verified end-to-end (q144 decodes
  * deterministic synthetic PNGs and DuckDB recomputes the pixel fill
  * arithmetically). Audio decode is REAL too: `WavDecoder` runs
  * `javax.sound.sampled` over RIFF/PCM WAV and is oracle-verified the
  * same way (q150, lossless synthetic PCM). Only VIDEO decode remains a
  * stub (`DeterministicFakeDecoder`) — no ffmpeg/JCodec in this
  * container — but the Spark-side contract it plugs into is the same one
  * both real codecs exercise: schema, per-partition lifecycle,
  * byte-aware partitioning, and the pure-Column operators (resize
  * arithmetic, frame sampling).
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

  /** REAL image decoder over the JDK's bundled `javax.imageio` codecs
    * (PNG/JPEG/GIF/BMP — no external dependency, works headless). Features
    * are the `dims`-bin normalized intensity histogram of the decoded
    * pixels: a genuine decode → feature-extract path, deterministic for a
    * lossless codec. An undecodable payload yields all-zero features (a
    * histogram can never be all-zero for a decoded image, so the zero
    * vector doubles as the "corrupt input" marker downstream gates drop).
    */
  final class ImageIoDecoder extends MediaDecoder {
    override def decodeFeatures(payload: Array[Byte], dims: Int): Array[Float] = {
      val out = new Array[Float](dims)
      decodeStats(payload) match {
        case None => out
        case Some(st) =>
          // rebin the 256-wide histogram into dims buckets and normalize
          var v = 0
          val n = (st.width.toLong * st.height).toFloat
          while (v < 256) {
            out(v * dims / 256) += st.histogram(v) / n
            v += 1
          }
          out
      }
    }

    /** Decode and summarize one payload: dimensions, band count and the
      * exact band-0 intensity histogram/sum. `None` for undecodable bytes.
      */
    def decodeStats(payload: Array[Byte]): Option[ImageStats] = {
      if (payload == null || payload.isEmpty) return None
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        // NonFatal, not just IOException: ImageIO plugins throw runtime
        // exceptions (CMMException, IllegalArgumentException, AIOOBE) on
        // malformed payloads, and the quarantine contract is "undecodable
        // rows yield None, the job never fails"
        catch { case scala.util.control.NonFatal(_) => null }
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val hist = new Array[Int](256)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = img.getRGB(x, y) & 0xFF // blue band; gray images have r=g=b
            hist(v) += 1
            sum += v
            x += 1
          }
          y += 1
        }
        Some(ImageStats(w, h, img.getRaster.getNumBands, sum, hist))
      }
    }
  }

  final case class ImageStats(width: Int, height: Int, bands: Int,
                              pxSum: Long, histogram: Array[Int])

  /** REAL pixel resize (decode → scale → re-encode PNG): longest edge to
    * `maxEdge`, aspect preserved, never upscaled — the executable twin of
    * the [[resizedDims]] metadata arithmetic (the spec asserts the
    * decoded output dims equal exactly what resizedDims planned).
    * Bilinear interpolation via Graphics2D; None for undecodable input
    * (same quarantine contract as the stats paths).
    */
  def resizeImage(payload: Array[Byte], maxEdge: Int): Option[Array[Byte]] = {
    require(maxEdge > 0)
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null } // see decodeStats
    if (img == null) return None
    val scale = math.min(1.0, maxEdge.toDouble / math.max(img.getWidth, img.getHeight))
    val (w, h) = (math.round(img.getWidth * scale).toInt.max(1),
      math.round(img.getHeight * scale).toInt.max(1))
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    Some(bos.toByteArray)
  }

  /** Deterministic synthetic PNG for tests and the oracle-gated decode
    * query: a (8 + id mod 9) × (8 + id mod 7) gray image whose pixel at
    * (x, y) is ((31·id + 7·x + 13·y) mod 256) in every band. PNG is
    * lossless, so decoding recovers exactly these values — the DuckDB
    * oracle recomputes the same fill arithmetically and the comparison
    * proves the codec path end-to-end.
    */
  def syntheticPng(id: Long): Array[Byte] = {
    val w = (8 + id % 9).toInt
    val h = (8 + id % 7).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = ((31 * id + 7 * x + 13 * y) % 256).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode image payloads to dimension/band/intensity stats, one codec
    * per partition (the same lifecycle as `decodeToFeatures` — ImageIO
    * reader instances are not thread-safe across rows is a myth, but the
    * per-partition shape is what a libjpeg-turbo binding needs, so the
    * real codec goes through it too). Undecodable rows surface with
    * decoded=false and null stats rather than failing the job: at 100 TB
    * some payloads WILL be truncated, and a pipeline must quarantine
    * them, not die.
    *
    * Input needs (media_id, payload); output is one row per input row:
    * (media_id, decoded, width, height, channels, px_sum).
    */
  def decodeImageStats(df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("channels", LongType, nullable = true),
      StructField("px_sum", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("media_id"), col("payload"))
      .mapPartitions { it =>
        val d = new ImageIoDecoder
        graft.datastream.RichLifecycle.wrap(d.open(), d.close())(it.map { r =>
          // positional access: upstream mapPartitions rows carry no schema
          val payload = r.get(1).asInstanceOf[Array[Byte]]
          d.decodeStats(payload) match {
            case Some(st) => Row(r.getLong(0), true, st.width.toLong,
              st.height.toLong, st.bands.toLong, st.pxSum)
            case None => Row(r.getLong(0), false, null, null, null, null)
          }
        })
      }(enc)
  }

  /** REAL audio decode over the JDK's bundled `javax.sound.sampled` WAV
    * codec (RIFF/PCM — zero dependencies, headless-safe): format header
    * (sample rate, channels, bit depth) plus exact 16-bit-sample
    * amplitude sum. The audio twin of [[ImageIoDecoder]]; undecodable
    * payloads return None for the same quarantine contract.
    */
  final class WavDecoder extends Serializable {
    def decodeStats(payload: Array[Byte]): Option[AudioStats] = {
      if (payload == null || payload.isEmpty) return None
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val f = in.getFormat
          if (f.getSampleSizeInBits != 16) return None // 16-bit PCM contract
          val bytes = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(bytes).order(
            if (f.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          var sum = 0L
          var n = 0L
          while (bb.remaining() >= 2) { sum += bb.getShort; n += 1 }
          Some(AudioStats(math.round(f.getSampleRate).toInt, f.getChannels,
            n, sum))
        } finally in.close()
      } catch {
        // NonFatal: same quarantine contract as the image paths — any
        // decode failure (unsupported format, truncated RIFF, plugin
        // runtime exception) yields None, never a failed job
        case scala.util.control.NonFatal(_) => None
      }
    }
  }

  final case class AudioStats(sampleRate: Int, channels: Int,
                              nSamples: Long, ampSum: Long)

  /** Deterministic synthetic mono 16-bit PCM WAV: (64 + id mod 97)
    * samples at (8000 + 100·(id mod 5)) Hz, sample i =
    * ((31·id + 7·i) mod 4096) − 2048. PCM is lossless, so the decoder
    * recovers exactly these values and the DuckDB oracle recomputes the
    * amplitude sum arithmetically — the q144 pattern for audio.
    */
  def syntheticWav(id: Long): Array[Byte] = {
    val n = (64 + id % 97).toInt
    val rate = (8000 + 100 * (id % 5)).toFloat
    val pcm = new Array[Byte](n * 2)
    val bb = java.nio.ByteBuffer.wrap(pcm).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < n) {
      bb.putShort((((31 * id + 7 * i) % 4096) - 2048).toShort)
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val stream = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Decode WAV payloads to format/amplitude stats, one decoder per
    * partition; undecodable rows quarantine as decoded=false (see
    * [[decodeImageStats]] — same contract, audio face).
    * Input needs (media_id, payload); output one row per input row.
    */
  def decodeAudioStats(df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("sample_rate", LongType, nullable = true),
      StructField("channels", LongType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("amp_sum", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("media_id"), col("payload"))
      .mapPartitions { it =>
        val d = new WavDecoder
        it.map { r =>
          val payload = r.get(1).asInstanceOf[Array[Byte]]
          d.decodeStats(payload) match {
            case Some(st) => Row(r.getLong(0), true, st.sampleRate.toLong,
              st.channels.toLong, st.nSamples, st.ampSum)
            case None => Row(r.getLong(0), false, null, null, null, null)
          }
        }
      }(enc)
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
        val d = decoder()
        // close-exactly-once incl. early-terminated consumers: a native
        // codec handle must not leak or double-free
        graft.datastream.RichLifecycle.wrap(d.open(), d.close())(it.map { r =>
          val payload = Option(r.getAs[Array[Byte]]("payload"))
            .getOrElse(Array.emptyByteArray)
          Row(r.getLong(0), r.getString(1), d.decodeFeatures(payload, dims).toSeq)
        })
      }(enc)
  }

  /** Partition by payload BYTES, not rows. Row-balanced partitioning
    * (`repartitionByRange(media_id)`) lets one 2 GB video sit among
    * thousands of 10 KB images and skew a decode task arbitrarily; here
    * every row gets a GLOBAL cumulative byte offset and buckets are
    * `targetBytes`-wide windows of that offset, so each decode partition
    * carries ≤ targetBytes + one row's overhang regardless of skew.
    *
    * The global offset is the classic distributed prefix sum: per-input-
    * partition byte totals (one row per partition — the ONLY driver
    * materialization, O(#partitions) like Spark's own RangePartitioner
    * sample) are prefix-scanned into partition base offsets, broadcast
    * back, and added to a per-partition running sum (window partitioned BY
    * input partition — never a global single-partition sort).
    */
  def repartitionForDecode(df: DataFrame, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val bytes = coalesce(length(col("payload")), lit(0)).cast("long")
    // persisted BEFORE the two consumers: spark_partition_id() must
    // resolve identically in the sums job and the final plan — an
    // unpersisted lineage re-evaluated across jobs (nondeterministic
    // upstream, AQE re-coalesce, files appearing between scans) could
    // yield pids absent from the prefix table and silently drop rows in
    // the inner join below; the cache also avoids scanning every payload
    // twice
    val withPid = df.withColumn("__bytes", bytes)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sums = withPid.groupBy(col("__pid")).agg(sum(col("__bytes")).as("b"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    if (sums.isEmpty) return df
    val prefixes = sums.scanLeft(0L)(_ + _._2)
    val total = prefixes.last
    val parts = math.max(1, math.ceil(total.toDouble / targetBytes).toInt)
    val prefixDf = broadcast(
      sums.map(_._1).zip(prefixes).toSeq.toDF("__pid", "__base"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col("media_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    withPid.join(prefixDf, "__pid")
      .withColumn("__start",
        col("__base") + sum(col("__bytes")).over(w) - col("__bytes"))
      .withColumn("__bucket", floor(col("__start") / targetBytes))
      .repartitionByRange(parts, col("__bucket"))
      .drop("__bytes", "__pid", "__base", "__start", "__bucket")
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

  /** 64-bit perceptual hash (pHash): decode → 32×32 area-averaged
    * grayscale → 2D DCT-II → the 8×8 low-frequency block → bit i set iff
    * coefficient i exceeds the median of the 63 non-DC coefficients.
    * Robust to re-encoding and small pixel perturbations (the property
    * the spec exercises); every float op runs through `StrictMath`, so
    * the hash is bit-identical across JVMs and JIT intrinsics — a cluster
    * of heterogeneous executors computes the same hash for the same
    * bytes, which the banded self-join below requires.
    */
  def pHash64(payload: Array[Byte]): Option[Long] = {
    if (payload == null || payload.isEmpty) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null } // see decodeStats
    if (img == null) return None
    val n = 32
    val gray = Array.ofDim[Double](n, n)
    val w = img.getWidth; val h = img.getHeight
    var gy = 0
    while (gy < n) {
      var gx = 0
      while (gx < n) {
        // area-average the source block [x0,x1)×[y0,y1) (≥1 px each way)
        val x0 = gx * w / n; val x1 = math.max(x0 + 1, (gx + 1) * w / n)
        val y0 = gy * h / n; val y1 = math.max(y0 + 1, (gy + 1) * h / n)
        var s = 0L; var cnt = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            s += ((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)
            cnt += 1
            x += 1
          }
          y += 1
        }
        gray(gy)(gx) = if (cnt == 0) 0.0 else s.toDouble / (3.0 * cnt)
        gx += 1
      }
      gy += 1
    }
    // 2D DCT-II, low-frequency 8×8 block only (O(8·8·32·32) — constant)
    val coef = Array.ofDim[Double](8, 8)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var y = 0
        while (y < n) {
          var x = 0
          while (x < n) {
            acc += gray(y)(x) *
              StrictMath.cos((2 * x + 1) * u * StrictMath.PI / (2.0 * n)) *
              StrictMath.cos((2 * y + 1) * v * StrictMath.PI / (2.0 * n))
            x += 1
          }
          y += 1
        }
        coef(v)(u) = acc
        v += 1
      }
      u += 1
    }
    val flat = (for (y <- 0 until 8; x <- 0 until 8 if !(x == 0 && y == 0))
      yield coef(y)(x)).toArray
    val median = flat.sorted.apply(flat.length / 2)
    var bits = 0L
    var i = 0
    while (i < flat.length) {
      if (flat(i) > median) bits |= (1L << i)
      i += 1
    }
    Some(bits)
  }

  /** Per-partition pHash over (media_id, payload) rows — the decoder
    * lifecycle of [[decodeImageStats]]; undecodable rows quarantine with
    * decoded=false.
    */
  def pHashes(df: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("decoded", BooleanType, nullable = false),
      StructField("phash", LongType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.select(col("media_id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          pHash64(r.get(1).asInstanceOf[Array[Byte]]) match {
            case Some(p) => Row(r.getLong(0), true, p)
            case None    => Row(r.getLong(0), false, null)
          }
        }
      }(enc)
  }

  /** Perceptual near-duplicate pairs: hamming(pHash) ≤ maxHamming, found
    * by the pigeonhole band join (maxHamming + 1 bands of the 64-bit
    * hash — two hashes within the budget MUST agree on at least one
    * whole band), so candidates are bucket-joins, never a corpus². The
    * image twin of the SimHash text path (`llm/Dedup.simHashNearDup`).
    */
  def pHashNearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 16, "band width needs ≤ 15")
    val bands = maxHamming + 1
    val width = 64 / bands
    val banded = hashes.filter(col("decoded"))
      .select(col("media_id"), col("phash"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("phash"), b * width)
              .bitwiseAND(lit((1L << width) - 1)).as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("phash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.withColumnsRenamed(
      Map("media_id" -> "id_a", "phash" -> "ph_a"))
    val b = banded.withColumnsRenamed(
      Map("media_id" -> "id_b", "phash" -> "ph_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("bit_count(ph_a ^ ph_b)").cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Frame-sample timestamps for video rows: every `stepMs` within
    * [0, duration_ms) — a pure `sequence` + `explode`, no decoder needed
    * for the planning pass.
    */
  def frameSamplePlan(df: DataFrame, stepMs: Long): DataFrame =
    // duration_ms > 0 guard: corrupt/placeholder metadata (0 or negative
    // duration) must yield zero frames for that row, not an
    // IllegalArgumentException from sequence(0, -1, +step) that fails the
    // whole job
    df.where(col("kind") === "video" && col("meta.duration_ms") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0L), col("meta.duration_ms") - 1, lit(stepMs)))
          .as("frame_ts_ms"))
}
