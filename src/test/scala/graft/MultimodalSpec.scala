package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSession._

  private def mediaDf = {
    val rows = Seq(
      Row(1L, "image", "fake-jpeg-bytes-1".getBytes, Row(640, 480, null, null, "jpeg")),
      Row(2L, "image", "fake-jpeg-bytes-2".getBytes, Row(1920, 1080, null, null, "jpeg")),
      Row(3L, "audio", "fake-wav-bytes".getBytes, Row(null, null, 16000, 2500L, "wav")),
      Row(4L, "video", "fake-mp4-bytes".getBytes, Row(1280, 720, 44100, 1000L, "mp4")),
      Row(5L, "image", null, Row(8, 8, null, null, "png")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.mediaSchema)
  }

  test("media schema round-trips through parquet (binary + struct metadata)") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    mediaDf.write.mode("overwrite").parquet(s"$dir/media")
    val back = spark.read.parquet(s"$dir/media")
    // parquet reads are always nullable in Spark; compare names + types
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      Multimodal.mediaSchema.map(f => (f.name, f.dataType)))
    assert(back.count() === 5)
    val img1 = back.where(col("media_id") === 1).head()
    assert(new String(img1.getAs[Array[Byte]]("payload")) === "fake-jpeg-bytes-1")
    assert(img1.getAs[Row]("meta").getAs[Int]("width") === 640)
  }

  test("decode produces fixed-width deterministic features, one decoder per partition") {
    val f1 = Multimodal.decodeToFeatures(mediaDf, dims = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    val f2 = Multimodal.decodeToFeatures(mediaDf, dims = 16).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](2)).toMap
    assert(f1 === f2, "deterministic")
    assert(f1.values.forall(_.size === 16), "fixed width")
    assert(f1(1L) !== f1(2L), "payload-sensitive")
    assert(f1.keySet === Set(1L, 2L, 3L, 4L, 5L), "null payload handled")
    assert(f1.values.forall(_.forall(v => v >= -1.0f && v <= 1.0f)))
  }

  test("ImageIO decoder round-trips synthetic PNGs bit-exactly") {
    val d = new Multimodal.ImageIoDecoder
    for (id <- Seq(0L, 1L, 17L, 123456L)) {
      val st = d.decodeStats(Multimodal.syntheticPng(id)).get
      val (w, h) = ((8 + id % 9).toInt, (8 + id % 7).toInt)
      assert((st.width, st.height, st.bands) === ((w, h, 3)))
      // the decoded pixel sum must equal the fill formula's sum — PNG is
      // lossless, so any difference means the codec path corrupted data
      val want = (for (x <- 0 until w; y <- 0 until h)
        yield (31 * id + 7 * x + 13 * y) % 256).sum
      assert(st.pxSum === want, s"pixel sum drift for id=$id")
      assert(st.histogram.sum === w * h)
    }
  }

  test("ImageIO decoder reads real JPEG bytes (lossy: dims survive)") {
    val img = new java.awt.image.BufferedImage(
      33, 21, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (x <- 0 until 33; y <- 0 until 21)
      img.setRGB(x, y, ((x * 8) << 16) | ((y * 12) << 8) | 128)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JPEG writer present")
    val st = (new Multimodal.ImageIoDecoder).decodeStats(bos.toByteArray).get
    assert((st.width, st.height, st.bands) === ((33, 21, 3)))
    assert(st.pxSum > 0)
  }

  test("undecodable payloads quarantine as decoded=false, never fail the job") {
    import spark.implicits._
    val df = Seq(
      (1L, Multimodal.syntheticPng(1L)),
      (2L, "not an image at all".getBytes),
      (3L, null: Array[Byte]),
      (4L, Multimodal.syntheticPng(1L).take(10)), // truncated header
    ).toDF("media_id", "payload")
    val out = Multimodal.decodeImageStats(df).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out === Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
  }

  test("ImageIO histogram features are a normalized distribution") {
    val d = new Multimodal.ImageIoDecoder
    d.open()
    val f = d.decodeFeatures(Multimodal.syntheticPng(5L), dims = 16)
    assert(f.length === 16)
    assert(math.abs(f.sum - 1.0f) < 1e-5, s"histogram mass ${f.sum}")
    assert((new Multimodal.ImageIoDecoder).decodeFeatures(Array[Byte](1, 2), 16)
      .forall(_ == 0.0f), "undecodable -> zero vector marker")
  }

  test("WAV decoder round-trips synthetic PCM bit-exactly") {
    val d = new Multimodal.WavDecoder
    for (id <- Seq(0L, 3L, 42L, 98765L)) {
      val st = d.decodeStats(Multimodal.syntheticWav(id)).get
      val n = (64 + id % 97).toInt
      assert(st.sampleRate === (8000 + 100 * (id % 5)).toInt)
      assert(st.channels === 1)
      assert(st.nSamples === n.toLong)
      val want = (0 until n).map(i => ((31 * id + 7 * i) % 4096) - 2048).sum
      assert(st.ampSum === want, s"amplitude sum drift for id=$id")
    }
  }

  test("WAV decoder quarantines garbage and non-PCM payloads") {
    val d = new Multimodal.WavDecoder
    assert(d.decodeStats("definitely not RIFF".getBytes) === None)
    assert(d.decodeStats(null) === None)
    assert(d.decodeStats(Multimodal.syntheticWav(7L).take(20)) === None)
    // an image payload is not audio — wrong-codec bytes must not decode
    assert(d.decodeStats(Multimodal.syntheticPng(7L)) === None)
    import spark.implicits._
    val df = Seq((1L, Multimodal.syntheticWav(1L)), (2L, Array[Byte](1, 2, 3)))
      .toDF("media_id", "payload")
    val out = Multimodal.decodeAudioStats(df).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(out === Map(1L -> true, 2L -> false))
  }

  test("metadata-only transform prunes the payload column from the scan") {
    val dir = java.nio.file.Files.createTempDirectory("media").toString
    mediaDf.write.mode("overwrite").parquet(s"$dir/media")
    val metaOnly = spark.read.parquet(s"$dir/media")
      .select(col("media_id"), col("meta.format"))
    val plan = metaOnly.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), s"payload not pruned:\n$plan")
  }

  test("real pixel resize produces the dims the resize arithmetic planned") {
    val d = new Multimodal.ImageIoDecoder
    // a 40×28 synthetic source (id chosen for distinct w/h)... build one
    // directly for exact control of the aspect
    val src = new java.awt.image.BufferedImage(
      40, 28, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (x <- 0 until 40; y <- 0 until 28)
      src.setRGB(x, y, ((x * 6) << 16) | ((y * 9) << 8) | (x + y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(src, "png", bos)
    val resized = Multimodal.resizeImage(bos.toByteArray, maxEdge = 10).get
    val st = d.decodeStats(resized).get
    // resizedDims plans round(40·10/40)=10 × round(28·0.25)=7
    assert((st.width, st.height) === ((10, 7)))
    // never upscale: a small image passes through at original dims
    val same = Multimodal.resizeImage(Multimodal.syntheticPng(4L), maxEdge = 256).get
    val st2 = d.decodeStats(same).get
    assert((st2.width, st2.height) === ((12, 12))) // 8+4%9=12, 8+4%7=12
    assert(Multimodal.resizeImage("garbage".getBytes, 10) === None)
  }

  test("resize arithmetic preserves aspect and never upscales") {
    val out = mediaDf.where(col("kind") === "image")
      .select(col("media_id"),
        Multimodal.resizedDims(col("meta.width"), col("meta.height"), 256).as("r"))
      .collect().map(r => r.getLong(0) -> r.getAs[Row](1)).toMap
    assert(out(1L).getAs[Int]("width") === 256)  // 640x480 -> 256x192
    assert(out(1L).getAs[Int]("height") === 192)
    assert(out(2L).getAs[Int]("width") === 256)  // 1920x1080 -> 256x144
    assert(out(2L).getAs[Int]("height") === 144)
    assert(out(5L).getAs[Int]("width") === 8, "small image untouched")
  }

  test("frame sampling plans one row per step within duration") {
    val frames = Multimodal.frameSamplePlan(mediaDf, stepMs = 250).collect()
    assert(frames.map(_.getLong(1)).sorted.toSeq === Seq(0L, 250L, 500L, 750L))
    assert(frames.forall(_.getLong(0) === 4L))
  }

  test("byte-aware repartitioning splits by payload size") {
    val df = Multimodal.repartitionForDecode(mediaDf, targetBytes = 20)
    assert(df.rdd.getNumPartitions >= 3, "~17-byte payloads / 20-byte target")
    assert(df.count() === 5)
  }

  test("byte-aware repartitioning bounds partition bytes under heavy skew") {
    // 200 × 10 KB images + 2 × 1 MB videos: row-balanced ranges would put
    // a megabyte row in the same partition as hundreds of small ones
    val small = (0 until 200).map(i =>
      Row(i.toLong, "image", Array.fill[Byte](10 * 1024)((i % 100).toByte),
        Row(64, 64, null, null, "jpeg")))
    val big = Seq(
      Row(900L, "video", Array.fill[Byte](1024 * 1024)(7.toByte),
        Row(1280, 720, 44100, 60000L, "mp4")),
      Row(901L, "video", Array.fill[Byte](1024 * 1024)(9.toByte),
        Row(1280, 720, 44100, 60000L, "mp4")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(small ++ big, 8), Multimodal.mediaSchema)
    val target = 512L * 1024
    val out = Multimodal.repartitionForDecode(df, targetBytes = target)
    assert(out.count() === 202)
    val partBytes = out
      .select(coalesce(length(col("payload")), lit(0)).cast("long").as("b"))
      .withColumn("pid", spark_partition_id())
      .groupBy("pid").agg(sum("b").as("bytes"))
      .collect().map(_.getAs[Long]("bytes"))
    val maxRow = 1024L * 1024
    assert(partBytes.max <= target + maxRow,
      s"worst partition ${partBytes.max} exceeds target+maxRow ${target + maxRow}")
    // and the load is genuinely spread: no partition holds most of the data
    assert(partBytes.count(_ > 0) >= 4,
      s"bytes concentrated in too few partitions: ${partBytes.mkString(",")}")
  }

  /** Deterministic 64×64 noise PNG: unlike the affine-gradient
    * `syntheticPng` (whose cross DCT coefficients are ~0, so pHash sign
    * bits there are numerically degenerate ties), hash-noise pixels give
    * every low-frequency coefficient a healthy magnitude — the spectrum
    * shape pHash assumes of natural images.
    */
  private def noisePng(id: Long): Array[Byte] = {
    val n = 64
    val img = new java.awt.image.BufferedImage(
      n, n, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until n; x <- 0 until n) {
      val v = (((x * 73856093L) ^ (y * 19349663L) ^ (id * 83492791L) ^
        ((x * y + id) * 2654435761L)) >>> 17).toInt & 0xFF
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def perturbedPng(id: Long): Array[Byte] = {
    // one pixel nudged by +1 in every band — perceptually identical
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(noisePng(id)))
    val v = ((img.getRGB(1, 1) & 0xFF) + 1) & 0xFF
    img.setRGB(1, 1, (v << 16) | (v << 8) | v)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("pHash is invariant under lossless re-encode and stable under a pixel nudge") {
    val base = noisePng(42L)
    val ph = Multimodal.pHash64(base).get
    // decode → re-encode PNG → identical pixels → identical hash
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.pHash64(bos.toByteArray).get === ph)
    // a one-pixel nudge moves few low-frequency signs
    val ph2 = Multimodal.pHash64(perturbedPng(42L)).get
    assert(java.lang.Long.bitCount(ph ^ ph2) <= 3,
      s"pixel nudge flipped ${java.lang.Long.bitCount(ph ^ ph2)} bits")
    // undecodable payloads quarantine
    assert(Multimodal.pHash64(Array[Byte](1, 2, 3)).isEmpty)
    assert(Multimodal.pHash64(null).isEmpty)
  }

  test("banded pHash near-dup join finds exactly the planted perturbed pairs") {
    import spark.implicits._
    val ids = (0L until 20L)
    val rows = ids.map(i => (i, noisePng(i))) ++
      ids.map(i => (i + 100L, perturbedPng(i)))
    val df = rows.toDF("media_id", "payload")
    val hashes = Multimodal.pHashes(df)
    val maxHamming = 3
    val pairs = Multimodal.pHashNearDupPairs(hashes, maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // reference: brute-force hamming over all hash pairs
    val hs = hashes.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val expect = (for {
      a <- hs.keys; b <- hs.keys if a < b
      d = java.lang.Long.bitCount(hs(a) ^ hs(b)) if d <= maxHamming
    } yield (a, b, d)).toSet
    assert(pairs.toSet === expect,
      "band join must equal the brute-force hamming scan")
    // every planted (i, i+100) twin is within budget
    ids.foreach { i =>
      assert(expect.exists(p => p._1 == i && p._2 == i + 100L),
        s"planted near-dup $i <-> ${i + 100} not found")
    }
  }
}
