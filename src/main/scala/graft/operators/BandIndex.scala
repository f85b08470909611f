package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted deletion-band index with a LOUD format contract.
  *
  * Band keys are a function of the banding parameters: r8's SymSpell
  * prefix cap (P = 20 by default) changed the keys for >20-char strings
  * vs the earlier unbounded banding, so probing a pre-cap index with
  * capped probe keys fails by silently MISSING candidates — the worst
  * failure mode a completeness-contracted blocking band can have. This
  * wrapper makes the parameters part of the index: `write` stores them
  * in a `_graft_band_meta.json` sidecar next to the banded parquet, and
  * `open`/`probeCandidates` REFUSE to run when the sidecar is absent
  * (pre-versioning index) or disagrees with the probe-side parameters —
  * an exception instead of a quietly thinner candidate set.
  *
  * Scale notes: the sidecar goes through Hadoop's FileSystem API, so
  * the index can live on any cluster store; the banded table itself is
  * ordinary parquet of (id, band-hash) longs — the probe join is the
  * same near-singleton-bucket hash join as `Linkage.candidatePairs`.
  */
object BandIndex {

  /** Bump whenever band-key derivation changes meaning (v2 = r8's
    * prefix-capped `DeletionBandExpr`; v1, never written by this
    * object, stands for the pre-cap unbounded banding).
    */
  val FormatVersion = 2

  val MetaFile = "_graft_band_meta.json"

  final case class Meta(version: Int, prefix: Int, fromEnd: Boolean)

  /** Band `df`'s `nameCol` and persist the (id, band) table plus the
    * parameter sidecar under `path`.
    */
  def write(df: DataFrame, path: String, idCol: String, nameCol: String,
            prefix: Int = Linkage.DefaultBandPrefix,
            fromEnd: Boolean = false): Unit = {
    df.select(col(idCol).as("id"),
        explode(DeletionBandExpr(col(nameCol), prefix, fromEnd)).as("band"))
      .write.mode("overwrite").parquet(s"$path/bands.parquet")
    val spark = df.sparkSession
    val json =
      s"""{"format":"graft-deletion-band","version":$FormatVersion,""" +
        s""""prefix":$prefix,"fromEnd":$fromEnd}"""
    val hp = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(hp, true)
    try out.write(json.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The banded (id, band) table at `path`, verified compatible with
    * probes built at (`prefix`, `fromEnd`). Throws IllegalStateException
    * when the sidecar is missing or any parameter disagrees.
    */
  def open(spark: SparkSession, path: String,
           prefix: Int = Linkage.DefaultBandPrefix,
           fromEnd: Boolean = false): DataFrame = {
    val m = readMeta(spark, path)
    if (m.version != FormatVersion || m.prefix != prefix ||
        m.fromEnd != fromEnd)
      throw new IllegalStateException(
        s"banded index at $path was built with " +
          s"(version=${m.version}, prefix=${m.prefix}, fromEnd=${m.fromEnd}) " +
          s"but this probe uses (version=$FormatVersion, prefix=$prefix, " +
          s"fromEnd=$fromEnd): band keys would not line up and matches " +
          "would be SILENTLY MISSED — rebuild the index with " +
          "BandIndex.write at the probe parameters (or pass the index's " +
          "parameters explicitly)")
    spark.read.parquet(s"$path/bands.parquet")
  }

  /** Candidate (probe_id, id) pairs of `probe` rows against the
    * persisted index — the incremental-linkage screen. Complete for
    * lev ≤ 2 on the banded field, like `Linkage.candidatePairs`.
    */
  def probeCandidates(spark: SparkSession, path: String, probe: DataFrame,
                      idCol: String, nameCol: String,
                      prefix: Int = Linkage.DefaultBandPrefix,
                      fromEnd: Boolean = false): DataFrame = {
    val idx = open(spark, path, prefix, fromEnd)
    probe
      .select(col(idCol).as("probe_id"),
        explode(DeletionBandExpr(col(nameCol), prefix, fromEnd)).as("band"))
      .join(idx.hint("shuffle_hash"), "band")
      .select(col("probe_id"), col("id")).distinct()
  }

  private def readMeta(spark: SparkSession, path: String): Meta = {
    val hp = new org.apache.hadoop.fs.Path(path, MetaFile)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp))
      throw new IllegalStateException(
        s"banded index at $path has no $MetaFile sidecar: it predates " +
          "the band-format version contract (pre-r8 indexes were built " +
          "with UNBOUNDED banding whose keys differ from prefix-capped " +
          "probes for long strings, so probing it would silently miss " +
          "candidates) — rebuild it with BandIndex.write")
    val in = fs.open(hp)
    val raw = try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      new String(bytes.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    def field(k: String): String = {
      val m = s""""$k"\\s*:\\s*([^,}\\s]+)""".r.findFirstMatchIn(raw)
      m.map(_.group(1)).getOrElse(throw new IllegalStateException(
        s"banded index sidecar at $hp is unreadable (missing '$k'): $raw"))
    }
    if (field("format") != "\"graft-deletion-band\"")
      throw new IllegalStateException(
        s"sidecar at $hp is not a graft deletion-band descriptor: $raw")
    Meta(field("version").toInt, field("prefix").toInt,
      field("fromEnd").toBoolean)
  }
}
