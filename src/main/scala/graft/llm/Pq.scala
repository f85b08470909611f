package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.KMeans

/** IVF-PQ: product quantization of the IVF lists — the published next
  * compression step past int8 (q312): each member vector is stored as
  * `m` small CODES (one per dims/m-dim subspace, each pointing into a
  * ksub-entry codebook trained with the integer-grid
  * [[graft.operators.KMeans]]), so a 64-dim float64 vector becomes m
  * longs + one precomputed norm — the 16–32× layout a 100 TB embedding
  * corpus actually serves. Queries score candidates with ASYMMETRIC
  * DISTANCE (ADC): the query precomputes one m×ksub table of exact
  * integer subvector dots against the codebooks, and a candidate's
  * approximate dot is m table lookups — no reconstruction, no
  * per-candidate float math. The top ADC candidates are then reranked
  * EXACTLY (the standard IVFPQ+refine shape; at serving scale the
  * refine set fetches original vectors from storage).
  *
  * Determinism (mirrored verbatim in the q320 oracle): everything
  * trains and scores on the [[KMeans.Scale]] integer grid — codebook
  * coords are integer longs, subspace assignment is integer squared-L2
  * with ties to the LOWER code id, ADC dots and norms are exact long
  * sums; the only doubles are the final round(·, 6) cosine-style
  * scores, each a single exact-integer division.
  *
  * Scale shape: codebooks are m×ksub rows (a bounded driver collect —
  * the q259 charter); member encode is a NARROW map over the lists
  * (the codebook folds into the row expression as literals, zero
  * joins); the ADC query reads only its nprobe lists and carries
  * (codes, pnrm2) longs, never vectors.
  */
object Pq {

  /** Train per-subspace codebooks on `sample` (1-in-N of the corpus —
    * the published practice) via the integer-grid Lloyd loop:
    * one [[KMeans.centroids]] run per subspace, codes = 0-based
    * ascending rank of the seed cid within the subspace. Returns
    * (sub, code, qc: array<long>) on the integer grid.
    */
  def trainCodebooks(sample: DataFrame, idCol: String, vecCol: String,
                     dims: Int, m: Int, ksub: Int,
                     iters: Int): DataFrame = {
    require(m >= 1 && dims % m == 0,
      s"dims ($dims) must divide into m ($m) subspaces")
    require(ksub >= 1 && iters >= 1)
    val dsub = dims / m
    val spark = sample.sparkSession
    import spark.implicits._
    // ONE quantized-sample pass serves ALL m subspaces (running
    // KMeans.centroids per subspace would re-quantize, re-persist,
    // and re-collect seeds m times for identical values): seeds are
    // the ksub smallest vec_ids' vectors — the SAME rows for every
    // subspace — and each Lloyd recompute is one agg keyed by
    // (sub, cid, dim) over one posexplode. Values are bit-identical
    // to the per-subspace KMeans runs (same quantization, same seeds,
    // same integer argmin/round-half-up rules — PqJointSpec pins it).
    val q = sample
      .select(col(idCol).cast("long").as("vid"),
        KMeans.quantize(col(vecCol)).as("qv"))
      .transform(graft.core.Caching.persist)
    val seedRows = q.orderBy("vid").limit(ksub)
      .as[(Long, Seq[Long])].collect().toSeq
    // per-subspace centroid state: (sub, cid) -> coords
    var cents: Map[(Int, Long), Seq[Long]] = (for {
      j <- 0 until m
      (vid, qv) <- seedRows
    } yield (j, vid) -> qv.slice(j * dsub, j * dsub + dsub)).toMap
    def assignCol(j: Int): Column = {
      val subv = slice(col("qv"), j * dsub + 1, dsub)
      val entries = cents.toSeq.filter(_._1._1 == j)
        .sortBy(_._1._2).map { case ((_, cid), coords) =>
          struct(
            aggregate(zip_with(subv, typedlit(coords),
              (a, b) => (a - b) * (a - b)), lit(0L), _ + _).as("d"),
            lit(cid).as("c"))
        }
      array_min(array(entries: _*)).getField("c")
    }
    var pass = 1
    while (pass < iters) {
      // one narrow map assigns ALL subspaces; one agg keyed
      // (sub, cid, i) recomputes every centroid coordinate
      val rows = q.select(col("qv"),
          array((0 until m).map(assignCol): _*).as("asn"))
        .select(col("asn"), posexplode(col("qv")))
        .select((col("pos") / lit(dsub)).cast("int").as("sub"),
          pmod(col("pos"), lit(dsub)).cast("int").as("i"),
          element_at(col("asn"),
            (col("pos") / lit(dsub)).cast("int") + 1).as("cid"),
          col("col").as("v"))
        .groupBy(col("sub"), col("cid"), col("i"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
        .as[(Int, Long, Int, Long, Long)].collect()
      cents = rows.groupBy(r => (r._1, r._2)).map { case (k, rs) =>
        k -> rs.sortBy(_._3).map { case (_, _, _, s2, n) =>
          Math.floorDiv(2 * s2 + n, 2 * n) // round-half-up(s/n), exact
        }.toSeq
      }
      pass += 1
    }
    q.unpersist()
    // codes renumber the surviving cids 0..k'-1 per subspace
    cents.toSeq
      .map { case ((j, cid), coords) => (j.toLong, cid, coords) }
      .sortBy(r => (r._1, r._2))
      .groupBy(_._1).toSeq
      .flatMap { case (j, rs) =>
        rs.sortBy(_._2).zipWithIndex.map { case ((_, _, coords), c) =>
          (j, c.toLong, coords)
        }
      }
      .toDF("sub", "code", "qc")
  }

  /** Driver-side bounded collect of a codebook table:
    * (sub, code, qc) rows sorted by (sub, code).
    */
  def collectCodebooks(cb: DataFrame): Seq[(Int, Int, Seq[Long])] = {
    val spark = cb.sparkSession
    import spark.implicits._
    val rows = cb.select(col("sub").cast("int"), col("code").cast("int"),
        col("qc")).as[(Int, Int, Seq[Long])].collect().toSeq
      .sortBy(r => (r._1, r._2))
    require(rows.nonEmpty && rows.size <= 65536,
      s"codebook must be bounded (m×ksub): ${rows.size} rows")
    rows
  }

  /** PQ-encode IVF lists (`(cid, member, mv)` — [[Similarity.IvfIndex]]
    * lists): a narrow map producing (cid, member, codes: array<long>,
    * pnrm2: long) — per subspace, the integer-grid argmin over the
    * literal codebook (ties → lower code), and the precomputed
    * Σ‖chosen centroid‖² that makes a probe pay one division per
    * candidate.
    */
  def encodeLists(lists: DataFrame,
                  cb: Seq[(Int, Int, Seq[Long])]): DataFrame = {
    val m = cb.map(_._1).max + 1
    val dsub = cb.head._3.length
    require(cb.forall(_._3.length == dsub), "ragged codebook")
    val qmv = KMeans.quantize(col("mv"))
    // per subspace: min struct(d, code, n2) over the literal codebook —
    // array_min is linear-size (the when-fold would be exponential)
    def best(j: Int): Column = {
      val subv = slice(qmv, j * dsub + 1, dsub)
      val entries = cb.filter(_._1 == j).sortBy(_._2).map {
        case (_, c, qc) =>
          struct(
            aggregate(zip_with(subv, typedlit(qc),
              (a, b) => (a - b) * (a - b)), lit(0L), _ + _).as("d"),
            lit(c.toLong).as("c"),
            lit(qc.map(x => x * x).sum).as("n2"))
      }
      array_min(array(entries: _*))
    }
    lists
      .select(Seq(col("cid"), col("member")) ++
        (0 until m).map(j => best(j).as(s"b$j")): _*)
      .select(col("cid"), col("member"),
        array((0 until m).map(j => col(s"b$j").getField("c")): _*)
          .as("codes"),
        (0 until m).map(j => col(s"b$j").getField("n2"))
          .reduce(_ + _).as("pnrm2"))
  }

  /** Per-query ADC table: array(m)(ksub) of exact long dots between
    * the quantized query subvectors and each codebook centroid.
    */
  private def adcTable(qv: Column,
                       cb: Seq[(Int, Int, Seq[Long])]): Column = {
    val m = cb.map(_._1).max + 1
    val dsub = cb.head._3.length
    array((0 until m).map { j =>
      val subv = slice(qv, j * dsub + 1, dsub)
      array(cb.filter(_._1 == j).sortBy(_._2).map { case (_, _, qc) =>
        aggregate(zip_with(subv, typedlit(qc), (a, b) => a * b),
          lit(0L), _ + _)
      }: _*)
    }: _*)
  }

  /** The q320 readout: the PQ recall curve over a prebuilt float IVF
    * index — per nprobe, recall@k of (a) pure ADC ranking and (b) ADC
    * top-`refine` reranked exactly, against the brute-force truth.
    * One probe ranking at `maxProbe`, one PQ-scored candidate pass
    * (persisted); each curve point filters by probe rank — the q312
    * dual-curve shape with ADC in place of the int8 rerank.
    *
    * @return (nprobe, n_queries, possible, recall_pq, recall_rerank)
    */
  def pqRecallCurve(ix: Similarity.IvfIndex,
                    cb: Seq[(Int, Int, Seq[Long])], corpus: DataFrame,
                    queries: DataFrame, idCol: String, vecCol: String,
                    k: Int, maxProbe: Int, refine: Int): DataFrame = {
    require(maxProbe >= 1 && refine >= k + 1,
      s"need maxProbe >= 1 and refine >= k+1: $maxProbe, $refine")
    val brute = Similarity.knnBruteForce(corpus, queries, idCol,
        vecCol, k)
      .select(col("query_id").as("vec_id"),
        col("neighbor_id").as("nn_id"))
      .transform(graft.core.Caching.persist)
    val nq = queries.select(col(idCol)).distinct().count()
    val q = queries.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .transform(graft.core.Caching.persist)
    val scored = q.crossJoin(broadcast(ix.cents))
      .select(col("vec_id"), col("cid").as("nn_id"),
        coalesce(round(Similarity.cosine(col("v"), col("cv")), 6),
          lit(-2.0)).as("score"))
    val probes = Similarity.topKPerQuery(scored, maxProbe)
      .select(col("vec_id"), col("nn_id").as("cid"),
        col("rnk").as("pr"))
    val plists = encodeLists(ix.lists, cb)
    val qq = q.select(col("vec_id"),
        KMeans.quantize(col("v")).as("qv"))
      .select(col("vec_id"), adcTable(col("qv"), cb).as("qtab"),
        sqrt(aggregate(col("qv"), lit(0L), (s, x) => s + x * x)
          .cast("double")).as("qnrm"))
    val m = cb.map(_._1).max + 1
    val adot = (0 until m).map(j =>
      element_at(element_at(col("qtab"), j + 1),
        (element_at(col("codes"), j + 1) + 1).cast("int")))
      .reduce(_ + _)
    val cand = probes.join(plists, "cid").join(qq, "vec_id")
      .select(col("vec_id"), col("member").as("nn_id"), col("pr"),
        when(col("qnrm") === 0.0 || col("pnrm2") === 0L,
          lit(null).cast("double"))
          .otherwise(round(adot.cast("double")
            / (col("qnrm") * sqrt(col("pnrm2").cast("double"))), 6))
          .as("score_pq"))
      .transform(graft.core.Caching.persist)
    // the whole curve in ONE pass per ranking (r16, the
    // Similarity.curveHits shape): candidates explode to every probe
    // budget np >= their probe rank; the ADC ranking, the refine
    // selection, and the exact rerank each run once over the composite
    // (query, np) key instead of once per curve point — identical
    // values (same rows, same order inside every group).
    val mvs = ix.lists.select(col("member").as("nn_id"),
      col("mv").as("nv"))
    val ex = cand.withColumn("np",
      explode(sequence(col("pr"), lit(maxProbe.toLong))))
    val hp = Similarity.curveHits(ex.select(col("vec_id"), col("nn_id"),
      col("np"), col("score_pq").as("score")), brute, k, maxProbe, "hp")
    // exact rerank of the ADC top-`refine` per (query, np): one
    // composite-key topK selects the refine set for ALL curve points,
    // original vectors join back once, and the reranked hits run the
    // same one-pass tail
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(maxProbe.toLong)
    val mask = (1L << bits) - 1L
    val pre = Similarity.topKPerQuery(ex.select(
        shiftleft(col("vec_id").cast("long"), bits)
          .bitwiseOR(col("np")).as("vec_id"),
        col("nn_id"), col("score_pq").as("score")), refine)
      .select(shiftright(col("vec_id"), bits).as("vec_id"),
        col("vec_id").bitwiseAND(lit(mask)).as("np"), col("nn_id"))
    val exact = pre.join(mvs, "nn_id")
      .join(q.select(col("vec_id"), col("v")), "vec_id")
      .select(col("vec_id"), col("nn_id"), col("np"),
        round(Similarity.cosine(col("v"), col("nv")), 6).as("score"))
    val hr = Similarity.curveHits(exact, brute, k, maxProbe, "hr")
    queries.sparkSession.range(1L, maxProbe + 1L)
      .select(col("id").as("np"))
      .join(hp, Seq("np"), "left").join(hr, Seq("np"), "left")
      .crossJoin(broadcast(
        brute.agg(count(lit(1)).cast("long").as("possible"))))
      .select(col("np").as("nprobe"), lit(nq).as("n_queries"),
        col("possible"),
        (coalesce(col("hp"), lit(0L)).cast("double")
          / col("possible").cast("double")).as("recall_pq"),
        (coalesce(col("hr"), lit(0L)).cast("double")
          / col("possible").cast("double")).as("recall_rerank"))
  }

  /** Persist a PQ index (codebooks + encoded lists + the coarse
    * quantizer) as three parquet tables; [[load]] restores it.
    */
  def save(cents: DataFrame, codebooks: DataFrame, plists: DataFrame,
           dir: String): Unit = {
    cents.write.mode("overwrite").parquet(s"$dir/centroids.parquet")
    codebooks.write.mode("overwrite").parquet(s"$dir/codebooks.parquet")
    plists.write.mode("overwrite").parquet(s"$dir/plists.parquet")
  }

  /** (cents, codebooks, plists) from [[save]]'s layout. */
  def load(spark: org.apache.spark.sql.SparkSession,
           dir: String): (DataFrame, DataFrame, DataFrame) =
    (spark.read.parquet(s"$dir/centroids.parquet"),
      spark.read.parquet(s"$dir/codebooks.parquet"),
      spark.read.parquet(s"$dir/plists.parquet"))
}
