package graft.tools
import org.apache.spark.sql.functions._
import graft.core.{GraftSession, Tables}
import graft.llm.Dedup

/** One-off 10x scale smoke: replicate the sf0.1 documents corpus 10 times
  * (ids shifted so replicas are exact near-dups of each other) and run the
  * full near-dup clustering. Checks: runtime stays near-linear, the
  * hot-bucket guard + star components survive 10x replication (every
  * replica family must cluster together).
  */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val base = Tables.documents(spark, dir).select("doc_id", "text")
    val n = base.count()
    // the replica-family arithmetic shifts ids by 1e6 and recovers the
    // family as id % 1e6 — silently wrong past a million base rows
    require(n < 1000000L, s"id-shift family math needs < 1e6 docs, got $n")
    val big = (0 until 10).map(i =>
      base.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ union _)
    println(s"[smoke] corpus: ${n * 10} docs (10 x $n)")
    val t0 = System.nanoTime()
    // smallGraphThreshold = 0: smoke the DISTRIBUTED star path on the
    // full replicated edge set (the default would collect driver-side)
    val clusters = Dedup.connectedComponents(
      Dedup.nearDuplicatePairs(big, "doc_id", "text", 3, 8, 4, 0.5),
      smallGraphThreshold = 0L)
    val nClustered = clusters.count()
    val secs = (System.nanoTime() - t0) / 1e9
    // every base doc with >= 3 tokens has 10 exact replicas -> its family
    // must land in ONE cluster labeled by the base (smallest) id
    val families = clusters
      .withColumn("family", pmod(col("node"), lit(1000000L)))
      .groupBy("family").agg(countDistinct("cluster_id").as("nc"),
        count(lit(1)).as("members"))
    val bad = families.where(col("nc") =!= 1).count()
    val fullFamilies = families.where(col("members") >= 10).count()
    println(f"[smoke] pairs->clusters in $secs%.1f s; $nClustered nodes clustered; " +
      s"$fullFamilies full replica families; $bad families split across clusters")
    require(bad == 0, "replica family split across clusters")

    // Embedding path at 10x: replicate embeddings the same way and run
    // IVF ANN + semantic dedup. Checks: sqrt(n) list sizing holds the
    // candidate volume near-linear, and semantic dedup drops every
    // replica of a family except its min-id representative (replicas are
    // EXACT vector copies -> cosine 1.0 >= any threshold) — provided the
    // family lands in one cluster; exact copies always tie on centroid
    // score, so assignment (score desc, cid asc) is identical for them.
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val en = emb.count()
    require(en < 1000000L, s"id-shift family math needs < 1e6 vectors, got $en")
    val bigEmb = (0 until 10).map(i =>
      emb.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"),
        col("embedding")))
      .reduce(_ union _)
    println(s"[smoke] embeddings: ${en * 10} vectors (10 x $en)")
    val t1 = System.nanoTime()
    val lists = math.ceil(math.sqrt((en * 10).toDouble)).toInt
    val ann = graft.llm.Similarity.ivfTopK(bigEmb, "vec_id", "embedding",
      centroids = lists, nprobe = 2, k = 3)
    val annRows = ann.count()
    // maxCluster sized to the corpus (64x the sqrt(n) expected cluster
    // size): the smoke asserts every exact replica drops, which only
    // holds while clusters pair exhaustively — at the DEFAULT cap a big
    // enough corpus would legitimately star-cap a hot cluster and keep
    // non-representative replicas (the documented recall trade, not a bug)
    val sd = graft.llm.Similarity.semanticDedup(bigEmb, "vec_id", "embedding",
      centroids = lists, threshold = 0.999999,
      maxCluster = math.max(4096, 64 * lists))
    val keptPerFamily = sd.where(col("kept"))
      .withColumn("family", pmod(col("vec_id"), lit(1000000L)))
      .groupBy("family").agg(count(lit(1)).as("kept_n"))
    val multiKept = keptPerFamily.where(col("kept_n") > 1).count()
    val secs2 = (System.nanoTime() - t1) / 1e9
    println(f"[smoke] ivf+semdedup in $secs2%.1f s; $annRows ann rows; " +
      s"$multiKept replica families kept more than one copy")
    require(multiKept == 0, "exact replica survived semantic dedup")

    // Graph path at 10x: replicate the part co-occurrence graph as 10
    // DISJOINT copies (node ids shifted). Disjoint copies multiply every
    // count by exactly 10 — a hard invariant for the whole oriented-wedge
    // pipeline — and the degree distribution is unchanged per copy, so a
    // super-linear blowup here would expose a broken orientation bound.
    val li = Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey"))
    val basePairs = li.select(col("l_orderkey"), col("l_partkey").as("u"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("v")), Seq("l_orderkey"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .select(col("u"), col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val baseSummary = graft.operators.Triangles.summary(basePairs).head()
    val bigEdges = (0 until 10).map(i =>
      basePairs.select((col("u") + lit(i * 1000000L)).as("u"),
        (col("v") + lit(i * 1000000L)).as("v")))
      .reduce(_ union _)
    val t2 = System.nanoTime()
    val bigSummary = graft.operators.Triangles.summary(bigEdges).head()
    val secs3 = (System.nanoTime() - t2) / 1e9
    println(f"[smoke] triangles 10x in $secs3%.1f s; " +
      s"base=$baseSummary big=$bigSummary")
    Seq("n_nodes", "n_edges", "n_wedges", "n_triangles").foreach { c =>
      val b = baseSummary.getAs[Long](c); val g = bigSummary.getAs[Long](c)
      require(g == 10 * b, s"$c: expected ${10 * b} at 10x, got $g")
    }

    // Chunk-dedup state boundedness at 10x: replicating the corpus adds
    // ZERO new distinct chunks, so the dedup roster (the streaming
    // twin's state domain) stays exactly 1x and the kept token mass is
    // identical to the base corpus — the invariant that makes global
    // first-occurrence dedup survivable at 100 TB of near-duplicate
    // crawl (state scales with CONTENT, not ingest volume).
    val memBase = graft.llm.ChunkDedup.chunkMembership(
      base, "doc_id", "text", 20, 7)
    val memBig = graft.llm.ChunkDedup.chunkMembership(
      big, "doc_id", "text", 20, 7)
    def keptStats(m: org.apache.spark.sql.DataFrame) =
      graft.llm.ChunkDedup.firstOccurrence(m)
        .agg(countDistinct(col("chash")).as("roster"),
          sum(when(col("kept"), col("ctoks")).otherwise(0L)).as("kept_toks"))
        .head()
    val (sb2, sg2) = (keptStats(memBase), keptStats(memBig))
    println(s"[smoke] chunk roster base=${sb2.getLong(0)} 10x=${sg2.getLong(0)}; " +
      s"kept tokens base=${sb2.getLong(1)} 10x=${sg2.getLong(1)}")
    require(sb2.getLong(0) == sg2.getLong(0),
      "replication must not grow the distinct-chunk roster")
    require(sb2.getLong(1) == sg2.getLong(1),
      "kept token mass must be invariant under replication")

    // Empirical linearity gate for the hot bench set (r10 verdict #4):
    // the 100 TB posture of these plans is otherwise argued from shape
    // (no cartesians, bounded candidate sets, co-keyed iterations) —
    // this measures it. Each query runs at sf0.01 and at sf0.1 (10x the
    // rows), min of `sweeps` wall-times each; the gate allows 1.5x
    // super-linear growth on top of the 10x data, with a 0.15 s floor
    // on the small-SF time so JVM/scheduler constants don't divide into
    // the ratio. Sub-linear queries (bounded outputs like q258's
    // |types|^2 matrix) pass trivially — the gate is an upper bound.
    // q272/q284 represent the BPE loop family (train / apply) — the
    // other hot lines left after r12's widening: per-round cost is a
    // census aggregation over the bounded vocab, so growth must track
    // the token mass, not the round count.
    // q303_ = the external-vocab apply (rank map in the expression, so
    // growth must track token mass; the vocab/id tables stay bounded)
    // q309_/q310_ = the GPT-2 pre-tokenizer and the full byte-level
    // vocab.json encode over it (r14): both must track text mass —
    // the scanner is a narrow map, the encode's distinct-segment and
    // id tables stay content-bounded
    // q319_/q321_ (r15) = the special-token encode (the split is a
    // narrow per-row scan over the same encode) and the unigram
    // hard-EM trainer (census, seed, and E-steps are all
    // content-bounded — growth must track the one corpus collapse)
    // q326_/q328_ (r16) = the production-scale fast trainers: the
    // 1100-merge driver loop is bounded by the collected census (which
    // the per-doc enrichment words make grow ~linearly with docs here
    // — the worst case for the trainer), plus the full learned-vocab
    // encode — growth must stay ~linear in rows end to end
    val hot = Seq("q105_", "q106_", "q130_", "q136_", "q147_", "q153_",
      "q175_", "q191_", "q258_", "q58_", "q272_", "q284_", "q303_",
      "q309_", "q310_", "q319_", "q321_", "q326_", "q328_")
    val smallDir = "/root/testdata/sf0.01"
    val bigDir = "/root/testdata/sf0.1"
    val sweeps = 2
    def time(name: String, d: String): Double = {
      val fn = graft.SparkEntry.queries(name)
      (1 to sweeps).map { _ =>
        val t = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t) / 1e9
      }.min
    }
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => hot.exists(n.startsWith))
    require(names.size == hot.size, s"hot-set resolution: $names")
    var worst = 0.0
    names.foreach { n =>
      val ts = time(n, smallDir)
      val tb = time(n, bigDir)
      val bound = 15.0 * math.max(ts, 0.15)
      val ratio = tb / math.max(ts, 0.15)
      worst = math.max(worst, ratio / 10.0)
      println(f"[smoke] linearity $n: sf0.01 $ts%.2f s -> sf0.1 $tb%.2f s " +
        f"(x$ratio%.1f at 10x rows, bound x15)")
      require(tb <= bound,
        f"$n grows super-linearly: $ts%.2f s -> $tb%.2f s at 10x rows")
    }
    println(f"[smoke] linearity gate passed; worst normalized growth " +
      f"x$worst%.2f (1.0 = perfectly linear)")

    // 100x frontier (one decade past the bench SF): replicate the
    // sf0.01 inputs of the three most expensive bench plans as 100
    // DISJOINT copies (key-shifted -> ~10x the sf0.1 row count),
    // materialize to parquet, and run the full plans end-to-end.
    // Disjoint copies measure pure VOLUME throughput; per-key density
    // growth is the separate axis the star/prefix caps bound (smoked
    // by the replica-family sections above). Same 15x envelope on 10x
    // rows as the linearity gate. SPARK_GRAFT_SKIP_100X skips.
    if (!sys.env.contains("SPARK_GRAFT_SKIP_100X")) {
      val out = java.nio.file.Files
        .createTempDirectory("graft-100x").toString
      val rep = spark.range(100).select(col("id").as("rep"))
      Tables.lineitem(spark, smallDir)
        .crossJoin(rep)
        .withColumn("l_orderkey",
          col("l_orderkey") + col("rep") * lit(100000000L))
        .withColumn("l_partkey",
          col("l_partkey") + col("rep") * lit(100000000L))
        .drop("rep")
        .write.parquet(s"$out/lineitem.parquet")
      Tables.customer(spark, smallDir)
        .crossJoin(rep)
        .withColumn("c_custkey",
          col("c_custkey") + col("rep") * lit(100000000L))
        .withColumn("c_nationkey",
          col("c_nationkey") + col("rep") * lit(10000L))
        .drop("rep")
        .write.parquet(s"$out/customer.parquet")
      // documents-side frontier (r12 verdict #7): q284 runs the whole
      // BPE family — train over the (replication-invariant) distinct
      // vocab, distinct-word encode, per-doc id materialization — so
      // the 100 TB tokenize story is measured end-to-end, not argued.
      // doc_ids shift per copy (disjoint docs); text is byte-identical,
      // which is exactly the point: corpus volume grows 100x while the
      // vocab/encode tables stay content-bounded.
      Tables.documents(spark, smallDir)
        .crossJoin(rep)
        .withColumn("doc_id",
          col("doc_id") + col("rep") * lit(100000000L))
        .drop("rep")
        .write.parquet(s"$out/documents.parquet")
      // q308 rides the replicated documents too: its explode +
      // (shard, block) agg is the ONE linear re-layout the token
      // stream must pay — the frontier measures that reshuffle
      // end-to-end next to the BPE family (r13 verdict #6)
      Seq("q105_triangles", "q106_pagerank", "q175_entity_resolution",
          "q284_token_ids", "q308_crossdoc_packing")
        .foreach { qn =>
          val t10 = time(qn, bigDir) // sf0.1 reference
          var t100 = time(qn, out)   // 10x its rows
          if (t100 > 15.0 * math.max(t10, 0.15)) {
            // transient-stall guard (the bench gate's suspect-rerun
            // philosophy): one observed flake read q105 at x35.8 right
            // after a full bench sweep and x6.7 on the idle re-run —
            // a single re-measure separates a stall from real
            // super-linear growth (which reproduces)
            println(f"[smoke] 100x frontier $qn%s read " +
              f"x${t100 / math.max(t10, 0.15)}%.1f — re-measuring once")
            t100 = math.min(t100, time(qn, out))
          }
          val ratio = t100 / math.max(t10, 0.15)
          println(f"[smoke] 100x frontier $qn%s: sf0.1 $t10%.2f s -> " +
            f"100x-sf0.01 $t100%.2f s (x$ratio%.1f at 10x rows, bound x15)")
          require(t100 <= 15.0 * math.max(t10, 0.15),
            s"$qn grows super-linearly at the 100x frontier (reproduced)")
        }
    }
    spark.stop()
  }
}
