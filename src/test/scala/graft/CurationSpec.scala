package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Algorithm-level cross-checks for the round-10 curation pack — the
  * oracle gate proves Spark == DuckDB, but both share the FORMULA, so
  * q261's interpolated bigram LM is re-derived here by a brute-force
  * Scala replication, and q264's content-defined chunking is checked
  * against the property that justifies its existence: an insertion
  * perturbs only the edited chunk, never the chunks downstream.
  */
class CurationSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("q261 interpolated bigram surprisal equals a brute-force Scala " +
      "replication on the fixture") {
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.llm.TextFunctions.tokens(col("text")).as("t"), col("lang"))
      .as[(Long, Seq[String], String)].collect()
      .filter(_._2.length >= 2)
    val bigrams = docs.flatMap { case (id, t, lang) =>
      t.sliding(2).map(p => (id, lang, p(0), p(1)))
    }
    val uni = docs.flatMap { case (_, t, lang) => t.map((lang, _)) }
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val utot = uni.groupBy(_._1._1).map { case (lang, m) =>
      lang -> (m.values.sum, m.size.toLong)
    }
    val bc = bigrams.groupBy(r => (r._2, r._3, r._4))
      .map { case (k, v) => k -> v.length.toLong }
    val ctx = bc.groupBy { case ((lang, u, _), _) => (lang, u) }
      .map { case (k, m) => k -> m.values.sum }
    def microbits(lang: String, u: String, w: String): Long = {
      val cb = bc((lang, u, w)).toDouble
      val cc = ctx((lang, u)).toDouble
      val cu = uni((lang, w)).toDouble
      val (n, v) = utot(lang)
      val p = 0.75 * (cb / cc) + 0.25 * ((cu + 1) / (n + v).toDouble)
      Math.round(-(Math.log(p) / Math.log(2.0)) * 1e6)
    }
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      val total = bs.map(b => microbits(b._2, b._3, b._4)).sum
      id -> (bs.length.toLong, total)
    }
    val got = SparkEntry.queries("q261_bigram_perplexity")(spark, sfDir)
      .select(col("doc_id"), col("n_bigrams"), col("total_microbits"),
        col("kept"))
      .as[(Long, Long, Long, Boolean)].collect()
    assert(got.length === expected.size)
    got.foreach { case (id, n, total, kept) =>
      val (en, etotal) = expected(id)
      assert(n === en, s"doc $id bigram count")
      assert(total === etotal, s"doc $id total microbits")
      assert(kept === (total <= 12000000L * n), s"doc $id verdict")
    }
  }

  test("q264 CDC chunking: inserting one token changes only the edited " +
      "chunk's hash, fixed windows shift everything after it") {
    // membership helper mirrored inline: boundary gate = hash%16 == 0
    def cdcHashes(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      import org.apache.spark.sql.expressions.Window
      val toks = df
        .select(col("doc_id"),
          graft.llm.TextFunctions.tokens(col("text")).as("t"))
        .select(col("doc_id"), posexplode(col("t")))
        .select(col("doc_id"), col("pos"), col("col").as("tok"),
          when(pmod(graft.llm.TextFunctions.portableHash(col("col"), 41),
            lit(16L)) === lit(0L), lit(1L)).otherwise(lit(0L)).as("bd"))
      val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, -1)
      toks.withColumn("cid", coalesce(sum(col("bd")).over(wPrev), lit(0L)))
        .groupBy(col("doc_id"), col("cid"))
        .agg(concat_ws(" ",
          transform(array_sort(collect_list(struct(col("pos"),
            col("tok")))), x => x.getField("tok"))).as("ctext"))
        .select(graft.llm.TextFunctions.portableHash(col("ctext"), 43))
        .as[Long].collect().toSeq
    }
    // 400 deterministic pseudo-words => dozens of content-defined chunks
    val words = (1 to 400).map(i => s"w${i * 7919 % 1000}")
    val orig = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val edited = Seq(
      (1L, (words.take(200) ++ Seq("inserted") ++ words.drop(200))
        .mkString(" "))).toDF("doc_id", "text")
    val h0 = cdcHashes(orig)
    val h1 = cdcHashes(edited)
    assert(h0.size >= 10, s"fixture too small: ${h0.size} chunks")
    val lost = h0.toSet -- h1.toSet
    // the insertion lands inside exactly one chunk; if "inserted" is
    // itself a boundary token it splits that chunk in two — either way
    // every OTHER chunk survives verbatim
    assert(lost.size <= 1,
      s"CDC must localize the edit, lost ${lost.size} chunks")
    assert((h1.toSet -- h0.toSet).size <= 2)
  }

  test("q265 hard negatives: per probe, 5 per polarity, scores " +
      "descending, polarity labels correct") {
    val labels = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label").cast("long"))
      .as[(Long, Long)].collect().toMap
    val rows = SparkEntry.queries("q265_hard_negatives")(spark, sfDir)
      .select(col("query_id"), col("is_negative"), col("neighbor_id"),
        col("score"), col("rnk"))
      .as[(Long, Boolean, Long, Double, Long)].collect()
    assert(rows.length === 10 * 2 * 5)
    rows.groupBy(r => (r._1, r._2)).foreach { case ((q, neg), g) =>
      assert(g.length === 5)
      val sorted = g.sortBy(_._5)
      assert(sorted.map(_._4).sliding(2).forall(p => p(0) >= p(1)),
        s"probe $q neg=$neg scores must be non-increasing in rank")
      g.foreach { r =>
        assert((labels(r._3) != labels(q)) === neg,
          s"probe $q neighbor ${r._3} polarity")
      }
    }
  }

  test("boilerplate strip: a header repeated across a source is " +
      "stripped; a unique line of identical length survives") {
    val header = "terms of service apply to all pages of this site" // 10 toks
    def uniq(i: Int) =
      s"unique line number n$i with exactly ten tokens included yes" // 10 toks
    val docs = ((1 to 5).map(i =>
        (i.toLong, s"$header ${uniq(i)}", "web")) :+
      (100L, uniq(99), "web")).toDF("doc_id", "text", "source")
    val out = graft.llm.Boilerplate
      .strip(docs, "doc_id", "text", "source", c = 10, seed = 11)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    (1 to 5).foreach { i =>
      val r = out(i.toLong)
      assert(r.getAs[Long]("boiler_lines") === 1L, s"doc $i")
      assert(r.getAs[Long]("removed_tokens") === 10L)
      assert(r.getAs[Long]("kept_tokens") === 10L)
      assert(r.getAs[String]("retained_text") === uniq(i),
        "the unique line of IDENTICAL length must survive")
    }
    val lone = out(100L)
    assert(lone.getAs[Long]("boiler_lines") === 0L)
    assert(lone.getAs[String]("retained_text") === uniq(99))
    // per-source mass: 5 headers of 10 tokens removed out of 110
    val mass = graft.llm.Boilerplate
      .sourceMass(docs, "doc_id", "text", "source", c = 10, seed = 11)
      .collect()
    assert(mass.length === 1)
    val m = mass.head
    assert(m.getAs[Long]("n_docs") === 6L)
    assert(m.getAs[Long]("removed_tokens") === 50L)
    assert(m.getAs[Long]("n_tokens") === 110L)
    assert(math.abs(m.getAs[Double]("boiler_share") - 50.0 / 110.0) < 1e-12)
  }

  test("boilerplate is PER-SOURCE: the same repeated line in another " +
      "source below threshold survives there") {
    val line = "this exact same line appears in two different source pools"
    def pad(i: Int) =
      s"filler content row n$i keeps the document body distinct here"
    // srcA: line in 3/3 docs -> boiler there; srcB: line in 1/20 docs
    val docs = ((1 to 3).map(i =>
        (i.toLong, s"$line ${pad(i)}", "srcA")) ++
      Seq((50L, s"$line ${pad(50)}", "srcB")) ++
      (51 to 69).map(i => (i.toLong, pad(i), "srcB")))
      .toDF("doc_id", "text", "source")
    val out = graft.llm.Boilerplate
      .strip(docs, "doc_id", "text", "source", c = 10, seed = 11)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    (1 to 3).foreach(i =>
      assert(out(i.toLong).getAs[Long]("boiler_lines") === 1L,
        s"srcA doc $i strips the shared line"))
    assert(out(50L).getAs[Long]("boiler_lines") === 0L,
      "srcB sees the line once in 20 docs - below both thresholds")
    assert(out(50L).getAs[String]("retained_text").startsWith(line))
  }

  test("bpe: merge rounds match a brute-force replication, char mass " +
      "is invariant, symbol mass shrinks by the merged occurrences") {
    def bruteMerge(seq: Vector[String], x: String, y: String)
        : Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < seq.length) {
        if (i + 1 < seq.length && seq(i) == x && seq(i + 1) == y) {
          out += (x + y); i += 2
        } else { out += seq(i); i += 1 }
      }
      out.result()
    }
    def brute(words: Map[String, Long], rounds: Int)
        : Seq[(Long, String, String, Long, Long)] = {
      var vocab = words.map { case (w, n) =>
        w.toVector.map(_.toString) -> n
      }
      val charMass0 = vocab.map { case (s, n) => n * s.map(_.length).sum }.sum
      (1 to rounds).flatMap { r =>
        val census = vocab.toSeq.flatMap { case (s, n) =>
          s.sliding(2).filter(_.length == 2).map(p => (p(0), p(1)) -> n)
        }.groupMapReduce(_._1)(_._2)(_ + _)
        if (census.isEmpty) None
        else {
          val ((x, y), n) = census.minBy { case ((a, b), c) => (-c, a, b) }
          vocab = vocab.toSeq.map { case (s, w) => (bruteMerge(s, x, y), w) }
            .groupMapReduce(_._1)(_._2)(_ + _)
          val charMass = vocab.map { case (s, w) =>
            w * s.map(_.length).sum }.sum
          assert(charMass === charMass0, "char mass must be invariant")
          val symMass = vocab.map { case (s, w) => w * s.length }.sum
          Some((r.toLong, x, y, n, symMass))
        }
      }
    }
    // corpus engineered so later rounds depend on earlier merges:
    // "aaab" repeats make (a,a) then (aa,a*)-family merges compete
    val texts = Seq.fill(6)("banana band bandana") ++
      Seq.fill(4)("aaab aaab banana") ++ Seq.fill(3)("na na banana nab")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val words = texts.flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    val expected = brute(words, 5)
    val got = graft.llm.Bpe.train(docs, "text", 5)
      .collect().map(r => (r.getAs[Long]("merge_round"), r.getAs[String]("x"),
        r.getAs[String]("y"), r.getAs[Long]("pair_n"),
        r.getAs[Long]("mass_after"))).sortBy(_._1).toSeq
    assert(got === expected,
      s"distributed trainer must replay the reference loop\n$got\n$expected")
    // symbol mass strictly decreases every executed round
    got.map(_._5).sliding(2).foreach {
      case Seq(a, b) => assert(b < a, "each merge removes occurrences")
      case _ =>
    }
  }

  test("bpe mergePair fold equals greedy left-to-right merge on ALL " +
      "symbol sequences up to length 6 over {a, b, ab}, all 9 pairs") {
    def bruteMerge(seq: Vector[String], x: String, y: String)
        : Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < seq.length) {
        if (i + 1 < seq.length && seq(i) == x && seq(i + 1) == y) {
          out += (x + y); i += 2
        } else { out += seq(i); i += 1 }
      }
      out.result()
    }
    val alpha = Vector("a", "b", "ab")
    val seqs: Seq[Vector[String]] = (1 to 6).flatMap(n =>
      Seq.fill(n)(alpha).foldLeft(Seq(Vector.empty[String])) {
        (acc, cs) => acc.flatMap(v => cs.map(v :+ _))
      })
    val df = seqs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "s").transform(graft.core.Caching.persist)
    for (x <- alpha; y <- alpha) {
      val got = df.select(col("id"),
          graft.llm.Bpe.mergePair(col("s"), x, y).as("m"))
        .as[(Long, Seq[String])].collect().toMap
      seqs.zipWithIndex.foreach { case (v, i) =>
        assert(got(i.toLong) === bruteMerge(v, x, y).toSeq,
          s"pair ($x,$y) on $v")
      }
    }
    df.unpersist()
  }

  test("q277 Kneser-Ney surprisal equals a brute-force Scala " +
      "replication; continuation counts beat raw frequency") {
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir)
      .select(col("doc_id"), col("lang"),
        graft.llm.TextFunctions.tokens(col("text")).as("t"))
      .as[(Long, String, Seq[String])].collect().toSeq
    val eligible = docs.filter(_._3.length >= 2)
    val bigrams = eligible.flatMap { case (id, lang, t) =>
      t.sliding(2).map(p2 => (id, lang, p2(0), p2(1)))
    }
    val bc = bigrams.groupBy(b => (b._2, b._3, b._4))
      .map { case (k, v) => k -> v.size.toLong }
    val cc = bc.groupBy { case ((l, u, _), _) => (l, u) }
      .map { case (k, m) => k -> m.values.sum }
    val nfu = bc.groupBy { case ((l, u, _), _) => (l, u) }
      .map { case (k, m) => k -> m.size.toLong }
    val npw = bc.groupBy { case ((l, _, w), _) => (l, w) }
      .map { case (k, m) => k -> m.size.toLong }
    val nbb = bc.groupBy { case ((l, _, _), _) => l }
      .map { case (k, m) => k -> m.size.toLong }
    def mb(l: String, u: String, w: String): Long = {
      val p = (math.max(bc((l, u, w)).toDouble - 0.75, 0.0) +
        0.75 * nfu((l, u)).toDouble *
          (npw((l, w)).toDouble / nbb(l).toDouble)) / cc((l, u)).toDouble
      Math.round(-(math.log(p) / math.log(2.0)) * 1e6)
    }
    val expected = bigrams.groupBy(_._1).map { case (id, bs) =>
      id -> (bs.size.toLong, bs.map(b => mb(b._2, b._3, b._4)).sum)
    }
    val got = graft.queries.CurationQueries
      .queries("q277_kn_perplexity")(spark, TestSession.sfDir)
      .select(col("doc_id"), col("n_bigrams"), col("total_microbits"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === expected, "KN totals must match the reference loop")
    // the KN property: among equal-frequency (lang, w) unigrams, the
    // one with MORE distinct left-contexts gets the larger p_cont —
    // verify the fixture exercises a spread of continuation counts
    assert(npw.values.toSet.size > 1,
      "fixture must have varied context diversity")
  }

  test("waterfill: skewed inputs cap the scarce sources exactly, the " +
      "rest split proportionally, and the budget binds") {
    def brute(rows: Seq[(String, Long, Long)], den: Long)
        : Map[String, (Boolean, Long)] = {
      val ta = rows.map(_._2).sum
      val b = ta / den
      val sorted = rows.sortBy { case (s2, a, t) =>
        (a * 1000000L / t, s2)
      }
      var rem = b
      var remT = rows.map(_._3).sum
      val out = scala.collection.mutable.Map.empty[String, (Boolean, Long)]
      var capping = true
      sorted.foreach { case (s2, a, t) =>
        if (capping &&
            BigInt(a) * BigInt(remT) <= BigInt(rem) * BigInt(t)) {
          out(s2) = (true, a); rem -= a; remT -= t
        } else capping = false
      }
      val (fr, frT) = (rem, remT)
      sorted.foreach { case (s2, a, t) =>
        if (!out.contains(s2))
          out(s2) = (false, (BigInt(fr) * BigInt(t) / BigInt(frT)).toLong)
      }
      out.toMap
    }
    // one tiny source (caps), one mid source, two huge ones
    val rows = Seq(("tiny", 100L, 10000000L), ("mid", 50000L, 223606797L),
      ("bigA", 1000000L, 1000000000L), ("bigB", 1000000L, 1000000000L))
    val df = rows.toDF("source", "a", "t")
    val got = graft.llm.Mixture.waterfill(df, budgetDen = 2L)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Boolean]("capped"), r.getAs[Long]("allocated"))).toMap
    val expected = brute(rows, 2L)
    assert(got === expected, s"waterfill mismatch\n$got\n$expected")
    assert(got("tiny") === ((true, 100L)), "scarce source saturates")
    assert(!got("bigA")._1 && !got("bigB")._1)
    assert(got("bigA")._2 === got("bigB")._2,
      "equal targets get equal shares")
    val b = rows.map(_._2).sum / 2
    val total = got.values.map(_._2).sum
    assert(total <= b && b - total < rows.size,
      "budget binds up to per-row floor rounding")
  }

  test("encodeIds: sequences agree with encodeStats counts, ids stay " +
      "in the vocabulary, and idBlocks obey the pack-boundary law") {
    val docs = graft.core.Tables.documents(spark, sfDir).limit(200)
      .transform(graft.core.Caching.persist)
    val enc = graft.llm.Bpe.encodeIds(docs, "doc_id", "text",
        rounds = 4, blockTokens = 64)
      .transform(graft.core.Caching.persist)
    // cross-check totals against the independent encodeStats assembly
    val fromIds = enc
      .join(docs.select(col("doc_id").cast("long").as("doc_id"),
        col("lang")), "doc_id")
      .groupBy(col("lang"))
      .agg(sum(col("n_words")).as("w"), sum(col("n_symbols")).as("s"))
      .as[(String, Long, Long)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    val fromStats = graft.llm.Bpe.encodeStats(docs, "text", "lang", 4)
      .select(col("lang"), col("n_words"), col("n_symbols"))
      .as[(String, Long, Long)].collect()
      .map { case (k, a, b) => k -> ((a, b)) }.toMap
    assert(fromIds === fromStats,
      "per-lang word/symbol totals must match the encodeStats path")
    // id range and block law per doc
    val rows = enc.select(col("n_symbols"), col("n_blocks"),
        array_min(col("ids")).as("lo"), array_max(col("ids")).as("hi"),
        graft.llm.Bpe.idBlocks(col("ids"), 64).as("blocks"),
        col("ids"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, nb) = (r.getLong(0), r.getLong(1))
      assert(nb === (n + 63) / 64, "n_blocks = ceil(n_symbols / 64)")
      assert(r.getLong(2) >= 1L, "ids are 1-based")
      val blocks = r.getSeq[scala.collection.Seq[Long]](4)
      val ids = r.getSeq[Long](5)
      assert(blocks.length.toLong === nb)
      assert(blocks.flatten === ids, "blocks must tile the sequence")
      blocks.dropRight(1).foreach(b => assert(b.length === 64))
      assert(blocks.last.length >= 1 && blocks.last.length <= 64)
    }
    // packing integration: boundaries computed from REAL tokenizer
    // counts obey the same prefix-sum law packChunks pins for the
    // whitespace proxy
    val packed = graft.llm.Packing.packChunksByCount(
      enc.join(docs.select(col("doc_id").cast("long").as("doc_id"),
        col("lang")), "doc_id"),
      "doc_id", "lang", "n_symbols", tokenBudget = 512, shards = 2)
    val byShard = packed
      .select(col("lang"), col("shard"), col("doc_id"),
        col("tok_count"), col("chunk_id"))
      .collect()
      .groupBy(r => (r.getString(0), r.getLong(1)))
    byShard.values.foreach { rs =>
      var run = 0L
      rs.sortBy(_.getLong(2)).foreach { r =>
        assert(r.getLong(4) === run / 512,
          "chunk_id is the exclusive prefix sum over n_symbols div budget")
        run += r.getLong(3)
      }
    }
    enc.unpersist(); docs.unpersist()
  }

  test("waterfill raises on a < 1 or t < 1 instead of silently " +
      "null-corrupting the sort order") {
    Seq(Seq(("ok", 100L, 10L), ("zt", 50L, 0L)),
        Seq(("ok", 100L, 10L), ("za", 0L, 10L)),
        Seq(("ok", 100L, 10L), ("neg", 50L, -3L))).foreach { rows =>
      val e = intercept[Exception] {
        graft.llm.Mixture.waterfill(rows.toDF("source", "a", "t")).collect()
      }
      val chain = Iterator.iterate(e: Throwable)(_.getCause)
        .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
        .mkString("\n")
      assert(chain.contains("must be >= 1"), s"unexpected failure: $chain")
    }
  }

  test("effectiveRatio: fresh branch is linear, repeated epochs decay " +
      "toward the published 1+R* ceiling, monotone non-decreasing") {
    val rows = Seq((1L, 50L, 100L), (2L, 100L, 100L), (3L, 200L, 100L),
      (4L, 530L, 100L), (5L, 5300L, 100L), (6L, 100000L, 100L))
      .toDF("id", "alloc", "u")
    val got = rows.select(col("id"),
        graft.llm.Mixture.effectiveRatio(col("alloc"), col("u")).as("r"))
      .as[(Long, Double)].collect().toMap
    def ref(alloc: Long, u: Long): Double = {
      val ep = alloc.toDouble / u.toDouble
      val raw = if (alloc < u) ep
        else 1.0 + 5.3 * (1.0 - math.exp(-((ep - 1.0) / 5.3)))
      math.rint(raw * 1e6) / 1e6
    }
    assert(got(1L) === 0.5, "fresh branch: eff = allocation share")
    assert(got(2L) === 1.0, "exactly one epoch: no decay yet")
    Seq((3L, 200L), (4L, 530L), (5L, 5300L), (6L, 100000L)).foreach {
      case (id, a) => assert(math.abs(got(id) - ref(a, 100L)) <= 1e-6,
        s"row $id")
    }
    assert(got(6L) <= 6.3 && got(6L) > 6.0,
      "many epochs approach the 1 + R* ceiling (grid-rounds to it) " +
        "and never exceed it")
    val ordered = (1L to 6L).map(got)
    ordered.sliding(2).foreach {
      case Seq(a, b) => assert(b >= a, "monotone in allocation")
      case _ =>
    }
  }

  test("perplexityBuckets: the whole threshold bucket joins the lower " +
      "tier, terciles are exact on a frequency-controlled corpus") {
    // single-token docs make per-doc mean surprisal = that token's
    // surprisal; frequencies 4/3/2 order the docs a < b < c, so the
    // integer tercile cuts (cum*3 >= n, cum*3 >= 2n over 9 docs) land
    // head = all 4 "a" docs (threshold bucket stays low), middle = the
    // 3 "b" docs, tail = the 2 "c" docs.
    val docs = ((1 to 4).map(i => (i.toLong, "a", "xx"))
      ++ (5 to 7).map(i => (i.toLong, "b", "xx"))
      ++ (8 to 9).map(i => (i.toLong, "c", "xx")))
      .toDF("doc_id", "text", "lang")
    val got = graft.llm.LmScore
      .perplexityBuckets(docs, "doc_id", "text", "lang")
      .select(col("bucket"), col("n_docs"), col("tokens"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(got === Map("head" -> (4L, 4L), "middle" -> (3L, 3L),
      "tail" -> (2L, 2L)))
    // per-lang independence: a second lang with 3 equal-frequency
    // tokens (one doc each) collapses to a single decibit bucket; the
    // whole bucket is then the threshold bucket for BOTH cuts, so all
    // docs land in head and middle/tail are empty.
    val two = (docs.collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      ++ Seq((10L, "p", "yy"), (11L, "q", "yy"), (12L, "r", "yy")))
      .toDF("doc_id", "text", "lang")
    val byLang = graft.llm.LmScore
      .perplexityBuckets(two, "doc_id", "text", "lang")
      .select(col("lang"), col("bucket"), col("n_docs"))
      .as[(String, String, Long)].collect()
    assert(byLang.filter(_._1 == "yy").toSet === Set(("yy", "head", 3L)),
      "uniform-surprisal lang: one bucket, all head")
    assert(byLang.filter(_._1 == "xx").map(r => r._2 -> r._3).toMap
      === Map("head" -> 4L, "middle" -> 3L, "tail" -> 2L),
      "adding a lang never moves another lang's cuts")
  }

  test("q295 rendezvous sharding: growing 8 -> 12 moves docs ONLY onto " +
      "new shards, at roughly the 1/3 HRW rate") {
    val rows = SparkEntry.queries("q295_shard_stability")(spark, sfDir)
      .select(col("source"), col("n_docs"), col("n_moved"),
        col("n_to_new"))
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src0, _, moved, toNew) =>
      assert(moved === toNew,
        s"$src0: a doc changed shard WITHOUT landing on a new shard - " +
          "HRW monotonicity violated")
    }
    val n = rows.map(_._2).sum.toDouble
    val moved = rows.map(_._3).sum.toDouble
    assert(moved / n > 0.2 && moved / n < 0.47,
      s"moved fraction ${moved / n} should concentrate near 4/12")
  }

  test("q296 blocklist screen matches whole TOKENS, never substrings, " +
      "and counts every occurrence") {
    val blocked = Seq("dup", "slow", "stale")
    val toks = graft.llm.TextFunctions.tokens(col("text"))
    val hits = size(filter(toks, t => t.isin(blocked: _*))).cast("long")
    val got = Seq(
      (1L, "backup dups duplicate slowly"), // substrings only - clean
      (2L, "a dup b"),
      (3L, "dup DUP Slow"),                 // case-folded tokens
      (4L, ""))
      .toDF("doc_id", "text")
      .select(col("doc_id"), hits.as("h"))
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 3L -> 3L, 4L -> 0L))
  }

  test("budgetCalibration: the cut fits the budget, is maximal, and an " +
      "over-budget first bucket yields the honest empty cut") {
    // single-token docs: freq 4/3/2 orders surprisal a < b < c.
    // n_tokens = 9, budget = 9*6//10 = 5: cum(a)=4 fits, cum(a,b)=7
    // does not, so cut = a's bucket, kept = 4 docs / 4 tokens.
    val docs = ((1 to 4).map(i => (i.toLong, "a", "xx"))
      ++ (5 to 7).map(i => (i.toLong, "b", "xx"))
      ++ (8 to 9).map(i => (i.toLong, "c", "xx"))
      // lang yy: one uniform bucket of 3 tokens, budget = 1 -> no cut
      ++ Seq((10L, "p", "yy"), (11L, "q", "yy"), (12L, "r", "yy")))
      .toDF("doc_id", "text", "lang")
    val got = graft.llm.LmScore
      .budgetCalibration(docs, "doc_id", "text", "lang")
      .select(col("lang"), col("budget_tokens"), col("cut_decibits"),
        col("kept_docs"), col("kept_tokens"))
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("xx")._2 === 5L && got("xx")._4 === 4L
      && got("xx")._5 === 4L)
    assert(got("xx")._3 >= 0L, "a qualifying bucket exists")
    assert(got("yy") === ("yy", 1L, -1L, 0L, 0L))
  }

  test("vocabFloorAudit: floored singletons take the unseen path, kept " +
      "tokens get CHEAPER, and the exact sums match a hand model") {
    // lang en, counts a:3 b:2 c:1 over docs "a a a" / "b b" / "c".
    // full LM:    N=6 V=3 -> p(a)=4/9  p(b)=3/9  p(c)=2/9
    // floored df>=2: N=5 V=2 -> p(a)=4/7 p(b)=3/7 unseen=1/7
    val docs = Seq((1L, "a a a", "en"), (2L, "b b", "en"),
      (3L, "c", "en")).toDF("doc_id", "text", "lang")
    def mb(p: Double): Long = Math.round(-(math.log(p) / math.log(2.0)) * 1e6)
    val expFull = 3 * mb(4.0 / 9) + 2 * mb(3.0 / 9) + mb(2.0 / 9)
    val expFl = 3 * mb(4.0 / 7) + 2 * mb(3.0 / 7) + mb(1.0 / 7)
    val r = graft.llm.LmScore
      .vocabFloorAudit(docs, "doc_id", "text", "lang")
      .select(col("lang"), col("n_docs"), col("tokens"),
        col("vocab_full"), col("vocab_floored"), col("sum_mb_full"),
        col("sum_mb_floored"), col("n_bucket_moved"))
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(r.length === 1)
    val (_, nd, tk, vf, vfl, smf, smfl, _) = r.head
    assert((nd, tk, vf, vfl) === ((3L, 6L, 3L, 2L)))
    assert(smf === expFull, "full-vocab microbit mass")
    assert(smfl === expFl, "floored microbit mass incl. the unseen path")
    assert(mb(4.0 / 7) < mb(4.0 / 9),
      "kept tokens price CHEAPER under the floored model")
    assert(mb(1.0 / 7) > mb(2.0 / 9),
      "the floored singleton prices DEARER")
  }

  test("vocabFloorAudit: a language whose ENTIRE vocab floors stays " +
      "visible with vocab_floored = 0 and the log2(v_full) unseen cost") {
    // lang zz is all singletons -> df >= 2 keeps nothing; the audit
    // must still report it (the r12 inner join dropped it silently)
    val docs = Seq((1L, "a a a", "en"), (2L, "b b", "en"),
      (3L, "x y z", "zz")).toDF("doc_id", "text", "lang")
    def mb(p: Double): Long = Math.round(-(math.log(p) / math.log(2.0)) * 1e6)
    val r = graft.llm.LmScore
      .vocabFloorAudit(docs, "doc_id", "text", "lang")
      .select(col("lang"), col("n_docs"), col("tokens"),
        col("vocab_full"), col("vocab_floored"), col("sum_mb_floored"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> x).toMap
    assert(r.contains("zz"), "fully-floored language must appear")
    val (_, nd, tk, vf, vfl, smfl) = r("zz")
    assert((nd, tk, vf, vfl) === ((1L, 3L, 3L, 0L)))
    // degenerate all-unseen cost: add-one uniform over the full vocab
    assert(smfl === 3 * mb(1.0 / 3))
    assert(r("en")._5 === 2L, "non-degenerate language unchanged")
  }

  test("compressionCurve pads to rounds+1 rows when training stops " +
      "early (fully-merged corpus carries its final state forward)") {
    // one distinct word of 2 chars -> exactly 1 executable merge; the
    // curve must still emit rounds+1 rows, flat after the stop (the
    // q299 oracle's LEFT JOIN ... ON TRUE fallback behaves the same)
    val docs = Seq((1L, "ab ab ab")).toDF("doc_id", "text")
    val rows = graft.llm.Bpe.compressionCurve(docs, "text", 4)
      .orderBy(col("round"))
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length === 5)
    assert(rows.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    assert(rows.head._3 === 6L, "round 0: raw char mass (3 x 'ab')")
    assert(rows.drop(1).forall(_._3 === 3L),
      "after the single merge the state is carried forward unchanged")
  }

  test("compressionCurve: word mass constant, symbol mass strictly " +
      "falls by each winner's pair count, round 0 = raw chars") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val rows = graft.llm.Bpe.compressionCurve(docs, "text", 8)
      .orderBy(col("round"))
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length === 9)
    assert(rows.map(_._2).distinct.length === 1, "n_words is constant")
    rows.sliding(2).foreach {
      case Array(a, b) => assert(b._3 < a._3,
        s"round ${b._1}: an executed merge must strictly shrink mass")
      case _ =>
    }
    // round 0 is the raw character mass of the whitespace tokens
    val chars = docs.select(explode(
        graft.llm.TextFunctions.tokens(col("text"))).as("w"))
      .agg(sum(length(col("w"))).cast("long")).as[Long].head()
    assert(rows.head._3 === chars)
    // per-round drop equals the winning pair count train() reports
    val train = graft.llm.Bpe.train(docs, "text", 8)
      .select(col("merge_round"), col("pair_n"))
      .as[(Long, Long)].collect().toMap
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 - b._3 === train(b._1),
          s"round ${b._1}: mass drop == winner pair_n")
      case _ =>
    }
  }
}
