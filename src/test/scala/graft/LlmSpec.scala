package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{Dedup, TextFunctions => TF}

class LlmSpec extends AnyFunSuite {
  import TestSession._

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    spark.range(1).select(c).head()

  test("tokenization and counting handle messy whitespace") {
    assert(one(TF.tokenCount(lit("  a  b\tc \n d "))).getLong(0) === 4L)
    assert(one(TF.tokenCount(lit(""))).getLong(0) === 0L)
  }

  test("rough subword count splits alpha/digit/punct runs") {
    assert(one(TF.roughSubwordCount(lit("abc123def"))).getLong(0) === 3L)
    assert(one(TF.roughSubwordCount(lit("hello world"))).getLong(0) === 2L)
    assert(one(TF.roughSubwordCount(lit("a-b c"))).getLong(0) === 4L)
  }

  test("fingerprint is whitespace/case insensitive (normalized exact dedup)") {
    val fp1 = one(TF.fingerprint(lit("Hello   World"))).getString(0)
    val fp2 = one(TF.fingerprint(lit("  hello world "))).getString(0)
    val fp3 = one(TF.fingerprint(lit("hello worlds"))).getString(0)
    assert(fp1 === fp2)
    assert(fp1 !== fp3)
  }

  test("portable hash matches the DuckDB formulation value") {
    // CAST(concat('0x', substr(md5('3|x'),1,8)) AS BIGINT) cross-checked by
    // the oracle gate; here assert determinism + 32-bit range
    val h = one(TF.portableHash(lit("x"), 3)).getLong(0)
    assert(h === one(TF.portableHash(lit("x"), 3)).getLong(0))
    assert(h >= 0 && h <= 0xFFFFFFFFL)
  }

  test("shingles produce n-grams, empty below n tokens") {
    val sh = one(Dedup.shingles(TF.tokens(lit("a b c d")), 3)).getSeq[String](0)
    assert(sh.toSet === Set("a b c", "b c d"))
    assert(one(Dedup.shingles(TF.tokens(lit("a b")), 3)).getSeq[String](0).isEmpty)
  }

  test("native shingles expression equals the HOF formulation on real docs") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.documents(spark, sfDir)
    val native = docs.select(col("doc_id"), Dedup.shinglesText(col("text"), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val hof = docs.select(col("doc_id"),
        Dedup.shingles(TF.tokens(col("text")), 3).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native === hof)
  }

  test("occurrence-mode shingles equal the sliding-window HOF formulation") {
    import org.apache.spark.sql.functions.{col, expr}
    val docs = graft.core.Tables.documents(spark, sfDir).limit(100)
    val native = docs.select(col("doc_id"), TF.bigrams(col("text")).as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // reference formulation: every adjacent token pair, multiplicity kept
    val hof = docs
      .select(col("doc_id"), TF.tokens(col("text")).as("t"))
      .select(col("doc_id"), expr(
        """CASE WHEN size(t) >= 2
           THEN zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),
                         (a, b) -> concat(a, ' ', b))
           ELSE array() END""").as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native === hof)
  }

  test("native minhash expression equals the HOF formulation on real docs") {
    import org.apache.spark.sql.functions.{col, size}
    val sh = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), Dedup.shingles(TF.tokens(col("text")), 3).as("sh"))
      .where(size(col("sh")) > 0)
    val native = sh.select(col("doc_id"), Dedup.minhashSignature(col("sh"), 8).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val hof = sh.select(col("doc_id"), Dedup.minhashSignatureHof(col("sh"), 8).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native === hof)
  }

  test("identical texts have identical minhash; jaccard 1.0; disjoint 0.0") {
    import spark.implicits._
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog"),
                 (2L, "the quick brown fox jumps over the lazy dog"),
                 (3L, "completely different words entirely here now today"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.shingles(TF.tokens(col("text")), 3).as("sh"))
      .select(col("doc_id"), Dedup.minhashSignature(col("sh"), 8).as("mh"), col("sh"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows(0).getSeq[Long](1) === rows(1).getSeq[Long](1))
    assert(rows(0).getSeq[Long](1) !== rows(2).getSeq[Long](1))
    val jac = df.as("a").crossJoin(df.as("b"))
      .where(col("a.doc_id") === 1 && col("b.doc_id") === 2)
      .select(Dedup.jaccard(col("a.sh"), col("b.sh"))).head().getDouble(0)
    assert(jac === 1.0)
  }

  test("LSH near-dup pipeline finds planted duplicates, skips unrelated") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, base),
      (2L, base + " nu"),                         // near-dup of 1
      (3L, "one two three four five six seven eight nine ten eleven twelve"),
      (4L, "red orange yellow green blue indigo violet pink brown black white gray"))
      .toDF("doc_id", "text")
    val pairs = Dedup.nearDuplicatePairs(docs, "doc_id", "text",
      shingleN = 3, k = 8, bands = 4, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)))
  }

  test("curation drop-set anti-join survives with broadcast disabled (unbounded set at scale)") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = Seq(
      (1L, base),
      (2L, base + " nu"), // near-dup of 1 → dropped (higher id)
      (3L, "one two three four five six seven eight nine ten eleven twelve"))
      .toDF("doc_id", "text")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // at 100 TB the drop set is O(dup-fraction × corpus): the plan must not
    // DEPEND on broadcasting it (AQE may still choose to when it is small)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val curated = graft.llm.Curation.curate(docs, stopwords = Seq("the", "a"),
        minQuality = 0.0, jaccardThreshold = 0.5)
      val kept = curated.select("doc_id").as[Long].collect().toSet
      assert(kept === Set(1L, 3L))
      val plan = curated.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"drop-set anti-join must tolerate a non-broadcast plan:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("native simhash equals the HOF formulation on real docs (16 and 32 bit)") {
    import org.apache.spark.sql.functions.col
    val docs = graft.core.Tables.documents(spark, sfDir)
    for (bits <- Seq(16, 32)) {
      val native = docs.select(col("doc_id"),
          Dedup.simhash(TF.tokens(col("text")), bits).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hof = docs.select(col("doc_id"),
          Dedup.simhashHof(TF.tokens(col("text")), bits).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(native === hof, s"bits=$bits")
    }
  }

  test("simhash: identical text equal, near text close, different text far") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "the quick brown fox jumps over the lazy cat again and again"),
      (4L, "zero one two three four five six seven eight nine ten eleven"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), Dedup.simhash16(TF.tokens(col("text"))).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(m(1L) === m(2L))
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)))
  }

  test("connected components merge transitive near-dup chains into one cluster") {
    import spark.implicits._
    // {1,5,9} connected only through 9, {10,11,12} a chain — pairwise
    // drop-higher-id would keep both 1 and 5; clusters keep the minimum
    val pairs = Seq((1L, 9L), (5L, 9L), (10L, 11L), (11L, 12L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 5L -> 1L, 9L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("connected components resolve a 256-node adversarial chain in O(log n) rounds") {
    import spark.implicits._
    // a pure path graph is the worst case for min-label propagation
    // (255 rounds); star alternation must land it within ~log2(256)+slack
    val chain = (0L until 255L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    // smallGraphThreshold = 0 pins the DISTRIBUTED star path — the
    // default would resolve this driver-side
    val got = Dedup.connectedComponents(chain, maxRounds = 12,
        smallGraphThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 256)
    assert(got.values.forall(_ === 0L), "one component labeled by min id")
  }

  test("packing shuffles token counts, never document text") {
    val df = graft.llm.Packing.packChunks(
      graft.core.Tables.documents(spark, sfDir), "doc_id", "text", "lang", 512, 8)
    val plan = df.queryExecution.executedPlan.toString
    // tokenCount must be projected BEFORE the window exchange: the only
    // thing that shuffles is (doc_id, lang, tok_count, shard)
    val exchangeIdx = plan.indexOf("Exchange")
    assert(exchangeIdx >= 0, s"expected a window exchange in:\n$plan")
    assert(!plan.substring(0, exchangeIdx).contains("text#"),
      s"document text crossed the shuffle:\n$plan")
  }

  test("driver union-find and distributed star components agree on a random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(500)((rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }
      .toDF("doc_a", "doc_b")
    val small = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(edges, smallGraphThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(small === dist)
  }

  test("self-loop-only nodes survive as singleton clusters on both component paths") {
    import spark.implicits._
    // 7 appears only as a self-pair (a caller not enforcing doc_a < doc_b);
    // 2 has a self-loop AND a real edge — one row, labeled by its component
    val pairs = Seq((7L, 7L), (1L, 2L), (2L, 2L)).toDF("doc_a", "doc_b")
    val want = Map(7L -> 7L, 1L -> 1L, 2L -> 1L)
    val small = Dedup.connectedComponents(pairs).as[(Long, Long)].collect()
    assert(small.length === 3, "exactly one row per node")
    assert(small.toMap === want)
    val dist = Dedup.connectedComponents(pairs, smallGraphThreshold = 0L)
      .as[(Long, Long)].collect()
    assert(dist.length === 3)
    assert(dist.toMap === want)
  }

  test("substring dedup finds maximal cross-doc token spans, ignores within-doc repeats") {
    import spark.implicits._
    // docs 1 & 2 share the exact 8-token run s1..s8 (⇒ 4 consecutive
    // duplicated 5-gram positions, one span of 8 tokens); doc 3 repeats
    // its OWN 5-gram twice but shares nothing cross-doc; doc 4 is short
    val docs = Seq(
      (1L, "a b c s1 s2 s3 s4 s5 s6 s7 s8 x y"),
      (2L, "p q s1 s2 s3 s4 s5 s6 s7 s8 r"),
      (3L, "m1 m2 m3 m4 m5 z m1 m2 m3 m4 m5"),
      (4L, "t u v")).toDF("doc_id", "text")
    val got = graft.llm.SubstringDedup.duplicatedSpans(docs, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === Map(
      1L -> ((4L, 1L, 8L)), 2L -> ((4L, 1L, 8L)),
      3L -> ((0L, 0L, 0L)), 4L -> ((0L, 0L, 0L))))
  }

  test("space-saving retains true heavy hitters even past capacity") {
    // 3 counters for 5 distinct items: the two genuinely frequent items
    // must survive eviction pressure with counts >= their true frequency
    val agg = new graft.operators.SpaceSavingAggregator(3, 3)
    val stream = (Seq.fill(50)("hot1") ++ Seq.fill(30)("hot2") ++
      Seq("r1", "r2", "r3", "r1", "r2")).sorted // adversarial-ish order
    val summary = stream.foldLeft(agg.zero)(agg.reduce)
    val top = agg.finish(summary).toMap
    assert(top.contains("hot1") && top("hot1") >= 50L)
    assert(top.contains("hot2") && top("hot2") >= 30L)
    // merge across a split equals the single-pass summary in the top ranks
    val (l, r) = stream.splitAt(stream.length / 2)
    val merged = agg.finish(agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
    assert(merged.map(_._1).take(2).toSet === Set("hot1", "hot2"))
  }

  test("simhash near-dup (64-bit, 16-bit bands) recalls planted near-dups, skips unrelated") {
    import spark.implicits._
    // fixture chosen by computing the md5-derived 64-bit simhash offline:
    // appending "extra1" to the 101-token base flips exactly 1 bit
    // (majority margins absorb the rest), while the unrelated doc is 31
    // bits away — a deterministic recall/precision probe
    val base = (0 until 101).map(i => s"w$i")
    val near = base :+ "extra1"
    val docs = Seq(
      (1L, base.mkString(" ")),
      (2L, near.mkString(" ")), // Hamming 1 from doc 1
      (3L, (0 until 60).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDuplicates(docs, "doc_id", "text", maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("PII redaction masks emails, phones and long digit runs, counts them") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact jane.doe+x@example.org or call 555-123-4567 ref 123456789012"),
      (2L, "no pii here, just words and the number 42"))
      .toDF("doc_id", "text")
    val (ne, np, nd) = graft.llm.TextFunctions.piiCounts(col("text"))
    val rows = df.select(col("doc_id"),
        graft.llm.TextFunctions.redactPii(col("text")).as("red"),
        ne.as("e"), np.as("p"), nd.as("d"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(1) === "contact <EMAIL> or call <PHONE> ref <ID>")
    assert((rows(1L).getLong(2), rows(1L).getLong(3), rows(1L).getLong(4)) === ((1L, 1L, 1L)))
    assert(rows(2L).getString(1) === "no pii here, just words and the number 42")
    assert((rows(2L).getLong(2), rows(2L).getLong(3), rows(2L).getLong(4)) === ((0L, 0L, 0L)))
  }

  test("stratified sampling is deterministic and respects per-stratum rates") {
    import spark.implicits._
    val df = (0 until 4000).map(i => (i.toLong, if (i % 2 == 0) "en" else "zh"))
      .toDF("doc_id", "lang")
    val keep = graft.llm.TextFunctions.stratifiedKeep(
      col("doc_id"), col("lang"), Map("en" -> 0.5), defaultRate = 0.0)
    val kept = df.where(keep).select("doc_id", "lang").as[(Long, String)].collect()
    assert(kept.forall(_._2 == "en"), "zero-rate stratum fully excluded")
    val frac = kept.length / 2000.0
    assert(math.abs(frac - 0.5) < 0.05, s"en keep fraction $frac far from 0.5")
    // purely id-determined: a second evaluation selects the identical set
    val again = df.where(keep).select("doc_id").as[Long].collect().toSet
    assert(again === kept.map(_._1).toSet)
  }

  test("repetition score: 0 for all-distinct text, high for looped text") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g h"),            // all distinct
      (2L, "spam spam spam spam spam"),   // one token looped
      (3L, ""))                           // empty
      .toDF("doc_id", "text")
    val m = df.select(col("doc_id"),
        graft.llm.TextFunctions.repetitionScore(col("text"), 1).as("r1"),
        graft.llm.TextFunctions.repetitionScore(col("text"), 3).as("r3"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(m(1L) === ((0.0, 0.0)))
    assert(m(2L)._1 === 0.8)  // 5 occurrences, 1 distinct
    assert(m(2L)._2 === 1.0 - 1.0 / 3.0) // 3 trigram occurrences, 1 distinct
    assert(m(3L) === ((0.0, 0.0)))
  }

  test("langId picks marker-dominant language deterministically") {
    import spark.implicits._
    val out = Seq(
      ("the cat is on the mat and it is happy", "en"),
      ("der hund und die katze das ist gut", "de"),
      ("le chat et la souris est ici", "fr"),
      ("el perro y los gatos es bueno", "es"),
      ("xyzzy plugh quux", "und"))
      .toDF("text", "expected")
      .select(TF.langId(col("text")).as("got"), col("expected"))
      .collect()
    out.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("quality score is bounded in [0,1] over the fixture") {
    val q = graft.queries.LlmQueries.queries("q38_text_quality")(spark, sfDir)
    val stats = q.agg(min(col("quality")), max(col("quality"))).head()
    assert(stats.getDouble(0) >= 0.0 && stats.getDouble(1) <= 1.0)
  }

  test("llm plans: no UDFs, pruned columnar scan, single narrow stage") {
    val df = graft.queries.LlmQueries.queries("q37_text_stats")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // pure expression pipeline: no UDF eval, no object deserialization
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF")
      && !plan.contains("DeserializeToObject"), s"unexpected UDF/objects in:\n$plan")
    // column pruning reached the scan: only the needed columns are read
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      s"scan not pruned in:\n$plan")
    // no shuffle anywhere — per-document ops are a narrow map stage
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("pii redaction and stratified sampling plan as shuffle-free scans") {
    for (q <- Seq("q63_pii_redaction", "q64_stratified_sample")) {
      val df = graft.queries.LlmQueries.queries(q)(spark, sfDir)
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$q: unexpected shuffle in:\n$plan")
      assert(!plan.contains("ScalaUDF") && !plan.contains("DeserializeToObject"),
        s"$q: unexpected UDF/objects in:\n$plan")
    }
    // sampling projects only the two needed columns from the scan
    val plan64 = graft.queries.LlmQueries.queries("q64_stratified_sample")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan64.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"sampling scan not pruned:\n$plan64")
  }

  test("contamination: planted eval docs score 1.0, overlap via broadcast semi-join") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sfDir)
    val evalSet = docs.where(col("doc_id") < 5)
      .select(explode(graft.llm.Dedup.shinglesText(col("text"), 3)).as("g"))
    val df = graft.llm.Contamination.contaminationScore(docs, evalSet,
      "doc_id", "text", n = 3)
    val byId = df.collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // the eval docs themselves: every shingle matches
    (0L until 5L).filter(byId.contains).foreach { id =>
      assert(byId(id)._3 === 1.0, s"doc $id should self-contaminate fully")
    }
    // bounds hold everywhere
    byId.values.foreach { case (total, m, c) =>
      assert(m >= 0 && m <= total && c >= 0.0 && c <= 1.0)
    }
    // the eval table broadcasts; the corpus side never exchanges for the probe
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"eval n-gram probe should broadcast:\n$plan")
  }

  test("mixture balance: binding stratum keeps all, others hit hash-exact rates") {
    import spark.implicits._
    val rows = (0L until 100L).map(i => (i, "a")) ++
               (100L until 150L).map(i => (i, "b"))
    val df = rows.toDF("doc_id", "lang")
    // T = min(100/0.5, 50/0.5) = 100 → rate_a = 0.5, rate_b = 1.0
    val kept = graft.llm.Mixture.balanceToTargets(df, "doc_id", "lang",
        Map("a" -> 0.5, "b" -> 0.5))
      .as[(Long, String)].collect().toSet
    val bRows = rows.filter(_._2 == "b").toSet
    assert(bRows.subsetOf(kept), "binding stratum keeps every row")
    // stratum a must equal the hash predicate applied at rate 0.5 exactly
    // (seed 13: mixture membership is independent of stratifiedKeep's 7)
    val expectA = df.where(col("lang") === "a")
      .where(pmod(TF.portableHash(col("doc_id").cast("string"), 13),
        lit(1000000L)) < lit(0.5) * 1000000L)
      .as[(Long, String)].collect().toSet
    assert(kept -- bRows === expectA)
    // reruns are identical (pure function of ids)
    val again = graft.llm.Mixture.balanceToTargets(df, "doc_id", "lang",
      Map("a" -> 0.5, "b" -> 0.5)).as[(Long, String)].collect().toSet
    assert(again === kept)
  }

  test("overlapping chunks cover every token; tail chunk shortens") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 11).map(i => s"t$i").mkString(" ")), // 11 tokens
      (2L, "a b c"),                                  // fits one chunk
      (3L, "")                                        // empty doc
    ).toDF("doc_id", "text")
    val got = graft.llm.Packing.chunkWithOverlap(docs, "doc_id", "text",
        window = 4, stride = 3)
      .as[(Long, Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // doc 1: starts 0,3,6,9 → 4 chunks, last has 2 tokens
    assert(got(1L).map(_._3).toSeq === Seq(4L, 4L, 4L, 2L))
    assert(got(1L).head._4 === "t1 t2 t3 t4")
    assert(got(1L)(1)._4 === "t4 t5 t6 t7", "stride 3 overlaps one token")
    assert(got(1L).last._4 === "t10 t11")
    // every token of doc 1 appears in some chunk
    val covered = got(1L).flatMap(_._4.split(" ")).toSet
    assert(covered === (1 to 11).map(i => s"t$i").toSet)
    assert(got(2L).map(c => (c._2, c._3, c._4)).toSeq === Seq((0L, 3L, "a b c")))
    assert(got(3L).map(c => (c._2, c._3, c._4)).toSeq === Seq((0L, 0L, "")))
  }

  test("chunking law holds over random token counts (count, width, coverage)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val W = 16; val S = 11
    val docs = (0L until 120L).map { id =>
      val n = rnd.nextInt(80) // includes 0, < W, == W, and multi-chunk
      (id, (0 until n).map(i => s"d${id}_t$i").mkString(" "))
    }
    val byDoc = graft.llm.Packing.chunkWithOverlap(
        docs.toDF("doc_id", "text"), "doc_id", "text", W, S)
      .as[(Long, Long, Long, String)].collect().groupBy(_._1)
    docs.foreach { case (id, text) =>
      val n = if (text.isEmpty) 0 else text.split(" ").length
      val chunks = byDoc(id).sortBy(_._2)
      val wantChunks = 1 + math.max(0, math.ceil((n - W).toDouble / S).toInt)
      assert(chunks.length === wantChunks, s"doc $id n=$n")
      chunks.foreach { case (_, idx, ctok, ctext) =>
        assert(ctok === math.min(W.toLong, n - idx * S))
        assert((if (ctext.isEmpty) 0 else ctext.split(" ").length) === ctok)
      }
      // every token position is in at least one chunk
      val covered = chunks.flatMap(_._4.split(" ").filter(_.nonEmpty)).toSet
      assert(covered === (0 until n).map(i => s"d${id}_t$i").toSet)
    }
  }

  test("winnowing: >= w+k-1 token matches share a fingerprint; density is sketch-sized") {
    import spark.implicits._
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel" // 8 = w+k-1
    val docs = Seq(
      (1L, s"one two three $shared four five six seven eight nine ten"),
      (2L, s"uno dos tres cuatro $shared cinco seis siete ocho nueve"),
      (3L, "totally disjoint vocabulary here with many many more words than needed")
    ).toDF("doc_id", "text")
    val fp = graft.llm.Winnowing.fingerprints(docs, "doc_id", "text", k = 4, w = 5)
      .as[(Long, Long, Long)].collect()
    val byDoc = fp.groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    // the MOSS guarantee: the shared 8-token run forces a shared VALUE
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "shared substring must share a fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty && (byDoc(2L) & byDoc(3L)).isEmpty,
      "disjoint docs share nothing")
    // sketch, not the full gram set: doc 3 has 12 tokens -> 9 grams, 5 windows
    assert(fp.count(_._1 == 3L) < 9, "winnowed set smaller than gram count")
    // pair surface agrees AND carries the true shared-value count
    val pairs = graft.llm.Winnowing.candidatePairs(docs, "doc_id", "text", 4, 5)
      .as[(Long, Long, Long)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet === Set((1L, 2L)))
    assert(pairs.head._3 === (byDoc(1L) & byDoc(2L)).size.toLong,
      "shared_fps = number of shared fingerprint values, not 1-per-pair")
  }

  test("winnowing guarantee holds over randomized planted matches (w+k-1 law)") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val k = 4; val w = 5; val need = w + k - 1 // 8 tokens
    // 60 doc pairs: each shares a random >= 8-token run at random offsets,
    // surrounded by pair-unique filler so only the planted run collides
    val docs = (0 until 60).flatMap { p =>
      val run = (0 until need + rnd.nextInt(5)).map(i => s"s${p}_$i").mkString(" ")
      def filler(tag: String) =
        (0 until rnd.nextInt(12)).map(i => s"f${p}${tag}_$i").mkString(" ")
      Seq((p * 2L, s"${filler("a")} $run ${filler("b")}".trim),
          (p * 2L + 1L, s"${filler("c")} $run ${filler("d")}".trim))
    }
    val fp = graft.llm.Winnowing.fingerprints(docs.toDF("doc_id", "text"),
        "doc_id", "text", k, w)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._3).toSet).toMap
    (0 until 60).foreach { p =>
      assert((fp(p * 2L) & fp(p * 2L + 1L)).nonEmpty,
        s"pair $p: a >= ${need}-token shared run must share a fingerprint")
    }
  }

  test("lm surprisal: rare-token docs score more bits than common-token docs") {
    import spark.implicits._
    // "the" dominates the corpus; docs 1-3 are all-"the", doc 4 is all
    // hapaxes — its tokens carry maximal information under the corpus LM
    val docs = Seq(
      (1L, "en", "the the the the"), (2L, "en", "the the the"),
      (3L, "en", "the the the the the"),
      (4L, "en", "zyx wvu tsr qpo")).toDF("doc_id", "lang", "text")
    val got = graft.llm.LmScore.unigramSurprisal(docs, "doc_id", "text", "lang")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    // identical token distribution ⇒ identical mean bits regardless of length
    assert(got(1L)._4 === got(2L)._4)
    assert(got(2L)._4 === got(3L)._4)
    assert(got(4L)._4 > got(1L)._4, "hapax doc must out-surprise the common doc")
    // p(the) = (12+1)/(16+5); mean microbits must match the closed form
    val want = math.round(-math.log(13.0 / 21.0) / math.log(2.0) * 1e6)
    assert(got(1L)._3 === want * 4, "exact integer microbit total")
  }

  test("new pipeline ops keep their scale plan shapes (no stray shuffles)") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    // chunking is a pure narrow generator — zero exchanges
    val chunkPlan = graft.llm.Packing.chunkWithOverlap(docs, "doc_id", "text",
      120, 80).queryExecution.executedPlan.toString
    assert(!chunkPlan.contains("Exchange"),
      s"chunking must stay narrow:\n$chunkPlan")
    // epoch shuffle: exactly one exchange — the per-shard window
    val shufPlan = graft.llm.Packing.epochShuffle(docs, "doc_id", 8, 1)
      .queryExecution.executedPlan.toString
    assert(shufPlan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      s"epoch shuffle = one hash exchange:\n$shufPlan")
    // mixture balancing: the rate table reaches the corpus via broadcast —
    // the corpus itself never shuffles (document text must not cross an
    // Exchange)
    val mixPlan = graft.llm.Mixture.balanceToTargets(docs, "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.5)).queryExecution.executedPlan.toString
    assert(mixPlan.contains("BroadcastHashJoin"),
      s"mixture rate join should broadcast:\n$mixPlan")
    assert(!mixPlan.linesIterator.exists(l =>
        l.contains("Exchange hashpartitioning") && l.contains("text#")),
      s"document text crossed a shuffle:\n$mixPlan")
  }

  test("closing analytics keep their scale plan shapes") {
    import graft.queries.AnalyticQueries
    // regression: one exchange (the priority hash agg), nothing else
    val regPlan = AnalyticQueries.queries("q131_regression")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(regPlan.linesIterator.count(_.contains("Exchange")) == 1,
      s"regression = one exchange:\n$regPlan")
    assert(!regPlan.contains("Window"), "regression must not plan a window")
    // rolling distinct: window-explode shape — no ranking window, no
    // cartesian, no nested-loop join
    Seq("q134_rolling_dau", "q135_rolling_hll").foreach { n =>
      val p = AnalyticQueries.queries(n)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("Window"), s"$n must not plan a ranking window")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$n must not plan an unbounded join")
    }
    // entropy: exactly the (doc, tok) + (doc) aggregation pair
    val entPlan = graft.queries.LlmQueries.queries("q133_token_entropy")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(entPlan.linesIterator.count(_.contains("Exchange")) == 2,
      s"entropy = two exchanges:\n$entPlan")
  }

  test("epoch shuffle: a seeded permutation with contiguous per-shard positions") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    val e1 = graft.llm.Packing.epochShuffle(docs, "doc_id", shards = 4, seed = 1)
      .as[(Long, Long, Long)].collect()
    assert(e1.length === 200, "permutation: every doc exactly once")
    assert(e1.map(_._1).toSet === (0L until 200L).toSet)
    e1.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
        "positions contiguous from 1 within each shard")
    }
    // same seed reproduces; a different seed reorders
    val e1b = graft.llm.Packing.epochShuffle(docs, "doc_id", 4, seed = 1)
      .as[(Long, Long, Long)].collect()
    assert(e1.sortBy(_._1).toSeq === e1b.sortBy(_._1).toSeq)
    val e2 = graft.llm.Packing.epochShuffle(docs, "doc_id", 4, seed = 2)
      .as[(Long, Long, Long)].collect()
    assert(e1.sortBy(_._1).toSeq !== e2.sortBy(_._1).toSeq)
  }

  test("count-min sketch: partition-independent cells, row-sum conservation, no undercount") {
    import spark.implicits._
    import graft.operators.{CountMin, CountMinAggregator}
    val depth = 4; val width = 8
    val items = Seq.fill(100)("alpha") ++ Seq.fill(37)("beta") ++
      (1 to 50).map(i => s"tail$i")
    val n = items.length.toLong
    def build(parts: Int): Array[Long] = {
      val agg = new CountMinAggregator(depth, width).toColumn
      items.toDF("tok").repartition(parts).as[String]
        .groupByKey(_ => 0).mapValues(identity)
        .agg(agg.name("cells")).collect().head._2
    }
    val one = build(1)
    // merge of per-partition partials is elementwise addition — the grid
    // is bit-identical under ANY partitioning (unlike space-saving's
    // approx regime)
    assert(one.toSeq === build(8).toSeq)
    // every row of the grid conserves the total occurrence count
    (0 until depth).foreach { i =>
      assert(one.slice(i * width, (i + 1) * width).sum === n)
    }
    // point estimates never undercount; heavy items stay separable from
    // the tail noise floor (overcount is bounded by colliding mass)
    assert(CountMin.estimate(one, "alpha", depth, width) >= 100L)
    assert(CountMin.estimate(one, "beta", depth, width) >= 37L)
    (1 to 50).foreach { i =>
      assert(CountMin.estimate(one, s"tail$i", depth, width) >= 1L)
    }
    assert(CountMin.estimate(one, "never-seen", depth, width) >= 0L)
  }

  test("bloom filter: no false negatives; OR-merge partition- and duplication-independent") {
    import spark.implicits._
    import graft.operators.{Bloom, BloomAggregator}
    val k = 4; val m = 256
    val items = (1 to 60).map(i => s"item$i")
    def build(parts: Int, data: Seq[String]): Array[Long] = {
      val agg = new BloomAggregator(k, m).toColumn
      data.toDF("tok").repartition(parts).as[String]
        .groupByKey(_ => 0).mapValues(identity)
        .agg(agg.name("w")).collect().head._2
    }
    val one = build(1, items)
    assert(one.toSeq === build(8, items).toSeq, "partition-independent")
    // OR is idempotent: replaying the input must not change the filter
    // (the property counting sketches lack)
    assert(one.toSeq === build(8, items ++ items).toSeq, "duplication-independent")
    items.foreach(i =>
      assert(Bloom.contains(one, i, k, m), s"false negative for $i"))
    // absent items mostly rejected — fp rate at 60 items in 256 bits with
    // k=4 is ~10%, so 200 probes stay far under half
    val fp = (1 to 200).count(i => Bloom.contains(one, s"absent$i", k, m))
    assert(fp < 100, s"false-positive count implausibly high: $fp/200")
  }

  test("gopher rules gate on word count, alpha ratio, stopwords and mean length") {
    import spark.implicits._
    val stops = Seq("the", "a")
    val docs = Seq(
      (1L, ("the fox " * 30).trim),   // 60 words, all alpha, stops -> pass
      (2L, "the quick fox"),          // under the 50-word floor -> fail
      (3L, ("123 456 " * 30).trim),   // alpha ratio 0, no stops -> fail
      (4L, ("zz yy " * 30).trim)      // no stopword hits -> fail
    ).toDF("doc_id", "t")
    val (wc, meanLen, alphaR, symR, stopHits, passes) =
      TF.gopherRules(col("t"), stops)
    val got = docs.select(col("doc_id"), wc.as("wc"), meanLen.as("ml"),
        alphaR.as("ar"), symR.as("sr"), stopHits.as("sh"), passes.as("p"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getBoolean(6), "healthy doc passes")
    assert(got(1L).getLong(1) === 60L)
    assert(got(1L).getDouble(2) === 3.0)   // "the"/"fox" both length 3
    assert(got(1L).getDouble(3) === 1.0)
    assert(got(1L).getDouble(4) === 0.0)
    assert(!got(2L).getBoolean(6), "word-count floor")
    assert(!got(3L).getBoolean(6), "alpha-ratio floor")
    assert(got(3L).getDouble(3) === 0.0)
    assert(!got(4L).getBoolean(6), "stopword floor")
    assert(got(4L).getLong(5) === 0L)
  }

  test("keep-best curation keeps the max-quality cluster member, not the min id") {
    import spark.implicits._
    val got = graft.queries.LlmQueries.queries("q130_keep_best")(spark, TestSession.sfDir)
      .as[(Long, Long, Long, Long)].collect()
    // recompute each cluster's membership + quality independently
    val cl = graft.llm.Dedup.nearDuplicateClusters(
      graft.core.Tables.documents(spark, TestSession.sfDir), "doc_id", "text",
      shingleN = 3, k = 8, bands = 4, threshold = 0.5)
      .as[(Long, Long)].collect().groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val q = graft.core.Tables.documents(spark, TestSession.sfDir)
      .select(col("doc_id"),
        floor(graft.llm.TextFunctions.qualityScore(col("text"),
          graft.queries.LlmQueries.stopwords) * lit(1e9)).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(got.map(_._1).toSet === cl.keySet, "one output row per cluster")
    got.foreach { case (cid, kept, nMembers, bestQ) =>
      val members = cl(cid)
      assert(members.contains(kept), s"kept doc $kept not in cluster $cid")
      assert(nMembers == members.size)
      assert(bestQ == members.map(q).max, s"best_q_grid wrong for $cid")
      val want = members.filter(m => q(m) == bestQ).min // max quality, min-id tie
      assert(kept == want, s"cluster $cid kept $kept, expected $want")
    }
    assert(got.exists { case (cid, kept, _, _) => kept != cid },
      "fixture must exercise the policy difference vs min-id keep")
  }

  test("training pipeline capstone: survivorship, invariants, determinism") {
    import spark.implicits._
    import graft.llm.TrainingDataPipeline
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir)
    val evalNgrams = docs.where(col("doc_id") < 5)
      .select(explode(graft.llm.Dedup.shinglesText(col("text"), 3)).as("g"))
    val cfg = TrainingDataPipeline.Config(
      mixtureTargets = Map("src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.25))
    val r = TrainingDataPipeline.run(docs, evalNgrams, graft.queries.LlmQueries.stopwords, cfg)

    // survivorship is monotone non-increasing through the drop stages
    val m = r.manifest.as[(String, Long)].collect().sortBy(_._1)
    val byStage = m.toMap
    assert(byStage("0_input") >= byStage("1_quality_gate"))
    assert(byStage("1_quality_gate") >= byStage("2_near_dup"))
    assert(byStage("2_near_dup") >= byStage("3_decontaminated"))
    assert(byStage("3_decontaminated") >= byStage("4_mixture"))
    assert(byStage("4_mixture") > 0, "pipeline must not drop everything")
    // every drop stage fires on this fixture (the capstone exercises all)
    assert(byStage("1_quality_gate") < byStage("0_input"))
    assert(byStage("2_near_dup") < byStage("1_quality_gate"))
    assert(byStage("3_decontaminated") < byStage("2_near_dup"))

    // no detectable near-dup pair survives: the banding is a pure
    // function of each doc, so any surviving pair would have collided
    // before dedup too and shared a cluster — of which one doc remains
    val survivorPairs = graft.llm.Dedup.nearDuplicatePairs(
      r.corpus, "doc_id", "text", 3, 8, 4, cfg.jaccardThreshold)
    assert(survivorPairs.count() == 0, "near-dup pair survived dedup")

    // no surviving doc exceeds the contamination ceiling
    val dirty = graft.llm.Contamination.contaminationScore(
      r.corpus, evalNgrams, "doc_id", "text", cfg.contamN)
      .where(col("contamination") > cfg.contaminationMax).count()
    assert(dirty == 0, "contaminated doc survived")

    // every train doc packs exactly once; chunk ids are dense from 0
    val trainIds = r.corpus.where(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    val packedIds = r.packed.select("doc_id").as[Long].collect()
    assert(packedIds.length == trainIds.size && packedIds.toSet == trainIds)
    r.packed.groupBy(col("lang"), col("shard"))
      .agg(min(col("chunk_id")).as("lo"), countDistinct(col("chunk_id")).as("nd"),
        max(col("chunk_id")).as("hi"))
      .collect().foreach { row =>
        assert(row.getLong(2) == 0L, "chunks start at 0")
        assert(row.getLong(3) == row.getLong(4) + 1, "chunk ids are dense")
      }

    // determinism: a rerun reproduces the exact survivor set
    val r2 = TrainingDataPipeline.run(docs, evalNgrams,
      graft.queries.LlmQueries.stopwords, cfg)
    val ids1 = r.corpus.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = r2.corpus.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2, "pipeline must be a pure function of its inputs")
  }

  test("pipeline terminal stages: one call goes corpus-in -> tokenizer " +
      "artifacts + loader blocks; written merges.txt/vocab.json reload " +
      "and re-encode to IDENTICAL blocks") {
    import spark.implicits._
    import graft.llm.{Bpe, Packing, TrainingDataPipeline}
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir)
    val evalNgrams = docs.where(col("doc_id") < 5)
      .select(explode(graft.llm.Dedup.shinglesText(col("text"), 3)).as("g"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pipe-artifacts").toString
    val cfg = TrainingDataPipeline.Config(tokenizerRounds = 6,
      blockTokens = 32, artifactDir = dir)
    val r = TrainingDataPipeline.run(docs, evalNgrams,
      graft.queries.LlmQueries.stopwords, cfg)

    val tok = r.tokenizer.get
    assert(tok.rules.nonEmpty && tok.rules.size <= 6)
    assert(tok.vocab(TrainingDataPipeline.EosToken) === tok.eosId)
    assert(tok.eosId === 256L + tok.rules.size)
    val m = r.manifest.as[(String, Long)].collect().toMap
    assert(m("6_tokenizer_rules") === tok.rules.size.toLong)
    val blocks = r.blocks.get
      .select(col("shard"), col("block_id"), col("n_ids"),
        col("n_docs"), col("first_doc"), col("block_hash"),
        col("boundaries"))
      .as[(Long, Long, Long, Long, Long, Long, String)]
      .collect().toSet
    assert(blocks.nonEmpty)
    assert(m("7_loader_blocks") === blocks.size.toLong)

    // write -> reload -> re-encode identity: the shipped artifacts
    // drive the exact same loader blocks
    val rules2 = Bpe.rulesFromFile(spark, s"$dir/merges.txt")
    val vocab2 = Bpe.vocabFromFile(spark, s"$dir/vocab.json")
    assert(rules2 === tok.rules, "merges.txt round trip")
    assert(vocab2 === tok.vocab, "vocab.json round trip")
    val train = r.corpus.where(col("split") === "train")
    val enc2 = Bpe.encodeIdsWith(train, "doc_id", "text", rules2,
      cfg.blockTokens, byteLevel = true, preTokenize = true,
      vocab = Some(vocab2),
      specialTokens = Seq(TrainingDataPipeline.EosToken))
    val blocks2 = Packing.packTokenBlocksLoader(enc2, "doc_id", "ids",
        cfg.blockTokens, cfg.shards, vocab2(TrainingDataPipeline.EosToken))
      .select(col("shard"), col("block_id"), col("n_ids"),
        col("n_docs"), col("first_doc"), col("block_hash"),
        col("boundaries"))
      .as[(Long, Long, Long, Long, Long, Long, String)]
      .collect().toSet
    assert(blocks2 === blocks,
      "reloaded artifacts must reproduce the exact loader blocks")
  }

  test("pipeline tokenizerFamily = wordpiece: ships vocab.txt; reload " +
      "rebuilds the line-order id map and re-encodes to IDENTICAL " +
      "loader blocks") {
    import spark.implicits._
    import graft.llm.{Packing, TrainingDataPipeline, WordPiece}
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir)
    val evalNgrams = docs.where(col("doc_id") < 5)
      .select(explode(graft.llm.Dedup.shinglesText(col("text"), 3)).as("g"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pipe-wp").toString
    val cfg = TrainingDataPipeline.Config(tokenizerRounds = 24,
      blockTokens = 32, artifactDir = dir, tokenizerFamily = "wordpiece")
    val r = TrainingDataPipeline.run(docs, evalNgrams,
      graft.queries.LlmQueries.stopwords, cfg)
    val tok = r.tokenizer.get
    assert(tok.family === "wordpiece")
    assert(tok.rules.nonEmpty && tok.rules.size <= 24)
    assert(tok.vocab(TrainingDataPipeline.WpUnk) === 0L)
    assert(tok.eosId === tok.vocab(TrainingDataPipeline.WpSep))
    val m = r.manifest.as[(String, Long)].collect().toMap
    assert(m("6_tokenizer_rules") === tok.rules.size.toLong)
    def blockSet(b: org.apache.spark.sql.DataFrame) = b
      .select(col("shard"), col("block_id"), col("n_ids"),
        col("n_docs"), col("first_doc"), col("block_hash"),
        col("boundaries"))
      .as[(Long, Long, Long, Long, Long, Long, String)]
      .collect().toSet
    val blocks = blockSet(r.blocks.get)
    assert(blocks.nonEmpty && m("7_loader_blocks") === blocks.size.toLong)
    // write -> reload -> re-encode identity off the vocab.txt ALONE
    // (line order = id order; specials lead, pieces follow)
    val lines = WordPiece.vocabFromFile(spark, s"$dir/vocab.txt")
    assert(lines.take(2) === Seq(TrainingDataPipeline.WpUnk,
      TrainingDataPipeline.WpSep))
    val ids2 = lines.zipWithIndex.map { case (p, i) => p -> i.toLong }.toMap
    assert(ids2 === tok.vocab, "vocab.txt round trip")
    val pieces2 = lines.drop(2).toSet
    assert(pieces2 === tok.pieces)
    val train = r.corpus.where(col("split") === "train")
    val enc2 = WordPiece.encodeIds(train, "doc_id", "text", pieces2,
      ids2, cfg.blockTokens)
    val blocks2 = blockSet(Packing.packTokenBlocksLoader(enc2,
      "doc_id", "ids", cfg.blockTokens, cfg.shards,
      ids2(TrainingDataPipeline.WpSep)))
    assert(blocks2 === blocks,
      "reloaded vocab.txt must reproduce the exact loader blocks")
  }

  test("pipeline tokenizerFamily = unigram: ships the spm-shape " +
      "piece/score dump; reload rebuilds scores + line-order ids and " +
      "re-encodes to IDENTICAL loader blocks") {
    import spark.implicits._
    import graft.llm.{Packing, TrainingDataPipeline, Unigram}
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir)
    val evalNgrams = docs.where(col("doc_id") < 5)
      .select(explode(graft.llm.Dedup.shinglesText(col("text"), 3)).as("g"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft-pipe-uni").toString
    val cfg = TrainingDataPipeline.Config(tokenizerRounds = 2,
      blockTokens = 32, artifactDir = dir, tokenizerFamily = "unigram")
    val r = TrainingDataPipeline.run(docs, evalNgrams,
      graft.queries.LlmQueries.stopwords, cfg)
    val tok = r.tokenizer.get
    assert(tok.family === "unigram" && tok.rules.isEmpty)
    assert(tok.vocab(TrainingDataPipeline.UniEos) === 0L)
    assert(tok.eosId === 0L)
    val m = r.manifest.as[(String, Long)].collect().toMap
    assert(m("6_tokenizer_rules") === tok.scores.size.toLong)
    def blockSet(b: org.apache.spark.sql.DataFrame) = b
      .select(col("shard"), col("block_id"), col("n_ids"),
        col("n_docs"), col("first_doc"), col("block_hash"),
        col("boundaries"))
      .as[(Long, Long, Long, Long, Long, Long, String)]
      .collect().toSet
    val blocks = blockSet(r.blocks.get)
    assert(blocks.nonEmpty && m("7_loader_blocks") === blocks.size.toLong)
    // write -> reload -> re-encode identity off the spm dump ALONE:
    // line order = id order, scores rescale exactly, the leading
    // separator is a control symbol the Viterbi never emits
    val model2 = Unigram.modelFromFile(spark, s"$dir/unigram.vocab")
    assert(model2.head === (TrainingDataPipeline.UniEos, 0L))
    val ids2 = model2.zipWithIndex
      .map { case ((p, _), i) => p -> i.toLong }.toMap
    assert(ids2 === tok.vocab, "spm dump round trip (ids)")
    val scores2 = model2.tail.toMap
    assert(scores2 === tok.scores, "spm dump round trip (scores)")
    val train = r.corpus.where(col("split") === "train")
    val enc2 = Unigram.encodeIds(train, "doc_id", "text", scores2,
      TrainingDataPipeline.UniMaxPiece, ids2,
      TrainingDataPipeline.UniMaxSeg, cfg.blockTokens)
    val blocks2 = blockSet(Packing.packTokenBlocksLoader(enc2,
      "doc_id", "ids", cfg.blockTokens, cfg.shards, 0L))
    assert(blocks2 === blocks,
      "reloaded spm dump must reproduce the exact loader blocks")
  }

  test("pipeline chunk stages catch what doc-level screens miss: " +
      "leaked eval chunk and chunk-assembled doc") {
    import spark.implicits._
    import graft.llm.TrainingDataPipeline
    def filler(tag: String, n: Int) =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val leak = (0 until 20).map(i => s"leak$i").mkString(" ")   // 20 toks
    val shared = (0 until 40).map(i => s"shared$i").mkString(" ") // 2 chunks
    // X: the leaked passage sits chunk-ALIGNED inside 160 tokens, so
    // its whole-doc shingle share (~18/158) stays under the 0.2
    // doc-level ceiling — the q268 miss
    val xDoc = s"${filler("xa", 60)} $leak ${filler("xb", 80)}"
    // W1/W2 share 40 tokens out of 100: Jaccard ~0.24 < 0.5, so
    // doc-level near-dup keeps both; W2's novel share is 0.6
    val w1 = s"$shared ${filler("wa", 60)}"
    val w2 = s"$shared ${filler("wb", 60)}"
    val docs = (Seq((10L, xDoc), (11L, w1), (12L, w2)) ++
      (20L to 29L).map(i => (i, filler(s"f$i", 100).toString)))
      .map { case (id, t) => (id, t, "en", "srcA") }
      .toDF("doc_id", "text", "lang", "source")
    val evalDocs = Seq((1000L, leak)).toDF("doc_id", "text")
    val evalNgrams = evalDocs.select(
      explode(graft.llm.Dedup.shinglesText(col("text"), 3)).as("g"))
    val base = TrainingDataPipeline.Config(minQuality = 0.0)

    // doc-level-only run: BOTH problem docs survive (the miss is real)
    val r0 = TrainingDataPipeline.run(docs, evalNgrams, Nil, base)
    val ids0 = r0.corpus.select("doc_id").as[Long].collect().toSet
    assert(ids0.contains(10L), "doc-level screens must miss the leak")
    assert(ids0.contains(12L), "doc-level near-dup must miss W2")

    // chunk-granular run: both are caught, nothing else is lost
    val cfg = base.copy(chunkC = 20, chunkNovelMin = 0.8,
      evalChunkLeakMax = 0.0)
    val r = TrainingDataPipeline.run(docs, evalNgrams, Nil, cfg,
      Some(evalDocs))
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(10L), "leaked eval chunk must drop X")
    assert(!ids.contains(12L), "chunk-assembled W2 below novel floor")
    assert(ids.contains(11L), "first occurrence W1 survives")
    assert(ids === ids0 - 10L - 12L, "no collateral drops")

    // manifest: ordered stages present and monotone non-increasing
    val m = r.manifest.collect()
      .map(r2 => r2.getString(0) -> r2.getLong(1)).toSeq
    val stages = m.map(_._1)
    assert(stages.containsSlice(Seq("2_near_dup", "2b_chunk_novel",
      "3_decontaminated", "3b_chunk_decontaminated", "4_mixture")))
    val dropStages = m.filterNot(_._1 == "5_train_packed").map(_._2)
    dropStages.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a, s"manifest must be monotone: $m")
      case _ =>
    }
    assert(m.toMap.apply("2b_chunk_novel") ===
      m.toMap.apply("2_near_dup") - 1, "exactly W2 dropped at 2b")
    assert(m.toMap.apply("3b_chunk_decontaminated") ===
      m.toMap.apply("3_decontaminated") - 1, "exactly X dropped at 3b")
  }

  test("pipeline URL-dedup stage drops re-crawled spellings of one " +
      "URL before any content pass; unparseable URLs pass through") {
    import spark.implicits._
    import graft.llm.TrainingDataPipeline
    def filler(tag: String, n: Int) =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    // docs 10/11/12 are DIFFERENT content behind three spellings of
    // ONE URL (case/www/tracking/percent) — content dedup would keep
    // all three; URL dedup must keep only the min-id crawl. Doc 13 has
    // an unparseable URL and must pass through.
    val docs = (Seq(
      (10L, filler("a", 100), "https://site1.com/p?z=1"),
      (11L, filler("b", 100), "https://WWW.site1.com/p/?z=1#frag"),
      (12L, filler("c", 100), "https://site1.com/%70?fbclid&z=1"),
      (13L, filler("d", 100), "not a url")) ++
      (20L to 25L).map(i =>
        (i, filler(s"f$i", 100), s"https://other$i.com/x")))
      .map { case (id, t, u) => (id, t, "en", "srcA", u) }
      .toDF("doc_id", "text", "lang", "source", "url")
    val evalNgrams = Seq.empty[String].toDF("g")
    val base = TrainingDataPipeline.Config(minQuality = 0.0)

    // without urlCol the three crawls all survive (distinct content)
    val r0 = TrainingDataPipeline.run(docs, evalNgrams, Nil, base)
    val ids0 = r0.corpus.select("doc_id").as[Long].collect().toSet
    assert(Set(10L, 11L, 12L, 13L).subsetOf(ids0))
    assert(!r0.manifest.as[(String, Long)].collect()
      .exists(_._1 == "0u_url_dedup"), "stage off by default")

    // with urlCol: only the first crawl of the bucket survives
    val r = TrainingDataPipeline.run(docs, evalNgrams, Nil,
      base.copy(urlCol = "url"))
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(10L), "min-id crawl survives")
    assert(!ids.contains(11L) && !ids.contains(12L),
      "re-crawled spellings drop at stage 0u")
    assert(ids.contains(13L), "unparseable URL passes through")
    assert(ids === ids0 - 11L - 12L, "no collateral drops")
    val m = r.manifest.as[(String, Long)].collect().toMap
    assert(m("0u_url_dedup") === m("0_input") - 2,
      "manifest prices exactly the two URL dups")
  }

  test("pipeline boilerplate stage rescues docs glued into near-dup " +
      "clusters by a shared header") {
    import spark.implicits._
    import graft.llm.TrainingDataPipeline
    def filler(tag: String, n: Int) =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val header = filler("hdr", 80) // 8 ten-token boilerplate lines
    // W1/W2: disjoint 10-token bodies behind the same 80-token header
    // -> whole-doc Jaccard ~0.8 >= 0.5, a phantom near-dup pair
    val w1 = s"$header ${filler("wa", 10)}"
    val w2 = s"$header ${filler("wb", 10)}"
    val docs = (Seq((10L, w1), (11L, w2)) ++
      (20L to 29L).map(i => (i, filler(s"f$i", 100).toString)))
      .map { case (id, t) => (id, t, "en", "srcA") }
      .toDF("doc_id", "text", "lang", "source")
    val evalNgrams = Seq.empty[String].toDF("g")
    val base = TrainingDataPipeline.Config(minQuality = 0.0)

    // without the strip, the header merges W1/W2 into one cluster
    val r0 = TrainingDataPipeline.run(docs, evalNgrams, Nil, base)
    val ids0 = r0.corpus.select("doc_id").as[Long].collect().toSet
    assert(!(ids0.contains(10L) && ids0.contains(11L)),
      "fixture must exercise the phantom near-dup")

    // with it, both bodies survive and carry stripped text
    val cfg = base.copy(boilerC = 10)
    val r = TrainingDataPipeline.run(docs, evalNgrams, Nil, cfg)
    val ids = r.corpus.select("doc_id").as[Long].collect().toSet
    assert(ids.contains(10L) && ids.contains(11L),
      "stripped bodies are distinct docs and must both survive")
    val text10 = r.corpus.where(col("doc_id") === 10L)
      .select("text").as[String].head()
    assert(text10 === filler("wa", 10),
      "downstream stages must see the stripped text")
    val m = r.manifest.collect()
      .map(r2 => r2.getString(0) -> r2.getLong(1)).toMap
    assert(m.contains("0b_boilerplate"))
    assert(m("0b_boilerplate") === m("0_input"),
      "strip rewrites text, nothing empties out here")
  }

  test("pipeline normalize stage: an NFD spelling twin dedups only " +
      "with cfg.normalize (un-normalized hashes never collide)") {
    import spark.implicits._
    import graft.llm.TrainingDataPipeline
    def filler(tag: String, n: Int) =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    // identical content, byte-different spellings: precomposed vs
    // NFD-decomposed accents on every token
    val clean = (0 until 100).map(i => s"caf\u00e9$i").mkString(" ")
    val nfd = (0 until 100).map(i => s"cafe\u0301$i").mkString(" ")
    assert(clean !== nfd)
    val docs = (Seq((10L, clean), (11L, nfd)) ++
      (20L to 29L).map(i => (i, filler(s"f$i", 100).toString)))
      .map { case (id, t) => (id, t, "en", "srcA") }
      .toDF("doc_id", "text", "lang", "source")
    val evalNgrams = Seq.empty[String].toDF("g")
    val base = TrainingDataPipeline.Config(minQuality = 0.0)

    // without normalization the twins never share a shingle hash:
    // both survive — the silent dedup miss the stage exists to close
    val ids0 = TrainingDataPipeline.run(docs, evalNgrams, Nil, base)
      .corpus.select("doc_id").as[Long].collect().toSet
    assert(ids0.contains(10L) && ids0.contains(11L),
      "fixture must exercise the un-normalized miss")

    // with it, exactly one twin survives and nothing else is lost
    val ids = TrainingDataPipeline.run(docs, evalNgrams, Nil,
        base.copy(normalize = true))
      .corpus.select("doc_id").as[Long].collect().toSet
    assert((ids.contains(10L) ^ ids.contains(11L)),
      "normalized twins must collapse to one survivor")
    assert(ids0 -- Set(10L, 11L) === ids -- Set(10L, 11L),
      "no collateral drops from normalization")
  }

  test("pipeline stripHtml stage: a markup-wrapped twin dedups only " +
      "with cfg.stripHtml (tags land inside the shingles otherwise)") {
    import spark.implicits._
    import graft.llm.TrainingDataPipeline
    def filler(tag: String, n: Int) =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val prose = filler("w", 100)
    // same prose, but every word wrapped in a paragraph tag plus a
    // page skeleton - no shingle survives the markup intact
    val html = "<html><head><style>p{x:1}</style></head><body><p>" +
      prose.replace(" ", "</p><p>") + "</p></body></html>"
    val docs = (Seq((10L, prose), (11L, html)) ++
      (20L to 29L).map(i => (i, filler(s"f$i", 100).toString)))
      .map { case (id, t) => (id, t, "en", "srcA") }
      .toDF("doc_id", "text", "lang", "source")
    val evalNgrams = Seq.empty[String].toDF("g")
    val base = TrainingDataPipeline.Config(minQuality = 0.0)

    val ids0 = TrainingDataPipeline.run(docs, evalNgrams, Nil, base)
      .corpus.select("doc_id").as[Long].collect().toSet
    assert(ids0.contains(10L) && ids0.contains(11L),
      "fixture must exercise the markup dedup miss")

    val ids = TrainingDataPipeline.run(docs, evalNgrams, Nil,
        base.copy(stripHtml = true))
      .corpus.select("doc_id").as[Long].collect().toSet
    assert((ids.contains(10L) ^ ids.contains(11L)),
      "stripped twins must collapse to one survivor")
    assert(ids0 -- Set(10L, 11L) === ids -- Set(10L, 11L),
      "no collateral drops from stripping")
  }

  test("split assignment is a deterministic 3-way partition of ids") {
    import spark.implicits._
    val ids = (0L until 1000L).toDF("id")
    val a = ids.select(col("id"), TF.splitAssign(col("id")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = ids.select(col("id"), TF.splitAssign(col("id")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b, "pure function of the id")
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet === Set("train", "val", "test"))
    assert(counts("train") > counts("val") + counts("test"),
      "train takes the bulk at 90/5/5")
    assert(counts.values.sum === 1000)
  }

  test("prefix-filtered all-pairs join equals the full inverted index") {
    import graft.llm.Dedup
    val docs = graft.core.Tables.documents(spark, sfDir)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        math.round(r.getAs[Double]("jac") * 1e9))
    val full = Dedup.jaccardPairsWithin(docs, "doc_id", "text",
      "source", shingleN = 3, threshold = 0.1).collect().map(key).toSet
    val pref = Dedup.prefixJaccardPairsWithin(docs, "doc_id", "text",
      "source", shingleN = 3, threshold = 0.1).collect().map(key).toSet
    assert(pref === full,
      "prefix-filter theorem: no qualifying pair may be lost, none added")
    assert(full.nonEmpty, "fixture must actually contain near-dup pairs")
  }

  test("symspell join equals brute-force deletion-neighborhood intersection") {
    // independent reference: materialize each distinct name's
    // {self + 1-token deletions} set and intersect all pairs directly —
    // a different code path from the variant equi-join
    val names = graft.core.Tables.part(spark, TestSession.sfDir)
      .select(org.apache.spark.sql.functions.col("p_name"))
      .distinct().collect().map(_.getString(0))
    def hood(s: String): Set[String] = {
      val t = s.split(" ").toVector
      Set(s) ++ t.indices.map(i => (t.take(i) ++ t.drop(i + 1)).mkString(" "))
    }
    val hoods = names.map(n => n -> hood(n)).toMap
    val expect = (for {
      a <- names; b <- names
      if a < b && (hoods(a) & hoods(b)).nonEmpty
    } yield (a, b)).toSet
    val got = graft.queries.LlmQueries.queries("q146_symspell_join")(
      spark, TestSession.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === expect,
      s"candidate pairs diverged: extra=${got -- expect} missing=${expect -- got}")
    assert(expect.nonEmpty, "fixture vocabulary must contain near names")
  }
}
