package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The external-merge BPE apply path (`Bpe.applyMerges` /
  * `Bpe.encodeIdsWith`): the min-rank loop against a brute-force Scala
  * reference, its equivalence to the in-order foldLeft replay for
  * TRAINED rule lists (the property that makes `encodeIdsWith` a
  * drop-in for `encodeIds`), and the id-map expression. The q302
  * oracle gate proves Spark == DuckDB on the same loop; this suite
  * proves the loop itself.
  */
class BpeSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** Brute-force reference: repeatedly merge the lowest-rank adjacent
    * pair (greedy left-to-right within the pass) until none is ranked.
    */
  private def refApply(w: String, rules: Seq[(String, String)])
      : Seq[String] = {
    val rank = rules.zipWithIndex.groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).min }
    var s = w.map(_.toString).toVector
    var done = false
    while (!done && s.length >= 2) {
      val present = s.sliding(2).map(p => (p(0), p(1)))
        .filter(rank.contains).toSeq
      if (present.isEmpty) done = true
      else {
        val (x, y) = present.minBy(rank)
        val out = Vector.newBuilder[String]
        var k = 0
        while (k < s.length) {
          if (k < s.length - 1 && s(k) == x && s(k + 1) == y) {
            out += (x + y); k += 2
          } else { out += s(k); k += 1 }
        }
        s = out.result()
      }
    }
    s
  }

  private def sparkApply(words: Seq[String],
                         rules: Seq[(String, String)]): Seq[Seq[String]] =
    words.toDF("w")
      .select(graft.llm.Bpe.applyMerges(col("w"), rules).as("s"))
      .as[Seq[String]].collect().toSeq

  test("applyMerges matches the brute-force min-rank reference on the " +
      "q302 1352-rule closed-form vocabulary, under CODEGEN_ONLY") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val rules = graft.queries.CurationQueries.externalMerges
      assert(rules.size === 1352, "the fixture list is >= 1k rules")
      val words = Seq("hello", "aaaa", "abc", "the", "a", "zz9zz", "x1z",
        "tokenization", "mississippi", "aaaaaaa", "zzz", "q-q", "42")
      val got = sparkApply(words, rules)
      words.zip(got).foreach { case (w, g) =>
        assert(g === refApply(w, rules), s"applyMerges('$w')")
        assert(g.mkString === w, s"char mass preserved for '$w'")
      }
      // hand-verified anchors (same values the DuckDB oracle prototype
      // produced): greedy LTR for self-adjacent pairs, phase-2 chaining
      assert(got(1) === Seq("aa", "aa"))
      assert(got(0) === Seq("h", "el", "lo"))
      assert(got(3) === Seq("t", "he"))
      // the id expression codegens too (the stray space symbol maps
      // to -1 — callers feed pre-tokenized words)
      val ids = Seq("ab ab").toDF("w")
        .select(graft.llm.Bpe.symbolIds(
          graft.llm.Bpe.applyMerges(col("w"), Seq(("a", "b"))),
          Map("ab" -> 7L)).as("r"))
        .as[Seq[Long]].head()
      assert(ids === Seq(7L, -1L, 7L))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("applyMerges on fixture words equals the in-order foldLeft " +
      "replay for a TRAINED rule list (drop-in contract)") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val rules = graft.llm.Bpe.train(docs, "text", 8)
      .orderBy(col("merge_round"))
      .select(col("x"), col("y")).as[(String, String)].collect().toSeq
    assert(rules.nonEmpty)
    val words = docs.select(explode(
        graft.llm.TextFunctions.tokens(col("text"))).as("w"))
      .distinct()
    val fold = rules.foldLeft(words.select(col("w"),
        filter(split(col("w"), ""), x => x =!= lit("")).as("s"))) {
      case (d, (x, y)) =>
        d.select(col("w"), graft.llm.Bpe.mergePair(col("s"), x, y).as("s"))
    }
    // compare via collects: joining the 8-deep fold plan with another
    // plan makes the (4^8-node) expression tree's plan string blow the
    // heap — the fold side alone is exactly what encodeStats runs
    val foldMap = fold.select(col("w"), array_join(col("s"), " "))
      .as[(String, String)].collect().toMap
    val mr = words.select(col("w"),
        array_join(graft.llm.Bpe.applyMerges(col("w"), rules), " "))
      .as[(String, String)].collect()
    assert(mr.nonEmpty)
    mr.foreach { case (w, s2) =>
      assert(foldMap(w) === s2,
        s"min-rank apply must equal sequential replay for '$w'")
    }
  }

  test("encodeIdsWith(trained rules) is a drop-in for encodeIds on " +
      "the fixture (same ids, counts, blocks)") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val rules = graft.llm.Bpe.train(docs, "text", 8)
      .orderBy(col("merge_round"))
      .select(col("x"), col("y")).as[(String, String)].collect().toSeq
    def dump(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id"), col("n_words"), col("n_symbols"),
          col("n_blocks"),
          array_join(transform(col("ids"), i => i.cast("string")), ",")
            .as("ids"))
        .as[(Long, Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    val a = dump(graft.llm.Bpe.encodeIds(docs, "doc_id", "text",
      rounds = 8, blockTokens = 64))
    val b = dump(graft.llm.Bpe.encodeIdsWith(docs, "doc_id", "text",
      rules, blockTokens = 64))
    assert(a.nonEmpty)
    assert(a === b)
  }

  test("encodeIdsWith carries a 1352-rule vocabulary end-to-end " +
      "(ids positive, blocks consistent, char mass preserved)") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val rules = graft.queries.CurationQueries.externalMerges
    val out = graft.llm.Bpe.encodeIdsWith(docs, "doc_id", "text", rules,
        blockTokens = 32)
      .select(col("doc_id"), col("n_words"), col("n_symbols"),
        col("n_blocks"),
        array_min(col("ids")).cast("long").as("minId"),
        size(col("ids")).cast("long").as("nIds"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (id, nw, ns, nb, minId, nIds) =>
      assert(minId >= 1L, s"doc $id: unknown-symbol id leaked")
      assert(ns === nIds)
      assert(nb === (ns + 31) / 32, s"doc $id: block count")
      assert(ns <= nw * 100 && ns >= nw, s"doc $id: symbol count sane")
    }
  }

  test("applyMerges matches the reference on 300 random words under " +
      "random chained rule lists (seeded property)") {
    val rnd = new scala.util.Random(1337)
    // a 3-letter alphabet makes pairs collide constantly, and phase-2
    // rules chain off phase-1 outputs like a real trained list
    val alpha = "abc"
    val p1 = for (x <- alpha; y <- alpha) yield (x.toString, y.toString)
    val p2 = (0 until 30).map { _ =>
      val (x, y) = p1(rnd.nextInt(p1.length))
      (x + y, alpha(rnd.nextInt(3)).toString)
    }
    val rules = rnd.shuffle(p1.toSeq ++ p2)
    val words = (1 to 300).map { _ =>
      (1 to (1 + rnd.nextInt(14)))
        .map(_ => alpha(rnd.nextInt(3))).mkString
    }.distinct
    val got = sparkApply(words, rules)
    words.zip(got).foreach { case (w, g) =>
      assert(g === refApply(w, rules), s"random word '$w'")
      assert(g.mkString === w, s"char mass preserved for '$w'")
    }
  }

  test("rulesFromFile parses the merges.txt format (headers/blanks " +
      "skipped, rank order kept) and rejects malformed lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft-merges")
    val f = dir.resolve("merges.txt")
    java.nio.file.Files.write(f,
      "#version: 0.2\n\na b\nab c\n  b c  \n".getBytes("UTF-8"))
    val rules = graft.llm.Bpe.rulesFromFile(spark, f.toString)
    assert(rules === Seq(("a", "b"), ("ab", "c"), ("b", "c")))
    // loaded rules drive the apply end-to-end
    assert(sparkApply(Seq("abc"), rules) === Seq(Seq("abc")))
    val bad = dir.resolve("bad.txt")
    java.nio.file.Files.write(bad, "a b c\n".getBytes("UTF-8"))
    val ex = intercept[Exception] {
      graft.llm.Bpe.rulesFromFile(spark, bad.toString)
    }
    assert(ex.getMessage.contains("malformed"))
    // a directory (or glob) would interleave files and scramble ranks —
    // the loader requires exactly one regular file
    val exDir = intercept[IllegalArgumentException] {
      graft.llm.Bpe.rulesFromFile(spark, dir.toString)
    }
    assert(exDir.getMessage.contains("exactly one file"))
    val exGlob = intercept[IllegalArgumentException] {
      graft.llm.Bpe.rulesFromFile(spark, dir.resolve("*.txt").toString)
    }
    assert(exGlob.getMessage.contains("exactly one file"))
  }

  test("vocabFromFile loads a vocab.json id space, external ids drive " +
      "encodeIdsWith, and ids invert back to the exact original BYTES " +
      "(decode round trip from ids)") {
    import graft.llm.{Bpe, ByteLevel, PreTokenize}
    val g = ByteLevel.byteToChar(0x20)
    val rules = Seq((g, "t"), (g + "t", "h"), (g + "th", "e"), ("i", "t"))
    // the GPT-2 vocab.json shape: byte symbol b -> id b, merge i -> 256+i
    val vocab: Map[String, Long] =
      (0 until 256).map(b => ByteLevel.byteToChar(b) -> b.toLong).toMap ++
        rules.zipWithIndex.map { case ((x, y), i) => (x + y) -> (256L + i) }
    // write as real JSON (jackson escapes the quote/backslash symbols)
    val jmap = new java.util.LinkedHashMap[String, Long]()
    vocab.toSeq.sortBy(_._2).foreach { case (k, v) => jmap.put(k, v) }
    val dir = java.nio.file.Files.createTempDirectory("graft-vocab")
    val f = dir.resolve("vocab.json")
    java.nio.file.Files.write(f,
      new com.fasterxml.jackson.databind.ObjectMapper()
        .writeValueAsString(jmap).getBytes("UTF-8"))
    val loaded = Bpe.vocabFromFile(spark, f.toString)
    assert(loaded === vocab)
    // rejects: not an object; duplicate ids
    val badArr = dir.resolve("arr.json")
    java.nio.file.Files.write(badArr, "[1, 2]".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException] {
      Bpe.vocabFromFile(spark, badArr.toString)
    }.getMessage.contains("JSON object"))
    val badDup = dir.resolve("dup.json")
    java.nio.file.Files.write(badDup,
      """{"a": 1, "b": 1}""".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException] {
      Bpe.vocabFromFile(spark, badDup.toString)
    }.getMessage.contains("distinct"))
    // a glob/directory would concatenate JSON docs and readTree would
    // silently take the first — single-file contract
    assert(intercept[IllegalArgumentException] {
      Bpe.vocabFromFile(spark, dir.resolve("*.json").toString)
    }.getMessage.contains("exactly one file"))
    // external ids end-to-end + inversion back to bytes
    val text = "it's the Thing"
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val ids = Bpe.encodeIdsWith(docs, "doc_id", "text", rules,
        blockTokens = 8, byteLevel = true, preTokenize = true,
        vocab = Some(loaded))
      .select(col("ids")).as[Seq[Long]].head()
    val idToSym = loaded.map(_.swap)
    assert(ids.forall(idToSym.contains), "vocab is closed over the rules")
    assert(ids.exists(_ >= 256L), "merges actually fired")
    assert(ByteLevel.decode(ids.map(idToSym).mkString) === text,
      "ids -> symbols -> bytes reassembles the exact original text")
    // unknown-symbol policy: a vocab NOT closed over the rules maps
    // the merged symbol to the loud -1 sentinel
    val bytesOnly = (0 until 256)
      .map(b => ByteLevel.byteToChar(b) -> b.toLong).toMap
    val ids2 = Bpe.encodeIdsWith(docs, "doc_id", "text", rules,
        blockTokens = 8, byteLevel = true, preTokenize = true,
        vocab = Some(bytesOnly))
      .select(col("ids")).as[Seq[Long]].head()
    assert(ids2.contains(-1L), "unmapped post-merge symbols -> -1")
  }

  test("trained tokenizer ships as standard artifacts: merges.txt and " +
      "vocab.json round-trip through the writers and drive an " +
      "identical apply") {
    import graft.llm.{Bpe, ByteLevel}
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir)
      .limit(60)
    // train on the production census (segments, byte-level alphabet)
    val trained = Bpe.trainFromVocab(
        Bpe.segmentVocabBytes(docs, "text"), rounds = 6)
      .orderBy(col("merge_round")).select(col("x"), col("y"))
      .as[(String, String)].collect().toSeq
    assert(trained.nonEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft-artifacts")
    val mf = dir.resolve("merges.txt").toString
    Bpe.rulesToFile(trained, mf)
    val reloaded = Bpe.rulesFromFile(spark, mf)
    assert(reloaded === trained, "merges.txt round trip")
    // vocab.json in the GPT-2 shape over the trained rules
    val vocab: Map[String, Long] =
      (0 until 256).map(b => ByteLevel.byteToChar(b) -> b.toLong).toMap ++
        trained.zipWithIndex.map { case ((x, y), i) => (x + y) -> (256L + i) }
    val vf = dir.resolve("vocab.json").toString
    Bpe.vocabToFile(vocab, vf)
    assert(Bpe.vocabFromFile(spark, vf) === vocab, "vocab.json round trip")
    // the reloaded artifacts drive the encode identically to the
    // in-memory rules (the loader-compat contract, end to end)
    def encode(rules: Seq[(String, String)], v: Map[String, Long]) =
      Bpe.encodeIdsWith(docs, "doc_id", "text", rules, blockTokens = 16,
          byteLevel = true, preTokenize = true, vocab = Some(v))
        .orderBy(col("doc_id"))
        .select(col("doc_id"), col("ids"))
        .as[(Long, Seq[Long])].collect().toSeq
    assert(encode(reloaded, Bpe.vocabFromFile(spark, vf))
      === encode(trained, vocab))
    // writers reject malformed input loudly
    assert(intercept[IllegalArgumentException] {
      Bpe.rulesToFile(Seq(("a b", "c")), dir.resolve("x.txt").toString)
    }.getMessage.contains("whitespace-free"))
    assert(intercept[IllegalArgumentException] {
      Bpe.vocabToFile(Map("a" -> 1L, "b" -> 1L),
        dir.resolve("y.json").toString)
    }.getMessage.contains("distinct"))
  }

  test("byte-level apply: GPT-2 bytes_to_unicode bijection round-trips " +
      "all 256 bytes, merges fire on the remapped symbols, and " +
      "decode(concat(symbols)) == word for unicode input") {
    import graft.llm.ByteLevel
    // bijection: 256 distinct single-codepoint symbols, decode inverts
    val syms = ByteLevel.byteToChar
    assert(syms.length === 256)
    assert(syms.toSet.size === 256, "the remap is a bijection")
    syms.foreach(s0 => assert(s0.codePointCount(0, s0.length) === 1))
    // decode is a TEXT-level inverse: it maps symbols back to their
    // bytes and UTF-8-decodes the result, so feed it whole valid
    // sequences (a lone continuation byte is not valid UTF-8)
    assert(ByteLevel.decode(syms(0xC3) + syms(0xA9)) === "é")
    assert(ByteLevel.decode("abc") === "abc")
    assert(syms(97) === "a" && syms(126) === "~",
      "printable bytes map to themselves")
    assert(syms(32) != " " && syms(10) != "\n",
      "space/control bytes remap out of the whitespace range")

    // a byte-level rule list: merge the remapped UTF-8 bytes of 'é'
    // (0xC3 0xA9), then the result with 's' — rules a codepoint-level
    // apply could NEVER match
    val c3 = ByteLevel.byteToChar(0xC3)
    val a9 = ByteLevel.byteToChar(0xA9)
    val rules = Seq((c3, a9), (c3 + a9, "s"))
    val words = Seq("és", "é", "state", "cafés")
    val got = words.toDF("w")
      .select(col("w"),
        graft.llm.Bpe.applyMergesBytes(col("w"), rules).as("s"))
      .as[(String, Seq[String])].collect().toMap
    assert(got("és") === Seq(c3 + a9 + "s"), "chained byte-level merge")
    assert(got("é") === Seq(c3 + a9))
    assert(got("state") === "state".map(_.toString),
      "no rule touches pure-ASCII bytes here")
    // byte mass preserved: decoding the concatenated symbols restores
    // the exact input text
    got.foreach { case (w, s) =>
      assert(ByteLevel.decode(s.mkString) === w, s"round-trip of '$w'")
    }

    // the codepoint-level apply canNOT fire these byte rules
    val cpGot = sparkApply(Seq("és"), rules)
    assert(cpGot.head === Seq("é", "s"),
      "codepoint apply must not match byte-level rules")

    // encodeIdsWith(byteLevel = true) end-to-end: ids positive, and
    // symbol mass = byte mass, not codepoint mass
    val docs = Seq((1L, "café café")).toDF("doc_id", "text")
    val out = graft.llm.Bpe.encodeIdsWith(docs, "doc_id", "text", rules,
        blockTokens = 8, byteLevel = true)
      .select(col("n_words"), col("n_symbols"),
        array_min(col("ids")).cast("long"))
      .as[(Long, Long, Long)].head()
    // 'café' = 5 UTF-8 bytes; the (0xC3,0xA9) merge shrinks it to 4
    // symbols per word
    assert(out === ((2L, 8L, 1L)))
  }

  test("packTokenBlocks: cross-doc GPT-style layout — every non-tail " +
      "block is exactly full, block ids are dense per shard, id mass " +
      "is conserved, and blocks genuinely cross documents") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val rules = graft.queries.CurationQueries.externalMerges
    val enc = graft.llm.Bpe.encodeIdsWith(docs, "doc_id", "text", rules)
      .transform(graft.core.Caching.persist)
    val blocks = graft.llm.Packing.packTokenBlocks(enc, "doc_id", "ids",
        blockTokens = 64, shards = 4)
      .select(col("shard"), col("block_id"), col("n_ids"), col("n_docs"))
      .as[(Long, Long, Long, Long)].collect()
    val totalIds = enc.agg(sum(size(col("ids"))).cast("long"))
      .as[Long].head()
    assert(blocks.map(_._3).sum === totalIds, "id mass conserved")
    blocks.groupBy(_._1).foreach { case (shard, bs) =>
      val sorted = bs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (0L until bs.length).toSeq,
        s"shard $shard: block ids dense from 0")
      sorted.init.foreach { b =>
        assert(b._3 === 64L, s"shard $shard block ${b._2}: non-tail " +
          "blocks are exactly full (boundaries cross docs, no padding)")
      }
    }
    // docs average several blocks, so only boundary blocks span — but
    // a substantial share must (measured ~39% on the fixture)
    assert(blocks.count(_._4 >= 2) * 5 >= blocks.length,
      "a substantial share of blocks spans multiple documents")
  }

  test("packTokenBlocksLoader: EOS appears exactly once per doc, " +
      "boundary offsets mark exactly the doc-start positions " +
      "(hand-computed fixture)") {
    // one shard, blockTokens = 4; ids chosen so boundaries land
    // mid-block and a block is pure continuation:
    //   doc 0: [10, 11]       -> +EOS(99): [10, 11, 99]
    //   doc 4: [20]           -> +EOS:     [20, 99]
    //   doc 8: [30,31,32,33,34,35] -> +EOS: [30..35, 99]
    // stream (shard 0): 10 11 99 | 20 99 30 31 | 32 33 34 35 | 99
    // blocks: b0 ids [10,11,99,20]?? — doc order by doc_id: 0, 4, 8.
    // concat: [10,11,99, 20,99, 30,31,32,33,34,35,99]
    //   b0 = [10,11,99,20]  boundaries: 0 (doc0 start), 3 (doc4 start)
    //   b1 = [99,30,31,32]  boundaries: 1 (doc8 start)
    //   b2 = [33,34,35,99]  boundaries: (none — pure continuation)
    val enc = Seq(
      (0L, Seq(10L, 11L)),
      (4L, Seq(20L)),
      (8L, Seq(30L, 31L, 32L, 33L, 34L, 35L))).toDF("doc_id", "ids")
    val got = graft.llm.Packing.packTokenBlocksLoader(enc, "doc_id",
        "ids", blockTokens = 4, shards = 1, eosId = 99L)
      .orderBy(col("block_id"))
      .select(col("block_id"), col("n_ids"), col("n_docs"),
        col("first_doc"), col("boundaries"))
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got === Seq(
      (0L, 4L, 2L, 0L, "0,3"),
      (1L, 4L, 2L, 4L, "1"),
      (2L, 4L, 1L, 8L, "")))
    // EOS count = doc count: id mass = Σ ids + one EOS per doc
    val mass = got.map(_._2).sum
    assert(mass === (2 + 1 + 6) + 3L)
  }

  test("packing rejects duplicate doc_ids loudly (they would silently " +
      "interleave block contents under the RANGE-frame cumsum)") {
    val dup = Seq((0L, Seq(10L, 11L)), (0L, Seq(20L)), (4L, Seq(30L)))
      .toDF("doc_id", "ids")
    val ex1 = intercept[Exception] {
      graft.llm.Packing.packTokenBlocks(dup, "doc_id", "ids",
        blockTokens = 4, shards = 1).collect()
    }
    assert(ex1.getMessage.contains("duplicate doc_id"))
    val ex2 = intercept[Exception] {
      graft.llm.Packing.packTokenBlocksLoader(dup, "doc_id", "ids",
        blockTokens = 4, shards = 1, eosId = 99L).collect()
    }
    assert(ex2.getMessage.contains("duplicate doc_id"))
    // distinct ids in the SAME shard still pack fine (the guard is
    // duplicate ids, not shard collisions)
    val ok = graft.llm.Packing.packTokenBlocks(
      Seq((0L, Seq(10L, 11L)), (4L, Seq(20L))).toDF("doc_id", "ids"),
      "doc_id", "ids", blockTokens = 4, shards = 1)
    assert(ok.count() === 1L)
  }

  test("packTokenBlocks: an empty-id doc whose offset lands exactly on " +
      "a block boundary contributes nothing (no spurious empty-slice " +
      "rows in n_docs/first_doc — the descending-sequence edge)") {
    // doc 0 fills block 0 exactly; doc 1 is EMPTY with off = 4 = 1*B
    // (the boundary case where sequence(off div B, (off+ns-1) div B)
    // would be descending); doc 2 fills block 1
    val enc = Seq(
      (0L, Seq(10L, 11L, 12L, 13L)),
      (1L, Seq.empty[Long]),
      (2L, Seq(20L, 21L, 22L, 23L))).toDF("doc_id", "ids")
    val got = graft.llm.Packing.packTokenBlocks(enc, "doc_id", "ids",
        blockTokens = 4, shards = 1)
      .orderBy(col("block_id"))
      .select(col("block_id"), col("n_ids"), col("n_docs"),
        col("first_doc"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((0L, 4L, 1L, 0L), (1L, 4L, 1L, 2L)))
  }

  test("artifact writer/reader contracts: rulesToFile rejects any " +
      "whitespace the reader would trim or mis-split; vocabFromFile " +
      "rejects duplicate JSON keys at parse time") {
    import graft.llm.Bpe
    val dir = java.nio.file.Files.createTempDirectory("graft-guards")
    // tab and U+00A0 both survive the old ' '/'\n'/'\r' guard but
    // reload trimmed/mis-parsed — the writer must reject them
    for (bad <- Seq("a\tb", "a\u00A0", "a\u2007b", "\u001Fx")) {
      assert(intercept[IllegalArgumentException] {
        Bpe.rulesToFile(Seq((bad, "c")), dir.resolve("g.txt").toString)
      }.getMessage.contains("whitespace-free"), s"must reject '$bad'")
    }
    // duplicate KEYS (ids differ, so the distinct-ids check passes):
    // Jackson's readTree keeps the last silently — strict mode raises
    val dupKey = dir.resolve("dupkey.json")
    java.nio.file.Files.write(dupKey,
      """{"tok": 1, "tok": 2}""".getBytes("UTF-8"))
    val ex = intercept[Exception] {
      Bpe.vocabFromFile(spark, dupKey.toString)
    }
    assert(ex.getMessage.toLowerCase.contains("duplicate"))
  }

  test("symbolIds maps through the hash map; unknown symbols -> -1") {
    val got = Seq(Seq("aa", "b", "zz"), Seq.empty[String])
      .toDF("s")
      .select(graft.llm.Bpe.symbolIds(col("s"),
        Map("aa" -> 5L, "b" -> 2L)).as("r"))
      .as[Seq[Long]].collect().toSeq
    assert(got === Seq(Seq(5L, 2L, -1L), Seq.empty[Long]))
  }
}
