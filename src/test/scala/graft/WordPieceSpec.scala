package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The WordPiece family (`graft.llm.WordPiece`): the greedy
  * longest-match apply against a reference Scala loop (hand vectors +
  * UNK + seeded fuzz, CODEGEN_ONLY), the published-score trainer
  * against a brute-force replay, and the piece-vocabulary construction.
  * The q323/q324 oracle gates prove Spark == DuckDB on the same loops.
  */
class WordPieceSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  import graft.llm.WordPiece

  private def refGreedy(w: String, voc: Set[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    var pos = 0
    while (pos < w.length) {
      val found = (math.min(w.length - pos, 32) to 1 by -1).iterator
        .map { l =>
          val core = w.substring(pos, pos + l)
          (if (pos == 0) core else "##" + core, l)
        }
        .find { case (cand, _) => voc.contains(cand) }
      found match {
        case Some((cand, l)) => out += cand; pos += l
        case None => return Seq("[UNK]")
      }
    }
    out.result()
  }

  private def sparkGreedy(words: Seq[String],
                          voc: Set[String]): Seq[Seq[String]] =
    words.toDF("w")
      .select(WordPiece.applyGreedy(col("w"), voc).as("p"))
      .as[Seq[String]].collect().toSeq

  private def words4(w: String, voc: Set[String],
                     maxChars: Int): Seq[String] =
    Seq(w).toDF("w")
      .select(WordPiece.applyGreedy(col("w"), voc, maxChars).as("p"))
      .as[Seq[String]].collect().head

  test("greedy apply: hand vectors (longest match first, ## " +
      "continuations, dead end -> [UNK]) under CODEGEN_ONLY + fuzz") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      // the published example: "unaffable" with {un, ##aff, ##able}
      val v1 = Set("un", "##aff", "##able", "u", "##n")
      assert(sparkGreedy(Seq("unaffable"), v1).head
        === Seq("un", "##aff", "##able"))
      // longest match first: "una" exists -> it wins over "un"
      val v2 = v1 + "una" + "##ffable"
      assert(sparkGreedy(Seq("unaffable"), v2).head
        === Seq("una", "##ffable"))
      // dead end mid-word -> the WHOLE word is [UNK]
      assert(sparkGreedy(Seq("unaffordable"), v1).head === Seq("[UNK]"))
      // dead end at the first position
      assert(sparkGreedy(Seq("xyz"), v1).head === Seq("[UNK]"))
      // HF max_input_chars_per_word (r15 ADVICE): a word longer than
      // 100 codepoints is [UNK] outright even when fully coverable
      val vCover = Set("u", "##u")
      assert(sparkGreedy(Seq("u" * 100), vCover).head
        === Seq("u") ++ Seq.fill(99)("##u"))
      assert(sparkGreedy(Seq("u" * 101), vCover).head === Seq("[UNK]"))
      // ... and the cap is a parameter
      assert(words4("uuuu", vCover, maxChars = 3) === Seq("[UNK]"))
      assert(words4("uuu", vCover, maxChars = 3)
        === Seq("u", "##u", "##u"))
      // word-initial probes are bounded by the longest RAW piece (r15
      // ADVICE): a vocab piece literally starting with "##" and longer
      // than every continuation core must match at position 0 — HF's
      // raw-substring lookup behavior
      val vRaw = Set("##abcde", "#", "##", "a", "b", "c", "d", "e",
        "##a", "##b", "##c", "##d", "##e", "###")
      assert(sparkGreedy(Seq("##abcde"), vRaw).head === Seq("##abcde"))
      // seeded fuzz vs the reference
      val rnd = new scala.util.Random(815)
      val alpha = "abc"
      val voc = (for {
        l <- 1 to 3
        _ <- 1 to 12
      } yield {
        val core = (1 to l).map(_ => alpha(rnd.nextInt(3))).mkString
        if (rnd.nextBoolean()) core else "##" + core
      }).toSet
      val words = (1 to 300).map(_ =>
        (1 to (1 + rnd.nextInt(10)))
          .map(_ => alpha(rnd.nextInt(3))).mkString).distinct
      val got = sparkGreedy(words, voc)
      words.zip(got).foreach { case (w, g) =>
        assert(g === refGreedy(w, voc), s"fuzz '$w' vs $voc")
        if (g != Seq("[UNK]"))
          assert(g.map(_.stripPrefix("##")).mkString === w)
      }
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("trainer replays the published score argmax: brute-force " +
      "reference on a literal census, ties break (x, y)") {
    // census engineered so the score winner differs from the raw-count
    // winner: (a,b) is frequent but a and b are everywhere; (q,u)
    // is rarer but q occurs ONLY before u
    val docs = (Seq.fill(8)("ab ab aqu") ++ Seq.fill(4)("ba quq"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = WordPiece.train(docs, "text", rounds = 3)
      .orderBy(col("merge_round"))
      .as[(Long, String, String, Long, Double)].collect().toSeq
    // brute-force replay
    val census = scala.collection.mutable.Map.empty[String, Long]
    docs.select(col("text")).as[String].collect().foreach { t =>
      t.split("\\s+").filter(_.nonEmpty).foreach { w =>
        census(w) = census.getOrElse(w, 0L) + 1L
      }
    }
    var vocab: Map[String, Vector[String]] =
      census.keys.map(w => w -> w.map(_.toString).toVector).toMap
    val want = (1 to 3).map { r =>
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
      val units = scala.collection.mutable.Map.empty[String, Long]
      census.foreach { case (w, wt) =>
        val s = vocab(w)
        s.sliding(2).filter(_.size == 2).foreach { p =>
          pairs((p(0), p(1))) = pairs.getOrElse((p(0), p(1)), 0L) + wt
        }
        s.foreach(sym => units(sym) = units.getOrElse(sym, 0L) + wt)
      }
      val scored = pairs.toSeq.map { case ((x, y), n) =>
        (x, y, n, n.toDouble / (units(x) * units(y)).toDouble)
      }
      val (x, y, n, sc) = scored
        .minBy { case (x2, y2, _, s2) => (-s2, x2, y2) }
      vocab = vocab.map { case (w, s) =>
        val out = Vector.newBuilder[String]
        var k = 0
        while (k < s.length) {
          if (k < s.length - 1 && s(k) == x && s(k + 1) == y) {
            out += (x + y); k += 2
          } else { out += s(k); k += 1 }
        }
        w -> out.result()
      }
      (r.toLong, x, y, n, sc)
    }
    assert(got === want)
    // the vocabulary of the trained state ##-prefixes continuations
    val (_, pieces) = WordPiece.trainWithVocab(docs, "text", rounds = 3)
    val finalSyms = vocab.values.toSeq
    val wantPieces = finalSyms.flatMap(s =>
      s.zipWithIndex.map { case (sym, i) =>
        if (i == 0) sym else "##" + sym
      }).toSet
    assert(pieces === wantPieces)
    // on the training corpus itself the greedy apply never needs UNK
    // here, and pieces reassemble each word
    val words = census.keys.toSeq
    sparkGreedy(words, pieces).zip(words).foreach { case (p, w) =>
      assert(p.map(_.stripPrefix("##")).mkString === w)
    }
  }

  test("vocab.txt artifact: line order = id order round-trips; the " +
      "reloaded set drives an identical greedy apply; malformed " +
      "input rejected loudly") {
    import graft.llm.WordPiece
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir)
      .limit(60)
    val (_, pieces) = WordPiece.trainWithVocab(docs, "text", rounds = 6)
    val ordered = pieces.toSeq.sorted // deterministic id order
    val dir = java.nio.file.Files.createTempDirectory("graft-wp")
    val f = dir.resolve("vocab.txt").toString
    WordPiece.vocabToFile(ordered, f)
    val reloaded = WordPiece.vocabFromFile(spark, f)
    assert(reloaded === ordered, "vocab.txt round trip preserves order")
    // reloaded set drives the exact same tokenization
    val words = docs
      .select(explode(graft.llm.TextFunctions.tokens(col("text"))))
      .distinct().as[String].collect().toSeq.take(50)
    assert(sparkGreedy(words, reloaded.toSet)
      === sparkGreedy(words, pieces))
    // loud failures: blank line (id shift), duplicate, glob
    val blank = dir.resolve("blank.txt")
    java.nio.file.Files.write(blank, "a\n\nb\n".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException] {
      WordPiece.vocabFromFile(spark, blank.toString)
    }.getMessage.contains("blank"))
    assert(intercept[IllegalArgumentException] {
      WordPiece.vocabFromFile(spark, dir.resolve("*.txt").toString)
    }.getMessage.contains("exactly one file"))
    assert(intercept[IllegalArgumentException] {
      WordPiece.vocabToFile(Seq("a", "b\nc"), f)
    }.getMessage.contains("line-break-free"))
  }
}
