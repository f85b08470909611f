package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The unigram-LM (SentencePiece-style) trainer (`graft.llm.Unigram`):
  * the native Viterbi expression against a reference Scala DP loop
  * (hand vectors + seeded fuzz, CODEGEN_ONLY), the coverage guarantee,
  * and the full hard-EM train loop replayed reference-side on a tiny
  * fixture. The q321 oracle gate proves Spark == DuckDB on the same
  * EM unroll; this suite proves the loop itself.
  */
class UnigramSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._
  import graft.llm.Unigram

  /** Reference Viterbi: maximize summed scores, ties to the smallest
    * split point (codepoint positions — inputs here are BMP).
    */
  private def refViterbi(w: String, wgt: Map[String, Long],
                         maxLen: Int): Seq[String] = {
    val n = w.length
    val best = Array.fill[Option[Long]](n + 1)(None)
    val back = new Array[Int](n + 1)
    best(0) = Some(0L)
    (1 to n).foreach { i =>
      (math.max(0, i - maxLen) until i).foreach { j =>
        (best(j), wgt.get(w.substring(j, i))) match {
          case (Some(b), Some(s)) =>
            val sc = b + s
            if (best(i).forall(sc > _)) { best(i) = Some(sc); back(i) = j }
          case _ =>
        }
      }
      assert(best(i).isDefined, s"coverage broken at $i of '$w'")
    }
    var pos = n
    val out = List.newBuilder[String]
    var acc = List.empty[String]
    while (pos > 0) { acc = w.substring(back(pos), pos) :: acc; pos = back(pos) }
    out ++= acc
    out.result()
  }

  private def sparkSeg(words: Seq[String], wgt: Map[String, Long],
                       maxLen: Int): Seq[Seq[String]] =
    words.toDF("w")
      .select(Unigram.segmentWith(col("w"), wgt, maxLen).as("s"))
      .as[Seq[String]].collect().toSeq

  test("Viterbi hand vectors: longest-piece wins on ties, scores " +
      "decide otherwise, segmentation always partitions") {
    // vocab: singles score -10, "ab" -5, "abc" -4, "bc" -6
    val wgt = Map("a" -> -10L, "b" -> -10L, "c" -> -10L,
      "ab" -> -5L, "abc" -> -4L, "bc" -> -6L)
    val got = sparkSeg(Seq("abc", "abab", "cab", "c", "abcbc"), wgt, 4)
    // "abc": [abc](-4) beats [ab,c](-15) and [a,bc](-16)
    assert(got(0) === Seq("abc"))
    assert(got(1) === Seq("ab", "ab"))
    assert(got(2) === Seq("c", "ab"))
    assert(got(3) === Seq("c"))
    // "abcbc": [abc,bc](-10) beats [ab,c,bc](-21), [ab,cb?,..] n/a
    assert(got(4) === Seq("abc", "bc"))
    got.zip(Seq("abc", "abab", "cab", "c", "abcbc")).foreach {
      case (segs, w) => assert(segs.mkString === w, s"partition of $w")
    }
    // tie rule: with equal-scoring alternatives, the LONGEST last
    // piece wins (smallest split point): vocab where [a,ab] and
    // [ab,b]... make "aab" with a=-5, ab=-10, aa=-10, b=-5:
    //   [aa,b] = -15, [a,ab] = -15 -- tie; smallest j at i=3 means
    //   the last piece is "ab" (j=1), so [a,ab] wins
    val tie = Map("a" -> -5L, "b" -> -5L, "aa" -> -10L, "ab" -> -10L)
    assert(sparkSeg(Seq("aab"), tie, 4).head === Seq("a", "ab"))
  }

  test("expression == reference DP on seeded fuzz under CODEGEN_ONLY; " +
      "coverage violation throws") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val rnd = new scala.util.Random(20260816)
      val alpha = "abcé "
      // random vocab: all singles + random multi-pieces, random scores
      val singles = alpha.map(_.toString -> (-(rnd.nextInt(20) + 1)).toLong)
      val multis = (1 to 40).map { _ =>
        val len = 2 + rnd.nextInt(3)
        (1 to len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString ->
          (-(rnd.nextInt(30) + 1)).toLong
      }
      val wgt = (singles ++ multis).toMap
      val words = (1 to 200).map { _ =>
        (1 to (1 + rnd.nextInt(14)))
          .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }.distinct
      val got = sparkSeg(words, wgt, 4)
      words.zip(got).foreach { case (w, g) =>
        assert(g === refViterbi(w, wgt, 4), s"fuzz '$w'")
        assert(g.mkString === w)
      }
      // coverage violation: a char with no vocab entry throws loudly
      val ex = intercept[Exception] {
        sparkSeg(Seq("axb"), Map("a" -> -1L, "b" -> -1L), 4)
      }
      assert(ex.getMessage.contains("coverage") ||
        Option(ex.getCause).exists(_.getMessage.contains("coverage")))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("train == a reference Scala replay of the hard-EM loop on the " +
      "fixture (seed census, Viterbi E-step, coverage M-step, " +
      "scaled-log scores)") {
    val docs = graft.core.Tables.documents(spark, sfDir).limit(80)
    val (maxP, minC, rounds, lmax) = (4, 2L, 2, 12)
    // reference: collect the segment census, replay the loop exactly
    val census = docs
      .select(explode(graft.llm.PreTokenize.gptSegments(col("text")))
        .as("w"))
      .where(length(col("w")) <= lmax)
      .groupBy(col("w")).agg(count(lit(1)).as("weight"))
      .as[(String, Long)].collect().toMap
    def L(n: Long) = Unigram.scaledLog(n)
    val seedCnt = scala.collection.mutable.Map.empty[String, Long]
    census.foreach { case (w, wt) =>
      (0 until w.length).foreach { i =>
        (1 to maxP).foreach { l =>
          if (i + l <= w.length) {
            val p = w.substring(i, i + l)
            seedCnt(p) = seedCnt.getOrElse(p, 0L) + wt
          }
        }
      }
    }
    val seed = seedCnt.toMap
      .filter { case (p, c) => c >= minC || p.length == 1 }
    val singles = seed.keySet.filter(_.length == 1)
    def weights(kept: Map[String, Long]) = {
      val t = kept.values.sum
      kept.map { case (p, c) => p -> (L(c) - L(t)) }
    }
    var wgt = weights(seed)
    var kept = seed
    (1 to rounds).foreach { _ =>
      val cnt = scala.collection.mutable.Map.empty[String, Long]
      census.foreach { case (w, wt) =>
        refViterbi(w, wgt, maxP).foreach { p =>
          cnt(p) = cnt.getOrElse(p, 0L) + wt
        }
      }
      kept = cnt.toMap.filter(_._2 > 0) ++
        singles.filterNot(cnt.contains).map(_ -> 1L)
      wgt = weights(kept)
    }
    val want = kept.toSeq.map { case (p, c) => (p, c, wgt(p)) }.sorted
    val got = Unigram.train(docs, "text", maxP, minC, rounds, lmax)
      .select(col("piece"), col("n_cnt"), col("score"))
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(got === want)
  }

  test("targetVocab pruning == a reference replay (singles never " +
      "drop, count-ranked multi quota, 3/4 shrink then exact final " +
      "cut, scores over the kept total)") {
    val docs = graft.core.Tables.documents(spark, sfDir).limit(80)
    val (maxP, minC, rounds, lmax, target) = (4, 2L, 2, 12, 40)
    val census = docs
      .select(explode(graft.llm.PreTokenize.gptSegments(col("text")))
        .as("w"))
      .where(length(col("w")) <= lmax)
      .groupBy(col("w")).agg(count(lit(1)).as("weight"))
      .as[(String, Long)].collect().toMap
    def L(n: Long) = Unigram.scaledLog(n)
    val seedCnt = scala.collection.mutable.Map.empty[String, Long]
    census.foreach { case (w, wt) =>
      (0 until w.length).foreach { i =>
        (1 to maxP).foreach { l =>
          if (i + l <= w.length) {
            val p = w.substring(i, i + l)
            seedCnt(p) = seedCnt.getOrElse(p, 0L) + wt
          }
        }
      }
    }
    val seed = seedCnt.toMap
      .filter { case (p, c) => c >= minC || p.length == 1 }
    val singles = seed.keySet.filter(_.length == 1)
    def weights(kept: Map[String, Long]) = {
      val t = kept.values.sum
      kept.map { case (p, c) => p -> (L(c) - L(t)) }
    }
    def prune(m: Map[String, Long], k: Int): Map[String, Long] = {
      val (s0, mu) = m.partition(_._1.length == 1)
      s0 ++ mu.toSeq.sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, k - s0.size))
    }
    var wgt = weights(seed)
    var kept = seed
    (1 to rounds).foreach { r =>
      val cnt = scala.collection.mutable.Map.empty[String, Long]
      census.foreach { case (w, wt) =>
        refViterbi(w, wgt, maxP).foreach { p =>
          cnt(p) = cnt.getOrElse(p, 0L) + wt
        }
      }
      val m = cnt.toMap.filter(_._2 > 0) ++
        singles.filterNot(cnt.contains).map(_ -> 1L)
      kept = prune(m,
        if (r == rounds) target else math.max(target, m.size * 3 / 4))
      wgt = weights(kept)
    }
    val want = kept.toSeq.map { case (p, c) => (p, c, wgt(p)) }.sorted
    val got = Unigram.train(docs, "text", maxP, minC, rounds, lmax,
        targetVocab = Some(target))
      .select(col("piece"), col("n_cnt"), col("score"))
      .as[(String, Long, Long)].collect().toSeq.sorted
    assert(got === want)
    assert(got.size <= target)
    // every single-char piece of the census survives the cut
    val gotPieces = got.map(_._1).toSet
    assert(singles.subsetOf(gotPieces), "coverage floor violated")
  }

  test("spm_export_vocab-shape model file round-trips and the " +
      "reloaded scores drive an identical Viterbi; malformed input " +
      "rejected loudly") {
    val docs = graft.core.Tables.documents(spark, TestSession.sfDir)
      .limit(60)
    val trained = Unigram.train(docs, "text", 4, 2L, 2, 12)
      .select(col("piece"), col("score"))
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    val dir = java.nio.file.Files.createTempDirectory("graft-spm")
    val f = dir.resolve("unigram.vocab").toString
    Unigram.modelToFile(trained, f)
    val reloaded = Unigram.modelFromFile(spark, f)
    assert(reloaded === trained, "model round trip")
    // reloaded scores segment identically
    val segs = docs
      .select(explode(graft.llm.PreTokenize.gptSegments(col("text"))))
      .where(length(col("col")) <= 12)
      .distinct().as[String].collect().toSeq.take(50)
    def seg(w: Map[String, Long]) = segs.toDF("s")
      .select(Unigram.segmentWith(col("s"), w, 4))
      .as[Seq[String]].collect().toSeq
    assert(seg(reloaded.toMap) === seg(trained.toMap))
    // the written file carries FLOAT natural-log scores (the real
    // spm_export_vocab shape, r15 ADVICE) — 6-decimal fixed point,
    // exactly score/1e6
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(f)), "UTF-8").split("\n").toSeq
    assert(lines.forall(_.matches("""[^\t]+\t-?\d+\.\d{6}""")),
      s"spm dump must carry 6-decimal float scores: ${lines.take(3)}")
    // an EXTERNAL spm-style dump (arbitrary-precision float scores)
    // loads into scaled units, rounding half-up past 6 decimals —
    // format detected PER FILE, so an integral-formatted score line
    // ('-7', C++ float printing) inside a float file scales correctly
    val ext = dir.resolve("ext.vocab")
    java.nio.file.Files.write(ext,
      "a\t-9.3281\nb\t-1.23456789\nc\t-7\n".getBytes("UTF-8"))
    assert(Unigram.modelFromFile(spark, ext.toString) ===
      Seq(("a", -9328100L), ("b", -1234568L), ("c", -7000000L)))
    // ... while an ALL-integer file is the legacy already-scaled dump
    val leg = dir.resolve("legacy.vocab")
    java.nio.file.Files.write(leg,
      "a\t-9328100\nc\t-7\n".getBytes("UTF-8"))
    assert(Unigram.modelFromFile(spark, leg.toString) ===
      Seq(("a", -9328100L), ("c", -7L)))
    // loud failures: two tabs, unparseable score, glob
    val bad1 = dir.resolve("two.vocab")
    java.nio.file.Files.write(bad1, "a\t1\t2\n".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException] {
      Unigram.modelFromFile(spark, bad1.toString)
    }.getMessage.contains("malformed"))
    val bad2 = dir.resolve("junk.vocab")
    java.nio.file.Files.write(bad2, "a\tx1.5z\n".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException] {
      Unigram.modelFromFile(spark, bad2.toString)
    }.getMessage.contains("unparseable"))
    assert(intercept[IllegalArgumentException] {
      Unigram.modelFromFile(spark, dir.resolve("*.vocab").toString)
    }.getMessage.contains("exactly one file"))
    assert(intercept[IllegalArgumentException] {
      Unigram.modelToFile(Seq(("a\tb", 1L)), f)
    }.getMessage.contains("tab/newline-free"))
  }
}
