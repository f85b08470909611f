package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Seeded fuzz over the native/codegen'd expressions a 100 TB job
  * would stream arbitrary crawl bytes through: none may throw, and
  * each holds its structural invariant on hostile input — mixed ASCII
  * punctuation, `%`/`&#` fragments, combining marks, astral planes,
  * lone-ish sequences. (Deterministic seeds: a failure reproduces.)
  */
class NativeExprFuzzSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private val pools = Array(
    "abcdefghijklmnopqrstuvwxyz",
    "0123456789",
    "%&#;xX",
    "._-~/?=",
    "\u00e9\u00df\u0301\u200b\u2019\u4e2d\u6587",
    new String(Character.toChars(0x1F600)) +
      new String(Character.toChars(0x10348)))

  private def fuzz(seed: Int, n: Int, maxLen: Int): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      val len = rnd.nextInt(maxLen + 1)
      (1 to len).map { _ =>
        val p = pools(rnd.nextInt(pools.length))
        // pick by codepoint so astral chars stay well-formed
        val cps = p.codePoints().toArray
        new String(Character.toChars(cps(rnd.nextInt(cps.length))))
      }.mkString
    }.distinct
  }

  test("decodeNumericEntities never throws and never grows the string") {
    val in = fuzz(101, 400, 40) ++ Seq("", "&#", "&#x", "&#;", "&&##",
      "&#x110000;&#xD800;&#0;&#1;", "&#" * 30)
    val got = in.toDF("s")
      .select(col("s"), graft.llm.Normalize.decodeNumericEntities(col("s"))
        .as("d"))
      .as[(String, String)].collect()
    got.foreach { case (s, d) =>
      assert(d != null)
      assert(d.length <= s.length,
        s"decode grew '${s.take(40)}' (${s.length} -> ${d.length})")
    }
  }

  test("pctNormalize never throws and is idempotent (unreserved " +
      "decode never yields '%', so one pass reaches the fixed point)") {
    val in = fuzz(202, 400, 40) ++ Seq("", "%", "%%", "%2541", "%25%41",
      "%" * 25, "%G1%4%")
    val got = in.toDF("s")
      .select(graft.llm.Domains.pctNormalize(col("s")).as("d"))
      .withColumn("dd", graft.llm.Domains.pctNormalize(col("d")))
      .as[(String, String)].collect()
    got.foreach { case (d, dd) =>
      assert(d != null && dd === d, s"not idempotent at '${d.take(40)}'")
    }
  }

  test("registrableDomain/publicSuffix never throw; when non-null the " +
      "suffix is a dot-suffix of the host and registrable = suffix " +
      "plus exactly one label") {
    val hosts = fuzz(303, 400, 30) ++ Seq("", ".", "..", "a..b",
      "xn--caf-dma.com", "127.0.0.1", "::1", "a.b.c.d.e.f.g.h.i.j.k")
    val got = hosts.toDF("h")
      .select(col("h"),
        graft.llm.Domains.registrableDomain(col("h")).as("rd"),
        graft.llm.Domains.publicSuffix(col("h")).as("ps"))
      .as[(String, Option[String], Option[String])].collect()
    got.foreach { case (h, rd, ps) =>
      val norm = h.toLowerCase.stripSuffix(".")
      ps.foreach { s =>
        assert(norm == s || norm.endsWith("." + s),
          s"suffix '$s' not a dot-suffix of '$h'")
      }
      rd.foreach { r =>
        val s = ps.get // a registrable domain implies a suffix
        assert(r.endsWith(s) && r.length > s.length)
        assert(r.substring(0, r.length - s.length - 1).indexOf('.') < 0,
          s"registrable '$r' must add exactly ONE label to '$s'")
        assert(norm == r || norm.endsWith("." + r))
      }
    }
  }

  test("BpeApplyExpr preserves character mass and never throws on " +
      "unicode fuzz (codepoint reference agrees, astral included)") {
    def refApplyCp(w: String, rules: Seq[(String, String)],
                   rank: Map[(String, String), Int]): Seq[String] = {
      var s = {
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          b += w.substring(i, i + Character.charCount(cp))
          i += Character.charCount(cp)
        }
        b.result()
      }
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
    val rnd = new scala.util.Random(404)
    // rules over the fuzz pools' own codepoints so merges actually fire
    val chars = pools.flatMap(p =>
      p.codePoints().toArray.map(cp => new String(Character.toChars(cp))))
    val rules = (1 to 60).map { _ =>
      (chars(rnd.nextInt(chars.length)), chars(rnd.nextInt(chars.length)))
    }
    val rank = rules.zipWithIndex.groupBy(_._1)
      .map { case (p, rs) => p -> rs.map(_._2).min }
    val words = fuzz(505, 300, 24).filter(_.nonEmpty)
    val got = words.toDF("w")
      .select(col("w"),
        graft.llm.Bpe.applyMerges(col("w"), rules).as("s"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (w, s) =>
      assert(s.mkString === w, s"char mass lost on '${w.take(30)}'")
      assert(s === refApplyCp(w, rules, rank), s"mismatch on '${w.take(30)}'")
    }
  }

  test("GptPreTokenizeExpr never throws and always PARTITIONS hostile " +
      "input (concat(segments) == text, byte for byte)") {
    val in = fuzz(606, 400, 40) ++ Seq("", " ", "'", "''", "'s't're",
      "  　 mixed\tws\n", "a" + "́" * 5)
    val got = in.toDF("s")
      .select(col("s"),
        graft.llm.PreTokenize.gptSegments(col("s")).as("g"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (s, g) =>
      assert(g.mkString === s,
        s"segments must partition '${s.take(30)}'")
      assert(g.forall(_.nonEmpty), "no empty segments")
    }
  }

  test("special-aware GptPreTokenizeExpr partitions hostile input " +
      "and emits every planted special verbatim") {
    val eot = "<|endoftext|>"
    val rnd = new scala.util.Random(808)
    // interleave hostile fuzz with specials and near-miss lookalikes
    val in = fuzz(808, 300, 30).map { s =>
      val parts = s.grouped(math.max(1, s.length / 3)).toSeq
      parts.mkString(if (rnd.nextBoolean()) eot else "<|endof|>")
    } ++ Seq("", eot, eot + eot, s"a$eot", s"$eot b", "<|endoftex")
    val got = in.toDF("s")
      .select(col("s"), graft.llm.PreTokenize.gptSegmentsSpecial(
        col("s"), Seq(eot, "<|pad|>")).as("g"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (s, g) =>
      assert(g.mkString === s,
        s"special segments must partition '${s.take(30)}'")
      assert(g.forall(_.nonEmpty))
      // every literal occurrence surfaces as its own segment
      val occ = Iterator.iterate(s.indexOf(eot))(i =>
        s.indexOf(eot, i + 1)).takeWhile(_ >= 0).size
      assert(g.count(_ == eot) === occ,
        s"planted specials must all surface in '${s.take(30)}'")
    }
  }

  test("UnigramSegmentExpr partitions hostile input under a " +
      "coverage-complete vocab and never throws") {
    val in = fuzz(909, 300, 24).filter(_.nonEmpty)
    // coverage vocab: every single codepoint of the pools + a few
    // multi-char pieces; scores arbitrary
    val singles = pools.flatMap(_.codePoints().toArray.map(cp =>
      new String(Character.toChars(cp)))).distinct
    val vocab = singles.map(_ -> -7L).toMap ++
      Map("ab" -> -3L, "xX" -> -4L, "00" -> -2L, "中文" -> -1L)
    val got = in.toDF("s")
      .select(col("s"), graft.llm.Unigram.segmentWith(col("s"), vocab,
        4).as("p"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (s, p) =>
      assert(p.mkString === s, s"pieces must partition '${s.take(30)}'")
      assert(p.forall(vocab.contains), "every piece is in the vocab")
    }
  }

  test("WordPieceApplyExpr on hostile input: either [UNK] alone or a " +
      "partition of the word into vocab pieces") {
    val in = fuzz(1010, 300, 24).filter(_.nonEmpty)
    // partial vocab (singles for letters/digits only) so UNK genuinely
    // fires on the unicode pools
    val vocab = ("abcdefghijklmnopqrstuvwxyz0123456789").map(c =>
      c.toString).toSet ++
      ("abcdefghijklmnopqrstuvwxyz0123456789").map(c =>
        "##" + c.toString).toSet + "ab" + "##ab"
    val got = in.toDF("s")
      .select(col("s"), graft.llm.WordPiece.applyGreedy(col("s"),
        vocab).as("p"))
      .as[(String, Seq[String])].collect()
    var unks = 0
    got.foreach { case (s, p) =>
      if (p == Seq("[UNK]")) unks += 1
      else {
        assert(p.map(_.stripPrefix("##")).mkString === s,
          s"pieces must reassemble '${s.take(30)}'")
        assert(p.forall(vocab.contains))
      }
    }
    assert(unks > 0, "the partial vocab must exercise the UNK path")
  }

  test("ByteLevelDecodeExpr inverts the byte-level encode on hostile " +
      "unicode (decode(concat(applyMergesBytes(w))) == w)") {
    val words = fuzz(707, 300, 24).filter(_.nonEmpty)
    // a handful of byte-level rules so merged symbols cross the decode
    val g = graft.llm.ByteLevel.byteToChar(0x25) // '%' is printable
    val rules = Seq((g, g), ("a", "b"), ("x", "X"))
    val got = words.toDF("w")
      .select(col("w"), graft.llm.ByteLevel.decodeCol(array_join(
        graft.llm.Bpe.applyMergesBytes(col("w"), rules), "")).as("d"))
      .as[(String, String)].collect()
    got.foreach { case (w, d) =>
      assert(d === w, s"byte-level round trip lost '${w.take(30)}'")
    }
  }
}
