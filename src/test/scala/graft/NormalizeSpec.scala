package graft

import java.nio.charset.StandardCharsets
import java.text.Normalizer

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Normalize

/** Unicode normalization + mojibake repair (`graft.llm.Normalize`):
  * NFC parity with the JDK reference, round-trip repair of
  * Latin-1/cp1252 misdecodes, punctuation cleanup, and the headline
  * guarantee — an NFD/NFC spelling pair dedups ONLY after
  * normalization. (All non-ASCII test data is built from \\u escapes so
  * the source file's own encoding can never silently change the test.)
  */
class NormalizeSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** UTF-8 bytes decoded as "sloppy cp1252" (cp1252 specials in
    * 0x80–0x9F, Latin-1 for the five undefined slots) — the exact
    * mangle [[Normalize.repairMojibake]] inverts.
    */
  private def misdecode(s: String): String = {
    val specials = Map(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ',
      0x84 -> '„', 0x85 -> '…', 0x86 -> '†',
      0x87 -> '‡', 0x88 -> 'ˆ', 0x89 -> '‰',
      0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’',
      0x93 -> '“', 0x94 -> '”', 0x95 -> '•',
      0x96 -> '–', 0x97 -> '—', 0x98 -> '˜',
      0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    s.getBytes(StandardCharsets.UTF_8).map { b =>
      val u = b & 0xFF
      specials.getOrElse(u, u.toChar)
    }.mkString
  }

  private def runOne(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
                     inputs: Seq[String]): Seq[String] =
    inputs.toDF("s").select(f(col("s")).as("r")).as[String].collect().toSeq

  test("nfc matches java.text.Normalizer on composed/decomposed/mixed " +
      "strings under CODEGEN_ONLY, and nulls pass through") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val inputs = Seq("", "ascii only",
        "cafe\u0301",  // decomposed e + combining acute
        "caf\u00e9",  // precomposed
        "b\u0301x",  // combining mark that cannot compose
        "A\u030amlaut o\u0308",  // ring + diaeresis, both composable
        "already \u00e1lvaro",  // already NFC (quick-check fast path)
        "\u1e9b\u0323 odd ordering",  // classic reordering case
        "\ud55c\uad6d\uc5b4 \u1112\u1161\u11ab\u1100\u1173\u11af")  // syllables + conjoining jamo
      val got = runOne(Normalize.nfc, inputs)
      inputs.zip(got).foreach { case (in, out) =>
        assert(out === Normalizer.normalize(in, Normalizer.Form.NFC),
          s"nfc mismatch on ${in.map(_.toInt.toHexString).mkString(" ")}")
      }
      assert(got(2) === got(3), "NFD and NFC spellings must converge")
      val nulls = Seq[String](null).toDF("s")
        .select(Normalize.nfc(col("s")).as("r")).collect()
      assert(nulls.head.isNullAt(0))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("repairMojibake inverts the sloppy-cp1252 misdecode for single, " +
      "double, and triple mangling; clean text is a fixed point") {
    val clean = Seq("café au lait",
      "naïve — résumé",
      "€99 “quoted”",
      "Дом книги",
      "中文 text", "plain ascii",
      "ŠŒŽ šœž Ÿ",
      "emoji 😀 tail")
    val single = clean.map(misdecode)
    val double_ = single.map(misdecode)
    val triple = double_.map(misdecode)
    clean.zip(single).filter(_._1.exists(_ > 0x7F)).foreach {
      case (c, m) => assert(c !== m, "mangle must change non-ASCII text")
    }
    Seq(single, double_, triple).foreach { mangled =>
      val repaired = runOne(Normalize.repairMojibake, mangled)
      clean.zip(repaired).foreach { case (c, r) =>
        assert(r === c, s"repair failed for $c")
      }
    }
    // fixed points: ASCII and ordinary accented text are untouched
    val fixed = Seq("plain ascii", "café au lait",
      "naïve résumé", "Ångström",
      "100% ASCII punct !?")
    assert(runOne(Normalize.repairMojibake, fixed) === fixed)
  }

  test("repairMojibake round-trips randomized unicode strings " +
      "(property: repair(misdecode(s)) == s)") {
    val rnd = new scala.util.Random(42)
    val pools = Array(
      ('a' to 'z').mkString,
      "àáâãäåæçèé",
      "ΔΘΛΞΠΣΦΨΩ",
      "бвгдежзикл",
      "€‚ƒ„…†‡ˆ‰Š",
      "中文字符測試")
    val cases = (1 to 200).map { _ =>
      val len = 1 + rnd.nextInt(30)
      (1 to len).map { _ =>
        val p = pools(rnd.nextInt(pools.length))
        p.charAt(rnd.nextInt(p.length))
      }.mkString
    }.filter(_.exists(_ > 0x7F))
    val repaired = runOne(Normalize.repairMojibake, cases.map(misdecode))
    cases.zip(repaired).foreach { case (c, r) =>
      assert(r === c,
        s"property failed for ${c.map(_.toInt.toHexString).mkString(" ")}")
    }
  }

  test("normalizePunct maps quotes/dashes/spaces, deletes zero-width, " +
      "expands ellipsis") {
    val got = runOne(Normalize.normalizePunct, Seq(
      "\u2018a\u2019 \u201cb\u201d",
      "x\u2013y\u2014z\u2212w",
      "a\u00a0b\u2009c\u3000d",
      "e\u200bf\ufeffg",
      "done\u2026"))
    assert(got === Seq("'a' \"b\"", "x-y-z-w", "a b c d", "efg",
      "done..."))
  }

  test("stripHtml: script/style content dies with its tags, comments " +
      "span lines, tags become word boundaries, entities decode once") {
    val got = runOne(graft.llm.Normalize.stripHtml, Seq(
      "<p>hello</p><p>world</p>",
      "<script>if (a < b) { alert('x</b>'); }</script>kept",
      "<style>p { color: red }</style>kept",
      "before<!-- line1\nline2 -->after",
      "a<br>b",                           // tag = boundary, not glue
      "x &amp;lt; y",                     // double-encoded stays literal
      "5 &lt; 6 &amp;&amp; 7 &gt; 6",
      "no markup at all",
      "<div class=\"a\" data-x='1'>v</div>"))
    assert(got === Seq(
      "hello world",
      "kept",
      "kept",
      "before after",
      "a b",
      "x &lt; y",
      "5 < 6 && 7 > 6",
      "no markup at all",
      "v"))
  }

  test("decodeNumericEntities: dec/hex refs decode once; zero, " +
      "surrogates, out-of-range, overlong runs and malformed refs " +
      "stay literal") {
    val cases = Seq(
      "plain text no refs" -> "plain text no refs",
      "a&#8217;b" -> "a\u2019b",
      "x&#x2014;y" -> "x\u2014y",
      "up&#X27;Z" -> "up'Z",
      "&#174;" -> "\u00ae",
      "&#0;" -> "&#0;",
      "&#xD800;" -> "&#xD800;",
      "&#x110000;" -> "&#x110000;",
      "&#999999999;" -> "&#999999999;",
      "&#12abc;" -> "&#12abc;",
      "&#" -> "&#",
      "&#x;" -> "&#x;",
      "&#xx27;" -> "&#xx27;",
      "&#38;lt;" -> "&lt;",
      "tail&#" -> "tail&#",
      "&#&#38;" -> "&#&",
      "&#039;" -> "'",
      "&#8217;&#8217;" -> "\u2019\u2019",
      // astral plane: U+1F600 needs the surrogate-pair append
      "a&#x1F600;b" -> ("a" + new String(Character.toChars(0x1F600)) + "b"))
    val got = runOne(graft.llm.Normalize.decodeNumericEntities, cases.map(_._1))
    cases.map(_._2).zip(got).zip(cases.map(_._1)).foreach {
      case ((exp, g), in) => assert(g === exp, s"input $in")
    }
  }

  test("stripHtml decodes numeric refs AFTER named entities and " +
      "BEFORE &amp; (double-encoded numerics stay literal)") {
    val got = runOne(graft.llm.Normalize.stripHtml, Seq(
      "it&#8217;s &#x2014; fine",
      "&amp;#8217; stays literal",     // double-encoded numeric
      "&#38;lt; is a literal &lt;",    // decoded & never re-decodes
      "&#174;&nbsp;2024"))
    assert(got === Seq(
      "it\u2019s \u2014 fine",
      "&#8217; stays literal",
      "&lt; is a literal <",
      "\u00ae 2024"))
  }

  test("an NFD/NFC spelling pair dedups ONLY after forDedup " +
      "normalization (raw hashes differ, normalized hashes collide)") {
    val nfd = "it's the expose\u0301 of the cafe\u0301"
    val nfc = "it's the expos\u00e9 of the caf\u00e9"
    val curly = "it\u2019s  the expos\u00e9 of\u00a0the caf\u00e9"
    val moji = misdecode(nfc)
    val docs = Seq(
      (1L, nfd), (2L, nfc), (3L, curly), (4L, moji),
      (5L, "a different document entirely"))
      .toDF("doc_id", "text")
    val raw = graft.llm.Dedup.exactDedup(docs, "doc_id", "text")
    assert(raw.count() === 5, "raw spellings must hash apart")
    val norm = graft.llm.Dedup.exactDedup(
      docs.withColumn("text", Normalize.forDedup(col("text"))),
      "doc_id", "text")
    val keepers = norm.orderBy(col("keeper"))
      .select(col("keeper"), col("n_copies")).as[(Long, Long)]
      .collect().toSeq
    assert(keepers === Seq((1L, 4L), (5L, 1L)),
      "all four spellings of the same sentence must dedup to doc 1 " +
        "after normalization")
  }
}
