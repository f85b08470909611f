package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Domains

/** Registrable-domain extraction (`graft.llm.Domains`): PSL-algorithm
  * vectors in the style of the list's own checkPublicSuffix tests —
  * plain/multi-label suffixes, wildcard and exception rules, the
  * default `*` rule, IP literals, degenerate hosts, and normalization.
  */
class DomainsSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def reg(hosts: Seq[String]): Seq[Option[String]] =
    hosts.toDF("h")
      .select(Domains.registrableDomain(col("h")).as("r"))
      .as[Option[String]].collect().toSeq

  private def suf(hosts: Seq[String]): Seq[Option[String]] =
    hosts.toDF("h")
      .select(Domains.publicSuffix(col("h")).as("r"))
      .as[Option[String]].collect().toSeq

  test("PSL vectors: plain, multi-label, wildcard, exception, " +
      "default rule, IPs, degenerate hosts, normalization") {
    val vectors: Seq[(String, Option[String])] = Seq(
      // plain rules
      "example.com" -> Some("example.com"),
      "www.example.com" -> Some("example.com"),
      "a.b.example.com" -> Some("example.com"),
      "com" -> None, // host IS a public suffix
      // multi-label suffixes beat their shorter prefixes
      "example.co.uk" -> Some("example.co.uk"),
      "www.example.co.uk" -> Some("example.co.uk"),
      "example.uk" -> Some("example.uk"), // bare uk is also a suffix
      "co.uk" -> None,
      "uk" -> None,
      // wildcard *.ck: every direct child of ck is a suffix
      "example.ck" -> None,
      "www.example.ck" -> Some("www.example.ck"),
      "a.www.example.ck" -> Some("www.example.ck"),
      // exception !www.ck: www.ck IS registrable
      "www.ck" -> Some("www.ck"),
      "sub.www.ck" -> Some("www.ck"),
      // unknown TLD: default * rule (last label is the suffix)
      "example.xyzunknown" -> Some("example.xyzunknown"),
      "www.example.xyzunknown" -> Some("example.xyzunknown"),
      "xyzunknown" -> None,
      // IP literals have no registrable domain
      "192.168.1.1" -> None,
      "2001:db8::1" -> None,
      // degenerate hosts
      "" -> None,
      ".com" -> None,
      "a..com" -> None,
      // normalization: case and trailing dot
      "WWW.Example.COM" -> Some("example.com"),
      "example.com." -> Some("example.com"),
      "WWW.CK." -> Some("www.ck"))
    val got = reg(vectors.map(_._1))
    vectors.zip(got).foreach { case ((h, want), r) =>
      assert(r === want, s"registrableDomain('$h')")
    }
    // null input passes through
    val n = Seq[String](null).toDF("h")
      .select(Domains.registrableDomain(col("h"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("publicSuffix agrees with the matched rule kind") {
    val vectors: Seq[(String, Option[String])] = Seq(
      "www.example.com" -> Some("com"),
      "www.example.co.uk" -> Some("co.uk"),
      "www.example.ck" -> Some("example.ck"), // wildcard match
      "sub.www.ck" -> Some("ck"),             // exception kills *.ck
      "www.example.xyzunknown" -> Some("xyzunknown"), // default rule
      "192.168.1.1" -> None)
    val got = suf(vectors.map(_._1))
    vectors.zip(got).foreach { case ((h, want), r) =>
      assert(r === want, s"publicSuffix('$h')")
    }
  }

  test("canonicalUrl: case, www, default ports, fragments, trailing " +
      "slashes, tracking params, and param order all normalize away") {
    val vectors: Seq[(String, Option[String])] = Seq(
      "https://WWW.Example.COM/Page/1/?utm_source=x&b=2&a=1#frag" ->
        Some("https://example.com/Page/1?a=1&b=2"),
      "http://example.com:80/i.html" -> Some("http://example.com/i.html"),
      "https://example.com:443/x" -> Some("https://example.com/x"),
      "https://example.com:8443/x" -> Some("https://example.com:8443/x"),
      "https://www.example.com/?fbclid=abc" -> Some("https://example.com"),
      "http://example.org/a/b/" -> Some("http://example.org/a/b"),
      "https://example.com/a?gclid=1&z=9&utm_campaign=c" ->
        Some("https://example.com/a?z=9"),
      // param ORDER collapses to one bucket
      "https://example.com/p?b=2&a=1" -> Some("https://example.com/p?a=1&b=2"),
      "https://example.com/p?a=1&b=2" -> Some("https://example.com/p?a=1&b=2"),
      // utm_ prefix is a family, not a fixed list
      "https://example.com/p?utm_weird=1&keep=2" ->
        Some("https://example.com/p?keep=2"),
      // percent-escape normalization (RFC 3986 6.2.2): unreserved
      // escapes decode either spelling, others uppercase their hex,
      // and a bare/invalid '%' passes through literally
      "https://example.com/%7Euser/%7e2" ->
        Some("https://example.com/~user/~2"),
      "https://example.com/a%2fb?x=%41%5a" ->
        Some("https://example.com/a%2Fb?x=AZ"),
      // a bare/invalid '%' makes the URI unparseable -> parse_url
      // yields no host -> null (such strings are not valid URLs)
      "https://example.com/100%?y=%G1&z=%4" -> None,
      // percent spellings of one URL collapse to one bucket
      "https://example.com/%61bc" -> Some("https://example.com/abc"),
      "https://example.com/abc" -> Some("https://example.com/abc"),
      // valueless tracking params strip like their valued spellings
      "https://example.com/a?fbclid&z=1" ->
        Some("https://example.com/a?z=1"),
      // PERCENT-ENCODED tracking param names decode BEFORE the filter
      // (pctNormalize runs first), so '%66bclid' strips like 'fbclid'
      "https://example.com/a?%66bclid=1&z=1" ->
        Some("https://example.com/a?z=1"),
      "https://example.com/a?%75tm_source&z=1" ->
        Some("https://example.com/a?z=1"),
      "https://example.com/a?utm_source" ->
        Some("https://example.com/a"),
      // no parseable host -> null
      "not a url" -> None,
      "mailto:someone@example.com" -> None)
    val got = vectors.map(_._1).toDF("u")
      .select(graft.llm.Domains.canonicalUrl(col("u")).as("r"))
      .as[Option[String]].collect().toSeq
    vectors.zip(got).foreach { case ((u, want), r) =>
      assert(r === want, s"canonicalUrl('$u')")
    }
  }

  test("pctNormalize: unreserved escapes decode, others uppercase, " +
      "invalid/bare '%' stays literal (defensive path — parse_url " +
      "never emits one)") {
    val vectors = Seq(
      "%7E%7e" -> "~~",
      "%41%5a%61%7a%30%39" -> "AZaz09",
      "%2d%2e%5f" -> "-._",
      "%2f%3a%3f" -> "%2F%3A%3F",
      "a%" -> "a%", "%G1" -> "%G1", "%4" -> "%4", "%%41" -> "%A",
      "" -> "", "plain" -> "plain")
    val got = vectors.map(_._1).toDF("s")
      .select(graft.llm.Domains.pctNormalize(col("s")).as("r"))
      .as[String].collect().toSeq
    vectors.zip(got).foreach { case ((in, want), r) =>
      assert(r === want, s"pctNormalize('$in')")
    }
  }

  test("suffixesFromFile loads a full-size PSL (comments/blanks " +
      "skipped), multi-label rules beyond the default subset resolve, " +
      "and the q283 host family is INVARIANT under the bigger list") {
    // a realistically large, multi-label-heavy list: the defaults plus
    // the .kr family the r12 verdict called out, a 400-rule two-label
    // synthetic block, a deep 4-label rule, and wildcard/exception
    // rules — ~440 rules through the real file-format path
    val extra = Seq("kr", "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr",
        "pe.kr", "a.b.c.zz", "*.wild.zz", "!ok.wild.zz") ++
      (for (c1 <- 'a' to 't'; c2 <- 'a' to 't')
        yield s"$c1$c2.zz")
    val big = graft.llm.Domains.defaultSuffixes ++ extra
    val dir = java.nio.file.Files.createTempDirectory("graft-psl")
    val f = dir.resolve("psl.dat")
    val content = ("// ===BEGIN ICANN DOMAINS===" +: "" +:
      big.map(r => if (r == "co.kr") s"  $r  " else r)) :+
      "" :+ "// ===END ICANN DOMAINS==="
    java.nio.file.Files.write(f,
      content.mkString("\n").getBytes("UTF-8"))
    val loaded = graft.llm.Domains.suffixesFromFile(spark, f.toString)
    assert(loaded.size === big.size, "comments/blanks skipped, rules kept")
    assert(loaded.toSet === big.toSet)
    // the DataFrame path parses identically (same trim/comment rules)
    val viaDf = graft.llm.Domains.suffixesFromDataFrame(
      content.toDF("rule"), "rule")
    assert(viaDf.toSet === loaded.toSet && viaDf.size === loaded.size)
    // multi-label resolution the default subset gets WRONG (co.kr is
    // not a default rule -> default says registrable = 'co.kr')
    def rd(host: String, rules: Seq[String]): Option[String] =
      Seq(host).toDF("h")
        .select(graft.llm.Domains.registrableDomain(col("h"), rules))
        .as[Option[String]].head()
    assert(rd("foo.bar.co.kr", loaded) === Some("bar.co.kr"))
    assert(rd("foo.bar.co.kr", graft.llm.Domains.defaultSuffixes)
      === Some("co.kr"), "the default subset misses .kr (why the " +
      "loader exists)")
    assert(rd("w.x.ab.zz", loaded) === Some("x.ab.zz"))
    assert(rd("deep.a.b.c.zz", loaded) === Some("deep.a.b.c.zz"))
    assert(rd("a.b.c.zz", loaded) === None, "host IS a public suffix")
    assert(rd("n.anything.wild.zz", loaded) === Some("n.anything.wild.zz"))
    assert(rd("sub.ok.wild.zz", loaded) === Some("ok.wild.zz"),
      "exception rule wins over the wildcard")
    // q283/q290 contract: their host family never touches the added
    // rules, so extraction is identical under defaults and the big list
    val hosts = (0L until 500L).toDF("doc_id")
      .select((col("doc_id") % 50).cast("string").as("sd"),
        (col("doc_id") % 10).as("m"), col("doc_id"))
      .select(when(col("m") === 0, concat(lit("www.site"), col("sd"), lit(".com")))
        .when(col("m") === 1, concat(lit("blog.site"), col("sd"), lit(".co.uk")))
        .when(col("m") === 2, concat(lit("a.b.site"), col("sd"), lit(".ac.uk")))
        .when(col("m") === 3, concat(lit("site"), col("sd"), lit(".org")))
        .when(col("m") === 4, concat(lit("www.site"), col("sd"), lit(".xyzunknown")))
        .when(col("m") === 5, concat(lit("192.168.0."), (col("doc_id") % 200).cast("string")))
        .when(col("m") === 6, concat(lit("x.site"), col("sd"), lit(".ck")))
        .when(col("m") === 7, lit("WWW.CK."))
        .when(col("m") === 8, concat(lit("deep.sub.site"), col("sd"), lit(".com.au")))
        .otherwise(lit("co.uk")).as("h"))
    val under = hosts.select(
        graft.llm.Domains.registrableDomain(col("h")).as("d"),
        graft.llm.Domains.registrableDomain(col("h"), loaded).as("b"))
      .collect()
    under.foreach(r => assert(r.get(0) === r.get(1),
      s"q283 hosts must extract identically under the big list: $r"))
  }

  test("registrableDomainFromUrl extracts through the URL host under " +
      "CODEGEN_ONLY") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val got = Seq(
        "https://www.example.co.uk/path?q=1",
        "http://deep.sub.example.com:8080/x",
        "https://192.168.1.1/admin")
        .toDF("u")
        .select(Domains.registrableDomainFromUrl(col("u")).as("r"))
        .as[Option[String]].collect().toSeq
      assert(got === Seq(Some("example.co.uk"), Some("example.com"), None))
    } finally {
      prev match {
        case Some(p) => spark.conf.set("spark.sql.codegen.factoryMode", p)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
