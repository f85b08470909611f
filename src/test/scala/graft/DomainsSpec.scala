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
