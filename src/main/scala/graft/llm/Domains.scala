package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Registrable-domain extraction (the C4/RefinedWeb domain-mix stage):
  * map a hostname to its REGISTRABLE domain — one label below the
  * public suffix — under the Public Suffix List algorithm (plain,
  * wildcard `*.x`, and exception `!y.x` rules, longest match, default
  * rule `*` for unknown TLDs, no registrable domain for IPs or for
  * hosts that ARE a public suffix).
  *
  * The suffix table is bounded (the full PSL is ~9k rules) and ships
  * inside the expression as a hash set — the "broadcast" is the task
  * binary itself, so extraction is a pure codegen'd per-row lookup:
  * O(depth) set probes, zero joins, zero shuffles at any corpus size.
  * Domain rollups downstream are then ordinary hash aggregates keyed on
  * the extracted domain.
  */
object Domains {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Registrable domain of a hostname column (null for IPs, empty/
    * malformed hosts, and hosts that are themselves a public suffix).
    * Hosts are case/trailing-dot normalized first. `suffixes` uses PSL
    * syntax: `co.uk`, `*.ck`, `!www.ck`.
    */
  def registrableDomain(host: Column,
                        suffixes: Seq[String] = defaultSuffixes): Column =
    ColumnBridge.toColumn(RegistrableDomainExpr(
      ColumnBridge.toExpression(host), suffixes))

  /** The public-suffix part itself (same normalization and null rules;
    * for an unknown TLD the default `*` rule makes it the last label).
    */
  def publicSuffix(host: Column,
                   suffixes: Seq[String] = defaultSuffixes): Column =
    ColumnBridge.toColumn(RegistrableDomainExpr(
      ColumnBridge.toExpression(host), suffixes, suffixOnly = true))

  /** Registrable domain straight from a URL column. */
  def registrableDomainFromUrl(url: Column,
                               suffixes: Seq[String] = defaultSuffixes)
      : Column =
    registrableDomain(try_parse_url(url, lit("HOST")), suffixes)

  /** URL canonicalization for URL-level dedup (the FineWeb/C4 recipe):
    * lowercase scheme+host, strip a leading `www.`, drop default ports
    * (http:80 / https:443), drop the fragment, strip trailing path
    * slashes, normalize percent-escapes in path and query (unreserved
    * escapes `%41`/`%7E` decode to their literal char, every other
    * valid escape uppercases its hex — RFC 3986 §6.2.2), remove
    * tracking query params (utm_*, fbclid, gclid, ref, mc_cid/mc_eid;
    * valueless spellings too) and SORT the survivors so param order
    * never splits a dedup bucket. Pure builtin composition (parse_url
    * + regexp + array HOFs) — a narrow, shuffle-free projection; URLs
    * without a parseable host canonicalize to null. IDN (punycode)
    * host forms are NOT unified — a documented non-goal (needs an IDNA
    * table; byte-different `xn--` vs UTF-8 hosts stay distinct).
    */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url,
      "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val hostRaw = lower(try_parse_url(url, lit("HOST")))
    val host = regexp_replace(hostRaw, "^www\\.", "")
    val port = regexp_extract(
      coalesce(try_parse_url(url, lit("AUTHORITY")), lit("")), ":(\\d+)$", 1)
    val keepPort = port =!= lit("") &&
      !((scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"))
    val portPart = when(keepPort, concat(lit(":"), port)).otherwise(lit(""))
    val path = pctNormalize(regexp_replace(
      coalesce(try_parse_url(url, lit("PATH")), lit("")), "/+$", ""))
    // pctNormalize BEFORE the tracking filter: a percent-encoded
    // spelling of a tracking param ('?%66bclid=1' -> 'fbclid=1') must
    // decode first or it survives the strip and splits a dedup bucket
    val params = filter(
      transform(
        split(coalesce(try_parse_url(url, lit("QUERY")), lit("")), "&"),
        pctNormalize(_)), p =>
        p =!= lit("") && !p.rlike(TrackingParamRegex))
    val qs = array_join(array_sort(params), "&")
    val qPart = when(qs =!= lit(""), concat(lit("?"), qs)).otherwise(lit(""))
    when(hostRaw.isNull || hostRaw === lit("") || scheme === lit(""),
      lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path, qPart))
  }

  /** RFC 3986 §6.2.2 percent-encoding normalization: an escape of an
    * UNRESERVED char (ALPHA / DIGIT / `-` `.` `_` `~`) decodes to the
    * char (`%7E` and `%7e` → `~`); any other valid escape uppercases
    * its hex (`%2f` → `%2F`); a `%` not followed by two hex digits
    * passes through literally. Pure HOF over `split('%')` — each
    * segment's first two chars are the candidate hex — so the DuckDB
    * twin recomputes it with the same split (the q285 oracle states
    * results by construction instead, but DomainsSpec pins the vectors).
    */
  def pctNormalize(s: Column): Column = {
    val parts = split(s, "%")
    val rest = transform(
      slice(parts, lit(2), greatest(size(parts) - 1, lit(0))), seg => {
        val h2 = substring(seg, 1, 2)
        val valid = h2.rlike("^[0-9a-fA-F]{2}$")
        val code = conv(h2, 16, 10).cast("int")
        val unreserved =
          (code >= 48 && code <= 57) || (code >= 65 && code <= 90) ||
            (code >= 97 && code <= 122) ||
            code.isin(45, 46, 95, 126)
        when(valid && unreserved,
          concat(call_function("char", code), seg.substr(lit(3), length(seg))))
          .when(valid,
            concat(lit("%"), upper(h2), seg.substr(lit(3), length(seg))))
          .otherwise(concat(lit("%"), seg))
      })
    when(s.isNull, lit(null).cast("string"))
      .otherwise(concat(element_at(parts, 1), array_join(rest, "")))
  }

  /** Batch URL-level dedup marking (the q285 / FineWeb first pass):
    * (doc_id, canon, kept) where kept iff the doc has the MIN id of
    * its canonical-URL bucket; docs with no parseable host (canonical
    * null) cannot be deduped by URL and stay kept. One narrow
    * projection + one hash aggregate + one keyed join — the shuffle
    * carries (canon, id) pairs only, never text. The streaming face is
    * [[graft.streaming.StreamingUrlDedup]] (twin #29).
    */
  def urlDedupMark(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   urlCol: String): org.apache.spark.sql.DataFrame = {
    val ev = docs.select(col(idCol).cast("long").as("doc_id"),
      canonicalUrl(col(urlCol)).as("canon"))
    val keepers = ev.where(col("canon").isNotNull)
      .groupBy(col("canon")).agg(min(col("doc_id")).as("keeper"))
    ev.join(keepers, Seq("canon"), "left_outer")
      .select(col("doc_id"), col("canon"),
        (col("canon").isNull || col("doc_id") === col("keeper"))
          .as("kept"))
  }

  /** Query params that never change content (analytics/click IDs).
    * `(=|$)` so VALUELESS occurrences (`?fbclid`, `?utm_source`) are
    * also stripped — real crawls carry both spellings.
    */
  val TrackingParamRegex: String =
    "^(utm_[a-z]+|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)(=|$)"

  /** Load a PSL rule list from a file in the publicsuffix.org dat
    * format: one rule per line, `//` comment lines and blank lines
    * skipped, whitespace trimmed (both ICANN and PRIVATE sections are
    * kept — filter upstream if only ICANN rules are wanted). This is a
    * deliberate DRIVER-side bounded collect: the full PSL is ~9k rules
    * (~250 KB), which [[RegistrableDomainExpr]] holds as three hash
    * sets (≈ 2 MB of JVM strings per executor, shipped with the task
    * binary) — lookups stay zero-join, zero-shuffle at any corpus
    * size. Hard cap 100k rules so a mistaken path (a corpus file)
    * fails loudly instead of inflating every task.
    */
  def suffixesFromFile(spark: org.apache.spark.sql.SparkSession,
                       path: String): Seq[String] =
    parseRules(spark.read.textFile(path).collect().toSeq)

  /** Same contract as [[suffixesFromFile]] for rules already in a
    * DataFrame column (e.g. a curated suffix table).
    */
  def suffixesFromDataFrame(df: org.apache.spark.sql.DataFrame,
                            ruleCol: String): Seq[String] = {
    val spark = df.sparkSession
    import spark.implicits._
    parseRules(df.select(col(ruleCol).cast("string"))
      .as[String].collect().toSeq)
  }

  private def parseRules(lines: Seq[String]): Seq[String] = {
    val rules = lines.iterator
      .map(l => Option(l).fold("")(_.trim))
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .toSeq
    require(rules.size <= 100000,
      s"suffix list has ${rules.size} rules (cap 100k) — is this a PSL file?")
    rules
  }

  /** A representative PSL subset for tests/defaults — real deployments
    * pass the full list (publicsuffix.org, ~9k rules; load it with
    * [[suffixesFromFile]]/[[suffixesFromDataFrame]] — the expression
    * holds it as one in-memory set). Includes multi-label suffixes and
    * the PSL's own wildcard/exception showcase (`*.ck` / `!www.ck`).
    */
  val defaultSuffixes: Seq[String] = Seq(
    "com", "org", "net", "edu", "gov", "io", "dev", "app", "info",
    "biz", "jp", "co.jp", "ne.jp", "or.jp",
    "uk", "co.uk", "org.uk", "ac.uk", "gov.uk",
    "au", "com.au", "net.au", "org.au",
    "br", "com.br", "de", "fr", "nl", "it", "es",
    "*.ck", "!www.ck", "*.bd")
}

/** Native PSL matcher. Rules are pre-split by kind and label count so a
  * lookup is ≤ `maxDepth` hash probes per kind. Per the PSL algorithm:
  * exception rules win outright (public suffix = the exception minus
  * its leftmost label); otherwise the longest of plain/wildcard
  * matches; otherwise the default `*` rule (last label). The
  * registrable domain is the public suffix plus one label — null when
  * the host has no label to spare, is an IPv4/IPv6 literal, or is
  * empty/degenerate (leading/trailing/double dots).
  */
case class RegistrableDomainExpr(child: Expression, suffixes: Seq[String],
                                 suffixOnly: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  @transient private lazy val plain: Set[String] =
    suffixes.filterNot(s => s.startsWith("*.") || s.startsWith("!"))
      .map(_.toLowerCase).toSet
  @transient private lazy val wildcard: Set[String] =
    suffixes.filter(_.startsWith("*.")).map(_.drop(2).toLowerCase).toSet
  @transient private lazy val exception: Set[String] =
    suffixes.filter(_.startsWith("!")).map(_.drop(1).toLowerCase).toSet
  @transient private lazy val maxDepth: Int =
    (suffixes.map(_.count(_ == '.') + 1) :+ 1).max

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  def compute(in: UTF8String): UTF8String = {
    var h = in.toString.toLowerCase
    if (h.endsWith(".")) h = h.dropRight(1)
    if (h.isEmpty || h.startsWith(".") || h.contains("..") ||
      h.contains(":") || h.forall(c => c.isDigit || c == '.'))
      return null // empty/degenerate, IPv6 (colon), IPv4 (digits+dots)
    val labels = h.split('.')
    val n = labels.length
    // suffix of the last k labels
    def tail(k: Int): String = labels.view.slice(n - k, n).mkString(".")
    // exception rules first: a k-label exception match means the
    // public suffix is its (k-1)-label tail and the exception itself
    // is the registrable domain
    var k = math.min(n, maxDepth + 1)
    while (k >= 2) {
      if (exception.contains(tail(k))) {
        return UTF8String.fromString(
          if (suffixOnly) tail(k - 1) else tail(k))
      }
      k -= 1
    }
    // longest plain/wildcard match; the default rule `*` (suffix =
    // last label) is the k = 1 floor
    var suf = 1
    k = math.min(n, maxDepth)
    var found = false
    while (k >= 1 && !found) {
      if (plain.contains(tail(k)) ||
        (k >= 2 && wildcard.contains(tail(k - 1)))) {
        suf = k
        found = true
      }
      k -= 1
    }
    if (suffixOnly) UTF8String.fromString(tail(suf))
    else if (n <= suf) null // the host IS a public suffix
    else UTF8String.fromString(tail(suf + 1))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("psl", this,
      classOf[RegistrableDomainExpr].getName)
    nullSafeCodeGen(ctx, ev, in => s"""
      ${ev.value} = $ref.compute($in);
      ${ev.isNull} = (${ev.value} == null);""")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : RegistrableDomainExpr = copy(child = newChild)

  override def prettyName: String =
    if (suffixOnly) "public_suffix" else "registrable_domain"
}
