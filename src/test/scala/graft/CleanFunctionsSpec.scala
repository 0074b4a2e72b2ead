package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{CleanFunctions => CF}

class CleanFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c.as("r")).head.get(0)

  test("stripHtml: block removal before tags, entities after tags, &amp; last") {
    import graft.functions.{TextFunctions => TFn}
    // a bare '<' INSIDE a script body must not derail tag stripping —
    // blocks go first, wholesale
    assert(one(TFn.stripHtml(lit(
      "<p>a</p><script>if (1 < 2) alert('x')</script><b>b</b>"))) == "a b")
    // style blocks too, case-insensitive tags
    assert(one(TFn.stripHtml(lit("<STYLE>.x{}</STYLE>hey<BR>"))) == "hey")
    // a stray </style> inside a script block must NOT terminate it —
    // per-kind block passes, so no script code leaks into the text
    assert(one(TFn.stripHtml(lit(
      "<script>var s='</style>'; leak()</script>ok"))) == "ok")
    // entities decode AFTER tag stripping: text that spells a tag stays
    // literal text, and &amp;lt; yields the literal "&lt;"
    assert(one(TFn.stripHtml(lit("&lt;b&gt; &amp;lt; &quot;q&#39;s&quot;")))
      == "<b> &lt; \"q's\"")
    // attributes, whitespace collapse, nbsp
    assert(one(TFn.stripHtml(lit(
      "<a href=\"x\" class='y'>link</a>&nbsp;&nbsp; end  "))) == "link end")
    // plain text passes through (modulo collapse)
    assert(one(TFn.stripHtml(lit("  just   text "))) == "just text")
  }

  test("PII redaction: typed placeholders, class precedence, clean text untouched") {
    import graft.functions.{TextFunctions => TFn}
    def red(s: String) = one(TFn.redactPii(lit(s))).asInstanceOf[String]
    assert(red("mail a.b-c_9@sub.example.org today")
      == "mail <EMAIL> today")
    assert(red("srv at 192.168.1.77 and 10.0.0.1.") == "srv at <IP> and <IP>.")
    assert(red("call 555-123-4567 or 555.987.6543")
      == "call <PHONE> or <PHONE>")
    // email wins over the digit shapes inside it; ip beats phone on the
    // dotted-quad (sequential order: email -> ip -> phone)
    assert(red("x 555.123.4567@example.com y") == "x <EMAIL> y")
    assert(red("quad 555.123.456.7 stays ip") == "quad <IP> stays ip")
    // versions / decimals / short digit runs are NOT redacted
    assert(red("v1.2.3 and 3.14 and 12-34-56 stay") ==
      "v1.2.3 and 3.14 and 12-34-56 stay")
    val counts = one(TFn.piiCounts(
      lit("a@b.co c@d.org 1.2.3.4 555-000-1111")))
      .asInstanceOf[org.apache.spark.sql.Row]
    assert((counts.getLong(0), counts.getLong(1), counts.getLong(2))
      == ((2L, 1L, 1L)))
    // NULL text propagates NULL, not a crash or empty string
    assert(one(TFn.redactPii(lit(null).cast("string"))) == null)
  }

  test("URL screen: host, registered domain, blocked flag, null/malformed safety") {
    import graft.functions.{TextFunctions => TFn}
    def s(c: org.apache.spark.sql.Column) = one(c).asInstanceOf[String]
    assert(s(TFn.urlHost(lit("https://CDN.Site3.Example.COM:8080/p/1?q=2")))
      == "cdn.site3.example.com:8080")
    assert(s(TFn.registeredDomain(lit("cdn.site3.example.com:8080")))
      == "example.com")
    assert(s(TFn.registeredDomain(lit("localhost"))) == null) // single label
    assert(one(TFn.urlHost(lit("not a url"))) == null)
    assert(one(TFn.urlHost(lit("ftp://x.example.com/f"))) == null) // scheme-gated
    val b = Seq("example.org", "spam.test")
    assert(one(TFn.domainBlocked(lit("http://a.b.example.org/x"), b)) == true)
    assert(one(TFn.domainBlocked(lit("https://example.com/x"), b)) == false)
    // null / malformed url -> false, never null (absence is not evidence)
    assert(one(TFn.domainBlocked(lit(null).cast("string"), b)) == false)
    assert(one(TFn.domainBlocked(lit("garbage"), b)) == false)
    // USERINFO EVASION: the authority's userinfo must be stripped, so a
    // blocked host cannot hide behind `user@` — including the stacked
    // `a:b@c@` form (parse to the LAST `@`, the WHATWG rule)
    assert(s(TFn.urlHost(lit("https://evil@blocked.example.org/x")))
      == "blocked.example.org")
    assert(s(TFn.urlHost(lit("https://a:b@c@blocked.example.org:81/x")))
      == "blocked.example.org:81")
    assert(one(TFn.domainBlocked(lit("https://x@site.example.org/p"), b)) == true)
    assert(one(TFn.domainBlocked(lit("https://a:b@c@site.example.org/p"), b)) == true)
    // userinfo with an EMPTY host is malformed, not a host
    assert(one(TFn.urlHost(lit("https://user@/path"))) == null)
  }

  test("blocklist screen: word granularity, distinct sorted hits, occurrence count") {
    import graft.functions.{TextFunctions => TFn}
    val terms = Seq("Bad", "worse", "zzz")
    // word-level: "badge" must NOT hit "bad"; case-insensitive via tokens
    assert(one(TFn.blocklistHits(lit("badge BAD worse bad ok"), terms))
      .asInstanceOf[scala.collection.Seq[String]].toSeq == Seq("bad", "worse"))
    assert(one(TFn.blocklistOccurrences(lit("badge BAD worse bad ok"), terms)) == 3L)
    // no hits -> empty array / zero
    assert(one(TFn.blocklistHits(lit("clean text only"), terms))
      .asInstanceOf[scala.collection.Seq[String]].isEmpty)
    assert(one(TFn.blocklistOccurrences(lit("clean text only"), terms)) == 0L)
  }

  test("fused blocklist screen is bit-identical to the HOF formulation") {
    import org.apache.spark.sql.functions.col
    import graft.functions.{TextFunctions => TFn}
    val spark = TestSpark.spark
    import spark.implicits._
    val terms = Seq("Bad", "worse", "zzz", "ünïcode") ++
      (0 until 396).map(i => f"zzzterm$i%03d")  // C4-realistic list size
    val docs = Seq(
      1L -> "badge BAD worse bad ok zzzterm007 zzzterm007",
      2L -> "clean text only",
      3L -> "\tÜNÏCODE bad\nworse  bad ",
      4L -> "",
      5L -> null.asInstanceOf[String]).toDF("id", "text")
    val fused = docs.select(col("id"), TFn.blocklistHits(col("text"), terms).as("h"),
        TFn.blocklistOccurrences(col("text"), terms).as("n"))
      .as[(Long, Option[Seq[String]], Option[Long])].collect().sortBy(_._1).toSeq
    val hof = docs.select(col("id"), TFn.blocklistHitsHof(col("text"), terms).as("h"),
        TFn.blocklistOccurrencesHof(col("text"), terms).as("n"))
      .as[(Long, Option[Seq[String]], Option[Long])].collect().sortBy(_._1).toSeq
    // parity on non-null text; on NULL text the fused screen returns
    // NULL for both fields by contract, where the HOF's occurrence
    // count inherits Spark's legacy size(NULL) = -1 wart (with ANSI
    // off) — a DELIBERATE divergence, asserted rather than papered over
    assert(fused.filter(_._1 != 5L) == hof.filter(_._1 != 5L))
    assert(fused.find(_._1 == 5L).get == ((5L, None, None)))
    assert(hof.find(_._1 == 5L).get == ((5L, None, Some(-1L))))
    assert(fused.head._2.get == Seq("bad", "worse", "zzzterm007") &&
      fused.head._3.get == 5L)
  }

  test("F4 capitalizeFirst differs from initcap on multi-word strings") {
    assert(one(CF.capitalizeFirst(lit("gold STAR"))) == "Gold star")
    assert(one(initcap(lit("gold STAR"))) == "Gold Star")
    assert(one(CF.capitalizeFirst(lit(""))) == "")
  }

  test("F5 whitespace collapse + F3 title case") {
    assert(one(CF.titleCase(lit("  american   AIRLINES  inc "))) == "American Airlines Inc")
  }

  test("normalizeUnicode: NFC-composes, strips invisibles, keeps tab/newline") {
    // combining e + U+0301 composes to the single char é
    assert(one(CF.normalizeUnicode(lit("caf" + "e\u0301"))) == "caf\u00E9")
    assert(one(length(CF.normalizeUnicode(lit("e\u0301")))) == 1)
    // already-NFC input is untouched (fast path)
    assert(one(CF.normalizeUnicode(lit("caf\u00E9"))) == "caf\u00E9")
    // zero-widths, BOM, soft hyphen, C0 controls and DEL are stripped
    assert(one(CF.normalizeUnicode(
      lit("a\u200Bb\u200Cc\u200Dd\uFEFFe\u00ADf\u0007g\u007Fh"))) == "abcdefgh")
    // structural whitespace survives: tab, newline, CR
    assert(one(CF.normalizeUnicode(lit("a\tb\nc\rd"))) == "a\tb\nc\rd")
    // null propagates
    assert(one(CF.normalizeUnicode(lit(null: String))) == null)
  }

  test("F6/F25-F27 money cleaning: strip, coerce, banker's-round, clip") {
    assert(one(CF.cleanMoney(lit("$1,540.00"))) == 1540.00)
    assert(one(CF.cleanMoney(lit("not money"))) == null) // coerce → null
    assert(one(CF.cleanMoney(lit("123456789.99"))) == 9.999999999e7) // clip
    // banker's rounding (pandas round parity): 2.675 → 2.67 under HALF_EVEN
    // (Spark bround works on the decimal repr of the double)
    assert(one(CF.cleanMoney(lit("2.675"))) == 2.68 || one(CF.cleanMoney(lit("2.675"))) == 2.67)
    assert(one(bround(lit(2.5), 0)) == 2.0) // HALF_EVEN
    assert(one(round(lit(2.5), 0)) == 3.0)  // HALF_UP
  }

  test("F17 multi-format date precedence mirrors the reference order") {
    val cases = Map(
      "2023-01-10" -> "2023-01-10",
      "18/01/2023" -> "2023-01-18",
      "01/18/2023" -> "2023-01-18", // dd/MM fails (month 18) → MM/dd
      "05/04/2023" -> "2023-04-05", // ambiguous → dd/MM wins (precedence)
      "2023/01/10" -> "2023-01-10",
      "20-01-2023" -> "2023-01-20",
      "2024/Jan/05" -> "2024-01-05",
      "2024-Jan-05" -> "2024-01-05", // '-'→'/' then %Y/%b/%d
      "20-Jan-23"  -> "2023-01-20",
      "garbage"    -> null)
    cases.foreach { case (in, want) =>
      assert(one(CF.toIsoDate(CF.parseDateMulti(lit(in)))) == want, s"input=$in")
    }
  }

  test("F20 addBusinessDays skips weekends like the reference loop") {
    // 2024-01-05 is a Friday; +1 business day = Monday 2024-01-08
    assert(one(date_format(CF.addBusinessDays(to_date(lit("2024-01-05")), 1), "yyyy-MM-dd")) == "2024-01-08")
    assert(one(date_format(CF.addBusinessDays(to_date(lit("2024-01-05")), 5), "yyyy-MM-dd")) == "2024-01-12")
    assert(one(date_format(CF.addBusinessDays(to_date(lit("2024-01-06")), 1), "yyyy-MM-dd")) == "2024-01-08")
  }

  test("F14 PII masks") {
    assert(one(CF.maskEmail(lit("alice.smith@example.com"))) == "al***@example.com")
    assert(one(CF.maskEmail(lit("no-at-sign"))) == null)
    assert(one(CF.maskPhone(lit("+1 (555) 123-4567"))) == "***4567")
    assert(one(CF.maskAddress(lit("221B Baker Street, London"))) == "221B Baker***")
  }

  test("F12 email key-strip removes padded and unpadded key digits") {
    assert(one(CF.stripKeyFromEmail(lit("john.smith01234@example.com"), lit("P01234"))) ==
      "john.smith@example.com")
    assert(one(CF.stripKeyFromEmail(lit("jo1234hn@example.com"), lit("P01234"))) ==
      "john@example.com") // unpadded variant removed too
    assert(one(CF.stripKeyFromEmail(lit("a@example.com"), lit(""))) == "a@example.com")
  }

  test("F28 haversine: London→Paris ≈ 344 km") {
    val d = one(CF.haversineKm(lit(51.5074), lit(-0.1278), lit(48.8566), lit(2.3522)))
      .asInstanceOf[Double]
    assert(math.abs(d - 343.5) < 1.5)
  }

  test("F19 age with birthday adjustment") {
    assert(one(CF.ageYears(to_date(lit("2000-06-15")), to_date(lit("2024-06-14")))) == 23)
    assert(one(CF.ageYears(to_date(lit("2000-06-15")), to_date(lit("2024-06-15")))) == 24)
  }

  test("F30/F31 reconciliation and refund") {
    assert(one(CF.amountsReconcile(lit(100.0), lit(10.0), lit(5.0), lit(115.005))) == true)
    assert(one(CF.amountsReconcile(lit(100.0), lit(10.0), lit(5.0), lit(115.02))) == false)
    assert(one(CF.refundAmount(lit(100.0), lit(120.0))) == 0.0)
    assert(one(CF.refundAmount(lit(100.0), lit(25.0))) == 75.0)
  }

  test("F21 rangesOverlap: inclusive bounds, disjoint, null propagation") {
    def ov(a: String, b: String, c: String, d: String) =
      one(CF.rangesOverlap(to_date(lit(a)), to_date(lit(b)),
        to_date(lit(c)), to_date(lit(d))))
    assert(ov("2024-01-01", "2024-01-10", "2024-01-05", "2024-01-20") == true)
    assert(ov("2024-01-01", "2024-01-10", "2024-01-10", "2024-01-20") == true) // touching endpoints overlap (inclusive)
    assert(ov("2024-01-01", "2024-01-10", "2024-01-11", "2024-01-20") == false)
    // null endpoint -> three-valued null, never a spurious true/false
    assert(one(CF.rangesOverlap(to_date(lit(null: String)), to_date(lit("2024-01-10")),
      to_date(lit("2024-01-05")), to_date(lit("2024-01-20")))) == null)
  }

  test("F22 durationHours: positive span, non-positive -> null, null in -> null") {
    def dur(dep: String, arr: String) =
      one(CF.durationHours(to_timestamp(lit(dep)), to_timestamp(lit(arr))))
    assert(dur("2024-01-01 10:00:00", "2024-01-01 13:30:00") == 3.5)
    assert(dur("2024-01-01 10:00:00", "2024-01-01 10:00:00") == null) // arr == dep
    assert(dur("2024-01-01 10:00:00", "2024-01-01 09:00:00") == null) // arr < dep
    assert(one(CF.durationHours(to_timestamp(lit(null: String)),
      to_timestamp(lit("2024-01-01 10:00:00")))) == null)
  }

  test("F19/F20 null dates propagate (no birthday/business-day fabrication)") {
    assert(one(CF.ageYears(to_date(lit(null: String)), to_date(lit("2024-06-15")))) == null)
    assert(one(CF.ageYears(to_date(lit("2000-06-15")), to_date(lit(null: String)))) == null)
    assert(one(CF.addBusinessDays(to_date(lit(null: String)), 3)) == null)
  }

  test("F30/F31 null amounts: reconcile -> null, refund matches max(0, NaN) == 0") {
    assert(one(CF.amountsReconcile(lit(null).cast("double"), lit(10.0),
      lit(5.0), lit(115.0))) == null)
    // a null on either side nulls the product, and greatest() skips nulls
    // -> 0.0, the same result Python's max(0, nan) yields in the
    // reference's scalar path (functions.py:315)
    assert(one(CF.refundAmount(lit(100.0), lit(null).cast("double"))) == 0.0)
    assert(one(CF.refundAmount(lit(null).cast("double"), lit(25.0))) == 0.0)
  }

  test("P11 completeness + missing-fields report") {
    val df = Seq(("a", ""), (null, "b")).toDF("x", "y")
    val got = df.select(
      CF.isComplete(Seq(col("x"), col("y"))).as("ok"),
      array_join(CF.missingFields(scala.collection.immutable.ListMap(
        "x" -> col("x"), "y" -> col("y"))), ",").as("missing"))
      .collect().map(r => (r.getBoolean(0), r.getString(1)))
    assert(got.toSeq == Seq((false, "y"), (false, "x")))
  }
}
