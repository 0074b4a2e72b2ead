package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis functions for large-scale training-data pipelines:
  * tokenization, token counting, language-ID, quality scoring, document
  * fingerprinting, shingling. All pure Catalyst expressions (split /
  * higher-order functions / hashes) — no UDFs, so they stay codegen'd and
  * shuffle-free per row, which is what makes them viable over 100 TB of
  * documents.
  */
object TextFunctions {

  /** Whitespace tokenization; empty strings removed. */
  def tokens(c: Column): Column =
    filter(split(lower(trim(c)), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c)).cast(LongType)

  /** BPE-ish subword proxy count: words contribute ceil(len/4) pieces,
    * numbers and punctuation runs one each — a cheap, deterministic
    * stand-in for a real tokenizer's token count. */
  def bpeTokenCount(c: Column): Column = {
    val pieces = regexp_count(c, lit("[A-Za-z]{1,4}|[0-9]{1,3}|[^A-Za-z0-9\\s]"))
    pieces.cast(LongType)
  }

  /** REAL byte-pair encoding against a merges table (the published BPE
    * apply loop — see [[graft.plans.BpeEncode]]): returns the token
    * array; compose `size(...)` for the exact-tokenizer count the
    * proxy above approximates. The merges list rides as an expression
    * literal, so tokenizing a corpus is a map-only projection. */
  def bpeTokens(c: Column, merges: Seq[(String, String)]): Column =
    graft.plans.SketchExpressions.bpeEncode(c, merges)

  /** Demo merges table for the oracle-gated exact tokenizer (q27/q105):
    * a small learned-style English table — single letters first, then
    * multi-level merges (`th`+`at`, `er`+`s`, `ou`+`t` require symbols
    * built by earlier ranks). Rank = list position, exactly as a real
    * merges.txt is consumed. Shared verbatim with the DuckDB oracle
    * (QueriesText interpolates it into the SQL), so the gate covers the
    * table AND the apply loop. */
  val DemoMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "e" -> "r",
    "o" -> "n", "r" -> "e", "a" -> "t", "e" -> "n", "o" -> "r",
    "s" -> "t", "a" -> "r", "o" -> "u", "in" -> "g", "an" -> "d",
    "e" -> "d", "t" -> "o", "i" -> "s", "o" -> "f", "a" -> "l",
    "e" -> "s", "l" -> "l", "c" -> "h", "th" -> "at", "er" -> "s",
    "ou" -> "t")

  /** Mean token length in characters; 0.0 for token-free docs. Computed
    * as sum-of-token-lengths / token-count (NOT chars/tokens — that would
    * count the separating whitespace). */
  def meanTokenLen(c: Column): Column = {
    val t = tokens(c)
    when(size(t) > 0,
      aggregate(t, lit(0L), (a, x) => a + length(x)).cast(DoubleType) / size(t))
      .otherwise(lit(0.0))
  }

  /** English stopword hits (the langId marker set) — the "natural
    * language, not a token dump" Gopher rule signal. */
  def stopwordHits(c: Column): Column =
    stopHits(tokens(c), EnStop).cast(LongType)

  // Stopword marker sets for the n-gram/stopword language heuristic.
  val EnStop = Seq("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")
  val EsStop = Seq("el", "la", "de", "que", "y", "en", "un", "los", "se", "por")
  val FrStop = Seq("le", "la", "de", "et", "les", "des", "un", "une", "du", "est")
  val DeStop = Seq("der", "die", "und", "das", "ist", "von", "den", "mit", "ein", "zu")

  private def stopHits(toks: Column, words: Seq[String]): Column = {
    val set = array(words.map(lit): _*)
    size(filter(toks, t => array_contains(set, t)))
  }

  /** Language ID by stopword-hit counts with a deterministic en>es>fr>de
    * tiebreak; 'und' (undetermined) when nothing hits. */
  def langId(c: Column): Column = {
    val t = tokens(c)
    val en = stopHits(t, EnStop); val es = stopHits(t, EsStop)
    val fr = stopHits(t, FrStop); val de = stopHits(t, DeStop)
    when(greatest(en, es, fr, de) === 0, lit("und"))
      .when(en >= es && en >= fr && en >= de, lit("en"))
      .when(es >= fr && es >= de, lit("es"))
      .when(fr >= de, lit("fr"))
      .otherwise(lit("de"))
  }

  /** Document quality score in [0,1]: blends token count (saturating at
    * 200), mean token length sanity (peak near 3-10 chars), punctuation
    * ratio penalty, and stopword presence. Deterministic; mirrors the usual
    * length/punct/stopword heuristics used for pretraining-data filtering. */
  def qualityScore(c: Column): Column = {
    val t = tokens(c)
    val nTok = size(t).cast(DoubleType)
    val chars = length(c).cast(DoubleType)
    val punct = regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast(DoubleType)
    val stopR = when(nTok > 0, stopHits(t, EnStop).cast(DoubleType) / nTok).otherwise(lit(0.0))
    val lenScore  = least(nTok / 200.0, lit(1.0))
    val punctPen  = when(chars > 0, least(punct / chars * 5.0, lit(1.0))).otherwise(lit(1.0))
    val meanTokLen = when(nTok > 0, chars / nTok).otherwise(lit(0.0))
    val tokLenScore = when(meanTokLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    bround(lit(0.4) * lenScore + lit(0.2) * tokLenScore +
      lit(0.2) * (lit(1.0) - punctPen) + lit(0.2) * least(stopR * 5.0, lit(1.0)), 6)
  }

  /** Character n-gram shingles (default 5), distinct. */
  def charShingles(c: Column, n: Int = 5): Column = {
    val s = lower(CleanFunctions.normalizeWhitespace(c))
    array_distinct(transform(
      sequence(lit(1), greatest(length(s) - (n - 1), lit(1))),
      i => s.substr(i, lit(n))))
  }

  /** Word n-gram shingles over whitespace tokens, distinct. */
  def wordShingles(c: Column, n: Int = 3): Column = {
    val t = tokens(c)
    array_distinct(transform(
      sequence(lit(1), greatest(size(t) - (n - 1), lit(1))),
      i => array_join(slice(t, i, lit(n)), " ")))
  }

  /** Rolling polynomial fingerprint of the normalized text: fold
    * acc = acc * 31 + xxhash64(token) over whitespace tokens (64-bit
    * wraparound). Equal normalized token streams <=> equal fingerprints. */
  def fingerprint(c: Column): Column =
    aggregate(tokens(c), lit(0L),
      (acc, t) => acc * lit(31L) + xxhash64(t))

  /** Exact-dup content key: md5 of whitespace-normalized lowercased text. */
  def contentKey(c: Column): Column =
    md5(lower(CleanFunctions.normalizeWhitespace(c)))

  /** Duplicate word-n-gram fraction in [0,1] — the Gopher/C4-style
    * within-document repetition signal (a doc whose bigrams are mostly
    * repeats is boilerplate or a generation loop). 0 when the doc has
    * fewer than n tokens. One projection, no shuffle; native expression
    * (graft.plans.DupNgramFraction) — one loop + hash set per row
    * instead of an interpreted lambda per gram position. */
  def dupNgramFraction(c: Column, n: Int = 2): Column =
    graft.plans.SketchExpressions.dupNgramFraction(tokens(c), n)

  /** Reference HOF formulation of [[dupNgramFraction]] — kept as the
    * parity oracle for the native expression (see TextDedupSpec). */
  def dupNgramFractionHof(c: Column, n: Int = 2): Column = {
    val tk = tokens(c)
    val cnt = (size(tk) - (n - 1)).cast(DoubleType)
    val ngrams = transform(sequence(lit(1), size(tk) - (n - 1)),
      i => array_join(slice(tk, i, lit(n)), " "))
    when(size(tk) < n, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(ngrams)).cast(DoubleType) / cnt)
  }

  /** md5-chain fingerprint: fold acc = md5(acc || md5(token)) over the
    * whitespace tokens, zero "". Same equality contract as [[fingerprint]]
    * (equal normalized token streams <=> equal fingerprints) but built
    * from md5 only, so a SQL engine without xxhash64 (the DuckDB oracle)
    * can reproduce it exactly with a list_reduce. */
  def md5Fingerprint(c: Column): Column =
    aggregate(transform(tokens(c), t => md5(t)), lit(""),
      (acc, h) => md5(concat(acc, h)))

  /** HTML boilerplate strip — the web-extraction stage of a crawl
    * pipeline (the trafilatura/jusText problem reduced to its
    * deterministic core): drop <script>/<style> blocks wholesale, strip
    * every remaining tag, THEN decode the common entities, and collapse
    * whitespace. Ordering is load-bearing and deliberate: entities
    * decode strictly AFTER tag stripping, so text that SPELLS "&lt;b&gt;"
    * becomes the literal "<b>" in the output instead of being eaten as
    * a tag — the classic double-decode bug, inverted into a contract.
    * `&amp;` decodes last for the same reason (`&amp;lt;` must yield
    * "&lt;", not "<"). Regexes avoid backreferences and use inline
    * (?is) flags only, so Java regex (Spark) and RE2 (the DuckDB
    * oracle) execute them identically. Pure codegen'd projection chain
    * — no shuffle, no UDF. */
  def stripHtml(c: Column): Column = {
    // one pass PER block kind — a combined (script|style) alternation
    // would let a stray </style> terminate a <script> block and leak
    // script code into the text (RE2 has no backreferences to tie the
    // close tag to the open tag, so two passes is the portable fix)
    val noScript = regexp_replace(c,
      "(?is)<script[^>]*>.*?</script\\s*>", " ")
    val noBlocks = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style\\s*>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (col0, (e, v)) =>
        org.apache.spark.sql.functions.replace(col0, lit(e), lit(v))
      }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** PII anonymization — the Dolma/RedPajama scrub stage (Soldaini et
    * al. 2024 §2.3 replace emails/phones/IPs with typed placeholder
    * tokens rather than dropping the document): three sequential
    * regexp_replace passes, EMAIL first (an email's local part can
    * contain digit runs the phone pattern would shred), then IP before
    * PHONE (both are digit shapes; the dotted-quad must win). Patterns
    * are deliberately RE2-safe (no lookaround, no backreferences) so
    * the DuckDB oracle replays them verbatim and a Flink/Trino port
    * keeps the exact match set. One codegen'd projection — zero joins,
    * zero shuffles, linear in scanned bytes at any corpus size. */
  private val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PiiIp = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private val PiiPhone = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  def redactPii(c: Column): Column = {
    val noEmail = regexp_replace(c, PiiEmail, "<EMAIL>")
    val noIp = regexp_replace(noEmail, PiiIp, "<IP>")
    regexp_replace(noIp, PiiPhone, "<PHONE>")
  }

  /** Per-class PII match counts on the INPUT text (each class counted
    * independently — the audit histogram a scrub report aggregates;
    * [[redactPii]]'s sequential replacement can only differ on inputs
    * where one class's match contains another's, which the
    * email-first / ip-before-phone order then resolves). */
  def piiCounts(c: Column): Column =
    struct(
      regexp_count(c, lit(PiiEmail)).cast(LongType).as("n_email"),
      regexp_count(c, lit(PiiIp)).cast(LongType).as("n_ip"),
      regexp_count(c, lit(PiiPhone)).cast(LongType).as("n_phone"))

  /** URL screen — the C4/RefinedWeb crawl-side filter family (Penedo et
    * al. 2023 §3.1 drop documents by source URL before any content
    * work, it is the cheapest possible reject): host extraction,
    * registered-domain collapse (`cdn.site3.example.com` →
    * `example.com`-level policy needs the last-two-label fold), and a
    * blocked-domain membership flag. RE2-safe regex, codegen'd
    * projections, zero joins — the blocklist is parameter-sized config
    * exactly like [[blocklistHits]]' term list. NULL/malformed URLs
    * yield NULL host/domain and `false` (a missing URL is not evidence
    * of a blocked one — quarantine on null separately if provenance is
    * mandatory). USERINFO IS STRIPPED before the host is returned —
    * `https://evil@blocked.example.com/` must screen as
    * `blocked.example.com`, not sail past the blocklist inside an
    * authority that still carries `evil@`; the strip is greedy to the
    * LAST `@` (the WHATWG parse — `a:b@c@host` is userinfo `a:b@c`),
    * so stacking `@`s is not an evasion either. */
  def urlHost(url: Column): Column = {
    val auth = regexp_extract(lower(url), "^https?://([^/?#]+)", 1)
    val h = regexp_replace(auth, "^.*@", "")
    when(h === "", lit(null).cast(StringType)).otherwise(h)
  }

  /** Last two dot-labels of the host (the eTLD+1 approximation a
    * suffix-list-free engine can replay anywhere; ports stripped). */
  def registeredDomain(host: Column): Column = {
    val noPort = regexp_replace(host, ":[0-9]+$", "")
    val d = regexp_extract(noPort, "([^.]+\\.[^.]+)$", 1)
    when(d === "", lit(null).cast(StringType)).otherwise(d)
  }

  /** TRUE iff the url's registered domain is in `blocked` (compared
    * lowercase). NULL-safe: null/malformed urls are false. */
  def domainBlocked(url: Column, blocked: Seq[String]): Column = {
    require(blocked.nonEmpty, "empty domain blocklist")
    coalesce(registeredDomain(urlHost(url))
      .isin(blocked.map(_.toLowerCase): _*), lit(false))
  }

  /** Blocklist screen at WORD granularity — the C4-style "bad words"
    * filter stage (Raffel et al. 2020 drop any page containing a listed
    * word; word-level so a listed "scan" does not hit "scanner"). The
    * pattern set is parameter-sized CONFIG (real blocklists are a few
    * thousand terms) riding inside the fused
    * [[graft.plans.BlocklistScreen]] expression as a HASH SET — O(1)
    * per token regardless of list size, still a map-only projection
    * with zero joins and zero shuffles at any corpus size. (The
    * original array-literal HOF forms are kept below as parity oracles:
    * `array_contains` on a term literal is O(|terms|) PER TOKEN, which
    * at C4's ~400 terms multiplies the corpus scan — measured in the
    * `blocklist_400` ScaleStress exhibit.)
    *
    * [[blocklistHits]] returns the sorted DISTINCT listed words present
    * (the audit column a filtering report groups by);
    * [[blocklistOccurrences]] counts total occurrences (the policy
    * input for threshold rules softer than C4's any-hit drop). Terms
    * are matched lowercase against [[tokens]]. NULL text → NULL for
    * both (the HOF form's occurrence count inherited Spark's legacy
    * `size(NULL) = -1` wart under non-ANSI sessions — deliberately NOT
    * reproduced; the parity spec asserts the divergence). */
  def blocklistHits(c: Column, terms: Seq[String]): Column =
    graft.plans.DsirExpressions.blocklistScreen(c, terms).getField("hits")

  /** Total listed-word occurrences in `c` — see [[blocklistHits]]. */
  def blocklistOccurrences(c: Column, terms: Seq[String]): Column =
    graft.plans.DsirExpressions.blocklistScreen(c, terms).getField("n_occ")

  /** Pre-fusion HOF formulations — the parity oracles for the fused
    * screen (CleanFunctionsSpec holds them bit-identical). */
  private[graft] def blocklistHitsHof(c: Column, terms: Seq[String]): Column =
    array_sort(array_intersect(array_distinct(tokens(c)),
      typedLit(terms.map(_.toLowerCase).distinct)))

  private[graft] def blocklistOccurrencesHof(c: Column, terms: Seq[String]): Column = {
    val pats = typedLit(terms.map(_.toLowerCase).distinct)
    size(filter(tokens(c), t => array_contains(pats, t))).cast(LongType)
  }
}
