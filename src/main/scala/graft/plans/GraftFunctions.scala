package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.functions._

import graft.functions.{CleanFunctions => CF, TextFunctions => TF, VectorFunctions => VF}
import graft.operators.FuzzyJoin

/** SQL surface for the scalar library (SURVEY.md §2.11): every F-row
  * combinator is registered as a named function, so the whole library is
  * callable from `spark.sql("...")` as well as the DataFrame API.
  *
  * Registration goes through the session FunctionRegistry with expression
  * builders — the registered functions are the SAME Catalyst expression
  * trees the Column API builds (codegen'd, optimizer-visible), not UDFs.
  *
  * Use either:
  *   GraftFunctions.registerAll(spark)                   // imperative
  *   .config("spark.sql.extensions", classOf[GraftExtensions].getName)
  */
object GraftFunctions {

  private def colFn(spark: SparkSession, name: String)(fn: Seq[Column] => Column): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      exprs => ExpressionUtils.expression(fn(exprs.map(ExpressionUtils.column))),
      "scala_udf")

  def registerAll(spark: SparkSession): Unit = {
    // strings / cleaning
    colFn(spark, "graft_normalize_ws")     { a => CF.normalizeWhitespace(a.head) }
    colFn(spark, "graft_normalize_unicode") { a => CF.normalizeUnicode(a.head) }
    colFn(spark, "graft_title_case")       { a => CF.titleCase(a.head) }
    colFn(spark, "graft_capitalize_first") { a => CF.capitalizeFirst(a.head) }
    colFn(spark, "graft_strip_non_alpha")  { a => CF.stripNonAlpha(a.head) }
    colFn(spark, "graft_clean_money")      { a => CF.cleanMoney(a.head) }
    colFn(spark, "graft_is_digits")        { a => CF.isDigits(a.head) }
    colFn(spark, "graft_alnum_prefix")     { a => CF.alnumPrefix(a.head) }
    colFn(spark, "graft_strip_key_from_email") { a => CF.stripKeyFromEmail(a(0), a(1)) }
    colFn(spark, "graft_first_name")       { a => CF.firstName(a.head) }
    colFn(spark, "graft_last_name")        { a => CF.lastName(a.head) }
    // PII / keys
    colFn(spark, "graft_mask_email")       { a => CF.maskEmail(a.head) }
    colFn(spark, "graft_mask_phone")       { a => CF.maskPhone(a.head) }
    colFn(spark, "graft_mask_address")     { a => CF.maskAddress(a.head) }
    colFn(spark, "graft_md5_key")          { a => CF.md5Key(a: _*) }
    // dates
    colFn(spark, "graft_parse_date")       { a => CF.parseDateMulti(a.head) }
    colFn(spark, "graft_iso_date")         { a => CF.toIsoDate(a.head) }
    colFn(spark, "graft_age_years")        { a => CF.ageYears(a(0), a(1)) }
    colFn(spark, "graft_ranges_overlap")   { a => CF.rangesOverlap(a(0), a(1), a(2), a(3)) }
    colFn(spark, "graft_duration_hours")   { a => CF.durationHours(a(0), a(1)) }
    colFn(spark, "graft_delay_minutes")    { a => CF.delayMinutes(a(0), a(1)) }
    // math / geo / money
    colFn(spark, "graft_haversine_km")     { a => CF.haversineKm(a(0), a(1), a(2), a(3)) }
    colFn(spark, "graft_convert_currency") { a => CF.convertCurrency(a(0), a(1), a(2)) }
    colFn(spark, "graft_reconcile")        { a => CF.amountsReconcile(a(0), a(1), a(2), a(3)) }
    colFn(spark, "graft_refund")           { a => CF.refundAmount(a(0), a(1)) }
    // fuzzy
    colFn(spark, "graft_similarity_ratio") { a => FuzzyJoin.similarityRatio(a(0), a(1)) }
    colFn(spark, "graft_token_sort_ratio") { a => FuzzyJoin.tokenSortRatio(a(0), a(1)) }
    // text analysis
    colFn(spark, "graft_tokens")           { a => TF.tokens(a.head) }
    colFn(spark, "graft_token_count")      { a => TF.tokenCount(a.head) }
    colFn(spark, "graft_bpe_token_count")  { a => TF.bpeTokenCount(a.head) }
    colFn(spark, "graft_lang_id")          { a => TF.langId(a.head) }
    colFn(spark, "graft_quality_score")    { a => TF.qualityScore(a.head) }
    colFn(spark, "graft_fingerprint")      { a => TF.fingerprint(a.head) }
    colFn(spark, "graft_content_key")      { a => TF.contentKey(a.head) }
    // vectors
    colFn(spark, "graft_dot")              { a => VF.dot(a(0), a(1)) }
    colFn(spark, "graft_norm2")            { a => VF.norm2(a.head) }
    colFn(spark, "graft_cosine")           { a => VF.cosine(a(0), a(1)) }
    colFn(spark, "graft_normalize_vec")    { a => VF.normalize(a.head) }
    // sketches / dedup / selection (int parameters must be literals —
    // they size the expression tree itself)
    colFn(spark, "graft_char_shingles")    { a => TF.charShingles(a(0), litInt(a(1), "shingle size")) }
    colFn(spark, "graft_word_shingles")    { a => TF.wordShingles(a(0), litInt(a(1), "n")) }
    colFn(spark, "graft_minhash_sig")      { a => graft.operators.TextDedup.minHashSignature(a(0), litInt(a(1), "numHashes")) }
    // null (not NaN / a padded misestimate) on empty or length-mismatched
    // signatures — zip_with would silently null-pad the shorter array and
    // size 0 would divide to NaN
    colFn(spark, "graft_est_jaccard")      { a =>
      when(size(a(0)) > 0 && size(a(0)) === size(a(1)),
        size(filter(zip_with(a(0), a(1), (x, y) => x === y), b => b))
          .cast("double") / size(a(0))) }
    colFn(spark, "graft_bpe_tokens")       { a => TF.bpeTokens(a.head, TF.DemoMerges) }
    colFn(spark, "graft_bucket16")         { a => graft.operators.Split.bucket16(a.head) }
    colFn(spark, "graft_bucket65536")      { a => graft.operators.Split.bucket65536(a.head) }
    colFn(spark, "graft_dsir_bucket")      { a => graft.operators.Dsir.bucketOf(a(0), litInt(a(1), "nBuckets")) }
  }

  /** Extract a literal INT argument — the parameter sizes the expression
    * tree (number of hashes, shingle width), so it cannot be a runtime
    * column. */
  private def litInt(c: Column, what: String): Int =
    ExpressionUtils.expression(c) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an INT literal, got $other")
    }
}

/** Session-extensions hook: injects the graft function library at session
  * build time (`spark.sql.extensions=graft.plans.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    // Register via injectFunction so the functions exist in every session
    // derived from the extended builder (including spark.sql from pure SQL).
    def inject(name: String)(fn: Seq[Column] => Column): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) =>
          ExpressionUtils.expression(fn(exprs.map(ExpressionUtils.column)))))
    inject("graft_title_case") { a => CF.titleCase(a.head) }
    inject("graft_clean_money") { a => CF.cleanMoney(a.head) }
    inject("graft_parse_date") { a => CF.parseDateMulti(a.head) }
    inject("graft_similarity_ratio") { a => FuzzyJoin.similarityRatio(a(0), a(1)) }
    inject("graft_cosine") { a => VF.cosine(a(0), a(1)) }
    // edit-distance bound prefilter (see LevenshteinPrefilter)
    ext.injectOptimizerRule(_ => LevenshteinPrefilter)
  }
}
