package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused DSIR stateless scorer — the `PqEncodeNative` treatment applied
  * to the repo's last hot interpreted loop. The HOF formulation
  * (`aggregate` over the bigram array, per-occurrence md5 + array
  * lookup + DECIMAL(38,12) add, each as a separate interpreted
  * expression-tree walk with a BigDecimal box per step) dominated
  * q124/q135 and the 30× stateless-scoring exhibit; this runs
  * tokenize → bigram → md5-bucket → table-lookup → exact decimal sum in
  * one JVM pass per document.
  *
  * Bit parity with the HOF path (`Dsir.scoreExprHof`), clause by clause:
  *  - tokens: `filter(split(lower(trim(text)), "\\s+"), len > 0)` —
  *    replicated by calling the SAME UTF8String.trim/.toLowerCase that
  *    StringTrim/Lower call, then Java `Pattern.split(s, -1)` (what
  *    UTF8String.split delegates to) and a non-empty filter;
  *  - bucket: first four md5 hex digits of `tokᵢ ⧺ " " ⧺ tokᵢ₊₁` mod
  *    nBuckets = the digest's first two bytes as an unsigned 16-bit int
  *    (conv/substring parity is exact — hex is positional);
  *  - per-occurrence addend: the model's round-12 log-ratio double,
  *    re-expanded to a scale-12 decimal exactly as Spark's
  *    double→DECIMAL(38,12) cast does (shortest-repr BigDecimal,
  *    HALF_UP to scale 12 — lossless for round-12 values);
  *  - the fold: Spark types `Add((38,12), (38,12))` as (38,11) under
  *    default `allowPrecisionLoss`, so the HOF's accumulator is
  *    CheckOverflow-rounded to scale 11 (HALF_UP) after EVERY add
  *    before the lambda's cast pads it back to scale 12 — replicated
  *    literally (exact add, then setScale(11, HALF_UP)), because an
  *    exact scale-12 sum would drift from the HOF by up to n·5e-12 and
  *    parity is bit-level, not approximate;
  *  - avg: `bround(sum.toDouble / n, 6)` = shortest-repr BigDecimal of
  *    the quotient, HALF_EVEN to scale 6 — RoundBase's double clause.
  *  - null/short text: the HOF path's `when(size >= 2, …).otherwise([])`
  *    maps NULL text to an EMPTY bigram stream, so the struct is
  *    (0, null), never null — replicated by overriding eval (the
  *    expression is deliberately not null-intolerant).
  *
  * DsirNativeParitySpec holds native and HOF to identical bits over the
  * real corpus plus adversarial strings (tabs/newlines, Unicode case,
  * repeated separators, null, empty, one-token).
  */
/** The library-wide tokenization contract
  * (`filter(split(lower(trim(text)), "\\s+"), len > 0)`), replicated
  * once for the fused native expressions: UTF8String's OWN trim (space
  * only) and toLowerCase (full Unicode), then the Java regex split
  * UTF8String.split delegates to, then the non-empty filter. */
private[plans] object NativeTokens {
  private val ws = Pattern.compile("\\s+")
  def of(v: UTF8String): Array[String] =
    ws.split(v.trim().toLowerCase().toString, -1).filter(_.nonEmpty)
}

case class DsirScoreNative(child: Expression, lrTable: Array[Double],
                           nBuckets: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("avg_logratio", DoubleType, nullable = true)))

  override def nullable: Boolean = false

  // the round-12 doubles re-expanded to exact scale-12 decimals ONCE
  // (the HOF pays Spark's double→decimal cast per occurrence)
  @transient private lazy val lrDec: Array[JBigDecimal] =
    lrTable.map(d => new JBigDecimal(java.lang.Double.toString(d))
      .setScale(12, RoundingMode.HALF_UP))

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    val toks: Array[String] =
      if (v == null) Array.empty
      else NativeTokens.of(v.asInstanceOf[UTF8String])
    val n = if (toks.length >= 2) toks.length - 1 else 0
    if (n == 0) return new GenericInternalRow(Array[Any](0L, null))
    val md = MessageDigest.getInstance("MD5")
    var sum = JBigDecimal.ZERO
    var i = 0
    while (i < n) {
      val dig = md.digest(
        (toks(i) + " " + toks(i + 1)).getBytes(StandardCharsets.UTF_8))
      md.reset()
      val b = (((dig(0) & 0xff) << 8) | (dig(1) & 0xff)) % nBuckets
      sum = sum.add(lrDec(b)).setScale(11, RoundingMode.HALF_UP)
      i += 1
    }
    val avg = JBigDecimal.valueOf(sum.doubleValue / n)
      .setScale(6, RoundingMode.HALF_EVEN).doubleValue
    new GenericInternalRow(Array[Any](n.toLong, avg))
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScoreNative =
    copy(child = newChild)
}

/** Fused blocklist screen: tokenize once, test each token against a
  * HASH SET of the terms — O(1) per token where the HOF formulation's
  * `array_contains` on the term array literal is O(|terms|) per token
  * (an interpreted lambda per token on top). At C4-realistic list sizes
  * (~400 terms) the HOF multiplies the whole corpus scan by the list
  * length; this pass is list-size-independent (measured: the
  * `blocklist_400` ScaleStress exhibit).
  *
  * Output struct, matching the two HOF columns bit-for-bit
  * (CleanFunctionsSpec parity clauses):
  *  - `hits`: sorted distinct listed tokens present =
  *    `array_sort(array_intersect(array_distinct(tokens), terms))` —
  *    sorted by UTF8String's byte-wise order (what array_sort uses on
  *    strings), NOT Java String order (they differ beyond ASCII);
  *  - `n_occ`: total listed-token occurrences =
  *    `size(filter(tokens, array_contains(terms, _)))`.
  * NULL text → null struct (both HOF forms are null on null input). */
case class BlocklistScreen(child: Expression, terms: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("hits", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("n_occ", LongType, nullable = false)))

  override def nullIntolerant: Boolean = true

  @transient private lazy val termSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    terms.foreach(t => s.add(t.toLowerCase): Unit)
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val toks = NativeTokens.of(input.asInstanceOf[UTF8String])
    var n = 0L
    val seen = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < toks.length) {
      if (termSet.contains(toks(i))) {
        n += 1
        seen.add(UTF8String.fromString(toks(i))): Unit
      }
      i += 1
    }
    val hits = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { hits(j) = it.next(); j += 1 }
    new GenericInternalRow(Array[Any](
      new org.apache.spark.sql.catalyst.util.GenericArrayData(hits), n))
  }

  override protected def withNewChildInternal(newChild: Expression): BlocklistScreen =
    copy(child = newChild)
}

object DsirExpressions {
  def dsirScore(text: Column, lrTable: Array[Double], nBuckets: Int): Column =
    ColumnBridge.column(DsirScoreNative(ColumnBridge.expression(text),
      lrTable, nBuckets))

  def blocklistScreen(text: Column, terms: Seq[String]): Column =
    ColumnBridge.column(BlocklistScreen(ColumnBridge.expression(text), terms))
}
