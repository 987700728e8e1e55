package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-shingling kernel backing [[graft.llm.Dedup.shingles]].
  * The Column composition it replaces —
  * `array_distinct(filter(transform(sequence(…), i =>
  * array_join(slice(split(trim(text)), i, w), " ")), …))` — is five
  * nested higher-order functions whose lambdas evaluate interpreted
  * AND re-materialize intermediate arrays per document; this emits
  * one referenced-object call per row (the `GlobMatcher` codegen
  * pattern) that splits, windows, joins, and dedups in a single pass.
  *
  * Bit-exact parity with the HOF chain, pinned in `ShingleKernelSpec`:
  * `UTF8String.trim()` (what Spark's `trim` calls), Java regex
  * `\s+` split with limit −1 (what Spark's `split` does), single-space
  * joins, empty shingles filtered, first-occurrence-order distinct
  * (what `array_distinct` keeps), docs shorter than `w` words → empty
  * array.
  */
final class ShingleKernel(width: Int) extends Serializable {
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def shingles(s: UTF8String): ArrayData = {
    val words = ws.split(s.trim().toString, -1)
    val n = words.length - (width - 1)
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < width) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      if (sb.length > 0) seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Positional (non-distinct, in-order) w-gram kernel over an
  * already-split words ARRAY — the span-removal variant, where
  * shingle index i must stay aligned with word position i.
  */
final class PositionalShingleKernel(width: Int) extends Serializable {
  def shingles(ws: ArrayData): ArrayData = {
    val n = ws.numElements() - (width - 1)
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < width) {
        if (j > 0) sb.append(' ')
        sb.append(ws.getUTF8String(i + j).toString)
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `positional_shingles(words, w)`: overlapping w-grams of a words
  * array, one per start position.
  */
case class PositionalShingles(child: Expression, width: Int) extends UnaryExpression {
  require(width >= 1, "shingle width must be positive")

  @transient private lazy val kernel = new PositionalShingleKernel(width)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "positional_shingles"

  override protected def nullSafeEval(input: Any): Any =
    kernel.shingles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("posShingleKernel", kernel,
      classOf[PositionalShingleKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.shingles($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PositionalShingles =
    copy(child = newChild)

  override def toString: String = s"positional_shingles($child, $width)"
}

/** `word_shingles(text, w)`: distinct w-word shingles of `text`. */
case class WordShingles(child: Expression, width: Int) extends UnaryExpression {
  require(width >= 1, "shingle width must be positive")

  @transient private lazy val kernel = new ShingleKernel(width)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    kernel.shingles(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleKernel", kernel, classOf[ShingleKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.shingles($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def toString: String = s"word_shingles($child, $width)"
}

/** One-pass language-ID kernel: every word answers ALL language
  * tables at once through a word→bitmask map, replacing the per-lang
  * re-split + interpreted 10-way-OR `filter` lambdas. Argmax with
  * strict-greater over the SORTED language codes replicates the
  * `reduce(when(b > a, b).otherwise(a))` tie-break (earlier code
  * wins); zero hits anywhere → "und". Tokenization mirrors
  * `words(lower(text))`: UTF8String lower → trim → `\s+` split.
  */
final class LangIdKernel(tables: Map[String, Seq[String]]) extends Serializable {
  private val langs: Array[String] = tables.keys.toArray.sorted
  private val masks: java.util.HashMap[String, Int] = {
    val m = new java.util.HashMap[String, Int]()
    langs.zipWithIndex.foreach { case (l, i) =>
      tables(l).foreach(w => m.merge(w, 1 << i, (a, b) => a | b))
    }
    m
  }
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")

  def langId(text: UTF8String): UTF8String = {
    val counts = new Array[Int](langs.length)
    val toks = ws.split(text.toLowerCase.trim().toString, -1)
    var t = 0
    while (t < toks.length) {
      val mask = masks.getOrDefault(toks(t), 0)
      if (mask != 0) {
        var i = 0
        while (i < langs.length) {
          if ((mask & (1 << i)) != 0) counts(i) += 1
          i += 1
        }
      }
      t += 1
    }
    var best = 0
    var i = 1
    while (i < langs.length) {
      if (counts(i) > counts(best)) best = i
      i += 1
    }
    UTF8String.fromString(if (counts(best) > 0) langs(best) else "und")
  }
}

/** `lang_id(text)`: argmax stopword-hit language code, or "und". */
case class LangId(child: Expression, tables: Map[String, Seq[String]])
    extends UnaryExpression {
  @transient private lazy val kernel = new LangIdKernel(tables)

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(input: Any): Any =
    kernel.langId(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdKernel", kernel, classOf[LangIdKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.langId($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

/** One-pass DSIR feature-bucket counter: hashed word unigram+bigram
  * counts per document, replacing explode(md5-hex → `conv` base-16
  * decode → pmod) — `conv` decodes through arbitrary-precision
  * arithmetic per FEATURE, and the exploded relation (≈2× corpus
  * token count) then has to shuffle into per-(doc, bucket) counts.
  * This kernel folds the whole feature stream of a document into a
  * `buckets`-sized count array in-row, so the corpus never explodes
  * and never shuffles for the per-doc side.
  *
  * Bucket parity with the Column chain it replaces (pinned in
  * `CurationOpsSpec` and the `d_dsir` oracle): bucket =
  * (first 15 hex digits of md5(feature-UTF8) as a 60-bit value)
  * mod `buckets` — the repo-standard engine-portable hash
  * ([[graft.llm.Dedup.shingleHash]] uses the same construction).
  */
final class DsirBucketKernel(buckets: Int) extends Serializable {
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def bucketOf(bytes: Array[Byte]): Int = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    // first 15 hex digits = the digest's top 60 bits (7 bytes + hi nibble)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v = (v << 4) | ((dig(7) & 0xffL) >>> 4)
    (v % buckets).toInt
  }

  def counts(s: UTF8String): ArrayData = {
    val words = ws.split(s.trim().toString, -1)
    val c = new Array[Int](buckets)
    var i = 0
    while (i < words.length) {
      c(bucketOf(words(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))) += 1
      i += 1
    }
    i = 0
    while (i < words.length - 1) {
      val f = words(i) + " " + words(i + 1)
      c(bucketOf(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))) += 1
      i += 1
    }
    var nz = 0
    var b = 0
    while (b < buckets) { if (c(b) > 0) nz += 1; b += 1 }
    val out = new Array[Any](nz)
    b = 0
    var k = 0
    while (b < buckets) {
      if (c(b) > 0) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](b, c(b)))
        k += 1
      }
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** One-pass winnowing kernel (Schleimer et al. 2003) backing
  * [[graft.llm.Dedup.winnow]]: positional k-gram hashes (the
  * repo-standard md5-top-60-bits mod 2³¹−1, bit-identical to
  * `Dedup.shingleHash`), sliding-window minima via a monotonic deque
  * (O(n) total, vs the Column chain's O(n·w) slices ×4 re-evaluated
  * hash arrays), distinct + sort for the fingerprint set.
  */
final class WinnowKernel(k: Int, w: Int) extends Serializable {
  @transient private lazy val ws = java.util.regex.Pattern.compile("\\s+")
  @transient private lazy val md =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  private def hash60(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v = (v << 4) | ((dig(7) & 0xffL) >>> 4)
    v % 2147483647L
  }

  def fingerprints(s: UTF8String): ArrayData = {
    val words = ws.split(s.trim().toString, -1)
    val n = words.length - (k - 1)
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val hs = new Array[Long](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      hs(i) = hash60(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (n < w) {
      // fewer hashes than a window: one whole-doc window
      var m = hs(0); i = 1
      while (i < n) { if (hs(i) < m) m = hs(i); i += 1 }
      sel.add(m)
    } else {
      // monotonic deque of indices, increasing hash values
      val dq = new Array[Int](n)
      var head = 0; var tail = 0 // [head, tail)
      i = 0
      while (i < n) {
        while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
        dq(tail) = i; tail += 1
        if (dq(head) <= i - w) head += 1
        if (i >= w - 1) sel.add(hs(dq(head)))
        i += 1
      }
    }
    val out = new Array[Any](sel.size())
    val it = sel.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next().longValue(); p += 1 }
    new GenericArrayData(out)
  }
}

/** `winnow_fps(text)`: sorted distinct winnowing fingerprints. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 1 && w >= 1, "k and w must be positive")

  @transient private lazy val kernel = new WinnowKernel(k, w)

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any =
    kernel.fingerprints(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnowKernel", kernel, classOf[WinnowKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.fingerprints($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def toString: String = s"winnow_fps($child, $k, $w)"
}

/** `dsir_buckets(text)`: bucket-sorted (bucket, n) hashed-feature
  * counts for DSIR scoring.
  */
case class DsirBuckets(child: Expression, buckets: Int) extends UnaryExpression {
  require(buckets >= 1, "bucket count must be positive")

  @transient private lazy val kernel = new DsirBucketKernel(buckets)

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("n",
        org.apache.spark.sql.types.IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "dsir_buckets"

  override protected def nullSafeEval(input: Any): Any =
    kernel.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dsirKernel", kernel, classOf[DsirBucketKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.counts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): DsirBuckets =
    copy(child = newChild)

  override def toString: String = s"dsir_buckets($child, $buckets)"
}

object TextKernels {
  def shingles(text: Column, width: Int): Column =
    GraftExpressionBridge.column(
      WordShingles(GraftExpressionBridge.expression(text), width))

  def dsirBuckets(text: Column, buckets: Int): Column =
    GraftExpressionBridge.column(
      DsirBuckets(GraftExpressionBridge.expression(text), buckets))

  def positionalShingles(words: Column, width: Int): Column =
    GraftExpressionBridge.column(
      PositionalShingles(GraftExpressionBridge.expression(words), width))

  def langId(text: Column, tables: Map[String, Seq[String]]): Column =
    GraftExpressionBridge.column(
      LangId(GraftExpressionBridge.expression(text), tables))
}
