package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE tokenization as native expressions — REAL token
  * accounting for the budget operators (whitespace counts are 2–4×
  * off on code/non-English; a training-data budget measured in model
  * tokens needs the model's segmentation).
  *
  * The algorithm is the public byte-level BPE (Sennrich et al. 2016;
  * byte-level formulation and pre-tokenizer from GPT-2, Radford et
  * al. 2019): UTF-8 bytes map injectively into printable unicode (the
  * published bytes-to-unicode table — space becomes 'Ġ'), text splits
  * on the published GPT-2 pre-tokenizer regex (contractions, letter
  * runs, digit runs, punctuation runs, whitespace), and each
  * pre-token's symbol sequence greedily merges its lowest-rank
  * adjacent pair until no ranked pair remains. The MERGES TABLE is
  * pluggable ([[BpeRanks]], parsed from the published merges.txt
  * format) — the 50k GPT-2 table is a download away in production;
  * nothing here assumes a particular vocabulary.
  *
  * Scale: the ranks ride inside the expression (serialized once per
  * task — a 50k-pair table is ~2 MB, the same order as a broadcast
  * side), pre-token segmentations memoize in a per-task cache (Zipf:
  * a handful of word shapes dominate any corpus), and the expressions
  * are CodegenFallback like [[WordShingles]] — one boxed call per
  * row around a single JVM method, noise next to the merge loop
  * itself.
  */
object BpeExpressions {

  /** An immutable merge-ranks table. Value-equal by content so
    * expression trees containing it compare/canonicalize correctly.
    */
  final class BpeRanks(val ranks: Map[(String, String), Int])
      extends Serializable {
    override def equals(o: Any): Boolean = o match {
      case r: BpeRanks => r.ranks == ranks
      case _           => false
    }
    override def hashCode: Int = ranks.hashCode
    override def toString: String = s"BpeRanks(${ranks.size} merges)"
  }

  object BpeRanks {
    /** Parse the published merges.txt format: one "left right" pair
      * per line in rank order; '#'-prefixed header lines skipped.
      */
    def parseMerges(lines: Iterator[String]): BpeRanks = {
      val rs = lines.map(_.trim)
        .filterNot(l => l.isEmpty || l.startsWith("#"))
        .zipWithIndex.map { case (l, i) =>
          val sp = l.split(" ")
          require(sp.length == 2, s"malformed merge line '$l'")
          (sp(0), sp(1)) -> i
        }.toMap
      new BpeRanks(rs)
    }

    def parseMerges(pairs: Seq[(String, String)]): BpeRanks =
      new BpeRanks(pairs.zipWithIndex.toMap)

    def loadFile(path: String): BpeRanks = {
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(path))
      parseMerges(scala.jdk.CollectionConverters.ListHasAsScala(lines)
        .asScala.iterator)
    }
  }

  /** Model-token array of a text column (byte-encoded alphabet — see
    * [[bpeDetokenize]] for the inverse). NULL text tokenizes to the
    * empty array.
    */
  def bpeTokens(text: Column, vocab: BpeRanks): Column =
    graftshim.columnOf(BpeTokenize(graftshim.expressionOf(text), vocab))

  /** Model-token COUNT of a text column — the real `n_tokens` feed
    * for selectByTokenBudget / packTokens / chunk budgeting. NULL
    * text counts 0.
    */
  def bpeTokenCount(text: Column, vocab: BpeRanks): Column =
    graftshim.columnOf(BpeTokenCount(graftshim.expressionOf(text), vocab))

  /** Exact inverse of [[bpeTokens]]: concatenate token strings,
    * reverse the byte-to-unicode map, decode UTF-8 — byte-identical
    * round-trip (pinned in PipelineSpec), which is what lets
    * chunkDocuments reassemble chunk text from BPE windows.
    */
  def bpeDetokenize(tokens: Column): Column =
    graftshim.columnOf(BpeDetokenize(graftshim.expressionOf(tokens)))
}

/** The shared algorithm core (driver + executors). */
private[functions] object BpeCore {

  /** GPT-2's published bytes-to-unicode table: printable latin bytes
    * map to themselves; the rest shift to U+0100.. so every byte is a
    * visible, distinct char (space → 'Ġ' U+0120).
    */
  val byteToChar: Array[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    for (b <- 0 until 256) {
      if (keep(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  val charToByte: Map[Char, Int] =
    byteToChar.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** The published GPT-2 pre-tokenizer. UNICODE_CHARACTER_CLASS makes
    * \s match unicode whitespace like Python's re does.
    */
  val pretoken: Pattern = Pattern.compile(
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+(?!\\S)|\\s+",
    Pattern.UNICODE_CHARACTER_CLASS)

  def encodeBytes(s: String): String = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) { sb.append(byteToChar(bytes(i) & 0xff)); i += 1 }
    sb.toString
  }

  def decode(tokens: Iterator[String]): String = {
    val joined = tokens.mkString
    val bytes = new Array[Byte](joined.length)
    var i = 0
    while (i < joined.length) {
      bytes(i) = charToByte.getOrElse(joined.charAt(i),
        sys.error(s"not a BPE byte-alphabet char: '${joined.charAt(i)}'")).toByte
      i += 1
    }
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Merge loop over one byte-encoded pre-token: repeatedly merge ALL
    * occurrences of the lowest-rank adjacent pair.
    */
  def bpeWord(mapped: String,
      ranks: Map[(String, String), Int]): Array[String] = {
    if (mapped.length <= 1) return Array(mapped)
    var parts = mapped.map(_.toString).toArray
    var done = false
    while (!done && parts.length > 1) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < parts.length - 1) {
        val r = ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else {
        val (l, r) = (parts(bi), parts(bi + 1))
        val out = new scala.collection.mutable.ArrayBuffer[String](parts.length)
        var j = 0
        while (j < parts.length) {
          if (j < parts.length - 1 && parts(j) == l && parts(j + 1) == r) {
            out += l + r; j += 2
          } else { out += parts(j); j += 1 }
        }
        parts = out.toArray
      }
    }
    parts
  }

  /** Tokenize with a per-task memo (Zipfian pre-token reuse). */
  def tokenize(text: String, ranks: Map[(String, String), Int],
      cache: java.util.concurrent.ConcurrentHashMap[String, Array[String]])
      : scala.collection.mutable.ArrayBuffer[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String]()
    val m = pretoken.matcher(text)
    while (m.find()) {
      val mapped = encodeBytes(m.group())
      if (cache.size > 65536) cache.clear() // bound the memo
      var toks = cache.get(mapped)
      if (toks == null) {
        toks = bpeWord(mapped, ranks)
        cache.put(mapped, toks)
      }
      out ++= toks
    }
    out
  }
}

case class BpeTokenize(child: Expression,
    vocab: BpeExpressions.BpeRanks)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"
  // null text -> EMPTY token array (the budget of nothing is zero)
  override def nullable: Boolean = false

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()
  private val empty = new GenericArrayData(Array.empty[Any])

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) empty else nullSafeEval(v)
  }

  override protected def nullSafeEval(input: Any): Any = {
    val toks = BpeCore.tokenize(input.asInstanceOf[UTF8String].toString,
      vocab.ranks, cache)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenize =
    copy(child = newChild)
}

case class BpeTokenCount(child: Expression,
    vocab: BpeExpressions.BpeRanks)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_token_count"
  override def nullable: Boolean = false

  @transient private lazy val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[String]]()

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0 else nullSafeEval(v)
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeCore.tokenize(input.asInstanceOf[UTF8String].toString,
      vocab.ranks, cache).length

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

case class BpeDetokenize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "bpe_detokenize"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i).toString; i += 1 }
    UTF8String.fromString(BpeCore.decode(toks.iterator))
  }

  override protected def withNewChildInternal(newChild: Expression): BpeDetokenize =
    copy(child = newChild)
}
