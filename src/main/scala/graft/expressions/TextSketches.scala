package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-sketch hot path.
  *
  * The pure-`functions._` forms of these sketches (see
  * [[graft.pipelines.Dedup]]) are correct and oracle-documented, but
  * higher-order-function expressions are interpreted per element —
  * profiling showed the shingle/hash tree dominating dedup queries even
  * after algebraic fixes. These expressions compute the identical values
  * (word split ≡ `split(lower(trim(text)), "\s+")`, 48/60-bit md5-prefix
  * hashes, universal-hash permutations) in one compiled pass per row.
  *
  * Registered per-session by [[GraftFunctions.register]]; invoked via
  * `call_function`. Semantics stay bit-identical to the DuckDB oracles.
  */
object TextSketches {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First `nBytes` of md5 as an unsigned big-endian long — equal to
    * Spark's `conv(substring(md5(c), 1, 2*nBytes), 16, 10)::long`.
    */
  private def md5Prefix(s: String, nBytes: Int): Long = {
    val d = md5.get()
    d.reset()
    val bytes = d.digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < nBytes) { h = (h << 8) | (bytes(i) & 0xffL); i += 1 }
    h
  }

  /** Word split matching `split(lower(trim(text)), "\\s+")` + non-empty
    * filter: UTF8String.trim trims 0x20 only (like Spark/DuckDB `trim`),
    * lowercase via UTF8String (Spark's own lower()).
    */
  private def words(input: UTF8String): Array[String] = {
    val norm = input.trim().toLowerCase.toString
    if (norm.isEmpty) Array.empty
    else norm.split("\\s+").filter(_.nonEmpty)
  }

  /** Word w-shingles; shorter texts collapse to one whole-text shingle —
    * mirrors Dedup.shingles.
    */
  private def shingles(ws: Array[String], w: Int): Array[String] =
    if (ws.length >= w)
      Array.tabulate(ws.length - w + 1)(i =>
        ws.slice(i, i + w).mkString(" "))
    else Array(ws.mkString(" "))

  /** MinHash signature: per permutation p, min over shingles of
    * ((2p+3)·h48 + 1000003p + 12345) mod (2^31−1).
    */
  case class MinHashSig(child: Expression, numPerm: Int, shingleW: Int = 3)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val sh = shingles(words(input.asInstanceOf[UTF8String]), shingleW)
      val mins = Array.fill(numPerm)(2147483647L)
      var i = 0
      while (i < sh.length) {
        val h = md5Prefix(sh(i), 6)
        var p = 0
        while (p < numPerm) {
          val v = (h * (p * 2 + 3) + (p * 1000003L + 12345L)) % 2147483647L
          if (v < mins(p)) mins(p) = v
          p += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig =
      copy(child = c)
    override def prettyName: String = "graft_minhash_sig"
  }

  /** SimHash bit vector: every word's 48-bit hash votes ±1 per bit. */
  case class SimHashBits(child: Expression, nBits: Int)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val ws = words(input.asInstanceOf[UTF8String])
      val votes = new Array[Int](nBits)
      var i = 0
      while (i < ws.length) {
        val h = md5Prefix(ws(i), 6)
        var b = 0
        while (b < nBits) {
          if (((h >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      new GenericArrayData(votes.map(v => if (v > 0) 1 else 0))
    }
    override protected def withNewChildInternal(c: Expression): SimHashBits =
      copy(child = c)
    override def prettyName: String = "graft_simhash_bits"
  }

  /** Distinct 60-bit md5 shingle hashes (the n-gram Jaccard join key). */
  case class ShingleHashes60(child: Expression, shingleW: Int = 3)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val sh = shingles(words(input.asInstanceOf[UTF8String]), shingleW)
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var i = 0
      while (i < sh.length) {
        // 15 hex digits = 60 bits: top 7 bytes shifted down 4
        val d = md5.get(); d.reset()
        val bytes = d.digest(sh(i).getBytes("UTF-8"))
        var h = 0L
        var j = 0
        while (j < 8) { h = (h << 8) | (bytes(j) & 0xffL); j += 1 }
        seen.add(h >>> 4)
        i += 1
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression)
        : ShingleHashes60 = copy(child = c)
    override def prettyName: String = "graft_shingle_hashes60"
  }

  /** Most-frequent word w-shingle of a document: `[count, char_len]`,
    * ties broken by the byte-wise-smallest shingle string (UTF-8 order —
    * the same binary collation DuckDB's `ORDER BY` uses, so the oracle's
    * `row_number() OVER (ORDER BY c DESC, bg)` lands on the identical
    * shingle). `[0, 0]` when the text has fewer than `w` words. Fuels
    * the Gopher "top n-gram character fraction" rule, which divides
    * `count · char_len` by the document's character count — a keyword-
    * stuffed page concentrates its characters in one n-gram. One
    * hash-map pass over the shingle stream; `char_len` counts code
    * points (Spark `length` ≡ DuckDB `length`).
    */
  case class TopShingleFreq(child: Expression, shingleW: Int = 2)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val ws = words(input.asInstanceOf[UTF8String])
      if (ws.length < shingleW)
        return new GenericArrayData(Array(0L, 0L))
      if (shingleW == 2) evalPacked(ws) else evalStrings(ws)
    }

    /** Bigram fast path: intern words to dense ids, count (id, id)
      * pairs packed in one long — zero per-position string building;
      * only count-tied bigrams materialize strings for the byte-order
      * tie-break.
      */
    private def evalPacked(ws: Array[String]): Any = {
      val ids = new java.util.HashMap[String, Integer]()
      val byId = new java.util.ArrayList[String]()
      val wid = new Array[Int](ws.length)
      var i = 0
      while (i < ws.length) {
        var id = ids.get(ws(i))
        if (id == null) {
          id = Integer.valueOf(ids.size); ids.put(ws(i), id)
          byId.add(ws(i))
        }
        wid(i) = id.intValue()
        i += 1
      }
      val counts = new java.util.HashMap[java.lang.Long, java.lang.Long]()
      i = 0
      while (i < ws.length - 1) {
        val k = java.lang.Long.valueOf((wid(i).toLong << 32) | wid(i + 1))
        val prev = counts.get(k)
        counts.put(k, if (prev == null) 1L else prev + 1L)
        i += 1
      }
      var bestKey = -1L
      var bestS: UTF8String = null
      var bestC = 0L
      def strOf(key: Long): UTF8String = UTF8String.fromString(
        byId.get((key >>> 32).toInt) + " " + byId.get(key.toInt))
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > bestC) {
          bestC = e.getValue; bestKey = e.getKey; bestS = null
        } else if (e.getValue == bestC) {
          if (bestS == null) bestS = strOf(bestKey)
          val s = strOf(e.getKey)
          if (s.compareTo(bestS) < 0) { bestKey = e.getKey; bestS = s }
        }
      }
      if (bestS == null) bestS = strOf(bestKey)
      new GenericArrayData(Array(bestC, bestS.numChars().toLong))
    }

    /** General w: the straightforward string-keyed count. */
    private def evalStrings(ws: Array[String]): Any = {
      val counts = new java.util.HashMap[String, java.lang.Long]()
      var i = 0
      while (i <= ws.length - shingleW) {
        val sb = new java.lang.StringBuilder(ws(i))
        var j = 1
        while (j < shingleW) { sb.append(' ').append(ws(i + j)); j += 1 }
        val k = sb.toString
        val prev = counts.get(k)
        counts.put(k, if (prev == null) 1L else prev + 1L)
        i += 1
      }
      var bestS: UTF8String = null
      var bestC = 0L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue > bestC) {
          bestC = e.getValue
          bestS = UTF8String.fromString(e.getKey)
        } else if (e.getValue == bestC) {
          val s = UTF8String.fromString(e.getKey)
          if (s.compareTo(bestS) < 0) bestS = s
        }
      }
      new GenericArrayData(Array(bestC, bestS.numChars().toLong))
    }
    override protected def withNewChildInternal(c: Expression)
        : TopShingleFreq = copy(child = c)
    override def prettyName: String = "graft_top_shingle"
  }

  /** One-pass line/paragraph duplication counters:
    * `[ne_lines, distinct_lines, ne_paras, distinct_paras]` — the
    * inputs to the Gopher duplicate-line / duplicate-paragraph
    * fractions. Compiled twin of the declarative form in
    * [[graft.pipelines.TextAnalysis.qualityRules]]:
    *   - lines ≡ `filter(split(strip(text), "\n", -1), _ =!= "")`
    *   - paras ≡ `filter(split(strip(text), "\n{2,}", -1), _ =!= "")`
    * where `strip` removes the non-`\n` line terminators (`\r`, NEL,
    * LS, PS) exactly like the `lineText` normalization — one scan over
    * the code units instead of a regex replace plus two splits and
    * four interpreted HOF passes. A single `\n` stays inside its
    * paragraph's text (including one left dangling at end-of-input,
    * which Java's `split("\n{2,}", -1)` keeps in the final segment).
    */
  case class DupStructure(child: Expression)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val lineSet = new java.util.HashSet[String]()
      val paraSet = new java.util.HashSet[String]()
      var neLines = 0L
      var neParas = 0L
      val lineBuf = new java.lang.StringBuilder
      val paraBuf = new java.lang.StringBuilder
      var nlRun = 0
      def finishLine(): Unit = {
        if (lineBuf.length > 0) {
          neLines += 1; lineSet.add(lineBuf.toString); lineBuf.setLength(0)
        }
      }
      def finishPara(): Unit = {
        if (paraBuf.length > 0) {
          neParas += 1; paraSet.add(paraBuf.toString); paraBuf.setLength(0)
        }
      }
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\r' || c == '\u0085' || c == '\u2028' ||
            c == '\u2029') {
          // stripped line separators: invisible to lines AND paragraphs
        } else if (c == '\n') {
          finishLine()
          nlRun += 1
        } else {
          if (nlRun == 1) paraBuf.append('\n') // intra-paragraph newline
          else if (nlRun >= 2) finishPara()    // paragraph separator
          nlRun = 0
          lineBuf.append(c)
          paraBuf.append(c)
        }
        i += 1
      }
      finishLine()
      if (nlRun == 1) paraBuf.append('\n') // trailing \n stays in segment
      finishPara()
      new GenericArrayData(Array(neLines, lineSet.size.toLong,
        neParas, paraSet.size.toLong))
    }
    override protected def withNewChildInternal(c: Expression)
        : DupStructure = copy(child = c)
    override def prettyName: String = "graft_dup_structure"
  }

  /** One-pass text counters for the quality-scoring pipeline:
    * `[n_words, n_chars, n_alpha, n_punct, tok_bpe, n_cjk]`. Compiled
    * twin of the declarative forms in [[graft.pipelines.TextAnalysis]] —
    * identical values, one scan over the code points instead of six
    * interpreted regex/HOF passes:
    *   - n_words ≡ `size(filter(split(text, "\\s+"), _ =!= ""))`
    *     (maximal runs of non-`\s`; Java `\s` = ASCII space/tab/NL/VT/FF/CR)
    *   - n_chars ≡ `length(text)` (code points)
    *   - n_alpha ≡ `length(regexp_replace(text, "[^A-Za-z]", ""))`
    *   - n_punct ≡ `length(regexp_replace(text, "[^.,;:!?]", ""))`
    *   - tok_bpe ≡ `size(regexp_extract_all(text, "[A-Za-z0-9]+|[^A-Za-z0-9\\s]"))`
    *     (alnum runs + every other non-space code point)
    *   - n_cjk ≡ `size(regexp_extract_all(text, TextAnalysis.CjkClass))`
    *     (Hiragana/Katakana, CJK Unified + Ext A, Hangul syllables —
    *     the no-whitespace scripts where a word-count gate goes blind)
    */
  case class TextStats(child: Expression)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    @inline private def isWs(cp: Int): Boolean =
      cp == ' ' || (cp >= '\t' && cp <= '\r') // \t \n \x0B \f \r
    @inline private def isAlpha(cp: Int): Boolean =
      (cp >= 'A' && cp <= 'Z') || (cp >= 'a' && cp <= 'z')
    @inline private def isAlnum(cp: Int): Boolean =
      isAlpha(cp) || (cp >= '0' && cp <= '9')
    @inline private def isPunct(cp: Int): Boolean =
      cp == '.' || cp == ',' || cp == ';' || cp == ':' || cp == '!' ||
        cp == '?'
    @inline private def isCjk(cp: Int): Boolean =
      (cp >= 0x3040 && cp <= 0x30FF) || // Hiragana + Katakana
        (cp >= 0x3400 && cp <= 0x4DBF) || // CJK Unified Ext A
        (cp >= 0x4E00 && cp <= 0x9FFF) || // CJK Unified
        (cp >= 0xAC00 && cp <= 0xD7A3)    // Hangul syllables

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      var nWords = 0L; var nChars = 0L; var nAlpha = 0L; var nPunct = 0L
      var tokBpe = 0L; var nCjk = 0L
      var inWord = false
      var inAlnum = false
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        nChars += 1
        if (isWs(cp)) {
          inWord = false; inAlnum = false
        } else {
          if (!inWord) { nWords += 1; inWord = true }
          if (isAlnum(cp)) {
            if (!inAlnum) { tokBpe += 1; inAlnum = true }
          } else {
            tokBpe += 1
            inAlnum = false
          }
          if (isAlpha(cp)) nAlpha += 1
          if (isPunct(cp)) nPunct += 1
          if (isCjk(cp)) nCjk += 1
        }
        i += Character.charCount(cp)
      }
      new GenericArrayData(Array(nWords, nChars, nAlpha, nPunct, tokBpe,
        nCjk))
    }
    override protected def withNewChildInternal(c: Expression): TextStats =
      copy(child = c)
    override def prettyName: String = "graft_text_stats"
  }

  /** Greedy byte-pair encoding over a trained merge table
    * ([[graft.pipelines.TextAnalysis.trainBpe]]): the learned subword
    * tokenizer that makes token-denominated operators (budget mixing,
    * sequence packing) honest — the char-class `tok_bpe` proxy in
    * [[TextStats]] over/under-counts real subword tokens by 2-4×.
    *
    * Encoding semantics (deterministic, shared bit-for-bit with the
    * DuckDB oracle mirror): each word (the standard whitespace split,
    * lowercased) is seeded as its code-point sequence joined by the
    * `` boundary separator; merges apply strictly in training-rank
    * order, each via leftmost non-overlapping replace-all repeated to
    * fixpoint (a run `a a a a` under merge `a+a` becomes `aa aa`, never
    * `aa a a`). The merge table arrives as one literal spec string —
    * pairs `leftright` joined by `` — so the task closure
    * ships bytes, not structures, and the identical literal interpolates
    * into the oracle SQL.
    *
    * Per-task encode cache: natural text re-uses a small vocabulary
    * (Zipf), so each distinct word is encoded once per task, not once
    * per occurrence — the standard tokenizer-serving trick. The cache is
    * `@transient lazy`, so executors build their own and the driver
    * ships none; capped so adversarial vocabularies cannot balloon task
    * memory.
    */
  case class BpeEncode(child: Expression, mergesSpec: String)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType =
      ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)

    @transient private lazy val merges: Array[(String, String)] =
      if (mergesSpec.isEmpty) Array.empty
      else mergesSpec.split('').map { m =>
        val i = m.indexOf('')
        require(i > 0, s"malformed BPE merge spec entry: $m")
        val pat = "" + m.substring(0, i) + "" +
          m.substring(i + 1) + ""
        val rep = "" + m.substring(0, i) + m.substring(i + 1) +
          ""
        (pat, rep)
      }

    @transient private lazy val cache =
      new java.util.HashMap[String, Array[UTF8String]]()
    private val CacheCap = 65536

    /** Seed segmentation: ` c1  c2 … ` over code
      * points (never splits surrogate pairs; mirrors the oracle's
      * RE2 `(.)` per-code-point insertion).
      */
    private def seed(w: String): String = {
      val sb = new java.lang.StringBuilder(w.length * 2 + 1)
      sb.append('')
      var i = 0
      while (i < w.length) {
        val cp = w.codePointAt(i)
        sb.appendCodePoint(cp).append('')
        i += Character.charCount(cp)
      }
      sb.toString
    }

    private def encodeWord(w: String): Array[UTF8String] = {
      val hit = cache.get(w)
      if (hit != null) return hit
      var s = seed(w)
      var i = 0
      while (i < merges.length) {
        val (pat, rep) = merges(i)
        while (s.contains(pat)) s = s.replace(pat, rep)
        i += 1
      }
      val toks = s.split('').filter(_.nonEmpty)
        .map(UTF8String.fromString)
      if (cache.size < CacheCap) cache.put(w, toks)
      toks
    }

    override def nullSafeEval(input: Any): Any = {
      val ws = words(input.asInstanceOf[UTF8String])
      val out = Array.newBuilder[UTF8String]
      var i = 0
      while (i < ws.length) { out ++= encodeWord(ws(i)); i += 1 }
      new GenericArrayData(out.result().asInstanceOf[Array[Any]])
    }
    override protected def withNewChildInternal(c: Expression): BpeEncode =
      copy(child = c)
    override def prettyName: String = "graft_bpe_encode"
  }

  /** Count of words whose lowercase form is in a literal word set —
    * compiled twin of `size(filter(split(text, "\\s+"), w =>
    * lower(w).isin(set)))`. One pass, no per-row array materialization;
    * serves both the stopword-ratio feature and per-language marker hits.
    * The set must be a foldable literal array (it is hashed once per
    * executor, not per row).
    */
  case class WordHits(left: Expression, right: Expression)
      extends BinaryExpression with BinaryKernelCodegen {
    override def dataType: DataType = LongType

    @transient private lazy val wordSet: java.util.HashSet[String] = {
      require(right.foldable, "graft_word_hits set must be a literal array")
      val arr = right.eval(null).asInstanceOf[ArrayData]
      val s = new java.util.HashSet[String](arr.numElements() * 2)
      var i = 0
      while (i < arr.numElements()) {
        s.add(arr.getUTF8String(i).toString)
        i += 1
      }
      s
    }

    @inline private def isWs(cp: Int): Boolean =
      cp == ' ' || (cp >= '\t' && cp <= '\r')

    override def nullSafeEval(l: Any, r: Any): Any = {
      val s = l.asInstanceOf[UTF8String].toString
      val sb = new java.lang.StringBuilder(16)
      var hits = 0L
      var i = 0
      while (i <= s.length) {
        val atEnd = i == s.length
        val cp = if (atEnd) ' ' else s.codePointAt(i)
        if (isWs(cp)) {
          if (sb.length > 0) {
            if (wordSet.contains(sb.toString.toLowerCase(java.util.Locale.ROOT)))
              hits += 1
            sb.setLength(0)
          }
          i += 1
        } else {
          sb.appendCodePoint(cp)
          i += Character.charCount(cp)
        }
      }
      hits
    }
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): WordHits = copy(left = l, right = r)
    override def prettyName: String = "graft_word_hits"
  }

  /** md5-seeded uniform component in [-1, 1) — the shared deterministic
    * "randomness" for LSH hyperplanes and IVF centroids (mirrors
    * [[graft.pipelines.Similarity.planeComponentLocal]] /
    * `centroidComponent` and their DuckDB twins).
    */
  private def seededComponent(seed: String): Double =
    (md5Prefix(seed, 6) % 2000000L - 1000000L) / 1000000.0

  private def toDoubleAt(a: ArrayData, i: Int, et: DataType): Double =
    et match {
      case FloatType   => a.getFloat(i).toDouble
      case DoubleType  => a.getDouble(i)
      case IntegerType => a.getInt(i).toDouble
      case LongType    => a.getLong(i).toDouble
      case other =>
        throw new IllegalArgumentException(s"non-numeric array: $other")
    }

  /** Random-hyperplane LSH bucket as a '0'/'1' string — compiled twin of
    * [[graft.pipelines.Similarity.lshBucket]]: same plane components,
    * same ascending-dimension dot accumulation, same `>= 0` bit rule.
    * The plane matrix is materialized once per executor (lazy), not per
    * row.
    */
  case class LshBucket(child: Expression, bits: Int, dim: Int)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType =
      org.apache.spark.sql.types.StringType
    override def nullable: Boolean = true // short vectors degrade to null

    @transient private lazy val planes: Array[Array[Double]] =
      Array.tabulate(bits, dim)((p, d) => seededComponent(s"$p,$d"))

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      // ragged/short vector → null, not ArrayIndexOutOfBounds: a single
      // malformed row must degrade like the declarative twins, not fail
      // the whole job
      if (v.numElements() < dim) return null
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      val sb = new java.lang.StringBuilder(bits)
      var p = 0
      while (p < bits) {
        val plane = planes(p)
        var acc = 0.0
        var d = 0
        while (d < dim) {
          acc += toDoubleAt(v, d, et) * plane(d)
          d += 1
        }
        sb.append(if (acc >= 0) '1' else '0')
        p += 1
      }
      UTF8String.fromString(sb.toString)
    }

    override protected def withNewChildInternal(c: Expression): LshBucket =
      copy(child = c)
    override def prettyName: String = "graft_lsh_bucket"
  }

  /** IVF nearest-centroid cell — compiled twin of
    * [[graft.pipelines.Similarity.ivfCell]]: same centroid components,
    * same squared-L2 fold, ties to the lower cell id.
    */
  case class IvfCell(child: Expression, k: Int, dim: Int)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true // short vectors degrade to null

    @transient private lazy val cents: Array[Array[Double]] =
      Array.tabulate(k, dim)((c, d) => seededComponent(s"ivf:$c,$d"))

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      if (v.numElements() < dim) return null // degrade, don't fail the job
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      var bestD2 = Double.MaxValue
      var bestCell = 0
      var c = 0
      while (c < k) {
        val cent = cents(c)
        var d2 = 0.0
        var d = 0
        while (d < dim) {
          val x = toDoubleAt(v, d, et) - cent(d)
          d2 += x * x
          d += 1
        }
        if (d2 < bestD2) { bestD2 = d2; bestCell = c }
        c += 1
      }
      bestCell
    }

    override protected def withNewChildInternal(c: Expression): IvfCell =
      copy(child = c)
    override def prettyName: String = "graft_ivf_cell"
  }

  /** Per-row term counts as a map<term, count> in one compiled pass —
    * the TF side of TF-IDF without shuffling every token occurrence:
    * exploding this map ships one row per DISTINCT (doc, term) instead
    * of one per word, and the per-doc count aggregation happens in-row
    * for free. Same word split as [[MinHashSig]] (trim, lower, `\s+`).
    */
  case class TermCounts(child: Expression)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType =
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, IntegerType,
        valueContainsNull = false)

    override def nullSafeEval(input: Any): Any = {
      val ws = words(input.asInstanceOf[UTF8String])
      val counts = new java.util.LinkedHashMap[String, Int]()
      var i = 0
      while (i < ws.length) {
        counts.merge(ws(i), 1, Integer.sum)
        i += 1
      }
      val keys = new Array[AnyRef](counts.size)
      val vals = new Array[Any](counts.size)
      val it = counts.entrySet().iterator()
      var k = 0
      while (it.hasNext) {
        val e = it.next()
        keys(k) = UTF8String.fromString(e.getKey)
        vals(k) = e.getValue
        k += 1
      }
      new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        new GenericArrayData(keys), new GenericArrayData(vals))
    }
    override protected def withNewChildInternal(c: Expression): TermCounts =
      copy(child = c)
    override def prettyName: String = "graft_term_counts"
  }

  /** Nearest-centroid cell over an ARBITRARY centroid matrix passed as a
    * flattened literal array (row-major, k×dim) — the assignment step
    * for trained (k-means) IVF centroids, where [[IvfCell]]'s md5 grid
    * no longer applies. Same squared-L2 fold and lower-cell tie-break as
    * [[IvfCell]]; the matrix is unflattened once per executor.
    */
  case class IvfCellAt(left: Expression, right: Expression, dim: Int)
      extends BinaryExpression with BinaryKernelCodegen {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true // short vectors degrade to null

    @transient private lazy val cents: Array[Array[Double]] = {
      require(right.foldable, "centroid matrix must be a literal array")
      val flat = right.eval(null).asInstanceOf[ArrayData]
      require(flat.numElements() % dim == 0,
        s"flattened centroids (${flat.numElements()}) not divisible by dim $dim")
      Array.tabulate(flat.numElements() / dim, dim)((c, d) =>
        flat.getDouble(c * dim + d))
    }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val v = l.asInstanceOf[ArrayData]
      if (v.numElements() < dim) return null
      val et = left.dataType.asInstanceOf[ArrayType].elementType
      var bestD2 = Double.MaxValue
      var bestCell = 0
      var c = 0
      while (c < cents.length) {
        val cent = cents(c)
        var d2 = 0.0
        var d = 0
        while (d < dim) {
          val x = toDoubleAt(v, d, et) - cent(d)
          d2 += x * x
          d += 1
        }
        if (d2 < bestD2) { bestD2 = d2; bestCell = c }
        c += 1
      }
      bestCell
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): IvfCellAt = copy(left = l, right = r)
    override def prettyName: String = "graft_ivf_cell_at"
  }

  /** Dot product of two numeric arrays in one tight loop — the ANN hot
    * path. The declarative form `aggregate(zip_with(a, b, _*_), 0.0, +)`
    * is interpreted per element, which dominates pairwise scoring (dim
    * multiplications × |bucket|² pairs). Semantics mirror that fold
    * exactly: ascending-index double accumulation (bit-identical sums),
    * null on length mismatch or null elements (zip_with pads with null
    * and `+` propagates it).
    */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression with BinaryKernelCodegen {
    override def dataType: DataType = DoubleType

    private def elem(a: ArrayData, i: Int, et: DataType): Double =
      et match {
        case FloatType   => a.getFloat(i).toDouble
        case DoubleType  => a.getDouble(i)
        case IntegerType => a.getInt(i).toDouble
        case LongType    => a.getLong(i).toDouble
        case other =>
          throw new IllegalArgumentException(s"non-numeric array: $other")
      }

    override def nullSafeEval(l: Any, r: Any): Any = {
      val x = l.asInstanceOf[ArrayData]
      val y = r.asInstanceOf[ArrayData]
      val n = x.numElements()
      if (y.numElements() != n) return null
      val lt = left.dataType.asInstanceOf[ArrayType].elementType
      val rt = right.dataType.asInstanceOf[ArrayType].elementType
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        acc += elem(x, i, lt) * elem(y, i, rt)
        i += 1
      }
      acc
    }

    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): VecDot = copy(left = l, right = r)
    override def prettyName: String = "graft_dot"
  }

  /** L2 normalization of a numeric vector in ONE pass: the sum of
    * squares accumulates in index order — bit-identical to the
    * declarative left fold `aggregate(zip_with(v, v, _*_), 0.0, _+_)`
    * — then each element divides by `sqrt(sum)`. The declarative form
    * re-evaluates the norm subtree once PER ELEMENT inside
    * `transform` (O(dim²) interpreted work per row); this loop reads
    * the array once. A zero vector is returned unchanged (divisor 1)
    * instead of propagating NaN into downstream PQ codes; a null
    * element nulls the whole array (like [[VecDot]]).
    */
  case class VecL2Normalize(child: Expression)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)

    private def elem(a: ArrayData, i: Int, et: DataType): Double =
      et match {
        case FloatType   => a.getFloat(i).toDouble
        case DoubleType  => a.getDouble(i)
        case IntegerType => a.getInt(i).toDouble
        case LongType    => a.getLong(i).toDouble
        case other =>
          throw new IllegalArgumentException(s"non-numeric array: $other")
      }

    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val n = x.numElements()
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      val out = new Array[Double](n)
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val d = elem(x, i, et)
        out(i) = d
        acc += d * d
        i += 1
      }
      val nrm = math.sqrt(acc)
      val div = if (nrm == 0.0) 1.0 else nrm
      i = 0
      while (i < n) { out(i) = out(i) / div; i += 1 }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(
        newChild: Expression): VecL2Normalize = copy(child = newChild)
    override def prettyName: String = "graft_l2_normalize"
  }

  /** Symmetric int8 quantization of a numeric vector in ONE pass:
    * `struct(q: array<int>, scale: double)` with `q_i = round(x_i /
    * scale * 127)` (HALF_UP, away from zero — Spark `round`
    * semantics) and `scale = max |x_i|`; an all-zero vector quantizes
    * to zeros with scale 0. The declarative twin
    * ([[graft.pipelines.Similarity.quantizeInt8Declarative]]) walks
    * the array four-plus times through interpreted lambdas and cannot
    * share the max across the struct fields; this loop reads each
    * element twice. Contract divergence at degenerate inputs: a NULL
    * ELEMENT nulls the whole struct here (like [[VecDot]]) where the
    * twin nulls only the affected q slots — the parity spec covers
    * well-formed (non-null-element) vectors, which is what an
    * embedding column contains.
    */
  case class QuantizeInt8(child: Expression)
      extends UnaryExpression with UnaryKernelCodegen {
    override def dataType: DataType = StructType(Seq(
      StructField("q", ArrayType(IntegerType, containsNull = false)),
      StructField("scale", DoubleType)))

    private def elem(a: ArrayData, i: Int, et: DataType): Double =
      et match {
        case FloatType   => a.getFloat(i).toDouble
        case DoubleType  => a.getDouble(i)
        case IntegerType => a.getInt(i).toDouble
        case LongType    => a.getLong(i).toDouble
        case other =>
          throw new IllegalArgumentException(s"non-numeric array: $other")
      }

    override def nullSafeEval(v: Any): Any = {
      val x = v.asInstanceOf[ArrayData]
      val n = x.numElements()
      val et = child.dataType.asInstanceOf[ArrayType].elementType
      // empty input mirrors the declarative twin: array_max over an
      // empty array is NULL, so scale is null with an empty q
      if (n == 0)
        return org.apache.spark.sql.catalyst.InternalRow(
          new GenericArrayData(Array.emptyIntArray), null)
      var m = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i)) return null
        val d = math.abs(elem(x, i, et))
        if (d > m) m = d
        i += 1
      }
      val out = new Array[Int](n)
      if (m > 0) {
        i = 0
        while (i < n) {
          val d = elem(x, i, et) / m * 127.0
          // HALF_UP exactly as Spark round() / BigDecimal, allocation-
          // free: a − floor(a) is EXACT for a in [0, 127] (Sterbenz),
          // so comparing the fraction to 0.5 decides the tie the same
          // way BigDecimal's decimal test does. NOT floor(abs+0.5):
          // for d = 0.49999999999999994, abs+0.5 == 1.0 in IEEE
          // arithmetic and would round UP where HALF_UP rounds down.
          val a = math.abs(d)
          val fl = math.floor(a)
          val r = if (a - fl >= 0.5) fl + 1.0 else fl
          out(i) = (math.signum(d) * r).toInt
          i += 1
        }
      }
      org.apache.spark.sql.catalyst.InternalRow(
        new GenericArrayData(out), m)
    }

    override protected def withNewChildInternal(c: Expression)
        : QuantizeInt8 = copy(child = c)
    override def prettyName: String = "graft_quantize_int8"
  }
}

/** Per-session registration of the native sketch functions (idempotent;
  * survives any session the driver hands us — called from
  * [[graft.Tables]]).
  */
object GraftFunctions {
  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
      v.toString.toInt
    case other =>
      throw new IllegalArgumentException(s"$what must be a literal: $other")
  }

  private def litStr(e: Expression, what: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(null, _) => ""
    case org.apache.spark.sql.catalyst.expressions.Literal(v, _) =>
      v.toString
    case other =>
      throw new IllegalArgumentException(s"$what must be a literal: $other")
  }

  /** Name → expression builder for every native sketch function — the
    * single function table BOTH registration paths consume:
    * programmatic [[register]] and config-injected
    * [[graft.GraftExtensions]].
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash_sig" ->
      (es => TextSketches.MinHashSig(es.head, litInt(es(1), "numPerm"))),
    "graft_simhash_bits" ->
      (es => TextSketches.SimHashBits(es.head, litInt(es(1), "nBits"))),
    "graft_shingle_hashes60" ->
      (es => TextSketches.ShingleHashes60(es.head,
        if (es.length > 1) litInt(es(1), "w") else 3)),
    "graft_dup_structure" -> (es => TextSketches.DupStructure(es.head)),
    "graft_top_shingle" ->
      (es => TextSketches.TopShingleFreq(es.head,
        if (es.length > 1) litInt(es(1), "w") else 2)),
    "graft_text_stats" -> (es => TextSketches.TextStats(es.head)),
    "graft_word_hits" -> (es => TextSketches.WordHits(es.head, es(1))),
    "graft_term_counts" -> (es => TextSketches.TermCounts(es.head)),
    "graft_bpe_encode" ->
      (es => TextSketches.BpeEncode(es.head, litStr(es(1), "merges"))),
    "graft_dot" -> (es => TextSketches.VecDot(es.head, es(1))),
    "graft_l2_normalize" -> (es => TextSketches.VecL2Normalize(es.head)),
    "graft_lsh_bucket" ->
      (es => TextSketches.LshBucket(es.head, litInt(es(1), "bits"),
        litInt(es(2), "dim"))),
    "graft_ivf_cell" ->
      (es => TextSketches.IvfCell(es.head, litInt(es(1), "k"),
        litInt(es(2), "dim"))),
    "graft_ivf_cell_at" ->
      (es => TextSketches.IvfCellAt(es.head, es(1),
        litInt(es(2), "dim"))),
    "graft_quantize_int8" -> (es => TextSketches.QuantizeInt8(es.head)),
    "graft_registered_domain" ->
      (es => Domains.RegisteredDomain(es.head)),
    "graft_warc_split" -> (es => graft.sources.Warc.WarcSplit(es.head)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    // idempotent per session: pipelines call register() defensively on
    // every entry, and re-registering spams "function replaced" warnings
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot")))
      builders.foreach { case (name, builder) =>
        reg.createOrReplaceTempFunction(name, builder, "scala_udf")
      }
    // optimizer rule: declarative dot-product folds compile to VecDot
    // (idempotent append; a config-injected session already carries the
    // rule in its extended optimizer batches and skips this)
    val rules = spark.experimental.extraOptimizations
    if (!rules.contains(graft.plans.NativeSketchRewrite) &&
        !spark.sessionState.optimizer.extendedOperatorOptimizationRules
          .contains(graft.plans.NativeSketchRewrite))
      spark.experimental.extraOptimizations =
        rules :+ graft.plans.NativeSketchRewrite
  }
}
