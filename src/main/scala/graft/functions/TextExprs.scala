package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the shingle→minhash pipeline.
  *
  * The HOF formulations (`transform`/`array_min` chains) evaluate an
  * interpreted lambda per ELEMENT (~µs each — 24M calls at sf0.1).
  * These evaluate once per ROW with the loop in compiled Scala,
  * producing bit-identical values (md5 prefix == conv(substring(
  * md5_hex,1,8),16,10); same (a*h+b) mod P family), so the DuckDB
  * oracles are unchanged. CodegenFallback is fine here: the md5 work
  * dominates and per-row (not per-element) interpretation overhead is
  * negligible.
  */
case class ShingleHashExpr(child: Expression, k: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (s.length >= k) {
      var i = 0
      val max = s.length - k
      while (i <= max) {
        md.reset()
        val h = md.digest(s.substring(i, i + k).getBytes("UTF-8"))
        seen.add(hash32(h))
        i += 1
      }
    } else {
      md.reset()
      seen.add(hash32(md.digest(s.getBytes("UTF-8"))))
    }
    val arr = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  /** First 8 md5 hex digits as an unsigned 32-bit value — identical
    * to conv(substring(md5(s), 1, 8), 16, 10).
    */
  private def hash32(digest: Array[Byte]): Long =
    ((digest(0) & 0xffL) << 24) | ((digest(1) & 0xffL) << 16) |
      ((digest(2) & 0xffL) << 8) | (digest(3) & 0xffL)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct md5-prefix hashes of an array of strings (same hash32 as
  * ShingleHashExpr) — for pre-built shingle/ngram string arrays.
  */
case class HashStringsExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      md.reset()
      val h = md.digest(arr.getUTF8String(i).getBytes)
      seen.add(
        ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) | ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      )
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature over a pre-hashed shingle array: element i is
  * min over h of (a_i*h + b_i) mod P (graft.operators.Dedup family).
  */
case class MinHashSigExpr(child: Expression, nHashes: Int, p: Long, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData].toLongArray()
    val out = new Array[Long](nHashes)
    var i = 0
    while (i < nHashes) {
      val a = as(i)
      val b = bs(i)
      var m = Long.MaxValue
      var j = 0
      while (j < hs.length) {
        val v = (a * hs(j) + b) % p
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SimHash fingerprint over a token array: per bit j, the majority
  * vote of bit (j%4) of md5-hex-nibble (j/4) across all (duplicate-
  * counted) tokens. Bit-identical to the HOF/DuckDB formulation
  * (md5 hex digit p = high/low nibble of digest byte p/2).
  */
case class SimHashExpr(child: Expression, bits: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](bits)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < bits) {
        val hexPos = j / 4 // 0-based hex digit index
        val b = d(hexPos / 2) & 0xff
        val nibble = if (hexPos % 2 == 0) b >> 4 else b & 0xf
        if (((nibble >> (j % 4)) & 1) == 1) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Wide SimHash fingerprint: same per-bit majority-vote rule as
  * [[SimHashExpr]] extended past 60 bits, packed 60 bits per long so
  * every word stays non-negative in signed 64-bit engines (Spark
  * LongType, DuckDB BIGINT). Word k holds global bits
  * [60k, 60k+60); global bit j votes on bit (j%4) of md5 hex digit
  * (j/4), so bits 0..59 of word 0 are bit-identical to
  * [[SimHashExpr]](bits=60). One md5 per token total (not per word).
  * bits <= 120 (30 of md5's 32 hex digits).
  */
case class SimHashWideExpr(child: Expression, bits: Int) extends UnaryExpression with CodegenFallback {
  require(bits >= 1 && bits <= 120, s"wide simhash supports 1..120 bits, got $bits")

  private val nWords = (bits + 59) / 60

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](bits)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < bits) {
        val hexPos = j / 4 // 0-based hex digit index
        val b = d(hexPos / 2) & 0xff
        val nibble = if (hexPos % 2 == 0) b >> 4 else b & 0xf
        if (((nibble >> (j % 4)) & 1) == 1) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    val out = new Array[Long](nWords)
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out(j / 60) |= 1L << (j % 60)
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** All Gopher-style intra-document repetition statistics from ONE
  * pass over the (already filtered, non-empty) token array:
  * (n_tokens, n_distinct_tokens, dup_2gram_frac, dup_3gram_frac,
  * top_3gram_count, top_3gram, top_3gram_token_frac).
  *
  * Bit-identical to the declarative TextAnalysis composition
  * (dupNgramFrac / topNgram): counts are exact integers, every
  * double is a single int/int division, the top-gram tiebreak is
  * (count desc, gram asc) under binary UTF8 order — the same order
  * array_sort + strict-> fold and DuckDB's ORDER BY use. The HOF
  * formulation re-tokenized the text ~8x and folded interpreted
  * lambdas per element (6.9 s at sf0.1); this is one compiled loop
  * per row.
  */
case class NgramStatsExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}

  override def dataType: DataType = StructType(
    Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_distinct_tokens", LongType, nullable = false),
      StructField("dup_2gram_frac", DoubleType, nullable = false),
      StructField("dup_3gram_frac", DoubleType, nullable = false),
      StructField("top_3gram_count", LongType, nullable = false),
      StructField("top_3gram", StringType, nullable = false),
      StructField("top_3gram_token_frac", DoubleType, nullable = false),
    )
  )

  private val SP = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }

    val distinctTok = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < n) { distinctTok.add(toks(i)); i += 1 }

    val set2 = new java.util.HashSet[UTF8String]()
    i = 0
    while (i < n - 1) { set2.add(UTF8String.concat(toks(i), SP, toks(i + 1))); i += 1 }

    val map3 = new java.util.HashMap[UTF8String, Int]()
    i = 0
    while (i < n - 2) {
      val g = UTF8String.concat(toks(i), SP, toks(i + 1), SP, toks(i + 2))
      map3.merge(g, 1, (a, b) => a + b)
      i += 1
    }

    var topCnt = 0
    var topGram: UTF8String = UTF8String.EMPTY_UTF8
    val it = map3.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > topCnt || (c == topCnt && topCnt > 0 && e.getKey.compareTo(topGram) < 0)) {
        topCnt = c
        topGram = e.getKey
      }
    }

    val total2 = math.max(n - 1, 0)
    val total3 = math.max(n - 2, 0)
    val dup2 = if (total2 == 0) 0.0 else (total2 - set2.size()).toDouble / total2.toDouble
    val dup3 = if (total3 == 0) 0.0 else (total3 - map3.size()).toDouble / total3.toDouble
    val topFrac = if (n == 0) 0.0 else (topCnt * 3).toDouble / n.toDouble
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, distinctTok.size().toLong, dup2, dup3, topCnt.toLong, topGram, topFrac)
    )
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Single-pass language ID over a token array: count per-profile
  * stopword hits, return the language of the max count (first profile
  * wins ties). Bit-identical to the declarative per-profile
  * `size(filter(tokens, t => array_contains(stops, t)))` score argmax:
  * every profile's score shares the denominator max(nTok, 1), so the
  * (score, -index) lexicographic max reduces to exact integer
  * (count, -index) comparison — no floating point anywhere. The HOF
  * form evaluated five interpreted filter lambdas per row, each
  * re-deriving the token array from the raw text (no CSE across HOFs).
  */
case class LangIdExpr(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  @transient private lazy val langs: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray

  @transient private lazy val lookup: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    profiles.zipWithIndex.foreach { case ((_, stops), pi) =>
      stops.foreach { s =>
        val k = UTF8String.fromString(s)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(pi) else prev :+ pi)
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](profiles.length)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val hit = lookup.get(arr.getUTF8String(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    var best = 0
    i = 1
    while (i < counts.length) {
      if (counts(i) > counts(best)) best = i
      i += 1
    }
    langs(best)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Space-joined word n-gram md5-prefix hashes in one native pass over
  * the token array — replaces the interpreted zip_with/transform gram
  * builders (one lambda call per GRAM, each concatenating strings)
  * followed by a second hashing pass. Values are bit-identical to
  * `conv(substring(md5(gram), 1, hexChars), 16, 10)` over the same
  * grams, so every DuckDB oracle is unchanged.
  *
  * @param hexChars md5 hex prefix length (8 → 32-bit, 15 → 60-bit)
  * @param distinct keep first occurrence of each hash value (the
  *   wordNgrams→hashStrings composition: array_distinct on strings
  *   then LinkedHashSet on values ≡ distinct-on-hash in order)
  * @param shortJoinAll when fewer than n tokens, emit ONE gram of all
  *   tokens space-joined (wordNgrams fallback; empty array → hash of
  *   ""); when false, emit the empty array (ngramsOfTokens semantics)
  */
case class NgramHashExpr(
    child: Expression,
    n: Int,
    hexChars: Int,
    distinct: Boolean,
    shortJoinAll: Boolean,
) extends UnaryExpression with CodegenFallback {
  require(n >= 1 && hexChars >= 1 && hexChars <= 15)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    val md = java.security.MessageDigest.getInstance("MD5")
    val toks = new Array[Array[Byte]](len)
    var i = 0
    while (i < len) { toks(i) = arr.getUTF8String(i).getBytes; i += 1 }

    def hashOf(b: Array[Byte]): Long = {
      md.reset()
      val h = md.digest(b)
      val full = hexChars / 2
      var v = 0L
      var k = 0
      while (k < full) { v = (v << 8) | (h(k) & 0xffL); k += 1 }
      if (hexChars % 2 == 1) v = (v << 4) | ((h(full) & 0xffL) >>> 4)
      v
    }
    def joined(start: Int, cnt: Int): Array[Byte] = {
      var size = if (cnt == 0) 0 else cnt - 1
      var k = 0
      while (k < cnt) { size += toks(start + k).length; k += 1 }
      val b = new Array[Byte](size)
      var pos = 0
      k = 0
      while (k < cnt) {
        if (k > 0) { b(pos) = ' '; pos += 1 }
        val t = toks(start + k)
        System.arraycopy(t, 0, b, pos, t.length)
        pos += t.length
        k += 1
      }
      b
    }

    val out = new java.util.ArrayList[java.lang.Long]()
    val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
    def emit(v: Long): Unit = if (seen == null || seen.add(v)) out.add(v)
    if (len < n) {
      if (shortJoinAll) emit(hashOf(joined(0, len)))
    } else {
      i = 0
      while (i <= len - n) { emit(hashOf(joined(i, n))); i += 1 }
    }
    val res = new Array[Long](out.size())
    var j = 0
    while (j < res.length) { res(j) = out.get(j); j += 1 }
    new GenericArrayData(res)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Single-pass Gopher rule counts over the RAW text (one eval per
  * document replaces ~6 interpreted array-HOF passes that each
  * re-derive the token array — the LangIdExpr precedent). Pinned
  * bit-equal to the declarative form (TextAnalysis.gopherFilterHof)
  * it replaces:
  *  - tokens: maximal non-\s runs of lower(text), Java \s set
  *    ([ \t\n\f\r] — regexp_replace('\s+')'s exact class);
  *    lengths in code points (Catalyst length() semantics);
  *  - lines: '\n'-separated with trailing empties kept (split limit
  *    -1), bullet = raw startsWith "- "/"* "/"•", ellipsis = ends
  *    with "..."/"…" after trailing-SPACE rtrim (Catalyst rtrim);
  *  - symbols: '#' chars + leftmost non-overlapping "..." triples +
  *    '…' chars.
  * Only the integer counts live here; the ratio/verdict FP trees
  * stay declarative so the oracle contract is untouched.
  */

/** Single-pass quality-score counts: one traversal of the raw text
  * replacing qualityScore's three interpreted passes (two
  * tokenize+filter HOF chains + a regexp_extract_all match-array
  * build — measured 50.8 s for 100k docs at the sf10 bench, ~9x the
  * single-pass form). Integer-count semantics are EXACTLY the
  * column-tree twin's:
  *  - n_chars  = length(text)                      (code points)
  *  - n_tok    = size(filter(split(normText, " "), _ != "")) — the
  *               number of non-whitespace runs (Java regex ASCII \s)
  *  - punct    = size(regexp_extract_all(text, "[^a-zA-Z0-9\\s]")) —
  *               code points neither ASCII-alnum nor ASCII-ws
  *  - stop_hits = count of lowered tokens in the English stop list
  * Pinned bit-equal to the HOF twin in PipelineOpsSpec.
  */
case class QualityStatsExpr(child: Expression, stops: Seq[String])
    extends UnaryExpression with CodegenFallback {

  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(
    Seq("n_chars", "n_tok", "punct", "stop_hits")
      .map(StructField(_, LongType, nullable = false))
  )

  private val stopArr = stops.toArray

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    // raw text for the char/punct counts (length()/regexp twins run
    // on the raw column); stop matching lowers per token (strict-ASCII
    // fold fast path, real toLowerCase for tokens with any non-ASCII
    // char) — token BOUNDARIES are ws-runs, which lowercasing never
    // changes, so lowering per token equals the twin's whole-text lower
    val raw = input.asInstanceOf[UTF8String].toString
    val n = raw.length
    // the twin lowers the WHOLE text via Catalyst lower() =
    // UTF8String.toLowerCase, whose ASCII byte-fold fast path applies
    // only when the ENTIRE string is ASCII — one non-ASCII char
    // anywhere sends the whole string (pure-ASCII tokens included)
    // through default-locale String.toLowerCase. Decide per string,
    // not per token (r13 advice): under a tr/az default locale a
    // pure-ASCII token inside a non-ASCII document must lower
    // 'I'→U+0131 like the twin, not 'I'→'i'.
    var docAscii = true
    var a = 0
    while (docAscii && a < n) { if (raw.charAt(a) >= 0x80) docAscii = false; a += 1 }
    var nChars = 0L
    var nTok = 0L
    var punct = 0L
    var stopHits = 0L
    var i = 0
    while (i < n) {
      while (i < n && isWs(raw.charAt(i))) { nChars += 1; i += 1 }
      if (i < n) {
        val start = i
        while (i < n && !isWs(raw.charAt(i))) {
          val cp = raw.codePointAt(i)
          nChars += 1
          val alnum = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
            (cp >= '0' && cp <= '9')
          if (!alnum) punct += 1
          i += Character.charCount(cp)
        }
        nTok += 1
        val len = i - start
        // stop match = lower(token) == stop, exactly as the twin's
        // lower()-then-compare. regionMatches(ignoreCase) is WRONG
        // here: its per-char Character.toUpperCase folds U+0131
        // dotless-i and U+017F long-s onto ASCII ('ı'→'I', 'ſ'→'S'),
        // which String.toLowerCase does not (r12 advice). The ASCII
        // fold applies only when the WHOLE document is ASCII (docAscii
        // above); otherwise every token — pure-ASCII ones included —
        // takes the real toLowerCase, so Kelvin-sign-class and
        // tr/az-locale mappings stay bit-equal to the twin. Per-token
        // substring lowering equals the twin's whole-text lowering
        // sliced at token boundaries: ws separators are neither cased
        // nor case-ignorable, so the context-sensitive mappings
        // (Final_Sigma, lt After_Soft_Dotted) never cross a boundary.
        var sIdx = 0
        var hit = false
        if (docAscii) {
          while (!hit && sIdx < stopArr.length) {
            val sw = stopArr(sIdx)
            if (sw.length == len) {
              var j = 0
              var ok = true
              while (ok && j < len) {
                var a = raw.charAt(start + j)
                if (a >= 'A' && a <= 'Z') a = (a + 32).toChar
                if (a != sw.charAt(j)) ok = false
                j += 1
              }
              if (ok) hit = true
            }
            sIdx += 1
          }
        } else {
          val lowered = raw.substring(start, i).toLowerCase
          while (!hit && sIdx < stopArr.length) {
            if (stopArr(sIdx) == lowered) hit = true
            sIdx += 1
          }
        }
        if (hit) stopHits += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nChars, nTok, punct, stopHits)
    )
  }

  override protected def withNewChildInternal(newChild: Expression): QualityStatsExpr =
    copy(child = newChild)
}

case class GopherStatsExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(
    Seq("n_words", "lensum", "alpha", "stop_distinct", "bl", "el", "nl", "sym")
      .map(StructField(_, LongType, nullable = false))
  )

  private val stops =
    Array("the", "be", "to", "of", "and", "that", "have", "with")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    // token pass over the lowered text (lowercasing first, exactly
    // like lower(trim(text)) — trim only strips spaces, which cannot
    // change the run decomposition)
    val low = raw.toLowerCase
    val n = low.length
    var nWords = 0L
    var lensum = 0L
    var alpha = 0L
    val stopSeen = new Array[Boolean](stops.length)
    var i = 0
    while (i < n) {
      while (i < n && isWs(low.charAt(i))) i += 1
      if (i < n) {
        val start = i
        var hasAlpha = false
        while (i < n && !isWs(low.charAt(i))) {
          val c = low.charAt(i)
          if (c >= 'a' && c <= 'z') hasAlpha = true
          i += 1
        }
        nWords += 1
        lensum += low.codePointCount(start, i)
        if (hasAlpha) alpha += 1
        val len = i - start
        var s = 0
        while (s < stops.length) {
          if (!stopSeen(s) && stops(s).length == len &&
            low.regionMatches(start, stops(s), 0, len)) stopSeen(s) = true
          s += 1
        }
      }
    }
    var stopDistinct = 0L
    var sIdx = 0
    while (sIdx < stops.length) { if (stopSeen(sIdx)) stopDistinct += 1; sIdx += 1 }
    // line pass over the raw text
    val rn = raw.length
    var nl = 1L
    var bl = 0L
    var el = 0L
    var lineStart = 0
    def closeLine(endExcl: Int): Unit = {
      val len = endExcl - lineStart
      if ((len >= 2 && raw.charAt(lineStart) == '-' && raw.charAt(lineStart + 1) == ' ') ||
        (len >= 2 && raw.charAt(lineStart) == '*' && raw.charAt(lineStart + 1) == ' ') ||
        (len >= 1 && raw.charAt(lineStart) == '•')) bl += 1
      var e = endExcl
      while (e > lineStart && raw.charAt(e - 1) == ' ') e -= 1
      val tl = e - lineStart
      if ((tl >= 3 && raw.charAt(e - 1) == '.' && raw.charAt(e - 2) == '.' && raw.charAt(e - 3) == '.') ||
        (tl >= 1 && raw.charAt(e - 1) == '…')) el += 1
    }
    var j = 0
    while (j < rn) {
      if (raw.charAt(j) == '\n') { closeLine(j); nl += 1; lineStart = j + 1 }
      j += 1
    }
    closeLine(rn)
    // symbol pass over the raw text
    var hash = 0L
    var uel = 0L
    var dots = 0L
    var p = 0
    while (p < rn) {
      val c = raw.charAt(p)
      if (c == '#') { hash += 1; p += 1 }
      else if (c == '…') { uel += 1; p += 1 }
      else if (c == '.' && p <= rn - 3 && raw.charAt(p + 1) == '.' && raw.charAt(p + 2) == '.') {
        dots += 1; p += 3
      } else p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nWords, lensum, alpha, stopDistinct, bl, el, nl, hash + dots + uel)
    )
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Single-pass token counts: ws_tokens + bpe_tokens in one traversal
  * each, replacing token_count's two interpreted passes — a
  * regexp_replace + split + filter-HOF chain for the whitespace
  * count and a regexp_extract_all MATCH-ARRAY build (allocating every
  * match string just to take the array's size) for the BPE-ish count.
  * Integer semantics are exactly the column-tree twins':
  *  - ws_tokens  = size(filter(split(normText, " "), _ != "")) —
  *    the number of maximal non-\s runs of the raw text (Java regex
  *    ASCII \s = [ \t\n\x0B\f\r]; trim/lower cannot change run
  *    boundaries);
  *  - bpe_tokens = size(regexp_extract_all(lower(text),
  *    '[a-z]+|[0-9]+|[^a-z0-9\s]')) — over the LOWERED text
  *    (String.toLowerCase, the same call Catalyst's Lower makes for
  *    non-ASCII input), maximal [a-z] runs + maximal [0-9] runs +
  *    one per remaining non-\s CODE POINT (Java regex matches whole
  *    code points, so an astral char is one token, not two
  *    surrogate tokens).
  * Pinned bit-equal to the HOF twins in PipelineOpsSpec.
  */
case class TokenCountsExpr(child: Expression) extends UnaryExpression with CodegenFallback {

  import org.apache.spark.sql.types.{StructField, StructType}

  override def dataType: DataType = StructType(
    Seq("ws_tokens", "bpe_tokens").map(StructField(_, LongType, nullable = false))
  )

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  override def nullSafeEval(input: Any): Any = {
    val raw = input.asInstanceOf[UTF8String].toString
    // ws pass: count maximal non-\s runs of the raw text
    val n = raw.length
    var ws = 0L
    var inRun = false
    var i = 0
    while (i < n) {
      if (isWs(raw.charAt(i))) inRun = false
      else if (!inRun) { ws += 1; inRun = true }
      i += 1
    }
    // bpe pass: lowered text (lowering can change length — İ → i +
    // U+0307 — so this is NOT derivable from the raw-text pass).
    // Mirror UTF8String.toLowerCase exactly (r13 advice): Catalyst's
    // lower() byte-folds a PURE-ASCII string locale-independently and
    // only falls back to default-locale String.toLowerCase when any
    // non-ASCII byte exists — an unconditional String.toLowerCase
    // would map ASCII 'I' to U+0131 under a tr/az default locale and
    // break the bit-equal pin against the column twin.
    var ascii = true
    var q = 0
    while (ascii && q < n) { if (raw.charAt(q) >= 0x80) ascii = false; q += 1 }
    val low =
      if (ascii) {
        val cs = new Array[Char](n)
        var p = 0
        while (p < n) {
          val c = raw.charAt(p)
          cs(p) = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
          p += 1
        }
        new String(cs)
      } else raw.toLowerCase
    val m = low.length
    var bpe = 0L
    var state = 0 // 0 = none/ws, 1 = in [a-z] run, 2 = in [0-9] run
    var j = 0
    while (j < m) {
      val c = low.charAt(j)
      if (c >= 'a' && c <= 'z') {
        if (state != 1) { bpe += 1; state = 1 }
        j += 1
      } else if (c >= '0' && c <= '9') {
        if (state != 2) { bpe += 1; state = 2 }
        j += 1
      } else if (isWs(c)) { state = 0; j += 1 }
      else {
        // one token per code point: skip the low surrogate of a pair
        bpe += 1; state = 0
        j += (if (Character.isHighSurrogate(c) && j + 1 < m &&
            Character.isLowSurrogate(low.charAt(j + 1))) 2
          else 1)
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](ws, bpe))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextExprs {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{toColumn, toExpression}

  def shingleHashes(text: Column, k: Int): Column =
    toColumn(ShingleHashExpr(toExpression(text), k))

  def hashStrings(arr: Column): Column =
    toColumn(HashStringsExpr(toExpression(arr)))

  def simhash(tokens: Column, bits: Int): Column =
    toColumn(SimHashExpr(toExpression(tokens), bits))

  def simhashWide(tokens: Column, bits: Int): Column =
    toColumn(SimHashWideExpr(toExpression(tokens), bits))

  def minhashSig(hashed: Column, nHashes: Int, p: Long, as: Seq[Long], bs: Seq[Long]): Column =
    toColumn(MinHashSigExpr(toExpression(hashed), nHashes, p, as, bs))

  def ngramStats(tokens: Column): Column =
    toColumn(NgramStatsExpr(toExpression(tokens)))

  def langIdOfTokens(tokens: Column, profiles: Seq[(String, Seq[String])]): Column =
    toColumn(LangIdExpr(toExpression(tokens), profiles))

  /** Distinct 32-bit n-gram hashes (wordNgrams→hashStrings twin). */
  def wordNgramHashes(tokens: Column, n: Int): Column =
    toColumn(NgramHashExpr(toExpression(tokens), n, 8, distinct = true, shortJoinAll = true))

  /** Position-ordered 60-bit n-gram hashes (ngramsOfTokens→md5 twin). */
  def gramHashes60(tokens: Column, n: Int): Column =
    toColumn(NgramHashExpr(toExpression(tokens), n, 15, distinct = false, shortJoinAll = false))

  /** Position-ordered 32-bit n-gram hashes (non-distinct, no fallback). */
  def gramHashes32(tokens: Column, n: Int): Column =
    toColumn(NgramHashExpr(toExpression(tokens), n, 8, distinct = false, shortJoinAll = false))

  /** Single-pass Gopher rule integer counts (struct of 8 longs). */
  def gopherStats(text: Column): Column =
    toColumn(GopherStatsExpr(toExpression(text)))

  /** Single-pass quality-score counts (struct of 4 longs). */
  def qualityStats(text: Column, stops: Seq[String]): Column =
    toColumn(QualityStatsExpr(toExpression(text), stops))

  /** Single-pass ws + BPE-ish token counts (struct of 2 longs). */
  def tokenCounts(text: Column): Column =
    toColumn(TokenCountsExpr(toExpression(text)))
}
