package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String

/** Tight JVM kernels behind the custom Catalyst expressions. Static
  * forwarders let generated code call them as
  * `graft.functions.Kernels.cosine(...)`.
  *
  * Numeric contracts (these are pinned by the DuckDB oracle hashes):
  * element-wise products/sums accumulate in Double, strictly left to
  * right — identical to a `zip_with`+`aggregate` fold, but in one pass
  * with no per-element lambda interpretation or boxing.
  *
  * Null contract matches the higher-order-function formulations they
  * replace: mismatched lengths or a null element → null result (boxed
  * return; the expression layer translates to SQL NULL).
  */
object Kernels {

  private def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** dot(a, b); null on length mismatch / null element. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, aFloat) * elem(b, i, bFloat)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** cosine(a, b) = dot / (||a|| * ||b||), one fused pass. */
  def cosine(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, aFloat)
      val y = elem(b, i, bFloat)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Dense mat-vec y = M·v (M = outDim × inDim literal weights) — the
    * Johnson–Lindenstrauss projection kernel. Each output coordinate
    * accumulates in Double, strictly left to right (the corpus'
    * list_sum contract, so the DuckDB oracle reproduces it bit-exact).
    * Row-length mismatch or a null element → null. */
  def matVec(v: ArrayData, m: Array[Array[Double]], isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    if (m.length == 0 || m(0).length != n) return null
    val out = new Array[Double](m.length)
    var j = 0
    while (j < m.length) {
      val row = m(j)
      var s = 0.0
      var i = 0
      while (i < n) {
        if (v.isNullAt(i)) return null
        s += row(i) * elem(v, i, isFloat)
        i += 1
      }
      out(j) = s
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** euclidean distance, one pass. */
  def euclidean(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = elem(a, i, aFloat) - elem(b, i, bFloat)
      acc += d * d
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(acc))
  }

  /** 64-bit SimHash of a token array: per-token XXH64 (seed 42 — same
    * hash as the `xxhash64` builtin), per-bit ±1 votes, bit set where the
    * vote is positive. Replaces an O(tokens×64) interpreted
    * aggregate/zip_with pipeline that allocated a 64-long array per token. */
  def simhash64(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= 1L << bit
      bit += 1
    }
    java.lang.Long.valueOf(out)
  }

  /** Distinct word n-grams (space-joined, first-occurrence order) in one
    * pass. n = 1 → distinct tokens. Fewer than n tokens → empty array.
    * Null tokens are skipped inside a gram, matching `array_join`.
    * Replaces a `transform(sequence(1, cnt), i -> array_join(slice(toks,
    * i, n), ' '))` pipeline whose lambda evaluates interpreted per gram
    * with two array allocations each. */
  def ngrams(arr: ArrayData, n: Int): ArrayData = {
    val numToks = arr.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    if (n == 1) {
      var i = 0
      while (i < numToks) {
        if (!arr.isNullAt(i)) out.add(arr.getUTF8String(i))
        i += 1
      }
    } else if (numToks >= n) {
      val space = UTF8String.fromString(" ")
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i <= numToks - n) {
        var j = 0
        while (j < n) {
          parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
          j += 1
        }
        out.add(UTF8String.concatWs(space, parts: _*))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(new Array[AnyRef](out.size())))
  }

  /** Element-wise xxhash64 (seed 42 — identical to the builtin) over an
    * array<string>; null elements hash to the seed, as the builtin does
    * on null input. */
  def xxhash64Array(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Double hashes for the bloom kernels: h1 is the builtin xxhash64
    * (seed 42), h2 an independent second seed; probe i uses
    * h1 + i·h2 (Kirsch–Mitzenmacher double hashing). */
  def bloomH1(s: UTF8String): Long = XXH64.hashUTF8String(s, 42L)
  def bloomH2(s: UTF8String): Long = XXH64.hashUTF8String(s, 777L)

  /** Driver-side bitmap build: set the k probe bits for one token. */
  def bloomSet(bits: Array[Long], numBits: Int, k: Int, s: UTF8String): Unit = {
    val h1 = bloomH1(s); val h2 = bloomH2(s)
    var i = 0
    while (i < k) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
      bits(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  /** Count of array elements whose k probe bits are ALL set — the
    * might-contain count. Monotone over the true membership count
    * (false positives only ADD), which is what makes it a sound
    * pre-filter: bloom count ≥ exact count always. Null elements don't
    * count. One pass, zero allocation. */
  def bloomCountIn(arr: ArrayData, bits: Array[Long], numBits: Int, k: Int): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h1 = bloomH1(s); val h2 = bloomH2(s)
        var hit = true
        var j = 0
        while (hit && j < k) {
          val bit = java.lang.Math.floorMod(h1 + j * h2, numBits.toLong).toInt
          hit = (bits(bit >>> 6) & (1L << (bit & 63))) != 0
          j += 1
        }
        if (hit) c += 1
      }
      i += 1
    }
    c
  }

  /** 64-bit hash of the n-token gram starting at `i` in `tokH` — an
    * XXH64 chain over the tokens' individual hashes: the hash-space twin
    * of [[ngrams]]' space-joined string, never materializing the gram.
    * Identical token sequences hash identically on every side that uses
    * this kernel, which is the only property the Bloom paths need. */
  private def gramHashAt(tokH: Array[Long], i: Int, n: Int): Long = {
    var h = -7046029254386353131L // 2^64 / golden ratio
    var j = 0
    while (j < n) {
      h = XXH64.hashLong(tokH(i + j) ^ h, 42L)
      j += 1
    }
    h
  }

  /** DISTINCT word-n-gram hashes (ascending) over a token array — the
    * allocation-light twin of [[ngrams]]: one long per gram instead of a
    * concatenated UTF8String, distinctness via sort instead of a hash
    * set of strings. Two DIFFERENT grams alias at ~m²/2⁶⁴ odds per doc
    * (the same accepted risk as jaccardPairs' shingle hashing); equal
    * grams always collide, so Bloom probes built on these hashes can
    * never miss a true overlap. Fewer than n tokens → empty. */
  def ngramHashes(arr: ArrayData, n: Int): ArrayData = {
    val numToks = arr.numElements()
    if (numToks < n)
      return org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(Array.emptyLongArray)
    val tokH = new Array[Long](numToks)
    var i = 0
    while (i < numToks) {
      tokH(i) =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    val g = numToks - n + 1
    val hs = new Array[Long](g)
    i = 0
    while (i < g) { hs(i) = gramHashAt(tokH, i, n); i += 1 }
    java.util.Arrays.sort(hs)
    var uniq = 1
    i = 1
    while (i < g) { if (hs(i) != hs(i - 1)) uniq += 1; i += 1 }
    val out =
      if (uniq == g) hs
      else {
        val o = new Array[Long](uniq)
        o(0) = hs(0)
        var w = 1
        i = 1
        while (i < g) {
          if (hs(i) != hs(i - 1)) { o(w) = hs(i); w += 1 }
          i += 1
        }
        o
      }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** Double hashes over a PRE-HASHED gram (the long-keyed twins of
    * [[bloomH1]]/[[bloomH2]]). */
  def bloomH1L(h: Long): Long = XXH64.hashLong(h, 42L)
  def bloomH2L(h: Long): Long = XXH64.hashLong(h, 777L)

  /** Driver-side bitmap build over a gram HASH. */
  def bloomSetLong(bits: Array[Long], numBits: Int, k: Int, h: Long): Unit = {
    val h1 = bloomH1L(h); val h2 = bloomH2L(h)
    var i = 0
    while (i < k) {
      val bit = java.lang.Math.floorMod(h1 + i * h2, numBits.toLong).toInt
      bits(bit >>> 6) |= (1L << (bit & 63))
      i += 1
    }
  }

  /** [[bloomCountIn]] over array<long> gram hashes: count of elements
    * whose k probe bits are all set. Same monotone-superset guarantee,
    * no string hashing in the loop. */
  def bloomCountInLongs(hashes: ArrayData, bits: Array[Long], numBits: Int,
      k: Int): Int = {
    val n = hashes.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      val h1 = bloomH1L(h); val h2 = bloomH2L(h)
      var hit = true
      var j = 0
      while (hit && j < k) {
        val bit = java.lang.Math.floorMod(h1 + j * h2, numBits.toLong).toInt
        hit = (bits(bit >>> 6) & (1L << (bit & 63))) != 0
        j += 1
      }
      if (hit) c += 1
      i += 1
    }
    c
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03): hash
    * every k-byte gram (XXH64, seed 42), slide a window of w gram
    * hashes, keep each window's minimum (rightmost on ties), dedupe
    * consecutive re-selections. Guarantee: any shared substring of
    * length ≥ w+k-1 between two documents yields ≥1 shared fingerprint.
    * Texts shorter than k yield an empty array. */
  def winnow(s: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n < k) return ArrayData.toArrayData(Array.emptyLongArray)
    val m = n - k + 1
    val grams = new Array[Long](m)
    var i = 0
    while (i < m) {
      grams(i) = XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + i, k, 42L)
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    if (m <= w) {
      // single short window: rightmost minimum
      var best = 0
      var j = 1
      while (j < m) { if (grams(j) <= grams(best)) best = j; j += 1 }
      out += grams(best)
    } else {
      var lastIdx = -1
      var start = 0
      while (start <= m - w) {
        var best = start
        var j = start + 1
        while (j < start + w) { if (grams(j) <= grams(best)) best = j; j += 1 }
        if (best != lastIdx) { out += grams(best); lastIdx = best }
        start += 1
      }
    }
    ArrayData.toArrayData(out.toArray)
  }

  /** Two-level IVF list assignment: nearest coarse centroid, then
    * nearest sub-centroid within that coarse cell — list id =
    * coarse·k2max + sub. Cost per row is (k1 + k2)·dim multiply-adds
    * instead of the flat quantizer's k·dim ≈ k1·k2·dim (the FAISS
    * IVF-in-IVF recipe that keeps auto-k assignment from going
    * quadratic when k ∝ n). -1 on mismatch, ties to lowest index. */
  def twoLevelList(
      v: ArrayData, coarse: Array[Array[Double]],
      subs: Array[Array[Array[Double]]], k2max: Int, isFloat: Boolean): Int = {
    val c = nearestCentroid(v, coarse, isFloat)
    if (c < 0) return -1
    val s = nearestCentroid(v, subs(c), isFloat)
    if (s < 0) -1 else c * k2max + s
  }

  /** Index of the nearest centroid (L2) for a float/double vector; -1
    * when the vector is null-element'd or dimension-mismatched. Ties
    * break to the lowest index. */
  def nearestCentroid(v: ArrayData, centroids: Array[Array[Double]], isFloat: Boolean): Int = {
    val n = v.numElements()
    var best = -1
    var bestDist = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      val cent = centroids(c)
      if (cent.length == n) {
        var acc = 0.0
        var i = 0
        var ok = true
        while (i < n && ok) {
          if (v.isNullAt(i)) ok = false
          else {
            val d = elem(v, i, isFloat) - cent(i)
            acc += d * d
          }
          i += 1
        }
        if (ok && acc < bestDist) { bestDist = acc; best = c }
      }
      c += 1
    }
    best
  }

  /** Occurrence count of the most frequent (non-null) token. One pass
    * with a per-row hash map (rows are short; the map is transient). */
  def maxTokenFreq(arr: ArrayData): Int = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var max = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val c = counts.merge(arr.getUTF8String(i), 1, (a, b) => a + b)
        if (c > max) max = c
      }
      i += 1
    }
    max
  }

  /** max token frequency / total tokens — the word-salad/repetition
    * signal open-corpus filters use. Empty array → null. */
  def maxTokenFreqRatio(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    if (n == 0) return null
    var total = 0
    var i = 0
    while (i < n) { if (!arr.isNullAt(i)) total += 1; i += 1 }
    if (total == 0) null
    else java.lang.Double.valueOf(maxTokenFreq(arr).toDouble / total)
  }

  /** Keep only the lines of `s` (split on '\n') whose whitespace-token
    * count is ≥ minWords, rejoined with '\n' — the C4-style line filter
    * as ONE primitive pass over the bytes (the `filter(split(...), l ->
    * size(split(l)) >= n)` formulation evaluates every lambda
    * interpreted and re-splits each line). Token = maximal run of
    * non-whitespace bytes; a line of only whitespace has 0 tokens. */
  def cleanLines(s: UTF8String, minWords: Int): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var first = true
    var lineStart = 0
    val n = str.length
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == '\n') {
        var words = 0
        var inWord = false
        var j = lineStart
        while (j < i) {
          val ws = Character.isWhitespace(str.charAt(j))
          if (!ws && !inWord) { words += 1; inWord = true }
          else if (ws) inWord = false
          j += 1
        }
        if (words >= minWords) {
          if (!first) sb.append('\n')
          sb.append(str, lineStart, i)
          first = false
        }
        lineStart = i + 1
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Symmetric int8 quantization stats of a float/double vector in one
    * pass: scale = max|x| / 127, q_i = floor(x_i / scale + 0.5) (the
    * explicit-floor form, NOT round() — round-half semantics differ
    * across engines, floor(x+0.5) is identical everywhere), summed and
    * max-reconstruction-error'd without materializing the codes. Returns
    * (scale DOUBLE, q_sum BIGINT, max_err DOUBLE); an all-zero vector
    * quantizes to all-zero codes (scale 0, err 0). */
  def quantI8Stats(
      v: ArrayData, isFloat: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(elem(v, i, isFloat))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    var qSum = 0L
    var maxErr = 0.0
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        val x = elem(v, i, isFloat)
        val q = math.floor(x / scale + 0.5)
        qSum += q.toLong
        val err = math.abs(q * scale - x)
        if (err > maxErr) maxErr = err
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, qSum, maxErr))
  }

  /** Full int8 quantization: (scale DOUBLE, codes ARRAY<TINYINT>) under
    * the same contract as [[quantI8Stats]]. One pass + one primitive
    * byte array — no per-element lambda, no boxing. */
  def quantI8(
      v: ArrayData, isFloat: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(elem(v, i, isFloat))
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val scale = maxAbs / 127.0
    val codes = new Array[Byte](n)
    if (scale > 0.0) {
      i = 0
      while (i < n) {
        codes(i) = math.floor(elem(v, i, isFloat) / scale + 0.5).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      scale,
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(codes)))
  }

  /** Count of (non-null) tokens present in `set`. Null tokens don't
    * count, matching `filter(toks, t -> array_contains(set, t))`. */
  def countIn(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** Bit-spread for 2-D Morton interleave: the low 31 bits of `v`
    * spread to the even bit positions of the result. */
  private def part1by1(v: Long): Long = {
    var x = v & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** 2-D Z-order (Morton) key: interleaves the low 31 bits of two
    * NON-NEGATIVE ids (`a` in the even bits, `b` in the odd), so sorting
    * by the result clusters rows that are close in BOTH dimensions.
    * Callers must rank/bucket the raw columns into comparable magnitudes
    * first (e.g. `width_bucket`) — interleaving a 30-bit key with a
    * 10-bit key degenerates to single-column sorting. Pure bit math:
    * branchless, codegen-inlined. */
  def zorder2(a: Long, b: Long): Long =
    part1by1(a) | (part1by1(b) << 1)

  /** Unicode NFC normalization (canonical composition) — é as e+◌́
    * collapses to the single codepoint, so visually-identical strings
    * fingerprint identically. ASCII fast path: already-normalized bytes
    * skip the (allocating) Normalizer call, which is the overwhelmingly
    * common case in web corpora. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    if (isAscii(s)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
  }

  /** Accent/diacritic stripping: NFD decomposition, then every combining
    * mark (Unicode category M) removed — café → cafe. Same contract as
    * DuckDB's strip_accents for Latin text. ASCII fast path as above. */
  def stripAccents(s: UTF8String): UTF8String = {
    if (isAscii(s)) s
    else {
      val d = java.text.Normalizer.normalize(
        s.toString, java.text.Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(d.length)
      var i = 0
      while (i < d.length) {
        val cp = d.codePointAt(i)
        val t = Character.getType(cp)
        if (t != Character.NON_SPACING_MARK &&
            t != Character.COMBINING_SPACING_MARK &&
            t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
        i += Character.charCount(cp)
      }
      UTF8String.fromString(sb.toString)
    }
  }

  private def isAscii(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n) {
      if ((s.getByte(i) & 0x80) != 0) return false
      i += 1
    }
    true
  }
}
