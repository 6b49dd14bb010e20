package graft.plans

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernels for the signature expressions, written as top-level
  * methods of an object so scalac emits STATIC FORWARDERS — generated
  * whole-stage-codegen Java calls `graft.plans.HashOps.minhashSig(...)`
  * directly, and the interpreted `nullSafeEval` paths call the very
  * same code. One implementation, two execution modes.
  */
object HashOps {

  // ---- MinHash ------------------------------------------------------
  // sigLen "permutations" = affine universal hashes of ONE base XXH64:
  // π_j(s) = a_j·XXH64(s) + b_j (a_j odd, mod 2^64). Deterministic
  // fixed-seed family, memoized per sigLen.
  private val affCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def affine(sigLen: Int): (Array[Long], Array[Long]) =
    affCache.computeIfAbsent(sigLen, { n =>
      val ra = new java.util.SplittableRandom(0x9E3779B97F4A7C15L)
      val rb = new java.util.SplittableRandom(0x2545F4914F6CDD1DL)
      (Array.fill(n)(ra.nextLong() | 1L), Array.fill(n)(rb.nextLong()))
    })

  def minhashSig(arr: ArrayData, sigLen: Int): ArrayData = {
    val (a, b) = affine(sigLen)
    val sig = Array.fill(sigLen)(Long.MaxValue)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) { // null elements carry no shingle
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
        var j = 0
        while (j < sigLen) {
          val v = a(j) * h + b(j)
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  // ---- SimHash ------------------------------------------------------
  def simhash64(arr: ArrayData): Long = {
    val counters = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) { // null tokens contribute no votes
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  // ---- Hyperplane LSH bucket ---------------------------------------
  // plane_j[d] = sin(j·131 + d·7), memoized per (bits, dims).
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()
  private def planes(bits: Int, dims: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent(bits.toLong << 32 | dims.toLong, { _ =>
      Array.tabulate(bits, dims)((j, d) => math.sin(j * 131.0 + d * 7.0))
    })

  def lshBucket(arr: ArrayData, bits: Int, elemIsFloat: Boolean): UTF8String = {
    val n = arr.numElements()
    val v = new Array[Double](n)
    var d = 0
    while (d < n) {
      v(d) = if (arr.isNullAt(d)) 0.0 // null dims contribute nothing
        else if (elemIsFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      d += 1
    }
    val ps = planes(bits, n)
    val sb = new java.lang.StringBuilder(bits)
    var j = 0
    while (j < bits) {
      val p = ps(j)
      var acc = 0.0
      d = 0
      while (d < n) { acc += v(d) * p(d); d += 1 }
      sb.append(if (acc >= 0.0) '1' else '0')
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  // ---- Character bigrams -------------------------------------------
  def charBigrams(input: UTF8String): ArrayData = {
    val s = input.toLowerCase.toString
    val n = s.length
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = UTF8String.fromString(s.substring(i, i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }

  // ---- Tokenizer ----------------------------------------------------
  def tokens(input: UTF8String): ArrayData = {
    val s = input.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        while (i < len && {
          val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        out += UTF8String.fromString(s.substring(start, i))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  // ---- Minimal English stemmer ---------------------------------------
  // Bounded suffix-rule stemmer (the Lucene EnglishMinimalStemFilter
  // shape, extended with -ies/-ing/-ed): ordered first-match rules
  // with min-length guards, deliberately small enough to replicate
  // term-for-term in the DuckDB oracle's SQL CASE. Applied identically
  // at index build and query time (FullText's `english` analyzer).
  def stemWord(t: String): String = {
    val n = t.length
    if (n >= 5 && t.endsWith("ies")) t.substring(0, n - 3) + "y"
    else if (t.endsWith("sses")) t.substring(0, n - 2)
    else if (n >= 6 && t.endsWith("ing")) t.substring(0, n - 3)
    else if (n >= 5 && t.endsWith("ed")) t.substring(0, n - 2)
    else if (n >= 4 && t.endsWith("s") && !t.endsWith("ss") &&
      !t.endsWith("us") && !t.endsWith("is")) t.substring(0, n - 1)
    else t
  }

  def stem(input: UTF8String): UTF8String = {
    val s = input.toString
    val r = stemWord(s)
    if (r eq s) input else UTF8String.fromString(r)
  }

  // ---- Word shingles ------------------------------------------------
  def wordShingles(input: UTF8String, n: Int): ArrayData = {
    val s = input.toLowerCase.toString
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        while (i < len && {
          val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        toks += s.substring(start, i)
      } else i += 1
    }
    val out = new java.util.LinkedHashSet[String]()
    if (toks.length <= n) {
      if (toks.nonEmpty) out.add(toks.mkString(" "))
    } else {
      var w = 0
      while (w <= toks.length - n) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(w + j)); j += 1
        }
        out.add(sb.toString); w += 1
      }
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  // ---- Word n-grams (non-distinct, in order) -----------------------
  // Unlike wordShingles this keeps the full n-gram MULTISET (len-n+1
  // windows; empty when fewer than n tokens) — repetition statistics
  // need counts, not the distinct set.
  def wordNgrams(input: UTF8String, n: Int): ArrayData = {
    val s = input.toLowerCase.toString
    val toks = new scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        while (i < len && {
          val d = s.charAt(i); (d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')
        }) i += 1
        toks += s.substring(start, i)
      } else i += 1
    }
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var w = 0
    while (w <= toks.length - n) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(w + j)); j += 1
      }
      out(w) = UTF8String.fromString(sb.toString); w += 1
    }
    new GenericArrayData(out)
  }

  // ---- Int8 symmetric quantization ---------------------------------
  // q_i = round_half_away(x_i · 127 / max|x|). One pass for the max,
  // one for the codes — the HOF form inlined the max INTO the
  // per-element lambda and recomputed it per element (O(d²)
  // interpreted). Rounding is half-away-from-zero, matching Spark's
  // round() and DuckDB's ROUND() exactly.
  def quantizeI8(arr: ArrayData, elemIsFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    var mx = 1e-30
    var i = 0
    def elem(k: Int): Double = // null dims read as 0 (codec-stable)
      if (arr.isNullAt(k)) 0.0
      else if (elemIsFloat) arr.getFloat(k).toDouble else arr.getDouble(k)
    while (i < n) {
      val v = math.abs(elem(i))
      if (v > mx) mx = v
      i += 1
    }
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      val x = elem(i)
      val v = x * 127.0 / mx
      out(i) = (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  // ---- Integer dot product (quantized vectors) ---------------------
  def dotInt(a: ArrayData, b: ArrayData): Long = {
    // ragged pairs are data corruption (a re-quantized corpus mixing
    // dimensions): a prefix dot would be plausible-but-wrong, so fail
    // loudly — same contract as PqOps.checkDims
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"dotInt over ragged vectors: ${a.numElements()} vs ${b.numElements()} dims")
    val n = a.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) // null codes contribute 0
        acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    acc
  }

  // ---- Cosine similarity -------------------------------------------
  // NOTE null ELEMENTS are treated as 0.0 here (vectors are expected
  // non-null-element; the composed HOF form would return NULL instead)
  // — ragged dimension pairs, by contrast, fail loudly (see dotInt).
  def cosine(a: ArrayData, b: ArrayData, aIsFloat: Boolean, bIsFloat: Boolean): Double = {
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"cosine over ragged vectors: ${a.numElements()} vs ${b.numElements()} dims")
    val n = a.numElements()
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0
        else if (aIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0
        else if (bIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    // zero-norm guard: 0/0 is NaN, and NaN sorts GREATER than every
    // real double in Spark's ordering — one all-zero (padded/missing)
    // vector would otherwise surface as the rank-1 neighbor of every
    // query. Similarity to the zero vector is 0, not NaN.
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else dot / denom
  }

  /** Negated squared L2 (the IVF coarse-probe metric): −Σ(x−y)².
    * Null elements read as 0.0, like [[cosine]]. One tight loop — the
    * zip_with+aggregate HOF form this replaces evaluated interpreted
    * per-element lambdas, n·k·d of them per corpus assignment. */
  def negL2(a: ArrayData, b: ArrayData, aIsFloat: Boolean, bIsFloat: Boolean): Double = {
    if (a.numElements() != b.numElements())
      throw new IllegalArgumentException(
        s"negL2 over ragged vectors: ${a.numElements()} vs ${b.numElements()} dims")
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0
        else if (aIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0
        else if (bIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      s += d * d
      i += 1
    }
    -s
  }
}
