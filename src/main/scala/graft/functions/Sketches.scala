package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled sketch kernels for the dedup/similarity node family.
  *
  * The pure-SQL formulations (`transform(sequence(...), i -> array_min(...))`
  * etc.) are correct but run in Catalyst's interpreted higher-order-function
  * evaluator: one closure dispatch + boxing per element per hash. These
  * expressions hash each token/shingle ONCE (xxhash64) and derive the k
  * hash-family members with a 64-bit finalizer mix — O(elements * k) compiled
  * arithmetic, no allocation per step. They are CodegenFallback on purpose:
  * the per-row work is thousands of compiled ops, so the fallback's boxed
  * row-at-a-time overhead is noise, while a doGenCode variant would just
  * inline the same loops.
  *
  * All are deterministic pure functions of their input — safe at any
  * parallelism, no seeds carried in state.
  */
object Mix {
  /** splitmix64 finalizer — a well-distributed 64->64 mixer (public domain). */
  @inline def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  @inline def hashString(s: UTF8String): Long =
    XxHash64Function.hash(s, StringType, 42L)
}

/** shingle_hashes(tokens, n[, dedup=true]) -> array<long>: hash of each
  * n-word shingle, built by mixing the word hashes — no string concatenation,
  * no per-shingle allocation. Jaccard over hashed shingles is the standard
  * MinHash formulation (collision odds ~2^-64 are noise next to the sketch's
  * own error). Default output is the sorted DISTINCT set (deterministic,
  * diff-friendly — what the dedup/similarity family wants); `dedup = false`
  * keeps the positional multiset for consumers that need duplicate counts
  * (repetition scoring).
  */
case class ShingleHashes(child: Expression, n: Int, dedup: Boolean = true)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val t = arr.numElements()
    val wordHash = new Array[Long](t)
    var i = 0
    while (i < t) { wordHash(i) = Mix.hashString(arr.getUTF8String(i)); i += 1 }
    val m = math.max(t - n + 1, math.min(t, 1)) // shorter tail when t < n
    val out = new Array[Long](m)
    i = 0
    while (i < m) {
      var h = 0L
      var j = i
      val end = math.min(i + n, t)
      while (j < end) { h = Mix.mix(h ^ wordHash(j)); j += 1 }
      out(i) = h
      i += 1
    }
    if (!dedup) return new GenericArrayData(out)
    java.util.Arrays.sort(out)
    var uniq = 0
    i = 0
    while (i < m) {
      if (i == 0 || out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** minhash_bands(shingles, numHashes, bands) -> array<long> of band hashes.
  * Accepts array<string> (hashes each element) or array<long> (pre-hashed,
  * e.g. from shingle_hashes). Band b's hash combines the minhashes of its
  * numHashes/bands rows; a pair of documents collides on band b iff all that
  * band's minhashes agree — the standard LSH banding scheme
  * (prob 1-(1-j^r)^b).
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
  extends UnaryExpression with CodegenFallback {
  require(numHashes % bands == 0, "numHashes must divide into bands")
  private val rowsPerBand = numHashes / bands
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"
  private def isString = child.dataType.asInstanceOf[ArrayType].elementType == StringType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    // hash every shingle once; derive hash-family member i via mix(h ^ seed_i)
    val str = isString
    val base = new Array[Long](n)
    var j = 0
    while (j < n) {
      base(j) = if (str) Mix.hashString(arr.getUTF8String(j)) else arr.getLong(j)
      j += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bandHash = Mix.mix(b.toLong)
      var r = 0
      while (r < rowsPerBand) {
        val seed = Mix.mix((b * rowsPerBand + r).toLong)
        var mn = Long.MaxValue
        var k = 0
        while (k < n) {
          val h = Mix.mix(base(k) ^ seed)
          if (h < mn) mn = h
          k += 1
        }
        bandHash = Mix.mix(bandHash ^ mn)
        r += 1
      }
      out(b) = bandHash
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): MinHashBands = copy(child = c)
}

/** simhash64(tokens) -> long. Each token hashed once; bit i of the result is
  * the sign of the +1/-1 vote sum of the tokens' bit i.
  */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      val h = Mix.hashString(arr.getUTF8String(j))
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      j += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
}

/** winnow_fp(text, k, window) -> sorted distinct array<long>: winnowing
  * document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03) — rolling
  * k-gram hashes over the normalized text, minimum per window. Compiled:
  * one pass for the gram hashes, one monotonic-deque-free pass for window
  * minima (window is small, linear rescan is fine).
  */
case class WinnowFingerprint(child: Expression, k: Int, window: Int)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fp"
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString.toLowerCase.trim.replaceAll("\\s+", " ")
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val grams = math.max(n - k + 1, 1)
    val gh = new Array[Long](grams)
    var i = 0
    while (i < grams) {
      var h = 0L
      var j = i
      val end = math.min(i + k, n)
      while (j < end) { h = Mix.mix(h ^ s.charAt(j).toLong) ; j += 1 }
      gh(i) = h
      i += 1
    }
    val nWin = math.max(grams - window + 1, 1)
    val mins = new Array[Long](nWin)
    i = 0
    while (i < nWin) {
      var mn = Long.MaxValue
      var j = i
      val end = math.min(i + window, grams)
      while (j < end) { if (gh(j) < mn) mn = gh(j); j += 1 }
      mins(i) = mn
      i += 1
    }
    java.util.Arrays.sort(mins)
    var uniq = 0
    i = 0
    while (i < nWin) {
      if (i == 0 || mins(i) != mins(i - 1)) { mins(uniq) = mins(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(mins, uniq))
  }
  override protected def withNewChildInternal(c: Expression): WinnowFingerprint = copy(child = c)
}

/** lsh_signs(vec, tables, planes) -> array<long>: for each hash table, the
  * sign bits of the vector against `planes` deterministic pseudo-random
  * hyperplanes (component (t,p,d) = mix-derived uniform in [-0.5, 0.5)).
  * Random-hyperplane LSH for cosine similarity (Charikar's scheme).
  */
case class LshSigns(child: Expression, tables: Int, planes: Int)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_signs"
  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val fl = isFloat
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        val seed = Mix.mix((t.toLong << 32) | p.toLong)
        var acc = 0.0
        var d = 0
        while (d < n) {
          val x = if (fl) v.getFloat(d).toDouble else v.getDouble(d)
          // uniform in [-0.5, 0.5) from the top 53 bits of the mix
          val u = (Mix.mix(seed ^ d.toLong) >>> 11) * (1.0 / (1L << 53)) - 0.5
          acc += x * u
          d += 1
        }
        if (acc > 0) sig |= (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): LshSigns = copy(child = c)
}
