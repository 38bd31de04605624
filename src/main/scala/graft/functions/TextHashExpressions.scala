package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass gram hashing for the near-dup operators (SURVEY LLM-ops).
  *
  * The first-cut MinHash pipeline materialized every gram as a ROW
  * (`explode` over positions), hashed each gram 32× with seeded
  * `xxhash64`, and `collect_set`-ed the gram STRINGS per doc — at sf0.1
  * that is ~2.5M shuffled rows and 80M string hashes for 5,000
  * documents, and it was the top cost of the whole bench (10 s of 38 s,
  * BENCH_r04). These expressions do the same work in ONE pass over each
  * document row: hash every gram position once (xxHash64 over the UTF-8
  * bytes, zero-copy), keep the distinct SORTED 64-bit gram-hash set, and
  * derive the k minhash values from the 64-bit hashes with `hashLong`
  * re-seeding — no gram rows exist, nothing is shuffled but one small
  * array column per document.
  *
  * Correctness contract: the CORRECTNESS oracle for the near-dup queries
  * is the EXACT all-pairs Jaccard (the LSH signatures only shape
  * candidate recall, see [[graft.llm.Dedup]]), so the signature hash
  * family is free to differ from the old `xxhash64(lit(i), s)` — but the
  * verify-stage Jaccard must equal the oracle's string-set Jaccard.
  * Hashed-set Jaccard equals string-set Jaccard unless two distinct
  * grams of one candidate pair collide in 64 bits (p ≈ m²/2⁶⁴ ≈ 1e-13
  * for m ≈ 5k grams — and deterministic: a green run stays green).
  *
  * These evaluate once per DOCUMENT (not per gram), so per-call cost is
  * O(len·k) hashing; codegen emits a static call so the surrounding
  * projection stays inside WholeStageCodegen, same pattern as
  * [[DotProduct]].
  */
object GramHash {

  /** Fixed gram-hash seed — any constant works; the oracle never sees
    * hash values, only the verified Jaccard output. */
  val Seed = 42L

  private val EmptyArr = UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)

  /** Sort the first `m` slots and dedup in place → distinct sorted set.
    * Sorted output makes reruns byte-identical (persist/exchange stable)
    * and keeps set ops cache-friendly downstream. */
  private def distinctSorted(hs: Array[Long], m: Int): ArrayData = {
    if (m <= 0) return EmptyArr
    java.util.Arrays.sort(hs, 0, m)
    var w = 1
    var i = 1
    while (i < m) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }

  /** Distinct sorted xxHash64 values of all character n-grams.
    * Char-aware (UTF-8 codepoint offsets), zero-copy: each gram is
    * hashed directly from the string's backing bytes. */
  def charGrams(text: UTF8String, n: Int): ArrayData = {
    val nChars = text.numChars()
    val m = nChars - n + 1
    if (m <= 0) return EmptyArr
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val nb = text.numBytes()
    // byte offset where each character starts (+ end sentinel)
    val starts = new Array[Int](nChars + 1)
    var c = 0
    var b = 0
    while (b < nb) {
      starts(c) = b
      b += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + b))
      c += 1
    }
    starts(nChars) = nb
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      hs(i) = XXH64.hashUnsafeBytes(
        base, off + starts(i), starts(i + n) - starts(i), Seed)
      i += 1
    }
    distinctSorted(hs, m)
  }

  private val Whitespace = Pattern.compile("\\s+")

  /** Distinct sorted xxHash64 values of all w-token shingles, where
    * tokens replicate `split(trim(text), '\\s+')` exactly:
    * `UTF8String.trim` strips ASCII spaces only (Spark's `trim`), and
    * Java regex split with limit -1 is what Spark's `split` runs. The
    * shingle string is the `concat_ws(' ', …)` join, so the hashed set
    * is the hash image of the exact shingle-string set the oracle
    * computes. */
  def tokenShingles(text: UTF8String, w: Int): ArrayData = {
    val toks = Whitespace.split(text.trim().toString, -1)
    val m = toks.length - w + 1
    if (m <= 0) return EmptyArr
    val hs = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      hs(i) = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), Seed)
      i += 1
    }
    distinctSorted(hs, m)
  }

  /** 64-bit SimHash over the distinct whitespace tokens, as two
    * non-negative 32-bit halves `[lo, hi]` (so the SQL oracle can build
    * the identical values with `pow(2, b)` sums — bit 63 of a single
    * BIGINT would overflow DuckDB's sum).
    *
    * Bit semantics replicate the cross-engine md5-nibble recipe of the
    * `d_simhash` oracle EXACTLY (it is the compare surface, unlike the
    * free-choice minhash family): bit b of a token is extracted from
    * hex nibble b/4 of `md5(token)` (nibble MSB first within each
    * nibble), and signature bit b is set iff the Σ(2·bit−1) vote over
    * distinct tokens is ≥ 0. All integer arithmetic — bit-stable in
    * both engines. */
  def simhash64(text: UTF8String): ArrayData = {
    val toks = Whitespace.split(text.trim().toString, -1)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (seen.add(t)) {
        md.reset()
        val h = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var b = 0
        while (b < 64) {
          // hex nibble b/4: high half of byte (b/8) for even nibbles,
          // low half for odd; bit b%4 inside the nibble, MSB first —
          // identical to instr('0123456789abcdef', substring(md5, ...))
          val byte = h(b >> 3) & 0xff
          val nib = if (((b >> 2) & 1) == 0) byte >> 4 else byte & 0xf
          val bit = (b % 4) match {
            case 0 => nib >> 3
            case 1 => (nib >> 2) & 1
            case 2 => (nib >> 1) & 1
            case _ => nib & 1
          }
          votes(b) += 2 * bit - 1
          b += 1
        }
      }
      i += 1
    }
    var lo = 0L
    var hi = 0L
    var b = 0
    while (b < 32) {
      if (votes(b) >= 0) lo |= 1L << b
      if (votes(b + 32) >= 0) hi |= 1L << b
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(Array(lo, hi))
  }

  /** k-permutation MinHash signature over a gram-hash set: slot j is
    * min over the set of `xxhash64(h, seed = j)` — the standard
    * derived-permutation family (one long-hash per slot instead of
    * re-hashing gram bytes k times). Empty set → empty signature (such
    * docs cannot be shingle near-dups and are filtered out upstream). */
  def minhashSig(hashes: ArrayData, k: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return EmptyArr
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < k) {
        val d = XXH64.hashLong(h, j)
        if (d < mins(j)) mins(j) = d
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }
}

/** `char_gram_hashes(text, n)` → array<bigint>: distinct sorted hashes
  * of the character n-grams of `text`. */
case class CharGramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"gram length must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_gram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_gram_hashes expects a string argument, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    GramHash.charGrams(s.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHash.charGrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `token_shingle_hashes(text, w)` → array<bigint>: distinct sorted
  * hashes of the w-token whitespace shingles of `text`. */
case class TokenShingleHashes(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"shingle width must be >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_shingle_hashes expects a string argument, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    GramHash.tokenShingles(s.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHash.tokenShingles($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(text)` → array<bigint> `[lo, hi]`: 64-bit SimHash of the
  * distinct whitespace tokens as two 32-bit halves. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects a string argument, got ${t.simpleString}")
  }

  override def nullSafeEval(s: Any): Any =
    GramHash.simhash64(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHash.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_sig(gram_hashes, k)` → array<bigint> of k minhash values. */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"signature size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    GramHash.minhashSig(a.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GramHash.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
