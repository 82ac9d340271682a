package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd kernels for the training-data text operators (round 6).
  *
  * The dedup/decontam/boilerplate/quality family ran its hot per-row chains
  * through Spark's higher-order functions — `filter`, `transform`, `slice`,
  * `zip_with`, `aggregate` are all CodegenFallback, so every ROW paid an
  * interpreted lambda per ELEMENT (plus per-shingle `md5` through
  * `DigestUtils.md5Hex`, which constructs a fresh MessageDigest and a 32-char
  * hex string per call, and `conv(substring(...))` re-parsing that string).
  * Each expression below computes the EXACT value of the column formulation
  * it replaces — same null semantics, same fold order, same md5-derived
  * hashing — in one tight loop with a thread-local digest
  * ([[TextKernelSpec]] pins bit-identity against the old expressions; the
  * DuckDB gates re-prove it end-to-end).
  *
  * Pattern follows [[VecFoldExpression]]: shared kernel for interpreted eval
  * and generated code, wired through GraftColumn.
  */
object TextKernels {

  private val Space = UTF8String.fromString(" ")

  private val tlMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** ASCII-decimal byte forms of small ints (minhash suffix "#i"). */
  private val digitBytes: Array[Array[Byte]] =
    (0 until 128).map(i => i.toString.getBytes(java.nio.charset.StandardCharsets.US_ASCII)).toArray

  @inline private def isAlnum(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')

  /** ≡ `filter(split(s, "[^a-z0-9]+"), t => length(t) > 0)` over an
    * ALREADY-LOWERCASED string: the maximal runs of ASCII `[a-z0-9]` bytes.
    * Exact because regex-split on the complement class, with empties
    * dropped, IS run extraction — and multi-byte UTF-8 chars can never
    * collide with the ASCII class (continuation bytes have the high bit
    * set). Callers pass `lower(text)` so Spark's own lowercasing semantics
    * are preserved verbatim.
    */
  def alnumRuns(s: UTF8String): ArrayData = {
    val b = s.getBytes
    val n = b.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](16)
    var i = 0
    while (i < n) {
      if (isAlnum(b(i))) {
        var j = i + 1
        while (j < n && isAlnum(b(j))) j += 1
        out += UTF8String.fromBytes(b, i, j - i)
        i = j
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** ≡ Dedup.shinglesOf's `zip_with`-of-`slice`s chain: space-joined word
    * w-grams; fewer than w tokens → empty array; a null token nulls every
    * shingle containing it (concat null propagation).
    */
  def shingles(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (n < w) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](n - w + 1)
    i = 0
    while (i < out.length) {
      var nul = false
      var j = 0
      while (j < w) { if (toks(i + j) == null) nul = true; j += 1 }
      out(i) =
        if (nul) null
        else UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(toks, i, i + w): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** First `hexDigits` hex chars of an md5 digest parsed base-16 — the exact
    * value of `conv(substring(md5(s), 1, hexDigits), 16, 10).cast("long")`
    * (left-to-right nibble fold; ≤ 15 digits always fits a long).
    */
  @inline private def hexPrefixToLong(d: Array[Byte], hexDigits: Int): Long = {
    var v = 0L
    var k = 0
    while (k < hexDigits) {
      val b = d(k >> 1) & 0xff
      v = v * 16 + (if ((k & 1) == 0) b >>> 4 else b & 0xf)
      k += 1
    }
    v
  }

  /** ≡ `transform(arr, s => conv(substring(md5(s), 1, hexDigits), 16, 10)
    * .cast("long"))`: per-element md5-derived hash, null elements stay null.
    */
  def hashArray(arr: ArrayData, hexDigits: Int): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    val md = tlMd5.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        out(i) = java.lang.Long.valueOf(hexPrefixToLong(md.digest(), hexDigits))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ≡ the minhash column family
    * `array_min(transform(sh, s => hash64(concat(s, lit("#i")))))` for
    * i ∈ [0, numHashes): ONE pass over the shingles computing every band's
    * min (the old shape walked the array through an interpreted transform
    * per hash function). `array_min` skips null elements and returns null
    * for an empty/all-null array — reproduced per output slot.
    */
  def minhash(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    val md = tlMd5.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val sb = arr.getUTF8String(i).getBytes
        var h = 0
        while (h < numHashes) {
          md.reset()
          md.update(sb)
          md.update('#'.toByte)
          md.update(digitBytes(h))
          val v = hexPrefixToLong(md.digest(), 15)
          if (v < mins(h)) mins(h) = v
          h += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](numHashes)
    if (any) {
      var h = 0
      while (h < numHashes) { out(h) = java.lang.Long.valueOf(mins(h)); h += 1 }
    }
    new GenericArrayData(out)
  }

  /** ≡ Dedup.simhash's 32 interpreted `aggregate` folds over the hash array
    * in ONE pass: bit j of the result is set iff Σ over hashes of
    * (±1 by bit j) is > 0. A null element contributes −1 to every bit sum —
    * `when(shiftright(null, j) … === 1, 1L).otherwise(-1L)` takes the
    * otherwise branch on a null condition — i.e. it acts like h = 0
    * (TextKernelSpec pins this case).
    */
  def simhashFold(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val counts = new Array[Long](bits)
    var i = 0
    while (i < n) {
      val h = if (arr.isNullAt(i)) 0L else arr.getLong(i)
      var j = 0
      while (j < bits) {
        counts(j) += (if (((h >> j) & 1L) == 1L) 1L else -1L)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) fp += (1L << j)
      j += 1
    }
    fp
  }

  /** ≡ `size(filter(arr, t => t.isin(values: _*)))`: the number of elements
    * equal to any of `values` (binary string equality; null elements don't
    * match, exactly as `isin`'s null propagates and `filter` drops it).
    */
  def countIn(arr: ArrayData, values: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && values.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  /** ≡ `aggregate(arr, lit(0.0), (acc, t) => acc + length(t).cast("double"))`:
    * the running double sum of character counts in index order (exact for
    * any realistic token lengths — integers < 2^53). A null element poisons
    * the fold to null, as `acc + null` did.
    */
  def sumLen(arr: ArrayData): java.lang.Double = {
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      s += arr.getUTF8String(i).numChars()
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** `graft_alnum_runs(loweredText)` → array<string>, see [[TextKernels.alnumRuns]]. */
final case class AlnumRunsExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernels.alnumRuns(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.alnumRuns($c)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_alnum_runs"
}

/** `graft_shingles(tokens, w)` → array<string>, see [[TextKernels.shingles]]. */
final case class ShinglesExpression(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"shingle width must be >= 1, got $w")
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingles($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_shingles"
}

/** `graft_hash_array(arr, hexDigits)` → array<long>, see [[TextKernels.hashArray]]. */
final case class HashArrayExpression(child: Expression, hexDigits: Int) extends UnaryExpression {
  require(hexDigits >= 1 && hexDigits <= 15, s"hexDigits must be in [1, 15], got $hexDigits")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    TextKernels.hashArray(input.asInstanceOf[ArrayData], hexDigits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.hashArray($c, $hexDigits)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_hash_array"
}

/** `graft_minhash(shingles, numHashes)` → array<long>, see [[TextKernels.minhash]]. */
final case class MinhashExpression(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1 && numHashes < 128, s"numHashes must be in [1, 128), got $numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    TextKernels.minhash(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.minhash($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash"
}

/** `graft_simhash_fold(hashes, bits)` → long, see [[TextKernels.simhashFold]]. */
final case class SimhashFoldExpression(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernels.simhashFold(input.asInstanceOf[ArrayData], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhashFold($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash_fold"
}

/** `graft_count_in(arr)` → int over a constructor-bound value set, see
  * [[TextKernels.countIn]].
  */
final case class CountInExpression(child: Expression, values: Seq[String]) extends UnaryExpression {
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    TextKernels.countIn(input.asInstanceOf[ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("countInSet", set,
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.countIn($c, $setRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_count_in"
}

/** `graft_sum_len(arr)` → double, see [[TextKernels.sumLen]]. */
final case class SumLenExpression(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any): Any =
    TextKernels.sumLen(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.TextKernels.sumLen($c);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "graft_sum_len"
}
