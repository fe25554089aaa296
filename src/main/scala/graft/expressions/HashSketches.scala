package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared deterministic mixing (SplitMix64, public-domain constants). */
object Hashing {
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** The same mixer as inline-able Java source for codegen. */
  val splitmixJava: String =
    """private static long graft_mix(long z) {
      |  z += 0x9E3779B97F4A7C15L;
      |  z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L;
      |  z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL;
      |  return z ^ (z >>> 31);
      |}""".stripMargin

  /** Universal-hash coefficients for the minhash permutations
    * `(a_i*h + b_i) mod 2^31-1`, derived deterministically from the index.
    * Shared by [[MinHashBandBuckets]], the declarative
    * `Dedup.lshBucketsFromHashes`, and the portable-oracle pipeline (which
    * interpolates the same values into its DuckDB SQL — parity by
    * construction). `a` in [1, 2^31-2], `b` in [0, 2^31-2]. */
  def minhashA(n: Int): Array[Long] =
    Array.tabulate(n)(i => Math.floorMod(splitmix64(2L * i), 2147483646L) + 1)
  def minhashB(n: Int): Array[Long] =
    Array.tabulate(n)(i => Math.floorMod(splitmix64(2L * i + 1), 2147483647L))
}

/** MinHash band buckets as one fused codegen loop.
  *
  * Input: the staged base-hash array (`xxhash64` per shingle folded into
  * [0, 2^31-1), see `Dedup.shingleBaseHashes`). Output: `bands` bucket
  * keys, where bucket b mixes the `rowsPerBand` min-hashes owned by band
  * b; min-hash i is `min over h of (a_i*h + b_i) mod 2^31-1` with
  * SplitMix64-derived coefficients.
  *
  * Why a custom expression (SURVEY §4.3 escalation, second instance):
  * the HOF formulation dispatches `bands × rowsPerBand × shingles`
  * interpreted lambda calls per row — measured as the top bench cost
  * after everything else was optimized. This loop touches each base hash
  * once per signature row with zero dispatch, inside whole-stage
  * codegen. Interpreted fallback is bit-identical.
  *
  * Empty input → all-zero buckets (matches the HOF guard's semantics);
  * a NULL element → NULL result (ragged/corrupt inputs surface instead
  * of hashing garbage).
  */
case class MinHashBandBuckets(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  private val n = bands * rowsPerBand
  private val P31 = 2147483647L

  // Universal-hash coefficients, derived deterministically on the driver;
  // identical on every executor (pure function of the index).
  @transient private lazy val as: Array[Long] = Hashing.minhashA(n)
  @transient private lazy val bs: Array[Long] = Hashing.minhashB(n)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // Can return NULL on null-element inputs even when the input itself is
  // non-nullable.
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_band_buckets requires array<bigint>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val out = new Array[Long](bands)
    if (m > 0) {
      val mins = Array.fill(n)(Long.MaxValue)
      var j = 0
      while (j < m) {
        if (hs.isNullAt(j)) return null // null element → NULL result
        val h = hs.getLong(j)
        var i = 0
        while (i < n) {
          // floorMod, not %: pmod semantics for any input hash (see
          // MinHashSignature) — identical on the non-negative folded
          // hashes the portable pipelines feed.
          val v = Math.floorMod(as(i) * h + bs(i), P31)
          if (v < mins(i)) mins(i) = v
          i += 1
        }
        j += 1
      }
      var b = 0
      while (b < bands) {
        var acc = 1125899906842597L + b
        var r = 0
        while (r < rowsPerBand) {
          acc = Hashing.splitmix64(acc ^ mins(b * rowsPerBand + r))
          r += 1
        }
        out(b) = acc
        b += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Use the name addNewFunction RETURNS: in oversized generated classes
    // Spark hoists the helper into a nested class and qualifies the name.
    val mix = ctx.addNewFunction("graft_mix", Hashing.splitmixJava)
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, hs => {
      // All locals freshName'd: two instances in one generated scope must
      // not collide (Janino redefinition -> interpreted fallback).
      val m = ctx.freshName("m")
      val mins = ctx.freshName("mins")
      val out = ctx.freshName("out")
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val v = ctx.freshName("v")
      val b = ctx.freshName("b")
      val acc = ctx.freshName("acc")
      val r = ctx.freshName("r")
      s"""
         |int $m = $hs.numElements();
         |long[] $out = new long[$bands];
         |boolean $bad = false;
         |if ($m > 0) {
         |  long[] $mins = new long[$n];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $j = 0; $j < $m && !$bad; $j++) {
         |    if ($hs.isNullAt($j)) { $bad = true; break; }
         |    long $h = $hs.getLong($j);
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $v = java.lang.Math.floorMod($asRef[$i] * $h + $bsRef[$i], ${P31}L);
         |      if ($v < $mins[$i]) $mins[$i] = $v;
         |    }
         |  }
         |  for (int $b = 0; $b < $bands && !$bad; $b++) {
         |    long $acc = 1125899906842597L + $b;
         |    for (int $r = 0; $r < $rowsPerBand; $r++) {
         |      $acc = $mix($acc ^ $mins[$b * $rowsPerBand + $r]);
         |    }
         |    $out[$b] = $acc;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBandBuckets =
    copy(child = newChild)
}

/** Raw portable MinHash signature: the per-permutation minima array
  * `min_h((a_i·h + b_i) mod (2^31−1))` for the SplitMix64-derived
  * [[Hashing.minhashA]]/[[Hashing.minhashB]] coefficients — EXACTLY the
  * values the declarative formulation
  * (`transform(sequence(...), k -> array_min(transform(hs, ...)))`)
  * produces and the DuckDB oracles interpolate, but in one fused codegen
  * loop instead of n·|hs| interpreted higher-order-function lambda
  * dispatches (measured as the dominant cost of the portable near-dup
  * pipelines at sf0.1). Unlike [[MinHashBandBuckets]] the minima are NOT
  * mixed into opaque band buckets, so band keys built from slices of
  * this signature stay oracle-replayable. NULL on empty or null-element
  * input (an empty shingle set has no meaningful signature). */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  private val P31 = 2147483647L

  @transient private lazy val as: Array[Long] = Hashing.minhashA(numHashes)
  @transient private lazy val bs: Array[Long] = Hashing.minhashB(numHashes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature requires array<bigint>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    if (m == 0) return null
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    while (j < m) {
      if (hs.isNullAt(j)) return null
      val h = hs.getLong(j)
      var i = 0
      while (i < numHashes) {
        // floorMod, not %: matches the declarative pmod the docs promise
        // for ANY input hash. shingleHashesPortable folds into
        // [0, 2^31-1) where the two agree, but the function is exposed
        // generically via spark.sql and a negative caller-supplied hash
        // must not yield negative minima.
        val v = java.lang.Math.floorMod(as(i) * h + bs(i), P31)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashSigAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashSigBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val m = ctx.freshName("m")
      val mins = ctx.freshName("mins")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val bad = ctx.freshName("bad")
      s"""
         |int $m = $c.numElements();
         |boolean $bad = ($m == 0);
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $j = 0; !$bad && $j < $m; $j++) {
         |  if ($c.isNullAt($j)) { $bad = true; break; }
         |  long $h = $c.getLong($j);
         |  for (int $i = 0; $i < $numHashes; $i++) {
         |    long $v = java.lang.Math.floorMod($asRef[$i] * $h + $bsRef[$i], ${P31}L);
         |    if ($v < $mins[$i]) $mins[$i] = $v;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Distinct character k-shingle hashes, computed directly from the
  * string bytes: slide a k-byte window, hash it (31-polynomial →
  * SplitMix64 finalizer → folded into [0, 2^31-1) for downstream
  * universal hashing), sort, deduplicate. Output: sorted distinct
  * `array<bigint>`.
  *
  * This replaces `shingles` + `shingleBaseHashes` for the MinHash
  * pipeline: the ~`len` shingle *strings* per row never materialize, and
  * everything downstream (bucketing, exact-Jaccard verification via
  * `array_intersect`) operates on longs — so no shuffle in the near-dup
  * pipeline ever carries text. Hash-set Jaccard equals string-set
  * Jaccard up to 2^-31 collision probability per pair (negligible at any
  * realistic shingle count).
  *
  * Byte windows ≡ char windows for the ASCII output of
  * `TextAnalysis.normalizeText`; arbitrary UTF-8 still hashes
  * deterministically (windows are byte-aligned). Strings shorter than k
  * hash as a single window; empty → empty array. */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // Can return NULL on null-element inputs even when the input itself is
  // non-nullable.
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires string, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    new GenericArrayData(ShingleHashes.hashWindows(bytes, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      s"""
         |byte[] $bytes = $s.getBytes();
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.ShingleHashes.hashWindows($bytes, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val P31 = 2147483647L

  /** Shared kernel for eval and codegen paths (static, JIT-friendly). */
  def hashWindows(bytes: Array[Byte], k: Int): Array[Long] = {
    val len = bytes.length
    if (len == 0) return Array.emptyLongArray
    val nWin = math.max(len - k + 1, 1)
    val out = new Array[Long](nWin)
    var i = 0
    while (i < nWin) {
      var h = 1125899906842597L
      val end = math.min(i + k, len)
      var j = i
      while (j < end) { h = 31 * h + bytes(j); j += 1 }
      out(i) = Math.floorMod(Hashing.splitmix64(h), P31)
      i += 1
    }
    java.util.Arrays.sort(out)
    // in-place unique-compact
    var w = 1
    var r = 1
    while (r < nWin) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == nWin) out else java.util.Arrays.copyOf(out, w)
  }
}

/** 64-bit SimHash over a pre-hashed token array, as one fused codegen
  * loop: counter per bit, +1/-1 by bit value, sign → signature bit.
  * Same escalation rationale as [[MinHashBandBuckets]]; bit-identical to
  * the HOF formulation in `Dedup.simhash`. Empty input → 0L; a NULL
  * element → NULL result. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  // Can return NULL on null-element inputs even when the input itself is
  // non-nullable.
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<bigint>, got ${t.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val m = hs.numElements()
    val cnt = new Array[Int](64)
    var j = 0
    while (j < m) {
      if (hs.isNullAt(j)) return null // null element → NULL result
      val h = hs.getLong(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, hs => {
      // All locals freshName'd (see MinHashBandBuckets).
      val m = ctx.freshName("m")
      val cnt = ctx.freshName("cnt")
      val sig = ctx.freshName("sig")
      val bad = ctx.freshName("bad")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val b2 = ctx.freshName("b2")
      s"""
         |int $m = $hs.numElements();
         |int[] $cnt = new int[64];
         |boolean $bad = false;
         |for (int $j = 0; $j < $m; $j++) {
         |  if ($hs.isNullAt($j)) { $bad = true; break; }
         |  long $h = $hs.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $cnt[$b]++; else $cnt[$b]--;
         |  }
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $sig = 0L;
         |  for (int $b2 = 0; $b2 < 64; $b2++) {
         |    if ($cnt[$b2] > 0) $sig |= (1L << $b2);
         |  }
         |  ${ev.value} = $sig;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
