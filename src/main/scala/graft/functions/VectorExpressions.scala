package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Sequential-fold dot product over two array<double> columns as a
  * native codegen'd expression.
  *
  * The composable form (`aggregate(zip_with(a,b,*),0d,+)`) evaluates
  * lambdas interpretively per element — ~50× slower in the all-pairs
  * similarity hot path. This expression emits a tight fused loop while
  * keeping EXACTLY the same left-to-right addition order, so results
  * stay bit-identical to the DuckDB oracle's `list_reduce` fold.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Sign-random-projection LSH bucket key over an array<double>: bit p
  * of the result is 1 iff the dot product of the vector with
  * pseudo-random hyperplane p is >= 0. Hyperplane weights are
  * Rademacher (±1), derived from pure 64-bit integer arithmetic on
  * (plane, dim) — see [[LshBucket.weight]] — so the IDENTICAL bucket
  * function is expressible in the DuckDB oracle as plain SQL integer
  * arithmetic (no engine-specific hash). The per-plane projection is
  * a sequential left-to-right fold, matching `list_reduce` order, so
  * bucket keys are bit-identical across engines.
  *
  * Replaces a 512-term `element_at` expression tree (planes × dims
  * terms): one fused loop, ~1000× smaller codegen footprint.
  */
case class LshBucket(child: Expression, planes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "lsh_bucket"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    java.lang.Long.valueOf(LshBucket.compute(arr, planes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val h = ctx.freshName("h")
      s"""
         |if ($c.numElements() > 1024) {
         |  throw new IllegalArgumentException(
         |    "lsh_bucket supports at most 1024 dimensions (weight stride would alias across planes)");
         |}
         |long $out = 0L;
         |for (int $p = 0; $p < ${planes}; $p++) {
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $c.numElements(); $d++) {
         |    long $h = (((long) $p * 1024L + $d) * 2654435761L + 123456789L) % 4294967296L;
         |    $acc += $c.getDouble($d) * ($h >= 2147483648L ? 1.0 : -1.0);
         |  }
         |  if ($acc >= 0) $out |= (1L << $p);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

object LshBucket {
  /** Rademacher weight for (plane, dim): ±1 from the high bit of an
    * LCG step that stays below 2^63 (p ≤ 16, d ≤ 1023), so the same
    * formula runs in DuckDB BIGINT arithmetic without overflow:
    * `((p*1024 + d) * 2654435761 + 123456789) % 4294967296 >= 2^31`.
    */
  def weight(p: Int, d: Int): Double = {
    val h = ((p.toLong * 1024L + d) * 2654435761L + 123456789L) % 4294967296L
    if (h >= 2147483648L) 1.0 else -1.0
  }

  def compute(arr: ArrayData, planes: Int): Long = {
    require(arr.numElements() <= 1024,
      "lsh_bucket supports at most 1024 dimensions (weight stride would alias across planes)")
    var out = 0L
    var p = 0
    while (p < planes) {
      var acc = 0.0
      var d = 0
      while (d < arr.numElements()) {
        acc += arr.getDouble(d) * weight(p, d)
        d += 1
      }
      if (acc >= 0) out |= (1L << p)
      p += 1
    }
    out
  }
}

/** 64-bit SimHash over an array<bigint> of token hashes: bit b of the
  * result is 1 iff the majority of token hashes have bit b set
  * (ties → 1, matching sum >= 0).
  *
  * The composable form needs 64 interpreted aggregate passes over the
  * token array; this expression is one fused loop (tokens × 64 bit
  * tests) inside whole-stage codegen.
  */
case class SimHash64(child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sums = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) >= 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val sums = ctx.freshName("sums")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
         |int[] $sums = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $sums[$b]++; else $sums[$b]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($sums[$b] >= 0) $out |= (1L << $b);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature over an array<bigint> of (pre-modded) shingle
  * hashes: out[j] = min over hashes h of (a_j·h + b_j) mod p, with
  * p = 2^31 − 1 and deterministic LCG-derived (a_j, b_j).
  *
  * One fused loop replacing numPerms × len nested interpreted
  * lambdas. Usable from SQL as `minhash_sig(hashes, numPerms)` with a
  * literal perm count.
  */
case class MinHashSig(child: org.apache.spark.sql.catalyst.expressions.Expression,
    numPerms: Int) extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType, false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val (as, bs) = MinHashSig.permParams(numPerms)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = MinHashSig.compute(arr, as, bs)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val asRef = ctx.addReferenceObj("minhashAs", as, "long[]")
    val bsRef = ctx.addReferenceObj("minhashBs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |long[] $out = new long[${numPerms}];
         |java.util.Arrays.fill($out, ${MinHashSig.Prime}L);
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < ${numPerms}; $j++) {
         |    long $v = ($asRef[$j] * $h + $bsRef[$j]) % ${MinHashSig.Prime}L;
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** 2^31 − 1 (Mersenne prime), the classic MinHash modulus. */
  val Prime: Long = (1L << 31) - 1

  /** Deterministic permutation parameters (LCG, seed 42). */
  def permParams(numPerms: Int): (Array[Long], Array[Long]) = {
    var state = 42L
    def next(): Long = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (state >>> 33) % (Prime - 1)
    }
    val as = new Array[Long](numPerms)
    val bs = new Array[Long](numPerms)
    for (j <- 0 until numPerms) { as(j) = next() + 1; bs(j) = next() }
    (as, bs)
  }

  def compute(arr: ArrayData, as: Array[Long], bs: Array[Long]): Array[Long] = {
    val n = as.length
    val out = Array.fill(n)(Prime)
    var i = 0
    while (i < arr.numElements()) {
      val h = arr.getLong(i)
      var j = 0
      while (j < n) {
        val v = (as(j) * h + bs(j)) % Prime
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    out
  }
}
