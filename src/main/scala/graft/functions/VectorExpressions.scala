package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot paths.
  *
  * Spark's array higher-order functions (`transform` / `zip_with` /
  * `aggregate`) are CodegenFallback — every element goes through an
  * interpreted lambda with boxed Doubles. On the similarity/clustering
  * paths that cost dominates the whole query (round-1 e13 spent ~15 s
  * mostly in interpreted distance lambdas at sf0.1). These expressions
  * implement both `eval` and `doGenCode` with primitive `double` loops
  * over `ArrayData`, so dot products, norms, and nearest-centroid
  * argmin stay inside whole-stage codegen with zero boxing.
  *
  * Element null slots are treated as 0.0 on both the interpreted and
  * codegen paths (the guard branch predicts perfectly on dense
  * vectors); inputs that are not numeric arrays fail at analysis time
  * via checkInputDataTypes rather than as runtime ClassCastExceptions.
  */
object VectorExpressions {

  private val supportedElems: Set[DataType] =
    Set(DoubleType, FloatType, LongType, IntegerType)

  /** Null slots read as 0.0 on BOTH paths (documented contract; the
    * branch predicts perfectly on dense vectors, so the 100 TB cost is
    * nil — and without it the interpreted path NPEs on a null slot
    * while codegen reads garbage). */
  private def elemJava(arr: String, et: DataType, i: String): String = {
    val raw = et match {
      case DoubleType => s"$arr.getDouble($i)"
      case FloatType  => s"(double) $arr.getFloat($i)"
      case LongType   => s"(double) $arr.getLong($i)"
      case IntegerType => s"(double) $arr.getInt($i)"
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }
    s"($arr.isNullAt($i) ? 0.0 : $raw)"
  }

  private def elemScala(arr: ArrayData, et: DataType, i: Int): Double =
    if (arr.isNullAt(i)) 0.0
    else et match {
      case DoubleType => arr.getDouble(i)
      case FloatType  => arr.getFloat(i).toDouble
      case LongType   => arr.getLong(i).toDouble
      case IntegerType => arr.getInt(i).toDouble
      case other => throw new IllegalArgumentException(s"unsupported element type $other")
    }

  private def elementType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  /** Analysis-time validation: every child must be array<numeric> with a
    * supported element width — without this, bad inputs surface as raw
    * ClassCastException from deep inside eval/codegen at runtime. */
  private def checkNumericArrays(name: String, children: Seq[Expression]): TypeCheckResult = {
    children.zipWithIndex.foreach { case (c, i) =>
      c.dataType match {
        case ArrayType(et, _) if supportedElems.contains(et) => ()
        case other => return TypeCheckResult.TypeCheckFailure(
          s"$name argument ${i + 1} must be array<double|float|bigint|int>, got " +
            other.catalogString)
      }
    }
    TypeCheckResult.TypeCheckSuccess
  }

  /** Dot product of two numeric array columns, as primitive codegen.
    * Mismatched lengths truncate to the shorter array (documented
    * contract — equivalent to zero-padding the shorter vector, which is
    * the conventional embedding semantics); null slots read as 0.0. */
  case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkNumericArrays("array_dot", Seq(left, right))
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (lt, rt) = (elementType(left), elementType(right))
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += elemScala(x, lt, i) * elemScala(y, rt, i); i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, n, s) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("s"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ${elemJava(a, elementType(left), i)} * ${elemJava(b, elementType(right), i)};
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayDot =
      copy(left = l, right = r)
  }

  /** Sum of squares of a numeric array column (squared L2 norm). */
  case class ArrayNorm2(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkNumericArrays("array_norm2", Seq(child))
    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val et = elementType(child)
      var s = 0.0; var i = 0
      while (i < v.numElements()) { val x = elemScala(v, et, i); s += x * x; i += 1 }
      s
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val (i, s, x) = (ctx.freshName("i"), ctx.freshName("s"), ctx.freshName("x"))
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $x = ${elemJava(a, elementType(child), i)};
           |  $s += $x * $x;
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): ArrayNorm2 = copy(child = c)
  }

  /** Argmin of squared L2 distance from the input vector to a constant
    * centroid matrix (k·dim doubles, shipped as a codegen reference
    * object — the broadcast-literal pattern without array-literal
    * overhead). Ties resolve to the lowest centroid index. */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult =
      checkNumericArrays("nearest_centroid", Seq(child))
    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val et = elementType(child)
      var best = -1; var bestD = Double.PositiveInfinity
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        val n = math.min(cent.length, v.numElements())
        var d = 0.0; var i = 0
        while (i < n) { val t = elemScala(v, et, i) - cent(i); d += t * t; i += 1 }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      nullSafeCodeGen(ctx, ev, a => {
        val (c, i, n) = (ctx.freshName("c"), ctx.freshName("i"), ctx.freshName("n"))
        val (d, t, best, bestD) = (ctx.freshName("d"), ctx.freshName("t"),
          ctx.freshName("best"), ctx.freshName("bestD"))
        s"""
           |int $best = -1;
           |double $bestD = Double.POSITIVE_INFINITY;
           |for (int $c = 0; $c < $cents.length; $c++) {
           |  double[] cent = $cents[$c];
           |  int $n = java.lang.Math.min(cent.length, $a.numElements());
           |  double $d = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $t = ${elemJava(a, elementType(child), i)} - cent[$i];
           |    $d += $t * $t;
           |  }
           |  if ($d < $bestD) { $bestD = $d; $best = $c; }
           |}
           |${ev.value} = $best;
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): NearestCentroid =
      copy(child = c)
  }

  /** Squared L2 distances from the input vector to every row of a
    * constant centroid matrix, as array<double> — the probe-ranking
    * primitive (nprobe selection sorts this tiny k-array per row). */
  case class CentroidDistances(child: Expression, centroids: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      checkNumericArrays("centroid_distances", Seq(child))
    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val et = elementType(child)
      val out = new Array[Double](centroids.length)
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        val n = math.min(cent.length, v.numElements())
        var d = 0.0; var i = 0
        while (i < n) { val t = elemScala(v, et, i) - cent(i); d += t * t; i += 1 }
        out(c) = d
        c += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
      nullSafeCodeGen(ctx, ev, a => {
        val (c, i, n, d, t, out) = (ctx.freshName("c"), ctx.freshName("i"),
          ctx.freshName("n"), ctx.freshName("d"), ctx.freshName("t"), ctx.freshName("out"))
        s"""
           |double[] $out = new double[$cents.length];
           |for (int $c = 0; $c < $cents.length; $c++) {
           |  double[] cent = $cents[$c];
           |  int $n = java.lang.Math.min(cent.length, $a.numElements());
           |  double $d = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $t = ${elemJava(a, elementType(child), i)} - cent[$i];
           |    $d += $t * $t;
           |  }
           |  $out[$c] = $d;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): CentroidDistances =
      copy(child = c)
  }

  /** Random-hyperplane LSH signature: bit p is set when the dot product
    * of the vector with constant plane p is >= 0. Plane matrix ships as
    * a codegen reference object; one primitive pass per row replaces
    * numPlanes interpreted zip_with/aggregate dot products. */
  case class PlaneSignature(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult =
      checkNumericArrays("plane_signature", Seq(child))
    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val et = elementType(child)
      var sig = 0L
      var p = 0
      while (p < planes.length) {
        val plane = planes(p)
        val n = math.min(plane.length, v.numElements())
        var s = 0.0; var i = 0
        while (i < n) { s += elemScala(v, et, i) * plane(i); i += 1 }
        if (s >= 0) sig |= 1L << p
        p += 1
      }
      sig
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mat = ctx.addReferenceObj("planes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, a => {
        val (p, i, n, s, sig) = (ctx.freshName("p"), ctx.freshName("i"),
          ctx.freshName("n"), ctx.freshName("s"), ctx.freshName("sig"))
        s"""
           |long $sig = 0L;
           |for (int $p = 0; $p < $mat.length; $p++) {
           |  double[] plane = $mat[$p];
           |  int $n = java.lang.Math.min(plane.length, $a.numElements());
           |  double $s = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $s += ${elemJava(a, elementType(child), i)} * plane[$i];
           |  }
           |  if ($s >= 0) $sig |= 1L << $p;
           |}
           |${ev.value} = $sig;
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): PlaneSignature =
      copy(child = c)
  }

  /** Max absolute element value (the symmetric-quantization range).
    * Empty arrays yield 0.0; null slots read as 0.0 like every other
    * expression here. */
  case class ArrayAbsMax(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def checkInputDataTypes(): TypeCheckResult =
      checkNumericArrays("array_abs_max", Seq(child))
    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val et = elementType(child)
      var m = 0.0; var i = 0
      while (i < v.numElements()) {
        val x = math.abs(elemScala(v, et, i)); if (x > m) m = x; i += 1
      }
      m
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val (i, m, x) = (ctx.freshName("i"), ctx.freshName("m"), ctx.freshName("x"))
        s"""
           |double $m = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $x = java.lang.Math.abs(${elemJava(a, elementType(child), i)});
           |  if ($x > $m) $m = $x;
           |}
           |${ev.value} = $m;
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): ArrayAbsMax = copy(child = c)
  }

  /** Symmetric int8 quantization: code_i = floor(v_i / scale * 127 + 0.5)
    * (round-half-up IN BINARY — `floor` on the identical double is
    * engine-portable where decimal `round()` is not). |v_i| <= scale by
    * construction when scale = ArrayAbsMax(v), so codes stay within
    * [-127, 127] with no clamp branch. scale <= 0 (zero vector) yields
    * all-zero codes. Output array<int>, accepted directly by
    * ArrayDot/ArrayNorm2 — scales cancel in cosine, so quantized ANN
    * reuses the existing primitives unchanged.
    *
    * NULL-SLOT CONTRACT: a null input element quantizes as 0.0 (code
    * 0), like every expression in this file — the output therefore
    * truly has containsNull=false, and the e27 oracle coalesces null
    * elements to 0 to match. Callers needing null propagation must
    * pre-filter. */
  case class QuantizeInt8(vec: Expression, scale: Expression) extends BinaryExpression {
    override def left: Expression = vec
    override def right: Expression = scale
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = {
      val arrOk = checkNumericArrays("quantize_int8", Seq(vec))
      if (arrOk != TypeCheckResult.TypeCheckSuccess) arrOk
      else if (scale.dataType != DoubleType)
        TypeCheckResult.TypeCheckFailure(
          s"quantize_int8 argument 2 must be double, got ${scale.dataType.catalogString}")
      else TypeCheckResult.TypeCheckSuccess
    }
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      val s = b.asInstanceOf[Double]
      val et = elementType(vec)
      val out = new Array[Int](v.numElements())
      if (s > 0) {
        var i = 0
        while (i < v.numElements()) {
          out(i) = math.floor(elemScala(v, et, i) / s * 127.0 + 0.5).toInt
          i += 1
        }
      }
      ArrayData.toArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, out) = (ctx.freshName("i"), ctx.freshName("out"))
        s"""
           |int[] $out = new int[$a.numElements()];
           |if ($b > 0) {
           |  for (int $i = 0; $i < $a.numElements(); $i++) {
           |    $out[$i] = (int) java.lang.Math.floor(
           |      ${elemJava(a, elementType(vec), i)} / $b * 127.0 + 0.5);
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): QuantizeInt8 =
      copy(vec = l, scale = r)
  }

  /** Intersection size of two SORTED array<bigint> columns — the
    * PPJoin verification kernel. A single allocation-free two-pointer
    * merge per row, compared against `array_intersect` + `size` which
    * builds a hash set per row and boxes every element (at sf1 the e4
    * scoring of ~6M candidate pairs spent most of its CPU there).
    *
    * CONTRACT: both inputs ascending-sorted, 64-bit exact (compared as
    * longs — gram codes can exceed 2^53, so the double-based helpers
    * above are not used). Duplicate elements count once per matching
    * position pair (min multiplicity), which equals distinct-intersect
    * semantics on the distinct arrays the dedup pipeline builds. Null
    * slots read as 0L like every expression in this file. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def checkInputDataTypes(): TypeCheckResult = {
      Seq(left, right).zipWithIndex.foreach { case (c, i) =>
        c.dataType match {
          case ArrayType(LongType, _) => ()
          case other => return TypeCheckResult.TypeCheckFailure(
            s"sorted_intersect_count argument ${i + 1} must be array<bigint>, got " +
              other.catalogString)
        }
      }
      TypeCheckResult.TypeCheckSuccess
    }
    private def elemLong(arr: ArrayData, i: Int): Long =
      if (arr.isNullAt(i)) 0L else arr.getLong(i)
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      var i = 0; var j = 0; var c = 0
      while (i < x.numElements() && j < y.numElements()) {
        val xv = elemLong(x, i); val yv = elemLong(y, j)
        if (xv < yv) i += 1
        else if (xv > yv) j += 1
        else { c += 1; i += 1; j += 1 }
      }
      c
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, j, c) = (ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("c"))
        val (xv, yv) = (ctx.freshName("xv"), ctx.freshName("yv"))
        s"""
           |int $i = 0; int $j = 0; int $c = 0;
           |while ($i < $a.numElements() && $j < $b.numElements()) {
           |  long $xv = $a.isNullAt($i) ? 0L : $a.getLong($i);
           |  long $yv = $b.isNullAt($j) ? 0L : $b.getLong($j);
           |  if ($xv < $yv) { $i++; }
           |  else if ($xv > $yv) { $j++; }
           |  else { $c++; $i++; $j++; }
           |}
           |${ev.value} = $c;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
      copy(left = l, right = r)
  }

  /** Elementwise a − b over two numeric array columns as array<double>
    * (round 12) — the codegen replacement for `zip_with(a, b, _ - _)`
    * on the IVF-PQ residual path: HigherOrderFunction is
    * CodegenFallback, so the old form ran an interpreted lambda with
    * boxed Doubles per ELEMENT of every corpus row (and broke the
    * whole-stage-codegen span it sat in). Same arithmetic in the same
    * element order (each element widens to double exactly like an
    * up-front cast, so results are bit-identical for equal-length
    * dense arrays). Mismatched lengths truncate to the shorter array
    * and null slots read as 0.0 — the documented contract of every
    * expression in this file (zip_with instead null-pads; vectors of
    * unequal length or with null slots are out of the ANN operators'
    * contract either way). */
  case class ArraySub(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      checkNumericArrays("array_sub", Seq(left, right))
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (lt, rt) = (elementType(left), elementType(right))
      val n = math.min(x.numElements(), y.numElements())
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = elemScala(x, lt, i) - elemScala(y, rt, i); i += 1 }
      ArrayData.toArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, n, out) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("out"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double[] $out = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = ${elemJava(a, elementType(left), i)} - ${elemJava(b, elementType(right), i)};
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ArraySub =
      copy(left = l, right = r)
  }

  /** Elementwise a + b as array<double> — [[ArraySub]]'s twin for the
    * IVF-PQ reconstruction x̂ = c_cell + q(x − c_cell). Same contract. */
  case class ArrayAdd(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      checkNumericArrays("array_add", Seq(left, right))
    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val (lt, rt) = (elementType(left), elementType(right))
      val n = math.min(x.numElements(), y.numElements())
      val out = new Array[Double](n)
      var i = 0
      while (i < n) { out(i) = elemScala(x, lt, i) + elemScala(y, rt, i); i += 1 }
      ArrayData.toArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (i, n, out) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("out"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double[] $out = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = ${elemJava(a, elementType(left), i)} + ${elemJava(b, elementType(right), i)};
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): ArrayAdd =
      copy(left = l, right = r)
  }

  /** Product-quantization encode + reconstruct in ONE compact kernel
    * (round 12): for each of the m subspaces, argmin of squared L2
    * distance from the input's s-th `dsub`-slice to that subspace's
    * codewords (ties → lowest codeword, the [[NearestCentroid]]
    * contract), emitting the chosen codewords concatenated — exactly
    * the `concat(element_at(cb_s, nearestCentroid(slice(v, …)) + 1))`
    * composition it replaces, bit-for-bit (same slice offsets, same
    * distance fold order, same tie resolution, same short-tail
    * min-length guard).
    *
    * Why a fused expression and not the composition: m unrolled
    * argmin subtrees (each with its own slice allocation and inline
    * codeword literals) generate a whole-stage function past the
    * JVM JIT's ~8 KB huge-method threshold — UNDER Spark's 64 KB
    * hugeMethodLimit, so no warning fires and the entire fused stage
    * (scan, joins, dots included) silently runs in the bytecode
    * interpreter. Measured on the sf1 e62 encode stage: 45.8
    * task-seconds composed vs 9-ish with the stage de-fused; this
    * kernel keeps the stage fused AND compiles to one small JIT-able
    * triple loop over a referenced codebook tensor. */
  case class PqReconstruct(child: Expression,
                           codebooks: Array[Array[Array[Double]]],
                           dsub: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      checkNumericArrays("pq_reconstruct", Seq(child))
    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val et = elementType(child)
      val out = new Array[Double](codebooks.length * dsub)
      var s = 0
      while (s < codebooks.length) {
        val cb = codebooks(s)
        val off = s * dsub
        val rem = math.max(v.numElements() - off, 0)
        var best = -1; var bestD = Double.PositiveInfinity
        var c = 0
        while (c < cb.length) {
          val cw = cb(c)
          val n = math.min(cw.length, rem)
          var d = 0.0; var i = 0
          while (i < n) { val t = elemScala(v, et, off + i) - cw(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val chosen = cb(best)
        var j = 0
        while (j < dsub) { out(off + j) = chosen(j); j += 1 }
        s += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      nullSafeCodeGen(ctx, ev, a => {
        val (s, c, i, j, n) = (ctx.freshName("s"), ctx.freshName("c"),
          ctx.freshName("i"), ctx.freshName("j"), ctx.freshName("n"))
        val (off, rem, d, t, best, bestD, out) = (ctx.freshName("off"),
          ctx.freshName("rem"), ctx.freshName("d"), ctx.freshName("t"),
          ctx.freshName("best"), ctx.freshName("bestD"), ctx.freshName("out"))
        val idx = ctx.freshName("idx")
        s"""
           |double[] $out = new double[$cbs.length * $dsub];
           |for (int $s = 0; $s < $cbs.length; $s++) {
           |  double[][] cb = $cbs[$s];
           |  int $off = $s * $dsub;
           |  int $rem = java.lang.Math.max($a.numElements() - $off, 0);
           |  int $best = -1;
           |  double $bestD = Double.POSITIVE_INFINITY;
           |  for (int $c = 0; $c < cb.length; $c++) {
           |    double[] cw = cb[$c];
           |    int $n = java.lang.Math.min(cw.length, $rem);
           |    double $d = 0.0;
           |    for (int $i = 0; $i < $n; $i++) {
           |      int $idx = $off + $i;
           |      double $t = ${elemJava(a, elementType(child), idx)} - cw[$i];
           |      $d += $t * $t;
           |    }
           |    if ($d < $bestD) { $bestD = $d; $best = $c; }
           |  }
           |  double[] chosen = cb[$best];
           |  for (int $j = 0; $j < $dsub; $j++) { $out[$off + $j] = chosen[$j]; }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): PqReconstruct =
      copy(child = c)
  }

  /** The assignment half of [[PqReconstruct]]: per subspace, the
    * argmin codeword id (ties → lowest), as array<int> — the fused
    * replacement for the m-way `array(nearestCentroid(slice(v, …)))`
    * unroll in the codebook-fit update, which had the same silent
    * JIT huge-method failure mode as the reconstruct composition. */
  case class PqAssign(child: Expression,
                      codebooks: Array[Array[Array[Double]]],
                      dsub: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult =
      checkNumericArrays("pq_assign", Seq(child))
    override protected def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val et = elementType(child)
      val out = new Array[Int](codebooks.length)
      var s = 0
      while (s < codebooks.length) {
        val cb = codebooks(s)
        val off = s * dsub
        val rem = math.max(v.numElements() - off, 0)
        var best = -1; var bestD = Double.PositiveInfinity
        var c = 0
        while (c < cb.length) {
          val cw = cb(c)
          val n = math.min(cw.length, rem)
          var d = 0.0; var i = 0
          while (i < n) { val t = elemScala(v, et, off + i) - cw(i); d += t * t; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(s) = best
        s += 1
      }
      ArrayData.toArrayData(out)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      nullSafeCodeGen(ctx, ev, a => {
        val (s, c, i, n) = (ctx.freshName("s"), ctx.freshName("c"),
          ctx.freshName("i"), ctx.freshName("n"))
        val (off, rem, d, t, best, bestD, out) = (ctx.freshName("off"),
          ctx.freshName("rem"), ctx.freshName("d"), ctx.freshName("t"),
          ctx.freshName("best"), ctx.freshName("bestD"), ctx.freshName("out"))
        val idx = ctx.freshName("idx")
        s"""
           |int[] $out = new int[$cbs.length];
           |for (int $s = 0; $s < $cbs.length; $s++) {
           |  double[][] cb = $cbs[$s];
           |  int $off = $s * $dsub;
           |  int $rem = java.lang.Math.max($a.numElements() - $off, 0);
           |  int $best = -1;
           |  double $bestD = Double.POSITIVE_INFINITY;
           |  for (int $c = 0; $c < cb.length; $c++) {
           |    double[] cw = cb[$c];
           |    int $n = java.lang.Math.min(cw.length, $rem);
           |    double $d = 0.0;
           |    for (int $i = 0; $i < $n; $i++) {
           |      int $idx = $off + $i;
           |      double $t = ${elemJava(a, elementType(child), idx)} - cw[$i];
           |      $d += $t * $t;
           |    }
           |    if ($d < $bestD) { $bestD = $d; $best = $c; }
           |  }
           |  $out[$s] = $best;
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): PqAssign =
      copy(child = c)
  }

  // ---------------- Column-level entry points ----------------

  def arrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def arrayNorm2(a: Column): Column =
    ColumnBridge.column(ArrayNorm2(ColumnBridge.expression(a)))

  def nearestCentroid(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(v), centroids))

  def centroidDistances(v: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(CentroidDistances(ColumnBridge.expression(v), centroids))

  def planeSignature(v: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(PlaneSignature(ColumnBridge.expression(v), planes))

  def arrayAbsMax(a: Column): Column =
    ColumnBridge.column(ArrayAbsMax(ColumnBridge.expression(a)))

  def quantizeInt8(v: Column, scale: Column): Column =
    ColumnBridge.column(QuantizeInt8(ColumnBridge.expression(v), ColumnBridge.expression(scale)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def arraySub(a: Column, b: Column): Column =
    ColumnBridge.column(ArraySub(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def arrayAdd(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayAdd(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def pqReconstruct(v: Column, codebooks: Array[Array[Array[Double]]],
                    dsub: Int): Column = {
    require(codebooks.nonEmpty && codebooks.forall(cb =>
      cb.nonEmpty && cb.forall(_.length == dsub)),
      s"every codeword must be dsub=$dsub wide")
    ColumnBridge.column(PqReconstruct(ColumnBridge.expression(v), codebooks, dsub))
  }

  def pqAssign(v: Column, codebooks: Array[Array[Array[Double]]],
               dsub: Int): Column = {
    require(codebooks.nonEmpty && codebooks.forall(cb =>
      cb.nonEmpty && cb.forall(_.length == dsub)),
      s"every codeword must be dsub=$dsub wide")
    ColumnBridge.column(PqAssign(ColumnBridge.expression(v), codebooks, dsub))
  }
}
