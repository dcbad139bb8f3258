package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared codegen helper: the Java source snippet reading element `i` of
  * ArrayData variable `arr` as a primitive double, for a numeric element
  * type known at codegen time (so the per-element type dispatch happens
  * once, not per row per element). */
private[functions] object VectorCodegen {
  def readAsDouble(arr: String, i: String, dt: DataType): String = dt match {
    case DoubleType     => s"$arr.getDouble($i)"
    case FloatType      => s"(double) $arr.getFloat($i)"
    case LongType       => s"(double) $arr.getLong($i)"
    case IntegerType    => s"(double) $arr.getInt($i)"
    case ShortType      => s"(double) $arr.getShort($i)"
    case ByteType       => s"(double) $arr.getByte($i)"
    case d: DecimalType => s"$arr.getDecimal($i, ${d.precision}, ${d.scale}).toDouble()"
    case other => throw new UnsupportedOperationException(s"vector codegen: $other")
  }
}

/** Cosine distance `1 - cos_sim(l, r)` over two numeric arrays.
  *
  * Re-expression of the reference's vector delta
  * (ratatool-diffy/src/main/scala/com/spotify/ratatool/diffy/Diffy.scala:168-184):
  * asserts equal length and non-emptiness there; here mismatched/empty/null
  * input yields SQL NULL instead of throwing, which composes with the delta
  * dispatch (`UnknownDelta` in the reference becomes a null delta row).
  *
  * Single-pass accumulation of dot/normL/normR in element order, all in
  * double — deterministic bit-for-bit for a given input, and partition-local
  * (no shuffle). Full `doGenCode` (not CodegenFallback): the loop inlines
  * into whole-stage codegen with element accessors specialized at codegen
  * time, so the O(pairs × dim) filters it anchors (SemDedup pair step, ANN
  * rerank, embedding near-dup verify) stay in one fused stage with zero
  * boxing. The generated accumulation order matches nullSafeEval exactly —
  * both paths are bit-identical.
  */
case class CosineDistance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(et, _) if et.isInstanceOf[NumericType] => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"cosine_distance expects two numeric arrays, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
    }

  @transient private lazy val lType = elemType(left).get
  @transient private lazy val rType = elemType(right).get

  private def toDouble(a: ArrayData, i: Int, dt: DataType): Double = dt match {
    case DoubleType  => a.getDouble(i)
    case FloatType   => a.getFloat(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new UnsupportedOperationException(s"cosine_distance: $other")
  }

  override def nullSafeEval(lv: Any, rv: Any): Any = {
    val la = lv.asInstanceOf[ArrayData]
    val ra = rv.asInstanceOf[ArrayData]
    val n = la.numElements()
    if (n == 0 || n != ra.numElements()) return null
    var dot = 0.0; var nl = 0.0; var nr = 0.0
    var i = 0
    while (i < n) {
      if (la.isNullAt(i) || ra.isNullAt(i)) return null
      val x = toDouble(la, i, lType)
      val y = toDouble(ra, i, rType)
      dot += x * y; nl += x * x; nr += y * y
      i += 1
    }
    if (nl == 0.0 || nr == 0.0) return null
    1.0 - dot / (math.sqrt(nl) * math.sqrt(nr))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGen = left.genCode(ctx)
    val rGen = right.genCode(ctx)
    val la = lGen.value; val ra = rGen.value
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot"); val nl = ctx.freshName("nl")
    val nr = ctx.freshName("nr")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    val elemNull = ctx.freshName("elemNull")
    val resultCode =
      s"""
         |int $n = $la.numElements();
         |if ($n != 0 && $n == $ra.numElements()) {
         |  double $dot = 0.0; double $nl = 0.0; double $nr = 0.0;
         |  boolean $elemNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($la.isNullAt($i) || $ra.isNullAt($i)) { $elemNull = true; break; }
         |    double $x = ${VectorCodegen.readAsDouble(la, i, lType)};
         |    double $y = ${VectorCodegen.readAsDouble(ra, i, rType)};
         |    $dot += $x * $y; $nl += $x * $x; $nr += $y * $y;
         |  }
         |  if (!$elemNull && $nl != 0.0 && $nr != 0.0) {
         |    ${ev.isNull} = false;
         |    ${ev.value} = 1.0 - $dot / (java.lang.Math.sqrt($nl) * java.lang.Math.sqrt($nr));
         |  }
         |}
       """.stripMargin
    ev.copy(code = code"""
      ${lGen.code}
      ${rGen.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${lGen.isNull} && !${rGen.isNull}) {
        $resultCode
      }
    """)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** LSH sign-pattern bucket id: all `planes.size` hyperplane dot products
  * of one vector in a single pass — `array<numeric> -> bigint` where bit b
  * is set iff `dot(vec, planes(b)) >= 0`. Replaces a per-bit
  * aggregate(zip_with(...)) expression tree (bits × tables separate array
  * traversals per row) with one traversal; the hyperplanes are generated
  * driver-side from a seed and embedded in the expression, not captured in
  * closures. Engine extension (ANN path of the training-data surface). */
case class LshSignBits(child: Expression, planes: Seq[Seq[Double]])
  extends UnaryExpression {

  require(planes.nonEmpty && planes.size <= 63, s"need 1..63 planes, got ${planes.size}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et.isInstanceOf[NumericType] => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sign_bits expects a numeric array, got ${other.catalogString}")
  }

  @transient private lazy val et =
    child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    evalFromArray(v.asInstanceOf[ArrayData])

  /** Public entry shared by the interpreted path and the generated code
    * (generated classes live outside this package, so `protected
    * nullSafeEval` is not callable from them). */
  def evalFromArray(arr: ArrayData): Long = {
    val n = arr.numElements()
    var bits = 0L
    var b = 0
    while (b < planeArr.length) {
      val plane = planeArr(b)
      val m = math.min(n, plane.length)
      var dot = 0.0
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) dot += toD(arr, i) * plane(i)
        i += 1
      }
      if (dot >= 0.0) bits |= (1L << b)
      b += 1
    }
    bits
  }

  private def toD(a: ArrayData, i: Int): Double = et match {
    case DoubleType  => a.getDouble(i)
    case FloatType   => a.getFloat(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new UnsupportedOperationException(s"lsh_sign_bits: $other")
  }

  // Not CodegenFallback: the child stays codegen'd (no interpreted
  // re-evaluation of the whole subtree, no INPUT_ROW dependence) and the
  // compiled multi-plane loop is invoked through one reference-object
  // call — the plane table (63 × dim doubles) lives once per task in the
  // expression instance, not in generated source.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshSignBits", this, classOf[LshSignBits].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.evalFromArray($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Dense plane projection: `array<numeric> -> array<double>` of dot
  * products against a driver-embedded plane table — the matvec kernel
  * behind Johnson–Lindenstrauss random projection
  * ([[graft.ext.Embeddings.randomProject]]). Same construction as
  * [[LshSignBits]] (which keeps only the signs): not CodegenFallback,
  * one reference-object call per row, plane table lives once per task.
  * Null/empty input and non-finite elements follow the vector-expression
  * contract: null in → null out; shorter vectors project over the
  * overlapping dims.
  */
case class ProjectPlanes(child: Expression, planes: Seq[Seq[Double]])
  extends UnaryExpression {

  require(planes.nonEmpty, "need at least one plane")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et.isInstanceOf[NumericType] => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"project_planes expects a numeric array, got ${other.catalogString}")
  }

  @transient private lazy val et =
    child.dataType.asInstanceOf[ArrayType].elementType
  @transient private lazy val planeArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def nullSafeEval(v: Any): Any =
    evalFromArray(v.asInstanceOf[ArrayData])

  /** Public entry shared by the interpreted path and the generated code. */
  def evalFromArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Double](planeArr.length)
    var b = 0
    while (b < planeArr.length) {
      val plane = planeArr(b)
      val m = math.min(n, plane.length)
      var dot = 0.0
      var i = 0
      while (i < m) {
        if (!arr.isNullAt(i)) dot += toD(arr, i) * plane(i)
        i += 1
      }
      out(b) = dot
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  private def toD(a: ArrayData, i: Int): Double = et match {
    case DoubleType  => a.getDouble(i)
    case FloatType   => a.getFloat(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new UnsupportedOperationException(s"project_planes: $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("projectPlanes", this, classOf[ProjectPlanes].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.evalFromArray($c);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** IVF/PQ quantizer assignment: the `nprobe` nearest centroid indices of
  * a vector, most-similar first — `array<numeric> -> array<int>`. One
  * pass over the vector per centroid, centroids embedded driver-side
  * (trained by k-means on a corpus sample), no closure capture. Corpus
  * rows assign with nprobe=1; queries probe several inverted lists.
  * Engine extension (ANN path of the training-data surface).
  *
  * `metric`: "cosine" (the IVF coarse-quantizer default — direction
  * only; zero-norm input degrades to null because no direction exists)
  * or "l2" (Euclidean argmin, matching the k-means objective the
  * codebooks were trained under — the PQ assignment metric; zero-norm
  * input is a legitimate point and gets its nearest centroid). Null /
  * empty / non-finite / dim-mismatched input -> null under both.
  */
case class NearestCells(child: Expression, centroids: Seq[Seq[Double]], nprobe: Int,
                        metric: String = "cosine")
  extends UnaryExpression {

  require(metric == "cosine" || metric == "l2", s"unknown metric $metric")

  require(centroids.nonEmpty, "need at least one centroid")
  require(nprobe >= 1 && nprobe <= centroids.size,
    s"nprobe must be in 1..${centroids.size}, got $nprobe")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(et, _) if et.isInstanceOf[NumericType] => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects a numeric array, got ${other.catalogString}")
  }

  @transient private lazy val et =
    child.dataType.asInstanceOf[ArrayType].elementType
  // cosine: centroids pre-normalized once so the argmax is a plain dot.
  // l2: raw centroids with cached |c|² — argmin |x-c|² = argmax
  // (x·c - |c|²/2), the |x|² term being constant per row
  @transient private lazy val cents: Array[Array[Double]] =
    if (metric == "l2") centroids.map(_.toArray).toArray
    else centroids.map { c =>
      val a = c.toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      if (n == 0.0) a else a.map(_ / n)
    }.toArray
  @transient private lazy val halfNorm2: Array[Double] =
    cents.map(c => c.map(x => x * x).sum / 2.0)

  override def nullSafeEval(v: Any): Any =
    evalFromArray(v.asInstanceOf[ArrayData])

  /** Public entry shared by the interpreted path and the generated code;
    * returns null for the degenerate-input cases the scaladoc lists. */
  def evalFromArray(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    // a vector from a different model/dim would get a cell from a
    // truncated dot product — silently wrong; degrade to null like
    // CosineDistance does on length mismatch
    if (n != cents(0).length) return null
    val x = new Array[Double](n)
    var norm = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val d = toD(arr, i)
      // non-finite elements make dot products NaN/±Inf (Inf·0, Inf−Inf):
      // the argmax below could then never select a cell (NaN comparisons
      // are false → index -1) — degrade the row to null per contract
      if (!java.lang.Double.isFinite(d)) return null
      x(i) = d; norm += d * d
      i += 1
    }
    if (norm == 0.0 && metric == "cosine") return null
    val sims = new Array[Double](cents.length)
    var c = 0
    while (c < cents.length) {
      val cent = cents(c)
      val m = math.min(n, cent.length)
      var dot = 0.0
      var j = 0
      while (j < m) { dot += x(j) * cent(j); j += 1 }
      sims(c) = if (metric == "l2") dot - halfNorm2(c) else dot
      c += 1
    }
    // partial selection of the top-nprobe cells (nprobe is small)
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](cents.length)
    var k = 0
    while (k < nprobe) {
      // vector elements are finite (screened above) and centroids are
      // finite by construction, so sims are always orderable: best is
      // found on the first unvisited cell at the latest
      var best = -1; var bestSim = Double.NegativeInfinity
      var c2 = 0
      while (c2 < sims.length) {
        // ties broken by lower cell id for determinism
        if (!taken(c2) && (best < 0 || sims(c2) > bestSim)) { best = c2; bestSim = sims(c2) }
        c2 += 1
      }
      taken(best) = true; out(k) = best
      k += 1
    }
    new GenericArrayData(out)
  }

  // Not CodegenFallback: keeps the child codegen'd and the surrounding
  // stage fused; the compiled k×dim argmax loop is one reference-object
  // call. Result may be null on non-null input (zero-norm / dim-mismatch
  // / non-finite), so the null flag is reassigned from the call result
  // rather than using nullSafeCodeGen's iff-child-null contract.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("nearestCells", this, classOf[NearestCells].getName)
    val childGen = child.genCode(ctx)
    val adCls = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${childGen.code}
      boolean ${ev.isNull} = true;
      $adCls ${ev.value} = null;
      if (!${childGen.isNull}) {
        ${ev.value} = $ref.evalFromArray(${childGen.value});
        ${ev.isNull} = ${ev.value} == null;
      }
    """)
  }

  private def toD(a: ArrayData, i: Int): Double = et match {
    case DoubleType  => a.getDouble(i)
    case FloatType   => a.getFloat(i).toDouble
    case LongType    => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case ShortType   => a.getShort(i).toDouble
    case ByteType    => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new UnsupportedOperationException(s"nearest_cells: $other")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
