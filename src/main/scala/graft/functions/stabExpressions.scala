package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import graft.core._
import graft.operators.CellIntervalIndex

/** Native stab-and-refine expression for the broadcast contains join:
  * candidate labels from one binary search into the (plan-shipped)
  * CellIntervalIndex; interior hits skip the exact region test. Unlike a
  * Scala UDF there is no per-row argument boxing or CatalystTypeConverter
  * on the result — codegen passes primitives and the kernel returns
  * ArrayData directly. The index/regions ride the serialized plan to
  * executors (small: covering cells of a dimension-sized region set). */
case class S2StabMatch(first: Expression, second: Expression, third: Expression,
                       index: CellIntervalIndex,
                       regions: Array[(Int, S2Region)])
    extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def nullIntolerant: Boolean = true

  // O(1) label -> region lookup for the refine path (labels are small
  // ints; dense array when compact, hash map fallback) — rebuilt lazily
  // per executor after plan deserialization.
  @transient private lazy val denseByLabel: Array[S2Region] = {
    val maxLab = regions.iterator.map(_._1).max
    if (maxLab >= 0 && maxLab < math.max(1024, 4 * regions.length)) {
      val arr = new Array[S2Region](maxLab + 1)
      regions.foreach { case (l, r) => arr(l) = r }
      arr
    } else null
  }
  @transient private lazy val mapByLabel: java.util.HashMap[Int, S2Region] = {
    val m = new java.util.HashMap[Int, S2Region](regions.length * 2)
    regions.foreach { case (l, r) => m.put(l, r) }
    m
  }
  private def regionOf(lab: Int): S2Region = {
    val d = denseByLabel
    if (d != null) { if (lab >= 0 && lab < d.length) d(lab) else null }
    else mapByLabel.get(lab)
  }

  def kernel(cellOrd: Long, lat: Double, lng: Double): ArrayData = {
    var out: scala.collection.mutable.ArrayBuffer[Int] = null
    var p: V3 = null
    index.visit(cellOrd) { (lab, interior, _) =>
      val hit = interior || {
        if (p == null) p = V3.fromLatLngDegrees(lat, lng)
        val reg = regionOf(lab)
        reg != null && reg.contains(p)
      }
      if (hit) {
        if (out == null) out = new scala.collection.mutable.ArrayBuffer[Int](4)
        out += lab
      }
    }
    if (out == null) S2StabMatch.EmptyArray
    else new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(ord: Any, lat: Any, lng: Any): Any =
    kernel(ord.asInstanceOf[Long], lat.asInstanceOf[Double], lng.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stab", this, classOf[S2StabMatch].getName)
    defineCodeGen(ctx, ev, (o, la, ln) => s"$ref.kernel($o, $la, $ln)")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object S2StabMatch {
  val EmptyArray = new GenericArrayData(Array.emptyIntArray)
}

/** Native tile-assignment expression (S2RegionSharder semantics): leaf
  * stab into the tile interval index; unique hit returns directly,
  * overlapping tiles fall back to most-intersecting, miss returns
  * `default`. Same no-boxing rationale as [[S2StabMatch]]. */
case class S2TileAssign(child: Expression, index: CellIntervalIndex,
                        default: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def nullIntolerant: Boolean = true

  def kernel(cellId: Long): Int = {
    val ord = S2CellId.orderKey(cellId)
    val labs = index.labelsContaining(ord)
    if (labs.length == 1) labs(0)
    else if (labs.isEmpty) default
    else index.mostIntersecting(Array(cellId), default)
  }

  override def nullSafeEval(id: Any): Any = kernel(id.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("tileIdx", this, classOf[S2TileAssign].getName)
    defineCodeGen(ctx, ev, id => s"$ref.kernel($id)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
