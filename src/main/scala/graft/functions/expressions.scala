package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.{S2CellId => CID}

/** Native Catalyst expressions for the hot scalar S2 kernels. All are
  * codegen-enabled (the generated code calls the static graft.core
  * kernels directly, so they stay inside whole-stage codegen) and
  * null-intolerant. */

/** (latDeg, lngDeg) → leaf cell id (the single hottest function;
  * reference s2cell_id.cc:267-315). */
case class S2CellIdFromLatLngDeg(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "s2_cellid"
  override protected def nullSafeEval(lat: Any, lng: Any): Any =
    CID.fromLatLngDegrees(lat.asInstanceOf[Double], lng.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.core.S2CellId.fromLatLngDegrees($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** (x, y, z) direction vector (any scale) → leaf cell id. */
case class S2CellIdFromXYZ(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "s2_cellid_xyz"
  override protected def nullSafeEval(x: Any, y: Any, z: Any): Any =
    CID.fromPoint(x.asInstanceOf[Double], y.asInstanceOf[Double], z.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y, z) => s"graft.core.S2CellId.fromPoint($x, $y, $z)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression) =
    copy(first = f, second = s, third = t)
}

/** (id, level) → ancestor cell id at the given level. */
case class S2Parent(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "s2_parent"
  override protected def nullSafeEval(id: Any, level: Any): Any =
    CID.parent(id.asInstanceOf[Long], level.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.core.S2CellId.parent($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class S2Level(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "s2_level"
  override protected def nullSafeEval(id: Any): Any =
    CID.level(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.core.S2CellId.level($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Order-preserving signed sort key for unsigned cell ids (id ^ MinValue);
  * range logic on faces 4-5 is silently wrong without it (SURVEY §7.4). */
case class S2OrderKey(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "s2_order_key"
  override protected def nullSafeEval(id: Any): Any =
    CID.orderKey(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"($a ^ java.lang.Long.MIN_VALUE)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class S2RangeMin(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "s2_range_min"
  override protected def nullSafeEval(id: Any): Any =
    CID.rangeMin(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.core.S2CellId.rangeMin($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class S2RangeMax(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "s2_range_max"
  override protected def nullSafeEval(id: Any): Any =
    CID.rangeMax(id.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.core.S2CellId.rangeMax($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** id → order-preserving hex token (reference s2cell_id.cc:217-254). */
case class S2Token(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "s2_token"
  override protected def nullSafeEval(id: Any): Any =
    UTF8String.fromString(CID.toToken(id.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(graft.core.S2CellId.toToken($a))")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class S2FromToken(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = LongType
  override def prettyName: String = "s2_cell_from_token"
  override protected def nullSafeEval(s: Any): Any =
    CID.fromToken(s.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.core.S2CellId.fromToken($a.toString())")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Cell-center latitude in degrees. */
case class S2CellCenterLat(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "s2_cell_center_lat"
  override protected def nullSafeEval(id: Any): Any =
    math.toDegrees(CID.toLatLng(id.asInstanceOf[Long])._1)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"java.lang.Math.toDegrees(graft.core.S2CellId.centerLatRadians($a))")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class S2CellCenterLng(child: Expression)
    extends UnaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = DoubleType
  override def prettyName: String = "s2_cell_center_lng"
  override protected def nullSafeEval(id: Any): Any =
    math.toDegrees(CID.toLatLng(id.asInstanceOf[Long])._2)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"java.lang.Math.toDegrees(graft.core.S2CellId.centerLngRadians($a))")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** (id) → common-ancestor level with a second id, for prefix joins. */
case class S2CommonAncestorLevel(left: Expression, right: Expression)
    extends BinaryExpression {
  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "s2_common_ancestor_level"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    CID.commonAncestorLevel(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.core.S2CellId.commonAncestorLevel($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}
