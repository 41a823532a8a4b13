package graft.core

/** Level-selection metrics for the quadratic projection
  * (/root/reference/src/s2/s2metrics.h:42-209, s2metrics.cc). A Metric's
  * value at level k is deriv * 2^(-dim*k). */
final class S2Metric(val deriv: Double, val dim: Int) {
  def value(level: Int): Double =
    java.lang.Math.scalb(deriv, -dim * level)

  /** Minimum level where the metric is at most `value`. */
  def levelForMaxValue(value: Double): Int = {
    if (!(value > 0)) return S2CellId.MaxLevel
    var level = java.lang.Math.getExponent(value / deriv)
    level = math.min(math.max(-(level >> (dim - 1)), 0), S2CellId.MaxLevel)
    level
  }

  /** Maximum level where the metric is at least `value`. */
  def levelForMinValue(value: Double): Int = {
    if (!(value > 0)) return S2CellId.MaxLevel
    var level = java.lang.Math.getExponent(deriv / value)
    level = math.min(math.max(level >> (dim - 1), 0), S2CellId.MaxLevel)
    level
  }

  def closestLevel(value: Double): Int =
    levelForMaxValue((if (dim == 1) math.sqrt(2) else 2.0) * value)
}

object S2Metrics {
  val MinAngleSpan = new S2Metric(4.0 / 3, 1)
  val MaxAngleSpan = new S2Metric(1.704897179199218452, 1)
  val AvgAngleSpan = new S2Metric(math.Pi / 2, 1)
  val MinWidth = new S2Metric(2 * math.sqrt(2.0) / 3, 1)
  val MaxWidth = new S2Metric(MaxAngleSpan.deriv, 1)
  val AvgWidth = new S2Metric(1.434523672886099389, 1)
  val MinEdge = new S2Metric(2 * math.sqrt(2.0) / 3, 1)
  val MaxEdge = new S2Metric(MaxAngleSpan.deriv, 1)
  val AvgEdge = new S2Metric(1.459213746386106062, 1)
  val MinDiag = new S2Metric(8 * math.sqrt(2.0) / 9, 1)
  val MaxDiag = new S2Metric(2.438654594434021032, 1)
  val AvgDiag = new S2Metric(2.060422738998471683, 1)
  val MinArea = new S2Metric(8 * math.sqrt(2.0) / 9, 2)
  val MaxArea = new S2Metric(2.635799256963161491, 2)
  val AvgArea = new S2Metric(4 * math.Pi / 6, 2)
  val MaxEdgeAspect = 1.442615274452682920
  val MaxDiagAspect = math.sqrt(3.0)
}

/** Earth-scale conversions (reference s2earth.h:40-146). */
object S2Earth {
  final val RadiusMeters = 6371010.0
  final val RadiusKm = RadiusMeters / 1000
  def metersToRadians(m: Double): Double = m / RadiusMeters
  def radiansToMeters(r: Double): Double = r * RadiusMeters
  def kmToRadians(km: Double): Double = km * 1000 / RadiusMeters
  def radiansToKm(r: Double): Double = r * RadiusKm
  def metersToChordAngle(m: Double): Double =
    S1ChordAngle.fromRadians(metersToRadians(m))
}
