package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** st_within_distance_km(lat1, lon1, lat2, lon2, km): haversine
  * great-circle distance ≤ km. Semantically just a predicate (and it
  * evaluates as one wherever it survives), but it is also the OPTIMIZER
  * CONTRACT for [[SpatialJoinRewrite]]: a join on this predicate is
  * rewritten from a nested-loop cartesian into a latitude-banded
  * equi-join — the engine's analogue of the reference's
  * ExtractSpatialJoins planning rule
  * (core/trino-main/.../iterative/rule/ExtractSpatialJoins.java:152). */
case class StWithinDistanceKm(lat1: Expression, lon1: Expression,
    lat2: Expression, lon2: Expression, radiusKm: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(lat1, lon1, lat2, lon2, radiusKm)
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "st_within_distance_km"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == DoubleType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires 5 DOUBLE arguments (lat1, lon1, lat2, lon2, km)")

  /** Same constants/shape as GeoFunctions.haversineKm (and its oracle). */
  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else {
      val Seq(la1, lo1, la2, lo2, r) = vs.map(_.asInstanceOf[Double])
      val dLat = math.toRadians(la2 - la1) / 2
      val dLon = math.toRadians(lo2 - lo1) / 2
      val h = math.sin(dLat) * math.sin(dLat) +
        math.cos(math.toRadians(la1)) * math.cos(math.toRadians(la2)) *
          math.sin(dLon) * math.sin(dLon)
      val dist = 2 * 6371.0088 * math.asin(math.sqrt(h))
      dist <= r
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(lat1 = newChildren(0), lon1 = newChildren(1),
      lat2 = newChildren(2), lon2 = newChildren(3), radiusKm = newChildren(4))
}

/** Optimizer rule (injected via SparkSessionExtensions in GraftSession):
  * an INNER join whose condition conjoins `st_within_distance_km(left.lat,
  * left.lon, right.lat, right.lon, R)` with R literal becomes a
  * LATITUDE-BANDED equi-join — the left side tagged with its band
  * `floor(lat / (R/111.045 deg))`, the right side replicated into the 3
  * adjacent bands (a Union of three tagged projections), joined on band
  * equality with the ORIGINAL condition kept as the exact residual.
  *
  * Latitude-only banding is chosen because a degree of latitude is
  * 111.045+ km EVERYWHERE on the sphere, so the 3-band neighborhood is
  * complete at any coordinate — no pole caveat, unlike fixed
  * longitude cells (the richer 2-D/KDB partitionings remain available as
  * explicit operators). At scale this turns |L|·|R| nested-loop work into
  * one shuffle on the band key with ~3× replication of one side.
  *
  * The band attributes carry a marker prefix; a join already carrying one
  * is left alone (idempotence under repeated optimizer batches). */
case class SpatialJoinRewrite() extends Rule[LogicalPlan] {

  private val Marker = "__graft_band"

  private def split(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => split(l) ++ split(r)
    case other => Seq(other)
  }

  private def refsOnly(es: Seq[Expression], side: LogicalPlan): Boolean =
    es.forall(e => e.references.nonEmpty && e.references.subsetOf(side.outputSet))

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if cond.references.forall(a => !a.name.startsWith(Marker)) =>
      val hit = split(cond).collectFirst {
        case wd @ StWithinDistanceKm(la1, lo1, la2, lo2, Literal(r: Double, DoubleType))
            if r > 0 && refsOnly(Seq(la1, lo1), left) && refsOnly(Seq(la2, lo2), right) =>
          (la1, la2, r)
        case wd @ StWithinDistanceKm(la1, lo1, la2, lo2, Literal(r: Double, DoubleType))
            if r > 0 && refsOnly(Seq(la1, lo1), right) && refsOnly(Seq(la2, lo2), left) =>
          (la2, la1, r)
      }
      hit match {
        case None => j
        case Some((latL, latR, r)) =>
          val dLat = Literal(r / 111.045) // ≥ r km of latitude per band
          def band(e: Expression): Expression = Floor(Divide(e, dLat))
          val leftTag = Alias(band(latL), s"${Marker}_l")()
          val leftP = Project(left.output :+ leftTag, left)
          def rightP(off: Long): Project =
            Project(right.output :+
              Alias(Add(band(latR), Literal(off)), s"${Marker}_r")(), right)
          val rightU = Union(Seq(rightP(-1L), rightP(0L), rightP(1L)))
          val bandEq = EqualTo(leftP.output.last, rightU.output.last)
          Project(j.output.toIndexedSeq,
            Join(leftP, rightU, Inner, Some(And(bandEq, cond)), hint))
      }
  }
}
