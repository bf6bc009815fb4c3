package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampType}

/** Whole-plan optimizer rule: BINNED RANGE JOIN.
  *
  * An inner join whose only cross-side predicate is a band
  * (`lo <= point AND point <= hi`, each bound from the opposite side)
  * has no equi key, so Spark's only physical strategies are
  * BroadcastNestedLoopJoin (dies when neither side broadcasts) or a
  * cartesian product (dies always at 100 TB). The standard fix —
  * what Databricks' range-join optimization and KDB's window joins do,
  * and what this repo's hand-written range queries do manually — is to
  * quantize the range dimension into fixed-width bins: the point side
  * computes its single bin, the interval side EXPLODES into the bins
  * its `[lo, hi]` overlaps, the join becomes an EQUI join on bin
  * (hash-partitionable, AQE-skew-splittable), and the original band
  * predicate stays as the residual filter. A point lies in exactly one
  * bin, so each qualifying pair matches exactly once — no dedup step.
  * Cost: the interval side replicates by `len/width + 1` rows (the
  * user picks `width` near the typical interval length, the classic
  * dial); pairs compared shrink from |L|·|R| to pairs sharing a bin.
  *
  * Null semantics are preserved without special cases: a null point
  * bins to null (equi join drops it — the inner join would too), a
  * null bound makes `sequence()` null and `explode` emits nothing
  * (ditto).
  *
  * The rewrite fires only when
  *   - `spark.graft.rangeJoin.binWidth` (in the point column's native
  *     integer units; SECONDS for timestamps) is set positive on the
  *     session — the width is a semantic choice only the user can make;
  *   - the join is INNER — or LEFT/RIGHT OUTER with the PRESERVED side
  *     being the point side (the rewrite never duplicates the point
  *     side, so outer null-row semantics survive verbatim; a preserved
  *     interval side would emit one null row per bin) — with NO
  *     extractable equi conjunct (if one exists Spark already
  *     hash-joins on it and the band is a fine residual);
  *   - both sides' stats exceed `autoBroadcastJoinThreshold` (a
  *     broadcastable side makes BNLJ acceptable) — overridable with
  *     `spark.graft.rangeJoin.force=true` for fixture-scale witnesses.
  *
  * Registered two ways (same object):
  *   - [[GraftSparkExtensions]] for `spark.sql.extensions=` config
  *     (cluster deployments; injected into the operator-optimization
  *     fixed point, hence the rewrite is idempotent: the produced join
  *     HAS an equi conjunct, so it is ineligible on re-visit);
  *   - `session.experimental.extraOptimizations` for an already-built
  *     session (how the registered witness installs it).
  */
object RangeJoinBinning extends Rule[LogicalPlan] with PredicateHelper {

  val WidthKey = "spark.graft.rangeJoin.binWidth"
  val ForceKey = "spark.graft.rangeJoin.force"

  /** Band `lo <= point <= hi` with `point` from one join side and both
    * bounds from the other. */
  private case class Band(point: Expression, lo: Expression, hi: Expression,
                          pointOnLeft: Boolean)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val width = conf.getConfString(WidthKey, "0").toLong
    if (width <= 0) plan
    else plan.transformUp {
      case j @ Join(_, _, Inner | LeftOuter | RightOuter, Some(_), _) =>
        rewrite(j, width).getOrElse(j)
    }
  }

  /** Types whose values cast to Long losslessly enough to bin on
    * (timestamps cast to epoch SECONDS — the bin width's unit). */
  private def binnable(e: Expression): Boolean = e.dataType match {
    case LongType | IntegerType | TimestampType | DateType => true
    case _ => false
  }

  private def rewrite(j: Join, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    // Some(true)=references only the left side, Some(false)=only right
    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(j.left.outputSet)) Some(true)
      else if (e.references.subsetOf(j.right.outputSet)) Some(false)
      else None
    val hasEqui = conjuncts.exists {
      case Equality(a, b) =>
        (side(a), side(b)) match {
          case (Some(x), Some(y)) => x != y
          case _                  => false
        }
      case _ => false
    }
    if (hasEqui) return None
    val force = conf.getConfString(ForceKey, "false").toBoolean
    if (!force) {
      val thr = conf.autoBroadcastJoinThreshold
      if (thr > 0 && (j.left.stats.sizeInBytes <= thr ||
            j.right.stats.sizeInBytes <= thr)) return None
    }
    // normalize every comparison conjunct to (small, big) = small <= big
    // (strict < binned as <= — the residual keeps exact strictness)
    val ordered: Seq[(Expression, Expression)] = conjuncts.collect {
      case LessThanOrEqual(a, b)    => (a, b)
      case LessThan(a, b)           => (a, b)
      case GreaterThanOrEqual(a, b) => (b, a)
      case GreaterThan(a, b)        => (b, a)
    }
    val bands = for {
      (lo, p1) <- ordered // lower bound: lo <= p1
      (p2, hi) <- ordered // upper bound: p2 <= hi
      if p1.semanticEquals(p2) && binnable(p1)
      ps <- side(p1).toSeq
      ls <- side(lo).toSeq if ls != ps
      hs <- side(hi).toSeq if hs == ls
      // OUTER joins are rewritable only when the PRESERVED side is the
      // POINT side: the point side is never duplicated by the rewrite,
      // so "no row satisfies the full condition → one null row" is
      // preserved verbatim. A preserved INTERVAL side explodes into
      // its bins and an unmatched interval would emit one null row PER
      // BIN — so that shape stays with the vanilla planner.
      if (j.joinType match {
        case Inner      => true
        case LeftOuter  => ps   // point on the left (preserved) side
        case RightOuter => !ps  // point on the right (preserved) side
        case _          => false
      })
    } yield Band(p1, lo, hi, pointOnLeft = ps)
    bands.headOption.map(buildPlan(j, _, width))
  }

  /** DateType cannot `Cast` to LongType in Spark 4 (DATATYPE_MISMATCH at
    * plan validation — an optimizer-built invalid cast would fail the
    * whole query, not fall back); dates bin through `UnixDate` (days
    * since epoch, so the bin width's unit for dates is DAYS). */
  private def asLong(e: Expression): Expression = e.dataType match {
    case LongType => e
    case DateType => Cast(UnixDate(e), LongType)
    case _        => Cast(e, LongType)
  }

  /** Expressions built INSIDE the optimizer skip the analyzer, so any
    * TimeZoneAwareExpression (Cast from timestamp, Sequence) must get
    * its timeZoneId stamped here or the plan validator rejects the
    * rewrite as newly-unresolved. */
  private def withTz(e: Expression): Expression = e.transformUp {
    case tz: TimeZoneAwareExpression if tz.timeZoneId.isEmpty =>
      tz.withTimeZone(conf.sessionLocalTimeZone)
  }

  /** floor(v / w), exact for negative v too (integer division alone
    * truncates toward zero): (v − pmod(v, w)) div w. */
  private def binOf(e: Expression, w: Long): Expression = {
    val v = asLong(e)
    withTz(IntegralDivide(Subtract(v, Pmod(v, Literal(w))), Literal(w)))
  }

  private def buildPlan(j: Join, b: Band, w: Long): LogicalPlan = {
    val (pointSide, intervalSide) =
      if (b.pointOnLeft) (j.left, j.right) else (j.right, j.left)
    val pbin = Alias(binOf(b.point, w), "__graft_point_bin")()
    val pointProj = Project(pointSide.output :+ pbin, pointSide)
    val binLo = binOf(b.lo, w)
    val binHi = binOf(b.hi, w)
    // an inverted interval (lo > hi) matches nothing in the original
    // join but would make Sequence THROW ("illegal boundaries"); the
    // If keeps it — and null bounds, which fall to the else branch —
    // at the original semantics: zero rows out of the explode
    val emptyBins =
      Literal.create(Array.empty[Long],
        org.apache.spark.sql.types.ArrayType(LongType, containsNull = false))
    val binSeq = If(LessThanOrEqual(binLo, binHi),
      withTz(Sequence(binLo, binHi, Some(Literal(1L)): Option[Expression])),
      emptyBins)
    val binAttr = AttributeReference("__graft_bin", LongType, nullable = false)()
    val gen = Generate(Explode(binSeq), unrequiredChildIndex = Nil,
      outer = false, qualifier = None, generatorOutput = Seq(binAttr),
      child = intervalSide)
    val (newLeft, newRight) =
      if (b.pointOnLeft) (pointProj, gen) else (gen, pointProj)
    val cond = And(EqualTo(pbin.toAttribute, binAttr), j.condition.get)
    Project(j.output, Join(newLeft, newRight, j.joinType, Some(cond), j.hint))
  }
}

/** `spark.sql.extensions=graft.plans.GraftSparkExtensions` — the
  * cluster-deployment registration path for graft's plan extensions:
  * the binned-range-join optimizer rule plus the SQL registrations of
  * every native expression ([[graft.functions.GraftFunctions]]). */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => RangeJoinBinning)
    graft.functions.GraftFunctions.entries.foreach(ext.injectFunction)
  }
}
