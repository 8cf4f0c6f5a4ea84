package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Inner, LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampType}

/** Optimizer rule that turns a naive trailing-window range join — plain SQL
  * `a JOIN b ON b.ts >= a.ts - C AND b.ts <= a.ts` (BETWEEN desugars to the
  * same pair; both BIGINT-micros `- C` and TIMESTAMP `- INTERVAL ...`
  * spellings match, the latter binned on `unix_micros`) — into the binned
  * equi-join
  * [[graft.operators.Advanced.rangeJoinBinned]] builds by hand: without an
  * equi-key Catalyst plans the full nested-loop product (quadratic;
  * unrunnable at 100 TB). The rule manufactures the key the optimizer can't
  * see: with bin width exactly C, a qualifying pair's endpoints sit in the
  * SAME or ADJACENT C-bins, so one side keeps its single bin and the other
  * explodes to its two candidate bins and ExtractEquiJoinKeys plans a hash
  * join; the untouched original predicate filters the candidates.
  *
  * Correctness by construction:
  *   - bins use FLOOR division `(x - pmod(x, C)) div C` (pmod is
  *     non-negative), so bin containment holds for negative timestamps too,
  *     where truncating `div` would floor the wrong way;
  *   - the two candidate bins are `bin` and `bin + 1` (resp. `bin - 1`) —
  *     always distinct, so an Inner pair meets on exactly one expansion row
  *     and no dedup is needed; Semi/Anti keep the LEFT side physically
  *     unique because only the right side ever explodes;
  *   - strict bounds (`<`, `>`) match too: their windows are subsets of the
  *     closed window the bins cover, and the residual enforces strictness.
  *
  * Skipped when the join already carries a cross-side equality — a keyed
  * range join (the as-of shape) hash-joins on that key already, and the
  * 2x expansion would only add work.
  */
object BlockRangeJoins extends Rule[LogicalPlan] with PredicateHelper {

  private val Marker = "__graft_rbin"

  private[plans] def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case _ => e
  }

  /** b >= a - C in either spelling; also strict `>`. Yields (b, a, C).
    * Two shapes: BIGINT micros (`a - <long literal>`) and TIMESTAMP
    * (`a - INTERVAL ...`, which the analyzer+folding turn into
    * `TimestampAddInterval(a, <negative DayTimeIntervalType literal>)` —
    * day-time intervals are stored as Long MICROS, so C comes out in the
    * same unit either way). */
  private[plans] object Lower {
    def unapply(e: Expression): Option[(Expression, Expression, Long)] = {
      def sub(y: Expression): Option[(Expression, Long)] = stripCast(y) match {
        case Subtract(a, Literal(c: Long, LongType), _) if c > 0 =>
          Some((stripCast(a), c))
        case ta: TimestampAddInterval =>
          (ta.children(0), ta.children(1)) match {
            case (a, Literal(c: Long, _: DayTimeIntervalType)) if c < 0 =>
              Some((stripCast(a), -c))
            case _ => None
          }
        case _ => None
      }
      e match {
        case GreaterThanOrEqual(x, y) =>
          sub(y).map { case (a, c) => (stripCast(x), a, c) }
        case GreaterThan(x, y) =>
          sub(y).map { case (a, c) => (stripCast(x), a, c) }
        case LessThanOrEqual(y, x) =>
          sub(y).map { case (a, c) => (stripCast(x), a, c) }
        case LessThan(y, x) =>
          sub(y).map { case (a, c) => (stripCast(x), a, c) }
        case _ => None
      }
    }
  }

  /** b <= a in either spelling; also strict. Yields (b, a). */
  private[plans] object Upper {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(x, y) => Some((stripCast(x), stripCast(y)))
      case LessThan(x, y) => Some((stripCast(x), stripCast(y)))
      case GreaterThanOrEqual(y, x) => Some((stripCast(x), stripCast(y)))
      case GreaterThan(y, x) => Some((stripCast(x), stripCast(y)))
      case _ => None
    }
  }

  /** floor(x / c) for longs via the non-negative pmod. */
  private[plans] def floorDiv(x: Expression, c: Long): Expression =
    IntegralDivide(Subtract(x, Pmod(x, Literal(c))), Literal(c))

  /** The Long-micros view of a window endpoint: identity for BIGINT
    * columns, `unix_micros` for TIMESTAMP ones (NOT `cast(ts as bigint)`,
    * which is SECONDS and would silently coarsen the bins and — in the
    * prefix rewrite — the probe points themselves). */
  private[plans] def micros(x: Expression): Expression =
    if (x.dataType == TimestampType) UnixMicros(x) else x

  /** Both endpoints carry a type the rules can window over, same on both
    * sides: BIGINT micros or TIMESTAMP. */
  private[plans] def windowableTypes(b: Expression, a: Expression): Boolean =
    (b.dataType == LongType && a.dataType == LongType) ||
      (b.dataType == TimestampType && a.dataType == TimestampType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, jt @ (Inner | LeftSemi | LeftAnti), Some(cond), hint)
        if !(l.output ++ r.output).exists(_.name.startsWith(Marker)) =>
      val conj = splitConjunctivePredicates(cond)
      def crossSide(x: Expression, y: Expression): Boolean = {
        val (rx, ry) = (x.references, y.references)
        rx.nonEmpty && ry.nonEmpty &&
          ((rx.subsetOf(l.outputSet) && ry.subsetOf(r.outputSet)) ||
            (rx.subsetOf(r.outputSet) && ry.subsetOf(l.outputSet)))
      }
      val hasEqui = conj.exists {
        case EqualTo(x, y) => crossSide(x, y)
        case _ => false
      }
      val hit = if (hasEqui) None else {
        val lowers = conj.collect { case Lower(b, a, c) => (b, a, c) }
        val uppers = conj.collect { case Upper(b, a) => (b, a) }
        lowers.collectFirst {
          case (b, a, c)
              if windowableTypes(b, a) && crossSide(b, a) &&
                uppers.exists(u =>
                  u._1.semanticEquals(b) && u._2.semanticEquals(a)) =>
            (b, a, c)
        }
      }
      hit match {
        case Some((b, a, c)) =>
          // the side holding the left child's refs keeps its single bin;
          // the right child explodes to its two candidates
          val bOnLeft = b.references.subsetOf(l.outputSet)
          val (leftVar, rightVar) = if (bOnLeft) (b, a) else (a, b)
          val rightBin = floorDiv(micros(rightVar), c)
          // left owns b (window point): right 'a' spans [bin-1, bin];
          // left owns a (window end):   right 'b' spans [bin, bin+1]
          val candidates =
            if (bOnLeft) Seq(Subtract(rightBin, Literal(1L)), rightBin)
            else Seq(rightBin, Add(rightBin, Literal(1L)))
          val binAttr = AttributeReference(s"${Marker}_r", LongType,
            nullable = true)()
          val rightExp = Generate(Explode(CreateArray(candidates)),
            Nil, outer = false, None, Seq(binAttr), r)
          val lbAlias = Alias(floorDiv(micros(leftVar), c), s"${Marker}_l")()
          val leftKeyed = Project(l.output :+ lbAlias, l)
          Project(j.output,
            Join(leftKeyed, rightExp, jt,
              Some(And(cond, EqualTo(lbAlias.toAttribute, binAttr))), hint))
        case None => j
      }
  }
}

object RangeJoin {
  /** Idempotently install the range-join rewrites (mirrors
    * [[SpatialJoin.register]]; also injected build-time by
    * [[GraftExtensions]]). Delegates to [[RangeAgg.register]] so the
    * prefix-aggregate collapse always sits AHEAD of the binning rule —
    * an aggregated range join must match before its join is binned. */
  def register(spark: SparkSession): Unit = RangeAgg.register(spark)
}
