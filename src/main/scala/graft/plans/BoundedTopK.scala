package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, DenseRank, EqualTo, Expression, IntegerLiteral, LessThan,
  LessThanOrEqual, Literal, NamedExpression, PredicateHelper, Rank, RowNumber,
  SortOrder, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{
  Filter, GlobalLimit, Limit, LocalLimit, LogicalPlan, Sort, Window,
  WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (`SparkSessionExtensions.injectOptimizerRule`, the
  * Rule[LogicalPlan] extension point): BOUND the unpartitioned
  * row_number top-k window.
  *
  * `row_number().over(Window.orderBy(...))` followed by `rn <= k` is the
  * natural way to write "globally rank, keep the best k" — and it is a
  * scale defect Spark does not fix on its own: the Window has no
  * partition spec, so EVERY input row moves to ONE task for the sort
  * (WindowGroupLimit prunes per-partition for partitioned windows, but
  * the final single-partition sort of the whole input remains; this
  * exact pathology was found in our own vocabulary builder, where the
  * candidate set at web scale is hundreds of millions of rows).
  *
  * The algebraic fix this rule applies mechanically: only rows that
  * survive `rn <= k` can influence the output, and those are exactly the
  * first k rows in the window order — so insert `Limit(k, Sort(order))`
  * BELOW the window. Catalyst plans that pair as TakeOrderedAndProject
  * (distributed map-side top-k + a bounded k-row merge), and the window
  * then re-ranks only k survivors: the single partition still exists but
  * holds k rows, never the corpus. Row numbers are unchanged because any
  * order-consistent prefix of length k assigns the same ranks 1..k
  * (under ties the choice of prefix is arbitrary — exactly as arbitrary
  * as row_number itself).
  *
  * Fires only on the provably-safe shape:
  *  - a Filter DIRECTLY above a Window (predicate pushdown has already
  *    moved intervening Projects aside by the time user rules run);
  *  - the window computes ONLY row_number() over an UNPARTITIONED,
  *    ordered spec (any other window function, e.g. a sum over the full
  *    frame, must see all rows — rewriting would change its value);
  *  - some conjunct bounds that row_number by an integer literal
  *    (`rn <= k`, `rn < k`, `rn = k`, or the mirrored forms). Other
  *    conjuncts are untouched — the original Filter stays on top.
  *
  * The rule is idempotent (required: user rules run inside a
  * fixed-point batch): a window whose child is already a
  * same-order Limit+Sort with a bound <= k is left alone. */
object BoundGlobalTopK extends Rule[LogicalPlan] with PredicateHelper {

  /** The literal upper bound this conjunct places on `rn`, if any. */
  private def boundOf(conjunct: Expression, rn: Attribute): Option[Int] =
    conjunct match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
      case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
      case EqualTo(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
      case EqualTo(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
      case GreaterThanOrEqualSwapped(a, k) if a.semanticEquals(rn) => Some(k)
      case _ => None
    }

  /** `k >= rn` / `k > rn` with the literal on the left. */
  private object GreaterThanOrEqualSwapped {
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual}
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) => Some((a, k))
      case GreaterThan(IntegerLiteral(k), a: Attribute) => Some((a, k - 1))
      case _ => None
    }
  }

  /** Is this window's child already bounded by an order-compatible
    * Limit+Sort with bound <= k? (idempotence guard) */
  private def alreadyBounded(child: LogicalPlan, order: Seq[SortOrder],
                             k: Int): Boolean = child match {
    case GlobalLimit(IntegerLiteral(k2),
        LocalLimit(_, Sort(so, true, _, _))) =>
      k2 <= k && so.length == order.length &&
        so.zip(order).forall { case (a, b) => a.semanticEquals(b) }
    case _ => false
  }

  private def isRowNumberOnly(exprs: Seq[NamedExpression]): Option[Attribute] =
    exprs match {
      case Seq(a @ Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(Nil, os, _)), _)) if os.nonEmpty =>
        Some(a.toAttribute)
      case _ => None
    }

  /** rank()/dense_rank() as the sole window function over an
    * UNPARTITIONED ordered spec. These can tie: `rank <= k` may keep
    * MORE than k rows (every member of the tie group straddling position
    * k survives), so the row_number rewrite — `Limit(k, Sort)` — would
    * silently drop tied rows. The ties-safe bound is the logical
    * [[WindowGroupLimit]] node instead: its Partial mode prunes each map
    * partition to the rows whose PARTITION-LOCAL rank ≤ k (a superset of
    * the global survivors, k plus local ties), so the single final
    * partition receives O(tasks·(k+ties)) rows, never the corpus.
    * Spark's own InferWindowGroupLimit inserts the same node, but only
    * below `spark.sql.optimizer.windowGroupLimitThreshold` and only for
    * the shapes it recognizes; this path closes the defect class
    * mechanically whenever that rule has not already fired. */
  private def isRankLikeOnly(exprs: Seq[NamedExpression]): Option[(Attribute, Expression)] =
    exprs match {
      case Seq(a @ Alias(WindowExpression(r: Rank,
          WindowSpecDefinition(Nil, os, _)), _)) if os.nonEmpty =>
        Some((a.toAttribute, r))
      case Seq(a @ Alias(WindowExpression(r: DenseRank,
          WindowSpecDefinition(Nil, os, _)), _)) if os.nonEmpty =>
        Some((a.toAttribute, r))
      case _ => None
    }

  /** Idempotence guard for the rank path: an order-compatible
    * WindowGroupLimit with limit <= k already bounds the child. */
  private def alreadyGroupLimited(child: LogicalPlan, order: Seq[SortOrder],
                                  k: Int): Boolean = child match {
    case WindowGroupLimit(Nil, so, _, k2, _) =>
      k2 <= k && so.length == order.length &&
        so.zip(order).forall { case (a, b) => a.semanticEquals(b) }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(wexprs, Nil, orderSpec, child, _)) =>
      def boundIn(rn: Attribute): Option[Int] =
        splitConjunctivePredicates(cond).flatMap(boundOf(_, rn))
          .reduceOption(math.min).filter(_ > 0)
      isRowNumberOnly(wexprs) match {
        case Some(rn) =>
          boundIn(rn) match {
            case Some(k) if !alreadyBounded(child, orderSpec, k) =>
              val bounded = Limit(Literal(k),
                Sort(orderSpec, global = true, child))
              f.copy(child = w.copy(child = bounded))
            case _ => f
          }
        case None => isRankLikeOnly(wexprs) match {
          case Some((rn, rankFn)) =>
            boundIn(rn) match {
              case Some(k) if !alreadyGroupLimited(child, orderSpec, k) =>
                val bounded = WindowGroupLimit(Nil, orderSpec, rankFn, k, child)
                f.copy(child = w.copy(child = bounded))
              case _ => f
            }
          case None => f
        }
      }
  }
}
