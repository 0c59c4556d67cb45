package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, LongType, TimestampType}

/** Optimizer rule: rewrite a PURE range join — an inner join whose only
  * cross-side predicates are a lower and an upper bound on one timestamp
  * ("point in interval") — into the bucketized equi-join of
  * [[graft.operators.RangeJoin]]. Spark plans the raw form as
  * BroadcastNestedLoopJoin, O(|intervals|·|points|); after the rewrite the
  * interval side explodes to fixed-width bins, the point side computes its
  * one bin, and the join is an EQUI-join on the bin with the original
  * range predicate kept as the exact refine — same rows (each qualifying
  * pair meets in exactly the point's bin), hash-joinable plan.
  *
  * This is the SURVEY §2 custom-`Rule` tier: the semantics are expressible
  * with the DataFrame API (RangeJoin.intervalJoin), but only the rule makes
  * them automatic for any `BETWEEN`-shaped join a user writes, including
  * plain SQL. Scope is deliberately conservative: inner joins, batch only,
  * timestamp bounds, deterministic bound expressions, and NO existing
  * cross-side equi predicate (those already hash-join with the range as a
  * residual). The rewritten join contains a bin equality, so the rule
  * cannot re-fire on its own output.
  *
  * Bin width comes from `spark.graft.rangejoin.bin.seconds` (default 3600);
  * set it near the typical interval length so the per-interval explode
  * stays ≤ 2 rows.
  *
  * Registered by [[graft.core.GraftExtensions]] (`injectOptimizerRule`) or
  * per-session via `spark.experimental.extraOptimizations`.
  */
object RangeJoinBinning extends Rule[LogicalPlan] with PredicateHelper {

  val BinSecondsConf = "spark.graft.rangejoin.bin.seconds"

  private def binMicros: Long = {
    val s = try SQLConf.get.getConfString(BinSecondsConf, "3600").toLong
            catch { case _: NumberFormatException => 3600L }
    math.max(1L, s) * 1000000L
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), _)
        if !left.isStreaming && !right.isStreaming =>
      rewrite(j, left, right, cond).getOrElse(j)
  }

  /** Some(true) if `e` references only `left`, Some(false) if only `right`,
    * None if neither or constant. */
  private def sideOf(e: Expression, left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val refs = e.references
    if (refs.isEmpty) None
    else if (refs.subsetOf(left.outputSet)) Some(true)
    else if (refs.subsetOf(right.outputSet)) Some(false)
    else None
  }

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)

    def crossSide(a: Expression, b: Expression): Boolean =
      (for (sa <- sideOf(a, left, right); sb <- sideOf(b, left, right))
        yield sa != sb).getOrElse(false)

    // an existing cross-side equi predicate already makes this a hash join
    if (conjuncts.exists { case EqualTo(a, b) => crossSide(a, b); case _ => false })
      return None

    def ok(e: Expression): Boolean = e.deterministic && e.dataType == TimestampType

    // normalize each cross-side timestamp comparison to (lo, hi) meaning
    // lo ≤ hi (strictness only affects the exact refine, which keeps the
    // ORIGINAL predicate — bins are a superset either way)
    val ords = conjuncts.flatMap {
      case GreaterThanOrEqual(a, b) if crossSide(a, b) && ok(a) && ok(b) => Seq((b, a))
      case GreaterThan(a, b)        if crossSide(a, b) && ok(a) && ok(b) => Seq((b, a))
      case LessThanOrEqual(a, b)    if crossSide(a, b) && ok(a) && ok(b) => Seq((a, b))
      case LessThan(a, b)           if crossSide(a, b) && ok(a) && ok(b) => Seq((a, b))
      case _ => Nil
    }
    // a "point" X needs BOTH bounds from the other side: some (S, X) lower
    // and some (X, E) upper
    val candidates = for {
      (s, x)  <- ords
      (x2, e) <- ords if x2.semanticEquals(x)
    } yield (x, s, e)

    candidates.collectFirst {
      case (x, s, e)
          if sideOf(x, left, right).isDefined &&
            sideOf(s, left, right).isDefined &&
            sideOf(s, left, right) == sideOf(e, left, right) &&
            sideOf(x, left, right) != sideOf(s, left, right) =>
        val pointOnLeft = sideOf(x, left, right).get
        val (ptPlan, ivPlan) = if (pointOnLeft) (left, right) else (right, left)

        val w = Literal(binMicros)
        def binOf(t: Expression): Expression = {
          val u = UnixMicros(t)
          IntegralDivide(Subtract(u, Pmod(u, w)), w)
        }
        // descending Sequence would silently enumerate junk bins for a
        // malformed (end < start) interval; emit an empty bin array instead
        val binS = binOf(s)
        val binE = binOf(e)
        // containsNull must match Sequence's ArrayType(_, false) exactly —
        // If requires identical branch types, not just sameType. Sequence is
        // TimeZoneAwareExpression: post-analysis the rule must supply the
        // session zone itself (ResolveTimeZone has already run), else the
        // node stays unresolved and plan validation rejects the rewrite.
        val bins = If(GreaterThan(binS, binE),
          Literal.create(Seq.empty[Long], ArrayType(LongType, containsNull = false)),
          new Sequence(binS, binE, None, Some(SQLConf.get.sessionLocalTimeZone)))
        val ivBin = AttributeReference("__graft_bin_iv", LongType)()
        val genIv = Generate(Explode(bins), unrequiredChildIndex = Nil,
          outer = false, qualifier = None, generatorOutput = Seq(ivBin), child = ivPlan)
        val ptAlias = Alias(binOf(x), "__graft_bin_pt")()
        val projPt = Project(ptPlan.output :+ ptAlias, ptPlan)
        val newCond = And(EqualTo(ivBin, ptAlias.toAttribute), cond)
        val joined =
          if (pointOnLeft) Join(projPt, genIv, Inner, Some(newCond), j.hint)
          else Join(genIv, projPt, Inner, Some(newCond), j.hint)
        Project(j.output, joined)
    }
  }
}
