package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

import graft.functions.GroupedTopK

/** Optimizer rule: rewrite the idiomatic-but-unscalable window top-k
  * pattern
  *
  * {{{
  *   df.withColumn("rn", row_number().over(
  *       Window.partitionBy(g…).orderBy($"ord".desc, $"id")))
  *     .filter($"rn" <= k)
  *     .select(…)
  * }}}
  *
  * into the bounded-heap [[GroupedTopK]] aggregate + posexplode. The
  * window form shuffles EVERY row to its group's partition and sorts it
  * (Spark's own InferWindowGroupLimit bounds the per-partition sort
  * input to k since 3.5, but the full-width rows still shuffle and a
  * per-partition sort still runs); the aggregate form ships at most k
  * (ord, id) pairs per group per map task via partial aggregation and
  * never sorts more than the k-element heap. At 100 TB that is the
  * difference between shuffling the corpus and shuffling O(groups × k).
  *
  * Guards (the rewrite fires ONLY when semantics provably coincide):
  *  - single row_number window expression, filtered `rn <= k` / `rn < k`
  *    with a literal k, immediately under a Project;
  *  - window ordering is exactly (ord DESC, id ASC) over non-nullable
  *    DOUBLE / BIGINT attributes ([[GroupedTopK]]'s heap order and type
  *    domain; null ords would rank NULLS LAST in the window but are
  *    skipped by the aggregate, so nullable inputs are left alone);
  *  - the Project references only grouping attributes, ord, id and rn
  *    (the aggregate carries nothing else through the shuffle).
  *
  * MEASURED trade (TopKProbe, 20M rows, local[32], k=5, xxhash64
  * scores): the rewrite wins on DEEP groups — 100 groups × 200k rows:
  * 0.74 s vs 1.78 s, ~2.4× (sort O(n log n) → heap O(n log k)) — and
  * loses badly on many-group shapes — 100k groups: 13.7 s vs 1.8 s;
  * 1M groups: 2.9 s vs 2.2 s — where Spark 4's InferWindowGroupLimit
  * already prunes the sort and shuffle to ~k rows per group per
  * partition and the codegen'd sort beats ObjectHashAggregate's
  * per-group heap objects + buffer serialization. Group
  * cardinality isn't knowable at optimization time without stats, so
  * the rule is CONFIG-GATED, default off:
  *
  *   spark.conf.set("spark.graft.windowTopKRewrite.enabled", "true")
  *
  * Registered via [[graft.functions.GraftExtensions]]
  * (`injectOptimizerRule`) or per-session with
  * `spark.experimental.extraOptimizations`; either way it no-ops until
  * the flag is set.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.windowTopKRewrite.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(EnabledKey, "false").toBoolean) return plan
    rewritePlan(plan)
  }

  private def rewritePlan(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
          Filter(cond,
            w @ Window(
              Seq(rnAlias @ Alias(
                WindowExpression(RowNumber(), WindowSpecDefinition(part, order, _)), _)),
              _, _, child, _))) =>
      rewrite(p, projectList, cond, rnAlias, part, order, child).getOrElse(p)
  }

  private def rewrite(
      p: Project,
      projectList: Seq[NamedExpression],
      cond: Expression,
      rnAlias: Alias,
      part: Seq[Expression],
      order: Seq[SortOrder],
      child: LogicalPlan): Option[LogicalPlan] = {
    val rnAttr = rnAlias.toAttribute

    // rn <= k (or rn < k+1), literal bound, nothing else in the filter
    val k: Int = cond match {
      case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
          if a.exprId == rnAttr.exprId => v
      case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
          if a.exprId == rnAttr.exprId => v - 1
      case _ => return None
    }
    if (k <= 0) return None

    // ordering shape: (ord DESC, id ASC) over non-nullable double/long attrs
    val (ordAttr, idAttr) = order match {
      case Seq(
          SortOrder(o: AttributeReference, Descending, _, _),
          SortOrder(i: AttributeReference, Ascending, _, _))
          if o.dataType == DoubleType && i.dataType == LongType &&
            !o.nullable && !i.nullable => (o, i)
      case _ => return None
    }

    // grouping keys must be plain child attributes (pass through the
    // aggregate with their exprIds intact)
    val groupAttrs: Seq[AttributeReference] = part.map {
      case a: AttributeReference => a
      case _ => return None
    }

    // the projection may use only what the aggregate can carry
    val allowed = AttributeSet(groupAttrs ++ Seq(ordAttr, idAttr, rnAttr))
    if (!p.references.subsetOf(allowed)) return None

    // Spark's InferWindowGroupLimit may already have inserted a
    // WindowGroupLimit below the Window (it runs in an earlier batch
    // than user rules). Once the aggregate takes over, that node only
    // keeps a per-partition sort alive — strip it.
    val cleanChild = child match {
      case wgl: WindowGroupLimit => wgl.child
      case other => other
    }

    val topAlias = Alias(
      GroupedTopK(ordAttr, idAttr, k).toAggregateExpression(), "graft_top")()
    val agg = Aggregate(groupAttrs, groupAttrs :+ topAlias, cleanChild)

    val elemType = StructType(Seq(
      StructField("ord", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false)))
    val posAttr = AttributeReference("graft_pos", IntegerType, nullable = false)()
    val colAttr = AttributeReference("graft_col", elemType, nullable = false)()
    val gen = Generate(
      PosExplode(topAlias.toAttribute),
      unrequiredChildIndex = Nil,
      outer = false,
      qualifier = None,
      generatorOutput = Seq(posAttr, colAttr),
      agg)

    // substitute ord/id/rn in the original projection, preserving the
    // output names and exprIds so parent operators are untouched
    def substitute(e: Expression): Expression = e.transformUp {
      case a: AttributeReference if a.exprId == ordAttr.exprId =>
        GetStructField(colAttr, 0, Some("ord"))
      case a: AttributeReference if a.exprId == idAttr.exprId =>
        GetStructField(colAttr, 1, Some("id"))
      case a: AttributeReference if a.exprId == rnAttr.exprId =>
        Add(posAttr, Literal(1))
    }
    val newProjectList = projectList.map { ne =>
      substitute(ne) match {
        case named: NamedExpression => named
        case other => Alias(other, ne.name)(exprId = ne.exprId)
      }
    }
    Some(Project(newProjectList, gen))
  }
}
