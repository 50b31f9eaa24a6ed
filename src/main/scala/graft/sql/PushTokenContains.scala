package graft.sql

import org.apache.spark.sql.catalyst.expressions.{And, ArrayContains, Attribute, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.IntegerType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.spark.GraftTable

/** Fold `array_contains(tokens, <int literal>)` filters over a graft DSv2
  * relation into the scan's token-containment PROBE, so the manifest's
  * [min_tok, max_tok] zone map + per-chunk TokenSketch prune chunks at
  * PLANNING time — a rare-token probe over a 100 TB table plans a handful
  * of chunks instead of all of them.
  *
  * Why a rule and not `SupportsPushDownV2Filters`: Spark 4.1's
  * V2ExpressionBuilder does not translate ArrayContains into a connector
  * Predicate (verified against the shipped catalyst bytecode — CONTAINS is
  * string containment; there is no ARRAY_CONTAINS scalar), so the
  * predicate physically cannot reach `pushPredicates`. Instead this rule
  * runs in the operator-optimization batch — BEFORE V2 scan pushdown
  * ("Pre CBO Rules" and the operator batches both precede "Early Filter
  * and Projection Push-Down" in Spark 4.1's optimizer) — and attaches the
  * probe as the relation's `containsToken` READ OPTION; the scan builder
  * then picks it up through the exact same code path as a user-supplied
  * option.
  *
  * Semantics are untouched: the Filter node stays in place (and the probe
  * is residual-checked row-by-row by the reader as well), only the set of
  * planned chunks shrinks — exactly the contract of the doc_id zone-map
  * pushdown. Only a TOP-LEVEL conjunct may prune (a disjunct
  * `array_contains(...) OR x` admits rows from every chunk). */
object PushTokenContains extends Rule[LogicalPlan] {

  private val Key = "containstoken"

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  private def probesIn(cond: Expression, tokens: Attribute): Seq[Int] =
    conjuncts(cond).collect {
      case ArrayContains(a: Attribute, Literal(v: Int, IntegerType))
          if a.semanticEquals(tokens) => v
    }.distinct

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, r: DataSourceV2Relation)
        if r.table.isInstanceOf[GraftTable] && !r.options.containsKey(Key) =>
      val vs = r.output.find(_.name == "tokens")
        .map(t => probesIn(cond, t)).getOrElse(Nil)
      if (vs.isEmpty) f
      else {
        // EVERY top-level array_contains conjunct prunes (AND semantics:
        // a chunk must zone/sketch-admit each probe to stay planned)
        val m = new java.util.HashMap[String, String](r.options)
        m.put(Key, vs.mkString(","))
        f.copy(child = r.copy(options = new CaseInsensitiveStringMap(m)))
      }
  }
}
