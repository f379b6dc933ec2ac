package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{FullOuter, LeftOuter, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Hive 0.8's `hive.outerjoin.supports.filters=false` outer-join semantics
  * (ref common/src/java/org/apache/hadoop/hive/conf/HiveConf.java —
  * HIVEOUTERJOINSUPPORTSFILTERS; exercised by
  * ql/src/test/queries/clientpositive/auto_join_filters.q's second half).
  *
  * With the conf at its default `true`, ON-clause filters on an outer join
  * behave per ANSI: a single-side predicate in the ON clause restricts which
  * rows MATCH but never drops preserved-side rows (they null-extend). With
  * the conf `false` the reference applies each single-table conjunct to the
  * join INPUT before joining — so `a LEFT OUTER JOIN b ON (a.key > 40 AND
  * b.key > 40 AND a.key = b.key)` filters BOTH streams first and the outer
  * join preserves only surviving rows. The reference goldens pin the
  * difference: auto_join_filters.q's 26 selects return one set of checksums
  * under `true` and collapse to the pre-filtered results under `false`
  * (auto_join_filters.q.out — every second-half checksum equals the
  * filtered inner result 3078400 where the first half differs).
  *
  * Implemented as a gated optimizer rule: split the ON conjunction, push
  * conjuncts referencing only one side into a Filter over that side, and
  * keep cross-side conjuncts (equi or not) as the join condition. The
  * rewrite is idempotent (after the push no single-side conjunct remains)
  * and fires only for LEFT/RIGHT/FULL OUTER — inner-join semantics are
  * identical either way, so Catalyst's own pushdown already covers them.
  */
class HiveOuterJoinFilters(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    !conf.getConfString("hive.outerjoin.supports.filters", "true").toBoolean

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case j @ Join(left, right, LeftOuter | RightOuter | FullOuter,
          Some(cond), _) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val (leftOnly, rest1) = conjuncts.partition(c =>
          c.references.nonEmpty && c.references.subsetOf(left.outputSet))
        val (rightOnly, rest) = rest1.partition(c =>
          c.references.nonEmpty && c.references.subsetOf(right.outputSet))
        if (leftOnly.isEmpty && rightOnly.isEmpty) j
        else {
          val nl = leftOnly.reduceOption(And).map(Filter(_, left)).getOrElse(left)
          val nr = rightOnly.reduceOption(And).map(Filter(_, right)).getOrElse(right)
          j.copy(left = nl, right = nr, condition = rest.reduceOption(And))
        }
    }
  }
}
