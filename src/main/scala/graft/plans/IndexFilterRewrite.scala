package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.PredicateHelper
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

import graft.operators.Indexes

/** Marker FileIndex for a scan already pruned by an index probe — makes
  * [[IndexFilterRewrite]] idempotent across optimizer re-runs (fixed-point
  * batches, AQE re-optimization).
  */
class IndexPrunedFileIndex(spark: SparkSession, files: Seq[Path])
    extends InMemoryFileIndex(spark, files, Map.empty, None)

/** The reference's automatic index rewrite (optimizer/physical/index/
  * IndexWhereProcessor.java, gated by HiveConf HIVEOPTINDEXFILTER
  * `hive.optimize.index.filter`, default false — same conf, same default):
  * a Filter over a file scan whose predicate constrains indexed columns is
  * re-planned to read only the files the index says can match.
  *
  * The reference emits a re-entrant index query whose result file feeds
  * HiveIndexedInputFormat's split filter; the Spark-native equivalent swaps
  * the relation's FileIndex for a pruned [[IndexPrunedFileIndex]] — the
  * driver-side probe (a filter over the tiny index summary) is the same
  * work its index-query stage does, and file-granular pruning is exactly
  * what FileSourceStrategy's scheduler skips. The ORIGINAL Filter is kept
  * untouched above the pruned scan, so the rewrite can only ever remove
  * whole files the index proves irrelevant — a stale or partial index
  * degrades the win, never the answer (files appended after the last
  * REBUILD are always retained; [[Indexes.pruneFiles]]).
  *
  * Scope guards: unpartitioned relations only (partitioned tables already
  * prune on partition columns — the reference indexes partitions
  * separately), and only conjuncts of the reference's supported comparison
  * shapes (=, <, <=, >, >=, IN against constants — IndexPredicateAnalyzer)
  * probe the index; everything else stays residual in the Filter.
  */
class IndexFilterRewrite(spark: SparkSession) extends Rule[LogicalPlan]
    with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!spark.conf.get("hive.optimize.index.filter", "false").toBoolean) plan
    else plan.transformUp {
      case f @ Filter(cond, rel: LogicalRelation) =>
        rel.relation match {
          case fs: HadoopFsRelation
              if fs.partitionSchema.isEmpty &&
                !fs.location.isInstanceOf[IndexPrunedFileIndex] =>
            Indexes.ensureLoaded(spark) // durable registry: first use reloads
            val key = Indexes.rootKeyOf(fs.location.rootPaths.map(_.toString))
            val defs = Indexes.forRoot(key)
            if (defs.isEmpty) f
            else {
              val conjuncts = splitConjunctivePredicates(cond)
              // per index: AND of every conjunct it can serve
              val used = defs.flatMap { d =>
                val idxCols = d.cols.toSet
                val preds = conjuncts.flatMap(Indexes.toIndexPredicate(_, idxCols))
                preds.reduceOption(_ && _).map(d -> _)
              }
              if (used.isEmpty) f
              else Indexes.pruneFiles(spark, used,
                  fs.location.listFiles(Nil, Nil).flatMap(_.files)
                    .map(st => (st.getPath.toString, st.getLen))) match {
                case Some(files) =>
                  val pruned = new IndexPrunedFileIndex(spark,
                    files.map(new Path(_)))
                  f.copy(child = rel.copy(
                    relation = fs.copy(location = pruned)(fs.sparkSession)))
                case None => f
              }
            }
          case _ => f
        }
    }
}
