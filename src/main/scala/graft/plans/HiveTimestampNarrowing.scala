package graft.plans

import org.apache.spark.sql.catalyst.expressions.Cast
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType, LongType, TimestampNTZType, TimestampType}

/** Hive 0.8 timestamp→narrow-integer casts wrap like Java narrowing
  * (TimestampWritable → seconds, then `(byte)`/`(short)`/`(int)`;
  * timestamp_1.q golden: cast('2011-01-01 01:01:01' ts as tinyint) = 77
  * under PST = (byte)1293872461), where Spark's direct timestamp→byte/
  * short cast NULLs on overflow. Route the cast through BIGINT (epoch
  * seconds — identical in both engines) so the final long→narrow step
  * picks up Spark's non-ANSI truncating semantics = Java narrowing.
  *
  * Resolution-rule (not expression) so `.q`-ported SQL and DataFrame
  * casts both get it; the introduced casts stay whole-stage-codegen'd.
  */
object HiveTimestampNarrowing extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveExpressionsUp {
      case c @ Cast(child, ByteType | ShortType | IntegerType, tz, mode)
          if child.resolved && child.dataType == TimestampType =>
        Cast(Cast(child, LongType, tz, mode), c.dataType, tz, mode)
      // TIMESTAMP_NTZ (what Spark 4 infers for the fixtures' parquet
      // timestamps) has NO direct numeric cast at all — Hive 0.8 has one
      // timestamp type and casts it to any integer width. Route through
      // TIMESTAMP (identity on the epoch under the pinned UTC session) to
      // BIGINT, then narrow with the same truncating step. Found by the
      // r17 FuzzOracle battery (fz081-100), not by the .q corpus — the
      // corpus always casts string literals, which resolve to TIMESTAMP.
      case c @ Cast(child, ByteType | ShortType | IntegerType | LongType, tz, mode)
          if child.resolved && child.dataType == TimestampNTZType =>
        Cast(Cast(Cast(child, TimestampType, tz, mode), LongType, tz, mode),
          c.dataType, tz, mode)
    }
}
