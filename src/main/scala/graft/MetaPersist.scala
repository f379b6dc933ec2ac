package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Encoder, SparkSession}

/** Durable engine metadata (VERDICT r10 #4): the registries the reference
  * keeps in metastore tables — index definitions (`IDXS`), roles and role
  * membership (`ROLES`/`ROLE_MAP`), privilege grants (`TBL_PRIVS`/
  * `DB_PRIVS`), and table protect flags (`TABLE_PARAMS`) — persisted by
  * `ObjectStore.java:113`'s JDO layer in the reference, persisted here as
  * tiny parquet datasets under `<warehouse>/_graft_metastore/<name>`.
  *
  * Posture: persist-on-mutation (each DDL rewrites the small snapshot —
  * these are metadata-sized, never data-sized), load-on-first-use per JVM
  * (the `loadSigStore` reattach pattern, Dedup.scala): the first session
  * to touch a module against a warehouse re-reads what an earlier
  * application left there, so index pruning and authz enforcement survive
  * a restart instead of silently lapsing. Writes go through
  * [[graft.operators.Staging.stageAt]] — write-audit-publish, so a crash
  * mid-persist never corrupts the published snapshot.
  */
/** Persisted row shapes. Package-level (not nested in their owning
  * objects) so Spark's product-encoder codegen instantiates them without
  * an outer-instance fallback.
  */
private[graft] final case class RoleRow(role: String, createTime: Long)
private[graft] final case class MemberRow(user: String, role: String,
    grantTime: Long)
private[graft] final case class ModeRow(table: String, noDrop: Boolean,
    offline: Boolean)

object MetaPersist {

  private def root(spark: SparkSession): String =
    spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:") +
      "/_graft_metastore"

  private def dir(spark: SparkSession, name: String): String =
    root(spark) + "/" + name

  def save[T](spark: SparkSession, name: String, rows: Seq[T])(
      implicit enc: Encoder[T]): Unit =
    operators.Staging.stageAt(spark.createDataset(rows)(enc).toDF(),
      dir(spark, name))

  def load[T](spark: SparkSession, name: String)(
      implicit enc: Encoder[T]): Option[Seq[T]] = {
    val p = new Path(dir(spark, name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else Some(spark.read.schema(enc.schema).parquet(p.toString)
      .as[T].collect().toSeq)
  }

  def delete(spark: SparkSession, name: String): Unit = {
    val p = new Path(dir(spark, name))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }
}
