package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** EXPORT TABLE t [PARTITION (spec)] TO 'dir' /
  * IMPORT [[EXTERNAL] TABLE t [PARTITION (spec)]] FROM 'dir' [LOCATION 'loc']
  * (ref parse/ExportSemanticAnalyzer.java:1, ImportSemanticAnalyzer.java:1,
  * grammar Hive.g:309-317; layout EximUtil: a `_metadata` descriptor beside
  * a `data/` directory, partitioned exports laid out one directory per
  * partition value).
  *
  * Spark-first re-expression: the data payload is parquet written by the
  * engine (the reference copies raw storage files; byte-level storage compat
  * is out of scope per SURVEY §7.5), and `_metadata` carries the table name,
  * Catalyst schema JSON, and the export's partition columns instead of a
  * Thrift-serialized Hive Table object. A partitioned export writes
  * `data/pcol=value/...` via partitionBy — the same directory-per-partition
  * layout EximUtil produces, which also lets IMPORT PARTITION prune to the
  * requested spec at the parquet scan, not post-filter. IMPORT EXTERNAL
  * materializes the payload at LOCATION and registers an unmanaged table
  * over it (DROP keeps the files — Hive external semantics). Paths go
  * through the Hadoop FileSystem API, so any defaultFS-reachable scheme
  * works on a cluster, not just local disk.
  */
object HiveExim {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** `k='v', k2=3, k3` → ordered pairs (values unquoted; a bare column
    * name — Hive's dynamic-partition spec form — carries no value and
    * means "partition by this column, all values").
    */
  def parsePartSpec(spec: String): Seq[(String, Option[String])] =
    spec.split(",").filter(_.trim.nonEmpty).toSeq.map { kv =>
      kv.split("=", 2).map(_.trim) match {
        case Array(k) => k -> None
        case Array(k, v) => k -> Some(
          v.stripPrefix("'").stripSuffix("'").stripPrefix("\"").stripSuffix("\""))
      }
    }

  def exportTable(spark: SparkSession, table: String, dir: String,
      partSpec: Seq[(String, Option[String])] = Nil): Unit = {
    val df0 = spark.table(table)
    val root = new Path(dir)
    val f = fs(spark, root)
    // reference behavior: target may exist only as an empty directory
    // (ExportSemanticAnalyzer "Target is not a directory" / "not empty")
    if (f.exists(root) && f.listStatus(root).nonEmpty)
      throw new IllegalArgumentException(
        s"EXPORT target $dir exists and is not empty")
    val partCols = partSpec.map(_._1)
    partCols.foreach { c =>
      require(df0.columns.exists(_.equalsIgnoreCase(c)),
        s"EXPORT PARTITION column $c not in ${table}")
    }
    val df = partSpec.foldLeft(df0) {
      case (d, (k, Some(v))) => d.filter(col(k) === lit(v))
      case (d, (_, None)) => d // bare column: all its partitions
    }
    val w = df.write.mode(SaveMode.ErrorIfExists)
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .parquet(new Path(root, "data").toString)
    // record the TABLE's partitioning (not just the export spec's): the
    // import side rebuilds the table from this descriptor, and a
    // partitioned table must come back partitioned (exim_02/04/15-20)
    val metaOpt =
      try {
        val ti = spark.sessionState.sqlParser.parseTableIdentifier(table)
        Some(spark.sessionState.catalog.getTableMetadata(ti))
      } catch { case scala.util.control.NonFatal(_) => None }
    val tablePartCols = metaOpt.map(_.partitionColumnNames).getOrElse(partCols)
    val pjson = tablePartCols.map(c => s""""$c"""").mkString("[", ",", "]")
    // storage descriptor facts for the import-side compat check
    // (ImportSemanticAnalyzer.checkTable — exim_06..11 negatives)
    val provider = metaOpt.flatMap(_.provider).getOrElse("")
    // Export/Import is a FILE move in the reference — a storage-handler
    // (non-native) table has no files to move (exim_12_nonnative_export.q)
    if (provider.contains(".kv.") || provider.toLowerCase.contains("handler"))
      throw new IllegalArgumentException(
        "Export/Import cannot be done for a non-native table.")
    val bucketN = metaOpt.flatMap(m => m.bucketSpec.map(_.numBuckets)
      .orElse(m.properties.get("graft.hive.bucket.n").map(_.toInt))).getOrElse(-1)
    val sortCols = metaOpt.flatMap(m => m.bucketSpec.map(_.sortColumnNames.mkString(","))
      .orElse(m.properties.get("graft.hive.bucket.sort"))).getOrElse("")
    val meta = s"""{"table":"${table.split('.').last}",""" +
      s""""provider":"$provider","bucketN":$bucketN,"sortCols":"$sortCols",""" +
      s""""partitionColumns":$pjson,"schema":${df.schema.json}}"""
    val out = f.create(new Path(root, "_metadata"), false)
    try out.write(meta.getBytes("UTF-8")) finally out.close()
  }

  def importTable(spark: SparkSession, table: Option[String], dir: String,
      partSpec: Seq[(String, Option[String])] = Nil, external: Boolean = false,
      location: Option[String] = None): Unit = {
    val root = new Path(dir)
    val f = fs(spark, root)
    val in = f.open(new Path(root, "_metadata"))
    val meta = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    // minimal descriptor parse: the exported name is the first "table" field
    val name = table.getOrElse {
      """"table"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(meta)
        .map(_.group(1))
        .getOrElse(throw new IllegalArgumentException(
          s"no table name in $dir/_metadata and none given"))
    }
    // ImportSemanticAnalyzer marks the target a write entity: an existing
    // table needs Update, a to-be-created one needs Create
    // (exim_23/24/25_import_*_authfail.q)
    if (graft.Authz.enabled(spark)) {
      val user = graft.Authz.currentUser(spark)
      val priv = if (spark.catalog.tableExists(name)) "Update" else "Create"
      if (!graft.Authz.holds(spark, user, priv, name))
        throw new SecurityException(
          s"Authorization failed:No privilege '$priv' found for outputs " +
            s"{ database:${spark.catalog.currentDatabase}, table:$name}. " +
            "Use show grant to get more details.")
    }
    // IMPORT EXTERNAL without LOCATION (exim_11/18_part_external.q): the
    // table's storage stays INSIDE the export directory — removing the
    // export removes the data, the reference's external contract (its
    // post-rm selects return empty); a partition-spec import materializes
    // just that slice there
    val effLocation = location.orElse(
      if (external) Some(new Path(root, "data_" +
        java.util.UUID.randomUUID.toString.take(8)).toString)
      else None)
    val raw = spark.read.parquet(new Path(root, "data").toString)
    // restore the EXPORTED schema (the reference loads against the
    // serialized Table descriptor): a partitioned export moves partition
    // columns into directory names, and reading them back PATH-INFERS
    // types (k=5 comes back INT where the source column was BIGINT) and
    // appends them last — cast and reorder to the recorded schema
    val df0 = """"schema"\s*:""".r.findFirstMatchIn(meta) match {
      case Some(m) =>
        val schemaJson = meta.substring(m.end, meta.lastIndexOf('}'))
        val schema = org.apache.spark.sql.types.DataType.fromJson(schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        raw.select(schema.fields.map(f => col(f.name).cast(f.dataType)).toIndexedSeq: _*)
      case None => raw // pre-r6 export without a schema record
    }
    // partition pruning happens at the scan: the export's partitionBy
    // layout makes the spec a directory filter, not a row filter
    val df = partSpec.foldLeft(df0) { case (d, (k, vOpt)) =>
      require(d.columns.exists(_.equalsIgnoreCase(k)),
        s"IMPORT PARTITION column $k not in export at $dir")
      val v = vOpt.getOrElse(throw new IllegalArgumentException(
        s"IMPORT PARTITION needs a value for $k (got a bare column)"))
      d.filter(col(k) === lit(v))
    }
    // ImportSemanticAnalyzer: load into an existing (compatible) table,
    // create it when absent. insertInto is POSITIONAL, so align to the
    // target's column order by name first — a same-columns-different-order
    // table would otherwise silently store misaligned data (the reference
    // checks table compatibility before loading); a missing column fails
    // loudly in the select
    // ImportSemanticAnalyzer.checkTable / checkPaths (the exim_01..21
    // clientnegative battery): an EXISTING target must be storage- and
    // partitioning-compatible with the export, partition imports must
    // name a full exported spec, and a whole-table import never lands on
    // a table that already holds data.
    val exportedPartCols = """"partitionColumns"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(meta).map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
    if (partSpec.nonEmpty && exportedPartCols.nonEmpty &&
        partSpec.map(_._1.toLowerCase).toSet !=
          exportedPartCols.map(_.toLowerCase).toSet)
      throw new IllegalArgumentException(
        "Partition not found - Specified partition not found in import directory")
    val exportedProvider = """"provider"\s*:\s*"([^"]*)"""".r
      .findFirstMatchIn(meta).map(_.group(1)).filter(_.nonEmpty)
    val exportedBucketN = """"bucketN"\s*:\s*(-?\d+)""".r
      .findFirstMatchIn(meta).map(_.group(1).toInt).getOrElse(-1)
    // a partition-spec import whose slice matched nothing in the export
    // (checkPaths — exim_18_part_spec_missing.q)
    if (partSpec.nonEmpty && df.isEmpty)
      throw new IllegalArgumentException(
        "Partition not found - Specified partition not found in import directory")
    if (spark.catalog.tableExists(name)) {
      val emeta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(name))
      if (emeta.partitionColumnNames.map(_.toLowerCase) !=
          exportedPartCols.map(_.toLowerCase))
        throw new IllegalArgumentException(
          "The existing table is not compatible with the import spec. " +
            "Partition Schema does not match")
      // exact column schema equality (checkTable — exim_03/04/05): the
      // reference refuses ANY name/type delta; a silent widening cast (or
      // a narrowing null-out) is corruption at scale
      val exportedSchema = df.schema.map(f =>
        f.name.toLowerCase -> f.dataType.catalogString)
      val existingSchema = emeta.schema.map(f =>
        f.name.toLowerCase -> f.dataType.catalogString)
      if (exportedSchema != existingSchema)
        throw new IllegalArgumentException(
          "The existing table is not compatible with the import spec. " +
            "Column Schema does not match")
      if (emeta.provider.exists(p2 => p2.contains(".kv.") ||
          p2.toLowerCase.contains("handler")))
        throw new IllegalArgumentException(
          "Export/Import cannot be done for a non-native table.")
      exportedProvider.foreach { p =>
        if (emeta.provider.exists(ep => ep != p))
          throw new IllegalArgumentException(
            "The existing table is not compatible with the import spec. " +
              "Table inputformat/outputformats do not match")
      }
      val existingBucketN = emeta.bucketSpec.map(_.numBuckets)
        .orElse(emeta.properties.get("graft.hive.bucket.n").map(_.toInt))
        .getOrElse(-1)
      if (existingBucketN != exportedBucketN)
        throw new IllegalArgumentException(
          "The existing table is not compatible with the import spec. " +
            "Table bucketing spec does not match")
      val exportedSort = """"sortCols"\s*:\s*"([^"]*)"""".r
        .findFirstMatchIn(meta).map(_.group(1)).getOrElse("")
      val existingSort = emeta.bucketSpec.map(_.sortColumnNames.mkString(","))
        .orElse(emeta.properties.get("graft.hive.bucket.sort")).getOrElse("")
      if (exportedSort.toLowerCase != existingSort.toLowerCase)
        throw new IllegalArgumentException(
          "The existing table is not compatible with the import spec. " +
            "Table sorting spec does not match")
      // whole-table import with an explicit LOCATION must match the
      // existing table's location (exim_20_managed_location_over_existing.q)
      if (partSpec.isEmpty) location.foreach { loc =>
        val cur = new Path(emeta.location).toUri.getPath
        if (new Path(loc).toUri.getPath != cur)
          throw new IllegalArgumentException(
            "The existing table is not compatible with the import spec. " +
              "Location does not match")
      }
      if (external &&
          emeta.tableType == org.apache.spark.sql.catalyst.catalog.CatalogTableType.MANAGED)
        throw new IllegalArgumentException(
          "The existing table is not compatible with the import spec. " +
            "External table cannot overwrite existing table")
      if (partSpec.isEmpty && emeta.partitionColumnNames.isEmpty) {
        val loc = new Path(emeta.location)
        val efs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val hasData = efs.exists(loc) && efs.listStatus(loc).exists(st =>
          !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
        if (hasData) throw new IllegalArgumentException(
          "Table exists and contains data files")
      }
      if (partSpec.nonEmpty) {
        val specMap = partSpec.collect { case (k, Some(v)) =>
          k -> v.stripPrefix("'").stripSuffix("'")
            .stripPrefix("\"").stripSuffix("\"") }.toMap
        val exists = try spark.sessionState.catalog.listPartitions(
          spark.sessionState.sqlParser.parseTableIdentifier(name),
          Some(specMap)).nonEmpty catch { case _: Exception => false }
        if (exists) throw new IllegalArgumentException(
          "Partition already exists " + specMap.map { case (k, v) => s"$k=$v" }
            .mkString(","))
      }
    }
    if (spark.catalog.tableExists(name)) location match {
      case Some(loc) if partSpec.nonEmpty =>
        // partition bound to its OWN location (ImportSemanticAnalyzer's
        // AddPartitionDesc-with-location path — exim_16/17): materialize
        // the payload there in the table's format, then ADD PARTITION ...
        // LOCATION. Removing that directory later empties just this
        // partition, the reference's external-partition contract.
        val ti = spark.sessionState.sqlParser.parseTableIdentifier(name)
        val meta = spark.sessionState.catalog.getTableMetadata(ti)
        val dataCols = meta.schema
          .filterNot(fd => meta.partitionColumnNames.contains(fd.name))
          .map(_.name)
        df.select(dataCols.map(col).toIndexedSeq: _*).write.mode("overwrite")
          .format(meta.provider.getOrElse("parquet"))
          .options(meta.storage.properties).save(loc)
        val specSql = partSpec.collect {
          case (k, Some(v)) => s"$k='${v.stripPrefix("'").stripSuffix("'")
            .stripPrefix("\"").stripSuffix("\"")}'" }.mkString(", ")
        graft.HiveQl.sql(spark,
          s"ALTER TABLE $name ADD IF NOT EXISTS PARTITION ($specSql) LOCATION '$loc'")
        spark.catalog.refreshTable(name)
      case _ =>
        // load into the existing (compatible) table — a partition-spec
        // import appends just that partition under the table's own
        // storage, for EXTERNAL targets too (exim_15: the reference
        // copies the slice into the table's location; removing the
        // export afterwards does not touch it)
        df.select(spark.table(name).columns.map(col).toIndexedSeq: _*)
          .write.insertInto(name)
    } else {
      // recreate WITH the exported partitioning (ImportSemanticAnalyzer
      // builds the table from the serialized descriptor — exim_04's
      // evolved partitioned table must come back partitioned)
      val partCols = """"partitionColumns"\s*:\s*\[([^\]]*)\]""".r
        .findFirstMatchIn(meta).map(_.group(1)).getOrElse("")
        .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\""))
        .filter(_.nonEmpty).toSeq
      val w0 = df.write
      val w = if (partCols.nonEmpty) w0.partitionBy(partCols: _*) else w0
      effLocation match {
        case Some(loc) =>
          // unmanaged (external) table over the materialized payload: DROP
          // leaves the files, like a Hive EXTERNAL table
          w.option("path", loc).saveAsTable(name)
        case None => w.saveAsTable(name)
      }
    }
  }
}
