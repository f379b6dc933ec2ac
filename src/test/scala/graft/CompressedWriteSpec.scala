package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Compressed writes for the hivetext/hiveseq FileFormats (VERDICT r10
  * #7): the reference's Text/SequenceFile writers honor
  * `mapred.output.compress` (+codec/type) — HiveIgnoreKeyTextOutputFormat
  * .java, HiveSequenceFileOutputFormat.java. Reads need no work:
  * LineRecordReader resolves text codecs from the extension (and the
  * format's isSplitable already falls back to whole-file),
  * SequenceFileRecordReader reads its container's codec natively.
  */
class CompressedWriteSpec extends SparkSpec {

  private def src = Tables.load(spark, sfDir, "nation")
    .select(col("n_nationkey"), col("n_name"),
      when(col("n_nationkey") % 7 === 0, lit(null)).otherwise(col("n_regionkey"))
        .as("maybe_region"))

  test("hivetext: gzip and deflate option round trips, codec extension on disk") {
    for ((codec, ext) <- Seq("gzip" -> ".txt.gz", "deflate" -> ".txt.deflate")) {
      val dir = Files.createTempDirectory(s"graft-txt-$codec").toString
      src.repartition(2).write.format("graft.sources.HiveTextSource")
        .option("compression", codec).mode("overwrite").save(dir)
      val files = new java.io.File(dir).listFiles
        .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
      assert(files.nonEmpty && files.forall(_.getName.endsWith(ext)),
        s"$codec files must carry $ext: ${files.map(_.getName).toSeq}")
      val back = spark.read.format("graft.sources.HiveTextSource")
        .schema(src.schema).load(dir)
      assert(back.orderBy("n_nationkey").collect().toSeq ==
        src.orderBy("n_nationkey").collect().toSeq, s"$codec round trip")
    }
  }

  test("hiveseq: record- and block-compressed containers round trip") {
    for (ctype <- Seq("RECORD", "BLOCK")) {
      val dir = Files.createTempDirectory(s"graft-seq-$ctype").toString
      src.repartition(2).write.format("graft.sources.HiveSeqSource")
        .option("compression", "deflate").option("compression.type", ctype)
        .mode("overwrite").save(dir)
      // the container itself must record compression (SEQ header flags)
      val f = new java.io.File(dir).listFiles
        .filter(f => f.isFile && f.getName.endsWith(".seq")).head
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      // SEQ6 header: ... after key/value class names come two booleans:
      // compressed?, blockCompressed? — find them via the Hadoop reader
      val reader = new org.apache.hadoop.io.SequenceFile.Reader(
        spark.sparkContext.hadoopConfiguration,
        org.apache.hadoop.io.SequenceFile.Reader.file(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath)))
      try {
        assert(reader.isCompressed, s"$ctype container must be compressed")
        assert(reader.isBlockCompressed == (ctype == "BLOCK"))
        assert(reader.getCompressionCodec.getClass.getSimpleName == "DefaultCodec")
      } finally reader.close()
      assert(bytes.take(3).map(_.toChar).mkString == "SEQ")
      val back = spark.read.format("graft.sources.HiveSeqSource")
        .schema(src.schema).load(dir)
      assert(back.orderBy("n_nationkey").collect().toSeq ==
        src.orderBy("n_nationkey").collect().toSeq, s"$ctype round trip")
    }
  }

  test("the reference's conf names drive compression: SET mapred.output.compress") {
    spark.sql("DROP TABLE IF EXISTS comp_conf_t")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "comp_conf_t"))
    HiveQl.sql(spark, "SET mapred.output.compress=true")
    HiveQl.sql(spark,
      "SET mapred.output.compression.codec=org.apache.hadoop.io.compress.GzipCodec")
    try {
      HiveQl.sql(spark, "CREATE TABLE comp_conf_t(k INT, v STRING) STORED AS TEXTFILE")
      HiveQl.sql(spark, "INSERT INTO comp_conf_t SELECT 1, 'x'")
    } finally {
      spark.conf.unset("mapred.output.compress")
      spark.conf.unset("mapred.output.compression.codec")
    }
    val loc = spark.sql("DESCRIBE FORMATTED comp_conf_t").collect()
      .find(_.getString(0).trim == "Location").get.getString(1).trim
    val files = new java.io.File(new java.net.URI(loc).getPath).listFiles
      .filter(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(files.nonEmpty && files.forall(_.getName.endsWith(".txt.gz")),
      s"conf-driven gzip: ${files.map(_.getName).toSeq}")
    assert(HiveQl.sql(spark, "SELECT k, v FROM comp_conf_t").collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq == Seq((1, "x")))
    spark.sql("DROP TABLE comp_conf_t")
  }
}
