package graft.sources

import org.apache.hadoop.io.BytesWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The reference's `src_thrift` fixture (QTestUtil.java:478-509: a
  * SequenceFile of BytesWritable→BytesWritable records whose value is a
  * TBinaryProtocol-serialized `Complex` struct —
  * serde2/thrift_test/CreateSequenceFile.java builds data/files/complex.seq;
  * the Complex field ids are complex.thrift's: 1 aint i32, 2 astring
  * string, 3 lint list<i32>, 4 lstring list<string>, 5 lintstring
  * list<IntString{1 myint i32, 2 mystring string, 3 underscore_int i32}>,
  * 6 mstringstring map<string,string>).
  *
  * The decoder below is an original minimal TBinaryProtocol reader for
  * exactly this shape (field-header walk, big-endian ints, i32-framed
  * strings; unknown fields skipped by type) — enough to register the
  * reference's own complex.seq as a typed `src_thrift` view and run the
  * complex-type clientpositive queries against it. No Thrift runtime is
  * required or used.
  */
object HiveThriftSeq {

  val ComplexSchema: StructType = StructType(Seq(
    StructField("aint", IntegerType),
    StructField("astring", StringType),
    StructField("lint", ArrayType(IntegerType)),
    StructField("lstring", ArrayType(StringType)),
    StructField("lintstring", ArrayType(StructType(Seq(
      StructField("myint", IntegerType),
      StructField("mystring", StringType),
      StructField("underscore_int", IntegerType))))),
    StructField("mstringstring", MapType(StringType, StringType))))

  // TBinaryProtocol type codes
  private val TStop = 0
  private val TI32 = 8
  private val TString = 11
  private val TStruct = 12
  private val TMap = 13
  private val TList = 15

  private final class P(buf: Array[Byte]) {
    var pos = 0
    def u8(): Int = { val v = buf(pos) & 0xFF; pos += 1; v }
    def i16(): Int = { val v = ((buf(pos) & 0xFF) << 8) | (buf(pos + 1) & 0xFF); pos += 2; v }
    def i32(): Int = {
      val v = ((buf(pos) & 0xFF) << 24) | ((buf(pos + 1) & 0xFF) << 16) |
        ((buf(pos + 2) & 0xFF) << 8) | (buf(pos + 3) & 0xFF)
      pos += 4; v
    }
    def str(): String = {
      val n = i32()
      val s = new String(buf, pos, n, "UTF-8"); pos += n; s
    }
    def skip(tpe: Int): Unit = tpe match {
      case TI32 => pos += 4
      case TString => pos += i32()
      case TStruct =>
        var t = u8()
        while (t != TStop) { i16(); skip(t); t = u8() }
      case TList =>
        val et = u8(); val n = i32()
        (0 until n).foreach(_ => skip(et))
      case TMap =>
        val kt = u8(); val vt = u8(); val n = i32()
        (0 until n).foreach { _ => skip(kt); skip(vt) }
      case 2 => pos += 1 // bool
      case 3 => pos += 1 // byte
      case 4 | 10 => pos += 8 // double / i64
      case 6 => pos += 2 // i16
      case other => throw new IllegalArgumentException(
        s"thrift: cannot skip type $other")
    }
  }

  private def readIntString(p: P): Row = {
    var myint: Any = null; var mystring: Any = null; var u: Any = null
    var t = p.u8()
    while (t != TStop) {
      val id = p.i16()
      (id, t) match {
        case (1, TI32) => myint = p.i32()
        case (2, TString) => mystring = p.str()
        case (3, TI32) => u = p.i32()
        case _ => p.skip(t)
      }
      t = p.u8()
    }
    Row(myint, mystring, u)
  }

  /** One TBinaryProtocol `Complex` struct → a Row of [[ComplexSchema]].
    * Absent (thrift-null) fields stay null.
    */
  def decodeComplex(bytes: Array[Byte]): Row = {
    val p = new P(bytes)
    var aint: Any = null; var astring: Any = null
    var lint: Any = null; var lstring: Any = null
    var lintstring: Any = null; var mss: Any = null
    var t = p.u8()
    while (t != TStop) {
      val id = p.i16()
      (id, t) match {
        case (1, TI32) => aint = p.i32()
        case (2, TString) => astring = p.str()
        case (3, TList) =>
          val et = p.u8(); require(et == TI32, s"lint elem type $et")
          lint = Seq.fill(p.i32())(p.i32())
        case (4, TList) =>
          val et = p.u8(); require(et == TString, s"lstring elem type $et")
          lstring = Seq.fill(p.i32())(p.str())
        case (5, TList) =>
          val et = p.u8(); require(et == TStruct, s"lintstring elem type $et")
          lintstring = Seq.fill(p.i32())(readIntString(p))
        case (6, TMap) =>
          val kt = p.u8(); val vt = p.u8()
          require(kt == TString && vt == TString, s"mstringstring $kt/$vt")
          mss = Seq.fill(p.i32())((p.str(), p.str())).toMap
        case _ => p.skip(t)
      }
      t = p.u8()
    }
    Row(aint, astring, lint, lstring, lintstring, mss)
  }

  /** Read a BytesWritable→BytesWritable SequenceFile of Complex records
    * (the src_thrift table files) as a typed DataFrame.
    */
  def readComplex(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[org.apache.hadoop.mapreduce.lib.input
        .SequenceFileInputFormat[BytesWritable, BytesWritable]],
      classOf[BytesWritable], classOf[BytesWritable])
      .map { case (_, v) => decodeComplex(v.copyBytes()) }
    spark.createDataFrame(rows, ComplexSchema)
  }
}
