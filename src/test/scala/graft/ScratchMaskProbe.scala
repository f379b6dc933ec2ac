package graft

import org.scalatest.funsuite.AnyFunSuite

class ScratchMaskProbe extends AnyFunSuite {
  test("probe masked placeholder form") {
    val (m, _) = HiveQl.maskLiterals(
      "CREATE TABLE t (k INT) ROW FORMAT SERDE 'org.x.LazySimpleSerDe'")
    info("masked=" + m.map(c =>
      if (c < 32) "<" + c.toInt + ">" else c.toString).mkString)
    info("serdeMatch=" +
      """(?is)\bROW\s+FORMAT\s+SERDE\s+(\d+)""".r.findFirstIn(m))
    info("usingMatch=" + """(?i)\bUSING\s+(\d+)""".r.findFirstIn(
      HiveQl.maskLiterals("SELECT TRANSFORM(k) USING 'cat' AS (x) FROM t")._1))
  }
}
