package graft

import org.apache.spark.sql.catalyst.FunctionIdentifier

/** Registry-wide parity: every function NAME the reference registers
  * (ql/exec/FunctionRegistry.java, the full `registerUDF`/`registerGenericUDF`
  * /`registerGenericUDAF`/`registerGenericUDTF` surface) must resolve in a
  * graft session — either as a Spark builtin, a graft injection, or a
  * session UDAF. Guards against silent holes the per-query oracles can't
  * see (a name nobody queried simply wouldn't resolve).
  */
class FunctionParitySpec extends SparkSpec {

  // operator tokens and parser keywords are grammar, not registry lookups
  private val grammarTokens = Set(
    "!", "!=", "%", "&", "*", "+", "-", "/", "<", "<=", "<>", "=", "==",
    ">", ">=", "^", "|", "~", "and", "or", "not", "case", "when", "in",
    "div", "index")

  // the complete name list extracted from the reference FunctionRegistry
  private val referenceNames = Seq(
    "abs", "acos", "array", "array_contains", "ascii", "asin", "atan", "avg",
    "bin", "ceil", "ceiling", "coalesce", "collect_set", "concat",
    "concat_ws", "context_ngrams", "conv", "corr", "cos", "count",
    "covar_pop", "covar_samp", "create_union", "date_add", "date_sub",
    "datediff", "day", "dayofmonth", "degrees", "e", "elt", "ewah_bitmap",
    "ewah_bitmap_and", "ewah_bitmap_empty", "ewah_bitmap_or", "exp",
    "explode", "field", "find_in_set", "floor", "from_unixtime",
    "from_utc_timestamp", "get_json_object", "hash", "hex",
    "histogram_numeric", "hour", "if", "instr", "isnotnull", "isnull",
    "json_tuple", "lcase", "length", "like", "ln", "locate", "log", "log10",
    "log2", "lower", "lpad", "ltrim", "map", "map_keys", "map_values",
    "max", "min", "minute", "month", "named_struct", "negative", "ngrams",
    "parse_url", "parse_url_tuple", "percentile", "percentile_approx", "pi",
    "pmod", "positive", "pow", "power", "radians", "rand", "reflect",
    "regexp", "regexp_extract", "regexp_replace", "repeat", "reverse",
    "rlike", "round", "rpad", "rtrim", "second", "sentences", "sign", "sin",
    "size", "space", "split", "sqrt", "std", "stddev", "stddev_pop",
    "stddev_samp", "str_to_map", "struct", "substr", "substring", "sum",
    "tan", "to_date", "to_utc_timestamp", "trim", "ucase", "unhex",
    "unix_timestamp", "upper", "var_pop", "var_samp", "variance",
    "weekofyear", "xpath", "xpath_boolean", "xpath_double", "xpath_float",
    "xpath_int", "xpath_long", "xpath_number", "xpath_short", "xpath_string",
    "year")

  test("every reference FunctionRegistry name resolves in a graft session") {
    Sessions.ensureRegistered(spark)
    val reg = spark.sessionState.functionRegistry
    val missing = referenceNames.filterNot { n =>
      reg.functionExists(new FunctionIdentifier(n))
    }
    assert(missing.isEmpty,
      s"reference functions that do not resolve: ${missing.mkString(", ")}")
  }

  test("no grammar token leaked into the checked name list") {
    assert(referenceNames.toSet.intersect(grammarTokens).isEmpty)
  }
}
