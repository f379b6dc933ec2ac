package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the reference functions Spark lacks
  * (SURVEY.md §2.8/§7.3):
  *
  *  - `field(needle, v1, ..., vn)` — 1-based position of needle in the list,
  *    0 when absent/null (ref ql/udf/generic/GenericUDFField, registered
  *    FunctionRegistry.java:276).
  *  - `hive_hash(e1, ..., en)` — Hive's Java-style int hash (31*h + h_i),
  *    ≠ Spark's murmur3 `hash()` (ref GenericUDFHash, FunctionRegistry.java:417
  *    + ObjectInspectorUtils.hashCode semantics).
  *  - `parse_url_tuple(url, part1, ..., partn)` — one-row generator emitting
  *    n URL parts (ref udf/generic/GenericUDTFParseUrlTuple, registered
  *    FunctionRegistry.java:436).
  */
object GraftFunctions {

  type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def reg(name: String, clazz: Class[_],
      builder: Seq[Expression] => Expression): Registration =
    (new FunctionIdentifier(name),
      new ExpressionInfo(clazz.getCanonicalName, name), builder)

  /** `CREATE TEMPORARY FUNCTION name AS 'class'` (ref FunctionTask.java:1,
    * Hive.g createFunctionStatement): bind an implementation CLASS to a
    * user-chosen name in the session registry. The classes resolvable here
    * are graft's Catalyst expressions — the Spark-first analogue of the
    * reference's UDF class loading (no reflection: the builder closures are
    * the only safe way to construct typed expression trees).
    */
  /** The reference's in-tree TEST UDF classes (ql/src/test/.../udf/) —
    * clientpositive files CREATE TEMPORARY FUNCTION against them
    * (udf_testlength.q, udf_logic_java_boolean.q), so the names resolve
    * here to equivalent Catalyst expressions.
    */
  private val testClassBuilders: Map[String, Seq[Expression] => Expression] = Map(
    // UDFTestLength.java / UDFTestLength2.java: String.length
    "org.apache.hadoop.hive.ql.udf.UDFTestLength" ->
      (es => Length(Cast(es.head, StringType))),
    "org.apache.hadoop.hive.ql.udf.UDFTestLength2" ->
      (es => Length(Cast(es.head, StringType))),
    // GenericUDFTestGetJavaBoolean.java: 'true'/'false' (ci) else NULL
    "org.apache.hadoop.hive.ql.udf.generic.GenericUDFTestGetJavaBoolean" ->
      (es => {
        val s = Lower(Cast(es.head, StringType))
        CaseWhen(Seq(
          (EqualTo(s, Literal("true")), Literal(true)),
          (EqualTo(s, Literal("false")), Literal(false))),
          Literal(null, BooleanType))
      }),
    // GenericUDFTestTranslate.java: the translate(str, from, to) kernel
    "org.apache.hadoop.hive.ql.udf.generic.GenericUDFTestTranslate" ->
      (es => StringTranslate(Cast(es(0), StringType),
        Cast(es(1), StringType), Cast(es(2), StringType))),
    // UDAFTestMax.java: plain max (create_view.q's view9)
    "org.apache.hadoop.hive.ql.udf.UDAFTestMax" ->
      (es => org.apache.spark.sql.catalyst.expressions.aggregate.Max(es.head)),
    // GenericUDFTestGetJavaString.java: identity, returning a lazy Java
    // String of the argument (udf_compare_java_string.q — the test is
    // that String-vs-Text object inspectors still compare equal)
    "org.apache.hadoop.hive.ql.udf.generic.GenericUDFTestGetJavaString" ->
      (es => Cast(es.head, StringType)),
    // GenericUDAFAverage is a PRODUCTION class, but create_genericudaf.q
    // registers it under a temporary alias — plain avg
    "org.apache.hadoop.hive.ql.udf.generic.GenericUDAFAverage" ->
      (es => org.apache.spark.sql.catalyst.expressions.aggregate.Average(
        Cast(es.head, org.apache.spark.sql.types.DoubleType))),
    // GenericUDTFExplode.java: the explode generator (create_view.q view11)
    "org.apache.hadoop.hive.ql.udf.generic.GenericUDTFExplode" ->
      (es => Explode(es.head)))

  /** Names registered through CREATE TEMPORARY FUNCTION — the only ones
    * DROP TEMPORARY FUNCTION may remove (FunctionTask refuses dropping a
    * NATIVE function, clientnegative drop_native_udf.q).
    */
  private val tempRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def isTemporary(name: String): Boolean =
    tempRegistered.contains(name.toLowerCase)

  def registerAs(spark: org.apache.spark.sql.SparkSession, name: String,
      className: String): Unit = {
    val builder = testClassBuilders.get(className)
      .orElse(registrations.find(_._2.getClassName == className).map(_._3))
      .getOrElse(throw new IllegalArgumentException(
        s"CREATE TEMPORARY FUNCTION: unknown implementation class " +
          s"$className; available: " +
          registrations.map(_._2.getClassName).distinct.sorted.mkString(", ")))
    spark.sessionState.functionRegistry.registerFunction(
      new FunctionIdentifier(name), new ExpressionInfo(className, name), builder)
    // ALSO into the JVM builtin registry: Hive's temporary functions are
    // usable inside permanent VIEW definitions (create_view.q view8/9/11),
    // and Spark's temp-object check only passes names found in builtin.
    // JVM-global like the grant/index stores.
    org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
      .registerFunction(new FunctionIdentifier(name),
        new ExpressionInfo(className, name), builder)
    // mark temporary only once registration SUCCEEDED: a failed CREATE
    // must not leave the name droppable (FunctionTask registers after
    // class resolution; a later DROP of the never-created name raises
    // 'Invalid function' in the reference)
    tempRegistered.add(name.toLowerCase)
  }

  def dropFunction(spark: org.apache.spark.sql.SparkSession, name: String): Boolean = {
    tempRegistered.remove(name.toLowerCase)
    org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
      .dropFunction(new FunctionIdentifier(name))
    spark.sessionState.functionRegistry.dropFunction(new FunctionIdentifier(name))
  }

  /** `create_union(tag, v0..vn)` → the engine's uniontype encoding
    * `struct<tag: tinyint, field0.., fieldN>` with exactly one live payload
    * (SURVEY.md §1.2; ref GenericUDFUnion, FunctionRegistry.java:413). SQL
    * twin of [[HiveCompat.createUnion]] — built from Catalyst expressions so
    * HiveQL text calls it directly. The null branch is an untyped NULL
    * literal; TypeCoercion's If rule widens it to the payload type.
    */
  private def createUnionBuilder(es: Seq[Expression]): Expression = {
    require(es.size >= 2, "create_union needs a tag and at least one value")
    val tag = es.head
    val entries =
      Seq(Literal("tag"), Cast(tag, ByteType)) ++
        es.tail.zipWithIndex.flatMap { case (v, i) =>
          Seq(Literal(s"field$i"),
            If(EqualTo(Cast(tag, IntegerType), Literal(i)), v, Literal(null)))
        }
    CreateNamedStruct(entries)
  }

  val registrations: Seq[Registration] = Seq(
    reg("field", classOf[Field], Field(_)),
    reg("hive_hash", classOf[HiveHash08], HiveHash08(_)),
    // Hive-NAMED registrations so ported HiveQL text runs unmodified:
    // `hash(x)` must be the reference's Java-style hash
    // (FunctionRegistry.java:417), not Spark's murmur3 — a silent wrong
    // answer for any query that buckets or samples by hash(). Overrides the
    // builtin (Sessions force-registers names in `overridesBuiltin`).
    reg("hash", classOf[HiveHash08], HiveHash08(_)),
    // eval-time method resolution + instance methods (GenericUDFReflect):
    // Spark's CallMethodViaReflection is static-only and fails ANALYSIS for
    // a bogus method sitting in a never-taken CASE branch (udf_case.q)
    reg("reflect", classOf[HiveReflect], es => HiveReflect(es)),
    reg("create_union", classOf[CreateNamedStruct], createUnionBuilder),
    // Hive `index(container, key)` (GenericUDFIndex, FunctionRegistry
    // .java:230 registers the backtick-quoted name): arr[i] / map[k] as a
    // named function — Spark's GetArrayItem/GetMapValue under the hood,
    // keeping Hive's 0-BASED array indexing (element_at would be 1-based)
    reg("index", classOf[GetArrayItem], es => {
      require(es.size == 2, "index(container, key) takes two arguments")
      es.head.dataType match {
        case _: org.apache.spark.sql.types.MapType => GetMapValue(es.head, es(1))
        case _ => GetArrayItem(es.head, es(1))
      }
    }),
    // Hive-0.8 statistical names are POPULATION aggregates (GenericUDAFStd /
    // GenericUDAFVariance, FunctionRegistry.java:377-390: std = stddev =
    // stddev_pop, variance = var_pop), while Spark's builtins of the same
    // names are SAMPLE. Ported .q text (clientpositive/groupby3.q) must get
    // the reference's semantics — a silent n/(n-1) skew otherwise.
    reg("std", classOf[aggregate.StddevPop],
      es => aggregate.StddevPop(Cast(es.head, DoubleType)).toAggregateExpression()),
    reg("stddev", classOf[aggregate.StddevPop],
      es => aggregate.StddevPop(Cast(es.head, DoubleType)).toAggregateExpression()),
    reg("variance", classOf[aggregate.VariancePop],
      es => aggregate.VariancePop(Cast(es.head, DoubleType)).toAggregateExpression()),
    // Hive UDFRound passes NON-FINITE doubles through unchanged
    // (udf_round.q golden: round(1.0/0.0, 0) = Infinity), while Spark's
    // BigDecimal rounding nulls them. Wrap, preserving the operand type in
    // both branches so no result type changes for finite inputs.
    reg("round", classOf[Round], es => {
      val x = es.head
      val xd = Cast(x, DoubleType)
      val nonFinite =
        Or(IsNaN(xd), EqualTo(Abs(xd), Literal(Double.PositiveInfinity)))
      if (es.size >= 2) If(nonFinite, x, Round(x, es(1)))
      else
        // UDFRound.java:44-50: the NO-SCALE form is BigDecimal HALF_UP to
        // a LONG (udf4.q golden: round(1.5) = 2, round(-1.5) = -2, both
        // BIGINT), where Spark keeps the operand type. Non-finite doubles
        // fall to the plain long cast (the reference throws there —
        // untested corner, a total function is kinder).
        Cast(If(nonFinite, x, Round(xd, Literal(0))), LongType)
    }),
    // UDFSqrt.java: negative input → NULL (udf4.q golden sqrt(-1.0) =
    // NULL), where Spark returns NaN
    reg("sqrt", classOf[Sqrt], es => {
      val xd = Cast(es.head, DoubleType)
      If(LessThan(xd, Literal(0d)), Literal(null, DoubleType), Sqrt(xd))
    }),
    // UDFLog.java: log(base, x) is NULL for base <= 1 (udf7.q golden
    // LOG(0.5, 2) = NULL), where Spark computes it for any base > 0;
    // 1-arg log = ln (both engines NULL non-positive x)
    reg("log", classOf[Logarithm], es =>
      if (es.size < 2) Log(Cast(es.head, DoubleType))
      else {
        val b = Cast(es(0), DoubleType)
        If(LessThanOrEqual(b, Literal(1d)), Literal(null, DoubleType),
          Logarithm(b, Cast(es(1), DoubleType)))
      }),
    // UDFUnhex.java: returns the decoded bytes as a STRING (Text), where
    // Spark's unhex is BINARY — and GenericUDFSplit coerces its args
    // through their string form (udf_split.q: split(50401020, 0))
    reg("unhex", classOf[Unhex], es => Cast(Unhex(es.head), StringType)),
    // UDFUnixTimeStamp: the 1-arg string form parses with a LENIENT
    // SimpleDateFormat that ignores trailing text past the seconds field
    // (timestamp_udf.q: unix_timestamp('2011-05-06 07:08:09.1234567') =
    // the epoch second), where Spark's format-driven parse NULLs. Fall
    // back through the string→timestamp CAST (which accepts fractions)
    // when the formatted parse misses; timestamp/0-arg/2-arg untouched.
    reg("unix_timestamp", classOf[UnixTimestamp], es =>
      if (es.size == 1) Coalesce(Seq(
        UnixTimestamp(es.head, Literal("yyyy-MM-dd HH:mm:ss")),
        Cast(Cast(es.head, TimestampType), LongType)))
      else if (es.isEmpty) UnixTimestamp(
        org.apache.spark.sql.catalyst.expressions.CurrentTimestamp(),
        Literal("yyyy-MM-dd HH:mm:ss"))
      else UnixTimestamp(es(0), es(1))),
    // Hive 0.8 UDFHour/UDFMinute/UDFSecond regex-extract the time fields
    // from the STRING rendering: a bare 'HH:mm:ss' works and a date-only
    // string yields NULL (udf_hour.q golden: hour('13:14:15') = 13,
    // hour('2009-08-07') = NULL), where Spark's hour() can't parse bare
    // times and maps date-only strings to 0. The regex over the string
    // cast is also exact for real TIMESTAMP columns (their rendering
    // always carries HH:mm:ss).
    reg("hour", classOf[RegExpExtract], es => hiveTimeField(es.head, 1)),
    reg("minute", classOf[RegExpExtract], es => hiveTimeField(es.head, 2)),
    reg("second", classOf[RegExpExtract], es => hiveTimeField(es.head, 3)),
    // Hive UDFSubstr (udf_substr.q golden): a NEGATIVE pos whose magnitude
    // exceeds the string length yields '' (start = len + pos lands before
    // the string), while Spark's Substring clamps to the start and returns
    // the whole string — substr('ABC', -4) is '' in Hive, 'ABC' in Spark.
    reg("substr", classOf[Substring], hiveSubstr _),
    reg("substring", classOf[Substring], hiveSubstr _),
    reg("parse_url_tuple", classOf[ParseUrlTuple], ParseUrlTuple(_)),
    // NOTE: fully qualified on purpose. The wildcard import of
    // catalyst.expressions._ SHADOWS same-package classes from other files
    // (Scala precedence: wildcard import > package-clause members), and
    // Spark 4 ships its own catalyst BitmapCount — an unqualified reference
    // silently registers Spark's popcount expression under our name.
    reg("bitmap_agg", classOf[graft.functions.BitmapAgg],
      es => graft.functions.BitmapAgg(es.head).toAggregateExpression()),
    reg("bitmap_and", classOf[graft.functions.BitmapCombine],
      es => graft.functions.BitmapCombine(es(0), es(1), isAnd = true)),
    reg("bitmap_or", classOf[graft.functions.BitmapCombine],
      es => graft.functions.BitmapCombine(es(0), es(1), isAnd = false)),
    reg("bitmap_count", classOf[graft.functions.BitmapCount],
      es => graft.functions.BitmapCount(es.head)),
    // the reference's own names for the bitmap family (FunctionRegistry.java
    // :401 ewah_bitmap UDAF, :349-351 scalar and/or/empty) — same
    // implementations, Hive spelling, so ported HiveQL runs unmodified
    reg("ewah_bitmap", classOf[graft.functions.BitmapAgg],
      es => graft.functions.BitmapAgg(es.head).toAggregateExpression()),
    reg("ewah_bitmap_and", classOf[graft.functions.BitmapCombine],
      es => graft.functions.BitmapCombine(es(0), es(1), isAnd = true)),
    reg("ewah_bitmap_or", classOf[graft.functions.BitmapCombine],
      es => graft.functions.BitmapCombine(es(0), es(1), isAnd = false)),
    reg("ewah_bitmap_empty", classOf[graft.functions.BitmapCount],
      es => EqualTo(graft.functions.BitmapCount(es.head), Literal(0))),
    // interchange with the reference's on-disk EWAH array<bigint> words
    // (javaewah 0.2 serialize order via BitmapObjectOutput.java:104-112) —
    // closes the format divergence documented in SURVEY §7.5 without
    // changing the Roaring internals
    reg("ewah_encode", classOf[graft.functions.EwahEncode],
      es => graft.functions.EwahEncode(es.head)),
    reg("ewah_decode", classOf[graft.functions.EwahDecode],
      es => graft.functions.EwahDecode(es.head)),
    // Hive's split is raw Java String.split (GenericUDFSplit.java:75) —
    // TRAILING empty strings are dropped, which Spark's split (limit -1)
    // keeps, a silent divergence for ported text like split('a,b,,', ',').
    // 2-arg form gets Hive semantics; the 3-arg Spark extension (explicit
    // limit) passes through untouched.
    reg("split", classOf[HiveSplit], es =>
      if (es.size == 2)
        HiveSplit(Cast(es(0), StringType), Cast(es(1), StringType))
      else StringSplit(es(0), es(1), es(2))),
    // ngrams family: TypedImperativeAggregates (live mutable buffer between
    // rows — an Encoder-buffered typed Aggregator would copy the counts map
    // once per input row). Registered under both the working `_topk` names
    // and the reference's own names (FunctionRegistry.java:404-405; output
    // shape: array<struct<ngram: string, freq: long>>, grams space-joined,
    // exact counts; the reference's optional precision-factor argument is
    // replaced by the pruned buffer).
    reg("ngrams_topk", classOf[NGramsAgg],
      es => NGramsAgg(es(0), es(1), es(2)).toAggregateExpression()),
    // the builtin names carry the reference's own output shape
    // (array<struct<ngram: array<string>, estfrequency: double>> —
    // udaf_ngrams.q does `.estfrequency`) and accept the sentences()
    // nesting; the optional 4th precision-factor argument is subsumed by
    // the pruned partial buffer (NGramKernel.PruneFactor)
    reg("ngrams", classOf[NGramsAgg],
      es => NGramsAgg(es(0), es(1), es(2), hiveShape = true)
        .toAggregateExpression()),
    reg("context_ngrams_topk", classOf[ContextNGramsAgg],
      es => ContextNGramsAgg(es(0), es(1), es(2)).toAggregateExpression()),
    reg("context_ngrams", classOf[ContextNGramsAgg],
      es => ContextNGramsAgg(es(0), es(1), es(2), hiveShape = true)
        .toAggregateExpression()),
    // per-group top-k with a bounded partial buffer (extension): only
    // ~k rows per partition reach the shuffle, vs the window formulation
    // sorting every group row
    reg("top_k", classOf[TopKAgg],
      es => TopKAgg(es(0), es(1), es(2)).toAggregateExpression()),
    // Misra-Gries frequent items: <= k counters per partial buffer vs one
    // shuffled row per distinct item; exact when k >= |distinct|
    reg("freq_items", classOf[FreqItemsAgg], es => {
      require(es.size == 2, "freq_items(item, k)")
      // k must be a positive int literal: a NULL/non-positive capacity would
      // otherwise make the Misra-Gries trim evict every counter and the
      // aggregate silently return [] — fail at registration instead
      es(1) match {
        case Literal(v: Int, IntegerType) if v > 0 =>
        case _ => throw new IllegalArgumentException(
          "freq_items k must be a positive integer literal")
      }
      FreqItemsAgg(es(0), es(1)).toAggregateExpression()
    }),
    // xpath family under the builtin names (FunctionRegistry.java:309-317):
    // same public semantics, but the JAXP factories resolve once per JVM and
    // parsers are thread-local (see XPathKernel) — the builtin re-runs two
    // classpath-scanning ServiceLoader lookups per task instance
    reg("xpath", classOf[HiveXPath], es => HiveXPath(es(0), es(1), "list")),
    reg("xpath_string", classOf[HiveXPath], es => HiveXPath(es(0), es(1), "string")),
    reg("xpath_boolean", classOf[HiveXPath], es => HiveXPath(es(0), es(1), "boolean")),
    reg("xpath_short", classOf[HiveXPath], es => HiveXPath(es(0), es(1), "short")),
    reg("xpath_int", classOf[HiveXPath], es => HiveXPath(es(0), es(1), "int")),
    reg("xpath_long", classOf[HiveXPath], es => HiveXPath(es(0), es(1), "long")),
    reg("xpath_float", classOf[HiveXPath], es => HiveXPath(es(0), es(1), "float")),
    reg("xpath_double", classOf[HiveXPath], es => HiveXPath(es(0), es(1), "double")),
    reg("xpath_number", classOf[HiveXPath], es => HiveXPath(es(0), es(1), "number")),
    // native vector kernels: bit-identical to the HOF dot/normalize chains
    // (left-to-right double accumulation) minus the interpreted lambda
    // dispatch — the hot path of every embedding operator
    reg("vec_dot", classOf[VecDot], es => {
      require(es.size == 2, "vec_dot(a, b)")
      VecDot(es(0), es(1))
    }),
    reg("vec_normalize", classOf[VecNormalize], es => {
      require(es.size == 1, "vec_normalize(a)")
      VecNormalize(es(0))
    }),
    reg("shingle_md5", classOf[ShingleMd5], es => {
      require(es.size == 2, "shingle_md5(text, n)")
      val n = es(1) match {
        case Literal(v: Int, IntegerType) => v
        case _ => throw new IllegalArgumentException(
          "shingle_md5 n must be an integer literal")
      }
      ShingleMd5(es(0), n)
    }),
    reg("shingle_md5_pos", classOf[ShingleMd5], es => {
      require(es.size == 2, "shingle_md5_pos(text, n)")
      val n = es(1) match {
        case Literal(v: Int, IntegerType) => v
        case _ => throw new IllegalArgumentException(
          "shingle_md5_pos n must be an integer literal")
      }
      ShingleMd5(es(0), n, dedup = false)
    }),
    // Unicode normalization (no Spark builtin): nfc_normalize matches
    // DuckDB's function of the same name; unicode_normalize takes the form
    reg("nfc_normalize", classOf[UnicodeNormalize], es => {
      require(es.size == 1, "nfc_normalize(text)")
      UnicodeNormalize(es(0), java.text.Normalizer.Form.NFC)
    }),
    reg("unicode_normalize", classOf[UnicodeNormalize], es => {
      require(es.size == 2, "unicode_normalize(text, 'NFC'|'NFD'|'NFKC'|'NFKD')")
      val form = es(1) match {
        case Literal(v, StringType) if v != null =>
          java.text.Normalizer.Form.valueOf(v.toString.toUpperCase)
        case _ => throw new IllegalArgumentException(
          "unicode_normalize form must be a string literal")
      }
      UnicodeNormalize(es(0), form)
    }),
    // near-dup sketch kernels (q52/q121, q53/q122): bit-identical native
    // forms of the interpreted HOF signature chains — SketchKernelsSpec
    // proves value equality, so the DuckDB oracles stay untouched
    reg("minhash_sig", classOf[MinHashSig], es => {
      require(es.size == 2, "minhash_sig(words, n)")
      val n = es(1) match {
        case Literal(v: Int, IntegerType) => v
        case _ => throw new IllegalArgumentException(
          "minhash_sig n must be an integer literal")
      }
      MinHashSig(es(0), n)
    }),
    reg("simhash32", classOf[SimHash32], es => {
      require(es.size == 1, "simhash32(words)")
      SimHash32(es.head)
    }),
    reg("winnow_mins", classOf[WinnowMins], es => {
      def asIntLit(e: Expression, what: String): Int = e match {
        case Literal(v: Int, IntegerType) => v
        case _ => throw new IllegalArgumentException(
          s"winnow_mins $what must be an integer literal")
      }
      require(es.size == 3, "winnow_mins(text, gram_len, window)")
      WinnowMins(es(0), asIntLit(es(1), "gram_len"), asIntLit(es(2), "window"))
    }))

  /** Names that deliberately shadow a Spark builtin (Hive parity beats Spark
    * default for ported text); [[graft.Sessions.ensureRegistered]] must
    * force-register these instead of skipping on functionExists — a skipped
    * registration silently resolves to the builtin (murmur3 for `hash`;
    * Spark 3.5+'s raw-popcount `bitmap_count`, which reads compressed
    * bitmap bytes as garbage).
    */
  val overridesBuiltin: Set[String] = Set("hash", "bitmap_count", "split", "round",
    "sqrt", "log", "unhex", "unix_timestamp", "reflect",
    "xpath", "xpath_string", "xpath_boolean", "xpath_short", "xpath_int",
    "xpath_long", "xpath_float", "xpath_double", "xpath_number",
    // Hive's std/stddev/variance are population; Spark's builtins are sample
    "std", "stddev", "variance",
    // Hive substr('ABC', -4) = '' where Spark clamps to 'ABC'
    "substr", "substring",
    // Hive hour/minute/second regex-extract from strings (bare times work,
    // date-only is NULL); Spark's builtins cast to timestamp
    "hour", "minute", "second")

  /** Hive UDFHour/Minute/Second: first HH:mm:ss match in the string form;
    * no match -> '' -> NULL through the (non-ANSI) int cast.
    */
  private def hiveTimeField(e: Expression, group: Int): Expression =
    Cast(RegExpExtract(Cast(e, StringType),
      Literal("(\\d{1,2}):(\\d{1,2}):(\\d{1,2})"), Literal(group)),
      IntegerType)

  /** Hive-0.8 UDFSubstr semantics over Spark's Substring: '' when the
    * negative start lands before the string (len + pos < 0). NULL operands
    * flow through both the guard (null condition -> else branch) and
    * Substring itself as NULL, matching Hive.
    */
  private def hiveSubstr(es: Seq[Expression]): Expression = {
    val str = es.head
    val pos = Cast(es(1), IntegerType)
    val len: Expression =
      if (es.size >= 3) Cast(es(2), IntegerType) else Literal(Int.MaxValue)
    // a non-negative literal pos can never trip the guard — skip it so the
    // hot relational/binary paths keep Spark's plain Substring plan
    val guardNeeded = es(1) match {
      case Literal(v: Int, IntegerType) => v < 0
      case Literal(v: Long, LongType) => v < 0
      case _ => true
    }
    if (!guardNeeded) Substring(str, pos, len)
    else {
      val beforeStart = And(LessThan(pos, Literal(0)),
        LessThan(Add(pos, Length(str)), Literal(0)))
      // empty branch spelled as a zero-length substring of the SAME operand
      // so string and binary inputs both type-check
      If(beforeStart, Substring(str, Literal(1), Literal(0)),
        Substring(str, pos, len))
    }
  }
}

/** `field(needle, v1..vn)`: 1-based index of the first vi equal to needle,
  * else 0. Arguments may be HETEROGENEOUS (GenericUDFField accepts any
  * primitive mix); a candidate of a different type simply never matches —
  * udf_field.q's goldens pin `field('66', 66, 88) = 0` (no string↔numeric
  * coercion) and `field(66, col_int, col_string) = 1` (the string column
  * is skipped, not an error). Cold-path lookup function → interpreted eval
  * (CodegenFallback); the hot relational path never routes through it.
  */
case class Field(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.size < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "field() needs a needle and at least one candidate")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }
  override def eval(input: InternalRow): Any = {
    val needle = children.head.eval(input)
    if (needle == null) return 0
    val needleType = children.head.dataType
    var i = 1
    while (i < children.size) {
      if (children(i).dataType == needleType) {
        val v = children(i).eval(input)
        if (v != null && v == needle) return i
      }
      i += 1
    }
    0
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** Hive-0.8 `split(str, regex)`: raw Java String.split — trailing empty
  * strings dropped (GenericUDFSplit.java:75), unlike Spark's limit=-1
  * split. Interior empties are kept by both.
  */
case class HiveSplit(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "split"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "split expects (string, string)")
  override protected def nullSafeEval(s: Any, regex: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    // the reference's golden for split('', '.') is [] (udf_split.q.out) —
    // its era JVM dropped the lone trailing empty; modern String.split
    // returns [""] for empty input, so special-case it
    val parts = if (str.isEmpty) Array.empty[String]
      else str.split(regex.asInstanceOf[UTF8String].toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      parts.map(UTF8String.fromString(_): Any))
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static hash kernels shared by interpreted eval and generated code. */
object HiveHashUtil {
  def hashLong(v: Long): Int = (v ^ (v >>> 32)).toInt
  def hashDouble(v: Double): Int = hashLong(java.lang.Double.doubleToLongBits(v))
  def hashFloat(v: Float): Int = java.lang.Float.floatToIntBits(v)
  def hashString(s: UTF8String): Int = s.toString.hashCode
  /** TIMESTAMP hashes via the reference's TimestampWritable.hashCode
    * (serde2/io/TimestampWritable.java:337): `(seconds << 32) | nanos`
    * folded long→int — NOT the raw micros long. Input is Spark's
    * TimestampType payload (micros since epoch).
    */
  def hashTimestamp(micros: Long): Int = {
    val seconds = Math.floorDiv(micros, 1000000L)
    val nanos = Math.floorMod(micros, 1000000L) * 1000L
    hashLong((seconds << 32) | nanos)
  }
}

/** Variadic Hive-0.8 hash: h = 31*h + hash(arg_i), null contributes 0.
  * Whole-stage-codegen'd (doGenCode emits straight-line Java calling the
  * [[HiveHashUtil]] kernels) so it can sit in hot projections.
  */
case class HiveHash08(children: Seq[Expression]) extends Expression {
  override def nullable: Boolean = false
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.isEmpty)
      return org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "hive_hash needs at least one argument")
    val ok = children.forall(c => c.dataType match {
      case BooleanType | ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | StringType | TimestampType | DateType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "hive_hash supports primitive (bool/int/float/string/ts/date) args")
  }

  private def elemHash(v: Any, dt: DataType): Int = dt match {
    case BooleanType => if (v.asInstanceOf[Boolean]) 1 else 0
    case ByteType => v.asInstanceOf[Byte].toInt
    case ShortType => v.asInstanceOf[Short].toInt
    case IntegerType | DateType => v.asInstanceOf[Int]
    case TimestampType => HiveHashUtil.hashTimestamp(v.asInstanceOf[Long])
    case LongType => HiveHashUtil.hashLong(v.asInstanceOf[Long])
    case FloatType => HiveHashUtil.hashFloat(v.asInstanceOf[Float])
    case DoubleType => HiveHashUtil.hashDouble(v.asInstanceOf[Double])
    case StringType => HiveHashUtil.hashString(v.asInstanceOf[UTF8String])
    case _ => 0
  }

  override def eval(input: InternalRow): Any = {
    var h = 0
    children.foreach { c =>
      val v = c.eval(input)
      h = 31 * h + (if (v == null) 0 else elemHash(v, c.dataType))
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // top-level object → static forwarders on the companion class
    val util = HiveHashUtil.getClass.getName.stripSuffix("$")
    val h = ctx.freshName("hiveHash")
    def call(dt: DataType, value: String): String = dt match {
      case BooleanType => s"($value ? 1 : 0)"
      case ByteType | ShortType => s"(int) $value"
      case IntegerType | DateType => value
      case TimestampType => s"$util.hashTimestamp($value)"
      case LongType => s"$util.hashLong($value)"
      case FloatType => s"$util.hashFloat($value)"
      case DoubleType => s"$util.hashDouble($value)"
      case StringType => s"$util.hashString($value)"
      case _ => "0"
    }
    val parts = children.map { c =>
      val g = c.genCode(ctx)
      code"""
        ${g.code}
        $h = 31 * $h + (${g.isNull} ? 0 : ${call(c.dataType, g.value.toString)});
      """
    }
    ev.copy(
      code = code"int $h = 0;" + parts.reduce(_ + _),
      isNull = FalseLiteral,
      value = JavaCode.variable(h, IntegerType))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}

/** `parse_url_tuple(url, 'HOST', 'PATH', 'QUERY:k', ...)`: generator emitting
  * one row of n string columns c0..c(n-1), null where the part is absent —
  * mirrors json_tuple's column naming. Parses the URL once per row (the
  * reference caches the last URL for the same reason,
  * GenericUDTFParseUrlTuple).
  */
case class ParseUrlTuple(children: Seq[Expression])
    extends Generator with CodegenFallback {
  private lazy val partExprs = children.tail
  override def elementSchema: StructType = StructType(
    partExprs.zipWithIndex.map { case (_, i) =>
      StructField(s"c$i", StringType, nullable = true)
    })
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (children.size < 2)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "parse_url_tuple needs a url and at least one part")
    else if (children.exists(_.dataType != StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "parse_url_tuple arguments must be strings")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
  }

  private def part(uri: java.net.URI, spec: String): UTF8String = {
    val s =
      if (spec.startsWith("QUERY:")) {
        val key = spec.substring(6)
        val q = uri.getRawQuery
        if (q == null) null
        else q.split("&").collectFirst {
          case kv if kv.startsWith(key + "=") => kv.substring(key.length + 1)
        }.orNull
      } else spec match {
        case "HOST" => uri.getHost
        case "PATH" => uri.getRawPath
        case "QUERY" => uri.getRawQuery
        case "REF" => uri.getRawFragment
        case "PROTOCOL" => uri.getScheme
        case "AUTHORITY" => uri.getRawAuthority
        case "USERINFO" => uri.getRawUserInfo
        case "FILE" =>
          val p = uri.getRawPath
          val q = uri.getRawQuery
          if (p == null) null else if (q == null) p else s"$p?$q"
        case _ => null
      }
    if (s == null) null else UTF8String.fromString(s)
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val url = children.head.eval(input)
    val n = partExprs.size
    val out = new Array[Any](n)
    if (url != null) {
      val uri =
        try new java.net.URI(url.asInstanceOf[UTF8String].toString)
        catch { case _: java.net.URISyntaxException => null }
      if (uri != null) {
        var i = 0
        while (i < n) {
          val spec = partExprs(i).eval(input)
          if (spec != null)
            out(i) = part(uri, spec.asInstanceOf[UTF8String].toString)
          i += 1
        }
      }
    }
    Seq(InternalRow.fromSeq(out.toIndexedSeq))
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(newChildren)
}
