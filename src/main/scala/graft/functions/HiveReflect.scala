package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hive `reflect` (ref ql/udf/generic/GenericUDFReflect.java): resolves
  * the target method AT EVALUATION, not analysis — udf_case.q puts a
  * nonexistent method in a never-taken CASE branch and expects the query
  * to succeed — and supports INSTANCE methods by instantiating the class
  * through its no-arg constructor (udf_reflect.q calls
  * `reflect('java.lang.String', 'isEmpty')` on a fresh empty string).
  * Spark's native CallMethodViaReflection is static-only and
  * analysis-strict, so the builtin name is re-pointed here.
  *
  * Result is stringified (the reference returns Text). `foldable` is
  * deliberately false even for all-literal calls: ConstantFolding
  * evaluates foldable subtrees inside untaken CASE branches, which would
  * resurrect the analysis-time failure at optimization time.
  */
case class HiveReflect(children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def foldable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.size < 2)
      TypeCheckResult.TypeCheckFailure(
        "reflect expects (class_name, method_name[, arg1, ...])")
    else if (children.take(2).exists(_.dataType != StringType))
      TypeCheckResult.TypeCheckFailure(
        "reflect class and method names must be strings")
    else TypeCheckResult.TypeCheckSuccess

  @transient private lazy val argExprs = children.drop(2).toArray

  // resolved on first eval and cached; (method, instance-or-null)
  @transient private var boundMethod: (java.lang.reflect.Method, AnyRef) = _

  private def boxOf(t: Class[_]): Class[_] = t match {
    case java.lang.Integer.TYPE => classOf[java.lang.Integer]
    case java.lang.Long.TYPE => classOf[java.lang.Long]
    case java.lang.Short.TYPE => classOf[java.lang.Short]
    case java.lang.Byte.TYPE => classOf[java.lang.Byte]
    case java.lang.Double.TYPE => classOf[java.lang.Double]
    case java.lang.Float.TYPE => classOf[java.lang.Float]
    case java.lang.Boolean.TYPE => classOf[java.lang.Boolean]
    case java.lang.Character.TYPE => classOf[java.lang.Character]
    case other => other
  }

  /** Widening-compatible argument classes, Java overload style: exact box
    * match scores 0, a widening primitive conversion 1, any assignable 2.
    */
  private def score(param: Class[_], arg: Class[_]): Int = {
    val p = boxOf(param)
    if (p == arg) 0
    else {
      val widen: Map[Class[_], Set[Class[_]]] = Map(
        classOf[java.lang.Long] -> Set(classOf[java.lang.Integer],
          classOf[java.lang.Short], classOf[java.lang.Byte]),
        classOf[java.lang.Float] -> Set(classOf[java.lang.Integer],
          classOf[java.lang.Long], classOf[java.lang.Short], classOf[java.lang.Byte]),
        classOf[java.lang.Double] -> Set(classOf[java.lang.Integer],
          classOf[java.lang.Long], classOf[java.lang.Float],
          classOf[java.lang.Short], classOf[java.lang.Byte]))
      if (widen.get(p).exists(_.contains(arg))) 1
      else if (p.isAssignableFrom(arg)) 2
      else -1
    }
  }

  private def toJava(v: Any): AnyRef = v match {
    case s: UTF8String => s.toString
    case other => other.asInstanceOf[AnyRef]
  }

  private def widened(target: Class[_], v: AnyRef): AnyRef = {
    val p = boxOf(target)
    (p, v) match {
      case (c, n: java.lang.Number) if c == classOf[java.lang.Long] =>
        java.lang.Long.valueOf(n.longValue())
      case (c, n: java.lang.Number) if c == classOf[java.lang.Double] =>
        java.lang.Double.valueOf(n.doubleValue())
      case (c, n: java.lang.Number) if c == classOf[java.lang.Float] =>
        java.lang.Float.valueOf(n.floatValue())
      case _ => v
    }
  }

  override def eval(input: InternalRow): Any = {
    val args = argExprs.map(e => toJava(e.eval(input)))
    if (boundMethod == null) {
      val clsName = children(0).eval(input)
      val mName = children(1).eval(input)
      if (clsName == null || mName == null) return null
      val cls = Class.forName(clsName.toString, true,
        Thread.currentThread().getContextClassLoader)
      val name = mName.toString
      val argClasses = args.map(a =>
        if (a == null) null else a.getClass): Array[Class[_]]
      val candidates = cls.getMethods.filter(m =>
        m.getName == name && m.getParameterCount == args.length)
        .flatMap { m =>
          val scores = m.getParameterTypes.zip(argClasses).map { case (p, a) =>
            if (a == null) (if (p.isPrimitive) -1 else 2) else score(p, a)
          }
          if (scores.contains(-1)) None else Some((scores.sum, m))
        }
      if (candidates.isEmpty) throw new RuntimeException(
        s"reflect: no method $name(${argClasses.map(c => if (c == null) "null"
          else c.getSimpleName).mkString(", ")}) in ${cls.getName}")
      val m = candidates.minBy(_._1)._2
      val target: AnyRef =
        if (java.lang.reflect.Modifier.isStatic(m.getModifiers)) null
        else cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
      boundMethod = (m, target)
    }
    val (m, target) = boundMethod
    val callArgs = m.getParameterTypes.zip(args).map { case (p, a) =>
      if (a == null) null else widened(p, a)
    }
    val out = m.invoke(target, callArgs: _*)
    if (out == null) null else UTF8String.fromString(String.valueOf(out))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}
