package graft.ext

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.DoubleNode

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL/JSON 2016 path engine subset with lax/strict modes (SURVEY.md §2.8;
  * reference: core/trino-main/src/main/java/io/trino/sql/planner/... and
  * operator/scalar/json/ — path evaluation in jsonpath/JsonPathEvaluator.java).
  *
  * Path grammar subset:
  * {{{
  *   path      := mode? '$' step* arith?
  *   mode      := 'lax' | 'strict'          (default lax)
  *   step      := '.' name | '.*' | '[' int ']' | '[*]'
  *              | '[?(@' ('.' name)? op literal ')]'      — filter
  *   arith     := op number                 (applied to the final scalar(s))
  *   op        := < <= > >= == != + - * /
  * }}}
  *
  * Mode semantics follow the standard: lax auto-unwraps arrays on member
  * access, auto-wraps scalars on subscripts, and turns structural misses into
  * EMPTY; strict raises ERROR for the same conditions. Like the reference's
  * json_value defaults, both EMPTY and ERROR surface as NULL from the value
  * extractor — `JsonPathStatus` exposes the 'value'/'empty'/'error' outcome
  * so the mode split itself is testable (and oracle-checkable).
  *
  * Documented deltas from the full reference engine: no datetime(), no
  * nested filters, no path variables, single-comparison filters only.
  */
object JsonPath {

  sealed trait Step
  final case class Member(name: String) extends Step
  case object WildMember extends Step
  final case class Index(i: Int) extends Step
  case object WildIndex extends Step
  final case class Filter(field: Option[String], op: String, lit: Either[Double, String]) extends Step

  final case class Parsed(strict: Boolean, steps: List[Step], arith: Option[(String, Double)])

  def parse(path: String): Parsed = {
    var s = path.trim
    val strict = s.startsWith("strict ")
    if (strict) s = s.stripPrefix("strict ").trim
    else if (s.startsWith("lax ")) s = s.stripPrefix("lax ").trim
    require(s.startsWith("$"), s"json path must start at '$$': $path")
    s = s.drop(1)
    val steps = scala.collection.mutable.ListBuffer[Step]()
    val FilterRe = """^\[\?\(@(?:\.(\w+))?\s*(<=|>=|==|!=|<|>)\s*(?:(-?[\d.]+)|"([^"]*)")\)\]""".r
    val IndexRe = """^\[(\d+)\]""".r
    var arith: Option[(String, Double)] = None
    while (s.nonEmpty) {
      if (s.startsWith(".*")) { steps += WildMember; s = s.drop(2) }
      else if (s.startsWith(".")) {
        val name = s.drop(1).takeWhile(c => c.isLetterOrDigit || c == '_')
        require(name.nonEmpty, s"empty member name in: $path")
        steps += Member(name); s = s.drop(1 + name.length)
      }
      else if (s.startsWith("[*]")) { steps += WildIndex; s = s.drop(3) }
      else FilterRe.findFirstMatchIn(s) match {
        case Some(m) =>
          val lit = if (m.group(3) != null) Left(m.group(3).toDouble) else Right(m.group(4))
          steps += Filter(Option(m.group(1)), m.group(2), lit)
          s = s.drop(m.matched.length)
        case None => IndexRe.findFirstMatchIn(s) match {
          case Some(m) => steps += Index(m.group(1).toInt); s = s.drop(m.matched.length)
          case None =>
            val ArithRe = """^\s*([+\-*/])\s*(-?[\d.]+)\s*$""".r
            ArithRe.findFirstMatchIn(s) match {
              case Some(m) =>
                arith = Some((m.group(1), m.group(2).toDouble)); s = ""
              case None => throw new IllegalArgumentException(s"bad json path at '$s' in: $path")
            }
        }
      }
    }
    Parsed(strict, steps.toList, arith)
  }

  private object StructuralError extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  private val mapper = new ThreadLocal[ObjectMapper] {
    override def initialValue(): ObjectMapper = new ObjectMapper()
  }

  /** Evaluate; Left(()) = structural ERROR, Right(seq) = result sequence
    * (empty = EMPTY). */
  def eval(json: String, p: Parsed): Either[Unit, Seq[JsonNode]] =
    try {
      val root = mapper.get().readTree(json)
      var cur: Seq[JsonNode] = Seq(root)
      p.steps.foreach { st => cur = applyStep(cur, st, p.strict) }
      p.arith.foreach { case (op, v) =>
        cur = cur.map { n =>
          if (!n.isNumber) throw StructuralError
          val x = n.doubleValue()
          new DoubleNode(op match {
            case "+" => x + v
            case "-" => x - v
            case "*" => x * v
            case "/" => if (v == 0.0) throw StructuralError else x / v
          })
        }
      }
      Right(cur)
    } catch {
      case StructuralError => Left(())
      case _: com.fasterxml.jackson.core.JacksonException => Left(())
    }

  private def applyStep(nodes: Seq[JsonNode], st: Step, strict: Boolean): Seq[JsonNode] = {
    import scala.jdk.CollectionConverters._
    def unwrap(n: JsonNode): Seq[JsonNode] =
      if (n.isArray) n.elements().asScala.toSeq else Seq(n)
    st match {
      case Member(name) => nodes.flatMap { n0 =>
        val cands = if (!strict && n0.isArray) unwrap(n0) else Seq(n0)
        cands.flatMap { n =>
          if (n.isObject) {
            if (n.has(name)) Seq(n.get(name))
            else if (strict) throw StructuralError else Seq.empty
          } else if (strict) throw StructuralError else Seq.empty
        }
      }
      case WildMember => nodes.flatMap { n =>
        if (n.isObject) n.elements().asScala.toSeq
        else if (strict) throw StructuralError else Seq.empty
      }
      case Index(i) => nodes.flatMap { n0 =>
        val arr = if (n0.isArray) n0 else if (!strict) {
          val a = mapper.get().createArrayNode(); a.add(n0.deepCopy[JsonNode]()); a
        } else throw StructuralError
        if (i < arr.size()) Seq(arr.get(i))
        else if (strict) throw StructuralError else Seq.empty
      }
      case WildIndex => nodes.flatMap { n =>
        if (n.isArray) n.elements().asScala.toSeq
        else if (strict) throw StructuralError else Seq(n)
      }
      case Filter(field, op, lit) => nodes.flatMap(unwrap).filter { n =>
        val target = field.map(f => if (n.isObject && n.has(f)) n.get(f) else null).getOrElse(n)
        target != null && compare(target, op, lit)
      }
    }
  }

  private def compare(n: JsonNode, op: String, lit: Either[Double, String]): Boolean =
    (lit, n.isNumber, n.isTextual) match {
      case (Left(v), true, _) =>
        val x = n.doubleValue()
        op match {
          case "<" => x < v; case "<=" => x <= v; case ">" => x > v
          case ">=" => x >= v; case "==" => x == v; case "!=" => x != v
        }
      case (Right(sv), _, true) =>
        val x = n.textValue()
        op match {
          case "==" => x == sv; case "!=" => x != sv
          case "<" => x < sv; case "<=" => x <= sv; case ">" => x > sv; case ">=" => x >= sv
        }
      case _ => false
    }

  /** json_value semantics: single scalar → its text; EMPTY/ERROR/multi → null
    * (the reference's default NULL ON EMPTY / NULL ON ERROR behaviors). */
  def value(json: String, p: Parsed): String = eval(json, p) match {
    case Right(Seq(n)) if n.isValueNode =>
      if (n.isDouble && n.doubleValue() == n.doubleValue().floor &&
        !n.doubleValue().isInfinite && math.abs(n.doubleValue()) < 1e15)
        n.doubleValue().toLong.toString
      else n.asText()
    case _ => null
  }

  /** json_query semantics: single node → serialized; else null (no wrapper). */
  def query(json: String, p: Parsed): String = eval(json, p) match {
    case Right(Seq(n)) => n.toString
    case _ => null
  }

  /** Outcome classifier — surfaces the lax/strict split: 'value' (≥1 item),
    * 'empty', or 'error'. */
  def status(json: String, p: Parsed): String = eval(json, p) match {
    case Left(_) => "error"
    case Right(s) if s.isEmpty => "empty"
    case _ => "value"
  }
}

abstract class JsonPathExpression extends UnaryExpression with CodegenFallback {
  def path: String
  @transient protected lazy val parsed: JsonPath.Parsed = JsonPath.parse(path)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING json input, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  protected def out(s: String): Any = if (s == null) null else UTF8String.fromString(s)
}

/** json_value with a full lax/strict path (see [[JsonPath]]). */
case class JsonPathValue(child: Expression, path: String) extends JsonPathExpression {
  override def prettyName: String = "json_path_value"
  override def nullSafeEval(input: Any): Any =
    out(JsonPath.value(input.toString, parsed))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** json_query with a full lax/strict path. */
case class JsonPathQuery(child: Expression, path: String) extends JsonPathExpression {
  override def prettyName: String = "json_path_query"
  override def nullSafeEval(input: Any): Any =
    out(JsonPath.query(input.toString, parsed))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 'value' | 'empty' | 'error' — the observable lax/strict semantics. */
case class JsonPathStatus(child: Expression, path: String) extends JsonPathExpression {
  override def prettyName: String = "json_path_status"
  override def nullable: Boolean = false
  override def nullSafeEval(input: Any): Any =
    out(JsonPath.status(input.toString, parsed))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
