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
  *              | '.' method '(' ( '"' pattern '"' )? ')'         — item method
  *              | '[?(' pred ')]'                                 — filter
  *   method    := datetime | size | type | abs | floor | ceiling | double
  *   pred      := andPred ('||' andPred)*
  *   andPred   := unary ('&&' unary)*
  *   unary     := '(' pred ')' | '!' '(' pred ')'
  *              | 'exists' '(' relpath ')' | term
  *   term      := relpath op operand
  *              | relpath 'starts with' (string | '$' name)
  *              | relpath 'like_regex' string
  *   relpath   := '@' ('.' name)*
  *   operand   := number | '"' string '"' | '$' name | true | false | null
  *   arith     := op number                 (applied to the final scalar(s))
  *   op        := < <= > >= == != + - * /
  * }}}
  *
  * Filter predicates follow the standard's three-valued logic: a failed
  * navigation, unbound variable, or type-incomparable comparison is UNKNOWN
  * (not false), Kleene-combined through &&/||/!, and only TRUE keeps the
  * item (reference: sql/planner/JsonPathEvaluator predicate evaluation).
  *
  * Mode semantics follow the standard: lax auto-unwraps arrays on member
  * access, auto-wraps scalars on subscripts, and turns structural misses into
  * EMPTY; strict raises ERROR for the same conditions. Like the reference's
  * json_value defaults, both EMPTY and ERROR surface as NULL from the value
  * extractor — `JsonPathStatus` exposes the 'value'/'empty'/'error' outcome
  * so the mode split itself is testable (and oracle-checkable).
  *
  * Path variables ($name) take values from the PASSING analogue: the optional
  * third SQL argument, a literal JSON object {"name": value} parsed at plan
  * time (reference: operator/scalar/json/JsonInputFunctions + parameter
  * passing in sql/planner/JsonPathEvaluator). datetime() parses ISO or an
  * explicit pattern and yields the canonical 'yyyy-MM-dd HH:mm:ss' rendering.
  *
  * Documented deltas from the full reference engine: filter relpaths are
  * member chains (no subscripts/methods inside filters), like_regex uses
  * Java regex rather than XQuery flavor, and item methods cover the list
  * above.
  */
object JsonPath {

  sealed trait Step
  final case class Member(name: String) extends Step
  case object WildMember extends Step
  final case class Index(i: Int) extends Step
  case object WildIndex extends Step
  final case class MethodStep(name: String, arg: Option[String]) extends Step
  final case class FilterStep(pred: Pred) extends Step

  sealed trait Pred
  final case class Cmp(fields: List[String], op: String, operand: Operand) extends Pred
  final case class And(l: Pred, r: Pred) extends Pred
  final case class Or(l: Pred, r: Pred) extends Pred
  final case class Not(p: Pred) extends Pred
  final case class Exists(fields: List[String]) extends Pred
  final case class StartsWith(fields: List[String], operand: Operand) extends Pred
  final case class LikeRegex(fields: List[String], regex: String) extends Pred {
    @transient lazy val compiled: java.util.regex.Pattern = java.util.regex.Pattern.compile(regex)
  }

  sealed trait Operand
  final case class NumLit(v: Double) extends Operand
  final case class StrLit(s: String) extends Operand
  final case class VarRef(name: String) extends Operand
  final case class BoolLit(v: Boolean) extends Operand
  case object NullLit extends Operand

  final case class Parsed(strict: Boolean, steps: List[Step], arith: Option[(String, Double)],
      rootVar: Option[String] = None)

  private val methods = Set("datetime", "size", "type", "abs", "floor", "ceiling", "double")

  def parse(path: String): Parsed = {
    var s = path.trim
    val strict = s.startsWith("strict ")
    if (strict) s = s.stripPrefix("strict ").trim
    else if (s.startsWith("lax ")) s = s.stripPrefix("lax ").trim
    require(s.startsWith("$"), s"json path must start at '$$': $path")
    s = s.drop(1)
    // SQL/JSON PASSING: a path may be rooted at a variable ($var.a[*]...),
    // binding any JSON value — scalar or structural — from the vars object.
    val rootVar = """^(\w+)""".r.findFirstIn(s)
    rootVar.foreach(v => s = s.drop(v.length))
    val steps = scala.collection.mutable.ListBuffer[Step]()
    val MethodRe = """^\.(\w+)\(\s*(?:"([^"]*)")?\s*\)""".r
    val IndexRe = """^\[(\d+)\]""".r
    val PathRe = """^@((?:\.\w+)*)\s*""".r
    val OpRe = """^(<=|>=|==|!=|<|>)\s*""".r
    val OperandRe = """^(?:(-?[\d.]+)|"([^"]*)"|\$(\w+)|(true|false|null)\b)\s*""".r
    val ExistsRe = """^exists\s*\(\s*@((?:\.\w+)*)\s*\)\s*""".r
    var arith: Option[(String, Double)] = None
    while (s.nonEmpty) {
      if (s.startsWith(".*")) { steps += WildMember; s = s.drop(2) }
      else if (s.startsWith("[*]")) { steps += WildIndex; s = s.drop(3) }
      else if (s.startsWith("[?(")) {
        s = s.drop(3)
        def skipWs(): Unit = s = s.dropWhile(_.isWhitespace)
        def badAt(what: String): Nothing =
          throw new IllegalArgumentException(s"$what at '$s' in: $path")
        def relpath(): List[String] = PathRe.findFirstMatchIn(s) match {
          case Some(m) =>
            s = s.drop(m.matched.length)
            m.group(1).split("\\.").filter(_.nonEmpty).toList
          case None => badAt("bad filter term")
        }
        def operand(): Operand = OperandRe.findFirstMatchIn(s) match {
          case Some(m) =>
            s = s.drop(m.matched.length)
            if (m.group(1) != null) NumLit(m.group(1).toDouble)
            else if (m.group(2) != null) StrLit(m.group(2))
            else if (m.group(3) != null) VarRef(m.group(3))
            else m.group(4) match {
              case "true" => BoolLit(true)
              case "false" => BoolLit(false)
              case "null" => NullLit
            }
          case None => badAt("bad filter operand")
        }
        def term(): Pred = {
          val fields = relpath()
          val StartsRe = """^starts\s+with\s*""".r
          val RegexRe = """^like_regex\s*""".r
          if (StartsRe.findFirstIn(s).isDefined) {
            s = StartsRe.replaceFirstIn(s, "")
            StartsWith(fields, operand() match {
              case o @ (_: StrLit | _: VarRef) => o
              case o => badAt(s"starts with requires a string or variable, got $o")
            })
          } else if (RegexRe.findFirstIn(s).isDefined) {
            s = RegexRe.replaceFirstIn(s, "")
            operand() match {
              case StrLit(re) => LikeRegex(fields, re)
              case o => badAt(s"like_regex requires a string literal, got $o")
            }
          } else OpRe.findFirstMatchIn(s) match {
            case Some(m) =>
              s = s.drop(m.matched.length)
              Cmp(fields, m.group(1), operand())
            case None => badAt("bad filter comparison")
          }
        }
        def unary(): Pred = {
          skipWs()
          if (s.startsWith("!")) {
            s = s.drop(1); skipWs()
            if (!s.startsWith("(")) badAt("! requires a parenthesized predicate")
            s = s.drop(1)
            val p = orPred(); skipWs()
            if (!s.startsWith(")")) badAt("expected ')'")
            s = s.drop(1)
            Not(p)
          } else if (s.startsWith("(")) {
            s = s.drop(1)
            val p = orPred(); skipWs()
            if (!s.startsWith(")")) badAt("expected ')'")
            s = s.drop(1)
            p
          } else ExistsRe.findFirstMatchIn(s) match {
            case Some(m) =>
              s = s.drop(m.matched.length)
              Exists(m.group(1).split("\\.").filter(_.nonEmpty).toList)
            case None => term()
          }
        }
        def andPred(): Pred = {
          var p = unary(); skipWs()
          while (s.startsWith("&&")) { s = s.drop(2); p = And(p, unary()); skipWs() }
          p
        }
        def orPred(): Pred = {
          var p = andPred(); skipWs()
          while (s.startsWith("||")) { s = s.drop(2); p = Or(p, andPred()); skipWs() }
          p
        }
        val pred = orPred()
        skipWs()
        require(s.startsWith(")]"), s"expected ')]' at '$s' in: $path")
        s = s.drop(2)
        steps += FilterStep(pred)
      }
      else MethodRe.findFirstMatchIn(s) match {
        case Some(m) if methods.contains(m.group(1)) =>
          steps += MethodStep(m.group(1), Option(m.group(2)))
          s = s.drop(m.matched.length)
        case _ if s.startsWith(".") =>
          val name = s.drop(1).takeWhile(c => c.isLetterOrDigit || c == '_')
          require(name.nonEmpty, s"empty member name in: $path")
          steps += Member(name); s = s.drop(1 + name.length)
        case _ => IndexRe.findFirstMatchIn(s) match {
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
    Parsed(strict, steps.toList, arith, rootVar)
  }

  private object StructuralError extends RuntimeException { override def fillInStackTrace(): Throwable = this }

  private val mapper = new ThreadLocal[ObjectMapper] {
    override def initialValue(): ObjectMapper = new ObjectMapper()
  }

  /** PASSING analogue: parse a literal JSON object into a variable binding. */
  def parseVars(json: String): Map[String, JsonNode] = {
    import scala.jdk.CollectionConverters._
    val node = mapper.get().readTree(json)
    require(node.isObject, s"path variables must be a JSON object, got: $json")
    node.properties().asScala.map(e => e.getKey -> e.getValue).toMap
  }

  /** Scalar view of a bound variable for comparisons; None for containers
    * (incomparable -> unknown, per SQL/JSON 3VL). */
  private def scalarOf(n: JsonNode): Option[Either[Double, String]] =
    if (n.isNumber) Some(Left(n.doubleValue()))
    else if (n.isTextual) Some(Right(n.textValue()))
    else None

  /** Evaluate; Left(()) = structural ERROR, Right(seq) = result sequence
    * (empty = EMPTY). */
  def eval(json: String, p: Parsed,
      vars: Map[String, JsonNode] = Map.empty): Either[Unit, Seq[JsonNode]] =
    try {
      val root = p.rootVar match {
        case Some(v) => vars.getOrElse(v, throw StructuralError)
        case None => mapper.get().readTree(json)
      }
      var cur: Seq[JsonNode] = Seq(root)
      p.steps.foreach { st => cur = applyStep(cur, st, p.strict, vars) }
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

  private def applyStep(nodes: Seq[JsonNode], st: Step, strict: Boolean,
      vars: Map[String, JsonNode]): Seq[JsonNode] = {
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
      case MethodStep(name, arg) => nodes.map(n => applyMethod(n, name, arg, strict))
      case FilterStep(pred) =>
        nodes.flatMap(unwrap).filter(n => evalPred(n, pred, vars).contains(true))
    }
  }

  /** Filter predicate over one candidate item, in the standard's Kleene
    * three-valued logic: None = UNKNOWN (failed navigation, unbound variable,
    * incomparable types). Only TRUE keeps the item. */
  private def evalPred(n: JsonNode, pred: Pred,
      vars: Map[String, JsonNode]): Option[Boolean] = {
    def nav(fields: List[String]): Option[JsonNode] =
      fields.foldLeft(Option(n)) {
        case (Some(cur), f) if cur.isObject && cur.has(f) => Some(cur.get(f))
        case _ => None
      }
    pred match {
      case And(l, r) => (evalPred(n, l, vars), evalPred(n, r, vars)) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      case Or(l, r) => (evalPred(n, l, vars), evalPred(n, r, vars)) match {
        case (Some(true), _) | (_, Some(true)) => Some(true)
        case (Some(false), Some(false)) => Some(false)
        case _ => None
      }
      case Not(p) => evalPred(n, p, vars).map(!_)
      case Exists(fields) => Some(nav(fields).isDefined)
      case StartsWith(fields, operand) =>
        val prefix = operand match {
          case StrLit(v) => Some(v)
          case VarRef(name) => vars.get(name).filter(_.isTextual).map(_.textValue())
          case _ => None
        }
        (nav(fields), prefix) match {
          case (Some(t), Some(p)) if t.isTextual => Some(t.textValue().startsWith(p))
          case _ => None
        }
      case lr @ LikeRegex(fields, _) => nav(fields) match {
        case Some(t) if t.isTextual => Some(lr.compiled.matcher(t.textValue()).find())
        case _ => None
      }
      case Cmp(fields, op, operand) =>
        val target = nav(fields)
        // a variable operand dispatches on its BOUND JSON type (null/bool
        // compare by identity; containers are incomparable -> unknown)
        val effective = operand match {
          case VarRef(name) => vars.get(name) match {
            case Some(b) if b.isNull => NullLit
            case Some(b) if b.isBoolean => BoolLit(b.booleanValue())
            case _ => operand
          }
          case o => o
        }
        effective match {
          case NullLit => target.map(t => if (op == "!=") !t.isNull else t.isNull)
            .filter(_ => op == "==" || op == "!=")
          case BoolLit(v) => target match {
            case Some(t) if t.isBoolean && (op == "==" || op == "!=") =>
              Some(if (op == "==") t.booleanValue() == v else t.booleanValue() != v)
            case _ => None
          }
          case _ =>
            val lit = effective match {
              case NumLit(v) => Some(Left(v))
              case StrLit(s) => Some(Right(s))
              case VarRef(name) => vars.get(name).flatMap(scalarOf)
              case _ => None
            }
            (target, lit) match {
              case (Some(t), Some(l)) => compare(t, op, l)
              case _ => None
            }
        }
    }
  }

  private val dtPatterns = Seq(
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"),
    java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME)

  /** Item methods (reference sql/planner/JsonPathEvaluator method dispatch). */
  private def applyMethod(n: JsonNode, name: String, arg: Option[String],
      strict: Boolean): JsonNode = name match {
    case "size" =>
      if (n.isArray) new com.fasterxml.jackson.databind.node.IntNode(n.size())
      else if (strict) throw StructuralError
      else new com.fasterxml.jackson.databind.node.IntNode(1)
    case "type" =>
      val t =
        if (n.isTextual) "string" else if (n.isNumber) "number"
        else if (n.isBoolean) "boolean" else if (n.isArray) "array"
        else if (n.isObject) "object" else "null"
      com.fasterxml.jackson.databind.node.TextNode.valueOf(t)
    case "abs" | "floor" | "ceiling" =>
      if (!n.isNumber) throw StructuralError
      val x = n.doubleValue()
      new DoubleNode(name match {
        case "abs" => math.abs(x)
        case "floor" => math.floor(x)
        case "ceiling" => math.ceil(x)
      })
    case "double" =>
      if (n.isNumber) new DoubleNode(n.doubleValue())
      else if (n.isTextual)
        try new DoubleNode(n.textValue().toDouble)
        catch { case _: NumberFormatException => throw StructuralError }
      else throw StructuralError
    case "datetime" =>
      if (!n.isTextual) throw StructuralError
      val text = n.textValue()
      val parsed = arg match {
        case Some(pattern) =>
          try parseDt(text, Seq(java.time.format.DateTimeFormatter.ofPattern(pattern)))
          catch { case _: IllegalArgumentException => throw StructuralError }
        case None => parseDt(text, dtPatterns)
      }
      com.fasterxml.jackson.databind.node.TextNode.valueOf(parsed)
  }

  /** Canonical 'yyyy-MM-dd HH:mm:ss' rendering; date-only inputs get a
    * midnight time component. */
  private def parseDt(text: String,
      fmts: Seq[java.time.format.DateTimeFormatter]): String = {
    val out = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    fmts.foreach { f =>
      try return java.time.LocalDateTime.parse(text, f).format(out)
      catch { case _: java.time.format.DateTimeParseException => }
      try return java.time.LocalDate.parse(text, f).atStartOfDay().format(out)
      catch { case _: java.time.format.DateTimeParseException => }
    }
    try return java.time.LocalDate.parse(text).atStartOfDay().format(out)
    catch { case _: java.time.format.DateTimeParseException => }
    throw StructuralError
  }

  /** None = incomparable types (UNKNOWN per the standard). */
  private def compare(n: JsonNode, op: String, lit: Either[Double, String]): Option[Boolean] =
    (lit, n.isNumber, n.isTextual) match {
      case (Left(v), true, _) =>
        val x = n.doubleValue()
        Some(op match {
          case "<" => x < v; case "<=" => x <= v; case ">" => x > v
          case ">=" => x >= v; case "==" => x == v; case "!=" => x != v
        })
      case (Right(sv), _, true) =>
        val x = n.textValue()
        Some(op match {
          case "==" => x == sv; case "!=" => x != sv
          case "<" => x < sv; case "<=" => x <= sv; case ">" => x > sv; case ">=" => x >= sv
        })
      case _ => None
    }

  /** json_value semantics: single scalar → its text; EMPTY/ERROR/multi → null
    * (the reference's default NULL ON EMPTY / NULL ON ERROR behaviors). */
  def value(json: String, p: Parsed,
      vars: Map[String, JsonNode] = Map.empty): String = eval(json, p, vars) match {
    case Right(Seq(n)) if n.isValueNode =>
      if (n.isDouble && n.doubleValue() == n.doubleValue().floor &&
        !n.doubleValue().isInfinite && math.abs(n.doubleValue()) < 1e15)
        n.doubleValue().toLong.toString
      else n.asText()
    case _ => null
  }

  /** json_query semantics: single node → serialized; else null (no wrapper). */
  def query(json: String, p: Parsed,
      vars: Map[String, JsonNode] = Map.empty): String = eval(json, p, vars) match {
    case Right(Seq(n)) => n.toString
    case _ => null
  }

  /** Outcome classifier — surfaces the lax/strict split: 'value' (≥1 item),
    * 'empty', or 'error'. */
  def status(json: String, p: Parsed,
      vars: Map[String, JsonNode] = Map.empty): String = eval(json, p, vars) match {
    case Left(_) => "error"
    case Right(s) if s.isEmpty => "empty"
    case _ => "value"
  }
}

abstract class JsonPathExpression extends UnaryExpression with CodegenFallback {
  def path: String
  /** PASSING analogue: literal JSON object of path-variable bindings. */
  def varsJson: Option[String]
  @transient protected lazy val parsed: JsonPath.Parsed = JsonPath.parse(path)
  @transient protected lazy val vars: Map[String, JsonNode] =
    varsJson.map(JsonPath.parseVars).getOrElse(Map.empty)
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
case class JsonPathValue(child: Expression, path: String,
    varsJson: Option[String] = None) extends JsonPathExpression {
  override def prettyName: String = "json_path_value"
  override def nullSafeEval(input: Any): Any =
    out(JsonPath.value(input.toString, parsed, vars))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** json_query with a full lax/strict path. */
case class JsonPathQuery(child: Expression, path: String,
    varsJson: Option[String] = None) extends JsonPathExpression {
  override def prettyName: String = "json_path_query"
  override def nullSafeEval(input: Any): Any =
    out(JsonPath.query(input.toString, parsed, vars))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 'value' | 'empty' | 'error' — the observable lax/strict semantics. */
case class JsonPathStatus(child: Expression, path: String,
    varsJson: Option[String] = None) extends JsonPathExpression {
  override def prettyName: String = "json_path_status"
  override def nullable: Boolean = false
  override def nullSafeEval(input: Any): Any =
    out(JsonPath.status(input.toString, parsed, vars))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
