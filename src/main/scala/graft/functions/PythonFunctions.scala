package graft.functions

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, JsonNodeFactory}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.api.java.{UDF0, UDF1, UDF2, UDF3, UDF4, UDF5, UDF6}
import org.apache.spark.sql.types._

/** Python language functions — `CREATE FUNCTION … LANGUAGE PYTHON
  * WITH (handler = '…') AS $$ def … $$`
  * (reference: plugin/trino-functions-python/src/main/java/io/trino/plugin/
  * functions/python/PythonEngine.java — the reference executes the guest code
  * in an embedded WASM CPython; TestPythonFunctions.java fixes the SQL
  * surface and error shapes this module mirrors).
  *
  * Execution model here: one persistent CPython worker subprocess per
  * (executor-thread × function), speaking newline-delimited JSON over
  * stdin/stdout. The worker loads the guest module once, then evaluates one
  * row per line — process startup and module import are amortized across the
  * whole partition, the same lifecycle as the reference's per-split engine
  * (PythonEngine is created once per function instance, `evaluate` per row).
  * At cluster scale each executor core owns its workers; no driver
  * round-trips, no shared state — scales linearly with cores.
  */
object PythonFunctions {

  /** Guest harness. First stdin line = {"code","handler"}; first stdout line
    * = {"ok":true} | {"fatal": traceback}. Then one JSON array of arguments
    * per line in, {"r": result} | {"e": traceback} per line out. The guest
    * module is named `guest` at path /guest/guest.py to match the reference's
    * error texts (TestPythonFunctions `testInvalidHandler`/`testSyntaxError`). */
  private val Harness =
    """import sys, json, traceback, types
      |spec = json.loads(sys.stdin.readline())
      |mod = types.ModuleType('guest')
      |mod.__file__ = '/guest/guest.py'
      |try:
      |    exec(compile(spec['code'], '/guest/guest.py', 'exec'), mod.__dict__)
      |    fn = getattr(mod, spec['handler'], None)
      |    if fn is None:
      |        raise AttributeError("module 'guest' has no attribute '%s'" % spec['handler'])
      |except BaseException:
      |    sys.stdout.write(json.dumps({'fatal': traceback.format_exc()}) + '\n')
      |    sys.stdout.flush()
      |    sys.exit(0)
      |sys.stdout.write(json.dumps({'ok': True}) + '\n')
      |sys.stdout.flush()
      |for line in sys.stdin:
      |    if not line.strip():
      |        continue
      |    try:
      |        r = fn(*json.loads(line))
      |        sys.stdout.write(json.dumps({'r': r}, default=str) + '\n')
      |    except BaseException:
      |        sys.stdout.write(json.dumps({'e': traceback.format_exc()}) + '\n')
      |    sys.stdout.flush()
      |""".stripMargin

  private val mapper = new ObjectMapper()
  private val nodes = JsonNodeFactory.instance

  /** One live worker process. NOT thread-safe — owned by a single thread.
    * stderr is discarded: guest prints/warnings must never fill the pipe
    * buffer (~64 KiB) and block the interpreter — errors travel on the
    * stdout JSON channel as tracebacks, never on stderr. */
  private final class Worker(code: String, handler: String) {
    private val proc = new ProcessBuilder("python3", "-c", Harness)
      .redirectError(ProcessBuilder.Redirect.DISCARD).start()
    liveProcs.add(proc)
    private val out = new BufferedWriter(
      new OutputStreamWriter(proc.getOutputStream, StandardCharsets.UTF_8))
    private val in = new BufferedReader(
      new InputStreamReader(proc.getInputStream, StandardCharsets.UTF_8))
    locally {
      val spec = mapper.createObjectNode()
      spec.put("code", code); spec.put("handler", handler)
      out.write(mapper.writeValueAsString(spec)); out.write('\n'); out.flush()
      val first = in.readLine()
      if (first == null) throw new IllegalStateException(
        "Python error: worker exited before handshake")
      val node = mapper.readTree(first)
      if (node.has("fatal")) {
        val tb = node.get("fatal").asText()
        destroy()
        throw new IllegalStateException(pythonError(tb, handler))
      }
    }

    def call(args: ArrayNode): JsonNode = {
      out.write(mapper.writeValueAsString(args)); out.write('\n'); out.flush()
      val line = in.readLine()
      if (line == null) throw new IllegalStateException(
        "Python error: worker died mid-evaluation")
      val node = mapper.readTree(line)
      if (node.has("e"))
        throw new IllegalStateException("Python error:\n" + node.get("e").asText())
      node.get("r")
    }

    def destroy(): Unit = { proc.destroyForcibly(); liveProcs.remove(proc); () }
    def alive: Boolean = proc.isAlive
  }

  /** Reference error shape: "Python error:" + the interesting traceback
    * lines + a one-line cause (PythonEngine.fatalError). */
  private def pythonError(traceback: String, handler: String): String = {
    val lines = traceback.linesIterator.toVector
    val tail = lines.reverse.takeWhile(l => !l.startsWith("Traceback")).reverse
    val cause =
      if (traceback.contains("SyntaxError"))
        "Failed to load Python module 'guest'"
      else s"Cannot find function '$handler' in 'guest'"
    ("Python error:\n" + tail.mkString("\n")).stripTrailing() + "\n" + cause
  }

  /** All spawned processes, for JVM-exit cleanup. */
  private val liveProcs =
    java.util.Collections.newSetFromMap(new ConcurrentHashMap[Process, java.lang.Boolean]())
  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    liveProcs.asScala.foreach(_.destroyForcibly())))

  /** Per-thread worker cache: each executor thread owns one worker per
    * function body, reused across rows and tasks (pyspark's worker-reuse
    * lifecycle). Keyed by (code, handler). */
  private val workers: ThreadLocal[mutable.HashMap[(String, String), Worker]] =
    ThreadLocal.withInitial(() => mutable.HashMap.empty[(String, String), Worker])

  private def workerFor(code: String, handler: String): Worker = {
    val cache = workers.get()
    val key = (code, handler)
    cache.get(key).filter(_.alive).getOrElse {
      cache.remove(key).foreach(_.destroy())
      val w = new Worker(code, handler)
      cache.put(key, w); w
    }
  }

  /** Eagerly load the guest module once on the driver so handler/syntax
    * errors surface at registration (the reference raises them at CREATE). */
  def validate(code: String, handler: String): Unit = {
    val w = workerFor(code, handler); ()
  }

  // ---- type bridge ----------------------------------------------------

  /** Reference type vocabulary → Spark DataType (subset the JSON protocol
    * round-trips exactly). */
  def sparkType(t: String): DataType = {
    val lower = t.trim.toLowerCase
    lower match {
      case "bigint" => LongType
      case "integer" | "int" => IntegerType
      case "smallint" => ShortType
      case "tinyint" => ByteType
      case "double" => DoubleType
      case "real" => FloatType
      case "boolean" => BooleanType
      case "varchar" => StringType
      case v if v.startsWith("varchar(") => StringType
      case "date" => DateType
      case v if v.startsWith("decimal") => DoubleType // JSON carries a number
      case v if v.startsWith("array(") && v.endsWith(")") =>
        ArrayType(sparkType(v.substring(6, v.length - 1)))
      case other => throw new IllegalArgumentException(
        s"LANGUAGE PYTHON: unsupported parameter/return type '$other'")
    }
  }

  private def toNode(v: Any): JsonNode = v match {
    case null => nodes.nullNode()
    case b: java.lang.Boolean => nodes.booleanNode(b)
    case b: java.lang.Byte => nodes.numberNode(b.intValue())
    case s: java.lang.Short => nodes.numberNode(s.intValue())
    case i: java.lang.Integer => nodes.numberNode(i.intValue())
    case l: java.lang.Long => nodes.numberNode(l.longValue())
    case f: java.lang.Float => nodes.numberNode(f.doubleValue())
    case d: java.lang.Double => nodes.numberNode(d.doubleValue())
    case d: java.math.BigDecimal => nodes.numberNode(d)
    case s: String => nodes.textNode(s)
    case d: java.sql.Date => nodes.textNode(d.toString)
    case seq: scala.collection.Seq[_] =>
      val arr = nodes.arrayNode(); seq.foreach(x => arr.add(toNode(x))); arr
    case other => nodes.textNode(other.toString)
  }

  private def fromNode(n: JsonNode, t: DataType): Any = {
    if (n == null || n.isNull) return null
    t match {
      case LongType => n.asLong()
      case IntegerType => n.asInt()
      case ShortType => n.asInt().toShort
      case ByteType => n.asInt().toByte
      case DoubleType => n.asDouble()
      case FloatType => n.asDouble().toFloat
      case BooleanType => n.asBoolean()
      case StringType => if (n.isTextual) n.asText() else mapper.writeValueAsString(n)
      case DateType => java.sql.Date.valueOf(n.asText())
      case ArrayType(el, _) =>
        val it = n.elements(); val buf = mutable.ArrayBuffer[Any]()
        while (it.hasNext) buf += fromNode(it.next(), el)
        buf.toSeq
      case other => throw new IllegalArgumentException(
        s"LANGUAGE PYTHON: unsupported return type $other")
    }
  }

  // ---- registration ---------------------------------------------------

  /** Register `name` as a session UDF over `python3` workers. Arity 0–6. */
  def register(spark: SparkSession, name: String, code: String, handler: String,
      paramTypes: Seq[String], returnType: String): Unit = {
    validate(code, handler)
    val ret = sparkType(returnType)
    def invoke(args: Seq[Any]): Any = {
      val arr = nodes.arrayNode()
      args.foreach(a => arr.add(toNode(a)))
      fromNode(workerFor(code, handler).call(arr), ret)
    }
    paramTypes.length match {
      case 0 => spark.udf.register(name, new UDF0[Any] {
        override def call(): Any = invoke(Nil) }, ret)
      case 1 => spark.udf.register(name, new UDF1[Any, Any] {
        override def call(a: Any): Any = invoke(Seq(a)) }, ret)
      case 2 => spark.udf.register(name, new UDF2[Any, Any, Any] {
        override def call(a: Any, b: Any): Any = invoke(Seq(a, b)) }, ret)
      case 3 => spark.udf.register(name, new UDF3[Any, Any, Any, Any] {
        override def call(a: Any, b: Any, c: Any): Any = invoke(Seq(a, b, c)) }, ret)
      case 4 => spark.udf.register(name, new UDF4[Any, Any, Any, Any, Any] {
        override def call(a: Any, b: Any, c: Any, d: Any): Any = invoke(Seq(a, b, c, d)) }, ret)
      case 5 => spark.udf.register(name, new UDF5[Any, Any, Any, Any, Any, Any] {
        override def call(a: Any, b: Any, c: Any, d: Any, e: Any): Any = invoke(Seq(a, b, c, d, e)) }, ret)
      case 6 => spark.udf.register(name, new UDF6[Any, Any, Any, Any, Any, Any, Any] {
        override def call(a: Any, b: Any, c: Any, d: Any, e: Any, f: Any): Any = invoke(Seq(a, b, c, d, e, f)) }, ret)
      case n => throw new IllegalArgumentException(
        s"LANGUAGE PYTHON: arity $n not supported (max 6)")
    }
  }
}
