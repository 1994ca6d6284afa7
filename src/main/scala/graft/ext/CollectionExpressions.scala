package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Multimap / histogram collection builders (SURVEY.md §2.8 map functions;
  * reference: core/trino-main/src/main/java/io/trino/operator/scalar/
  * SplitToMultimapFunction.java, MultimapFromEntriesFunction.java,
  * ArrayHistogramFunction.java).
  *
  * Each preserves the reference's observable semantics: values keep their
  * order of appearance, keys keep first-appearance order (callers that need
  * deterministic output sort the entries), null map entries / null keys are
  * errors, and array_histogram counts only non-null elements. The reference's
  * multimap_agg is the composition multimap_from_entries(array_agg(row(k, v)))
  * and is exposed that way (AggregationFunction multimap_agg —
  * operator/aggregation/multimapagg/MultimapAggregationFunction.java).
  */
private[ext] object MultimapBuild {
  /** SQL-equality hash key for a Catalyst value: JVM equality alone would
    * split -0.0 from 0.0 (boxed Double/Float) and compare binary by array
    * identity, so normalize both before hashing. Struct/array keys are
    * restricted by the callers' type checks to atomic element types. */
  def hashKey(v: Any): Any = v match {
    case d: java.lang.Double if d.doubleValue() == 0.0 => 0.0
    case f: java.lang.Float if f.floatValue() == 0.0f => 0.0f
    case b: Array[Byte] => b.toSeq
    case other => other
  }

  /** Group (key, value) pairs into a MapData of key → array(values), keys in
    * first-appearance order, values in pair order. */
  def group(pairs: Iterator[(Any, Any)], what: String): ArrayBasedMapData = {
    val order = scala.collection.mutable.ArrayBuffer[Any]()
    val byKey = scala.collection.mutable.HashMap[Any, scala.collection.mutable.ArrayBuffer[Any]]()
    pairs.foreach { case (k, v) =>
      require(k != null, s"$what: map key cannot be null")
      val hk = hashKey(k)
      byKey.getOrElseUpdate(hk, { order += k; scala.collection.mutable.ArrayBuffer[Any]() }) += v
    }
    new ArrayBasedMapData(
      new GenericArrayData(order.toArray),
      new GenericArrayData(order.map(k =>
        new GenericArrayData(byKey(hashKey(k)).toArray): Any).toArray))
  }
}

/** split_to_multimap(s, entryDelimiter, keyValueDelimiter) → map<string, array<string>>. */
case class SplitToMultimap(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires three STRING arguments")
  override def dataType: DataType =
    MapType(StringType, ArrayType(StringType, containsNull = false), valueContainsNull = false)
  override def prettyName: String = "split_to_multimap"
  override def nullSafeEval(s: Any, ed: Any, kd: Any): Any = {
    val str = s.asInstanceOf[UTF8String].toString
    val entryD = ed.asInstanceOf[UTF8String].toString
    val kvD = kd.asInstanceOf[UTF8String].toString
    require(entryD.nonEmpty && kvD.nonEmpty, s"$prettyName: delimiters may not be empty")
    require(entryD != kvD,
      s"$prettyName: entryDelimiter and keyValueDelimiter must not be the same")
    // Reference scan semantics (SplitToMultimapFunction.java): empty input →
    // empty map; a trailing entry delimiter leaves an empty tail that is
    // skipped; the key-value delimiter must occur exactly once per entry.
    val parts = str.split(java.util.regex.Pattern.quote(entryD), -1)
    val keep =
      if (parts.length > 1 && parts.last.isEmpty) parts.length - 1 else parts.length
    val pairs = parts.iterator.take(keep).filterNot(e => str.isEmpty && e.isEmpty).map { entry =>
      val i = entry.indexOf(kvD)
      require(i >= 0, s"$prettyName: entry '$entry' has no key-value delimiter '$kvD'")
      require(entry.indexOf(kvD, i + kvD.length) < 0,
        s"$prettyName: entry '$entry' has more than one key-value delimiter '$kvD'")
      (UTF8String.fromString(entry.substring(0, i)): Any,
        UTF8String.fromString(entry.substring(i + kvD.length)): Any)
    }
    MultimapBuild.group(pairs, prettyName)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** multimap_from_entries(array<struct<k, v>>) → map<k, array<v>>. */
case class MultimapFromEntries(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private def entryType: Option[(DataType, DataType, Boolean)] = child.dataType match {
    case ArrayType(StructType(Array(k, v)), _) => Some((k.dataType, v.dataType, v.nullable))
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (entryType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRUCT<k, v>>, got ${child.dataType.simpleString}")
  override def dataType: DataType = {
    val (k, v, vn) = entryType.get
    MapType(k, ArrayType(v, containsNull = vn), valueContainsNull = false)
  }
  override def prettyName: String = "multimap_from_entries"
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val pairs = (0 until arr.numElements()).iterator.map { i =>
      require(!arr.isNullAt(i), s"$prettyName: map entry cannot be null")
      val row = arr.getStruct(i, 2)
      val (kt, vt, _) = entryType.get
      (row.get(0, kt), row.get(1, vt))
    }
    MultimapBuild.group(pairs, prettyName)
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

/** array_histogram(array<T>) → map<T, bigint> counting non-null elements. */
case class ArrayHistogram(child: Expression)
    extends UnaryExpression with CodegenFallback {
  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t, _) => Some(t)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType.isDefined) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY, got ${child.dataType.simpleString}")
  override def dataType: DataType = MapType(elemType.get, LongType, valueContainsNull = false)
  override def prettyName: String = "array_histogram"
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val t = elemType.get
    val order = scala.collection.mutable.ArrayBuffer[Any]()
    val counts = scala.collection.mutable.HashMap[Any, Long]()
    (0 until arr.numElements()).foreach { i =>
      if (!arr.isNullAt(i)) {
        val v = arr.get(i, t)
        val hk = MultimapBuild.hashKey(v)
        if (!counts.contains(hk)) order += v
        counts(hk) = counts.getOrElse(hk, 0L) + 1L
      }
    }
    new ArrayBasedMapData(
      new GenericArrayData(order.toArray),
      new GenericArrayData(order.map(v =>
        counts(MultimapBuild.hashKey(v)): Any).toArray))
  }
  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}
