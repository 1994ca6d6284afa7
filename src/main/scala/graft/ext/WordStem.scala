package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemmer (reference: operator/scalar/WordStemFunction.java exposes
  * word_stem via a Lucene snowball stemmer; this is the classic Porter (1980)
  * algorithm — "An algorithm for suffix stripping" — implemented directly).
  * English-only, lowercase input expected (mirrors word_stem(varchar)). */
object PorterStemmer {

  private def isVowel(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(w, i - 1)
    case _ => false
  }

  /** Measure m of the stem: number of VC sequences. */
  private def measure(w: String): Int = {
    var m = 0; var i = 0; val n = w.length
    while (i < n && !isVowel(w, i)) i += 1
    while (i < n) {
      while (i < n && isVowel(w, i)) i += 1
      if (i < n) { m += 1; while (i < n && !isVowel(w, i)) i += 1 }
    }
    m
  }

  private def containsVowel(w: String): Boolean = w.indices.exists(isVowel(w, _))
  private def doubleC(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) && !isVowel(w, w.length - 1)
  /** cvc where final c is not w/x/y. */
  private def cvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && !isVowel(w, n - 3) && isVowel(w, n - 2) && !isVowel(w, n - 1) &&
      !"wxy".contains(w.charAt(n - 1))
  }

  private def replace(w: String, suf: String, rep: String, minM: Int): Option[String] =
    if (w.endsWith(suf)) {
      val stem = w.substring(0, w.length - suf.length)
      if (measure(stem) > minM) Some(stem + rep) else Some(w)
    } else None

  def stem(word: String): String = {
    if (word.length <= 2) return word
    var w = word

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (!w.endsWith("ss") && w.endsWith("s")) w = w.dropRight(1)

    // step 1b
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else {
      val hit =
        if (w.endsWith("ed") && containsVowel(w.dropRight(2))) { w = w.dropRight(2); true }
        else if (w.endsWith("ing") && containsVowel(w.dropRight(3))) { w = w.dropRight(3); true }
        else false
      if (hit) {
        if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w = w + "e"
        else if (doubleC(w) && !"lsz".contains(w.last)) w = w.dropRight(1)
        else if (measure(w) == 1 && cvc(w)) w = w + "e"
      }
    }

    // step 1c
    if (w.endsWith("y") && containsVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // step 2
    val step2 = Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble")
    step2.collectFirst { case (s, r) if w.endsWith(s) => replace(w, s, r, 0) }
      .flatten.foreach(w = _)

    // step 3
    val step3 = Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> "")
    step3.collectFirst { case (s, r) if w.endsWith(s) => replace(w, s, r, 0) }
      .flatten.foreach(w = _)

    // step 4
    val step4 = Seq(
      "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
      "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize")
    step4.collectFirst {
      case s if w.endsWith(s) =>
        val stem = w.substring(0, w.length - s.length)
        if (measure(stem) > 1) stem else w
    }.foreach(w = _)
    if (w.endsWith("ion")) {
      val stem = w.dropRight(3)
      if (stem.nonEmpty && "st".contains(stem.last) && measure(stem) > 1) w = stem
    }

    // step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !cvc(stem))) w = stem
    }
    // step 5b
    if (measure(w) > 1 && doubleC(w) && w.endsWith("l")) w = w.dropRight(1)
    w
  }
}

/** word_stem(varchar) as a Catalyst expression. */
case class WordStem(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "word_stem"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(PorterStemmer.stem(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
