package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.PathCodec

/** Hive-style partition path unescaping is %XX-only: a literal '+' is a
  * legal character in a partition value and must survive (URLDecoder's
  * form-urlencoded rules would corrupt it to a space). */
class PathCodecSpec extends AnyFunSuite {

  test("decodes %XX escapes") {
    assert(PathCodec.unescape("a%3Db") == "a=b")
    assert(PathCodec.unescape("2024%2F01%2F01") == "2024/01/01")
    assert(PathCodec.unescape("x%25y") == "x%y")
    assert(PathCodec.unescape("%2B") == "+")
  }

  test("a literal '+' is preserved, not turned into a space") {
    assert(PathCodec.unescape("c++") == "c++")
    assert(PathCodec.unescape("1+1%3D2") == "1+1=2")
  }

  test("plain and malformed inputs pass through") {
    assert(PathCodec.unescape("plain") == "plain")
    assert(PathCodec.unescape("") == "")
    assert(PathCodec.unescape("50%") == "50%")
    assert(PathCodec.unescape("%zz") == "%zz")
    assert(PathCodec.unescape("%a") == "%a")
  }

  test("round-trips Spark's own staged partition dir names") {
    // Spark escapes these when writing partitionBy dirs; values chosen to
    // cover every class: reserved char, space, unicode-safe ASCII, plus
    val values = Seq("a=b", "a b", "a/b", "a%b", "a+b", "a:b")
    values.foreach { v =>
      val escaped = v.flatMap {
        case c if "\"#%'*/:=?\\{}[]^".contains(c) || c < ' ' =>
          f"%%${c.toInt}%02X"
        case c => c.toString
      }
      assert(PathCodec.unescape(escaped) == v, s"value $v via $escaped")
    }
  }
}
