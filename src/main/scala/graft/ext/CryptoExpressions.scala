package graft.ext

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Keyed-hash + base32 scalar bundle (SURVEY.md §2.8 binary functions;
  * reference: core/trino-main/src/main/java/io/trino/operator/scalar/HmacFunctions.java,
  * StringFunctions.java to_base32/from_base32).
  *
  * HMAC uses the JVM's javax.crypto.Mac (RFC 2104); base32 is RFC 4648 with
  * padding, implemented directly (no external deps). Known-answer vectors are
  * oracle-checked (q_fn_crypto) — keyed digests are not reconstructible in
  * DuckDB SQL, so the oracle pins the public RFC-style vectors instead.
  */
object CryptoExpr {
  def hmacHex(algo: String, key: Array[Byte], msg: Array[Byte]): String = {
    val mac = javax.crypto.Mac.getInstance(algo)
    mac.init(new javax.crypto.spec.SecretKeySpec(key, algo))
    mac.doFinal(msg).map("%02x".format(_)).mkString
  }

  private val Alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"

  def base32Encode(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var buffer = 0L; var bits = 0
    data.foreach { b =>
      buffer = (buffer << 8) | (b & 0xffL); bits += 8
      while (bits >= 5) { bits -= 5; sb.append(Alphabet(((buffer >> bits) & 0x1f).toInt)) }
    }
    if (bits > 0) sb.append(Alphabet(((buffer << (5 - bits)) & 0x1f).toInt))
    while (sb.length % 8 != 0) sb.append('=')
    sb.toString
  }

  def base32Decode(s: String): Array[Byte] = {
    val clean = s.takeWhile(_ != '=')
    val out = new java.io.ByteArrayOutputStream()
    var buffer = 0L; var bits = 0
    clean.foreach { c =>
      val v = Alphabet.indexOf(c.toUpper)
      require(v >= 0, s"invalid base32 char '$c'")
      buffer = (buffer << 5) | v; bits += 5
      if (bits >= 8) { bits -= 8; out.write(((buffer >> bits) & 0xff).toInt) }
    }
    out.toByteArray
  }
}

/** hmac_<algo>(key, msg) → lowercase hex digest. */
case class HmacHex(left: Expression, right: Expression, algo: String)
    extends BinaryExpression with CodegenFallback {
  require(Set("HmacMD5", "HmacSHA1", "HmacSHA256", "HmacSHA512").contains(algo))

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING key and message")
  override def dataType: DataType = StringType
  override def prettyName: String = s"hmac_${algo.stripPrefix("Hmac").toLowerCase}"

  override def nullSafeEval(key: Any, msg: Any): Any =
    UTF8String.fromString(CryptoExpr.hmacHex(algo,
      key.asInstanceOf[UTF8String].getBytes, msg.asInstanceOf[UTF8String].getBytes))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** to_base32(string) → RFC 4648 base32 text. */
case class ToBase32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  override def dataType: DataType = StringType
  override def prettyName: String = "to_base32"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(CryptoExpr.base32Encode(input.asInstanceOf[UTF8String].getBytes))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** from_base32(text) → decoded string. */
case class FromBase32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires STRING input")
  override def dataType: DataType = StringType
  override def prettyName: String = "from_base32"
  override def nullSafeEval(input: Any): Any =
    UTF8String.fromBytes(CryptoExpr.base32Decode(input.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
