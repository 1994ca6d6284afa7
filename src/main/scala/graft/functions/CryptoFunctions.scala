package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

import graft.ext.{FromBase32, HmacHex, ToBase32}

/** Column surface for the keyed-hash/base32 bundle (graft.ext.CryptoExpressions;
  * reference HmacFunctions.java, StringFunctions.java). */
object CryptoFunctions {
  def hmacMd5(key: Column, msg: Column): Column =
    column(HmacHex(expression(key), expression(msg), "HmacMD5"))
  def hmacSha256(key: Column, msg: Column): Column =
    column(HmacHex(expression(key), expression(msg), "HmacSHA256"))
  def hmacSha512(key: Column, msg: Column): Column =
    column(HmacHex(expression(key), expression(msg), "HmacSHA512"))
  def toBase32(c: Column): Column = column(ToBase32(expression(c)))
  def fromBase32(c: Column): Column = column(FromBase32(expression(c)))
}
