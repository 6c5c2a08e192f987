package graft.functions

import java.nio.ByteBuffer

import WireHeaders.{putUvarint, getUvarint, putCompactString, getCompactString,
  putCompactNullableString, getCompactNullableString, putCompactArrayLen,
  getCompactArrayLen, putEmptyTags, getTags, compactStringSize, uvarintSize,
  readLegacyBytes}

/** Shared legacy-protocol primitives for the WireVersions family traits
  * (split out of the single 4.2k-line object in round 17 — pure move,
  * the public `WireVersions.XxxV` references are unchanged). */
private[functions] trait WireVersionsBase {
  // ----------------------------------------------------- legacy helpers

  protected def putStr(b: ByteBuffer, s: String): Unit = {
    val bts = s.getBytes("UTF-8")
    b.putShort(bts.length.toShort); b.put(bts)
  }
  protected def getStr(b: ByteBuffer): String = {
    val n = b.getShort()
    require(n >= 0 && n <= b.remaining(), s"string length $n exceeds frame")
    val a = new Array[Byte](n); b.get(a); new String(a, "UTF-8")
  }
  protected def putNullableStr(b: ByteBuffer, s: Option[String]): Unit = s match {
    case None => b.putShort(-1)
    case Some(v) => putStr(b, v)
  }
  protected def getNullableStr(b: ByteBuffer): Option[String] = {
    val n = b.getShort()
    if (n < 0) None
    else {
      require(n <= b.remaining(), s"string length $n exceeds frame")
      val a = new Array[Byte](n); b.get(a); Some(new String(a, "UTF-8"))
    }
  }
  protected def strSize(s: String): Int = 2 + s.getBytes("UTF-8").length
  protected def nullableStrSize(s: Option[String]): Int =
    s.map(strSize).getOrElse(2)
  protected def compactNullableStrSize(s: Option[String]): Int =
    s.map(compactStringSize).getOrElse(1)


  protected def putLegacyBytes(b: ByteBuffer, a: Array[Byte]): Unit = {
    b.putInt(a.length); b.put(a)
  }
  protected def putCompactBytes(b: ByteBuffer, a: Array[Byte]): Unit = {
    putUvarint(b, a.length + 1L); b.put(a)
  }
  protected def getCompactBytes(b: ByteBuffer): Array[Byte] = {
    val n = getUvarint(b).toInt - 1
    require(n >= 0 && n <= b.remaining(), s"bytes length $n exceeds frame")
    val a = new Array[Byte](n); b.get(a); a
  }
  protected def compactBytesSize(a: Array[Byte]): Int =
    uvarintSize(a.length + 1L) + a.length
}
