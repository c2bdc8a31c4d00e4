package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Independent reference implementations of Spark's native hash family
  * (xxhash64 / hash(murmur3) / crc32 / sha1), written from the public
  * algorithm specifications — deliberately NOT delegating to the Spark
  * or JDK implementations the builtins use. Purpose: the `fn_hash_native`
  * query emits per-row agreement booleans (builtin == reference), which
  * turns the previously rows-only "no DuckDB counterpart" check into a
  * fully oracled cross-implementation test: two unrelated codebases must
  * agree bit-for-bit on every document, or the row hash-mismatches.
  *
  * Reference mirrors: the reference engine re-implements Spark's hash
  * functions natively and pins them against vanilla Spark in its UT
  * layer (apache/incubator-gluten
  * gluten-ut/.../GlutenHashExpressionsSuite re-runs Spark's
  * HashExpressionsSuite); this is the same contract, tested from the
  * opposite direction.
  */
object PureHashes {

  // ---- xxHash64 (Cyan4973/xxHash spec; Spark's xxhash64 seeds with 42)

  private final val P1 = 0x9E3779B185EBCA87L
  private final val P2 = 0xC2B2AE3D27D4EB4FL
  private final val P3 = 0x165667B19E3779F9L
  private final val P4 = 0x85EBCA77C2B2AE63L
  private final val P5 = 0x27D4EB2F165667C5L

  private def getLongLE(d: Array[Byte], i: Int): Long =
    (d(i) & 0xFFL) | ((d(i + 1) & 0xFFL) << 8) | ((d(i + 2) & 0xFFL) << 16) |
      ((d(i + 3) & 0xFFL) << 24) | ((d(i + 4) & 0xFFL) << 32) |
      ((d(i + 5) & 0xFFL) << 40) | ((d(i + 6) & 0xFFL) << 48) |
      ((d(i + 7) & 0xFFL) << 56)

  private def getIntLE(d: Array[Byte], i: Int): Int =
    (d(i) & 0xFF) | ((d(i + 1) & 0xFF) << 8) | ((d(i + 2) & 0xFF) << 16) |
      ((d(i + 3) & 0xFF) << 24)

  private def xxRound(acc: Long, input: Long): Long =
    java.lang.Long.rotateLeft(acc + input * P2, 31) * P1

  def xxh64(data: Array[Byte], seed: Long): Long = {
    val len = data.length
    var i = 0
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (i + 32 <= len) {
          v1 = xxRound(v1, getLongLE(data, i))
          v2 = xxRound(v2, getLongLE(data, i + 8))
          v3 = xxRound(v3, getLongLE(data, i + 16))
          v4 = xxRound(v4, getLongLE(data, i + 24))
          i += 32
        }
        var acc = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
          java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
        acc = (acc ^ xxRound(0L, v1)) * P1 + P4
        acc = (acc ^ xxRound(0L, v2)) * P1 + P4
        acc = (acc ^ xxRound(0L, v3)) * P1 + P4
        acc = (acc ^ xxRound(0L, v4)) * P1 + P4
        acc
      } else seed + P5
    h += len
    while (i + 8 <= len) {
      h ^= xxRound(0L, getLongLE(data, i))
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h ^= (getIntLE(data, i) & 0xFFFFFFFFL) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h ^= (data(i) & 0xFFL) * P5
      h = java.lang.Long.rotateLeft(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33; h *= P2; h ^= h >>> 29; h *= P3; h ^= h >>> 32
    h
  }

  // ---- Murmur3 x86_32 (Appleby's spec), with Spark's documented tail
  // rule: each trailing byte (SIGNED) runs through a full mix round
  // instead of the reference's accumulated-tail block — this is the
  // variant Spark's `hash()` computes, seed 42.

  def murmur3(data: Array[Byte], seed: Int): Int = {
    val C1 = 0xcc9e2d51
    val C2 = 0x1b873593
    var h1 = seed
    val aligned = data.length - data.length % 4
    var i = 0
    def mix(word: Int): Unit = {
      var k1 = word
      k1 *= C1; k1 = Integer.rotateLeft(k1, 15); k1 *= C2
      h1 ^= k1; h1 = Integer.rotateLeft(h1, 13); h1 = h1 * 5 + 0xe6546b64
    }
    while (i < aligned) { mix(getIntLE(data, i)); i += 4 }
    while (i < data.length) { mix(data(i).toInt); i += 1 }
    h1 ^= data.length
    h1 ^= h1 >>> 16; h1 *= 0x85ebca6b; h1 ^= h1 >>> 13; h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1
  }

  // ---- CRC-32 (ISO-HDLC, reflected, poly 0xEDB88320) — table-driven,
  // independent of java.util.zip.CRC32 (which Spark's builtin wraps).

  private val crcTable: Array[Int] = Array.tabulate(256) { n =>
    var c = n
    var k = 0
    while (k < 8) {
      c = if ((c & 1) != 0) 0xEDB88320 ^ (c >>> 1) else c >>> 1
      k += 1
    }
    c
  }

  def crc32(data: Array[Byte]): Long = {
    var c = 0xFFFFFFFF
    var i = 0
    while (i < data.length) {
      c = crcTable((c ^ data(i)) & 0xFF) ^ (c >>> 8)
      i += 1
    }
    (~c).toLong & 0xFFFFFFFFL
  }

  // ---- SHA-1 (FIPS 180-1) — full from-scratch block implementation,
  // independent of java.security.MessageDigest (which Spark's wraps).

  def sha1Hex(data: Array[Byte]): String = {
    // pad: 0x80, zeros to 56 mod 64, then 64-bit big-endian bit length
    val bitLen = data.length.toLong * 8
    val padded = {
      val totalLen = ((data.length + 8) / 64 + 1) * 64
      val p = new Array[Byte](totalLen)
      System.arraycopy(data, 0, p, 0, data.length)
      p(data.length) = 0x80.toByte
      var j = 0
      while (j < 8) {
        p(totalLen - 1 - j) = ((bitLen >>> (8 * j)) & 0xFF).toByte
        j += 1
      }
      p
    }
    var h0 = 0x67452301; var h1 = 0xEFCDAB89; var h2 = 0x98BADCFE
    var h3 = 0x10325476; var h4 = 0xC3D2E1F0
    val w = new Array[Int](80)
    var block = 0
    while (block < padded.length) {
      var t = 0
      while (t < 16) {
        val i = block + t * 4
        w(t) = ((padded(i) & 0xFF) << 24) | ((padded(i + 1) & 0xFF) << 16) |
          ((padded(i + 2) & 0xFF) << 8) | (padded(i + 3) & 0xFF)
        t += 1
      }
      while (t < 80) {
        w(t) = Integer.rotateLeft(w(t - 3) ^ w(t - 8) ^ w(t - 14) ^ w(t - 16), 1)
        t += 1
      }
      var a = h0; var b = h1; var c = h2; var d = h3; var e = h4
      t = 0
      while (t < 80) {
        val (f, k) =
          if (t < 20) ((b & c) | (~b & d), 0x5A827999)
          else if (t < 40) (b ^ c ^ d, 0x6ED9EBA1)
          else if (t < 60) ((b & c) | (b & d) | (c & d), 0x8F1BBCDC.toInt)
          else (b ^ c ^ d, 0xCA62C1D6.toInt)
        val temp = Integer.rotateLeft(a, 5) + f + e + k + w(t)
        e = d; d = c; c = Integer.rotateLeft(b, 30); b = a; a = temp
        t += 1
      }
      h0 += a; h1 += b; h2 += c; h3 += d; h4 += e
      block += 64
    }
    f"$h0%08x$h1%08x$h2%08x$h3%08x$h4%08x"
  }
}

/** Catalyst expression exposing [[PureHashes]] over a string column.
  * CodegenFallback is acceptable here: the reference hashes exist for
  * verification queries, not hot paths (the engine's production hashing
  * is Spark's codegen'd builtins, which these pin). */
case class RefHash(child: Expression, algo: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = algo match {
    case "murmur3" => IntegerType
    case "sha1" => StringType
    case _ => LongType // xxh64, crc32
  }
  override def nullIntolerant: Boolean = true
  override def prettyName: String = s"ref_$algo"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    algo match {
      case "xxh64" => PureHashes.xxh64(bytes, 42L)
      case "murmur3" => PureHashes.murmur3(bytes, 42)
      case "crc32" => PureHashes.crc32(bytes)
      case "sha1" => UTF8String.fromString(PureHashes.sha1Hex(bytes))
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object RefHash {
  def ref_xxh64(c: Column): Column =
    ColumnBridge.column(RefHash(ColumnBridge.expression(c), "xxh64"))
  def ref_murmur3(c: Column): Column =
    ColumnBridge.column(RefHash(ColumnBridge.expression(c), "murmur3"))
  def ref_crc32(c: Column): Column =
    ColumnBridge.column(RefHash(ColumnBridge.expression(c), "crc32"))
  def ref_sha1(c: Column): Column =
    ColumnBridge.column(RefHash(ColumnBridge.expression(c), "sha1"))
}
