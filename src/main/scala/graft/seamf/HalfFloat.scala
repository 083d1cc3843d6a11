package graft.seamf

/** IEEE 754 binary16 (half) <-> binary32 (float) conversion.
  *
  * The seamf payload is a little-endian float16 vector
  * (`np.frombuffer(byte_data, dtype="half")`,
  * /root/reference/src/sea_ingest/seamf.py:1044). Spark has no HalfType, so
  * ingest widens half->float deterministically (every binary16 value is
  * exactly representable in binary32 — the widening is lossless and
  * hash-stable). JDK 17 lacks Float.float16ToFloat (added in 20), so we
  * implement the standard bit algorithm.
  */
object HalfFloat {
  /** Convert one binary16 bit pattern (low 16 bits) to float. */
  def toFloat(h: Int): Float = {
    val sign = (h >>> 15) & 0x1
    val exp = (h >>> 10) & 0x1f
    val mant = h & 0x3ff
    val bits =
      if (exp == 0) {
        if (mant == 0) sign << 31 // signed zero
        else {
          // subnormal half -> normalized float
          var m = mant
          var e = -1
          while ((m & 0x400) == 0) { m <<= 1; e += 1 }
          m &= 0x3ff
          (sign << 31) | ((127 - 15 - e) << 23) | (m << 13)
        }
      } else if (exp == 0x1f) {
        // inf / nan
        (sign << 31) | 0x7f800000 | (mant << 13)
      } else {
        (sign << 31) | ((exp - 15 + 127) << 23) | (mant << 13)
      }
    java.lang.Float.intBitsToFloat(bits)
  }

  /** Convert a float to the nearest binary16 bit pattern (round-to-nearest-
    * even), for fixture generation.
    */
  def fromFloat(f: Float): Short = {
    val bits = java.lang.Float.floatToIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val e = (bits >>> 23) & 0xff
    val m = bits & 0x7fffff
    if (e == 0xff) { // inf / nan
      (sign | 0x7c00 | (if (m != 0) 0x200 | (m >>> 13) else 0)).toShort
    } else {
      val exp = e - 127 + 15
      if (exp >= 0x1f) (sign | 0x7c00).toShort // overflow -> inf
      else if (exp <= 0) {
        if (exp < -10) sign.toShort // underflow -> signed zero
        else {
          // subnormal half
          val fullM = m | 0x800000
          val shift = 14 - exp
          val half = fullM >>> shift
          val rem = fullM & ((1 << shift) - 1)
          val roundBit = 1 << (shift - 1)
          val rounded =
            if (rem > roundBit || (rem == roundBit && (half & 1) == 1)) half + 1
            else half
          (sign | rounded).toShort
        }
      } else {
        val half = (sign | (exp << 10) | (m >>> 13))
        val rem = m & 0x1fff
        val rounded =
          if (rem > 0x1000 || (rem == 0x1000 && (half & 1) == 1)) half + 1
          else half
        rounded.toShort
      }
    }
  }

  /** Decode a little-endian float16 byte payload into a float array. */
  def decodeVector(bytes: Array[Byte]): Array[Float] = {
    require(bytes.length % 2 == 0,
      s"float16 payload must have even length, got ${bytes.length}")
    val out = new Array[Float](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      val lo = bytes(2 * i) & 0xff
      val hi = bytes(2 * i + 1) & 0xff
      out(i) = toFloat((hi << 8) | lo)
      i += 1
    }
    out
  }

  /** Encode a float array as a little-endian float16 byte payload. */
  def encodeVector(values: Array[Float]): Array[Byte] = {
    val out = new Array[Byte](values.length * 2)
    var i = 0
    while (i < values.length) {
      val h = fromFloat(values(i)) & 0xffff
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >>> 8) & 0xff).toByte
      i += 1
    }
    out
  }
}
