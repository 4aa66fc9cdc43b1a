package graft.sort

/** Shared memcmp-key building blocks for the row-format sort kernels
  * (see [[RowFormatSort]] for the encoding spec).
  */
private[sort] object KeyCodec {

  /** Big-endian long view over byte[] — one store instead of eight. */
  val LongBE: java.lang.invoke.VarHandle =
    java.lang.invoke.MethodHandles.byteArrayViewVarHandle(
      classOf[Array[Long]], java.nio.ByteOrder.BIG_ENDIAN)

  /** IEEE-754 monotonic transform; -0.0/NaN normalized to match Spark SQL
    * double ordering (NaN greatest, NaN==NaN, -0.0==0.0).
    */
  def doubleBits(d: Double): Long = {
    val norm = if (d.isNaN) Double.NaN else if (d == 0.0d) 0.0d else d
    val bits = java.lang.Double.doubleToLongBits(norm)
    if (bits < 0) ~bits else bits | Long.MinValue
  }

  /** UTF-8 encode straight into the key buffer — `String.getBytes` would
    * allocate a temp array per value in the hot loop. 0x00 escaped as
    * (0x00,0xFF); (0x00,0x01) terminator keeps prefix-first order.
    */
  /** Escape-copy already-encoded UTF-8 bytes (Arrow layout) into the key
    * buffer: 0x00 → (0x00,0xFF), then the (0x00,0x01) terminator.
    */
  def putUtf8Bytes(w: KeyWriter, bytes: Array[Byte]): Unit = {
    w.ensure(bytes.length * 2 + 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == 0) { w.buf(w.len) = 0; w.buf(w.len + 1) = 0xff.toByte; w.len += 2 }
      else { w.buf(w.len) = b; w.len += 1 }
      i += 1
    }
    w.buf(w.len) = 0; w.buf(w.len + 1) = 1; w.len += 2
  }

  def putString(w: KeyWriter, s: String): Unit = {
    val n = s.length
    w.ensure(n * 3 + 4) // worst case for BMP chars + terminator
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == 0) { w.put(0x00); w.put(0xff) } // escape embedded NUL
      else if (c < 0x80) { w.buf(w.len) = c.toByte; w.len += 1 }
      else if (c < 0x800) {
        w.put(0xc0 | (c >> 6)); w.put(0x80 | (c & 0x3f))
      } else if (Character.isHighSurrogate(c) && i + 1 < n && Character.isLowSurrogate(s.charAt(i + 1))) {
        val cp = Character.toCodePoint(c, s.charAt(i + 1))
        w.ensure(4)
        w.put(0xf0 | (cp >> 18)); w.put(0x80 | ((cp >> 12) & 0x3f))
        w.put(0x80 | ((cp >> 6) & 0x3f)); w.put(0x80 | (cp & 0x3f))
        i += 1
      } else {
        w.put(0xe0 | (c >> 12)); w.put(0x80 | ((c >> 6) & 0x3f)); w.put(0x80 | (c & 0x3f))
      }
      i += 1
    }
    w.put(0x00); w.put(0x01) // terminator < any continuation
  }
}

/** Unsynchronized growable byte sink (ByteArrayOutputStream's lock and
  * per-byte call overhead dominate the kernels otherwise).
  */
private[sort] final class KeyWriter(initial: Int) {
  var buf = new Array[Byte](initial)
  var len = 0
  def reset(): Unit = len = 0
  def ensure(n: Int): Unit =
    if (len + n > buf.length)
      buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + n))
  def put(b: Int): Unit = { ensure(1); buf(len) = b.toByte; len += 1 }
  def putLong(x: Long): Unit = {
    ensure(8)
    KeyCodec.LongBE.set(buf, len, x)
    len += 8
  }
  def key(): Array[Byte] = java.util.Arrays.copyOf(buf, len)
}
