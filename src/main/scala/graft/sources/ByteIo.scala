package graft.sources

/** Shared bounds-safe byte readers for the container/codec parsers
  * (consolidated in the r17 review pass — MediaProbe, WavCodec,
  * GifCodec, and JpegCodec each carried private copies that had begun
  * to drift). All are pure reads; callers own their own bounds checks
  * for multi-byte access (the helpers assume the indices fit, exactly
  * as the originals did). */
private[sources] object ByteIo {

  /** ASCII string match at offset `i`, false when it would overrun. */
  def ascii(b: Array[Byte], i: Int, s: String): Boolean =
    i + s.length <= b.length && s.indices.forall(k => (b(i + k) & 0xFF) == s.charAt(k))

  def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)

  def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
}
