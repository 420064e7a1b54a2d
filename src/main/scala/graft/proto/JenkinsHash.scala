package graft.proto

/** Bob Jenkins' lookup3 `hashlittle` (public domain, lookup3.c, 2006) —
  * the hash HBase uses to encode OLD-style (pre-0.92) region names
  * (reference hbase.clj:101-108; HBase `RegionInfo.encodeRegionName` =
  * `String.valueOf(Math.abs(JenkinsHash.hash(name, 0)))`). Ported from
  * the published algorithm; validated against lookup3.c's own self-test
  * vectors in JenkinsHashSpec.
  */
object JenkinsHash {

  private def rot(x: Int, k: Int): Int = Integer.rotateLeft(x, k)

  /** 32-bit hashlittle over `key`, returned as the (possibly negative)
    * Int c-value, exactly like Hadoop/HBase's JenkinsHash#hash.
    */
  def hash(key: Array[Byte], initval: Int = 0): Int = {
    var length = key.length
    var a = 0xdeadbeef + length + initval
    var b = a
    var c = a
    var off = 0

    @inline def word(o: Int, n: Int): Int = {
      // little-endian partial word: bytes past the end contribute zero
      var v = 0
      var i = n - 1
      while (i >= 0) {
        v = (v << 8) | (if (off + o + i < key.length) key(off + o + i) & 0xff else 0)
        i -= 1
      }
      v
    }

    while (length > 12) {
      a += word(0, 4); b += word(4, 4); c += word(8, 4)
      // mix
      a -= c; a ^= rot(c, 4);  c += b
      b -= a; b ^= rot(a, 6);  a += c
      c -= b; c ^= rot(b, 8);  b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4);  b += a
      off += 12; length -= 12
    }

    if (length == 0) return c
    a += word(0, math.min(4, length))
    if (length > 4) b += word(4, math.min(4, length - 4))
    if (length > 8) c += word(8, length - 8)
    // final
    c ^= b; c -= rot(b, 14)
    a ^= c; a -= rot(c, 11)
    b ^= a; b -= rot(a, 25)
    c ^= b; c -= rot(b, 16)
    a ^= c; a -= rot(c, 4)
    b ^= a; b -= rot(a, 14)
    c ^= b; c -= rot(b, 24)
    c
  }

  /** HBase's old-style encoded region name: decimal |hash| of the full
    * region-name bytes.
    */
  def encodeRegionName(name: Array[Byte]): String =
    String.valueOf(math.abs(hash(name)))
}
