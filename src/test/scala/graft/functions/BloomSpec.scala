package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomSpec extends SparkSpec {

  test("BloomLong: NO false negatives over 20k random keys; fpp sane") {
    val rnd = new scala.util.Random(11)
    val members = Array.fill(20000)(rnd.nextLong())
    val words = new Array[Long](((10L * members.length + 63) / 64).toInt) // ~10 bits/key
    members.foreach(BloomLong.add(words, _, 5))
    // the bloom contract: every inserted key answers true, always
    assert(members.forall(BloomLong.mightContain(words, _, 5)))
    // false-positive rate near the ~1% theory value for 10 bits/key, k=5
    val memberSet = members.toSet
    val probes = Array.fill(20000)(rnd.nextLong()).filterNot(memberSet)
    val fp = probes.count(BloomLong.mightContain(words, _, 5))
    assert(fp.toDouble / probes.length < 0.05, s"fpp ${fp.toDouble / probes.length}")
  }

  test("bit positions stay in range past 2^31 bits (Long arithmetic)") {
    // (2^31 + 64) bits: an Int `words.length * 64` wraps negative here and
    // indexed far outside the array before the Long fix
    val words = new Array[Long]((((1L << 31) + 64) / 64).toInt)
    val rnd = new scala.util.Random(5)
    val keys = Array.fill(200)(rnd.nextLong())
    keys.foreach(BloomLong.add(words, _, 5))
    assert(keys.forall(BloomLong.mightContain(words, _, 5)))
    // 200 keys x 5 bits in 2^31 bits: a non-member probe is ~never positive
    val absent = Array.fill(200)(rnd.nextLong()).filterNot(keys.toSet)
    assert(absent.count(BloomLong.mightContain(words, _, 5)) === 0)
  }

  test("BloomLong serialize/deserialize roundtrip preserves bits and k") {
    val words = Array(0x12345678L, -1L, 0L, Long.MinValue)
    val bytes = BloomLong.serialize(words, 7)
    val (w2, k2) = BloomLong.deserialize(bytes)
    assert(w2.toSeq === words.toSeq && k2 === 7)
    // malformed input fails loudly, not with an index error downstream
    assertThrows[IllegalArgumentException](BloomLong.deserialize(bytes.dropRight(1)))
  }

  test("distributed build == single-threaded build; probe expression agrees") {
    val s = spark
    import s.implicits._
    val keys = (0L until 5000L).map(i => i * 2654435761L)
    // distributed: partial buffers OR-merge across 4 partitions
    val bytes = keys.toDF("v").repartition(4)
      .agg(BloomFunctions.bloomAgg(col("v"), 1 << 16, 5)).head.getAs[Array[Byte]](0)
    val local = new Array[Long](1 << 10)
    keys.foreach(BloomLong.add(local, _, 5))
    assert(BloomLong.deserialize(bytes)._1.toSeq === local.toSeq)
    // probe via the codegen expression: members all true
    val hits = keys.toDF("v")
      .filter(BloomFunctions.mightContain(bytes, col("v"))).count()
    assert(hits === keys.length.toLong)
  }

  test("bloomAgg ignores NULLs and rejects bad params") {
    val s = spark
    import s.implicits._
    val bytes = Seq(Some(1L), None, Some(2L)).toDF("v")
      .agg(BloomFunctions.bloomAgg(col("v"), 128, 3)).head.getAs[Array[Byte]](0)
    val (w, _) = BloomLong.deserialize(bytes)
    val expected = new Array[Long](2)
    BloomLong.add(expected, 1L, 3); BloomLong.add(expected, 2L, 3)
    assert(w.toSeq === expected.toSeq)
    assertThrows[IllegalArgumentException](BloomFunctions.bloomAgg(col("v"), 0, 3))
    assertThrows[IllegalArgumentException](BloomFunctions.bloomAgg(col("v"), 64, 99))
  }
}
