package graft.proto

import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

class JenkinsHashSpec extends AnyFunSuite {

  test("matches lookup3.c's published self-test vectors") {
    // vectors from the lookup3.c driver comments (public domain)
    assert(JenkinsHash.hash(Array.empty[Byte], 0) === 0xdeadbeef)
    assert(JenkinsHash.hash(Array.empty[Byte], 0xdeadbeef) === 0xbd5b7dde)
    val four = "Four score and seven years ago".getBytes(UTF_8)
    assert(JenkinsHash.hash(four, 0) === 0x17770551)
    assert(JenkinsHash.hash(four, 1) === 0xcd628161)
  }

  test("block boundaries: 12/13/24/25-byte inputs all hash distinctly") {
    val hashes = Seq(12, 13, 24, 25).map(n =>
      JenkinsHash.hash(Array.tabulate[Byte](n)(_.toByte)))
    assert(hashes.distinct.size === hashes.size)
  }

  test("encodeRegionName: decimal absolute value, deterministic") {
    val name = "t1,k,1234567890".getBytes(UTF_8)
    val enc = JenkinsHash.encodeRegionName(name)
    assert(enc.forall(_.isDigit))
    assert(enc === JenkinsHash.encodeRegionName(name.clone()))
  }
}
