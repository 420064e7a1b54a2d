package graft.inspector

import java.io.ByteArrayOutputStream

/** TCP payload → 4-byte-length-prefixed HBase RPC frames for ONE direction
  * of one client connection (reference: core.clj:152-259
  * process-hbase-packet — the `expects-more` / `advance-state` loop).
  *
  * Semantics kept from the reference:
  *   - a segment arriving with no buffered state whose first 4 bytes are
  *     not a valid length is skipped entirely (`valid-length?` heuristic,
  *     core.clj:86-100 — a mid-stream fragment we cannot frame);
  *   - several messages may share one segment (Nagle) and one message may
  *     span many segments;
  *   - an invalid length mid-buffer means desync: the rest of the buffer
  *     is dropped and the next segment re-syncs via the heuristic.
  *
  * Documented deviation: a 4-byte length prefix split across two segments
  * is buffered and completed (the reference's `read-int4` returns 0 at EOF
  * and drops the tail bytes); strictly more traffic is recovered.
  */
final class FrameAssembler(maxFrame: Int = FrameAssembler.MaxFrameBytes) {

  private var pending = new ByteArrayOutputStream(0)

  /** The `valid-length?` heuristic: positive and under 256 MiB. */
  def validLength(len: Int): Boolean = len > 0 && len < maxFrame

  /** Bytes currently buffered (streaming memory-cap accounting,
    * reference core.clj:298-307 current-memory-usage).
    */
  def bufferedBytes: Int = pending.size()

  def reset(): Unit = pending = new ByteArrayOutputStream(0)

  /** Buffer snapshot/restore for externalized state (streaming mode).
    * Restore bypasses the initial-encounter heuristic: the bytes were
    * already synced at a frame boundary when snapshotted.
    */
  def buffered: Array[Byte] = pending.toByteArray
  def restore(bytes: Array[Byte]): Unit = {
    pending = new ByteArrayOutputStream(bytes.length)
    pending.write(bytes, 0, bytes.length)
  }

  private def int4(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** Pushes one segment's payload; returns every completed frame body
    * (without the 4-byte prefix).
    */
  def push(data: Array[Byte]): Vector[Array[Byte]] = {
    if (pending.size() == 0) {
      // Initial encounter for this stream run: gate on the heuristic.
      if (data.length < 4 || !validLength(int4(data, 0))) return Vector.empty
    }
    pending.write(data, 0, data.length)
    extract()
  }

  private def extract(): Vector[Array[Byte]] = {
    val bytes = pending.toByteArray
    val out = Vector.newBuilder[Array[Byte]]
    var pos = 0
    var continue = true
    while (continue) {
      val rem = bytes.length - pos
      if (rem == 0) { reset(); continue = false }
      else if (rem < 4) { stash(bytes, pos); continue = false }
      else {
        val size = int4(bytes, pos)
        if (!validLength(size)) { reset(); continue = false } // desync
        else if (rem - 4 >= size) {
          out += java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + size)
          pos += 4 + size
        } else { stash(bytes, pos); continue = false } // wait for more
      }
    }
    out.result()
  }

  private def stash(bytes: Array[Byte], pos: Int): Unit = {
    pending = new ByteArrayOutputStream(bytes.length - pos)
    pending.write(bytes, pos, bytes.length - pos)
  }
}

object FrameAssembler {
  /** Reference's sanity bound on a message length (core.clj:100). */
  final val MaxFrameBytes: Int = 256 * 1024 * 1024
}
