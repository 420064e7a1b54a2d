package graft

import java.nio.file.{Files, Path}

/** Small filesystem helpers shared by the CLI and the test-fixture
  * machinery — one recursive-delete implementation instead of per-site
  * copies (a fix to one copy was not reaching the others).
  */
private[graft] object Fs {

  /** Best-effort recursive delete: deepest-first walk, each entry via
    * `deleteIfExists` (a concurrent deletion is not an error), NonFatal
    * failures swallowed — callers use this for temp/staging state whose
    * leftover presence is tolerable but whose cleanup must never take
    * the run down. Fatal throwables (InterruptedException, OOM)
    * propagate: a Ctrl-C-initiated shutdown must not have its interrupt
    * eaten by a cleanup helper (round-9 review).
    */
  def deleteTree(p: Path): Unit =
    try {
      val walk = Files.walk(p)
      try {
        import scala.jdk.CollectionConverters._
        walk.iterator().asScala.toSeq.sortBy(-_.getNameCount)
          .foreach(Files.deleteIfExists(_))
      } finally walk.close()
    } catch { case scala.util.control.NonFatal(_) => () }
}
