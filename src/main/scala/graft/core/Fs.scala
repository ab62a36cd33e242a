package graft.core

import java.nio.file.{Files, Path}

/** Close-safe local-FS listing. `Files.list` returns a Stream holding
  * an open directory file descriptor; draining it without `close()`
  * leaks one fd per call for the JVM's lifetime (a long Verify/Bench
  * run makes hundreds of such calls). Every repo caller routes through
  * here so the closing discipline lives in one place.
  */
object Fs {

  /** List a directory's entries, eagerly, with the stream closed. */
  def listDir(dir: Path): List[Path] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toList
    } finally s.close()
  }
}
