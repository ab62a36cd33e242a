package graft.core

import java.nio.file.{Files, Path}

/** Temp-dir hygiene for gate/bench queries that exercise real sinks
  * (io01–io05, st01–st06): every scratch dir is registered for
  * recursive deletion at JVM exit, so repeated Verify/Bench runs stop
  * accumulating disk, and recursive deletes close their Files.walk
  * stream (the JDK documents walk() as must-close; a leaked stream
  * holds directory handles for the rest of the run).
  */
object TempDirs {

  /** Create a temp dir that is recursively deleted at JVM exit. */
  def scratch(prefix: String): Path = {
    val dir = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir
  }

  /** Recursive delete with the walk stream properly closed. Quiet on
    * already-missing paths (shutdown hooks may race an explicit clean).
    */
  def deleteRecursively(dir: Path): Unit = {
    if (!Files.exists(dir)) return
    val stream = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    } finally stream.close()
  }
}
