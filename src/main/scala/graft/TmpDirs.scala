package graft

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Temp directories for sink/roundtrip queries, deleted on JVM exit.
  * Without the hook every Bench/Verify iteration leaks a full dataset
  * copy into /tmp (sink rows write the whole table per call).
  */
object TmpDirs {
  def create(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => delete(dir)))
    dir.toString
  }

  private def delete(p: Path): Unit =
    try {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { val _ = f.toFile.delete() })
    } catch { case _: Throwable => () }
}
