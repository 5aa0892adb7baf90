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

  /** Like [[create]] but on the tmpfs mount when one is available:
    * streaming checkpoint/commit logs and state-store delta files are
    * fsynced per micro-batch per partition, and on a disk-backed
    * java.io.tmpdir that metadata I/O dominates small-batch streaming
    * pipelines. Falls back to [[create]] where /dev/shm is absent. A
    * production job points its checkpoints at durable shared storage —
    * this is harness plumbing, not a recommendation. */
  def createShm(prefix: String): String = {
    val shm = java.nio.file.Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) {
      val dir = Files.createTempDirectory(shm, prefix)
      Runtime.getRuntime.addShutdownHook(new Thread(() => delete(dir)))
      dir.toString
    } else create(prefix)
  }

  private def delete(p: Path): Unit =
    try {
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => { val _ = f.toFile.delete() })
    } catch { case _: Throwable => () }
}
