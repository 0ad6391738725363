package graft

/** Process-scoped temp directories: every dir created here is recursively
  * deleted on JVM exit. The bench mains and specs create multi-GB scratch
  * dirs (an engine work dir holds the full checkpoint/backlog/results
  * tables); without exit cleanup, repeated runs fill the disk and later
  * suites die with opaque TASK_WRITE_FAILED errors. Cleanup happens at
  * exit — not at close — so in-JVM resume tests (which reopen a work dir
  * across engine instances) keep working.
  */
object TmpDirs {

  private val registered =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  // one hook per JVM, installed on first use
  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(p => deleteRecursively(p))
    }))

  /** Like `Files.createTempDirectory`, plus delete-on-exit registration. */
  def create(prefix: String): java.nio.file.Path = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    registered.add(p)
    p
  }

  private def deleteRecursively(root: java.nio.file.Path): Unit = {
    import java.nio.file.Files
    try {
      if (Files.exists(root)) {
        val walk = Files.walk(root)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { try Files.delete(p) catch { case _: Exception => () } })
        finally walk.close()
      }
    } catch { case _: Exception => () }
  }
}
