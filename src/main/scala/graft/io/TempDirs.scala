package graft.io

import java.nio.file.{Files, Path}

/** Scratch directories that clean up after the JVM: repeated gate/bench
  * runs write per-query fixtures (duplicated corpora, stream sources,
  * checkpoints) — without a deletion hook those accumulate on local
  * disk across runs. One shutdown hook walks every registered root
  * deepest-first. */
object TempDirs {

  private val roots = new java.util.concurrent.ConcurrentLinkedQueue[Path]()

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      roots.forEach { root =>
        try {
          if (Files.exists(root))
            Files.walk(root).sorted(java.util.Comparator.reverseOrder())
              .forEach(p => try Files.deleteIfExists(p) catch { case _: Exception => () })
        } catch { case _: Exception => () }
      }
    }, "graft-tempdir-cleanup"))
  }

  /** Create a fresh temp directory deleted recursively at JVM exit. */
  def scratch(prefix: String): String = {
    hook
    val p = Files.createTempDirectory(prefix)
    roots.add(p)
    p.toString
  }
}
