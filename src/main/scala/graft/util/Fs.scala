package graft.util

import java.nio.file.{Files, Path}

/** Local-filesystem helpers for test/bench fixture staging. */
private[graft] object Fs {

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
}
