package graft

import java.io.File
import java.util.concurrent.ConcurrentHashMap

/** Scratch-path registry: every temp dir a query materializes (parquet/
  * json roundtrips, stream staging, the bucketed-table warehouse) is
  * registered here and recursively deleted at JVM exit — per-run
  * isolation (paths carry the application/process id) without
  * unbounded /tmp accumulation across runs.
  */
object Scratch {
  private val registered = new ConcurrentHashMap[String, java.lang.Boolean]()

  sys.addShutdownHook {
    registered.keySet().forEach(p => delete(new File(p)))
  }

  /** Register `path` for recursive deletion at JVM exit; returns it. */
  def register(path: String): String = {
    registered.putIfAbsent(path, java.lang.Boolean.TRUE)
    path
  }

  /** Recursive best-effort delete. */
  def delete(f: File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(delete)
    }
    f.delete()
    ()
  }
}
