package graft.tables

/** Small filesystem helpers shared by the stores and the bench. */
object FsUtil {
  /** Best-effort recursive delete (no symlink traversal surprises on the
    * store layouts we write: plain dirs + files). */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete(): Unit
  }
}
