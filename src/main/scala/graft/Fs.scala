package graft

/** Tiny shared filesystem helpers. */
object Fs {
  /** Recursive delete (checkpoint / temp / state cleanup). */
  def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete()
  }
}
