package graft.sources

import java.io.File
import scala.collection.mutable

/** Write-once-per-JVM scratch datasets for catalog queries that need a
  * materialized side artifact (an Avro archive, a z-ordered layout).
  *
  * A benchmark harness invokes each catalog query function several times
  * (warmup + N timed passes). Entries that rewrote their artifact on every
  * invocation multiplied a full dataset write by every pass, ballooned wall
  * time, and left pid-keyed tmp dirs behind on crash. `materialize` makes
  * the write idempotent: the first call for a given (kind, dataset) key
  * runs the writer, subsequent calls reuse the finished directory, and a
  * single JVM shutdown hook removes everything this process created.
  *
  * Keyed by the ABSOLUTE dataset path + pid so two concurrent JVMs (or two
  * datasets that share a basename) never write/delete each other's artifact
  * mid-read. A `_GRAFT_DONE` marker distinguishes a finished write from a
  * half-written directory left by a failed attempt: only marker-complete
  * dirs are reused, anything else is wiped and rewritten.
  */
object Scratch {
  private val done = mutable.Set[String]()
  private lazy val hookInstalled: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      done.synchronized { done.foreach(p => delete(new File(p))) }))
  }

  private def delete(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete(): Unit
  }

  private def keyOf(datasetDir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(new File(datasetDir).getAbsolutePath.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)

  /** Path for artifact `kind` derived from `datasetDir`; runs `write(path)`
    * at most once per JVM (per key) and returns the finished path.
    */
  def materialize(kind: String, datasetDir: String)(write: String => Unit): String = {
    val dir = new File(sys.props("java.io.tmpdir"),
      s"graft_$kind/${keyOf(datasetDir)}-${ProcessHandle.current().pid()}")
    val path = dir.toString
    done.synchronized {
      hookInstalled
      if (!done.contains(path)) {
        val marker = new File(dir, "_GRAFT_DONE")
        if (!marker.isFile) { // stale half-write (prior failed attempt)
          delete(dir)
          write(path)
          dir.mkdirs()
          marker.createNewFile(): Unit
        }
        done += path
      }
    }
    path
  }

  /** A fresh per-invocation temp directory, deleted with the rest of the
    * scratch space at JVM exit (one shared shutdown hook — per-invocation
    * hooks would accumulate). For catalog entries that need a PRIVATE
    * mutable workspace per bench pass (e.g. an index the query appends
    * to), where `materialize`'s write-once contract doesn't fit.
    */
  def ephemeral(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_$prefix")
    val path = dir.toString
    done.synchronized { hookInstalled; done += path }
    path
  }
}
