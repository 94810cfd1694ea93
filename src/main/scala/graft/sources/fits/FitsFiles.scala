package graft.sources.fits

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** File discovery with the reference's surface (FitsSourceRelation.scala:
  * 133-177): a single file, a directory (recursive, keeps only `*.fits`),
  * a glob pattern, or a comma-separated combination of those.
  */
object FitsFiles {

  def resolve(pathSpec: String, conf: Configuration): Seq[Path] = {
    val out = pathSpec.split(',').toSeq.map(_.trim).filter(_.nonEmpty)
      .flatMap(one(_, conf))
    if (out.isEmpty)
      throw new IllegalArgumentException(
        s"No FITS files found for path '$pathSpec'")
    out
  }

  private def one(spec: String, conf: Configuration): Seq[Path] = {
    val path = new Path(spec)
    val fs = path.getFileSystem(conf)
    if (fs.exists(path)) {
      val status = fs.getFileStatus(path)
      if (status.isDirectory) listFits(fs, path)
      else Seq(path)
    } else {
      // not a literal path — try as a glob
      val matched = Option(fs.globStatus(path)).getOrElse(Array.empty)
      matched.toSeq.flatMap { st =>
        if (st.isDirectory) listFits(fs, st.getPath) else Seq(st.getPath)
      }
    }
  }

  /** Bounded driver-side parallel map (used for per-file header walks —
    * one small positioned read per HDU, latency-bound on object stores).
    */
  def parMap[A, B](xs: Seq[A], threads: Int)(f: A => B): Seq[B] =
    if (xs.lengthCompare(2) < 0) xs.map(f)
    else {
      import java.util.concurrent.Executors
      import scala.concurrent._
      import scala.concurrent.duration.Duration
      val pool = Executors.newFixedThreadPool(math.min(threads, xs.length))
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      try Await.result(Future.sequence(xs.map(x => Future(f(x)))), Duration.Inf)
      finally pool.shutdown()
    }

  private def listFits(fs: FileSystem, dir: Path): Seq[Path] = {
    val it = fs.listFiles(dir, /* recursive = */ true)
    val buf = Seq.newBuilder[Path]
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.toLowerCase.endsWith(".fits"))
        buf += st.getPath
    }
    buf.result().sortBy(_.toString)
  }
}
