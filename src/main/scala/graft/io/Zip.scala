package graft.io

import java.io.InputStream
import java.nio.file.{Files, Path, StandardCopyOption}
import java.util.zip.ZipInputStream
import scala.collection.mutable.ListBuffer

/** Zip spool (reference O5, box_ingest.py:135-147: extractall to
  * /tmp/unzipped/<table> then os.walk every extracted file, recursing).
  *
  * Zip is not a splittable Hadoop codec and a zip-of-many-files has no
  * record structure, so like the reference this stays a driver-side spool:
  * extract to a temp dir, return every regular file (recursively), and let
  * format dispatch read each. Zip-slip (entry names with ../) is rejected.
  */
object Zip {
  def extractAll(in: InputStream, destDir: Path): Seq[Path] = {
    Files.createDirectories(destDir)
    val out = ListBuffer.empty[Path]
    val z = new ZipInputStream(in)
    try {
      var e = z.getNextEntry
      while (e != null) {
        val target = destDir.resolve(e.getName).normalize()
        if (!target.startsWith(destDir))
          throw new SecurityException(s"zip entry escapes dest dir: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          Files.copy(z, target, StandardCopyOption.REPLACE_EXISTING)
          out += target
        }
        z.closeEntry()
        e = z.getNextEntry
      }
    } finally z.close()
    out.toSeq
  }
}
