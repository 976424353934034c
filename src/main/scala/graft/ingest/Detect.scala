package graft.ingest

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** File-format detection: extension first, magic-byte fallback, default csv
  * (reference `dags/src/validator.py:17-34`).
  *
  * Pure function over (key, head bytes) so it unit-tests without I/O; the
  * [[Detect.forPath]] wrapper reads the first 4 bytes through the Hadoop
  * FileSystem API, which resolves local paths and `s3a://` URIs alike —
  * detection is a driver-side, metadata-scale operation (one 4-byte read per
  * file), never a data scan.
  */
object Detect {
  val Csv = "csv"
  val Json = "json"
  val Parquet = "parquet"

  /** Classify by key extension, then magic bytes (`PK` = zip container,
    * `PAR1` = parquet footer magic), else csv (`validator.py:17-34`). */
  def detectFormat(key: String, head: Array[Byte]): String = {
    val k = key.toLowerCase
    if (k.endsWith(".csv")) Csv
    else if (k.endsWith(".json") || k.endsWith(".ndjson")) Json
    else if (k.endsWith(".parquet")) Parquet
    else {
      val h = new String(head.take(4), StandardCharsets.ISO_8859_1)
      if (h.startsWith("PK") || h == "PAR1") Parquet
      else Csv
    }
  }

  /** Read up to n leading bytes of a file (local path or any Hadoop FS URI). */
  def headBytes(path: String, n: Int = 4, conf: Configuration = new Configuration()): Array[Byte] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](n)
      var off = 0
      var read = 0
      while (off < n && read >= 0) {
        read = in.read(buf, off, n - off)
        if (read > 0) off += read
      }
      buf.take(off)
    } finally in.close()
  }

  /** Detect the format of a file on disk / object store. */
  def forPath(path: String, conf: Configuration = new Configuration()): String = {
    val k = path.toLowerCase
    val needsHead =
      !(k.endsWith(".csv") || k.endsWith(".json") || k.endsWith(".ndjson") ||
        k.endsWith(".parquet"))
    detectFormat(path, if (needsHead) headBytes(path, 4, conf) else Array.emptyByteArray)
  }

  /** First non-whitespace character of a file — distinguishes a JSON array
    * (`[`) from NDJSON (`processor.py:27-33` sniffs the first line). Reads a
    * single small block, not the file. */
  def firstNonWsChar(path: String, conf: Configuration = new Configuration()): Option[Char] =
    new String(headBytes(path, 512, conf), StandardCharsets.UTF_8)
      .find(!_.isWhitespace)
}
