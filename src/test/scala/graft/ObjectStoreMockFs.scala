package graft

import java.io.{ByteArrayInputStream, FileNotFoundException, IOException,
  InputStream, OutputStream}
import java.net.URI
import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream,
  FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-scope Hadoop FileSystem with OBJECT-STORE semantics — the s3a://
  * deploy-shape stand-in for a sandbox with no network and no hadoop-aws
  * jar (reference deploy: docker/spark/spark-defaults.conf:1-6 writes to
  * MinIO over S3A).
  *
  * Deliberately mimics what makes S3-family stores different from
  * file:/, so a pipeline that silently relies on POSIX behavior fails
  * here the way it would fail on S3A:
  *
  *  - FLAT KEY SPACE: "directories" exist only as key prefixes (plus
  *    explicit markers from mkdirs, like S3A's dir markers). No inodes.
  *  - PUT-ON-CLOSE: created files are INVISIBLE until the stream closes
  *    (an S3 PUT is all-or-nothing; there is no partially-written file).
  *  - NON-ATOMIC RENAME: rename is a per-key copy+delete (S3A's O(n)
  *    emulation) — a crash mid-rename leaves both halves. The per-key
  *    copy counter lets specs assert the committer really exercised this
  *    path.
  *
  * State lives in the companion (one global store) because Hadoop caches
  * FileSystem instances per (scheme, authority, ugi) and Spark
  * re-instantiates them on executors; a shared map keeps every instance
  * consistent in local mode. `clear()` between tests.
  */
class ObjectStoreMockFs extends FileSystem {

  import ObjectStoreMockFs._

  private var uri: URI = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri = URI.create(s"$SCHEME://${Option(name.getAuthority).getOrElse("")}")
    workDir = makeQualified(new Path("/"))
  }

  override def getScheme: String = SCHEME
  override def getUri: URI = uri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = workDir = dir
  // parquet asks for a block size when planning splits
  override def getDefaultBlockSize(f: Path): Long = 32L * 1024 * 1024

  /** bucket-qualified flat key, no trailing slash ("" = bucket root). */
  private def key(f: Path): String = {
    val p = makeQualified(f).toUri
    val raw = Option(p.getAuthority).getOrElse("") + p.getPath
    if (raw.endsWith("/") && raw.length > 1) raw.dropRight(1) else raw
  }

  private def childrenOf(k: String): Iterator[String] = {
    val prefix = k + "/"
    (files.keysIterator ++ dirs.keysIterator)
      .filter(x => x.startsWith(prefix) && x.length > prefix.length)
      .map(x => x.substring(prefix.length).takeWhile(_ != '/'))
      .distinct
  }

  private def isDir(k: String): Boolean =
    k.isEmpty || k.endsWith("/") || dirs.contains(k) || childrenOf(k).nonEmpty

  private def qualify(k: String): Path = {
    val auth = Option(uri.getAuthority).getOrElse("")
    val rel = if (k.startsWith(auth)) k.substring(auth.length) else k
    new Path(s"$SCHEME://$auth${if (rel.isEmpty) "/" else rel}")
  }

  private def status(k: String): FileStatus =
    files.get(k) match {
      case Some(bytes) =>
        new FileStatus(bytes.length.toLong, false, 1,
          getDefaultBlockSize(null), 0L, qualify(k))
      case None if isDir(k) =>
        new FileStatus(0L, true, 1, 0L, 0L, qualify(k))
      case None => throw new FileNotFoundException(s"no such object: $k")
    }

  override def getFileStatus(f: Path): FileStatus = status(key(f))

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    if (files.contains(k)) Array(status(k))
    else if (!isDir(k)) throw new FileNotFoundException(s"no such object: $k")
    else childrenOf(k).map(c => status(s"$k/$c")).toArray
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val k = key(f)
    if (files.contains(k)) throw new IOException(s"file exists at $k")
    dirs.put(k, ())                              // S3A-style dir marker
    true
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    if (isDir(k) && !files.contains(k))
      throw new IOException(s"directory exists at $k")
    if (!overwrite && files.contains(k))
      throw new IOException(s"object exists: $k")
    // buffer locally; the object becomes visible atomically on close —
    // the S3 PUT contract (no partially-visible writes)
    val buf = new java.io.ByteArrayOutputStream()
    val commitOnClose: OutputStream = new OutputStream {
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit = files.put(k, buf.toByteArray)
    }
    new FSDataOutputStream(commitOnClose, null)
  }

  override def append(f: Path, bufferSize: Int,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("object stores cannot append")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = files.getOrElse(key(f),
      throw new FileNotFoundException(s"no such object: ${key(f)}"))
    new FSDataInputStream(new SeekableBytes(bytes))
  }

  /** Per-key copy+delete, like S3A: O(keys), never atomic. */
  override def rename(src: Path, dst: Path): Boolean = {
    val (ks, kdRaw) = (key(src), key(dst))
    if (ks == kdRaw) return true
    // renaming INTO an existing directory targets dir/childName (FS contract)
    val kd =
      if (isDir(kdRaw) && !files.contains(kdRaw))
        s"$kdRaw/${ks.substring(ks.lastIndexOf('/') + 1)}"
      else kdRaw
    files.get(ks) match {
      case Some(bytes) =>
        files.put(kd, bytes); files.remove(ks); copies.incrementAndGet()
        true
      case None if isDir(ks) =>
        val prefix = ks + "/"
        val fileKeys = files.keysIterator.filter(_.startsWith(prefix)).toList
        val dirKeys = dirs.keysIterator.filter(_.startsWith(prefix)).toList
        fileKeys.foreach { fk =>
          files.put(kd + fk.substring(ks.length), files(fk))
          files.remove(fk)
          copies.incrementAndGet()
        }
        dirKeys.foreach { dk =>
          dirs.put(kd + dk.substring(ks.length), ()); dirs.remove(dk)
        }
        dirs.remove(ks); dirs.put(kd, ())
        true
      case None => false
    }
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    if (files.remove(k).isDefined) return true
    if (!isDir(k)) return false
    val prefix = k + "/"
    val hadChildren = childrenOf(k).nonEmpty
    if (hadChildren && !recursive)
      throw new IOException(s"directory not empty: $k")
    files.keysIterator.filter(_.startsWith(prefix)).toList.foreach(files.remove)
    dirs.keysIterator.filter(_.startsWith(prefix)).toList.foreach(dirs.remove)
    dirs.remove(k)
    true
  }
}

object ObjectStoreMockFs {
  val SCHEME = "s3mock"

  private val files = TrieMap.empty[String, Array[Byte]]
  private val dirs = TrieMap.empty[String, Unit]
  private val copies = new AtomicLong(0)

  /** Number of per-key copy operations rename has performed — proof that
    * a committer path really went through non-atomic copy+delete. */
  def renameCopies: Long = copies.get()

  def objectCount: Long = files.size.toLong
  def keys: Seq[String] = files.keysIterator.toSeq.sorted

  def clear(): Unit = { files.clear(); dirs.clear(); copies.set(0) }

  /** Register the scheme on a live Hadoop configuration. */
  def register(conf: Configuration): Unit = {
    conf.set(s"fs.$SCHEME.impl", classOf[ObjectStoreMockFs].getName)
    conf.set(s"fs.$SCHEME.impl.disable.cache", "false")
  }

  /** Seekable in-memory stream — parquet footers read by position. */
  private final class SeekableBytes(bytes: Array[Byte]) extends InputStream
      with Seekable with PositionedReadable {
    private val in = new ByteArrayInputStream(bytes)
    private var pos = 0L
    override def read(): Int = { val r = in.read(); if (r >= 0) pos += 1; r }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val r = in.read(b, off, len); if (r > 0) pos += r; r
    }
    override def seek(p: Long): Unit = {
      if (p < 0 || p > bytes.length) throw new IOException(s"bad seek $p")
      in.reset(); in.skip(p); pos = p
    }
    override def getPos: Long = pos
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
                      length: Int): Int = {
      if (position >= bytes.length) return -1
      val n = math.min(length, bytes.length - position.toInt)
      System.arraycopy(bytes, position.toInt, buffer, offset, n)
      n
    }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
                           length: Int): Unit = {
      if (read(position, buffer, offset, length) < length)
        throw new IOException("EOF before readFully satisfied")
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
