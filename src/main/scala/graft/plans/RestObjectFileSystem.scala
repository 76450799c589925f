package graft.plans

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream,
  FSInputStream, FileStatus, FileSystem, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A read-only Hadoop `FileSystem` over the loopback HTTP object store
  * ([[RestCatalogServer]]'s `/v1/files` routes) — the consumer-side S3
  * half of the reference's REST-catalog configuration
  * (`/root/reference/src/main.rs:278-299` wires the reading engine to
  * the object store with S3 properties; here the engine is Spark and
  * the store speaks RFC-7233 over loopback).
  *
  * This is deliberately NOT a staging copy: registering the scheme
  * (`fs.graftrest.impl`) makes Spark's own parquet machinery — footer
  * reads, column-chunk reads, `_metadata` provenance — run against
  * `graftrest://host:port/<rel-path>` URIs, so every byte the scan
  * touches arrives as an HTTP whole-object or ranged GET, exactly the
  * access pattern a parquet reader performs against S3 (8-byte tail,
  * then the footer slice, then one ranged GET per column chunk). The
  * server's request log lets RestCatalogSpec assert the scan really
  * issued ranged reads.
  *
  * URI shape: `graftrest://<host:port>/<path-under-store-root>`; the
  * authority IS the store endpoint, so one Spark session can read
  * from several stores at once (Hadoop caches one FileSystem instance
  * per scheme+authority).
  *
  * Scale notes: object size is probed with a 1-byte ranged GET (the
  * store serves `Content-Range: bytes 0-0/SIZE`; S3 clients use HEAD —
  * same single round trip). Each positional read maps to ONE ranged
  * GET of exactly the requested span — no read-ahead buffering layer
  * that would re-fetch on the parquet reader's seeks. Mutations throw:
  * writers commit through the catalog + direct storage path, never
  * through the scan-side view.
  */
final class RestObjectFileSystem extends FileSystem {
  private var fsUri: URI = _
  private var store: String = _ // http://host:port/v1

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    require(name.getAuthority != null,
      s"graftrest URI needs host:port authority, got $name")
    fsUri = URI.create(s"${RestObjectFileSystem.Scheme}://${name.getAuthority}")
    store = s"http://${name.getAuthority}/v1"
  }

  override def getScheme: String = RestObjectFileSystem.Scheme
  override def getUri: URI = fsUri

  private def rel(f: Path): String =
    f.toUri.getPath.stripPrefix("/")

  override def getFileStatus(f: Path): FileStatus =
    new FileStatus(RestObjectFileSystem.sizeOf(store, rel(f)), false, 1,
      RestObjectFileSystem.BlockSize, 0L, makeQualified(f))

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val r = rel(f)
    new FSDataInputStream(new RestObjectInputStream(store, r,
      RestObjectFileSystem.sizeOf(store, r)))
  }

  /** Leaf-file listing: the scan hands exact object paths (from the
    * manifest), so listing a "directory" never happens on the read
    * path; a file path lists as itself (what InMemoryFileIndex
    * expects for explicitly-passed leaf files).
    */
  override def listStatus(f: Path): Array[FileStatus] =
    Array(getFileStatus(f))

  private def readOnly: Nothing = throw new UnsupportedOperationException(
    "graftrest:// is the read-side object-store view; writes go through " +
      "the catalog commit protocol")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = readOnly
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = readOnly
  override def rename(src: Path, dst: Path): Boolean = readOnly
  override def delete(f: Path, recursive: Boolean): Boolean = readOnly
  override def mkdirs(f: Path, permission: FsPermission): Boolean = readOnly

  private var wd = new Path("/")
  override def setWorkingDirectory(d: Path): Unit = wd = d
  override def getWorkingDirectory: Path = wd
}

object RestObjectFileSystem {
  val Scheme = "graftrest"
  val BlockSize: Long = 128L << 20

  /** One shared client: HttpClient pools loopback connections across
    * all executor-thread streams (javadoc-guaranteed thread-safe).
    */
  private[plans] lazy val http: HttpClient = HttpClient.newHttpClient()

  /** Register the scheme in the session's Hadoop configuration so
    * `graftrest://` paths resolve to this class. Idempotent.
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sparkContext.hadoopConfiguration.set(
      s"fs.$Scheme.impl", classOf[RestObjectFileSystem].getName)

  /** Object size via a 1-byte ranged probe: both the 206 (non-empty)
    * and 416 (empty object) answers carry `Content-Range: ... /SIZE`.
    * S3's HEAD is the same one-round-trip metadata probe.
    */
  private[plans] def sizeOf(store: String, rel: String): Long = {
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"$store/files/$rel"))
        .header("Range", "bytes=0-0").GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() == 404)
      throw new java.io.FileNotFoundException(s"$store/files/$rel")
    require(resp.statusCode() == 206 || resp.statusCode() == 416,
      s"size probe of $rel failed: HTTP ${resp.statusCode()}")
    resp.headers().firstValue("Content-Range")
      .orElseThrow(() => new IllegalStateException(
        s"no Content-Range sizing $rel"))
      .split('/').last.toLong
  }

  private[plans] def fetchRange(store: String, rel: String, lo: Long,
      hi: Long): Array[Byte] = {
    val resp = http.send(
      HttpRequest.newBuilder(URI.create(s"$store/files/$rel"))
        .header("Range", s"bytes=$lo-$hi").GET().build(),
      HttpResponse.BodyHandlers.ofByteArray())
    require(resp.statusCode() == 206,
      s"ranged GET $rel [$lo,$hi] failed: HTTP ${resp.statusCode()}")
    resp.body()
  }
}

/** Seekable stream over one object: a seek is free (position state
  * only); each read issues ONE ranged GET for exactly the requested
  * span. FSInputStream's default positioned-read then gives parquet's
  * readFully one HTTP round trip per column chunk.
  */
private final class RestObjectInputStream(store: String, rel: String,
    size: Long) extends FSInputStream {
  private var pos = 0L

  override def seek(p: Long): Unit = {
    if (p < 0 || p > size)
      throw new java.io.EOFException(s"seek($p) outside $rel size $size")
    pos = p
  }
  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int = {
    val b = new Array[Byte](1)
    if (read(b, 0, 1) <= 0) -1 else b(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    if (pos >= size) return -1
    val hi = math.min(size - 1, pos + len - 1)
    val got = RestObjectFileSystem.fetchRange(store, rel, pos, hi)
    System.arraycopy(got, 0, b, off, got.length)
    pos += got.length
    got.length
  }
}

/** Long-lived loopback store servers, one per catalog root, started
  * from a DAEMON thread (the JDK HttpServer's dispatcher inherits the
  * creating thread's daemon flag, and [[RestCatalogServer]]'s worker
  * pool is daemon too) — so a server that must outlive a LAZY scan
  * (the DataFrame a query returns is consumed by the harness later)
  * can simply never be closed without pinning the JVM open at exit.
  */
object RestStore {
  private val servers =
    scala.collection.concurrent.TrieMap.empty[String, RestCatalogServer]

  def serverFor(root: String): RestCatalogServer =
    servers.getOrElseUpdate(root, {
      val ref = new java.util.concurrent.atomic.AtomicReference[RestCatalogServer]()
      val t = new Thread(() => ref.set(new RestCatalogServer(root)))
      t.setDaemon(true)
      t.start()
      t.join()
      ref.get()
    })
}
