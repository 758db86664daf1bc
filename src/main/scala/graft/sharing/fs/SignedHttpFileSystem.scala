package graft.sharing.fs

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Read-only Hadoop FileSystem for Delta Sharing pre-signed URLs, scheme
  * `graftshare`.
  *
  * Pre-signed URLs carry auth in the query string, which Hadoop's stock
  * filesystems can't address — the reference hits the same wall and
  * smuggles URLs through `PartitionedFile.extensions`
  * (reference src/datasource/scan.rs:180-184, reader.rs:96-108). Here the
  * whole signed URL is encoded INTO the path:
  *
  *   graftshare:///u/<base64url(signed-url)>/<size>/<filename>.parquet
  *
  * so any Spark file source can scan it: `getFileStatus` answers from the
  * path alone (zero HTTP), and `open` streams with HTTP Range requests —
  * the same footer-then-column-chunks access pattern as the reference's
  * `AsyncFileReader` (reader.rs:25-49), but feeding Spark's vectorized
  * parquet reader. Executors resolve paths independently: nothing is
  * driver-resident, so a 1000-executor scan needs no shared state.
  */
final class SignedHttpFileSystem extends FileSystem {

  private var uri: URI = URI.create("graftshare:///")

  override def initialize(name: URI, conf: org.apache.hadoop.conf.Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    uri = URI.create("graftshare:///")
  }

  override def getScheme: String = "graftshare"
  override def getUri: URI = uri

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val (url, size) = SignedHttpFileSystem.decode(f)
    new FSDataInputStream(new SignedHttpInputStream(url, size,
      math.max(bufferSize, 4 * 1024 * 1024),
      SignedHttpFileSystem.decodeRefresh(f)))
  }

  override def getFileStatus(f: Path): FileStatus =
    if (SignedHttpFileSystem.isFilePath(f)) {
      val (_, size) = SignedHttpFileSystem.decode(f)
      new FileStatus(size, false, 1, 128L * 1024 * 1024,
        System.currentTimeMillis(), f)
    } else {
      // Synthetic table/partition directories (basePath checks during
      // partition discovery land here) — everything above a leaf file
      // "exists" as a directory.
      new FileStatus(0, true, 1, 0, System.currentTimeMillis(), f)
    }

  /** Leaf file paths list as themselves (they're self-contained). A
    * synthetic directory has no enumerable children — the file set lives
    * in the sharing server's listing, not in the path space — so listing
    * one throws instead of echoing the directory as its own child, which
    * would infinite-loop any recursive lister. Scans never hit this:
    * Spark receives explicit leaf paths from the connector. */
  override def listStatus(f: Path): Array[FileStatus] =
    if (SignedHttpFileSystem.isFilePath(f)) Array(getFileStatus(f))
    else throw new UnsupportedOperationException(
      s"graftshare directories are synthetic and cannot be listed: $f " +
        "(file paths are self-contained; obtain them from the sharing listing)")

  override def setWorkingDirectory(d: Path): Unit = ()
  override def getWorkingDirectory: Path = new Path("graftshare:///")
  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    throw new UnsupportedOperationException("graftshare is read-only")
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("graftshare is read-only")
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("graftshare is read-only")
  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException("graftshare is read-only")
  override def delete(f: Path, recursive: Boolean): Boolean =
    throw new UnsupportedOperationException("graftshare is read-only")
}

object SignedHttpFileSystem {
  private val enc = java.util.Base64.getUrlEncoder.withoutPadding()
  private val decoder = java.util.Base64.getUrlDecoder

  /** Install the scheme in a Hadoop configuration (idempotent). */
  def register(conf: org.apache.hadoop.conf.Configuration): Unit = {
    conf.set("fs.graftshare.impl", classOf[SignedHttpFileSystem].getName)
    // one FS instance per scheme is fine — paths are self-contained
    conf.setBooleanIfUnset("fs.graftshare.impl.disable.cache", false)
  }

  /** Signed URL + size → self-contained graftshare path:
    *
    *   graftshare:///t/<tableUid>[/k=v…]/f<base64url(url)>.<size>.parquet
    *
    * The URL+size live in the FILENAME, so every file of a table shares
    * the common base `graftshare:///t/<tableUid>` — pass that as the
    * `basePath` option and Spark's stock hive-style partition discovery
    * turns the `k=v` segments into typed, Catalyst-prunable partition
    * columns: partition-value materialization (reference scan.rs:160-229)
    * with zero custom reader code. Empty value ⇒ the hive
    * default-partition token ⇒ NULL. The `f` filename prefix keeps a
    * leading `-`/`_` in base64 from marking the file as hidden. */
  def encode(url: String, size: Long,
      partitionValues: Seq[(String, String)] = Seq.empty,
      tableUid: String = "flat",
      refresh: Option[RefreshSpec] = None): String = {
    val b64 = enc.encodeToString(url.getBytes("UTF-8"))
    val partSegs = partitionValues.map { case (k, v) =>
      val hv = if (v.isEmpty) "__HIVE_DEFAULT_PARTITION__" else hiveEscape(v)
      s"/$k=$hv"
    }.mkString
    val refreshSeg = refresh.map(r =>
      "." + enc.encodeToString(r.serialized.getBytes("UTF-8"))).getOrElse("")
    s"graftshare:///t/$tableUid$partSegs/f$b64$refreshSeg.$size.parquet"
  }

  /** Where to re-fetch a fresh pre-signed URL when the embedded one
    * expires mid-task (plan→execute gaps on a busy cluster routinely
    * exceed URL TTLs; the reference ignores this —
    * src/client/action.rs:196-200 is parsed but unused).
    *
    * The spec rides INSIDE the path (profile file path + table FQN +
    * file id), so any executor can refresh independently — no driver
    * state, no shared registry. The profile path must be readable on
    * executors (true for distributed filesystems / secret mounts; the
    * bearer token itself is never embedded in paths or logs).
    */
  final case class RefreshSpec(profilePath: String, share: String,
      schema: String, table: String, fileId: String,
      /** version-pinned (time travel) read: a refresh must re-list the
        * SAME snapshot, or an executor racing a table update would read
        * files from a different version than the plan. */
      version: Option[Long] = None) {
    def serialized: String =
      (Seq(profilePath, share, schema, table, fileId) ++
        version.map(_.toString)).map(
        java.net.URLEncoder.encode(_, "UTF-8")).mkString("|")
  }

  object RefreshSpec {
    def deserialize(s: String): RefreshSpec =
      s.split('|').map(java.net.URLDecoder.decode(_, "UTF-8")) match {
        case Array(p, sh, sc, t, id) => RefreshSpec(p, sh, sc, t, id)
        case Array(p, sh, sc, t, id, v) =>
          RefreshSpec(p, sh, sc, t, id, Some(v.toLong))
        case _ => throw new IllegalArgumentException(
          s"malformed refresh spec: $s")
      }
  }

  private[fs] def decodeRefresh(p: Path): Option[RefreshSpec] = {
    val core = p.getName.stripPrefix("f").stripSuffix(".parquet")
    core.split('.') match {
      case Array(_, refresh, _) =>
        Some(RefreshSpec.deserialize(
          new String(decoder.decode(refresh), "UTF-8")))
      case _ => None
    }
  }

  def basePath(tableUid: String): String = s"graftshare:///t/$tableUid"

  /** Hive-compatible path-name escaping (subset: enough for values that
    * contain separators; matches PartitioningUtils' unescape). */
  private def hiveEscape(v: String): String = v.flatMap { c =>
    if (c < ' ' || "\"#%'*/:=?\\{[]^".contains(c)) f"%%${c.toInt}%02X"
    else c.toString
  }

  /** Is this a leaf data-file path (vs a synthetic directory)? */
  def isFilePath(p: Path): Boolean = {
    val name = p.getName
    name.startsWith("f") && name.endsWith(".parquet") &&
      name.stripPrefix("f").stripSuffix(".parquet").contains('.')
  }

  /** graftshare path → (signed URL, size), both read from the filename
    * (`f<url64>[.<refresh64>].<size>.parquet`). */
  def decode(p: Path): (String, Long) = {
    val name = p.getName
    if (!name.startsWith("f") || !name.endsWith(".parquet"))
      throw new IllegalArgumentException(s"not a graftshare path: $p")
    name.stripPrefix("f").stripSuffix(".parquet").split('.') match {
      case Array(url64, size) =>
        (new String(decoder.decode(url64), "UTF-8"), size.toLong)
      case Array(url64, _, size) =>
        (new String(decoder.decode(url64), "UTF-8"), size.toLong)
      case _ => throw new IllegalArgumentException(s"not a graftshare path: $p")
    }
  }
}

/** Seekable, positioned-read HTTP stream over one signed URL. Sequential
  * reads pull `chunkSize` ranges; positioned reads (`read(pos, …)`, the
  * parquet footer/column-chunk path) issue exact-range GETs without
  * disturbing the cursor.
  *
  * If the signed URL has expired by the time a task reads it (4xx) and a
  * `RefreshSpec` is present, the stream re-queries the sharing server for
  * a fresh URL ONCE and retries — the per-task refresh story the
  * reference lacks (action.rs:196-200 parsed but unused). Fresh URLs are
  * cached per file id so a thousand tasks don't re-list a thousand times.
  */
final class SignedHttpInputStream(url: String, size: Long, chunkSize: Int,
    refresh: Option[SignedHttpFileSystem.RefreshSpec] = None)
    extends FSInputStream {

  private val http = HttpClient.newHttpClient()
  private var pos = 0L
  private var buf: Array[Byte] = Array.emptyByteArray
  private var bufStart = 0L
  private var activeUrl = refresh.flatMap(r =>
    SignedHttpInputStream.freshUrls.get(SignedHttpInputStream.cacheKey(r)))
    .getOrElse(url)

  /** Up to TWO refresh attempts per range read: the first may return a
    * CACHED fresh URL (populated by another stream's listing); if that
    * one has expired too, the second attempt passes it as the failed URL,
    * which invalidates the cache entry and forces a real re-list. */
  private def fetchRange(start: Long, end: Long,
      refreshAttempts: Int = 0): Array[Byte] = {
    val req = HttpRequest.newBuilder(URI.create(activeUrl))
      .header("Range", s"bytes=$start-$end").GET().build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() >= 400) {
      if (resp.statusCode() < 500 && refresh.isDefined && refreshAttempts < 2) {
        activeUrl = SignedHttpInputStream.refreshUrl(refresh.get, activeUrl)
        return fetchRange(start, end, refreshAttempts + 1)
      }
      throw new java.io.IOException(
        s"HTTP ${resp.statusCode()} reading range $start-$end (signed URL may have expired)")
    }
    resp.body()
  }

  override def seek(newPos: Long): Unit = {
    if (newPos < 0 || newPos > size)
      throw new java.io.EOFException(s"seek($newPos) out of range 0..$size")
    pos = newPos
  }
  override def getPos: Long = pos
  override def seekToNewSource(targetPos: Long): Boolean = false

  override def read(): Int = {
    if (pos >= size) return -1
    if (pos < bufStart || pos >= bufStart + buf.length) fill(pos)
    val b = buf((pos - bufStart).toInt) & 0xff
    pos += 1
    b
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (pos >= size) return -1
    if (pos < bufStart || pos >= bufStart + buf.length) fill(pos)
    val avail = (bufStart + buf.length - pos).toInt
    val n = math.min(len, avail)
    System.arraycopy(buf, (pos - bufStart).toInt, b, off, n)
    pos += n
    n
  }

  /** Positioned read: exact range, cursor untouched. */
  override def read(position: Long, b: Array[Byte], off: Int, len: Int): Int = {
    if (position >= size) return -1
    val end = math.min(position + len, size) - 1
    val got = fetchRange(position, end)
    System.arraycopy(got, 0, b, off, got.length)
    got.length
  }

  private def fill(at: Long): Unit = {
    val end = math.min(at + chunkSize, size) - 1
    buf = fetchRange(at, end)
    bufStart = at
  }

  override def close(): Unit = ()
}

object SignedHttpInputStream {
  /** (table key # file id) → fresh signed URL, shared across streams in
    * this JVM. Keyed per table snapshot so same-named files in different
    * shares/versions can never serve each other's URLs. */
  private[fs] val freshUrls =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** One monitor per table snapshot: concurrent expired streams of the
    * same table serialize on it, so the table is re-listed ONCE and
    * everyone else reads the batch-populated cache — without it a
    * thousand tasks racing a TTL would issue a thousand listings. */
  private val refreshLocks =
    scala.collection.concurrent.TrieMap.empty[String, Object]

  /** Number of refresh LISTING round-trips issued by this JVM (tests
    * assert the one-listing-per-expiry-wave property against it). */
  private[fs] val refreshListings =
    new java.util.concurrent.atomic.AtomicInteger(0)

  private def tableKey(r: SignedHttpFileSystem.RefreshSpec): String =
    Seq(r.profilePath, r.share, r.schema, r.table,
      r.version.map(_.toString).getOrElse("latest"))
      .map(java.net.URLEncoder.encode(_, "UTF-8")).mkString("|")

  private[fs] def cacheKey(r: SignedHttpFileSystem.RefreshSpec): String =
    s"${tableKey(r)}#${r.fileId}"

  /** Test hook: forget all cached fresh URLs (JVM-wide state). */
  private[fs] def clearCache(): Unit = { freshUrls.clear(); refreshLocks.clear() }

  /** A fresh signed URL for `spec`, given that `failedUrl` just 4xx'd.
    *
    * A table's URLs expire TOGETHER, so one `getTableData` listing
    * batch-populates the cache for EVERY file of the table — N expired
    * files cost one listing, not N (the round-5 review's thundering-herd
    * finding). An entry equal to `failedUrl` is stale from an earlier
    * refresh and is invalidated so a second expiry re-lists instead of
    * replaying it. */
  private[fs] def refreshUrl(spec: SignedHttpFileSystem.RefreshSpec,
      failedUrl: String): String = {
    val lock = refreshLocks.getOrElseUpdate(tableKey(spec), new Object)
    lock.synchronized {
      val key = cacheKey(spec)
      freshUrls.get(key) match {
        case Some(cached) if cached != failedUrl =>
          cached // another stream already re-listed this table
        case stale =>
          stale.foreach(_ => freshUrls.remove(key))
          refreshListings.incrementAndGet()
          val client = new graft.sharing.DeltaSharingClient(
            graft.sharing.Profile.fromPath(spec.profilePath))
          val (_, _, files) = client.getTableData(
            graft.sharing.TableRef(spec.share, spec.schema, spec.table),
            version = spec.version)
          // REPLACE this snapshot's key range rather than accreting:
          // files compacted/removed since the last refresh would
          // otherwise leave dead URL entries behind forever (the cache
          // lives for the executor JVM's lifetime)
          val prefix = s"${tableKey(spec)}#"
          freshUrls.keys.filter(_.startsWith(prefix)).foreach(freshUrls.remove)
          files.foreach(f => freshUrls.put(s"$prefix${f.id}", f.url))
          files.find(_.id == spec.fileId).map(_.url).getOrElse(
            throw new java.io.IOException(
              s"file ${spec.fileId} no longer listed for ${spec.table} on refresh"))
      }
    }
  }
}
