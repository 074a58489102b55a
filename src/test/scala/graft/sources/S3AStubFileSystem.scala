package graft.sources

import java.io.File
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}

/** Offline object-store stand-in: a Hadoop `FileSystem` bound to the
  * `s3a://` scheme (`fs.s3a.impl` — free to claim here because the
  * container ships no hadoop-aws) that serves `s3a://<bucket>/<key>` from
  * `<graft.s3astub.root>/<bucket>/<key>` on local disk. Lets
  * `PolygonClientSpec` drive the client's S3 branch — s3a URI
  * construction, Hadoop-FS listing, gz CSV scan — end-to-end with zero
  * network, mirroring reference `client.rs:48-68,152-202`.
  *
  * Path fidelity: statuses produced by the local delegate carry `file:`
  * URIs, which would leak the stub into listings (and trip
  * `FileSystem.checkPath` in callers that re-resolve them), so
  * [[getFileStatus]]/[[listStatus]] rewrite every returned path back into
  * the `s3a://bucket/...` namespace. */
class S3AStubFileSystem extends RawLocalFileSystem {

  private var stubUri: URI = _
  private var root: String = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    stubUri = URI.create(s"${name.getScheme}://${name.getAuthority}")
    root = conf.get("graft.s3astub.root")
    require(root != null, "set graft.s3astub.root to the local store dir")
    super.initialize(name, conf)
  }

  // the RawLocalFileSystem CONSTRUCTOR already calls makeQualified →
  // getUri, before initialize has run — fall back to a bare scheme URI
  override def getUri: URI =
    if (stubUri == null) URI.create("s3a:///") else stubUri

  /** `s3a://bucket/key` → `<root>/bucket/key` (the authority is part of
    * the local layout so multiple buckets coexist under one root). */
  override def pathToFile(path: Path): File = {
    val q = makeQualified(path)
    new File(root + "/" + stubUri.getAuthority + q.toUri.getPath)
  }

  private def toStubPath(p: Path): Path = {
    val prefix = new File(root + "/" + stubUri.getAuthority).getAbsolutePath
    val rel = p.toUri.getPath.stripPrefix(prefix)
    new Path(stubUri.toString + (if (rel.isEmpty) "/" else rel))
  }

  /** Eager copy — the delegate's status subclass lazily re-derives
    * permissions from its (local) path, which the s3a rewrite would break;
    * a plain FileStatus carries everything by value. */
  private def rewrap(s: FileStatus): FileStatus =
    // only VALUE fields: owner/group/permission on the delegate's status
    // are lazy loads through its (already-requalified) path and would
    // recurse into `new File(s3a URI)`
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime, null, null, null,
      toStubPath(s.getPath))

  override def getFileStatus(f: Path): FileStatus =
    rewrap(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(rewrap)
}
