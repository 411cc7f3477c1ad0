package graft.sources

import java.nio.file.{Files, Path, Paths}

/** S3-shaped object storage — the twin of the reference's
  * s3_storage.py (S3Storage) run against a local directory standing in
  * for the bucket, keeping the OBJECT-STORE contract rather than the
  * filesystem one:
  *
  *  - Objects are KEYS, not paths: there are no directories and no
  *    rename anywhere on the write path (S3 has neither) — every write
  *    is a single whole-object put, every read a whole-object get.
  *  - Existence is a PREFIX LISTING, not a stat: `assertUniqueId` and
  *    `nonexistentStoragePath` twin `list_objects_v2(Prefix=...)`
  *    KeyCount (s3_storage.py:34-61) with true string-prefix
  *    semantics — prefix `raw_frames/ds1` matches `raw_frames/ds10/x`,
  *    exactly as it does against the real API (a caller who wants
  *    directory-style scoping must pass a trailing separator, same as
  *    with boto3).
  *  - The overwrite guard is a CONDITIONAL PUT: the reference lists
  *    then puts (s3_storage.py:91-104), which races between workers;
  *    the emulation's atomic create models S3's `If-None-Match: *`
  *    conditional write — the race-free way to express "create iff
  *    absent" against the real service.
  *  - The reference creates a NEW client per worker thread
  *    (s3_storage.py:115, boto3 thread-safety); here each partition's
  *    writer loop is that worker, and [[putNew]] is the per-call
  *    client work.
  *
  * The distributed transfer paths (mapPartitions upload, binaryFile
  * scan download — which on a real deployment reads `s3a://bucket/...`
  * through the same Hadoop filesystem seam) are shared via
  * [[FrameStorageApi]]. The emulation materializes key prefixes as
  * directories so Spark's sources and the nio single-file paths can
  * read the "bucket" unchanged.
  */
class S3FrameStorage(val bucket: String, val storageDir: String)
    extends FrameStorageApi {

  require(Files.isDirectory(Paths.get(bucket)),
    s"NoSuchBucket: $bucket") // boto3 raises NoSuchBucket on a missing bucket

  val idStoragePath: String = s"$bucket/$storageDir"

  /** s3_storage.py:34-45 — zero keys under the dataset PREFIX. */
  def assertUniqueId(): Unit =
    require(keyCount(storageDir) == 0,
      s"Key already exists on S3: $storageDir")

  /** s3_storage.py:47-61 — true iff no key carries this prefix. */
  def nonexistentStoragePath(storagePath: String): Boolean =
    keyCount(storagePath) == 0

  /** `list_objects_v2(Prefix=prefix)['KeyCount']` against the
    * directory-as-bucket: every regular file under the bucket is a
    * key (its bucket-relative path with `/` separators), counted by
    * string prefix. The real service pages server-side; the emulation
    * short-circuits at the first match, so the check stays O(1)-ish
    * on the hot existence paths.
    */
  private def keyCount(prefix: String): Int = {
    val root = Paths.get(bucket)
    if (!Files.isDirectory(root)) return 0
    val stream = Files.walk(root)
    try {
      val found = stream
        .filter(p => Files.isRegularFile(p))
        .map[String](p => root.relativize(p).toString.replace('\\', '/'))
        .anyMatch(k => k.startsWith(prefix))
      if (found) 1 else 0
    } finally stream.close()
  }

  /** No directories to create in a bucket; the emulation materializes
    * the dataset prefix so the binaryFile read side has a root to
    * scan even before the first put lands.
    */
  protected def prepareUpload(): Unit = {
    Files.createDirectories(Paths.get(idStoragePath)); ()
  }

  /** One conditional put (If-None-Match: * under the real API): the
    * key's prefix materializes as parent directories first — an
    * emulation detail, not a rename (the object appears atomically or
    * not at all).
    */
  protected def putNew(fileName: String, bytes: Array[Byte]): Boolean = {
    val p: Path = Paths.get(idStoragePath, fileName)
    Files.createDirectories(p.getParent)
    try {
      Files.write(p, bytes, java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }
  }

  /** An executor that can't see the bucket root is misconfigured
    * (missing mount in the emulation; missing credentials/endpoint on
    * a real deployment) — fail the task loudly.
    */
  protected def checkVisible(): Unit =
    if (!Files.isDirectory(Paths.get(bucket)))
      throw new IllegalStateException(
        s"bucket $bucket not visible on this executor — the " +
          "directory-as-bucket emulation requires a shared mount " +
          "(a real deployment points the same code at s3a://)")
}
