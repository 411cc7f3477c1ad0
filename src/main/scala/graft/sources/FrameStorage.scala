package graft.sources

import java.nio.file.{Files, Paths}

/** REAL local blob storage — the byte-moving twin of the reference's
  * filestorage layer (data_storage.py:9-264, local_storage.py:9-176).
  * Frames are genuine PNG files on disk under
  * `mount/storageDir/im_c###_z###_t###_p###....png`, written and read
  * back as real bytes. The distributed transfer paths live in
  * [[FrameStorageApi]] (shared with the S3-shaped backend); this class
  * supplies local_storage.py's existence semantics: a dataset is
  * unique iff its DIRECTORY doesn't exist, and a frame exists iff its
  * exact file path does.
  *
  * The write paths run `java.nio.Files.write` INSIDE partitions, so on
  * a multi-node cluster `mountPoint` must be a SHARED filesystem
  * (NFS-style) visible at the same path on every executor — exactly
  * the reference's local_storage deployment assumption. The driver
  * `require` below can't see executor disks, so each partition loop
  * re-checks ([[FrameStorage.assertMounted]]) and a misconfigured
  * cluster fails loudly instead of scattering files on executor-local
  * disks while reporting success.
  *
  * Reference semantics kept:
  *  - `assertUniqueId` (local_storage.py:49-56): a dataset directory
  *    may be written once.
  *  - `nonexistentStoragePath` (local_storage.py:58-69): per-file
  *    overwrite guard — existing frames are SKIPPED, not clobbered
  *    (upload_im_tuple:116-120 prints and moves on; we count skips).
  *    The skip itself is ATOMIC (CREATE_NEW): the reference's
  *    check-then-write races when two workers carry the same name.
  */
class FrameStorage(val mountPoint: String, val storageDir: String)
    extends FrameStorageApi {

  require(Files.exists(Paths.get(mountPoint)),
    s"Make sure local storage is mounted, dir $mountPoint doesn't exist")

  /** mount point + raw_frames|raw_files + dataset ID. */
  val idStoragePath: String = s"$mountPoint/$storageDir"

  /** local_storage.py:49-56 — a dataset ID may enter storage once. */
  def assertUniqueId(): Unit =
    require(!Files.exists(Paths.get(idStoragePath)),
      s"ID $idStoragePath already exists in storage")

  /** local_storage.py:58-69 — true iff the path is free to write. */
  def nonexistentStoragePath(storagePath: String): Boolean =
    !Files.exists(Paths.get(mountPoint, storagePath))

  protected def prepareUpload(): Unit = {
    Files.createDirectories(Paths.get(idStoragePath)); ()
  }

  protected def putNew(fileName: String, bytes: Array[Byte]): Boolean =
    try {
      Files.write(Paths.get(idStoragePath, fileName), bytes,
        java.nio.file.StandardOpenOption.CREATE_NEW)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    }

  protected def checkVisible(): Unit =
    FrameStorage.assertMounted(idStoragePath)
}

object FrameStorage {
  /** Executor-side shared-mount check: the driver created `dir`
    * before launching the job, so an executor that can't see it is on
    * a node where the storage mount isn't shared — fail the task
    * loudly rather than write to a local disk nobody will read.
    */
  private[sources] def assertMounted(dir: String): Unit =
    if (!Files.isDirectory(Paths.get(dir)))
      throw new IllegalStateException(
        s"storage dir $dir not visible on this executor — " +
          "FrameStorage requires a shared mount at the same path on " +
          "every node (see class doc)")
}
