package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Deterministic random-hyperplane components for embedding LSH
  * (filestorage-style reproducibility: re-running the pipeline must
  * re-derive identical signatures).
  *
  * Component (j, k) is ±1 from bit 1 of the top-60-bits of
  * md5(j*Dim + k). The signs are materialized once here and inlined as
  * literals into BOTH the Spark plan and the DuckDB oracle SQL, so the
  * two engines share the exact constants and neither hashes per row.
  */
object Hyperplanes {
  val Planes = 64
  val Dim = 64

  private def md5Sign(idx: Int): Int = {
    val d = MessageDigest.getInstance("MD5")
      .digest(String.valueOf(idx).getBytes(StandardCharsets.UTF_8))
    val hex = d.take(8).map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    if (((h >> 1) & 1) == 1) 1 else -1
  }

  /** signs(j)(k) = ±1 for plane j, component k. */
  val signs: Array[Array[Int]] =
    Array.tabulate(Planes, Dim)((j, k) => md5Sign(j * Dim + k))
}
