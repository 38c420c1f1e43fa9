package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** D1 — md5 table sharding: a table belongs to job `jobIndex` iff
  * `int(md5(name), 16) % numJobs == jobIndex` (jdbc_incremental.py:319-325,
  * applied :552-554). Must match Python's `int(hexdigest, 16)` exactly —
  * pinned by golden vectors in the test suite.
  */
object Sharding {
  def md5Mod(name: String, numJobs: Int): Int = {
    val digest = MessageDigest.getInstance("MD5")
      .digest(name.getBytes(StandardCharsets.UTF_8))
    BigInt(1, digest).mod(BigInt(numJobs)).toInt
  }

  def assignedToJob(name: String, jobIndex: Int, numJobs: Int): Boolean =
    md5Mod(name, numJobs) == jobIndex
}
