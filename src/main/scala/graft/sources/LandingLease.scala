package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** Single-writer lease for a landing/state directory — shared by the
  * paginated-feed lander (a8) and the streaming upsert sink (f8), both
  * of which mutate a directory in ways that two live writers would
  * corrupt (interleaved pages; interleaved dynamic-partition
  * overwrites).
  *
  * The marker file holds `token\nexpiryEpochMs`; a lease whose expiry
  * has passed (its writer crashed without releasing) or whose content
  * is torn (its writer died mid-acquire) is taken over by deleting +
  * re-creating. Creation uses `fs.create(overwrite = false)` — atomic
  * on HDFS; on a plain local FS it is check-then-create and on object
  * stores it needs a conditional put, so the lease is ADVISORY there:
  * it serializes the operational "two schedulers fired the same
  * target" case, not adversarial racers. The takeover path re-races
  * the create after deleting a stale marker, so exactly one of N
  * concurrent takeover attempts wins. */
object LandingLease {

  /** A second writer already holds the lease — fail fast rather than
    * interleave with a live writer. */
  final class ConcurrentLandingException(message: String)
    extends RuntimeException(message)

  /** Underscore-prefixed on purpose: Spark's file index treats `_`/`.`
    * names as hidden, so readers and partition discovery never see it. */
  private def lockFile(dir: String): Path = new Path(dir, "_LOCK")

  /** Acquire the lease for `dir` or throw
    * [[ConcurrentLandingException]]; returns the token to release with. */
  def acquire(fs: FileSystem, dir: String, leaseMs: Long): String = {
    val lp = lockFile(dir)
    val token = java.util.UUID.randomUUID().toString
    def tryCreate(): Boolean =
      try {
        val out = fs.create(lp, false)
        try out.write(s"$token\n${System.currentTimeMillis() + leaseMs}".getBytes("UTF-8"))
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    if (tryCreate()) return token
    val expiry: Long =
      try {
        val in = fs.open(lp)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        txt.split("\n")(1).trim.toLong
      } catch { case _: Exception => Long.MinValue } // torn/vanished: stale
    if (System.currentTimeMillis() <= expiry)
      throw new ConcurrentLandingException(
        s"another writer holds $lp until epoch-ms $expiry; refusing to interleave")
    fs.delete(lp, false)
    if (!tryCreate())
      throw new ConcurrentLandingException(
        s"lost the stale-lease takeover race on $lp to another writer")
    token
  }

  /** Release the lease IF still ours: a token mismatch means the lease
    * expired mid-run and another writer took over — leave its marker
    * alone (size `leaseMs` above the worst-case critical-section time
    * to keep this a non-event). */
  def release(fs: FileSystem, dir: String, token: String): Unit = {
    val lp = lockFile(dir)
    val ours =
      try {
        val in = fs.open(lp)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
        txt.startsWith(token)
      } catch { case _: Exception => false }
    if (ours) fs.delete(lp, false)
  }
}
