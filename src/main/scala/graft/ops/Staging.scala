package graft.ops

/** Process-private staging paths for queries that materialize a derived
  * table once per JVM (partsupp mart, partitioned-layout round-trips,
  * merge snapshots). The path is keyed by
  *  - the INPUT DIR'S ABSOLUTE-PATH HASH — two different datasets that
  *    share a basename (e.g. /a/sf0.01 vs /b/sf0.01) never reuse each
  *    other's staged copy, and
  *  - the PROCESS id — two concurrent JVMs (Verify and Bench on the same
  *    host) never race one's SaveMode.Overwrite against the other's read.
  * The basename stays in the path for human readability. */
object Staging {
  private val pid = ProcessHandle.current().pid()

  def dir(root: String, inputDir: String, leaf: String): String = {
    val abs = new java.io.File(inputDir).getAbsolutePath
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(abs.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"$root/${new java.io.File(inputDir).getName}-$key-$pid/$leaf"
  }
}
