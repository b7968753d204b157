package graft.operators

/** JVM-lifetime build-once memo for harness queries whose operator is a
  * build/serve split (persisted ANN index, SemDeDup cell index, video
  * keyframe band index): the benched path must measure the SERVE side —
  * rebuilding per timed pass would measure the nightly job, not the
  * online probe — so the artifact is built once per (prefix, key) into a
  * temp directory removed at JVM exit. Library users call the underlying
  * `build*` entry points with their own storage paths; this memo exists
  * only for the driver-contract queries.
  */
private[graft] object BuildOnce {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Build once under a fresh temp dir and memoize the path `build`
    * returns (usually the dir itself, or a subdirectory it wrote). */
  def dir(prefix: String, key: String)(build: String => String): String =
    built.computeIfAbsent(s"$prefix|$key", { _ =>
      val d = java.nio.file.Files.createTempDirectory(prefix)
      // memoized for the JVM's lifetime, deleted at its exit — repeated
      // harness rounds must not accumulate artifacts in /tmp
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        try {
          java.nio.file.Files.walk(d)
            .sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
        } catch { case _: Exception => () }
      }))
      build(d.toString)
    })
}
