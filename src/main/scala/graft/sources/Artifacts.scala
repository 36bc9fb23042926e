package graft.sources

/** Input fingerprints for derived-artifact caches (signature indexes,
  * centroids, partitioned/bucketed layouts). Embedding the fingerprint in
  * the artifact path makes the `_SUCCESS`-keyed caches self-invalidating:
  * if a source dataset is regenerated, its fingerprint — and therefore
  * the cache path — changes, so stale derived data is never silently
  * served (the moral equivalent of a dataset snapshot id in a real
  * lakehouse, where table versions key the index artifacts).
  */
object Artifacts {

  /** Cheap content-change token: hash of (path, length, mtime) over every
    * file under the given paths. Not a data hash — touching bytes would
    * cost a full scan — but any regeneration changes length or mtime.
    */
  def fingerprint(paths: String*): String = {
    // a typo'd input would otherwise contribute a stable "path:0:0"
    // descriptor — a key that never invalidates when the REAL input
    // regenerates, silently voiding the self-invalidation guarantee
    paths.foreach(p => require(new java.io.File(p).exists(),
      s"fingerprint input does not exist: $p"))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val desc = paths.flatMap(p => walk(new java.io.File(p)))
      .map(f => s"${f.getPath}:${f.length}:${f.lastModified}")
      .mkString("|")
    // SHA-256 truncated to 64 bits, same rationale as the packBins
    // staging key: a 32-bit key makes silently serving a STALE cached
    // artifact (after a dataset regeneration that collides) merely
    // unlikely; 64 cryptographic bits make it implausible. Changing
    // the key format invalidates every cached artifact once — a
    // rebuild, never a wrong answer.
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(desc.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
  }

  /** Sanitized cache key for a dataset dir + its fingerprint. */
  def datasetKey(dir: String, inputs: String*): String =
    dir.replaceAll("[^A-Za-z0-9.]", "_") + "_" +
      fingerprint((if (inputs.isEmpty) Seq(dir) else inputs.toSeq): _*)

  /** Build-once commit shared by every derived-artifact cache: when
    * `dir` holds no committed write (`_SUCCESS`), run `build` against a
    * temp sibling and publish it with ONE atomic directory rename. A
    * reader can therefore never observe a half-written artifact — the
    * dir exists complete or not at all; two racing builders resolve to
    * one winner (the loser's rename fails, its temp is discarded, and
    * it reads the winner's identical commit — artifacts are
    * deterministic functions of their key, so losers and winners wrote
    * the same bytes); a dir WITHOUT the marker is a crashed pre-rename
    * leftover, deleted and rebuilt. One window is narrowed, not closed:
    * the marker is re-checked immediately before that delete, but a
    * commit landing between the re-check and the delete is swept and
    * then rebuilt identically — a transient absence, never wrong
    * content. A failed build cleans its temp up; a rename failure that
    * is NOT a lost race (no committed winner present) is rethrown
    * rather than swallowed, so the caller never reads a phantom path.
    * `build` must write the standard Spark `_SUCCESS` marker into the
    * path it is given — every Spark file sink does.
    */
  def commitOnce(spark: org.apache.spark.sql.SparkSession, dir: String)(
      build: String => Unit): Unit = {
    import org.apache.hadoop.fs.{FileContext, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new Path(new java.io.File(dir).getAbsolutePath)
    val fs = target.getFileSystem(conf)
    def committed = fs.exists(new Path(target, "_SUCCESS"))
    if (committed) return
    if (fs.exists(target) && !committed) fs.delete(target, true)
    val tmp = new Path(
      target.toString + s".inprogress-${java.util.UUID.randomUUID}")
    try build(tmp.toString)
    catch {
      case e: Throwable =>
        fs.delete(tmp, true) // no orphaned temp accumulation on retries
        throw e
    }
    val fc = FileContext.getFileContext(target.toUri, conf)
    try fc.rename(tmp, target)
    catch {
      case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
          _: org.apache.hadoop.fs.ParentNotDirectoryException) =>
        fs.delete(tmp, true)
        // only a lost race is ignorable — anything else (e.g. a path
        // component that is a regular file) must surface here, not as a
        // baffling read failure at the caller
        if (!committed) throw new IllegalStateException(
          s"artifact commit failed and no winner is present: $target", e)
    }
  }
}
