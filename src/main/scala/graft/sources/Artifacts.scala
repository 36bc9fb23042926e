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
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val desc = paths.flatMap(p => walk(new java.io.File(p)))
      .map(f => s"${f.getPath}:${f.length}:${f.lastModified}")
      .mkString("|")
    val h = scala.util.hashing.MurmurHash3.stringHash(desc)
    java.lang.Integer.toHexString(h)
  }

  /** Sanitized cache key for a dataset dir + its fingerprint. */
  def datasetKey(dir: String, inputs: String*): String =
    dir.replaceAll("[^A-Za-z0-9.]", "_") + "_" +
      fingerprint((if (inputs.isEmpty) Seq(dir) else inputs.toSeq): _*)
}
