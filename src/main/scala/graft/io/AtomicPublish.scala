package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Staged publication of a multi-directory index artifact (shared by the
  * persisted ANN index and the persisted text index): callers write the
  * COMPLETE new trees under `staging`, then [[publish]] installs each part
  * with two filesystem metadata operations (retire-rename + install-rename).
  * A concurrent reader sees the old complete index or the new complete one;
  * the unreadable window shrinks from O(build) to O(ms). A crashed build
  * leaves only the staging dir, which the next build scrubs via
  * [[scrubStaging]]; the live index is untouched until the new trees are
  * complete. (Pattern extracted from the r12 IVF build — see
  * `Similarity.buildIvfIndex`'s history note on the observed half-written
  * parquet race.)
  */
object AtomicPublish {

  def fsFor(s: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(s.sessionState.newHadoopConf())

  /** `fs.rename` that refuses to swallow failure: HDFS-style FileSystems
    * signal a failed rename by RETURNING FALSE (no exception), so an
    * unchecked publication rename would leave the index silently stale or
    * missing and only surface at some later read.
    */
  def renameOrThrow(fs: FileSystem, src: Path, dst: Path): Unit =
    require(fs.rename(src, dst), s"filesystem rename failed: $src -> $dst")

  /** Delete any staging leftover from a crashed previous build. */
  def scrubStaging(fs: FileSystem, staging: String): Unit =
    fs.delete(new Path(staging), true)

  /** Install `staging/<part>` over `indexDir/<part>` for each part, via
    * retire-rename + install-rename, then remove the staging dir.
    */
  def publish(fs: FileSystem, indexDir: String, staging: String,
              parts: Seq[String]): Unit = {
    for (part <- parts) {
      val retired = new Path(s"$indexDir/$part-retired")
      fs.delete(retired, true)
      if (fs.exists(new Path(s"$indexDir/$part")))
        renameOrThrow(fs, new Path(s"$indexDir/$part"), retired)
      renameOrThrow(fs, new Path(s"$staging/$part"), new Path(s"$indexDir/$part"))
      fs.delete(retired, true)
    }
    fs.delete(new Path(staging), true)
  }
}
