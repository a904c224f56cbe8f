package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Sense-and-claim orchestration, Spark-native.
  *
  * The reference's Airflow DAG polls a GCS bucket for objects with a prefix,
  * takes the FIRST listed match, copies it to `processed/<name>`, deletes the
  * original, and hands the new path to the pipeline (reference
  * `code/airflow_pipe.py:44-57,73-94`). This module is the same contract over
  * the Hadoop FileSystem API, so it works identically for file://, hdfs://,
  * gs://, s3a:// — rename is atomic on HDFS/local; on object stores it is
  * copy+delete with the same (documented) race the reference has.
  *
  * The robust exactly-once path at scale is [[graft.streaming.FoodOrdersStream]]
  * (checkpointed Structured Streaming file source); this batch claimer mirrors
  * the reference's semantics for parity.
  */
object FileClaimer {

  final case class NoFileFound(dir: String, prefix: String)
      extends RuntimeException(s"no file with prefix '$prefix' in $dir")

  /** List `dir` for names starting with `prefix`, claim the first match by
    * moving it into `dir/processed/`, and return the claimed path.
    * Raises [[NoFileFound]] when nothing matches (the reference's
    * `list_files` raises too, `code/airflow_pipe.py:55-57`). */
  def claimFirst(conf: Configuration, dir: String, prefix: String): Path = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val matches = fs.listStatus(dirPath)
      .filter(s => s.isFile && s.getPath.getName.startsWith(prefix))
      .map(_.getPath)
      .sortBy(_.getName)                 // deterministic "first listed"
    if (matches.isEmpty) throw NoFileFound(dir, prefix)
    val src = matches.head
    val processedDir = new Path(dirPath, "processed")
    if (!fs.exists(processedDir)) fs.mkdirs(processedDir)
    val dest = new Path(processedDir, src.getName)
    if (!fs.rename(src, dest))
      throw new RuntimeException(s"claim failed: $src -> $dest")
    dest
  }

  /** Sense: does any unclaimed file with the prefix exist? (GCS sensor
    * parity, `code/airflow_pipe.py:73-80`.) */
  def senses(conf: Configuration, dir: String, prefix: String): Boolean = {
    val dirPath = new Path(dir)
    val fs = dirPath.getFileSystem(conf)
    fs.exists(dirPath) && fs.listStatus(dirPath)
      .exists(s => s.isFile && s.getPath.getName.startsWith(prefix))
  }
}
