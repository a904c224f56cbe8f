package graft.operators

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession

/** Metadata-only scalar aggregates from parquet footer statistics (zone
  * maps): an exact global MIN/MAX that never scans a data page. The
  * "normalize by the global max" pattern (weighted sampling q101,
  * feature scaling) otherwise costs a full aggregate job before the
  * real scan can start; row-group statistics answer it for the price of
  * the footers. Statistics are exact for numeric physical types, so
  * this is a rewrite, not an approximation — and any file without valid
  * statistics makes the result None, forcing the caller back to the
  * scan-based aggregate (never a silently wrong answer).
  *
  * Scale: footer reads are driver-side here, O(files) metadata IO —
  * the same order of work Spark's own scan planning already does for
  * the SAME files (footer schema reads). A 100 TB table with ~100k
  * files keeps this in seconds; beyond that, distribute the footer
  * reads with one mapPartitions over the file list (shape unchanged)
  * or rely on the scan-side aggregate fallback.
  */
object ParquetStats {

  /** Exact max of a DOUBLE column across every row group under `path`
    * (file or directory). None if the column is missing anywhere, any
    * row group lacks valid statistics, no row has a value, or the
    * column's physical type is not floating point (e.g. the table was
    * rewritten with the column as DECIMAL) — every non-answerable case
    * forces the caller back to the scan-based aggregate. */
  def doubleMax(s: SparkSession, path: String, column: String)
      : Option[Double] =
    reduceStats(s, path, column)(
      (st: org.apache.parquet.column.statistics.Statistics[_]) =>
        st.genericGetMax match {
          case d: java.lang.Double => Some(d.doubleValue())
          case f: java.lang.Float => Some(f.doubleValue())
          case _ => None // not a floating-point column → scan fallback
        })(math.max)

  /** Exact min, same contract as [[doubleMax]]. */
  def doubleMin(s: SparkSession, path: String, column: String)
      : Option[Double] =
    reduceStats(s, path, column)(
      (st: org.apache.parquet.column.statistics.Statistics[_]) =>
        st.genericGetMin match {
          case d: java.lang.Double => Some(d.doubleValue())
          case f: java.lang.Float => Some(f.doubleValue())
          case _ => None // not a floating-point column → scan fallback
        })(math.min)

  /** Exact row count from footer metadata (no statistics needed). */
  def rowCount(s: SparkSession, path: String): Long = {
    val conf = s.sparkContext.hadoopConfiguration
    dataFiles(s, path).map { f =>
      val reader =
        ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
      finally reader.close()
    }.sum
  }

  private def reduceStats(s: SparkSession, path: String, column: String)(
      extract: org.apache.parquet.column.statistics.Statistics[_] => Option[Double])(
      combine: (Double, Double) => Double): Option[Double] = {
    val conf = s.sparkContext.hadoopConfiguration
    var acc: Option[Double] = None
    for (f <- dataFiles(s, path)) {
      val reader =
        ParquetFileReader.open(HadoopInputFile.fromPath(f, conf))
      try {
        for (block <- reader.getFooter.getBlocks.asScala) {
          val col = block.getColumns.asScala
            .find(_.getPath.toDotString == column)
            .getOrElse(return None)
          val st = col.getStatistics
          // invalid/absent stats, or a row group with no non-null value
          // when others have one, cannot contribute — bail to the scan
          if (st == null || st.isEmpty || !st.hasNonNullValue) {
            if (st == null || st.isEmpty || st.getNumNulls != block.getRowCount)
              return None
          } else {
            val v = extract(st).getOrElse(return None)
            acc = Some(acc.fold(v)(combine(_, v)))
          }
        }
      } finally reader.close()
    }
    acc
  }

  private def dataFiles(s: SparkSession, path: String): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val status = fs.getFileStatus(p)
    if (status.isFile) Seq(p)
    else fs.listStatus(p).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
      .sortBy(_.getName)
  }
}
