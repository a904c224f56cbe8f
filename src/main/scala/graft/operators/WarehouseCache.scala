package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Fingerprint-keyed persistent cache for DERIVED layouts (ANN codebooks,
  * inverted lists, encoded vectors) under the warehouse dir.
  *
  * Same contract as the q54 bucketed-table cache in [[Advanced]]: the
  * expensive build runs only when the source fingerprint (mtime:length of
  * the source file — the stand-in for a table format's snapshot id)
  * changed; otherwise the previously-written parquet is read back,
  * metadata-only. This is how an ANN index behaves at 100 TB: codebook
  * training and corpus encoding are offline build steps amortized over
  * every query; per-query work is probe + scan.
  */
object WarehouseCache {

  /** mtime+length of a source file — cheap invalidation key. */
  def sourceFingerprint(s: SparkSession, d: String, file: String): String = {
    val p = new org.apache.hadoop.fs.Path(d, file)
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    s"${st.getModificationTime}:${st.getLen}"
  }

  /** Canonical per-dataset table-name suffix (matches q54's). */
  def dirSuffix(d: String): String = d.replaceAll("[^a-zA-Z0-9]", "_")

  /** Read-or-build `name` (a parquet directory under the warehouse): if
    * the stored fingerprint equals `fp` the existing files are read back;
    * otherwise `build` runs, its result is written, and `fp` recorded.
    * Builds are deterministic by construction (no RNG anywhere in the
    * codebook paths), so a cache hit is bit-identical to a rebuild. */
  def cachedParquet(s: SparkSession, name: String, fp: String)(
      build: => DataFrame): DataFrame = {
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), name)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    val fpFile = new org.apache.hadoop.fs.Path(loc, "_graft_fingerprint")
    val cachedFp =
      if (!fs.exists(fpFile)) None
      else {
        val in = fs.open(fpFile)
        try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim)
        finally in.close()
      }
    if (!cachedFp.contains(fp)) {
      if (fs.exists(loc)) fs.delete(loc, true)
      build.write.mode(SaveMode.Overwrite).parquet(loc.toString)
      val out = fs.create(fpFile, true)
      try out.write(fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    s.read.parquet(loc.toString)
  }
}
