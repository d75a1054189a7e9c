package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem probes replacing the reference's boto3 helpers —
  * Hadoop FS works uniformly over local FS, HDFS, and S3A.
  */
object FsUtils {

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Prefix existence probe gating the silver job — the reference's
    * `check_minio_prefix_exists` with MaxKeys=1
    * (reference: decase/utils.py:14-63, used job_silver.py:129). */
  def prefixExists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val f = fs(spark, path)
    f.exists(p) && (f.getFileStatus(p).isFile || f.listStatus(p).nonEmpty)
  }

  /** Object count + total bytes under a prefix — the reference's
    * `get_qtd_and_size_minio` (decase/utils.py:81-114), its
    * bytes-processed sanity metric. */
  def prefixStats(spark: SparkSession, path: String): (Long, Long) = {
    val p = new Path(path)
    val f = fs(spark, path)
    if (!f.exists(p)) (0L, 0L)
    else {
      val s = f.getContentSummary(p)
      (s.getFileCount, s.getLength)
    }
  }

  /** Idempotent re-land: recursive prefix delete before re-fetch of the
    * same date (reference: datalake_bronze_...py:140-156). */
  def deletePrefix(spark: SparkSession, path: String): Boolean =
    fs(spark, path).delete(new Path(path), true)
}
