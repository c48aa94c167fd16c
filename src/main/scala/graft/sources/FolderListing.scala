package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1 — prefix listing: enumerate backup folders under a root and extract
  * their ledger keys (`Salesforce/Task/lambda_litify_task.py:129-135`, key
  * extraction `:55-56`), with the P12 extension filter deciding whether a
  * folder has loadable files. A driver-side Hadoop FS metadata operation —
  * listings are tiny relative to data and the result feeds
  * [[graft.operators.Ledger.discoverNew]]'s broadcast anti-join, so this
  * never becomes a distributed job. Works against any Hadoop-supported
  * filesystem (file://, s3a://, hdfs://). */
object FolderListing {

  /** `"backup/2024-05-01_Differential/" -> "2024-05-01_"` —
    * `lambda_litify_task.py:55-56`. */
  def folderKey(folderName: String): String =
    folderName.split("_Differential")(0) + "_"

  /** List immediate sub-folders of `root`: one row per folder with
    * (key, path, has_files). `has_files` = contains at least one file with
    * `extension` (P12 — the reference only loads `.csv` members). */
  def folders(spark: SparkSession, root: String,
              extension: String = ".csv",
              keyFn: String => String = folderKey): DataFrame = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rows = fs.listStatus(rootPath).toSeq
      .filter(_.isDirectory)
      .sortBy(_.getPath.getName)
      .map { st =>
        val hasFiles = fs.listStatus(st.getPath)
          .exists(f => f.isFile && f.getPath.getName.endsWith(extension))
        (keyFn(st.getPath.getName), st.getPath.toString, hasFiles)
      }
    import spark.implicits._
    rows.toDF("key", "path", "has_files")
  }
}
