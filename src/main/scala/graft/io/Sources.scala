package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers of the reference engine (SURVEY.md §2.1 S1-S5), Spark-native.
  *
  *  - S1 pipe-delimited CSV: `src/search_ranking_peers.py:153-156`
  *  - S2 inferred-schema CSV: `src/search_ranking_peers.py:157-160`
  *  - S3 parquet: `src/search_ranking_peers.py:161-164`
  *  - S4 latest-date-partition discovery: `src/search_ranking_peers.py:87-151`
  *    (boto3 S3 listing replaced with the Hadoop FileSystem API so the same
  *    code serves local FS, HDFS and s3a)
  *  - S5 in-memory literal table: `src/search_ranking_peers.py:464-468`
  */
object Sources {

  /** S1 — pipe-delimited CSV with header, all-string schema. */
  def csvPipe(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("delimiter", "|").csv(path)

  /** S2 — comma CSV with header + schema inference. */
  def csvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S3 — parquet scan (self-describing schema). */
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines scan (schema inferred or supplied by the caller). */
  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** ORC scan (the second columnar format Spark ships natively). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw text scan: one row per line (`value` string) — the ingestion
    * shape for unstructured LLM corpora before any parsing.
    */
  def text(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** Binary-file scan: (path, modificationTime, length, content) — the
    * ingestion path for multimodal payloads (images/audio/video) into
    * opaque binary columns (see llm.Multimodal). `pathGlobFilter`
    * narrows to one media type without listing twice.
    */
  def binaryFiles(spark: SparkSession, path: String,
                  glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(path)
  }

  /** Convenience: read one of the driver test tables from an sf dir. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** S4 — resolve the newest `yyyyMMdd`-named child directory under
    * `prefix`. Driver-side path resolution only (one FS listing); the
    * subsequent scan stays fully distributed.
    *
    * @return absolute path of the latest date partition, if any exists
    */
  def latestDatePartition(spark: SparkSession, prefix: String): Option[String] = {
    val p = new Path(prefix)
    val fs = FileSystem.get(p.toUri, spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val dated = fs.listStatus(p).iterator
        .filter(_.isDirectory)
        .map(_.getPath)
        .filter(_.getName.matches("\\d{8}"))
        .toSeq
      if (dated.isEmpty) None
      else Some(dated.maxBy(_.getName).toString)
    }
  }

  /** S4 composed with a scan: read the latest dated snapshot under prefix. */
  def readLatestSnapshot(spark: SparkSession, prefix: String,
                         format: String = "parquet"): DataFrame = {
    val dir = latestDatePartition(spark, prefix).getOrElse(
      throw new IllegalArgumentException(s"no yyyyMMdd partitions under $prefix"))
    format match {
      case "parquet" => parquet(spark, dir)
      case "csv"     => csvInferred(spark, dir)
      case "csv_pipe" => csvPipe(spark, dir)
      case other     => spark.read.format(other).load(dir)
    }
  }

  /** S5 — in-memory literal table from rows of strings. */
  def literalTable(spark: SparkSession, cols: Seq[String], rows: Seq[Seq[Any]]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(cols.map(StructField(_, StringType, nullable = true)))
    val data = rows.map(r => Row(r.map(v => if (v == null) null else v.toString): _*))
    spark.createDataFrame(spark.sparkContext.parallelize(data, 1), schema)
  }
}
