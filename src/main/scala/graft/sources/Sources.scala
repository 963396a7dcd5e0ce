package graft.sources

import org.apache.hadoop.io.{LongWritable, NullWritable, Text, Writable}
import org.apache.hadoop.mapred.{InputFormat, JobConf, OutputFormat, TextInputFormat}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.3 "Scans / sources" and "Sinks").
  *
  * The reference's scan operators are file enumeration + whole-file or
  * InputFormat-split distribution (S1–S5, `AM/ApplicationMaster.java:833-903`);
  * its sinks are upload/rename commit and a gzip TextOutputFormat stream
  * (K1/K2, `container/HboxContainer.java:524-613`, `1211-1257`). Spark
  * DataSource covers all of it; this object pins the engine's entry points
  * and keeps the Hadoop-InputFormat compatibility path alive.
  *
  * Path schemes: every reader/writer here goes through the Hadoop
  * FileSystem API, so any scheme with a filesystem implementation on the
  * classpath works unchanged (hdfs://, file://). S3 (parity with the
  * reference's S2/K3, `core/.../storage/AmazonS3.java`) means `s3a://`
  * paths + the `hadoop-aws`/`aws-sdk-bundle` jars; those jars are NOT in
  * this environment, so the s3a route is documented-but-untested here —
  * no code change is needed, only the jars and credentials conf.
  */
object Sources {

  // ---- scans -------------------------------------------------------------
  def parquet(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
          header: Boolean = true): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  def json(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  def orc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)

  def text(spark: SparkSession, path: String): Dataset[String] = spark.read.textFile(path)

  /** Media-file ingestion: `binaryFile` scan mapped to the engine's
    * multimodal schema (doc_id = xxhash64(path), payload, meta struct) so
    * the output feeds `Multimodal.extractFeatures/resize/frameSample`
    * directly. Whole files as single rows — the reference's DOWNLOAD
    * strategy for opaque inputs (S4); format comes from content sniffing
    * downstream, not the filename. */
  def binaryFiles(spark: SparkSession, pathGlob: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.format("binaryFile").load(pathGlob)
      .select(
        xxhash64(col("path")).as("doc_id"),
        col("content").as("payload"),
        struct(
          lit("application/octet-stream").as("format"),
          col("path").as("origin"),
          // long, not int: a whole-file media payload can exceed 2 GiB and
          // must not wrap negative (Multimodal.asMedia matches this type)
          col("length").as("content_length")).as("meta"))
  }

  /** Hadoop `InputFormat` compatibility (parity with the reference's STREAM
    * scan S3/S5): identical split computation, records as lines. */
  def hadoopText(spark: SparkSession, path: String): Dataset[String] =
    hadoopRecords(spark, path, classOf[TextInputFormat].getName)

  /** Arbitrary `mapred.InputFormat` scan, reflectively instantiated — full
    * parity with the reference's `hbox.inputformat.class` conf
    * (`HboxConfiguration2.java:8-9`, reflective split computation at
    * `AM/ApplicationMaster.java:882-903`). Records are rendered
    * `value.toString`, exactly like the reference's stdin feed
    * (`container/HboxContainer.java:1172-1173`). Split computation and
    * record reading run distributed in the scan tasks; nothing is
    * format-specific here. */
  def hadoopRecords(spark: SparkSession, path: String,
                    inputFormatClass: String,
                    keyClass: String = classOf[LongWritable].getName,
                    valueClass: String = classOf[Text].getName): Dataset[String] = {
    import spark.implicits._
    val conf = new JobConf(spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.mapred.FileInputFormat.setInputPaths(conf, path)
    spark.createDataset(
      spark.sparkContext
        .hadoopRDD(conf,
          loadClass(inputFormatClass)
            .asInstanceOf[Class[InputFormat[Writable, Writable]]],
          loadClass(keyClass).asInstanceOf[Class[Writable]],
          loadClass(valueClass).asInstanceOf[Class[Writable]])
        .map(_._2.toString))
  }

  /** Resolve user-supplied format classes through the thread context
    * classloader (Spark's own pattern): classes shipped via `--jars` live in
    * Spark's mutable URL loader, not necessarily in this library's defining
    * loader. */
  private def loadClass(name: String): Class[_] =
    Class.forName(name, true,
      Option(Thread.currentThread().getContextClassLoader)
        .getOrElse(getClass.getClassLoader))

  /** Fan compute-heavy per-row work out to every core when the scan yields
    * fewer partitions than the session's parallelism — the "tiny file, heavy
    * map" case (a single small parquet file scans as ONE partition, so an
    * expensive projection — shingling, hashing, cosine loops — would run on
    * one core). At production scale this is a no-op: a multi-TB source
    * already scans as ≥ parallelism partitions, and the round-robin exchange
    * is skipped entirely. */
  def fanOut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    // Estimate the scan's parallelism from optimizer stats instead of
    // df.rdd.getNumPartitions — the .rdd route compiles a second physical
    // plan (and its codegen) per call, which costs ~1s of driver time per
    // query. Stats are driver-side metadata only.
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val maxPart = BigInt(spark.sessionState.conf.filesMaxPartitionBytes)
    if (bytes < maxPart * p) df.repartition(p) else df
  }

  // ---- sinks (all emit _SUCCESS via FileOutputCommitter — parity with the
  // reference's _temporary→rename→_SUCCESS protocol, K1) -------------------
  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Compacting parquet sink — the small-files mitigation every long-lived
    * table needs (a curation pipeline's filtered outputs otherwise
    * fragment into one sliver per task, and at 100 TB the NameNode/driver
    * pays per file forever after). Sizes the file count from optimizer
    * stats (driver-side metadata, no extra job) against a target bytes-
    * per-file, then round-robin repartitions to exactly that many writers.
    */
  def writeCompacted(df: DataFrame, path: String,
                     targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    require(targetFileBytes > 0, s"targetFileBytes=$targetFileBytes must be > 0")
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    df.repartition(compactedFileCount(bytes, targetFileBytes))
      .write.mode("overwrite").parquet(path)
  }

  /** ⌈bytes / targetFileBytes⌉ clamped in BigInt space BEFORE narrowing:
    * optimizer stats on joins / local relations can exceed Long range, and
    * BigInt.toLong WRAPS (low 64 bits) — a garbage file count a post-hoc
    * .min cap cannot guard. The 1M-file ceiling also bounds the
    * writer-task count for unknown-stats plans. */
  private[graft] def compactedFileCount(bytes: BigInt, targetFileBytes: Long): Int = {
    val maxFiles = BigInt(1 << 20)
    ((bytes + targetFileBytes - 1) / targetFileBytes)
      .max(BigInt(1)).min(maxFiles).toInt
  }

  /** XML sink/scan — built into spark-sql since Spark 4 (the former
    * spark-xml package); rowTag frames each record element. Rounds out the
    * semi-structured surface next to json: same schema'd read contract. */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode("overwrite").option("rowTag", rowTag).xml(path)

  def readXml(spark: SparkSession, path: String, rowTag: String = "row"): DataFrame =
    spark.read.option("rowTag", rowTag).xml(path)

  /** Gzip text sink — the reference's default output format
    * (gzip TextOutputFormat, `HboxConfiguration2.java:11-12`). */
  def writeGzipText(ds: Dataset[String], path: String): Unit =
    ds.write.mode("overwrite").option("compression", "gzip").text(path)

  /** Hive-style partitioned parquet tree (`path/col=value/part-*.parquet`).
    * This is the 100 TB scan-side story the flat-file sinks can't tell: a
    * predicate on a partition column becomes a PartitionFilter, pruning
    * whole directories at planning time — a day-filtered query over a
    * years-deep tree lists and reads only the matching directories
    * (PlanSpec asserts the pruning, not just the layout). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Range-clustered parquet sink — the sorted-by-key data layout for
    * min/max pruning: `repartitionByRange` gives the written files
    * DISJOINT key ranges (equal keys can never straddle a boundary) and
    * `sortWithinPartitions` orders rows inside each, so a point or range
    * predicate on the cluster key skips whole files and row groups via
    * parquet column statistics. This is the scan-side lever when the key
    * is too high-cardinality for a directory layout (writePartitioned's
    * contract tops out around 10³ distinct values — one directory per
    * value; clustering handles 10⁹). The range exchange samples the key
    * distribution, so skewed keys still yield balanced files. Pay the one
    * sort at write time for every later selective scan — the same
    * write-once/read-forever trade as writeBucketed, aimed at filters
    * instead of joins. */
  def writeClustered(df: DataFrame, path: String, clusterCol: String,
                     nFiles: Int = 32): Unit = {
    require(nFiles >= 1, s"nFiles=$nFiles must be >= 1")
    df.repartitionByRange(nFiles, df(clusterCol))
      .sortWithinPartitions(clusterCol)
      .write.mode("overwrite").parquet(path)
  }

  /** Bucketed, sorted managed table — the co-located join path: two tables
    * bucketed on their join key by the same bucket count join with ZERO
    * shuffle exchanges (PlanSpec proves the exchange-free SortMergeJoin).
    * This is the 100 TB answer to "the same fact-fact join runs every day":
    * pay the bucketing shuffle once at write time, never at read time. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Arbitrary `mapred.OutputFormat` sink, reflectively instantiated — full
    * parity with the reference's `hbox.outputformat.class` writer
    * (`HboxConfiguration2.java:11-12`, reflective record writer at
    * `container/HboxContainer.java:1222-1227`). Each line is written as a
    * (NullWritable, Text) record, matching the reference's `write(null,
    * line)` calls; commit goes through the same FileOutputCommitter
    * `_temporary`→rename→`_SUCCESS` protocol as every other sink (K1). */
  def saveAsHadoopText(ds: Dataset[String], path: String,
                       outputFormatClass: String): Unit =
    ds.rdd.map(s => (NullWritable.get(), new Text(s)))
      .saveAsHadoopFile(path, classOf[NullWritable], classOf[Text],
        loadClass(outputFormatClass)
          .asInstanceOf[Class[OutputFormat[NullWritable, Text]]])

  // ---- Avro container files ----------------------------------------------

  /** The Avro schema for a flat Spark schema of primitive columns — the
    * subset `avro-mapred` (the jar Spark itself ships; no spark-avro
    * datasource exists in this environment) can carry losslessly through
    * the GenericRecord JSON rendering. Nested/binary/decimal columns are
    * rejected loudly rather than silently mangled. */
  private def avroSchemaJson(schema: StructType, name: String): String = {
    import org.apache.spark.sql.types._
    val fields = schema.fields.map { f =>
      val t = f.dataType match {
        case LongType    => "\"long\""
        case IntegerType => "\"int\""
        case DoubleType  => "\"double\""
        case FloatType   => "\"float\""
        case StringType  => "\"string\""
        case BooleanType => "\"boolean\""
        case other => throw new IllegalArgumentException(
          s"avro sink supports flat primitive columns; ${f.name} is $other " +
            "(use the parquet/orc sinks for nested or logical types)")
      }
      val tpe = if (f.nullable) s"""["null", $t]""" else t
      s"""{"name": "${f.name}", "type": $tpe}"""
    }
    s"""{"type": "record", "name": "$name", "fields": [${fields.mkString(", ")}]}"""
  }

  /** Avro container-file sink over `avro-mapred`'s `AvroOutputFormat` —
    * the K2 "arbitrary OutputFormat" route instantiated for the one
    * row-major format large ingest pipelines actually exchange. Schema is
    * derived from the DataFrame (flat primitives; loud reject otherwise),
    * records build straight from the rows, and the write commits through
    * the same FileOutputCommitter rename+`_SUCCESS` protocol as every
    * other sink (K1). Parity: the reference accepts any OutputFormat via
    * `hbox.outputformat.class` (`HboxConfiguration2.java:11-12`) — Avro
    * is exactly such a class there too. */
  def writeAvro(df: DataFrame, path: String): Unit = {
    import org.apache.avro.mapred.{AvroJob, AvroOutputFormat, AvroWrapper}
    val schemaJson = avroSchemaJson(df.schema, "row")
    val names = df.schema.fieldNames
    val records = df.rdd.mapPartitions { it =>
      val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new org.apache.avro.generic.GenericData.Record(schema)
        var i = 0
        while (i < names.length) {
          rec.put(names(i), if (row.isNullAt(i)) null else row.get(i))
          i += 1
        }
        (new AvroWrapper[org.apache.avro.generic.GenericRecord](rec),
          NullWritable.get())
      }
    }
    val conf = new JobConf(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputSchema(conf,
      new org.apache.avro.Schema.Parser().parse(schemaJson))
    records.saveAsHadoopFile(path,
      classOf[AvroWrapper[org.apache.avro.generic.GenericRecord]],
      classOf[NullWritable],
      classOf[AvroOutputFormat[org.apache.avro.generic.GenericRecord]], conf)
  }

  /** Avro container-file source — `AvroInputFormat` splits (S3's
    * InputFormat contract, same machinery as [[hadoopRecords]]) with each
    * `GenericRecord` rendered to its canonical JSON and handed to Spark's
    * JSON reader under the caller's schema. Splittable like any
    * InputFormat scan, so a multi-TB Avro drop parallelizes by block;
    * the JSON hop costs one string per record — the honest tax for
    * supporting the format without a dedicated datasource jar, and only
    * on this ingest edge (everything downstream is columnar). */
  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    import org.apache.avro.mapred.{AvroInputFormat, AvroWrapper}
    import spark.implicits._
    val conf = new JobConf(spark.sparkContext.hadoopConfiguration)
    org.apache.hadoop.mapred.FileInputFormat.setInputPaths(conf, path)
    val json = spark.createDataset(
      spark.sparkContext.hadoopRDD(conf,
        classOf[AvroInputFormat[org.apache.avro.generic.GenericRecord]],
        classOf[AvroWrapper[org.apache.avro.generic.GenericRecord]],
        classOf[NullWritable])
        .map(_._1.datum().toString))
    spark.read.schema(schema).json(json)
  }
}
