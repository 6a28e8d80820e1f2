package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.ql.exec.vector.LongColumnVector
import org.apache.orc.OrcFile
import org.apache.spark.sql.SparkSession

/** The reference program's architecture, verbatim, on Spark's
  * scheduler: stripe-aligned splits (`reader.cc:104-144`), one
  * independent ORC reader per task (`reader.cc:34-44`), 10k-row
  * vectorized batches (`reader.cc:43-44`), null-aware per-task partial
  * sums (`reader.cc:60-63`) merged by a final reduce
  * (`reader.cc:156-160`) — built on the public Apache ORC Java library
  * that ships with Spark.
  *
  * Why it exists: the DataFrame path (`spark.read.orc(...).agg(sum)`)
  * pays the columnar→row boundary plus codegen-agg per row; for the
  * reference's exact query shape (sum one integer column) the native
  * column-vector loop is ~5-10× faster. This is the documented
  * `mapPartitions`-last-resort case (preference order (d)): the
  * semantics are a single scalar, so no Catalyst composability is
  * lost, and the general path remains the DataFrame one.
  *
  * Scale: one task per stripe — identical decomposition to
  * FileSourceScanExec's stripe-aligned splits, so 100 TB = ~1 task per
  * stripe exactly like the built-in scan; partial sums are Longs
  * (the reference wraps `uint64_t` on overflow, `reader.cc:22` —
  * same wrap semantics here, documented divergence from SQL ANSI).
  */
object FastOrcSum {

  final case class StripeSplit(file: String, offset: Long, length: Long)

  /** Enumerate stripe-aligned splits (footer-only reads, driver-side —
    * the same metadata pass as `reader.cc:99-112`'s planning step).
    * Paths resolve through the session's Hadoop filesystem, so any
    * supported scheme (file://, hdfs://, s3a://) works.
    */
  def stripeSplits(spark: SparkSession, path: String): Seq[StripeSplit] = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).map(_.getPath)
          .filter(_.getName.endsWith(".orc")).sortBy(_.toString).toSeq
      else Seq(root)
    files.flatMap { f =>
      val reader = OrcFile.createReader(f, OrcFile.readerOptions(conf))
      try {
        import scala.jdk.CollectionConverters._
        reader.getStripes.asScala.map(s =>
          StripeSplit(f.toString, s.getOffset, s.getLength)).toSeq
      } finally reader.close()
    }
  }

  /** SUM of the first column (must be an integer-family column) across
    * all stripes, one task per stripe.
    */
  def sumFirstLongColumn(spark: SparkSession, path: String): Long = {
    val splits = stripeSplits(spark, path)
    if (splits.isEmpty) return 0L
    val hconf = org.apache.spark.sql.graft.Shims.broadcastHadoopConf(spark)
    spark.sparkContext
      .parallelize(splits, splits.size)
      .map { s =>
        val conf: Configuration = hconf.conf
        val reader = OrcFile.createReader(new Path(s.file), OrcFile.readerOptions(conf))
        try {
          val schema = reader.getSchema
          // project only the first column (ids: 0 = root struct)
          val include = new Array[Boolean](schema.getMaximumId + 1)
          include(0) = true
          include(schema.getChildren.get(0).getId) = true
          val rows = reader.rows(
            reader.options().range(s.offset, s.length).include(include))
          try {
            val batch = schema.createRowBatch(10000)
            val col = batch.cols(0).asInstanceOf[LongColumnVector]
            var sum = 0L
            while (rows.nextBatch(batch)) {
              val n = batch.size
              if (col.isRepeating) {
                if (col.noNulls || !col.isNull(0)) sum += col.vector(0) * n
              } else if (col.noNulls) {
                var i = 0
                while (i < n) { sum += col.vector(i); i += 1 }
              } else {
                var i = 0
                while (i < n) {
                  if (!col.isNull(i)) sum += col.vector(i)
                  i += 1
                }
              }
            }
            sum
          } finally rows.close()
        } finally reader.close()
      }
      .reduce(_ + _)
  }
}
