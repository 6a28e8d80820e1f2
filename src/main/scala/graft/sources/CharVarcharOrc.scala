package graft.sources

import graft.{QueryEntry, Tables}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.ql.exec.vector.{BytesColumnVector, LongColumnVector}
import org.apache.orc.{CompressionKind, OrcFile, TypeDescription}
import org.apache.spark.TaskContext
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** The ORC `char(n)` / `varchar(n)` type surface (SURVEY §1.3: the
  * reference links the full ORC type spec via `orc-parser/reader.cc:1`
  * → orc/OrcFile.hh). Spark's own ORC writer erases CHAR/VARCHAR to
  * `string` in the file footer (even under
  * `spark.sql.preserveCharVarcharTypeInfo`), so a true-typed file is
  * produced here through the public Apache ORC Java writer directly —
  * one writer per partition (embarrassingly parallel, no driver
  * collect; the same per-task-native pattern as [[FastOrcSum]] on the
  * read side). CHAR values are space-padded and VARCHAR values
  * truncated to the declared width by the writer task, matching the
  * ORC/Hive semantics the type carries. Spark reads the file back
  * mapping both types to `string` with the stored (padded/truncated)
  * bytes — which is what the differential gate then certifies.
  *
  * ORC's `uniontype` is documented OUT OF SCOPE: neither Spark's
  * writer nor its reader has a Catalyst mapping for it, so it cannot
  * round-trip through a Spark engine at all (a native tagged-union
  * shim would have no query surface to land on).
  */
object CharVarcharOrc {

  /** `struct<flag:char(1),status:varchar(1),ship:varchar(10),ok:bigint>`. */
  val OrcSchema = "struct<flag:char(1),status:varchar(1),ship:varchar(10),ok:bigint>"

  private[sources] def fit(v: String, width: Int, pad: Boolean): String = {
    val t = if (v.length > width) v.substring(0, width) else v
    if (pad && t.length < width) t + (" " * (width - t.length)) else t
  }

  /** Write `(flag, status, ship, ok)` string/string/string/long rows as
    * a true char/varchar-typed ORC file per partition under `dest`.
    */
  def writeTyped(df: DataFrame, dest: String, schemaStr: String = OrcSchema): Unit = {
    df.foreachPartition { (rows: Iterator[Row]) =>
      val schema = TypeDescription.fromString(schemaStr)
      val widths = schema.getChildren
      val pid = TaskContext.get().partitionId()
      // overwrite: a write block re-entered after a failed or
      // marker-less earlier attempt must be idempotent (the ORC writer
      // refuses existing files by default)
      val writer = OrcFile.createWriter(new Path(s"$dest/part-r$pid.orc"),
        OrcFile.writerOptions(new Configuration())
          .setSchema(schema).compress(CompressionKind.SNAPPY)
          .overwrite(true))
      val batch = schema.createRowBatch(10000)
      def flush(): Unit =
        if (batch.size > 0) { writer.addRowBatch(batch); batch.reset() }
      rows.foreach { r =>
        val i = batch.size
        for (c <- 0 until 3) {
          val v = batch.cols(c).asInstanceOf[BytesColumnVector]
          if (r.isNullAt(c)) { v.noNulls = false; v.isNull(i) = true }
          else {
            val td = widths.get(c)
            val s = fit(r.getString(c), td.getMaxLength,
              pad = td.getCategory == TypeDescription.Category.CHAR)
            val b = s.getBytes("UTF-8")
            v.setVal(i, b, 0, b.length)
          }
        }
        val ok = batch.cols(3).asInstanceOf[LongColumnVector]
        if (r.isNullAt(3)) { ok.noNulls = false; ok.isNull(i) = true }
        else ok.vector(i) = r.getLong(3)
        batch.size += 1
        if (batch.size == batch.getMaxSize) flush()
      }
      flush()
      writer.close()
    }
  }

  /** Staged char/varchar ORC projection of lineitem (write-once per
    * source fingerprint like every other staged copy).
    */
  def charVarcharCopy(spark: SparkSession, dir: String): DataFrame = {
    val dest = Staging.fingerprintPath("graft_orc", dir, "lineitem.parquet",
      "lineitem_charvarchar")
    Staging.ensureStaged(dest) {
      new Path(dest).getFileSystem(spark.sessionState.newHadoopConf())
        .mkdirs(new Path(dest))
      writeTyped(
        spark.read.parquet(s"$dir/lineitem.parquet").select(
          col("l_returnflag").as("flag"),
          col("l_linestatus").as("status"),
          date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship"),
          col("l_orderkey").as("ok")),
        dest)
      // Spark's committer drops _SUCCESS automatically; the native
      // per-partition writer must place the marker itself, or every
      // new JVM re-stages over the last one's files
      new java.io.File(dest, "_SUCCESS").createNewFile()
    }
    OrcRoundTrip.memoRead(spark, dest)(spark.read.orc(dest))
  }

  val entries: Seq[QueryEntry] = Seq(
    // char(1)/varchar(1)/varchar(10) round-trip under the gate: the
    // engine aggregates over the true-typed ORC copy; the oracle
    // recomputes from the flat parquet source. The declared widths
    // equal the data widths, so padding/truncation are identity here —
    // the padding semantics themselves are spec-asserted in OrcSpec.
    QueryEntry.sql(
      "q96_orc_charvarchar",
      """SELECT flag, status, COUNT(*) AS cnt,
        |       CAST(SUM(ok) AS BIGINT) AS sum_ok, MAX(ship) AS max_ship
        |FROM (
        |  SELECT l_returnflag AS flag, l_linestatus AS status,
        |         strftime(CAST(l_shipdate AS TIMESTAMP), '%Y-%m-%d') AS ship,
        |         l_orderkey AS ok
        |  FROM lineitem
        |)
        |GROUP BY flag, status ORDER BY flag, status""".stripMargin,
    ) { (s, dir) =>
      charVarcharCopy(s, dir)
        .groupBy("flag", "status")
        .agg(count(lit(1)).as("cnt"), sum("ok").as("sum_ok"),
          max("ship").as("max_ship"))
        .orderBy("flag", "status")
    },
  )
}
