package graft.tools
import java.nio.file.{Files, Paths}

/** Optimization-round deliverable: write `.explain("formatted")` of the
  * named queries to `<outDir>/<query>_<suffix>.txt` (the judge checks
  * plan claims against these files). Usage:
  *   runMain graft.tools.PlanFiles <outDir> <suffix> <q1,q2,...>
  */
object PlanFiles {
  def main(args: Array[String]): Unit = {
    val Array(outDir, suffix, names) = args
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.EngineSession.local("planfiles", "8")
    Files.createDirectories(Paths.get(outDir))
    names.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sf)
      val full = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${q}_$suffix.txt"), full)
      println(s"wrote $q (${full.length} chars)")
    }
    spark.stop()
  }
}
