package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared operator (SURVEY §2) surfaces here as a named query;
  * entries with an ANSI-SQL-expressible oracle also appear in
  * `oracleSql` for the driver's DuckDB differential check (the
  * Spark-era analogue of the reference's USE_PIM=0-vs-1 differential
  * method, `orc-parser/Makefile:16`).
  */
object SparkEntry {

  /** All declared engine operations, each module owning its entries. */
  def allEntries: Seq[QueryEntry] =
    operators.Relational.entries ++
      operators.TextAnalysis.entries ++
      operators.CorpusOps.entries ++
      operators.Redact.entries ++
      operators.Normalize.entries ++
      operators.Shard.entries ++
      operators.Correlate.entries ++
      operators.Covariance.entries ++
      operators.Privacy.entries ++
      operators.Search.entries ++
      operators.Dedup.entries ++
      operators.Fuzzy.entries ++
      operators.Similarity.entries ++
      operators.Knn.entries ++
      operators.Ivf.entries ++
      operators.Pq.entries ++
      operators.EventsOps.entries ++
      operators.Ewma.entries ++
      operators.Markov.entries ++
      operators.Robust.entries ++
      operators.TableDiff.entries ++
      operators.Preflight.entries ++
      operators.Overlap.entries ++
      operators.JsonProps.entries ++
      operators.Regression.entries ++
      operators.Sliding.entries ++
      operators.Drift.entries ++
      operators.Skyline.entries ++
      operators.Ivm.entries ++
      operators.Kmv.entries ++
      operators.Retention.entries ++
      operators.Profile.entries ++
      operators.PageRank.entries ++
      operators.Bpe.entries ++
      operators.Skew.entries ++
      operators.CountMin.entries ++
      operators.HistQuantile.entries ++
      operators.Bloom.entries ++
      operators.Analytic.entries ++
      operators.Reshape.entries ++
      operators.Winnow.entries ++
      operators.Quantize.entries ++
      operators.Checksum.entries ++
      operators.Cdc.entries ++
      operators.Multimodal.entries ++
      operators.Colloc.entries ++
      operators.Curation.entries ++
      operators.HeavyHitters.entries ++
      operators.Mixture.entries ++
      operators.SetJoin.entries ++
      operators.Lines.entries ++
      operators.Eval.entries ++
      operators.EvalGen.entries ++
      operators.Lm.entries ++
      operators.Valuation.entries ++
      operators.Schedule.entries ++
      operators.Balance.entries ++
      operators.Folds.entries ++
      operators.Classify.entries ++
      operators.Tpch2.entries ++
      operators.Tpch3.entries ++
      operators.Router.entries ++
      sources.OrcRoundTrip.entries ++
      sources.SchemaEvolution.entries ++
      sources.CorruptJsonl.entries ++
      sources.CharVarcharOrc.entries ++
      sources.BucketedTables.entries ++
      sources.Compaction.entries ++
      sources.StatsManifest.entries ++
      sources.ZOrderLayout.entries ++
      sources.TimestampInstantOrc.entries ++
      sources.AvroRoundTrip.entries ++
      sources.OrcUnionType.entries ++
      sources.ParquetBloom.entries ++
      sources.FileProvenance.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The 3-way broadcast-join revenue rollup (Q6) — the widest slice of
    * the engine in one plan: scan, broadcast join, partial/final agg,
    * ordered output.
    */
  def entry(spark: SparkSession): DataFrame = {
    EngineSession.tune(spark)
    allEntries.find(_.name == "q06_join_revenue_by_nation").get
      .run(spark, "/root/testdata/sf0.001")
  }

  /** SPARK_GRAFT_ONLY=q62,q33 — iteration aid shared by Bench and
    * Verify (never set by the driver; full runs are the default): keep
    * only names starting with one of the comma-separated prefixes.
    */
  def envSelected(name: String): Boolean =
    sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq) match {
      case Some(ps) if ps.nonEmpty => ps.exists(name.startsWith)
      case _ => true
    }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allEntries.map(e => e.name -> { (s: SparkSession, dir: String) =>
      EngineSession.tune(s)
      e.run(s, dir)
    }).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allEntries.flatMap(e => e.oracle.map(e.name -> _)).toMap

  /** Oracles that must be generated with the live session (fitted-model
    * parameters inlined as literals); merged with [[oracleSql]] by
    * Verify when writing oracle_sql.json.
    */
  def dynamicOracleSql(spark: SparkSession, sfDir: String): Map[String, String] =
    allEntries.flatMap(e => e.oracleGen.map(g => e.name -> g(spark, sfDir))).toMap
}
