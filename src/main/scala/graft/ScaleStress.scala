package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-stress harness (round-7 VERDICT item 6): measure how the most
  * expensive bench queries scale with DATA SIZE, not just how fast they
  * are at sf0.1 — a hidden quadratic is invisible at one scale and
  * fatal at 100 TB; the time-vs-scale exponent makes it measurable.
  *
  * Method: stage an N× blowup of the fixture tables into scratch —
  * replica i shifts every synthetic key by i·(max+1) so join/group
  * cardinalities grow linearly like real data growth (fixed-cardinality
  * dims region/nation stay 1×, exactly the realistic star shape);
  * `documents.text` is salted with a per-replica token so EXACT-dup and
  * near-dup structure is preserved per replica rather than amplified
  * N× (an unsalted copy would hand q20/q88 an artificial N-clique per
  * document and measure clique explosion, not the operator's scaling).
  * Embedding vectors are kept verbatim: ANN/knn cost depends on row
  * count and dimension, not on vector values.
  *
  * Then each query runs at 1× and N× (same code path, same session)
  * and the record reports exponent = ln(tN/t1)/ln(N): ~1 linear, ~1.5
  * shuffle-log-ish, ~2 quadratic. One JSON line on stdout, same
  * contract style as Bench; also appended to SCALE_STRESS.json.
  *
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_SCALE (default
  * 10), SPARK_GRAFT_ONLY to subset queries.
  */
object ScaleStress {

  /** The queries worth stressing: the top of BENCH_r06_full.json by
    * median seconds — these dominate total bench time and carry the
    * documented complexity caveats.
    */
  val TopQueries: Seq[String] = Seq(
    "q20_minhash_neardup",
    "q139_jaccard_join",
    "q81_ngram_decontaminate",
    "q155_jaro_winkler_block",
    "q164_er_prefix_blocked", // the q155 scale path — expect ~linear where q155 is quadratic
    "q101_top_ngrams",
    "q158_span_dedup",
    "q163_gopher_repetition",
    "q68_winnow_fingerprints",
    "q151_triangle_count",
    "q98_bm25",
    "q93_pagerank",
    // the rest of the slow list (r7 bench), plus the two documented
    // quadratic-with-gates operators — their exponents confirm the
    // documented complexity rather than assuming it
    "q149_contamination_score",
    "q160_dsir_weights",
    "q88_semantic_dedup",
    "q87_tfidf_topterms",
    "q22_embed_neardup",
    "q102_column_profile",
    // round-8 additions: the remaining bench queries >1 s (r7 VERDICT
    // item 5) — exponents must confirm their documented complexity
    "q79_bigram_familiarity",
    "q166_cluster_safe_split",
    "q99_fuzzy_join",
    "q156_sorted_neighborhood",
    "q84_neardup_graph",
    "q115_khop",
    "q170_embed_neardup_ann", // the q22 escape path — expect sub-quadratic (n^1.5 design)
  )

  /** Per-table key-shift rules: every synthetic surrogate key column
    * that must stay unique/consistent across replicas.
    */
  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq.empty,
    "nation" -> Seq.empty,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
  )

  /** Key DOMAIN of each shifted column: columns sharing a domain (e.g.
    * customer.c_custkey and orders.o_custkey) MUST shift by the same
    * stride, or replica i>0 foreign keys misalign — TPC-H customers
    * without orders make max(o_custkey) < max(c_custkey), and a
    * per-table stride would then shrink every stressed join's
    * cardinality at N×, skewing the measured exponent.
    */
  private val keyDomain: Map[String, String] = Map(
    "c_custkey" -> "custkey", "o_custkey" -> "custkey",
    "o_orderkey" -> "orderkey", "l_orderkey" -> "orderkey",
    "p_partkey" -> "partkey", "l_partkey" -> "partkey",
    "s_suppkey" -> "suppkey", "l_suppkey" -> "suppkey",
    "event_id" -> "event_id", "user_id" -> "user_id",
    "doc_id" -> "doc_id", "vec_id" -> "vec_id",
  )

  /** One stride per key DOMAIN: max over every column referencing the
    * domain across all tables, +1 — every replica shift in that domain
    * then uses the same offset, preserving referential alignment.
    */
  private def domainStrides(spark: SparkSession, srcDir: String): Map[String, Long] = {
    val maxes = for {
      (table, cols) <- keyCols.toSeq
      c <- cols
    } yield {
      val m = Tables.load(spark, srcDir, table)
        .agg(max(col(c)).cast("long")).head.getLong(0)
      keyDomain(c) -> m
    }
    maxes.groupMapReduce(_._1)(_._2)(math.max) map { case (d, m) => d -> (m + 1L) }
  }

  /** One replica: keys shifted by i·stride (per column, stride =
    * max+1 of the SOURCE so replicas never collide), text re-lexed.
    *
    * Replica i's text gets a PER-TOKEN prefix (`r3xword`), not an
    * appended suffix: a suffix salt leaves replicas ~identical, so
    * every doc arrives with N near-copies and the similarity joins
    * (q20/q139/q155) measure manufactured N-clique explosion instead
    * of input scaling — the first x10 run read q139 at exponent 1.60
    * for exactly this reason. A per-token prefix preserves the
    * WITHIN-replica dup/similarity structure verbatim (every gram
    * count, length, and rank is unchanged) while making cross-replica
    * token sets disjoint — a 10x corpus of NEW content, which is what
    * data growth means. `p_name` gets a replica prefix for the same
    * reason (Jaro–Winkler weights prefixes, so prefixed names are
    * genuinely new entities); brand keys stay 1x — fixed-cardinality
    * blocking under 10x data is real blocking pressure the ER join
    * must answer for, not an artifact.
    */
  private def replica(src: DataFrame, table: String, i: Int,
      strides: Map[String, Long]): DataFrame = {
    val shifted = keyCols(table).foldLeft(src) { (df, k) =>
      df.withColumn(k, col(k) + lit(i * strides(keyDomain(k))))
    }
    if (table == "documents" && i > 0)
      shifted.withColumn("text",
        regexp_replace(col("text"), "(\\S+)", s"r${i}x$$1"))
        // the per-token prefix lengthens the text; keep the derived
        // n_chars consistent or stressed queries mixing n_chars with
        // text-derived stats run on self-inconsistent data at N×
        .withColumn("n_chars", length(col("text")).cast("long"))
    else if (table == "part" && i > 0)
      shifted.withColumn("p_name", concat(lit(s"r${i}x "), col("p_name")))
    else if (table == "embeddings" && i > 0)
      // per-replica deterministic sign-flip diagonal D_i: within-replica
      // cosine/dot structure is preserved EXACTLY ((D_i a)·(D_i b) =
      // a·b), cross-replica pairs decorrelate (a·D_iD_j b with a
      // pseudo-random ± pattern) — verbatim copies made every vector
      // arrive with N exact duplicates, so q22 measured manufactured
      // clique explosion (exp 1.51 before this fix), not input scaling
      shifted.withColumn("embedding",
        expr(s"transform(embedding, (x, j) -> IF(pmod(hash(j, $i), 2) = 1, -x, x))"))
    else shifted
  }

  def stageBlowup(spark: SparkSession, srcDir: String, n: Int): String = {
    val tag = srcDir.replaceAll("[^A-Za-z0-9.]", "_")
    // v3: per-token replica prefix + embedding sign-flip (see
    // replica()) — new path so an older staging is never reused
    // v4: domain-consistent strides + n_chars recompute (see
    // domainStrides / replica()) — new path so an older staging is
    // never reused
    val dest = s"${sys.props("java.io.tmpdir")}/graft_scale/${tag}_x${n}_v4"
    sources.Staging.ensureStaged(dest) {
      val strides = domainStrides(spark, srcDir)
      keyCols.keys.toSeq.sorted.foreach { table =>
        val src = Tables.load(spark, srcDir, table)
        val out =
          if (keyCols(table).isEmpty) src // fixed-cardinality dim: 1×
          else (0 until n).map(i => replica(src, table, i, strides))
            .reduce(_ unionAll _)
        out.write.mode("overwrite").parquet(s"$dest/$table.parquet")
      }
      java.nio.file.Files.createFile(java.nio.file.Paths.get(dest, "_SUCCESS"))
    }
    dest
  }

  def main(args: Array[String]): Unit = {
    val srcDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = EngineSession.local("graft-scale-stress", cpus)
    val big = stageBlowup(spark, srcDir, n)
    System.err.println(s"[scale] staged ${n}x blowup at $big")

    val entries = SparkEntry.allEntries
      .filter(e => TopQueries.contains(e.name) && SparkEntry.envSelected(e.name))

    def timed(e: QueryEntry, dir: String, runs: Int): Double = {
      System.gc()
      val pinnedBefore = spark.sparkContext.getPersistentRDDs.keySet
      val t =
        try {
          e.run(spark, dir) // warmup (also stages derived copies)
          val times = Seq.fill(runs) {
            val t0 = System.nanoTime()
            e.run(spark, dir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          Bench.median(times)
        } catch {
          case ex: Throwable =>
            System.err.println(s"[scale] ${e.name} failed at $dir: ${ex.getMessage}")
            -1.0
        }
      operators.Ivf.invalidateIndex(blocking = true)
      operators.Pq.invalidateIndex(blocking = true)
      TransientCaches.release(blocking = true)
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!pinnedBefore.contains(id)) rdd.unpersist(blocking = true)
      }
      t
    }

    val rows = entries.map { e =>
      val t1 = timed(e, srcDir, runs = 3)
      val tN = timed(e, big, runs = 1)
      val exp =
        if (t1 > 0 && tN > 0) math.log(tN / t1) / math.log(n.toDouble) else -1.0
      System.err.println(f"[scale] ${e.name}: t1=$t1%.2f tN=$tN%.2f exp=$exp%.2f")
      (e.name, t1, tN, exp)
    }

    val json = rows.map { case (name, t1, tN, exp) =>
      f""""$name":{"t1":$t1%.3f,"tn":$tN%.3f,"exponent":$exp%.3f}"""
    }.mkString(s"""{"metric":"scale_exponent","scale":$n,"sf":"$srcDir","queries":{""",
      ",", "}}")
    println(json)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("SCALE_STRESS.json"), json + "\n")
    spark.stop()
  }
}
