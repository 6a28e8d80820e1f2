package graft.operators

import graft.{QueryEntry, Tables}
import graft.functions.GraftFunctions
import graft.operators.{Hll => HllOps}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic placement operators — the two primitives a 100 TB
  * corpus store runs constantly and a hash-mod layout gets wrong:
  *
  *  - RENDEZVOUS (highest-random-weight) sharding: every doc scores
  *    each shard with the pinned SplitMix64 hash and lands on its
  *    argmax. Adding a shard moves ONLY the docs the new shard now
  *    wins (~n/(S+1)); every other assignment is provably unchanged —
  *    vs hash-mod resharding which moves ~all of them. q202 certifies
  *    the property numerically: `moved_in` is 0 for every pre-existing
  *    shard under an 8→9 grow.
  *
  *  - FEISTEL epoch shuffle: training wants a reproducible uniform
  *    permutation of the corpus per epoch, not `ORDER BY rand()` (not
  *    reproducible, collides) and not a global sort by random key
  *    (a full-data shuffle per epoch). A 4-round Feistel network over
  *    the 32-bit id domain is a BIJECTION computed per-row in codegen:
  *    shuffle_key = F(doc_id) collides never, reproduces exactly, and
  *    any id range can be enumerated in shuffled order independently
  *    on any executor. q203 certifies bijectivity (distinct keys = n
  *    per language) and uniformity (mean key/2³² ≈ 0.5).
  *
  * Both are pure per-row integer expressions on the pinned hash —
  * no shuffle at all before the final (shard- or language-sized)
  * rollup; at 100 TB the assignment is free at scan time.
  */
object Shard {

  /** Signed SplitMix64 score of (doc, shard) — the HRW weight. The
    * hash input packs (doc, shard) injectively: doc_id·16 + s is
    * unique for s < 16 and doc_id < 2⁵⁹ (an additive stride would
    * collide once ids exceed it, correlating two docs' weights).
    */
  private def weight(docId: Column, s: Int): Column =
    GraftFunctions.splitmix64(docId * lit(16L) + lit(s.toLong))

  /** HRW owner of a doc among shards 0..n-1: argmax by (weight, shard)
    * via one array_max over per-row structs — no explode, no shuffle.
    */
  def hrwOwner(docId: Column, nShards: Int): Column =
    array_max(array((0 until nShards).map(s =>
      struct(weight(docId, s).as("h"), lit(s).as("s"))): _*)).getField("s")

  /** Per-shard elasticity report for an 8→9 grow. */
  def rendezvousGrowReport(docs: DataFrame): DataFrame = {
    val perDoc = docs.select(col("doc_id"),
      hrwOwner(col("doc_id"), 8).as("o8"),
      hrwOwner(col("doc_id"), 9).as("o9"))
    val by9 = perDoc.groupBy(col("o9").as("shard"))
      .agg(count(lit(1)).as("n9"),
        sum(when(col("o8") =!= col("o9"), 1L).otherwise(0L)).as("moved_in"))
    val by8 = perDoc.groupBy(col("o8").as("shard"))
      .agg(count(lit(1)).as("n8"))
    by9.join(by8, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n8"), lit(0L)).as("n8"),
        coalesce(col("n9"), lit(0L)).as("n9"),
        coalesce(col("moved_in"), lit(0L)).as("moved_in"))
      .orderBy("shard")
  }

  /** DuckDB signed reinterpretation of the UBIGINT splitmix mirror —
    * comparisons must rank exactly like Spark's signed longs.
    */
  private def signedSql(u: String): String =
    s"CAST(CASE WHEN $u >= 9223372036854775808 " +
      s"THEN CAST($u AS HUGEINT) - 18446744073709551616 " +
      s"ELSE CAST($u AS HUGEINT) END AS BIGINT)"



  // ---- Feistel ------------------------------------------------------------

  private val roundC = 7919L // round-constant stride

  /** 4-round Feistel permutation of a 32-bit id (16-bit halves; round
    * function = low 16 bits of SplitMix64(R + 7919·i)). A bijection on
    * [0, 2³²) — extend to 32-bit halves of a 64-bit id at larger key
    * spaces; the construction is identical.
    */
  def feistelShuffleKey(docId: Column): Column = {
    var l: Column = shiftright(docId, 16).bitwiseAND(lit(65535L))
    var r: Column = docId.bitwiseAND(lit(65535L))
    for (i <- 1 to 4) {
      val f = GraftFunctions.splitmix64(r + lit(roundC * i))
        .bitwiseAND(lit(65535L))
      val nl = r
      val nr = l.bitwiseXOR(f)
      l = nl; r = nr
    }
    (l * lit(65536L) + r).as("skey")
  }

  /** Per-language shuffle certificate: bijectivity (n_distinct = n)
    * and uniformity (mean key fraction ≈ 0.5).
    */
  def feistelShuffleReport(docs: DataFrame): DataFrame =
    docs.select(col("lang"), feistelShuffleKey(col("doc_id")).as("skey"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("skey")).as("n_distinct"),
        round(sum(col("skey")).cast("double") /
          (count(lit(1)).cast("double") * lit(4294967296.0)), 6)
          .as("mean_key_frac"))
      .orderBy("lang")

  private def feistelRoundSql(prev: String, i: Int): String = {
    val f = s"(${HllOps.splitmixSqlFor(s"(r + ${roundC * i})")} % 65536)"
    s"SELECT doc_id, lang, r AS l, xor(l, $f) AS r FROM $prev"
  }

  val entries: Seq[QueryEntry] = Seq(
    // Rendezvous-hash 8→9 shard grow: per-shard counts under both
    // layouts plus moved_in. DuckDB replays all 9 weights per doc and
    // both argmaxes; the HRW minimal-movement property shows up as
    // moved_in = 0 for shards 0..7 — and any weight or tiebreak
    // divergence breaks the hash.
    QueryEntry.sql(
      "q202_rendezvous_shard",
      s"""WITH w AS (
         |  SELECT doc_id, s,
         |         ${signedSql(HllOps.splitmixSqlFor("(doc_id * 16 + s)"))} AS h
         |  FROM documents CROSS JOIN (SELECT unnest(range(9)) AS s)
         |), o AS (
         |  -- (h, s) packed into one HUGEINT so arg_max ranks exactly
         |  -- like Spark's struct max: h then s (s < 16)
         |  SELECT doc_id,
         |         arg_max(CASE WHEN s < 8 THEN s END,
         |                 CASE WHEN s < 8
         |                      THEN CAST(h AS HUGEINT) * 16 + s END) AS o8,
         |         arg_max(s, CAST(h AS HUGEINT) * 16 + s) AS o9
         |  FROM w GROUP BY doc_id
         |), by9 AS (
         |  SELECT o9 AS shard, COUNT(*) AS n9,
         |         CAST(SUM(CASE WHEN o8 <> o9 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS moved_in
         |  FROM o GROUP BY 1
         |), by8 AS (SELECT o8 AS shard, COUNT(*) AS n8 FROM o GROUP BY 1)
         |SELECT COALESCE(by9.shard, by8.shard) AS shard,
         |       COALESCE(n8, 0) AS n8, COALESCE(n9, 0) AS n9,
         |       COALESCE(moved_in, 0) AS moved_in
         |FROM by9 FULL OUTER JOIN by8 ON by9.shard = by8.shard
         |ORDER BY shard""".stripMargin,
    ) { (s, dir) =>
      rendezvousGrowReport(Tables(s, dir).documents)
    },

    // Feistel epoch-shuffle certificate: DuckDB replays the 4-round
    // network bit-for-bit (UBIGINT mirror of the pinned hash, % 65536
    // = the low-16 mask) — a single bit of drift in any round breaks
    // n_distinct or the mean.
    QueryEntry.sql(
      "q203_feistel_shuffle",
      s"""WITH f0 AS (
         |  SELECT doc_id, lang,
         |         CAST(doc_id // 65536 AS UBIGINT) AS l,
         |         CAST(doc_id % 65536 AS UBIGINT) AS r
         |  FROM documents
         |), f1 AS (${feistelRoundSql("f0", 1)}),
         |f2 AS (${feistelRoundSql("f1", 2)}),
         |f3 AS (${feistelRoundSql("f2", 3)}),
         |f4 AS (${feistelRoundSql("f3", 4)}),
         |k AS (SELECT lang, l * 65536 + r AS skey FROM f4)
         |SELECT lang, COUNT(*) AS n_docs,
         |       COUNT(DISTINCT skey) AS n_distinct,
         |       ROUND(CAST(SUM(skey) AS DOUBLE) /
         |             (CAST(COUNT(*) AS DOUBLE) * 4294967296.0), 6)
         |         AS mean_key_frac
         |FROM k GROUP BY 1 ORDER BY lang""".stripMargin,
    ) { (s, dir) =>
      feistelShuffleReport(Tables(s, dir).documents)
    },

    // q316 — consistent-hash RING rebalance (the third placement
    // primitive next to q202's rendezvous and q203's Feistel: rings
    // are what memcached/Cassandra/object stores actually deploy,
    // because membership changes need no per-key rescoring — only the
    // arc the new node claims moves): 8 shards × 32 virtual nodes at
    // md5₆₀('shard<k>:v<j>') ring positions, every doc at
    // md5₆₀(doc_id) assigned to the clockwise-nearest vnode (argmin
    // of the mod-2⁶⁰ gap; Spark takes a struct-min, DuckDB the
    // equivalent HUGEINT-packed min — the q202 packing rule). The
    // report re-assigns under a 9th shard and certifies the
    // CONSISTENCY contract in-band: per old shard, n_moved counts
    // docs that moved TO shard 8, and n_moved_elsewhere — movement
    // between OLD shards, which consistent hashing forbids — must be
    // 0 in every row (also pinned in spec).
    // Scale shape: one broadcast 288-row vnode table × a per-doc
    // argmin — map-side only, no shuffle until the final rollup.
    QueryEntry.sql(
      "q316_consistent_ring",
      {
        val vnodes = for { k <- 0 until 9; j <- 0 until 32 }
          yield s"($k, 'shard$k:v$j')"
        s"""WITH vn AS MATERIALIZED (
           |  SELECT shard, CAST('0x' || substr(md5(nm), 1, 15) AS BIGINT) AS vpos
           |  FROM (VALUES ${vnodes.mkString(", ")}) AS t(shard, nm)
           |), d AS MATERIALIZED (
           |  SELECT doc_id, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
           |                      AS BIGINT) AS dpos
           |  FROM documents
           |), assign8 AS (
           |  SELECT doc_id,
           |         CAST(MIN(CAST((vpos - dpos + 1152921504606846976)
           |                       % 1152921504606846976 AS HUGEINT) * 16 + shard)
           |              % 16 AS BIGINT) AS s8
           |  FROM d JOIN vn ON vn.shard < 8 GROUP BY doc_id
           |), assign9 AS (
           |  SELECT doc_id,
           |         CAST(MIN(CAST((vpos - dpos + 1152921504606846976)
           |                       % 1152921504606846976 AS HUGEINT) * 16 + shard)
           |              % 16 AS BIGINT) AS s9
           |  FROM d JOIN vn ON TRUE GROUP BY doc_id
           |)
           |SELECT s8 AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |       CAST(SUM(CASE WHEN s9 = 8 THEN 1 ELSE 0 END) AS BIGINT)
           |         AS n_moved,
           |       CAST(SUM(CASE WHEN s9 <> s8 AND s9 <> 8 THEN 1 ELSE 0 END)
           |            AS BIGINT) AS n_moved_elsewhere,
           |       ROUND(SUM(CASE WHEN s9 = 8 THEN 1 ELSE 0 END) * 1.0
           |             / COUNT(*), 6) AS moved_frac
           |FROM assign8 JOIN assign9 USING (doc_id)
           |GROUP BY s8 ORDER BY shard""".stripMargin
      },
    ) { (s, dir) =>
      import s.implicits._
      val ring = lit(1152921504606846976L) // 2^60
      val vn = (for { k <- 0 until 9; j <- 0 until 32 }
        yield (k, s"shard$k:v$j")).toDF("shard", "nm")
        .select(col("shard"),
          GraftFunctions.md5Long(col("nm")
            .cast(org.apache.spark.sql.types.BinaryType)).as("vpos"))
      val d = Tables(s, dir).documentsRebalanced
        .select(col("doc_id"),
          GraftFunctions.md5Long(col("doc_id")
            .cast(org.apache.spark.sql.types.StringType)
            .cast(org.apache.spark.sql.types.BinaryType)).as("dpos"))
      def assigned(maxShard: Int, out: String) = d
        .crossJoin(broadcast(vn.filter(col("shard") < maxShard)))
        .groupBy("doc_id")
        .agg(min(struct(pmod(col("vpos") - col("dpos"), ring).as("gap"),
          col("shard"))).getField("shard").as(out))
      assigned(8, "s8").join(assigned(9, "s9"), "doc_id")
        .groupBy(col("s8").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("s9") === 8, 1L).otherwise(0L)).as("n_moved"),
          sum(when(col("s9") =!= col("s8") && col("s9") =!= 8, 1L)
            .otherwise(0L)).as("n_moved_elsewhere"),
          round(sum(when(col("s9") === 8, 1L).otherwise(0L)) * lit(1.0)
            / count(lit(1)), 6).as("moved_frac"))
        .select(col("shard").cast(org.apache.spark.sql.types.LongType)
          .as("shard"), col("n_docs"), col("n_moved"),
          col("n_moved_elsewhere"), col("moved_frac"))
        .orderBy("shard")
    },
  )
}
