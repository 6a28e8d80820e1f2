package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.Shard

/** Placement + normalization coverage beyond the q201–q203 oracle
  * gate: the NFC expression's Unicode semantics, the HRW minimal-
  * movement property, and Feistel bijectivity over a dense id domain.
  */
class ShardNormalizeSpec extends SparkSpec {

  import spark.implicits._

  test("nfc_normalize: decomposed composes, ASCII is identity, idempotent") {
    val rows = Seq(
      "café",          // decomposed é → U+00E9
      "café",           // already NFC
      "plain ascii text 42", // fast path
      "Å",             // A + ring → Å U+00C5
      "你好",        // CJK: NFC-invariant, non-ASCII path
      "")
      .toDF("s")
      .select(col("s"), GraftFunctions.nfcNormalize(col("s")).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toMap
    assert(rows("café") === "café")
    assert(rows("café") === "café")
    assert(rows("plain ascii text 42") === "plain ascii text 42")
    assert(rows("Å") === "Å")
    assert(rows("你好") === "你好")
    assert(rows("") === "")
    // idempotence: nfc(nfc(x)) == nfc(x) over the planted corpus
    val deco = graft.operators.Normalize
      .decoratedPairs(Tables(spark, sf).documents)
      .select(GraftFunctions.nfcNormalize(col("decorated")).as("n1"))
      .select(col("n1"), GraftFunctions.nfcNormalize(col("n1")).as("n2"))
      .filter(col("n1") =!= col("n2"))
    assert(deco.count() === 0L)
  }

  test("nfc_normalize registered in SQL; null passes through") {
    val r = spark.sql(
      "SELECT nfc_normalize('café') AS a, nfc_normalize(CAST(NULL AS STRING)) AS b")
      .collect()(0)
    assert(r.getString(0) === "café")
    assert(r.isNullAt(1))
  }

  test("q201 lift: every language collapses exactly half its decorated docs") {
    val rows = run("q201_nfc_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, raw, nfc) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("distinct_raw"), r.getAs[Long]("distinct_nfc"))
      assert(raw === n, s"raw variants must all be byte-distinct: $r")
      // every (2k, 2k+1) pair shares one NFC form; odd-sized language
      // groups keep at most one unpaired doc per pair boundary
      assert(nfc <= raw && nfc >= raw / 2, s"NFC must collapse pairs: $r")
      assert(r.getAs[Long]("dup_lift") === raw - nfc)
    }
    // globally: 500 docs → exactly 250 NFC classes (pairs never split
    // across languages — both members take the partner's lang)
    val total = rows.map(_.getAs[Long]("distinct_nfc")).sum
    val n = rows.map(_.getAs[Long]("n_docs")).sum
    assert(total === n / 2, s"pairs must collapse globally: $total vs $n")
  }

  test("rendezvous grow 8→9 moves only what the new shard wins") {
    val rows = run("q202_rendezvous_shard").collect()
    val byShard = rows.map(r => r.getAs[Int]("shard").toLong ->
      (r.getAs[Long]("n8"), r.getAs[Long]("n9"), r.getAs[Long]("moved_in"))).toMap
    // HRW: a doc's owner changes ONLY if the new shard outbids its old
    // owner — so no pre-existing shard ever gains a doc
    byShard.filter(_._1 < 8).foreach { case (s, (_, _, moved)) =>
      assert(moved === 0L, s"shard $s gained docs on grow — not HRW")
    }
    val (n8tot, n9tot) = (byShard.values.map(_._1).sum, byShard.values.map(_._2).sum)
    assert(n8tot === n9tot, "grow must conserve docs")
    // the new shard's intake is every moved doc
    assert(byShard(8L)._3 === byShard(8L)._2)
    assert(byShard(8L)._1 === 0L)
  }

  test("feistel key is a bijection over a dense 2^16 domain") {
    val n = 65536L
    val keys = spark.range(n)
      .select(Shard.feistelShuffleKey(col("id")).as("skey"))
    assert(keys.select(countDistinct(col("skey"))).as[Long].head() === n)
    val mm = keys.agg(min(col("skey")), max(col("skey"))).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < (1L << 32))
    // ids 0..65535 have L=0: even so, keys spread across the full
    // 32-bit range (the rounds mix, not just relabel the low half)
    assert(mm.getLong(1) > (1L << 30), s"keys did not diffuse: $mm")
  }

  test("q203 certificate: per-language bijectivity on the fixture") {
    run("q203_feistel_shuffle").collect().foreach { r =>
      assert(r.getAs[Long]("n_distinct") === r.getAs[Long]("n_docs"), r.toString)
      val f = r.getAs[Double]("mean_key_frac")
      assert(f > 0.0 && f < 1.0)
    }
  }
}
