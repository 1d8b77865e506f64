package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusOps, Similarity}

/** Unit tests for the corpus-curation operators (repetition, PII,
  * decontamination, stratified sampling, sequence packing) on
  * synthetic data with hand-computed expectations; fixture-level
  * correctness is gated by the DuckDB oracles (t17-t21).
  */
class CorpusOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._

  test("hllEstimateFromRegisters: empty register state yields the " +
      "well-defined all-zero-registers row, never NULLs") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val row = CorpusOps.hllEstimateFromRegisters(
      CorpusOps.hllRegisters(noDocs, "text", n = 3, p = 8), p = 8)
      .collect().head
    val m = 1L << 8
    val maxRho = 32 - 8 + 1
    assert(!row.isNullAt(row.fieldIndex("z_scaled")) &&
      !row.isNullAt(row.fieldIndex("est_distinct")),
      "empty corpus/stream state produced NULL estimate columns")
    assert(row.getLong(row.fieldIndex("n_zero_regs")) == m)
    assert(row.getLong(row.fieldIndex("z_scaled")) == m * (1L << maxRho))
  }

  test("maximalDupRanges: any-alignment copies, within-doc repeats, " +
      "touch-merge, full dups, clean docs") {
    def toks(prefix: String, a: Int, b: Int): String =
      (a to b).map(i => s"$prefix$i").mkString(" ")
    val docs = Seq(
      // 1: 20 tokens; tokens a5..a12 copied into doc 2 -> ONE covered
      //    gram (start 4), one range of exactly l = 8
      (1L, toks("a", 1, 20)),
      (2L, "b1 b2 " + toks("a", 5, 12) + " b3 b4"),
      // 3: within-doc repeat y1..y8 ... y1..y8 (gap 9 > 8): two ranges
      (3L, toks("y", 1, 8) + " z " + toks("y", 1, 8)),
      // 4/5: verbatim twins -> hits 0..4 coalesce to one full range
      (4L, toks("w", 1, 12)),
      (5L, toks("w", 1, 12)),
      // 6: clean and too short for any gram
      (6L, "q1 q2 q3"),
      // 7: hits at 0 (c-gram, shared with 8) and 8 (d-gram, shared
      //    with 9) TOUCH (gap == l) -> merged into one 16-token range
      (7L, toks("c", 1, 8) + " " + toks("d", 1, 8)),
      (8L, toks("c", 1, 8) + " e1"),
      (9L, toks("d", 1, 8) + " e2"))
      .toDF("doc_id", "text")
    val got = CorpusOps.maximalDupRanges(docs, "doc_id", "text", l = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) == ((20L, 1L, 8L)), s"doc1: ${got(1L)}")
    assert(got(2L) == ((12L, 1L, 8L)), s"doc2: ${got(2L)}")
    assert(got(3L) == ((17L, 2L, 16L)), s"doc3: ${got(3L)}")
    assert(got(4L) == ((12L, 1L, 12L)), s"doc4: ${got(4L)}")
    assert(got(5L) == ((12L, 1L, 12L)), s"doc5: ${got(5L)}")
    assert(got(6L) == ((3L, 0L, 0L)), s"doc6: ${got(6L)}")
    assert(got(7L) == ((16L, 1L, 16L)), s"doc7: ${got(7L)}")
    assert(got(8L) == ((9L, 1L, 8L)), s"doc8: ${got(8L)}")
    assert(got(9L) == ((9L, 1L, 8L)), s"doc9: ${got(9L)}")
  }

  test("repetitionMetrics: hand-computed fractions") {
    val docs = Seq(
      (1L, "a a a b"),        // uniq 2/4; modal unigram a: 3/4; bigrams [a a, a a, a b]: 2/3
      (2L, "x y z"),          // uniq 1.0; modal 1/3; bigrams [x y, y z]: 1/2
      (3L, "solo")            // 1 token: no bigrams -> 0.0
    ).toDF("doc_id", "text")
    val m = CorpusOps.repetitionMetrics(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(m(0).getLong(1) == 4)
    assert(m(0).getDouble(2) == 0.5)
    assert(m(0).getDouble(3) == 0.75)
    assert(math.abs(m(0).getDouble(4) - 2.0 / 3.0) < 1e-15)
    assert(m(1).getDouble(2) == 1.0)
    assert(math.abs(m(1).getDouble(3) - 1.0 / 3.0) < 1e-15)
    assert(m(1).getDouble(4) == 0.5)
    assert(m(2).getLong(1) == 1)
    assert(m(2).getDouble(4) == 0.0)
  }

  test("piiScan: detects and redacts emails, IPs, phones, terms") {
    val docs = Seq(
      (1L, "mail me at jane.doe+x@example.org or bob@test.co thanks"),
      (2L, "server 10.0.255.1 called +1 555 123 4567 about the customer key"),
      (3L, "clean text with nothing sensitive")
    ).toDF("doc_id", "text")
    val r = CorpusOps.piiScan(docs, "doc_id", "text", Seq("customer", "key"))
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 2)  // emails
    assert(r(0).getString(5) == "mail me at <EMAIL> or <EMAIL> thanks")
    assert(r(1).getLong(2) == 1)  // ipv4
    assert(r(1).getLong(3) == 1)  // phone
    assert(r(1).getLong(4) == 2)  // terms
    assert(r(1).getString(5) == "server <IP> called <PHONE> about the <TERM> <TERM>")
    assert(r(2).getLong(1) + r(2).getLong(2) + r(2).getLong(3) + r(2).getLong(4) == 0)
    assert(r(2).getString(5) == "clean text with nothing sensitive")
  }

  test("piiScan: dictionary terms are quoted literally, not as regex") {
    val docs = Seq((1L, "price is a.b not axb")).toDF("doc_id", "text")
    val r = CorpusOps.piiScan(docs, "doc_id", "text", Seq("a.b"))
      .collect()(0)
    assert(r.getLong(4) == 1)
    assert(r.getString(5) == "price is <TERM> not axb")
  }

  test("decontaminate: flags docs sharing an n-gram with the benchmark") {
    val train = Seq(
      (1L, "the quick brown fox jumps"),   // shares "the quick brown" with bench
      (2L, "entirely different words here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "the quick brown dog sleeps")
    ).toDF("doc_id", "text")
    val r = CorpusOps.decontaminate(train, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 3)  // 5 tokens -> 3 trigrams
    assert(r(0).getLong(2) == 1)  // "the quick brown"
    assert(r(0).getLong(3) == 1)
    assert(r(1).getLong(2) == 0)
    assert(r(1).getLong(3) == 0)
  }

  test("bloomDecontaminate: one-sided — every exact hit flagged, counts bounded") {
    val train = Seq(
      (1L, "the quick brown fox jumps over it"), // shares a 4-gram with bench
      (2L, "entirely different words appear in here"),
      (3L, "the quick brown fox naps all day")   // shares the same 4-gram
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "watch the quick brown fox run")
    ).toDF("doc_id", "text")
    val r = CorpusOps.bloomDecontaminate(train, bench, "doc_id", "text", n = 4)
      .orderBy("doc_id").collect()
    r.foreach { row =>
      val (nSh, nHits, flagged, exact) =
        (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
      assert(nHits <= nSh, "can't hit more shingles than the doc has")
      assert(flagged == (if (nHits > 0) 1L else 0L))
      // the Bloom invariant: membership never misses — exact ⊆ flagged
      assert(exact <= flagged, s"false negative on doc ${row.getLong(0)}")
    }
    // docs 1 and 3 truly share "the quick brown fox" with the benchmark
    assert(r(0).getLong(4) == 1 && r(0).getLong(3) == 1)
    assert(r(2).getLong(4) == 1 && r(2).getLong(3) == 1)
    // fixture-scale: the superset invariant holds corpus-wide
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val fix = CorpusOps.bloomDecontaminate(
      docs.filter(col("doc_id") % 10 =!= 0),
      docs.filter(col("doc_id") % 10 === 0),
      "doc_id", "text", 4)
    assert(fix.filter(col("exact_hit") > col("flagged")).count() == 0,
      "Bloom produced a false negative on the fixture")
  }

  test("exportShards: disjoint contiguous order ranges tile the stream") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ordered = CorpusOps.curriculumOrder(docs, "doc_id", "text", 4, 6)
    val out = java.nio.file.Files.createTempDirectory("graft_shards")
      .resolve("stream").toString
    val manifest = CorpusOps.exportShards(ordered, "order_idx", nShards = 5, out)
      .collect()
    val n = ordered.count()
    assert(manifest.map(_.getLong(1)).sum == n, "rows lost or duplicated")
    // ranges are disjoint, each internally contiguous, and tile 1..N
    val ranges = manifest.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(ranges.head._1 == 1L && ranges.last._2 == n)
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(lo2 == hi + 1, s"gap or overlap between shards at $hi/$lo2")
    }
    manifest.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) + 1 == r.getLong(1),
        s"shard ${r.getString(0)} range is not contiguous")
    }
    // within-shard row order replays the global order
    val back = spark.read.parquet(out)
    import org.apache.spark.sql.functions.{input_file_name, col => c}
    val firstShard = manifest.minBy(_.getLong(2)).getString(0)
    val rows = back.withColumn("f", input_file_name())
      .filter(c("f") === firstShard).select("order_idx").collect()
      .map(_.getLong(0))
    assert(rows.toSeq == rows.sorted.toSeq, "within-shard order lost")
  }

  test("corpusReport: hand-computed card on a constructed corpus") {
    val docs = Seq(
      (1L, "one two three", "s0", "en"),      // 3 tokens, 13 chars
      (2L, "one two three", "s0", "en"),      // exact dup of 1
      (3L, "vier funf", "s0", "de"),          // 2 tokens, 9 chars
      (4L, "uno", "s1", "es"),
      (5L, "dos tres", "s1", "es")
    ).toDF("doc_id", "text", "source", "lang")
    val r = CorpusOps.corpusReport(docs, "doc_id", "text", "source", "lang")
      .orderBy("source").collect()
    val s0 = r(0)
    assert(s0.getString(0) == "s0")
    assert(s0.getLong(s0.fieldIndex("n_docs")) == 3L)
    assert(s0.getLong(s0.fieldIndex("n_tokens")) == 8L)
    assert(s0.getLong(s0.fieldIndex("n_chars")) == 35L)
    assert(s0.getLong(s0.fieldIndex("n_exact_dup_docs")) == 1L)
    assert(s0.getLong(s0.fieldIndex("n_langs")) == 2L)
    assert(s0.getString(s0.fieldIndex("modal_lang")) == "en")
    assert(s0.getLong(s0.fieldIndex("avg_doc_tokens")) == 2L)  // 8 div 3
    assert(s0.getLong(s0.fieldIndex("avg_token_len")) == 4L)   // 35 div 8
    val s1 = r(1)
    assert(s1.getLong(s1.fieldIndex("n_docs")) == 2L)
    assert(s1.getLong(s1.fieldIndex("n_exact_dup_docs")) == 0L)
    assert(s1.getString(s1.fieldIndex("modal_lang")) == "es")
  }

  test("kmvSetOps: small and empty sides degrade to exact counts") {
    val a = Seq((1L, "alpha beta gamma delta"), (2L, "beta gamma delta epsilon"))
      .toDF("doc_id", "text")
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // small sides: sketches ARE the vocabularies -> estimators exact
    val r = CorpusOps.kmvSetOps(a, a, "text", n = 3, k = 200).collect().head
    def g(n: String) = r.getLong(r.fieldIndex(n))
    assert(g("est_a") == g("exact_union") && g("est_b") == g("exact_union"))
    assert(g("est_union") == g("exact_union"))
    assert(g("est_intersect") == g("exact_intersect"),
      "identical sides must intersect exactly in the sub-k regime")
    // an empty side: zero estimates, union = the other side, rho 0
    val e = CorpusOps.kmvSetOps(a, empty, "text", n = 3, k = 200)
      .collect().head
    def ge(n: String) = e.getLong(e.fieldIndex(n))
    assert(ge("est_b") == 0L && ge("exact_intersect") == 0L && ge("rho") == 0L)
    assert(ge("est_union") == ge("exact_union") && ge("est_intersect") == 0L)
  }

  test("idMix: full-width — no input period, hi lane counted, exact replay") {
    // The r9 defect: the old `id mod 1000003` pre-fold gave any two ids
    // congruent mod 1,000,003 IDENTICAL hashes, so every sampling /
    // split / cap decision correlated across ~10^3 hash-twins per doc
    // at 10^9-row scale. The idMix replacement must hash such pairs
    // independently.
    val ids = spark.range(0, 10000).toDF("doc_id")
    val both = ids.select(
      CorpusOps.idMix(col("doc_id")).as("h"),
      CorpusOps.idMix(col("doc_id") + 1000003L).as("h2"),
      CorpusOps.sampleBucket(col("doc_id")).as("b"),
      CorpusOps.sampleBucket(col("doc_id") + 1000003L).as("b2"))
    assert(both.filter(col("h") === col("h2")).count() == 0,
      "ids 1,000,003 apart must not share the full hash")
    val shared = both.filter(col("b") === col("b2")).count()
    assert(shared < 300, // chance rate is ~1% of 10k; old fold was 100%
      s"bucket collisions for ids 1,000,003 apart should be chance-level, got $shared")
    // the hi 32-bit lane participates: id and id + 2^32 hash apart
    val hiPair = ids.limit(1000).select(
      CorpusOps.idMix(col("doc_id")).as("h"),
      CorpusOps.idMix(col("doc_id") + 4294967296L).as("h2"))
    assert(hiPair.filter(col("h") === col("h2")).count() == 0,
      "bit 32 of the id must change the hash")
    // scalar replay (the spec-side arithmetic every hash spec uses)
    // matches the Column implementation bit for bit, incl. wide ids
    def h(id: Long) = {
      val s0 = (id & 4294967295L) ^ 123456789L
      val h1 = ((s0 ^ (s0 >>> 16)) * 73244475L) & 4294967295L
      val h2 = h1 ^ ((id >> 32) & 4294967295L)
      val h3 = ((h2 ^ (h2 >>> 16)) * 73244475L) & 4294967295L
      h3 ^ (h3 >>> 16)
    }
    val wide = Seq(0L, 1L, 1000003L, 4294967296L, 4294967297L,
      12345678901234L, Long.MaxValue)
    val got = wide.toDF("id").select(col("id"), CorpusOps.idMix(col("id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    wide.foreach(i => assert(got(i) == h(i), s"id $i: ${got(i)} != ${h(i)}"))
    // range stays [0, 2^32) — thresholds and bucketBits math rely on it
    assert(both.filter(col("h") < 0 || col("h") >= 4294967296L).count() == 0)
  }

  test("stratifiedSample: deterministic, rate-bounded, stratum-aware") {
    val docs = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang")
    val rates = Map("en" -> 30, "fr" -> 100)
    val s1 = CorpusOps.stratifiedSample(docs, "doc_id", "lang", rates)
    val s2 = CorpusOps.stratifiedSample(docs, "doc_id", "lang", rates)
    // deterministic: identical row sets across runs
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    // every fr row kept (rate 100); en rows filtered by bucket < 30
    assert(s1.filter($"lang" === "fr").count() == 500)
    val en = s1.filter($"lang" === "en")
    assert(en.filter($"strat_bucket" >= 30).count() == 0)
    // the hash actually thins the stratum (uniform-ish, not degenerate)
    assert(en.count() > 50 && en.count() < 450)
    // rate 0 removes the stratum entirely
    assert(CorpusOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0, "fr" -> 0)).count() == 0)
  }

  test("packSequences: contiguous offsets and budget-aligned chunks per shard") {
    val docs = (1L to 40L).map(i => (i, ("w " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val packed = CorpusOps.packSequences(docs, "doc_id", "text",
      budget = 10, shards = 4).orderBy("shard", "doc_id").collect()
    packed.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        val (nTok, seqNo, seqOff) = (r.getLong(2), r.getLong(3), r.getLong(4))
        assert(seqNo == cum / 10, s"seq_no mismatch at doc ${r.getLong(0)}")
        assert(seqOff == cum % 10, s"seq_offset mismatch at doc ${r.getLong(0)}")
        cum += nTok
      }
    }
    // shard assignment is doc_id % shards
    assert(packed.forall(r => r.getLong(1) == r.getLong(0) % 4))
  }

  test("ivfTopKAuto sizes the index as max(minNlist, floor(sqrt(n))) " +
      "and searches the Lloyd-trained quantizer") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val n = emb.count()
    val expectNlist = math.max(16, math.floor(math.sqrt(n.toDouble)).toInt)
    val v = Similarity.withNorm(emb, "vec_id", "embedding")
    val c = Similarity.trainedCentroids(v, 16)
    // cluster ids descend from the adaptive-ladder seeds (the
    // expectNlist smallest ids); training may only drop empty ones
    val nc = c.count()
    assert(nc <= expectNlist && nc > expectNlist / 2,
      s"trained quantizer size $nc vs ladder $expectNlist")
    assert(c.filter(col("cid") >= expectNlist).count() == 0,
      "every trained cid must be a ladder seed id")
    // auto ≡ the shared search body over that trained quantizer
    val auto = Similarity.ivfTopKAuto(emb, "vec_id", "embedding", k = 3)
    val explicit = Similarity.ivfSearch(v, c, k = 3, nprobe = 2)
    assert(auto.exceptAll(explicit).count() == 0 &&
      explicit.exceptAll(auto).count() == 0)
  }

  test("topNgrams: multiset counts, deterministic tie-break, short docs skipped") {
    val docs = Seq(
      (1L, "a b a b"),   // bigrams: "a b", "b a", "a b"
      (2L, "a b c"),     // bigrams: "a b", "b c"
      (3L, "solo")       // too short for bigrams
    ).toDF("doc_id", "text")
    val top = CorpusOps.topNgrams(docs, "text", n = 2, k = 3).collect()
    assert(top.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a b", 3L), ("b a", 1L), ("b c", 1L))) // ties b a / b c break by gram asc
  }

  test("chunkDocs: overlapping windows, short tail, single-token doc") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // 10 tokens
      (2L, "only")
    ).toDF("doc_id", "text")
    // chunk=4, stride=3 -> doc 1 starts at 0,3,6,9
    val c = CorpusOps.chunkDocs(docs, "doc_id", "text", chunk = 4, stride = 3)
      .orderBy("doc_id", "chunk_no").collect()
    val d1 = c.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getLong(2)).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(d1.map(_.getString(3)).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10", "w10"))
    assert(d1.map(_.getLong(4)).toSeq == Seq(4L, 4L, 4L, 1L))
    val d2 = c.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getString(3) == "only" && d2(0).getLong(4) == 1L)
  }

  test("connectedComponents: chain, separate component, min-id labels") {
    import graft.operators.Dedup
    // chain 1-2-3-4 (diameter forces multiple propagation rounds) and
    // an isolated pair 10-11
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(edges, "id_a", "id_b")
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(cc.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (10L, 10L), (11L, 10L)))
  }

  test("connectedComponents: long chain needs >1 round and still converges") {
    import graft.operators.Dedup
    val n = 33
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(edges, "id_a", "id_b").collect()
    assert(cc.length == n && cc.forall(_.getLong(1) == 1L))
  }

  test("connectedComponents: randomized differential vs driver union-find") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(0xC0FFEE)
    for (trial <- 1 to 3) {
      val nNodes = 60 + rnd.nextInt(40)
      val nEdges = 40 + rnd.nextInt(80)
      val edges = Seq.fill(nEdges) {
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong)
      }.filter { case (a, b) => a != b }
      // driver-side union-find oracle
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = parent.keys.map(v => v -> find(v)).toMap
      // min-rooted union-find: find(v) is each component's min id,
      // matching the operator's min-label fixed point
      val got = Dedup.connectedComponents(
          edges.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"trial $trial: mismatch")
    }
  }

  test("spanDupStats: planted duplicate spans, tail spans, within-doc dups") {
    // k = 2 spans: doc1 = ["a b", "c d"], doc2 = ["a b", "x y"],
    // doc3 = ["p q", "p q", "z"] (within-doc dup + short tail),
    // doc4 = ["solo"] (tail-only, unique)
    val docs = Seq(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "p q p q z"),
      (4L, "solo")
    ).toDF("doc_id", "text")
    val m = CorpusOps.spanDupStats(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
    assert(m.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 3L, 2L), (4L, 1L, 0L)))
    assert(m(2).getDouble(3) == 2.0 / 3.0)
  }

  test("spanDedupRewrite: canonical keeps, cross/within-doc drops, full-dup empties") {
    // Same span layout as the spanDupStats fixture plus doc5, whose
    // only span duplicates doc1's canonical "a b" and must empty out.
    val docs = Seq(
      (1L, "a b c d"),   // "a b"@0 canonical, "c d" unique
      (2L, "a b x y"),   // "a b"@0 loses to doc1, "x y" unique
      (3L, "p q p q z"), // within-doc dup: "p q"@1 loses to "p q"@0
      (4L, "solo"),      // tail-only unique doc survives verbatim
      (5L, "a b")        // fully duplicated -> zero kept, empty text
    ).toDF("doc_id", "text")
    val r = CorpusOps.spanDedupRewrite(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getString(3)))
    assert(r.toSeq == Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "x y"),
      (3L, 3L, 2L, "p q z"),
      (4L, 1L, 1L, "solo"),
      (5L, 1L, 0L, "")))
  }

  test("spanDedupRewrite: corpus-wide kept count equals distinct span count") {
    // Every distinct span text keeps exactly one occurrence (its
    // canonical if duplicated, itself if unique), so sum(n_kept) must
    // equal the number of distinct span texts — checked on a random
    // corpus with heavy planted repetition.
    val rnd = new scala.util.Random(7)
    val docs = (0L until 60L).map { i =>
      val words = (0 until 6 + rnd.nextInt(10))
        .map(_ => s"w${rnd.nextInt(8)}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val k = 3
    val out = CorpusOps.spanDedupRewrite(docs, "doc_id", "text", k)
    val keptSum = out.agg(sum("n_kept")).collect()(0).getLong(0)
    val distinctSpans = CorpusOps.chunkDocs(docs, "doc_id", "text", k, k)
      .select("chunk_text").distinct().count()
    assert(keptSum == distinctSpans)
    // n_spans must account for every span of the input corpus
    val total = out.agg(sum("n_spans")).collect()(0).getLong(0)
    assert(total == CorpusOps.chunkDocs(docs, "doc_id", "text", k, k).count())
  }

  test("hashedLinearScore: differential vs driver-side PolyHash fold; both verdicts occur") {
    val rnd = new scala.util.Random(11)
    val docs = (0L until 80L).map { i =>
      val words = (0 until 3 + rnd.nextInt(12))
        .map(_ => s"tok${rnd.nextInt(40)}")
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val weights = (0 until 16).map(i => ((i.toLong * 2654435761L + 7L) % 11L) - 5L)
    val bias = 3L
    val got = CorpusOps.hashedLinearScore(docs, "doc_id", "text", weights, bias, 0L)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    // driver-side replica: the same PolyHash per token, mod-F bucket,
    // integer sum — any hashing/bucketing/order divergence fails here
    val expect = docs.collect().map { r =>
      val score = bias + r.getString(1).trim.split("\\s+").map { t =>
        val h = graft.functions.PolyHash.eval(t)
        weights((h % weights.length).toInt)
      }.sum
      r.getLong(0) -> ((score, score >= 0L))
    }.toMap
    assert(got == expect)
    assert(got.values.exists(_._2) && got.values.exists(!_._2),
      "fixture must produce both keep verdicts")
  }

  test("tfidfTopTerms: hand-computed scores, rank order, term tie-break") {
    // N = 3. df: a->3, b->2, z->1, q->1
    // doc1 "a a b":  a tf2 score 2*3/3=2.0, b tf1 score 1*3/2=1.5
    // doc2 "a b z":  z 1*3/1=3.0, b 1.5, a 1.0
    // doc3 "a q q":  q 2*3/1=6.0, a 1.0
    val docs = Seq(
      (1L, "a a b"), (2L, "a b z"), (3L, "a q q")
    ).toDF("doc_id", "text")
    val r = CorpusOps.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getString(2), x.getDouble(5)))
    assert(r.toSeq == Seq(
      (1L, 1L, "a", 2.0), (1L, 2L, "b", 1.5),
      (2L, 1L, "z", 3.0), (2L, 2L, "b", 1.5),
      (3L, 1L, "q", 6.0), (3L, 2L, "a", 1.0)))
  }

  test("mixtureSample: deterministic, clamped, weight-proportional, zero-weight drops") {
    val docs = (0L until 400L).map(i =>
      (i, s"s${i % 4}", s"text $i")).toDF("doc_id", "source", "text")
    // 100 docs/stratum; budget 120 at 60/30/10/0 percent:
    // s0 rate 0.72, s1 rate 0.36, s2 rate 0.12, s3 weightless -> 0
    val w = Map("s0" -> 0.6, "s1" -> 0.3, "s2" -> 0.1)
    val kept = CorpusOps.mixtureSample(docs, "doc_id", "source", w, 120L)
    val bySrc = kept.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("s3"), "zero-weight stratum must drop entirely")
    // deterministic hash -> exact expected counts (replayed in python),
    // each near its rate*n target (72 / 36 / 12)
    assert(bySrc == Map("s0" -> 77L, "s1" -> 29L, "s2" -> 12L), bySrc.toString)
    // saturation: weight*target >= n clamps to keep-all
    val all = CorpusOps.mixtureSample(docs, "doc_id", "source",
      Map("s0" -> 1.0), 500L)
    assert(all.count() == 100 && all.filter(col("source") =!= "s0").isEmpty)
    // re-running selects the identical rows (no RNG state)
    val ids1 = kept.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = CorpusOps.mixtureSample(docs, "doc_id", "source", w, 120L)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2)
  }

  test("unigramMeanProb: hand-computed mean corpus probability") {
    // corpus counts: a=2 b=2 c=1, total=5
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val r = CorpusOps.unigramMeanProb(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc1: n=3, hit = 2*cnt(a) + 1*cnt(b) = 6 -> 6/(3*5) = 0.4
    assert(r(0).getLong(1) == 3 && r(0).getLong(2) == 6)
    assert(r(0).getDouble(3) == 0.4)
    // doc2: n=2, hit = cnt(b) + cnt(c) = 3 -> 3/(2*5) = 0.3
    assert(r(1).getLong(1) == 2 && r(1).getLong(2) == 3)
    assert(r(1).getDouble(3) == 0.3)
  }

  test("bm25TopK: hand-computed scoring, ranking, and term matching") {
    // N=3, dl = 3/4/2, avgdl = 3; query term x: df=2, linear idf = 1.5
    val docs = Seq((1L, "x x y"), (2L, "x z z z"), (3L, "w w"))
      .toDF("doc_id", "text")
    val r = CorpusOps.bm25TopK(docs, "doc_id", "text",
        Seq(1L -> "x"), k1 = 1.2, b = 0.75, k = 10)
      .orderBy("rank").collect()
    assert(r.length == 2, "doc3 has no query terms and must not appear")
    // doc1: tf=2 -> 1.5 * 2*2.2/(2 + 1.2*(0.25 + 0.75*3/3)) = 2.0625
    assert(r(0).getLong(2) == 1L && r(0).getLong(3) == 1L)
    assert(math.abs(r(0).getDouble(4) - 2.0625) < 1e-5)
    // doc2: tf=1, dl=4 -> 1.5 * 2.2/(1 + 1.2*(0.25 + 1.0)) = 1.32
    assert(r(1).getLong(2) == 2L)
    assert(math.abs(r(1).getDouble(4) - 1.32) < 1e-5)
    // multi-term: every matched term contributes once per (query, doc)
    val multi = CorpusOps.bm25TopK(docs, "doc_id", "text",
        Seq(7L -> "x y"), k1 = 1.2, b = 0.75, k = 10)
      .orderBy("rank").collect()
    assert(multi.head.getLong(2) == 1L && multi.head.getLong(3) == 2L,
      "doc1 matches both x and y -> n_terms = 2 and top rank")
  }

  test("assignSplits: deterministic, consistent with shuffle_key, ~10/10/80") {
    val docs = (0L until 1000L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val s = CorpusOps.assignSplits(docs, "doc_id", valPct = 10, testPct = 10)
    val rows = s.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.length == 1000)
    // split is a pure function of the shuffle_key bucket
    assert(rows.forall { case (_, split, key) =>
      val b = key % 100
      (b < 10 && split == "val") || (b >= 10 && b < 20 && split == "test") ||
        (b >= 20 && split == "train")
    })
    // hash-uniform: each split lands near its target fraction
    val bymSplit = rows.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bymSplit("val") > 50 && bymSplit("val") < 150, bymSplit.toString)
    assert(bymSplit("test") > 50 && bymSplit("test") < 150, bymSplit.toString)
    assert(bymSplit("train") > 700 && bymSplit("train") < 900, bymSplit.toString)
    // identical across re-runs (pure id function, no RNG)
    val again = CorpusOps.assignSplits(docs, "doc_id", 10, 10).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("domainCap: keeps exactly cap docs per over-cap domain, hash-ordered") {
    val docs = ((0L until 10L).map(i => (i, "big")) ++
      Seq((100L, "small"), (101L, "small"))).toDF("doc_id", "source")
    val kept = CorpusOps.domainCap(docs, "doc_id", "source", cap = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byDomain = kept.groupBy(_._2)
    assert(byDomain("big").length == 4)
    assert(byDomain("small").map(_._1).sorted.toSeq == Seq(100L, 101L),
      "under-cap domains keep everything")
    // survivors are the 4 smallest by the deterministic idMix hash
    def h(id: Long) = {
      val s0 = (id & 4294967295L) ^ 123456789L
      val h1 = ((s0 ^ (s0 >>> 16)) * 73244475L) & 4294967295L
      val h2 = h1 ^ ((id >> 32) & 4294967295L)
      val h3 = ((h2 ^ (h2 >>> 16)) * 73244475L) & 4294967295L
      h3 ^ (h3 >>> 16)
    }
    val expect = (0L until 10L).sortBy(i => (h(i), i)).take(4).toSet
    assert(byDomain("big").map(_._1).toSet == expect)
    // ranks are 1..k in hash order
    assert(byDomain("big").sortBy(_._3).map(_._1).toSeq ==
      (0L until 10L).sortBy(i => (h(i), i)).take(4).toSeq)
  }

  test("bigramMeanProb: hand-computed add-one-smoothed bigram means") {
    // corpus: d1 'a b a b' -> bigrams {a b:2, b a:1}; d2 'a b c';
    // d3 'z' (no bigrams). vocab V = {a,b,c,z} = 4.
    // corpus c2: (a b)=3, (b a)=1, (b c)=1; heads: c1(a)=3, c1(b)=2.
    val docs = Seq((1L, "a b a b"), (2L, "a b c"), (3L, "z"))
      .toDF("doc_id", "text")
    val out = CorpusOps.bigramMeanProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val S = 1000000000L
    val pAB = (S * 4) / 7  // (c2(a b)+1)/(c1(a)+V) = 4/7
    val pBA = (S * 2) / 6  // 2/6
    val pBC = (S * 2) / 6  // 2/6
    assert(out(1L) == ((3L, 2 * pAB + pBA, (2 * pAB + pBA) / 3)))
    assert(out(2L) == ((2L, pAB + pBC, (pAB + pBC) / 2)))
    assert(out(3L) == ((0L, 0L, 0L)), "a 1-token doc surfaces with zero score")
  }

  test("rrfFuse: integer reciprocal-rank fusion of two hand rankings") {
    val ch1 = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val ch2 = Seq((1L, 11L, 1L), (1L, 10L, 2L), (1L, 13L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val out = CorpusOps.rrfFuse(Seq(ch1, ch2), kConst = 60, k = 10)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val S = 1000000000L
    def rr(r: Long) = S / (60L + r)
    // 10: 1/(60+1)+1/(60+2); 11: same sum; tie broken by doc_id;
    // 12 and 13 have one channel each, 12 wins the doc_id tie
    assert(out == Seq((1L, 10L, 2L), (2L, 11L, 2L), (3L, 12L, 1L), (4L, 13L, 1L)))
    val scores = CorpusOps.rrfFuse(Seq(ch1, ch2), 60, 10)
      .collect().map(r => r.getLong(2) -> r.getDouble(4)).toMap
    assert(scores(10L) == (rr(1) + rr(2)).toDouble / 1e9)
    assert(scores(12L) == rr(3).toDouble / 1e9)
  }

  test("sqrtTemperatureSample: hand-computed thresholds, heavy strata compress") {
    // 'big' has 400 docs -> rate = 2/sqrt(400) = 0.1;
    // 'small' has 3 -> rate = min(1, 2/sqrt(3)) = 1 (passes whole)
    val docs = ((0L until 400L).map(i => (i, "big")) ++
      Seq((1000L, "small"), (1001L, "small"), (1002L, "small")))
      .toDF("doc_id", "lang")
    val kept = CorpusOps.sqrtTemperatureSample(docs, "doc_id", "lang", 2.0)
      .select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val by = kept.groupBy(_._2)
    assert(by("small").length == 3, "under-threshold strata pass whole")
    // exact replay of the engine arithmetic decides membership
    def h(id: Long) = {
      val s0 = (id & 4294967295L) ^ 123456789L
      val h1 = ((s0 ^ (s0 >>> 16)) * 73244475L) & 4294967295L
      val h2 = h1 ^ ((id >> 32) & 4294967295L)
      val h3 = ((h2 ^ (h2 >>> 16)) * 73244475L) & 4294967295L
      h3 ^ (h3 >>> 16)
    }
    val thr = math.floor(math.min(1.0, 2.0 / math.sqrt(400.0)) * 4294967296.0).toLong
    val expect = (0L until 400L).filter(h(_) < thr).toSet
    assert(by("big").map(_._1).toSet == expect)
    // ~scale*sqrt(n) = ~40 docs survive the heavy stratum
    assert(by("big").length > 20 && by("big").length < 60, by("big").length.toString)
    // deterministic across re-runs
    val again = CorpusOps.sqrtTemperatureSample(docs, "doc_id", "lang", 2.0)
      .select("doc_id", "lang")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("prioritySample: exact priority replay, tau, and HT adjustment") {
    def h(id: Long) = {
      val s0 = (id & 4294967295L) ^ 123456789L
      val h1 = ((s0 ^ (s0 >>> 16)) * 73244475L) & 4294967295L
      val h2 = h1 ^ ((id >> 32) & 4294967295L)
      val h3 = ((h2 ^ (h2 >>> 16)) * 73244475L) & 4294967295L
      h3 ^ (h3 >>> 16)
    }
    // weights 1..300 over 300 ids; k=50
    val docs = (1L to 300L).map(i => (i, i)).toDF("doc_id", "w")
    val out = CorpusOps.prioritySample(docs, "doc_id", "w", 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 50)
    // reference replay: priority = (w<<32) div (h+1), top-50, tau = 51st
    val pri = (1L to 300L).map(i => (i, (i * 4294967296L) / (h(i) + 1L)))
    val sorted = pri.sortBy { case (id, q) => (-q, id) }
    val expectIds = sorted.take(50).map(_._1).toSet
    val tau = sorted(50)._2
    assert(out.map(_._1).toSet == expectIds)
    out.foreach { case (id, w, q, adj) =>
      assert(w == id)
      assert(q == (w * 4294967296L) / (h(id) + 1L))
      assert(adj == math.max(w, tau))
    }
    // HT estimator: sum of adjusted weights ~ total weight
    val total = (1L to 300L).sum.toDouble
    val est = out.map(_._4.toDouble).sum
    assert(math.abs(est - total) / total < 0.35, s"est $est vs $total")
  }

  test("prioritySample: exhaustive when corpus <= k (tau = 0)") {
    val docs = Seq((1L, 5L), (2L, 7L), (3L, 0L)).toDF("doc_id", "w")
    val out = CorpusOps.prioritySample(docs, "doc_id", "w", 10)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    // zero-weight rows are unsampleable; survivors keep raw weight
    assert(out.toSet == Set((1L, 5L), (2L, 7L)))
  }

  test("systematicPpsSample: exactly k copies, correct multiplicity on mega-weights") {
    // varied weights incl. one mega-weight owning >2/k of the line
    val docs = ((1L to 200L).map(i => (i, 1L + i % 7)) :+ (999L, 400L))
      .toDF("doc_id", "w")
    val out = CorpusOps.systematicPpsSample(docs, "doc_id", "w", k = 25)
      .collect()
    assert(out.map(_.getAs[Long]("n_copies")).sum == 25L,
      "systematic PPS must draw exactly k pointers")
    val mega = out.find(_.getLong(0) == 999L)
    assert(mega.isDefined && mega.get.getAs[Long]("n_copies") >= 2L,
      "a weight above 2·W/k must be drawn with multiplicity")
    assert(out.forall(r => r.getAs[Long]("pi_x1e6") <= 1000000L &&
      r.getAs[Long]("pi_x1e6") > 0L))
    // deterministic across re-runs
    val again = CorpusOps.systematicPpsSample(docs, "doc_id", "w", k = 25)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("n_copies"))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getAs[Long]("n_copies"))).toSet)
  }

  test("idMixLong is the exact scalar twin of the idMix column") {
    val ids = Seq(0L, 1L, 42L, 99L, 123456789L, 4294967296L,
      987654321012L, Long.MaxValue)
    val viaCol = ids.toDF("id")
      .select(CorpusOps.idMix(org.apache.spark.sql.functions.col("id")).as("m"))
      .collect().map(_.getLong(0)).toSeq
    assert(viaCol == ids.map(CorpusOps.idMixLong),
      "scalar and Column folds must agree bit-for-bit")
  }

  test("prioritySample: a weight >= 2^31 fails loudly, not silently") {
    val docs = Seq((1L, 5L), (2L, 1L << 31)).toDF("doc_id", "w")
    val ex = intercept[Exception] {
      CorpusOps.prioritySample(docs, "doc_id", "w", 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("overflows the priority")),
      s"expected the overflow guard, got: ${msgs(ex).mkString(" | ")}")
    // the boundary value 2^31 - 1 is fine
    val ok = CorpusOps.prioritySample(
      Seq((1L, (1L << 31) - 1)).toDF("doc_id", "w"), "doc_id", "w", 5)
      .collect()
    assert(ok.length == 1 && ok(0).getLong(1) == (1L << 31) - 1)
  }

  test("packingReport: hand-computed fill, padding, and crossings") {
    // one shard (ids all ≡ 0 mod 8): lengths 3,4,2,5 with budget 4
    // concat stream: [0,3) [3,7) [7,9) [9,14) → 14 tokens, 4 seqs,
    // pad 2; doc 8 (start 3, len 4) crosses 1; doc 24 (start 9,
    // len 5: offset 1) crosses into seq 3 → split+cross; doc 16
    // (start 7, len 2) crosses one boundary
    val docs = Seq((0L, "a b c"), (8L, "a b c d"), (16L, "a b"),
      (24L, "a b c d e")).toDF("doc_id", "text")
    val r = CorpusOps.packingReport(docs, "doc_id", "text", 4, 8)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6), x.getLong(7)))
    assert(r.length == 1)
    val (shard, nDocs, tot, nSeqs, pad, split, cross, fill) = r.head
    assert(shard == 0L && nDocs == 4L && tot == 14L && nSeqs == 4L)
    assert(pad == 2L)
    assert(split == 3L, s"split=$split") // docs 8, 16, 24 straddle
    assert(cross == 3L)
    assert(fill == 14L * 1000000L / 16L)
  }

  test("lengthBucketBatches: sorted runs beat id-order padding") {
    // single shard, batchSize 2: lengths 1,9,2,8 → sorted (1,2)(8,9)
    // pad = 1+0 + 1+0 = 2; id-order batches (1,9)(2,8) would pad 14
    val docs = Seq((0L, "a"), (8L, "a b c d e f g h i"),
      (16L, "a b"), (24L, "a b c d e f g h")).toDF("doc_id", "text")
    val r = CorpusOps.lengthBucketBatches(docs, "doc_id", "text", 2, 8)
      .collect().map(x => (x.getLong(0), x.getLong(3), x.getLong(4), x.getLong(5)))
      .sortBy(_._1)
    assert(r.map(_._2).toSeq == Seq(0L, 1L, 0L, 1L)) // batch_no by length
    assert(r.map(_._4).sum == 2L)
    // per-batch max is the batch's longest member
    val byBatch = r.groupBy(_._2)
    assert(byBatch(0L).map(_._3).toSet == Set(2L))
    assert(byBatch(1L).map(_._3).toSet == Set(9L))
  }

  test("scoreCalibrationReport: hand-computed quantile bins and rates") {
    // weights=[1] → every token hashes into the one bucket → score =
    // n_tokens; lengths 1..10, label = length > 5, 5 bins of 2
    val docs = (1 to 10).map(n =>
      (n.toLong, Seq.fill(n)("w").mkString(" "), n > 5))
      .toDF("doc_id", "text", "lab")
    val r = CorpusOps.scoreCalibrationReport(docs, "doc_id", "text",
        Seq(1L), col("lab"), bins = 5)
      .orderBy("bin")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5)))
    assert(r.toSeq == Seq(
      (0L, 2L, 0L, 1L, 2L, 0L),
      (1L, 2L, 0L, 3L, 4L, 0L),
      (2L, 2L, 1L, 5L, 6L, 500000L),
      (3L, 2L, 2L, 7L, 8L, 1000000L),
      (4L, 2L, 2L, 9L, 10L, 1000000L)))
  }

  test("scoreCalibrationReport: tied scores collapse to one bin") {
    val docs = (1L to 4L).map(i => (i, "a b c", i % 2 == 0))
      .toDF("doc_id", "text", "lab")
    val r = CorpusOps.scoreCalibrationReport(docs, "doc_id", "text",
        Seq(1L), col("lab"), bins = 2).collect()
    assert(r.length == 1)
    assert(r.head.getLong(0) == 1L) // the whole group lands in the last bin
    assert(r.head.getLong(1) == 4L && r.head.getLong(2) == 2L)
  }

  test("corpusDrift: hand-computed membership churn and vocab drift") {
    val prev = Seq(
      (1L, "a b c"), (2L, "d e f"), (3L, "g h i"))
      .toDF("doc_id", "text")
    val cur = Seq(
      (1L, "a b c"),        // unchanged
      (2L, "d e CHANGED"),  // changed
      (4L, "j k"))          // added; doc 3 removed
      .toDF("doc_id", "text")
    val m = CorpusOps.corpusDrift(prev, cur, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("docs_prev") == 3L && m("docs_cur") == 3L)
    assert(m("added") == 1L && m("removed") == 1L)
    assert(m("changed") == 1L && m("unchanged") == 1L)
    // vocab: prev {a..i} = 9; cur {a,b,c,d,e,CHANGED,j,k} = 8; shared
    // {a,b,c,d,e} = 5; jaccard = 5/12
    assert(m("vocab_prev") == 9L && m("vocab_cur") == 8L)
    assert(m("vocab_shared") == 5L)
    assert(m("vocab_jaccard_x1e6") == 5L * 1000000L / 12L)
  }

  test("contrastivePairs: tiers partition candidates; random partners replay") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Dedup.contrastivePairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val pos = out.filter(_._3 == "pos")
    val hard = out.filter(_._3 == "hard")
    val rnd = out.filter(_._3 == "random")
    assert(pos.nonEmpty && rnd.nonEmpty, "fixture has planted near-dups")
    // pos tier == minhashLsh verbatim (same parameters)
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pos.map(p => (p._1, p._2, p._5.get)).toSet == lsh)
    // labels/jaccard discipline
    assert(pos.forall(p => p._4 == 1L && p._5.get >= 0.5))
    assert(hard.forall(p => p._4 == 0L && p._5.get < 0.5))
    assert(rnd.forall(p => p._4 == 0L && p._5.isEmpty))
    // one random partner per distinct pos anchor, never the anchor
    val anchors = (pos.map(_._1) ++ pos.map(_._2)).toSet
    assert(rnd.map(_._1).toSet == anchors && rnd.length == anchors.size)
    assert(rnd.forall(p => p._1 != p._2))
    // partner replay: min id of the first non-empty bucket at or
    // cyclically after (idMix(anchor)+1) % 64
    def mix(k: Long) = {
      val s0 = (k & 4294967295L) ^ 123456789L
      val h1 = ((s0 ^ (s0 >>> 16)) * 73244475L) & 4294967295L
      val h2 = h1 ^ ((k >> 32) & 4294967295L)
      val h3 = ((h2 ^ (h2 >>> 16)) * 73244475L) & 4294967295L
      h3 ^ (h3 >>> 16)
    }
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val bmin = ids.groupBy(mix(_) % 64L).map { case (b, xs) => b -> xs.min }
    rnd.foreach { case (a, c, _, _, _) =>
      val target = (mix(a) + 1L) % 64L
      val expect = bmin.minBy { case (b, _) => (b - target + 64L) % 64L }._2
      assert(c == expect, s"anchor $a partner $c expect $expect")
    }
  }

  test("leakageSafeSplits: near-dup cluster members always share a split") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val splits = CorpusOps.leakageSafeSplits(docs, "doc_id", "text")
      .select("doc_id", "group_key", "split")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(splits.size == docs.count())
    // THE invariant: every near-dup pair shares a group key and split
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should contain planted near-dups")
    pairs.foreach { case (a, b) =>
      assert(splits(a) == splits(b),
        s"pair ($a, $b) straddles splits: ${splits(a)} vs ${splits(b)}")
    }
    // singletons key on their own id with the t31 bucket arithmetic
    val clustered = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    def bucket(k: Long) = {
      val s0 = (k & 4294967295L) ^ 123456789L
      val h1 = ((s0 ^ (s0 >>> 16)) * 73244475L) & 4294967295L
      val h2 = h1 ^ ((k >> 32) & 4294967295L)
      val h3 = ((h2 ^ (h2 >>> 16)) * 73244475L) & 4294967295L
      (h3 ^ (h3 >>> 16)) % 100L
    }
    splits.collect { case (id, (gk, sp)) if !clustered.contains(id) =>
      assert(gk == id)
      val b = bucket(gk)
      assert((b < 10 && sp == "val") || (b >= 10 && b < 20 && sp == "test") ||
        (b >= 20 && sp == "train"))
    }
    // all three splits materialize at this SF
    assert(splits.values.map(_._2).toSet == Set("val", "test", "train"))
  }

  test("rankingMetrics: hand-computed precision/recall/MRR against conjunctive truth") {
    val docs = Seq(
      (1L, "x y z extra words here"), // relevant to q1 (has x AND y)
      (2L, "x only document"),
      (3L, "y x another relevant doc"),
      (4L, "nothing matching at all"))
      .toDF("doc_id", "text")
    val qs = Seq(1L -> "x y")
    val truth = CorpusOps.conjunctiveRelevance(docs, "doc_id", "text", qs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth == Set((1L, 1L), (1L, 3L)), truth.toString)
    // a hand ranking: relevant doc 3 at rank 2, relevant doc 1 missed
    val ranking = Seq((1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 3L))
      .toDF("query_id", "doc_id", "rank")
    val m = CorpusOps.rankingMetrics(ranking,
        CorpusOps.conjunctiveRelevance(docs, "doc_id", "text", qs), k = 10)
      .collect().head
    assert(m.getLong(1) == 2L) // n_rel
    assert(m.getLong(2) == 1L) // hits (doc 3 only)
    assert(m.getLong(3) == 100000L)  // 1*1e6 div 10
    assert(m.getLong(4) == 500000L)  // 1*1e6 div 2
    assert(m.getLong(5) == 500000L)  // 1e6 div first_rel(2)
    assert(m.getDouble(7) == 0.5 && m.getDouble(8) == 0.5)
    // a query whose top-k holds no relevant doc zeroes out, not drops
    val empty = CorpusOps.rankingMetrics(
      Seq((9L, 4L, 1L)).toDF("query_id", "doc_id", "rank"),
      CorpusOps.conjunctiveRelevance(docs, "doc_id", "text", Seq(9L -> "x y")),
      k = 10).collect().head
    assert(empty.getLong(2) == 0L && empty.getLong(5) == 0L)
    assert(empty.getLong(1) == 2L, "truth size is ranking-independent")
  }

  test("evaluateBm25 equals composing the standalone operators row-for-row") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val qs = Seq(1L -> "spark window join", 2L -> "hash merge batch")
    val shared = CorpusOps.evaluateBm25(docs, "doc_id", "text", qs,
        k1 = 1.2, b = 0.75, k = 10)
      .orderBy("query_id").collect().toSeq
    val composed = CorpusOps.rankingMetrics(
        CorpusOps.bm25TopK(docs, "doc_id", "text", qs, 1.2, 0.75, 10),
        CorpusOps.conjunctiveRelevance(docs, "doc_id", "text", qs), 10)
      .orderBy("query_id").collect().toSeq
    assert(shared == composed, "shared-tf evaluation diverged from composition")
    assert(shared.nonEmpty)
  }

  test("rankingMetrics surfaces a query present only in the truth set") {
    val ranking = Seq((1L, 10L, 1L)).toDF("query_id", "doc_id", "rank")
    val truth = Seq((1L, 10L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "doc_id")
    val m = CorpusOps.rankingMetrics(ranking, truth, k = 10)
      .orderBy("query_id").collect()
    assert(m.length == 2, "truth-only query 2 must not vanish")
    val q2 = m(1)
    assert(q2.getLong(0) == 2L && q2.getLong(1) == 2L) // n_rel kept
    assert(q2.getLong(2) == 0L && q2.getLong(5) == 0L) // zeroed hits/mrr
  }

  test("hybridRetrievalTopK equals fusing the standalone channels row-for-row") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val qs = Seq(1L -> "spark window join", 2L -> "hash merge batch")
    val hybrid = CorpusOps.hybridRetrievalTopK(docs, "doc_id", "text", qs,
        k1 = 1.2, b = 0.75, k = 10, kConst = 60)
      .orderBy("query_id", "rank").collect().toSeq
    val fused = CorpusOps.rrfFuse(Seq(
        CorpusOps.bm25TopK(docs, "doc_id", "text", qs, 1.2, 0.75, 10),
        CorpusOps.tfidfTopK(docs, "doc_id", "text", qs, 10)), 60, 10)
      .orderBy("query_id", "rank").collect().toSeq
    assert(hybrid == fused, "shared-tf hybrid diverged from standalone channels")
    assert(hybrid.nonEmpty)
  }

  test("softDedupWeights: a chained near-dup cluster shares one id " +
      "and splits the unit weight; singletons weigh 1e6") {
    // a-b and b-c are near-dups (one token changed); a-c may fall
    // below threshold — the component closure must still cluster all
    // three. d is unrelated.
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base.replace("alpha", "alpha2")),
      (3L, base.replace("alpha", "alpha2").replace("kappa", "kappa2")),
      (4L, "one two three four five six seven eight nine ten"))
      .toDF("doc_id", "text")
    val r = CorpusOps.softDedupWeights(docs, "doc_id", "text",
        threshold = 0.4)
      .orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(r.toSeq == Seq(
      (1L, 1L, 3L, 333333L), (2L, 1L, 3L, 333333L),
      (3L, 1L, 3L, 333333L), (4L, 4L, 1L, 1000000L)))
    // mass conservation within fixed point: 3 * 333333 ~= 1e6 (floor)
    assert(r.filter(_._2 == 1L).map(_._4).sum == 999999L)
  }

  test("interleaveOrder: equals the naive single-partition replay; " +
      "stride keys realize proportional interleaving") {
    val docs = ((0 until 8).map(i => (i.toLong, "sA")) ++
      (100 until 104).map(i => (i.toLong, "sB")) ++
      Seq((200L, "sC"))).toDF("doc_id", "source")
    val r = CorpusOps.interleaveOrder(docs, "doc_id", "source")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    // naive replay: per-source (h, id) rank, stride key, one global
    // (key, h, id) row_number — the total order the two-phase
    // distributed ranking must realize exactly
    val hs = docs.select(col("doc_id"), CorpusOps.idMix(col("doc_id")).as("h"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val bySrc = Map("sA" -> (0L until 8L).toSeq,
      "sB" -> (100L until 104L).toSeq, "sC" -> Seq(200L))
    val keyedDocs = bySrc.toSeq.flatMap { case (s, ids) =>
      ids.sortBy(i => (hs(i), i)).zipWithIndex.map { case (id, idx) =>
        (id, s, idx + 1L, (idx.toLong * (1L << 20)) / ids.size)
      }
    }
    val expected = keyedDocs
      .sortBy { case (id, _, _, key) => (key, hs(id), id) }
      .zipWithIndex
      .map { case ((id, s, rn, key), i) => (id, s, rn, key, i + 1L) }
    assert(r.sortBy(_._5).toSeq == expected)
    // the singleton source keys to 0 and lands in the first tie group
    val posC = r.find(_._2 == "sC").get._5
    assert(posC <= bySrc.size.toLong + 1,
      s"singleton source should surface at the stream head, got $posC")
  }

  test("contaminationReport: hand-computed benchmark exposure " +
      "including a clean bench doc surfacing zeros") {
    val train = Seq((1L, "a b c x"), (2L, "z a b c d q"), (3L, "m n o"))
      .toDF("doc_id", "text")
    val bench = Seq((10L, "a b c d"), (20L, "p q r s"))
      .toDF("doc_id", "text")
    // bench 10 grams {a b c, b c d}: train 1 shares {a b c} (1),
    // train 2 shares both (2) -> 2 leaked grams, 2 docs, max 2.
    // bench 20 shares nothing -> all zeros, row survives.
    val r = CorpusOps.contaminationReport(train, bench, "doc_id", "text", 3)
      .orderBy("bench_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4)))
    assert(r.toSeq == Seq((10L, 2L, 2L, 2L, 2L), (20L, 2L, 0L, 0L, 0L)))
  }

  test("epochUpsample: full epochs, maxEpochs cap, fractional tail, " +
      "absent-source drop — all hand-computed") {
    // every doc has exactly 5 tokens -> each source's avail = 20
    def mk(src: String, base: Long) = (0 until 4).map(i =>
      (base + i, src, "tok a b c d"))
    val docs = (mk("sA", 0L) ++ mk("sB", 100L) ++ mk("sC", 200L) ++
      mk("sD", 300L)).toDF("doc_id", "source", "text")
    val out = CorpusOps.epochUpsample(docs, "doc_id", "text", "source",
      Map("sA" -> 65L, "sB" -> 500L, "sC" -> 10L), maxEpochs = 10)
    val rows = out.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getLong(2)))
    // sB: target 500 over avail 20 = 25 epochs, capped at 10 full,
    // rem forced to 0 -> exactly 4 docs x epochs 1..10
    val sB = rows.filter(_._2 == "sB")
    assert(sB.length == 40)
    assert(sB.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq == (1L to 10L)))
    // sA: 65 // 20 = 3 full epochs for every doc; rem 5 -> the
    // fractional epoch 4 keeps exactly the docs with idMix < 2^30
    // (floor(5/20 * 2^32))
    val sA = rows.filter(_._2 == "sA")
    assert(sA.count(_._3 <= 3L) == 12, "3 full epochs x 4 docs")
    val frac = sA.filter(_._3 == 4L).map(_._1).toSet
    val expectFrac = docs.filter(col("source") === "sA")
      .select(col("doc_id"), CorpusOps.idMix(col("doc_id")).as("h"))
      .collect().filter(_.getLong(1) < (1L << 30)).map(_.getLong(0)).toSet
    assert(frac == expectFrac)
    // sC: target 10 below one epoch -> zero full epochs, pure
    // fractional downsampling at threshold 2^31
    val sC = rows.filter(_._2 == "sC")
    assert(sC.forall(_._3 == 1L))
    val expectC = docs.filter(col("source") === "sC")
      .select(col("doc_id"), CorpusOps.idMix(col("doc_id")).as("h"))
      .collect().filter(_.getLong(1) < (1L << 31)).map(_.getLong(0)).toSet
    assert(sC.map(_._1).toSet == expectC)
    // sD has no target -> dropped entirely
    assert(!rows.exists(_._2 == "sD"))
    // deterministic: re-running yields the identical expansion
    val again = CorpusOps.epochUpsample(docs, "doc_id", "text", "source",
      Map("sA" -> 65L, "sB" -> 500L, "sC" -> 10L), maxEpochs = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.sorted.toSeq == again.sorted.toSeq)
  }

  test("bloomRegistryStats: fill grows monotonically with registered " +
      "content; fp replays fill squared") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val d = java.nio.file.Files.createTempDirectory("graft_bloomstats")
    val reg = d.resolve("reg").toString
    CorpusOps.buildBloomRegistry(docs.filter(col("doc_id") < 50),
      "text", reg, 4)
    val s1 = CorpusOps.bloomRegistryStats(spark, reg).collect().head
    CorpusOps.ingestBloomBatch(spark, reg,
      docs.filter(col("doc_id") >= 50 && col("doc_id") < 200), "text")
    val s2 = CorpusOps.bloomRegistryStats(spark, reg).collect().head
    for (s <- Seq(s1, s2)) {
      assert(s.getLong(3) > 0L && s.getLong(3) < 1000000L,
        s"fill out of range: $s")
      assert(s.getLong(4) == s.getLong(3) * s.getLong(3) / 1000000L,
        s"fp must replay fill^2: $s")
    }
    assert(s2.getLong(2) > s1.getLong(2) && s2.getLong(3) > s1.getLong(3),
      s"registering more content must raise fill: $s1 -> $s2")
  }

  test("langAgreement: a mislabeled document lands in its off-diagonal " +
      "cell; row ppm replays") {
    val docs = Seq(
      (1L, "the cat and the dog is that with", "en"),
      (2L, "el la de que y en los del", "en"), // Spanish text, tagged en
      (3L, "el la de que y en los del", "es"))
      .toDF("doc_id", "text", "lang")
    val got = CorpusOps.langAgreement(docs, "text", "lang")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    assert(got == Map(
      ("en", "en") -> ((1L, true, 500000L)),
      ("en", "es") -> ((1L, false, 500000L)),
      ("es", "es") -> ((1L, true, 1000000L))), s"got $got")
  }

  test("effectiveTokens: a duplicated source's effective budget halves; " +
      "an undeduplicated source keeps its full budget") {
    // source A: two identical 4-token docs (one survives); source B:
    // one unique 2-token doc (no cluster, survives untouched)
    val docs = Seq(
      (1L, "alpha beta gamma delta", "A"),
      (2L, "alpha beta gamma delta", "A"),
      (3L, "epsilon zeta", "B"))
      .toDF("doc_id", "text", "source")
    val canon = CorpusOps.canonicalSelect(docs, "doc_id", "text",
      n = 3, numPerms = 64, bands = 16, threshold = 0.5)
    val got = CorpusOps.effectiveTokens(docs, "doc_id", "text",
        "source", canon)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(got == Map(
      "A" -> ((2L, 8L, 1L, 4L, 500000L)),
      "B" -> ((1L, 2L, 1L, 2L, 1000000L))), s"got $got")
  }

  test("keynessTerms: a group-exclusive token outranks the shared " +
      "stopword head; exclusive lift replays the +1 smoothing") {
    // both sources share a dominant stopword; each has one exclusive
    // content token — raw counts would rank 'the' first everywhere,
    // keyness must rank the exclusive token first
    val docs = Seq(
      (1L, "the the the quark quark quark the the", "sA"),
      (2L, "the the the gluon gluon gluon the the", "sB"))
      .toDF("doc_id", "text", "source")
    val got = CorpusOps.keynessTerms(docs, "text", "source",
        minCount = 3L, k = 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val top = got.filter(_._2 == 1L).sortBy(_._1)
    assert(top.map(_._3).toSeq == Seq("quark", "gluon").sorted.reverse ||
      top.map(_._3).toSeq == Seq("quark", "gluon"),
      s"exclusive tokens must rank first, got ${top.toSeq}")
    // hand replay for sA/'quark': n_gw=3, n_g=8, n_tok=16, n_w=3 ->
    // lift = (3 * (16-8) * 1e6) div (8 * (3-3+1)) = 3_000_000
    val q = got.find(t => t._1 == "sA" && t._3 == "quark").get
    assert(q._6 == 3000000L, s"exclusive lift mismatch: $q")
    // 'the': n_gw=5, rest=5 -> lift = (5*8*1e6) div (8*(10-5+1)) < 1e6
    assert(got.filter(_._3 == "the").forall(_._6 < 1000000L))
    // rank <= k realizes as a WindowGroupLimit (pre-shuffle prune)
    val plan = CorpusOps.keynessTerms(docs, "text", "source")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"top-k lost its WindowGroupLimit pushdown:\n${plan.take(900)}")
  }

  test("bandIndexStats: dup_ppm rises monotonically with replayed " +
      "ingests and compaction resets it; the distinct set never moves") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val store = java.nio.file.Files.createTempDirectory("graft_bandgauge")
      .resolve("idx").toString
    Dedup.buildBandIndex(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", store)
    def gauge(): (Long, Long, Long) = {
      val r = Dedup.bandIndexStats(spark, store).collect().head
      (r.getAs[Long]("n_rows"), r.getAs[Long]("n_distinct"),
        r.getAs[Long]("dup_ppm"))
    }
    val (r0, d0, p0) = gauge()
    assert(r0 == d0 && p0 == 0L, s"fresh build must be dup-free: $r0 $d0 $p0")
    // replay the SAME batch twice: rows grow, the distinct set and the
    // admission semantics don't — dup_ppm is the compaction trigger
    val replay = docs.filter(col("doc_id") % 3 === 0)
    Dedup.ingestBandBatch(spark, store, replay, "doc_id", "text")
    val (r1, d1, p1) = gauge()
    assert(r1 > r0 && d1 == d0 && p1 > 0L, s"one replay: $r1 $d1 $p1")
    Dedup.ingestBandBatch(spark, store, replay, "doc_id", "text")
    val (r2, d2, p2) = gauge()
    assert(r2 > r1 && d2 == d0 && p2 > p1,
      s"dup_ppm must grow with each replay: $p1 -> $p2")
    Dedup.compactBandIndex(spark, store)
    val (r3, d3, p3) = gauge()
    assert(r3 == d0 && d3 == d0 && p3 == 0L,
      s"compaction must reclaim to the distinct set: $r3 $d3 $p3")
  }

  test("rebucketBandIndex: admission verdicts are identical across the " +
      "re-bucket; the gauge reflects the new layout") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val store = java.nio.file.Files.createTempDirectory("graft_rebucket")
      .resolve("idx").toString
    Dedup.buildBandIndex(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", store)
    // a replayed ingest pads rows so the re-bucket's distinct matters
    Dedup.ingestBandBatch(spark, store,
      docs.filter(col("doc_id") % 3 === 0), "doc_id", "text")
    val probe = docs.filter(col("doc_id") % 3 =!= 0)
    def search() = Dedup.searchBandIndex(spark, store, probe,
        "doc_id", "text")
      .orderBy("batch_id").collect().toSeq
    val before = search()
    Dedup.rebucketBandIndex(spark, store, newBuckets = 256)
    val stats = Dedup.bandIndexStats(spark, store).collect().head
    assert(stats.getAs[Long]("buckets") == 256L,
      s"meta must carry the new bucket count: $stats")
    assert(stats.getAs[Long]("dup_ppm") == 0L,
      s"re-bucket must distinct for free: $stats")
    assert(search() == before,
      "re-bucketing changed admission verdicts")
    // winnow twin: same contract on the fps store
    val wstore = java.nio.file.Files.createTempDirectory("graft_rebucketw")
      .resolve("idx").toString
    Dedup.buildWinnowIndex(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", wstore)
    def wsearch() = Dedup.searchWinnowIndex(spark, wstore, probe,
        "doc_id", "text")
      .orderBy("batch_id").collect().toSeq
    val wBefore = wsearch()
    Dedup.rebucketWinnowIndex(spark, wstore, newBuckets = 256)
    assert(Dedup.winnowIndexStats(spark, wstore)
      .collect().head.getAs[Long]("buckets") == 256L)
    assert(wsearch() == wBefore,
      "re-bucketing changed winnow admission verdicts")
  }

  test("bandIndexStatsSampled: sampled columns provably bound the " +
      "exact gauge; stride=1 degenerates to it; the read prunes " +
      "to the sampled bucket partitions") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val store = java.nio.file.Files.createTempDirectory("graft_bsample")
      .resolve("idx").toString
    Dedup.buildBandIndex(docs, "doc_id", "text", store)
    // replayed ingest so dup mass is non-zero on both gauges
    Dedup.ingestBandBatch(spark, store,
      docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
    val exact = Dedup.bandIndexStats(spark, store).collect().head
    val s = Dedup.bandIndexStatsSampled(spark, store, k = 16)
      .collect().head
    assert(s.getAs[Long]("stride") == 4L &&
      s.getAs[Long]("n_buckets_sampled") <= 16L)
    // one-sided contracts: sampled masses never exceed the store-wide
    assert(s.getAs[Long]("n_rows_sampled") <= exact.getAs[Long]("n_rows"))
    assert(s.getAs[Long]("n_distinct_sampled") <=
      exact.getAs[Long]("n_distinct"))
    assert(s.getAs[Long]("max_bucket_lb") <=
      exact.getAs[Long]("max_bucket"))
    assert(s.getAs[Long]("dup_rows_lb") <=
      exact.getAs[Long]("n_rows") - exact.getAs[Long]("n_distinct"))
    assert(s.getAs[Long]("dup_rows_lb") > 0L,
      "the replayed ingest must surface duplicate mass in the sample")
    // stride 1 (k >= buckets) = full coverage = the exact gauge
    val full = Dedup.bandIndexStatsSampled(spark, store, k = 64)
      .collect().head
    assert(full.getAs[Long]("stride") == 1L)
    assert(full.getAs[Long]("n_rows_sampled") == exact.getAs[Long]("n_rows"))
    assert(full.getAs[Long]("n_distinct_sampled") ==
      exact.getAs[Long]("n_distinct"))
    assert(full.getAs[Long]("max_bucket_lb") ==
      exact.getAs[Long]("max_bucket"))
    assert(full.getAs[Long]("est_rows") == exact.getAs[Long]("n_rows"))
    // the stride filter reaches the hive partition listing: the scan
    // must not read the unsampled bucket directories
    val plan = Dedup.bandIndexStatsSampled(spark, store, k = 16)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.contains("(bb"),
      s"bucket stride must prune partitions:\n${plan.take(1200)}")
  }

  test("winnowIndexStatsSampled: bounds vs the exact gauge; stride=1 " +
      "degenerates to it") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val store = java.nio.file.Files.createTempDirectory("graft_wsample")
      .resolve("idx").toString
    Dedup.buildWinnowIndex(docs, "doc_id", "text", store)
    Dedup.ingestWinnowBatch(spark, store,
      docs.filter(col("doc_id") % 7 === 0), "doc_id", "text")
    val exact = Dedup.winnowIndexStats(spark, store).collect().head
    val s = Dedup.winnowIndexStatsSampled(spark, store, k = 16)
      .collect().head
    assert(s.getAs[Long]("stride") == 4L)
    assert(s.getAs[Long]("n_rows_sampled") <= exact.getAs[Long]("n_rows"))
    assert(s.getAs[Long]("max_bucket_lb") <= exact.getAs[Long]("max_bucket"))
    assert(s.getAs[Long]("dup_rows_lb") <=
      exact.getAs[Long]("n_rows") - exact.getAs[Long]("n_distinct"))
    assert(s.getAs[Long]("dup_rows_lb") > 0L,
      "the replayed ingest must surface duplicate mass in the sample")
    val full = Dedup.winnowIndexStatsSampled(spark, store, k = 64)
      .collect().head
    assert(full.getAs[Long]("stride") == 1L)
    assert(full.getAs[Long]("n_rows_sampled") == exact.getAs[Long]("n_rows"))
    assert(full.getAs[Long]("max_bucket_lb") ==
      exact.getAs[Long]("max_bucket"))
  }

  test("refitQuantileMap: KS drift returns to zero post-refit; " +
      "boundary probes still calibrate to exactly 0 and 1e6") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val store = java.nio.file.Files.createTempDirectory("graft_qrefit")
      .resolve("map").toString
    CorpusOps.fitQuantileMap(docs, "n_chars", store)
    // the world moved: scores shifted +50 — the t164 gauge must see it
    val drifted = docs.select(col("doc_id"),
      (col("n_chars") + 50L).as("n_chars"))
    val ksBefore = CorpusOps.quantileMapDrift(spark, store, drifted,
      "n_chars").collect().head.getAs[Long]("ks_ppm")
    assert(ksBefore > 100000L,
      s"a +50 shift must register heavy KS drift, got $ksBefore")
    // remediation: refit against the current corpus (atomic swap)
    CorpusOps.refitQuantileMap(spark, store, drifted, "n_chars")
    val ksAfter = CorpusOps.quantileMapDrift(spark, store, drifted,
      "n_chars").collect().head.getAs[Long]("ks_ppm")
    assert(ksAfter == 0L, s"post-refit drift must be exactly 0: $ksAfter")
    // the refit store is a complete, well-formed CDF: below-everything
    // probes at 0 ppm, above-everything at exactly 1e6
    val probes = Seq((-1L, -5L), (-2L, 100000000L)).toDF("doc_id", "n_chars")
    val p = CorpusOps.percentileFromMap(spark, store, probes,
        "doc_id", "n_chars")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(p == Map(-1L -> 0L, -2L -> 1000000L), s"got $p")
    // the meta guard survives refit: a different score column raises
    val ex = intercept[Exception] {
      CorpusOps.refitQuantileMap(spark, store,
        docs.select(col("doc_id"), col("n_chars").as("other")), "other")
    }
    assert(ex.getMessage.contains("fitted on score column"))
  }

  test("mixtureBudgetCellsBy: derived divisor equals the enumerated " +
      "map on srcN sources; a non-srcN source fails loudly") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val byName = CorpusOps.mixtureBudgetCellsBy(docs, "text", "source",
        divisor = expr("CAST(SUBSTR(source, 4) AS BIGINT)") % 4 + 2)
      .orderBy("source", "bin").collect().toSeq
    val byMap = CorpusOps.mixtureBudgetCells(docs, "text", "source",
        divisors = (0 until 64).map(i => s"src$i" -> ((i % 4) + 2L)).toMap)
      .orderBy("source", "bin").collect().toSeq
    assert(byName.nonEmpty && byName == byMap,
      "derived-divisor cells must replay the enumerated map exactly")
    // a source outside the srcN universe must raise, never silently
    // drop out of the mixture (the closed-map inner-join hazard)
    val bad = docs.withColumn("source",
      when(col("doc_id") === 0L, lit("weird")).otherwise(col("source")))
    val ex = intercept[Exception] {
      CorpusOps.mixtureBudgetCellsBy(bad, "text", "source",
        divisor = expr("CAST(SUBSTR(source, 4) AS BIGINT)") % 4 + 2)
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(m => m.contains("divisor") ||
      m.contains("CAST") || m.contains("cast")),
      s"expected a loud divisor failure, got: ${messages(ex)}")
  }

  test("stripBoilerplateLines: distinct-doc census, normalization, " +
      "order-preserving reassembly, within-doc repeats kept") {
    val docs = Seq(
      // "COMMON" here and "common " in doc 2 normalize to the same
      // line -> census 2 distinct docs -> stripped from BOTH (raw
      // text removed, not the normalized form)
      (1L, "alpha\nCOMMON\nbeta"),
      (2L, "common \ngamma"),
      // the same line twice in ONE doc is 1 distinct doc -> kept
      (3L, "delta\ndelta"),
      // an empty text is one empty line, unique -> kept as ""
      (4L, "")).toDF("gid", "text")
    val got = CorpusOps.stripBoilerplateLines(docs, "gid", "text",
        minDocs = 2)
      .orderBy("gid")
      .select("gid", "n_lines", "n_kept", "kept_text", "stripped_ppm")
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getString(3), r.getLong(4)))
    assert(got == Seq(
      (1L, 3L, 2L, "alpha\nbeta", 333333L),
      (2L, 2L, 1L, "gamma", 500000L),
      (3L, 2L, 2L, "delta\ndelta", 0L),
      (4L, 1L, 1L, "", 0L)), got.toString)
    // minDocs = 1 would strip every line — reject the foot-gun
    intercept[IllegalArgumentException] {
      CorpusOps.stripBoilerplateLines(docs, "gid", "text", minDocs = 1)
    }
  }
}
