package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{CorpusOps, Dedup, Multimodal, Similarity}
import graft.functions.{Fnv64, PolyHash}

/** Operator-level tests for the training-data pipeline at sf0.001
  * (500 docs / 500 embeddings — fast, deterministic).
  */
class TrainingDataSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.session
  val dir = "/root/testdata/sf0.001"

  test("PolyHash matches its interpreted/codegen contract") {
    assert(PolyHash.eval("") == 0L)
    assert(PolyHash.eval("a") == 'a'.toLong)
    assert(PolyHash.eval("ab") == ('a'.toLong * 31 + 'b'.toLong) % 2147483647L)
  }

  test("Fnv64 is the standard FNV-1a") {
    // Known vector: fnv1a-64("a") = 0xaf63dc4c8601ec8c
    assert(Fnv64.eval("a".getBytes("UTF-8")) == 0xaf63dc4c8601ec8cL)
  }

  test("PolyHashArray and NGrams match their composable contracts") {
    import graft.functions.{NGrams, PolyHash, PolyHashArray, Spread64}
    // PolyHashArray == per-element PolyHash (and Spread64 thereof)
    val toks = Seq("the", "quick", "brown", "the")
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      toks.map(org.apache.spark.unsafe.types.UTF8String.fromString))
    val plain = PolyHashArray.compute(arr, spread = false)
    val spread = PolyHashArray.compute(arr, spread = true)
    toks.zipWithIndex.foreach { case (t, i) =>
      assert(plain.getLong(i) == PolyHash.eval(t))
      assert(spread.getLong(i) == Spread64.eval(PolyHash.eval(t)))
    }
    // NGrams: distinct trigrams in first-occurrence order; <n fallback
    val grams = NGrams.compute(arr, 3, distinct = true)
    assert((0 until grams.numElements()).map(grams.getUTF8String(_).toString) ==
      Seq("the quick brown", "quick brown the"))
    val short = NGrams.compute(arr, 5, distinct = true)
    assert(short.numElements() == 1 &&
      short.getUTF8String(0).toString == "the quick brown the")
    // duplicate grams collapse (distinct)
    val rep = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Seq("a", "b", "a", "b", "a", "b").map(
        org.apache.spark.unsafe.types.UTF8String.fromString))
    val repGrams = NGrams.compute(rep, 2, distinct = true)
    assert((0 until repGrams.numElements()).map(repGrams.getUTF8String(_).toString) ==
      Seq("a b", "b a"))
  }

  test("exact dedup keeps one row per distinct text") {
    val docs = Tables.documents(spark, dir)
    val deduped = Dedup.exact(docs, "doc_id", "text")
    val distinctTexts = docs.select("text").distinct().count()
    assert(deduped.count() == distinctTexts)
  }

  test("normalized dedup collapses case/punct/whitespace twins byte-exact keeps") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello world how are you"),
      (2L, "Hello,  World how are   you ."), // normalizes onto doc 1
      (3L, "HELLO WORLD HOW ARE YOU-"),      // '-' is outside the class -> distinct
      (4L, "something else entirely"))
      .toDF("doc_id", "text")
    // byte-exact sees four distinct texts
    assert(Dedup.exact(docs, "doc_id", "text").count() == 4)
    val kept = Dedup.normalizedExact(docs, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L), kept.toString)
    // the normalization itself, hand-checked
    val nt = docs.select(Dedup.normalizeText(
        org.apache.spark.sql.functions.col("text")).as("nt"))
      .collect().map(_.getString(0))
    assert(nt(1) == "hello world how are you")
    assert(nt(2) == "hello world how are you-")
  }

  test("minhash LSH recalls high-similarity jaccard pairs") {
    val docs = Tables.documents(spark, dir)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.7, 100000)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, 0.7)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall over ${exact.size} pairs")
    assert(lsh.subsetOf(exact), "LSH pairs are jaccard-verified, so no false positives")
  }

  test("simhash of identical texts is identical, near-dups are close") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "completely different words entirely unrelated text corpus")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs((1L, 2L)) == 0L)
    assert(pairs.get((1L, 3L)).exists(_ <= 16L))
    assert(!pairs.keySet.exists { case (a, b) => b == 4L || a == 4L })
  }

  test("simhash banding surfaces every pair within the Hamming bound") {
    import spark.implicits._
    // Planted fingerprints with Hamming distances 4-7 where the
    // differing bits are SPREAD ACROSS 16-bit chunks — the pairs a
    // 4-band × 16-bit banding can never surface (each old chunk
    // differs), but the maxHamming-derived banding must (pigeonhole:
    // bands >= maxHamming + 1).
    val base = 0x0123456789abcdefL
    def flip(bits: Int*): Long = bits.foldLeft(base)((v, b) => v ^ (1L << b))
    val fps = Seq(
      1L -> base,
      2L -> flip(0, 16, 32, 48),          // hamming 4, one bit per 16-bit chunk
      3L -> flip(1, 9, 17, 25, 33, 41),   // hamming 6, spread over 8-bit chunks' pairs
      4L -> flip(2, 10, 18, 26, 34, 42, 50), // hamming 7
      5L -> flip(0, 1, 2, 3, 4, 5, 6, 7, 8)  // hamming 9 — outside the bound
    ).toDF("id", "sim")
    val got = Dedup.simhashPairsFromFingerprints(fps, maxHamming = 7)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got((1L, 2L)) == 4L)
    assert(got((1L, 3L)) == 6L)
    assert(got((1L, 4L)) == 7L)
    assert(!got.contains((1L, 5L)), "hamming 9 exceeds maxHamming=7")
    assert(Dedup.simhashBands(7) == 8 && Dedup.simhashBands(15) == 16 &&
      Dedup.simhashBands(3) == 4 && Dedup.simhashBands(0) == 1)
  }

  test("simhash near-dups equal exact-jaccard ∩ hamming-bound (the contract)") {
    val docs = Tables.documents(spark, dir)
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.5, 100000)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fp = docs.select(org.apache.spark.sql.functions.col("doc_id"),
        Dedup.simhash64(org.apache.spark.sql.functions.col("text")).as("sim"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = exact.filter { case (a, b) =>
      java.lang.Long.bitCount(fp(a) ^ fp(b)) <= 3
    }
    val sim = Dedup.simhashNearDups(docs, "doc_id", "text", 3, 3, 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture should contain in-bound near-dups")
    assert(sim == expected,
      s"missed=${(expected -- sim).take(5)} extra=${(sim -- expected).take(5)}")
  }

  test("LSH near-dup pairs equal exact pairs restricted to shared buckets") {
    val emb = Tables.embeddings(spark, dir)
    val exact = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val buckets = emb.select(org.apache.spark.sql.functions.col("vec_id"),
        Similarity.lshBucket(org.apache.spark.sql.functions.col("embedding"), 8).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = exact.filter { case (a, b) => buckets(a) == buckets(b) }
    val lsh = Similarity.lshNearDupPairs(emb, "vec_id", "embedding", 0.3, 8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "fixture should contain bucket-sharing near-dups")
    assert(lsh == expected,
      s"missed=${(expected -- lsh).take(5)} extra=${(lsh -- expected).take(5)}")
    assert(lsh.subsetOf(exact), "verify step admits only true near-dups")
  }

  test("brute-force ANN: top-1 neighbor of a vector's twin is the twin") {
    val emb = Tables.embeddings(spark, dir)
    val topk = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 3)
    // cosine(v, v') where v' = v must rank first: duplicate a vector
    import org.apache.spark.sql.functions._
    val dup = emb.limit(1).withColumn("vec_id", lit(999999L))
    val got = Similarity.bruteForceTopK(emb.union(dup), "vec_id", "embedding", 1)
      .filter(col("vec_id") === 999999L).select("neighbor_id").collect()
    val origId = emb.limit(1).select("vec_id").collect()(0).getLong(0)
    assert(got.head.getLong(0) == origId)
    assert(topk.groupBy("vec_id").count().filter(col("count") =!= 3).count() == 0)
  }

  test("margin mining: mutual 1:1 matching, margin>1, planted twin wins") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val mined = graft.queries.TrainingData.embMarginPairs(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(mined.nonEmpty)
    // mutual-best is a partial 1:1 matching — no id repeats either side
    assert(mined.map(_._1).distinct.length == mined.length)
    assert(mined.map(_._2).distinct.length == mined.length)
    assert(mined.forall(_._4 > 1.0))
    val lab = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(mined.forall(p => lab(p._1) % 2 == 0 && lab(p._2) % 2 == 1))
    // planted cross-side twin: copy an even-label vector onto the odd
    // side — its exact cosine 1.0 dominates both neighborhoods, so the
    // twin pair must be mined (twin id -1 also wins any margin tie)
    val src = emb.filter(col("label") % 2 === 0).limit(1)
    val twin = src.withColumn("vec_id", lit(-1L)).withColumn("label", lit(1))
    val srcId = src.select("vec_id").collect()(0).getLong(0)
    val got = Similarity.marginMutualPairs(emb.union(twin), "vec_id",
        "embedding", col("label") % 2 === 0, k = 4)
      .filter(col("a_id") === srcId).collect()
    assert(got.length == 1 && got(0).getLong(1) == -1L)
    assert(got(0).getLong(2) == 1000000L)
  }

  test("SFT render: masks point at assistant content, turns conserve") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.TrainingData.eventsSftRender(spark, dir).collect()
    assert(rows.nonEmpty)
    val totalEvents = Tables.events(spark, dir).count()
    assert(rows.map(_.getLong(3)).sum == totalEvents) // n_turns conserve
    rows.foreach { r =>
      val rendered = r.getString(2)
      val mask = r.getString(5)
      val spans =
        if (mask.isEmpty) Array.empty[(Int, Int)]
        else mask.split(";").map { s =>
          val Array(a, b) = s.split("-"); (a.toInt, b.toInt)
        }
      assert(spans.length == r.getLong(4)) // n_loss_turns
      assert(spans.map(p => p._2 - p._1).sum == r.getLong(6)) // loss_chars
      spans.foreach { case (s, e) =>
        // every span is bracketed by the assistant role tag and <|end|>
        assert(rendered.substring(s - 13, s) == "<|assistant|>")
        assert(rendered.substring(e, e + 7) == "<|end|>")
        assert(!rendered.substring(s, e).contains("|"))
      }
    }
  }

  test("preference pairs: disjoint sides, positive gap, capped per group") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.TrainingData.docPreferencePairs(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(7) == r.getLong(5) - r.getLong(6)) // gap = chosen - rejected
      assert(r.getLong(7) >= 1L)                          // gap >= minGap
      assert(r.getLong(3) != r.getLong(4))                // chosen != rejected
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 8)
    }
    // within a group no document appears twice (any side)
    rows.groupBy(r => (r.getString(0), r.getString(1))).foreach {
      case (_, g) =>
        val ids = g.flatMap(r => Seq(r.getLong(3), r.getLong(4)))
        assert(ids.distinct.length == ids.length)
    }
  }

  test("fertility report: ppm ratios replay from the group sums") {
    val rows = graft.queries.TrainingData.docTokenizerFertility(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (words, bpe, chars) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(r.getLong(6) == bpe * 1000000L / math.max(words, 1L))
      assert(r.getLong(7) == chars * 1000000L / math.max(bpe, 1L))
      // the BPE pre-tokenizer never splits below characters: tokens
      // bounded by chars, and merges only shrink word-piece counts
      assert(bpe <= chars && bpe >= words)
    }
  }

  test("score percentiles: 0..1e6 per source, monotone in score, ties shared") {
    val rows = graft.queries.TrainingData.docScorePercentiles(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._4).min == 0L)
      // the top percentile is 1e6 exactly when the max score is untied
      // (a tied top shares the tie-group's first rank, below n)
      val topScore = g.map(_._3).max
      if (g.count(_._3 == topScore) == 1 && g.length > 1)
        assert(g.map(_._4).max == 1000000L)
      else assert(g.map(_._4).max <= 1000000L)
      val byScore = g.sortBy(x => (x._3, x._2))
      byScore.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._4 <= b._4)
          if (a._3 == b._3) assert(a._4 == b._4) // ties share the pctl
        case _ =>
      }
    }
  }

  test("trigram backoff: planted docs hit the tri/bi/uni/OOV ladder rungs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = Seq(
      (1L, "alpha beta gamma", "en"),      // reference: defines the model
      (2L, "alpha beta gamma", "xx"),      // seen trigram -> full prob 1.0
      (3L, "delta beta gamma", "xx"),      // unseen tri, seen bigram "beta gamma"
      (4L, "zz qq alpha", "xx"),           // only unigram "alpha" seen
      (5L, "zz qq pp", "xx"))              // fully OOV -> score 0
      .toDF("doc_id", "text", "lang")
    val got = operators.CorpusOps.trigramBackoffScore(base, "doc_id", "text",
        col("lang") === "en")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val S = 1000000000L
    assert(got(2) == S)                      // c3=1, c12=1
    assert(got(3) == 2 * S * 1 / (5 * 1))    // alpha=0.4 rung: c23=1, c(beta)=1
    // doc 4: one trigram "zz qq alpha", only w3=alpha in vocab:
    // 4e9 * c(alpha) / (25 * N) with N=3 reference tokens
    assert(got(4) == 4 * S * 1 / (25 * 3))
    assert(got(5) == 0L)
  }

  test("gopher rules: keep is the rule conjunction and discriminates") {
    val rows = graft.queries.TrainingData.docGopherRules(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rules = (6 to 10).map(r.getBoolean)
      assert(r.getBoolean(11) == rules.forall(identity))
    }
    val kept = rows.count(_.getBoolean(11))
    assert(kept > 0 && kept < rows.length, "gate is degenerate on the fixture")
  }

  test("exact decontam: planted canary is flagged, clean synthetic is not") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val bench = docs.filter(col("doc_id") % 10 === 0)
    // canary: a bench doc's first 8 words verbatim inside new text
    val probe = bench.select(concat_ws(" ",
        slice(split(trim(col("text")), "\\s+"), 1, 8)).as("p"))
      .limit(1).collect()(0).getString(0)
    val planted = Seq(
      (-1L, s"prefix words then $probe and a suffix"),
      (-2L, "completely novel synthetic words qqq www eee rrr"))
      .toDF("doc_id", "text")
    val got = operators.CorpusOps.exactPhraseDecontaminate(
        planted, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got(-1L) && !got(-2L))
  }

  test("semantic clusters: planted twins co-cluster, ids are min members") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    // plant an exact twin of vector 0 — each is the other's top-1,
    // so the mutual edge exists and they must share a cluster
    val twin = emb.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(-1L))
    val got = Similarity.mutualKnnClusters(emb.union(twin), "vec_id",
        "embedding", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byId = got.map(t => t._1 -> t._2).toMap
    assert(byId(-1L) == byId(0L))
    assert(byId(-1L) == -1L) // cluster id is the min member id
    // sizes are consistent with the labeling
    got.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).distinct.sameElements(Array(members.length.toLong)))
    }
  }

  test("edit-distance tier: verdict replays from dist/len, both classes occur") {
    val rows = graft.queries.TrainingData.docEditDistanceDedup(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1)) // id_a < id_b
      assert(r.getBoolean(4) ==
        (r.getLong(2) * 100L <= r.getLong(3) * 5L))
    }
    assert(rows.exists(_.getBoolean(4)) && rows.exists(!_.getBoolean(4)),
      "verdict is degenerate on the fixture")
    // planted exact twins collide in every band and verify at dist 0
    import spark.implicits._
    val planted = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again today"),
      (2L, "the quick brown fox jumps over the lazy dog again today"),
      (3L, "completely different words that share no shingles at all here"))
      .toDF("doc_id", "text")
    val twin = operators.Dedup.editDistanceDedup(planted, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(4)))
    assert(twin.contains((1L, 2L, 0L, true)))
  }

  test("containment: planted short-in-long quote is caught one-way") {
    import spark.implicits._
    // doc 2 = doc 1's text embedded in a much longer document: the
    // short side's shingles are all shared -> a_in_b, while the long
    // side is NOT contained in the short one
    // the quote must dominate the long side's shingle set for a
    // MinHash band to agree (shared fraction 18/25 per permutation)
    val short = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi rho sigma tau upsilon"
    val long = s"$short extra filler words appended at the end now"
    val planted = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
    val got = operators.Dedup.containmentPairs(planted, "doc_id", "text")
      .collect()
    assert(got.length == 1)
    val r = got(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getBoolean(7) && !r.getBoolean(8)) // a_in_b, not b_in_a
    // fixture near-dups also surface
    assert(graft.queries.TrainingData.docContainmentPairs(spark, dir)
      .count() > 0)
  }

  test("source divergence: hand-computed L1, zero for identical sources") {
    import spark.implicits._
    val tiny = Seq(("a", "x x y"), ("b", "x z"), ("c", "x x y"))
      .toDF("source", "text")
    val got = operators.CorpusOps.sourceDivergence(tiny, "text", "source")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    // a: x=666666, y=333333 (mass 999999); b: x=500000, z=500000
    assert(got(("a", "b")) == (1L, 166666L + 333333L + 500000L))
    assert(got(("a", "c"))._2 == 0L) // identical distributions
    assert(got(("b", "c"))._2 == got(("a", "b"))._2)
  }

  test("hamilton eval set: allocations sum to budget, each within one seat") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.TrainingData.docHamiltonEvalSet(spark, dir)
      .collect()
    assert(rows.length == 200) // exactly the budget, realized as rows
    val byStratum = rows.groupBy(_.getString(1))
    val total = Tables.documents(spark, dir).count()
    byStratum.foreach { case (_, g) =>
      val alloc = g.head.getLong(3)
      assert(g.length == alloc.toInt) // selection realizes the quota
      // Hamilton: alloc is the floor or ceil of the exact quota
      val exact = g.head.getLong(4).toDouble * 200.0 / total
      assert(alloc >= math.floor(exact) && alloc <= math.ceil(exact))
    }
  }

  test("span corruption: sentinel round-trip reconstructs the original text") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val orig = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq)
      .toMap
    val rows = graft.queries.TrainingData.docSpanCorruption(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.exists(_.getLong(3) > 0), "mask rate produced no spans")
    rows.foreach { r =>
      val (id, input, target) = (r.getLong(0), r.getString(1), r.getString(2))
      // parse target spans: "<extra_id_k> tok tok <extra_id_k+1> ..."
      val spans = scala.collection.mutable.Map[Int, Seq[String]]()
      var cur = -1
      target.split(" ").filter(_.nonEmpty).foreach { t =>
        if (t.startsWith("<extra_id_")) {
          cur = t.stripPrefix("<extra_id_").stripSuffix(">").toInt
          spans(cur) = Seq.empty
        } else spans(cur) = spans(cur) :+ t
      }
      // substitute sentinels back in: must equal the original tokens
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap { t =>
        if (t.startsWith("<extra_id_"))
          spans(t.stripPrefix("<extra_id_").stripSuffix(">").toInt)
        else Seq(t)
      }.toSeq
      assert(rebuilt == orig(id), s"round-trip failed for doc $id")
      assert(r.getLong(3) == spans.size) // n_spans
      assert(r.getLong(4) == spans.values.map(_.length).sum) // n_masked
    }
  }

  test("segment pairs: positives are true successors, negatives cross-doc") {
    val rows = graft.queries.TrainingData.docSegmentPairs(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
    assert(rows.exists(_._5) && rows.exists(!_._5))
    rows.foreach {
      case (d, s, pd, ps, true) => assert(pd == d && ps == s + 1)
      case (d, _, pd, _, false) => assert(pd != d)
    }
    // one pair per anchor
    val anchors = rows.map(r => (r._1, r._2))
    assert(anchors.distinct.length == anchors.length)
  }

  test("pit features: strictly-earlier frames — first event sees nothing") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.TrainingData.eventsPitFeatures(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    // replay per user: walk events in time order and accumulate
    val byUser = rows.groupBy(_.getLong(1))
    byUser.foreach { case (_, evs) =>
      val ordered = evs.sortBy(r => (r.getLong(2), r.getLong(0)))
      ordered.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(3) == i.toLong) // n_prior = position
        if (i == 0) {
          assert(r.getLong(4) == 0L && r.getLong(5) == 0L && r.isNullAt(6))
        } else {
          assert(r.getLong(2) - ordered(i - 1).getLong(2) == r.getLong(6))
          // prior target count is monotone non-decreasing
          assert(r.getLong(4) >= ordered(i - 1).getLong(4))
        }
      }
    }
  }

  test("next-event pairs: positive is the true successor, negative differs") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.TrainingData.eventsNextPairs(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(4) != r.getString(3)) // neg != positive
    }
    // replay the positives: next_type equals the successor in time order
    val evs = Tables.eventsNanos(spark, dir)
      .select(col("user_id"), expr("ts div 1000").as("tsu"),
        col("event_id"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val succ = evs.groupBy(_._1).flatMap { case (_, g) =>
      g.sortBy(e => (e._2, e._3)).sliding(2).collect {
        case Array(a, b) => a._3 -> b._4
      }
    }.toMap
    rows.foreach { r =>
      assert(succ(r.getLong(0)) == r.getString(3))
    }
    assert(rows.length == succ.size) // every event with a successor pairs
  }

  test("coverage curve: monotone, nested, saturating at 100%") {
    val rows = graft.queries.TrainingData.docCoverageCurve(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to 10).map(_ * 10L))
    // nested hash samples: coverage never decreases with the fraction
    rows.sliding(2).foreach {
      case Array(a, b) => assert(a._2 <= b._2 && a._3 <= b._3)
      case _ =>
    }
    assert(rows.last._3 == 1000000L) // the full corpus covers itself
    assert(rows.head._2 > 0L)
  }

  test("group k-fold: clusters move wholesale, all folds populated") {
    val rows = graft.queries.TrainingData.docGroupKFold(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).distinct.sorted.sameElements(Array(0L, 1L, 2L, 3L, 4L)))
    // every group's members share one fold — the grouped-CV contract
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).distinct.length == 1)
    }
    // folds agree with t78's group keys (same shared components)
    val splits = graft.queries.TrainingData.docLeakageSafeSplits(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, gk, _) => assert(splits(id) == gk) }
  }

  test("funnel: monotone drop-off, window binds, planted path converts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = graft.queries.TrainingData.eventsFunnel(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sortBy(_._1)
    // reach can only shrink down the funnel, and the window bites
    assert(rows(0)._2 >= rows(1)._2 && rows(1)._2 >= rows(2)._2)
    assert(rows(1)._2 < rows(0)._2, "the 24h window must exclude someone")
    // planted micro-log: u1 completes in order, u2 views BEFORE signup
    // (must not count), u3 signs up only
    val log = Seq(
      (1L, 100L, "signup"), (1L, 200L, "view"), (1L, 300L, "purchase"),
      (2L, 200L, "view"), (2L, 300L, "signup"),
      (3L, 100L, "signup"))
      .toDF("user_id", "tsu", "event_type")
    val got = operators.TimeJoins.funnel(log, "user_id", "tsu",
        "event_type", Seq("signup", "view", "purchase"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // stage reach: all 3 sign up; only u1's view follows signup; u1 buys
    assert(got(1L) == 3L && got(2L) == 1L && got(3L) == 1L)
  }

  test("LSH ANN buckets have positive recall vs brute force") {
    val emb = Tables.embeddings(spark, dir)
    import org.apache.spark.sql.functions._
    val exact1 = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 1)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh1 = Similarity.lshTopK(emb, "vec_id", "embedding", 1, 4)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact1 & lsh1).size.toDouble / exact1.size
    assert(recall > 0.1, s"sign-LSH(4 planes) top-1 recall $recall")
  }

  test("multi-probe LSH strictly improves top-1 recall over single-probe") {
    val emb = Tables.embeddings(spark, dir)
    import org.apache.spark.sql.functions._
    def top1(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.filter(col("rank") === 1).select("vec_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = top1(Similarity.bruteForceTopK(emb, "vec_id", "embedding", 1))
    val single = top1(Similarity.lshTopK(emb, "vec_id", "embedding", 1, 8))
    val multi = top1(Similarity.lshTopKMultiProbe(emb, "vec_id", "embedding", 1, 8))
    val rs = (exact & single).size.toDouble / exact.size
    val rm = (exact & multi).size.toDouble / exact.size
    info(f"top-1 recall: single-probe $rs%.2f, multi-probe $rm%.2f")
    assert(rm > rs, f"multi-probe must beat single-probe: $rm%.2f vs $rs%.2f")
    // every single-probe answer stays available to multi-probe (the
    // probe set is a superset), so coverage can only grow
    assert(multi.size >= single.size)
  }

  test("IVF ANN recalls a quarter of brute-force top-3 at 12% probe volume") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 3)
      .select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", 3,
      nlist = 16, nprobe = 2)
    val got = ivf.select("vec_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    // measured 0.3027 on the fixture: nprobe/nlist = 2/16 of the
    // corpus searched; unstructured gaussian vectors are the ANN
    // worst case, so a quarter at an eighth of the work is the
    // honest expectation, not a tuned number
    assert(recall >= 0.25, s"IVF(nlist=16, nprobe=2) top-3 recall $recall")
    // every query returns exactly k rows (candidate lists are never
    // smaller than k at these parameters)
    assert(ivf.groupBy("vec_id").count().filter(col("count") =!= 3).count() == 0)
  }

  /** Local replay of [[Similarity.trainedCentroids]]: 2 Lloyd rounds
    * from the smallest-id adaptive-ladder seeds; each trained
    * centroid is the exact per-cluster sum of the µ-scaled-long
    * components (cosine is scale-invariant, so the sum IS the
    * direction — no mean division, no float accumulation).
    */
  private def lloydCents(vecs: Seq[(Long, Array[Double])],
      minNlist: Int): Seq[(Long, Array[Double])] = {
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val sorted = vecs.sortBy(_._1)
    val nlist = math.max(minNlist,
      math.floor(math.sqrt(vecs.length.toDouble)).toInt)
    var cents = sorted.take(nlist)
    for (_ <- 1 to 2) {
      val assigned = sorted.map { case (_, e) =>
        (cents.map { case (c, ce) => (-cos(e, ce), c) }.min._2, e)
      }
      cents = assigned.groupBy(_._1).toSeq.sortBy(_._1).map { case (cid, ms) =>
        val d = ms.head._2.length
        val sums = new Array[Long](d)
        ms.foreach { case (_, e) =>
          var j = 0
          while (j < d) { sums(j) += math.floor(e(j) * 1e6 + 0.5).toLong; j += 1 }
        }
        (cid, sums.map(_.toDouble))
      }
    }
    cents
  }

  test("t40 semantic dedup matches a direct recomputation") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val df = Similarity.semDedup(emb, "vec_id", "embedding",
      minNlist = 16, threshold = 0.3)
    val got = df.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))

    // direct recomputation with the same sequential-fold arithmetic
    val vecs = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val cents = lloydCents(vecs.toSeq, 16)
    val assign = vecs.map { case (id, e) =>
      val best = cents.map { case (cid, ce) => (-cos(e, ce), cid) }.min._2
      (id, best, e)
    }
    val byCluster = assign.groupBy(_._2)
    val dropped = assign.filter { case (id, cid, e) =>
      byCluster(cid).exists { case (oid, _, oe) =>
        oid < id && cos(oe, e) >= 0.3
      }
    }.map(_._1).toSet
    val expect = assign.map { case (id, cid, _) => (id, cid, !dropped(id)) }
    assert(got.toSeq == expect.toSeq, "verdicts replay exactly")
    // the fixture exercises both verdicts, and drops are a minority
    val nDrop = dropped.size
    assert(nDrop > 0 && nDrop < vecs.length / 2,
      s"fixture must exercise both verdicts (dropped $nDrop)")

    // plan shape: the pairwise stage equi-joins on the cluster id
    // (never a cartesian), and the clustered relation is checkpointed
    // so no consumer re-reads parquet. (The centroid broadcast lives
    // BEFORE the eager checkpoint — PlanShapeSpec's t16 test covers
    // that shared assignment pattern.)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("Join") && l.contains("cid")),
      "within-cluster pairs must join on cid")
    assert(!plan.contains("CartesianProduct"),
      "within-cluster pairs must equi-join on cid")
    assert(!plan.contains("Scan parquet"),
      "clustered relation is checkpointed; consumers must not re-scan")
  }

  test("t41 prototype sampling matches a direct recomputation") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val df = Similarity.prototypeSample(emb, "vec_id", "embedding",
      minNlist = 16, keepFrac = 0.5)
    val got = df.orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

    val vecs = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val cents = lloydCents(vecs.toSeq, 16)
    val assign = vecs.map { case (id, e) =>
      val (negcs, cid) = cents.map { case (c, ce) => (-cos(e, ce), c) }.min
      (id, cid, -negcs)
    }
    val expect = assign.groupBy(_._2).toSeq.flatMap { case (cid, ms) =>
      val ranked = ms.sortBy { case (id, _, cs) => (cs, id) }.zipWithIndex
      val keep = math.ceil(ms.length * 0.5).toLong
      ranked.map { case ((id, _, _), i) =>
        (id, cid, (i + 1).toLong, (i + 1).toLong <= keep)
      }
    }.sortBy(_._1)
    assert(got.toSeq == expect, "ranks and verdicts replay exactly")
    // exactly ceil(n_c/2) kept per cluster; both verdicts exercised
    val kept = got.count(_._4)
    assert(kept < got.length && kept > got.length / 3,
      s"keep-half must drop roughly half (kept $kept of ${got.length})")

    // plan shape: centroid assignment is a broadcast (no checkpoint
    // hides it here); the rank window partitions by cid, never a
    // single global partition
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), "centroids must broadcast")
    assert(!plan.contains("SinglePartition"),
      "windows must partition by cid, not collapse to one partition")
  }

  test("semDedup/prototypeSample: randomized differential incl. exact clones") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // deterministic LCG vectors; ids 0..239, every 8th vector a clone
    // of its predecessor (cosine exactly 1.0 — the tie/dup path the
    // gaussian fixture never exercises)
    var seed = 987654321L
    def nextF(): Float = {
      seed = (seed * 6364136223846793005L + 1442695040888963407L)
      ((seed >>> 33).toInt % 1000).toFloat / 250.0f
    }
    val base = (0 until 240).map { i => (i.toLong, Array.fill(64)(nextF())) }
    val rows = base.zipWithIndex.map { case ((id, v), i) =>
      if (i % 8 == 7) (id, base(i - 1)._2.clone()) else (id, v)
    }
    val emb = rows.toDF("vec_id", "embedding")

    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val vecs = rows.map { case (id, v) => (id, v.map(_.toDouble)) }
    val cents = lloydCents(vecs, 16)
    val assign = vecs.map { case (id, e) =>
      val (negcs, cid) = cents.map { case (c, ce) => (-cos(e, ce), c) }.min
      (id, cid, -negcs)
    }

    // semDedup: clones share the cluster (identical scores) and the
    // higher id of each clone pair must always drop
    val sd = Similarity.semDedup(emb, "vec_id", "embedding", 16, 0.3)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val byCluster = assign.groupBy(_._2)
    val dropExpect = assign.map { case (id, cid, _) =>
      val e = vecs(id.toInt)._2
      (id, cid, !byCluster(cid).exists { case (oid, _, _) =>
        oid < id && cos(vecs(oid.toInt)._2, e) >= 0.3
      })
    }
    assert(sd.toSeq == dropExpect.toSeq, "random-input verdicts replay")
    rows.indices.filter(_ % 8 == 7).foreach { i =>
      assert(!sd(i)._3, s"clone id $i must drop (its twin has the smaller id)")
    }

    // prototypeSample: ranks replay; clone pairs are rank-adjacent
    // with the smaller id first (exact cosine tie broken by id)
    val ps = Similarity.prototypeSample(emb, "vec_id", "embedding", 16, 0.5)
      .orderBy("vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val psExpect = assign.groupBy(_._2).toSeq.flatMap { case (cid, ms) =>
      val ranked = ms.sortBy { case (id, _, cs) => (cs, id) }.zipWithIndex
      val keep = math.ceil(ms.length * 0.5).toLong
      ranked.map { case ((id, _, _), i) =>
        (id, cid, (i + 1).toLong, (i + 1).toLong <= keep)
      }
    }.sortBy(_._1)
    assert(ps.toSeq == psExpect, "random-input ranks replay")
    rows.indices.filter(_ % 8 == 7).foreach { i =>
      val (twin, clone) = (ps(i - 1), ps(i))
      assert(twin._2 == clone._2, "clones share a cluster")
      assert(clone._3 == twin._3 + 1,
        "exact-tie clones rank adjacently, smaller id first")
    }
  }

  test("embedding-pruning ops degrade cleanly on empty inputs") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val empty = emb.filter(col("vec_id") < 0)
    // empty corpus: every op returns an empty, correctly-shaped frame
    assert(Similarity.semDedup(empty, "vec_id", "embedding").count() == 0)
    assert(Similarity.prototypeSample(empty, "vec_id", "embedding").count() == 0)
    // empty batch against a real index, and a real batch against an
    // empty index (cold start): no matches, everything 'new'
    val disp = Similarity.incrementalSemDedup(emb, empty, "vec_id", "embedding")
    assert(disp.count() == 0)
    val cold = Similarity.incrementalSemDedup(empty, emb.limit(5),
      "vec_id", "embedding")
    assert(cold.count() == 5)
    assert(cold.filter(col("status") =!= "new").count() == 0)
    assert(cold.filter(col("match_id").isNotNull).count() == 0)
  }

  test("t42 canonical selection elects the best-quality member per cluster") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val df = CorpusOps.canonicalSelect(docs, "doc_id", "text",
      n = 3, numPerms = 64, bands = 16, threshold = 0.5)
    val got = df.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))

    // differential vs the two already-gated building blocks
    val comps = Dedup.connectedComponents(
      Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 16, 0.5)
        .select("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val scores = CorpusOps.unigramMeanProb(docs, "doc_id", "text")
      .select(col("doc_id"), expr("hit_mass div n_tokens").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val expect = comps.toSeq.map { case (id, comp) =>
      val canon = comps.collect { case (oid, c) if c == comp => oid }
        .minBy(oid => (-scores(oid), oid))(
          Ordering.Tuple2(Ordering.Long, Ordering.Long))
      (id, comp, scores(id), id == canon)
    }.sortBy(_._1)
    assert(got.toSeq == expect, "election replays the building blocks")
    // exactly one canonical per cluster; clusters are non-trivial
    val byCluster = got.groupBy(_._2)
    assert(byCluster.nonEmpty && byCluster.forall(_._2.count(_._4) == 1),
      "each cluster elects exactly one canonical")
    assert(got.count(!_._4) > 0, "fixture must contain real losers")

    // a corpus with no near-dups has no clusters and elects nobody
    // (empty edges through connectedComponents converge immediately)
    import spark.implicits._
    val distinctDocs = Seq((1L, "alpha beta gamma delta epsilon"),
      (2L, "zeta eta theta iota kappa"),
      (3L, "lambda mu nu xi omicron")).toDF("doc_id", "text")
    assert(CorpusOps.canonicalSelect(distinctDocs, "doc_id", "text",
      n = 3, numPerms = 64, bands = 16, threshold = 0.5).count() == 0)
  }

  test("t43 incremental semantic dedup matches a direct recomputation") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val split = emb.count() * 4 / 5
    val df = Similarity.incrementalSemDedup(
      emb.filter(col("vec_id") < split),
      emb.filter(col("vec_id") >= split),
      "vec_id", "embedding", minNlist = 16, threshold = 0.3)
    val got = df.orderBy("batch_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))

    val vecs = emb.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Array[Double], b: Array[Double]): Double =
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    val (idx, batch) = vecs.partition(_._1 < split)
    val cents = lloydCents(idx.toSeq, 16)
    def assign(vs: Array[(Long, Array[Double])]) = vs.map { case (id, e) =>
      (id, cents.map { case (c, ce) => (-cos(e, ce), c) }.min._2, e)
    }
    val mi = assign(idx).groupBy(_._2)
    val expect = assign(batch).map { case (id, cid, e) =>
      val matches = mi.getOrElse(cid, Array.empty)
        .filter { case (oid, _, oe) => cos(oe, e) >= 0.3 }
      if (matches.isEmpty) (id, "new", -1L, Double.NaN)
      else {
        val m = matches.minBy(_._1)
        (id, "dup", m._1, cos(m._3, e))
      }
    }.sortBy(_._1)
    assert(got.length == batch.length, "one disposition per batch vector")
    got.zip(expect).foreach { case (g, x) =>
      assert(g._1 == x._1 && g._2 == x._2 && g._3 == x._3, s"$g != $x")
      assert((g._4.isNaN && x._4.isNaN) || g._4 == x._4, s"$g != $x")
    }
    assert(got.exists(_._2 == "dup") && got.exists(_._2 == "new"),
      "fixture must exercise both dispositions")

    // plan shape: the index is never self-joined and nothing is
    // quadratic — the one pairwise join keys on cid between the two
    // checkpointed assignments
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "pair stage must key on cid")
    assert(!plan.contains("Scan parquet"),
      "assignments are checkpointed; consumers must not re-scan")
  }

  test("multimodal payload plumbing round-trips sizes and features") {
    val docs = Tables.documents(spark, dir)
    val feats = Multimodal.extractFeatures(
      Multimodal.withPayload(docs, "doc_id", "text"), "doc_id")
    import org.apache.spark.sql.functions._
    assert(feats.count() == docs.count())
    // n_bytes equals text length for the ascii fixture corpus
    val joined = feats.join(docs, "doc_id")
      .filter(col("n_bytes") =!= length(col("text")).cast("long"))
    assert(joined.count() == 0)
    val row = feats.orderBy("doc_id").limit(1).collect()(0)
    assert(row.getSeq[Double](row.fieldIndex("feature")).length == 8)
  }

  test("real image payloads decode and resize through javax.imageio") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // an actual 6x4 PNG generated with the JDK encoder
    val img = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 6)
      img.setRGB(x, y, ((x * 40) << 16) | ((y * 60) << 8))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val withMeta = Seq((1L, png), (2L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
      .select(col("doc_id"), col("payload"),
        struct(lit("image/png").as("media_type"),
          octet_length(col("payload")).cast("long").as("n_bytes"),
          crc32(col("payload")).as("checksum")).as("meta"))
    val feats = Multimodal.extractFeatures(withMeta, "doc_id")
      .orderBy("doc_id").collect()
    // the decoded gate: real dimensions for the PNG...
    assert(feats(0).getBoolean(feats(0).fieldIndex("decoded")))
    assert(feats(0).getInt(feats(0).fieldIndex("width")) == 6)
    assert(feats(0).getInt(feats(0).fieldIndex("height")) == 4)
    // ...and the luminance histogram masses exactly the 24 pixels
    assert(feats(0).getSeq[Double](feats(0).fieldIndex("feature")).sum == 24.0)
    // non-image bytes fall back to the deterministic fake
    assert(!feats(1).getBoolean(feats(1).fieldIndex("decoded")))
    // resize really rescales: the output PNG decodes at 3x2, and
    // nearest-neighbor pixel (1,1) sampled source pixel (2,2)
    val resized = Multimodal.resize(withMeta, "doc_id", 3, 2)
      .orderBy("doc_id").collect()
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(0).getAs[Array[Byte]](1)))
    assert(back.getWidth == 3 && back.getHeight == 2)
    assert(back.getRGB(1, 1) == img.getRGB(2, 2))
    // the non-image payload went through the fake scaler: not a PNG
    assert(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
      resized(1).getAs[Array[Byte]](1))) == null)
  }

  test("multimodal resize and frame-sample keep the map-only contract") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir).limit(50)
    val payloads = Multimodal.withPayload(docs, "doc_id", "text")
    val resized = Multimodal.resize(payloads, "doc_id", 32, 32)
    assert(resized.count() == 50)
    assert(resized.filter(col("n_bytes") > 32 * 32 / 8).count() == 0,
      "resized payloads bounded by the target size")
    assert(resized.filter(col("width") =!= 32 || col("height") =!= 32).count() == 0)
    // frame sampling: one-to-many, every 2nd 64-byte chunk kept
    val frames = Multimodal.sampleFrames(payloads, "doc_id", frameBytes = 64, everyNth = 2)
    assert(frames.count() >= 50, "every doc yields at least frame 0")
    assert(frames.filter(col("frame_idx") % 2 =!= 0).count() == 0)
    // per-doc frame counts equal ceil(chunks / everyNth)
    val perDoc = frames.groupBy("doc_id").count().orderBy("doc_id")
      .collect().map(_.getLong(1))
    val chunks = payloads.orderBy("doc_id").select(ceil(octet_length(col("payload")) / 64.0))
      .collect().map(_.getLong(0))
    perDoc.zip(chunks).foreach { case (got, ch) =>
      assert(got == (ch + 1) / 2, s"frames $got for $ch chunks")
    }
    // no shuffle in either plan: map-only operators (assert on the
    // un-limited pipeline — limit() itself adds an exchange)
    val full = Multimodal.withPayload(Tables.documents(spark, dir), "doc_id", "text")
    for (df <- Seq(Multimodal.resize(full, "doc_id", 32, 32),
        Multimodal.sampleFrames(full, "doc_id")))
      assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
        "resize/frame-sample must not shuffle")
  }

  test("real WAV payloads decode through javax.sound.sampled") {
    import spark.implicits._
    val bytes = "hello audio fixture".getBytes("UTF-8")
    val wav = Multimodal.buildWav(bytes, sampleRate = 8000)
    // the JDK reader really parses the RIFF header and streams PCM back
    val info = Multimodal.decodeAudio(wav).get
    assert(info.sampleRate == 8000 && info.channels == 1 && info.bits == 8)
    assert(info.nFrames == bytes.length)
    assert(info.pcm.toSeq == bytes.toSeq, "PCM round-trips byte-exact")
    // pipeline: real decode flagged true, fallback flagged false
    val df = Seq((1L, wav), (2L, "not audio at all".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val feats = Multimodal.extractAudioFeatures(df, "doc_id")
      .orderBy("doc_id").collect()
    assert(feats(0).getBoolean(feats(0).fieldIndex("decoded")))
    assert(feats(0).getLong(feats(0).fieldIndex("n_frames")) == bytes.length)
    val energy = bytes.map { b => val d = (b & 0xff) - 128; d.toLong * d }.sum
    assert(feats(0).getLong(feats(0).fieldIndex("energy")) == energy)
    assert(feats(0).getLong(feats(0).fieldIndex("duration_ms")) ==
      bytes.length * 1000L / 8000)
    assert(!feats(1).getBoolean(feats(1).fieldIndex("decoded")))
    // differential: the direct RIFF walk agrees with the JDK reader
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(ais.getFormat.getSampleRate.toInt == info.sampleRate)
    assert(ais.getFormat.getChannels == info.channels)
    assert(ais.readAllBytes().toSeq == info.pcm.toSeq)
  }

  test("decodeAudio handles a JDK-written 16-bit stereo WAV identically") {
    import javax.sound.sampled._
    // a 16-bit stereo WAV produced by the JDK ENCODER (so the fixture
    // is not our own builder), decoded by both paths
    val fmt = new AudioFormat(16000f, 16, 2, true, false)
    val pcm = Array.tabulate(400)(i => (i * 13 % 251).toByte) // 100 frames
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, pcm.length / 4)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    val info = Multimodal.decodeAudio(wav).get
    assert(info.sampleRate == 16000 && info.channels == 2 && info.bits == 16)
    assert(info.nFrames == 100)
    assert(info.pcm.toSeq == pcm.toSeq, "16-bit PCM round-trips byte-exact")
  }

  test("Mp4 build/demux round-trips the sample table exactly") {
    import graft.operators.Mp4
    val samples = Seq.tabulate(7)(i =>
      Array.tabulate(10 + 5 * i)(j => ((i * 37 + j) & 0xff).toByte))
    val mp4 = Mp4.build(samples)
    assert(Mp4.looksLikeMp4(mp4))
    val tracks = Mp4.demux(mp4).get
    assert(tracks.length == 1 && tracks.head.handler == "vide")
    val got = tracks.head.samples.map { case (off, len) =>
      java.util.Arrays.copyOfRange(mp4, off.toInt, off.toInt + len).toSeq
    }
    assert(got == samples.map(_.toSeq), "every access unit byte-exact")
    // unknown trailing boxes are skipped by size, not choked on
    val free = java.nio.ByteBuffer.allocate(16).putInt(16)
      .put("free".getBytes("ISO-8859-1")).put(new Array[Byte](8)).array()
    assert(Mp4.demux(mp4 ++ free).get.head.samples == tracks.head.samples)
    // non-MP4 payloads are rejected cheaply
    assert(Mp4.demux("garbage that is not a container".getBytes).isEmpty)
  }

  test("Mp4 demux walks multi-chunk stsc runs and survives corruption") {
    import graft.operators.Mp4
    val samples = Seq.tabulate(7)(i =>
      Array.tabulate(5 + 3 * i)(j => ((i * 11 + j) & 0xff).toByte))
    // 3 samples/chunk -> chunks of 3,3,1: a two-run stsc + 3 stco offsets
    val mp4 = Mp4.build(samples, samplesPerChunk = 3)
    val got = Mp4.demux(mp4).get.head.samples.map { case (off, len) =>
      java.util.Arrays.copyOfRange(mp4, off.toInt, off.toInt + len).toSeq
    }
    assert(got == samples.map(_.toSeq), "multi-chunk layout demuxes byte-exact")
    // exact-multiple layout (no ragged tail): single stsc run, 3 chunks
    val nine = samples ++ samples.take(2)
    val got9 = Mp4.demux(Mp4.build(nine, samplesPerChunk = 3)).get.head.samples
    assert(got9.length == 9)
    // truncating anywhere must yield None or a shorter valid prefix,
    // never a thrown exception or an out-of-range sample
    for (cut <- Seq(3, 10, mp4.length / 2, mp4.length - 5)) {
      val t = java.util.Arrays.copyOfRange(mp4, 0, cut)
      Mp4.demux(t).foreach(_.foreach(_.samples.foreach { case (off, len) =>
        assert(off >= 0 && off + len <= t.length)
      }))
    }
    // flipping header bytes must not throw either
    for (i <- Seq(0, 4, 20, 40, mp4.length - 8)) {
      val m = mp4.clone(); m(i) = (m(i) ^ 0xff).toByte
      Mp4.demux(m) // must simply not throw; result contents are unspecified
    }
  }

  test("sampleFrames prefers the video track but serves audio-only files") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.Mp4
    val docs = Seq((1L, "c" * 60)).toDF("doc_id", "text")
    // audio-only container: handler 'soun' still demuxes (tracks.head)
    val payloads = docs.select(col("doc_id"), col("text")).mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        org.apache.spark.sql.Row(r.getLong(0),
          Mp4.build(bytes.grouped(48).toSeq, handler = "soun"))
      }
    }(org.apache.spark.sql.catalyst.encoders.ExpressionEncoder(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("payload",
          org.apache.spark.sql.types.BinaryType, nullable = false)))))
    val frames = Multimodal.sampleFrames(payloads, "doc_id", everyNth = 1).collect()
    assert(frames.length == 2 && frames.forall(
      _.getBoolean(frames(0).fieldIndex("demuxed"))))
  }

  test("sampleFrames demuxes real MP4 access units with provenance") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // doc 1: 100 bytes -> samples 48,48,4; everyNth=2 keeps idx 0,2
    // doc 2: 30 bytes  -> one 30-byte sample, kept
    val docs = Seq((1L, "a" * 100), (2L, "b" * 30)).toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(
      Multimodal.withMp4Payload(docs, "doc_id", "text", sampleBytes = 48),
      "doc_id", everyNth = 2)
      .orderBy("doc_id", "frame_idx").collect()
    assert(frames.length == 3)
    assert(frames.forall(_.getBoolean(frames(0).fieldIndex("demuxed"))))
    assert(frames(0).getLong(0) == 1L && frames(0).getInt(1) == 0 &&
      frames(0).getAs[Array[Byte]](2).toSeq == ("a" * 48).getBytes.toSeq)
    assert(frames(1).getLong(0) == 1L && frames(1).getInt(1) == 2 &&
      frames(1).getAs[Array[Byte]](2).toSeq == ("a" * 4).getBytes.toSeq)
    assert(frames(2).getLong(0) == 2L && frames(2).getInt(1) == 0 &&
      frames(2).getAs[Array[Byte]](2).length == 30)
  }

  test("t64 pixel keyframes: every fixture frame REAL-decodes, and a " +
      "JPEG-transcoded twin pairs under pixels but not under bytes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
    // provenance pinned: the MP4-of-BMPs fixture must take the pixel
    // path on EVERY sampled frame, never the byte fallback
    val fps = Multimodal.framePhash(
      Multimodal.sampleFrames(
        Multimodal.withMp4ImagePayload(docs, "doc_id", "text", 48),
        "doc_id", everyNth = 2),
      "doc_id", "frame_idx")
    assert(fps.count() > 0)
    assert(fps.filter(!col("decoded")).count() == 0,
      "a fixture frame fell back to the byte path")

    // the planted twin: demux one long doc's BMP frames, transcode
    // each to JPEG (same pixels, entirely different bytes), rebuild
    // the container — the re-encoded duplicate video t51's byte-level
    // hash provably cannot see
    val text = docs.orderBy(length(col("text")).desc, col("doc_id"))
      .select("text").as[String].head()
    assert(text.length >= 4 * 48, "fixture lost its long documents")
    val orig = Multimodal.withMp4ImagePayload(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", 48)
      .select("payload").head().getAs[Array[Byte]](0)
    val bmps = operators.Mp4.demux(orig).get.head.samples.map {
      case (off, len) =>
        java.util.Arrays.copyOfRange(orig, off.toInt, off.toInt + len)
    }
    val jpegs = bmps.map { b =>
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    assert(jpegs.zip(bmps).forall { case (j, b) => j.toSeq != b.toSeq })
    val pairDf = Seq((1L, orig), (2L, operators.Mp4.build(jpegs)))
      .toDF("doc_id", "payload")
    val hashed = Multimodal.framePhash(
        Multimodal.sampleFrames(pairDf, "doc_id", everyNth = 2),
        "doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val frameNos = hashed.keys.filter(_._1 == 1L).map(_._2).toSeq.sorted
    assert(frameNos.nonEmpty &&
      frameNos == hashed.keys.filter(_._1 == 2L).map(_._2).toSeq.sorted)
    val pixelMatches = frameNos.count { i =>
      java.lang.Long.bitCount(hashed((1L, i)) ^ hashed((2L, i))) <=
        graft.queries.TrainingData.KeyframeMaxHamming
    }
    assert(pixelMatches >= graft.queries.TrainingData.KeyframeMinShared,
      s"pixel path matched only $pixelMatches of ${frameNos.length} frames")
    // byte-level contrast: the container-level fallback hash (t51's
    // regime) over the same frames shares NOTHING — the transcoded
    // access units are byte-disjoint
    def byteHash(bytes: Array[Byte]): Long = {
      val g = Array.tabulate(64)(i => if (i < bytes.length) bytes(i) & 0xff else 0)
      val mean = g.map(_.toLong).sum / 64
      g.zipWithIndex.foldLeft(0L) { case (h, (v, i)) =>
        if (v > mean) h | (1L << i) else h
      }
    }
    val byteMatches = frameNos.indices.count { k =>
      java.lang.Long.bitCount(
        byteHash(bmps(frameNos(k))) ^ byteHash(jpegs(frameNos(k)))) <=
        graft.queries.TrainingData.KeyframeMaxHamming
    }
    assert(byteMatches == 0,
      s"byte hash unexpectedly matched $byteMatches transcoded frames")
  }

  test("t35/t36 gate queries match a direct recomputation from text") {
    import graft.queries.TrainingData
    val text = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val audio = TrainingData.docAudioDecode(spark, dir).collect()
    assert(audio.length == text.size)
    audio.foreach { r =>
      val t = text(r.getLong(r.fieldIndex("doc_id"))).getBytes("UTF-8")
      assert(r.getBoolean(r.fieldIndex("decoded")), "every WAV must real-decode")
      assert(r.getLong(r.fieldIndex("n_frames")) == t.length)
      val energy = t.map { b => val d = (b & 0xff) - 128; d.toLong * d }.sum
      assert(r.getLong(r.fieldIndex("energy")) == energy)
    }

    val mp4 = TrainingData.docMp4Frames(spark, dir).collect()
    assert(mp4.length == text.count(_._2.nonEmpty))
    mp4.foreach { r =>
      val t = text(r.getLong(r.fieldIndex("doc_id"))).getBytes("UTF-8")
      val chunks = t.grouped(48).toSeq
      val kept = chunks.zipWithIndex.filter(_._2 % 2 == 0).map(_._1)
      assert(r.getLong(r.fieldIndex("n_fake")) == 0L)
      assert(r.getLong(r.fieldIndex("n_frames_kept")) == kept.length)
      assert(r.getLong(r.fieldIndex("kept_bytes")) == kept.map(_.length.toLong).sum)
      assert(r.getLong(r.fieldIndex("first_byte_sum")) ==
        kept.map(c => (c.head & 0xff).toLong).sum)
    }
  }

  test("t49 pHash: real BMP decode matches a direct recomputation from text") {
    import graft.queries.TrainingData
    // driver-side reference: the same 32x32 canvas / 8x8 aHash contract
    def refPhash(bytes: Array[Byte]): Long = {
      val g = Array.tabulate(64) { i =>
        val idx = 128 * (i / 8) + 4 * (i % 8)
        if (bytes.isEmpty) 0
        else bytes((idx.toLong * bytes.length / 1024).toInt) & 0xff
      }
      val mean = g.map(_.toLong).sum / 64
      g.zipWithIndex.foldLeft(0L) { case (h, (v, i)) =>
        if (v > mean) h | (1L << i) else h
      }
    }
    val text = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = TrainingData.docImagePhash(spark, dir).collect()
    assert(rows.length == text.size)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("decoded")),
        "every fixture BMP must decode through javax.imageio")
      val bytes = text(r.getLong(r.fieldIndex("doc_id"))).getBytes("UTF-8")
      assert(r.getLong(r.fieldIndex("phash")) == refPhash(bytes))
    }
  }

  test("decodeGrayPixels: direct BMP walk equals the ImageIO path") {
    // a JDK-encoded PNG exercises the ImageIO branch; the same pixels
    // through our BMP builder exercise the direct walk — luminance
    // grids must agree exactly
    val rnd = new scala.util.Random(7)
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bytes = Array.fill(1024)(rnd.nextInt(256).toByte)
    for (y <- 0 until 32; x <- 0 until 32) {
      val v = bytes(y * 32 + x) & 0xff
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val png = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", png)
    val viaPng = operators.Multimodal.decodeGrayPixels(png.toByteArray)
    assert(viaPng.isDefined)
    val expected = bytes.map(_ & 0xff)
    assert(viaPng.get._3.toSeq == expected.toSeq, "PNG path luminance drift")
    // the fixture BMP of the same bytes must decode identically via
    // the direct walk (doc text is ASCII; use raw bytes here through
    // the builder's byte layout by round-tripping a crafted string)
    val ascii = Array.tabulate(1024)(i => (32 + (i % 95)).toByte)
    val docBytes = new String(ascii, "UTF-8")
    import spark.implicits._
    val bmp = operators.Multimodal.withBmpPayload(
      Seq((1L, docBytes)).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0).getAs[Array[Byte]]("payload")
    val viaBmp = operators.Multimodal.decodeGrayPixels(bmp)
    assert(viaBmp.isDefined && viaBmp.get._1 == 32 && viaBmp.get._2 == 32)
    assert(viaBmp.get._3.toSeq == ascii.map(_ & 0xff).toSeq,
      "direct BMP walk luminance drift")
  }

  test("GIF fixture round-trips losslessly: zero fallbacks, pixels equal the BMP twin") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    val gifHash = operators.Multimodal.imagePhash(
      operators.Multimodal.withGifPayload(docs, "doc_id", "text"), "doc_id")
    // provenance: every fixture GIF decodes through the REAL reader
    assert(gifHash.filter(!col("decoded")).isEmpty,
      "GIF payloads must never hit the fallback path")
    // grayscale fits GIF's palette exactly → the LZW round-trip is
    // pixel-lossless, so the aHash equals the uncompressed-BMP twin's
    val bmpHash = operators.Multimodal.imagePhash(
      operators.Multimodal.withBmpPayload(docs, "doc_id", "text"), "doc_id")
    val joined = gifHash.select(col("doc_id"), col("phash").as("g"))
      .join(bmpHash.select(col("doc_id"), col("phash").as("b")), "doc_id")
    assert(joined.count() == docs.count())
    assert(joined.filter(col("g") =!= col("b")).isEmpty,
      "GIF-decoded pixels drifted from the BMP layout")
  }

  test("winnowing: match guarantee, rightmost-tie rule, sub-linear density") {
    import spark.implicits._
    // guarantee: a shared run of w+k-1 = 6 tokens ⇒ >= 1 shared fingerprint
    val shared = "alpha beta gamma delta epsilon zeta"
    val docs = Seq(
      (1L, s"one two three four five $shared"),
      (2L, s"$shared six seven eight nine ten")).toDF("doc_id", "text")
    val byDoc = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .collect().groupBy(_.getLong(0))
      .map { case (d, rs) => d -> rs.map(_.getLong(2)).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty,
      "a shared w+k-1 token run must share a selected fingerprint")
    // rightmost-min tie rule: identical grams everywhere → window j
    // selects position j+w-1; dedup leaves exactly {w-1 .. m-1}
    val uni = Seq((9L, Seq.fill(8)("a").mkString(" "))).toDF("doc_id", "text")
    val pos = Dedup.winnowFingerprints(uni, "doc_id", "text", k = 3, w = 4)
      .collect().map(_.getLong(1)).toSet
    assert(pos == Set(3L, 4L, 5L), s"rightmost-tie positions off: $pos")
    // density: expected 2/(w+1) of grams for varying content
    val longText = (1 to 400).map(i => s"tk${(i * 37) % 89}v$i").mkString(" ")
    val n = Dedup.winnowFingerprints(
      Seq((3L, longText)).toDF("doc_id", "text"), "doc_id", "text", 3, 4).count()
    val grams = 400 - 2
    assert(n > grams / 5 && n < grams * 3 / 5,
      s"density far from 2/(w+1): $n of $grams grams")
  }

  test("hammingNearDups: exact recall on planted fingerprints") {
    import spark.implicits._
    // cluster around 0L at hamming 0..4 plus a far-away fingerprint;
    // bits chosen to straddle the 16-bit band boundaries
    val fps = Seq(
      (1L, 0L),
      (2L, 0L), // identical (intra path)
      (3L, 1L << 3), // hamming 1 from 0
      (4L, (1L << 15) | (1L << 16) | (1L << 63)), // hamming 3, 3 bands touched
      (5L, (1L << 1) | (1L << 17) | (1L << 33) | (1L << 49)), // hamming 4: out
      (6L, -1L) // far from everything
    ).toDF("doc_id", "fp")
    val pairs = graft.operators.Dedup.hammingNearDups(fps, "doc_id", "fp", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exhaustive expectation from the planted values
    val vals = Map(1L -> 0L, 2L -> 0L, 3L -> (1L << 3),
      4L -> ((1L << 15) | (1L << 16) | (1L << 63)),
      5L -> ((1L << 1) | (1L << 17) | (1L << 33) | (1L << 49)), 6L -> -1L)
    val want = (for {
      a <- vals.keys; b <- vals.keys if a < b
      h = java.lang.Long.bitCount(vals(a) ^ vals(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(want.exists(_._3 == 0L) && want.exists(_._3 == 3L)) // non-vacuous
    assert(pairs == want, s"banding must find exactly the <=3 pairs: $pairs vs $want")
  }

  test("t51 keyframe dedup matches a direct recomputation from text") {
    import graft.queries.TrainingData
    def framePhash(bytes: Array[Byte]): Long = {
      val g = Array.tabulate(64)(i => if (i < bytes.length) bytes(i) & 0xff else 0)
      val mean = g.map(_.toLong).sum / 64
      g.zipWithIndex.foldLeft(0L) { case (h, (v, i)) =>
        if (v > mean) h | (1L << i) else h
      }
    }
    val text = Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1))
      .filter(_._2.nonEmpty).toMap
    // driver-side reference: kept frames (every 2nd 48-byte slice),
    // hash each, all cross-doc pairs within hamming, count per pair
    val hashes = text.toSeq.flatMap { case (id, t) =>
      t.getBytes("UTF-8").grouped(48).zipWithIndex
        .filter(_._2 % 2 == 0)
        .map { case (b, _) => (id, framePhash(b)) }
    }
    val want = hashes.flatMap { case (da, ha) =>
      hashes.collect { case (db, hb) if da < db &&
        java.lang.Long.bitCount(ha ^ hb) <= TrainingData.KeyframeMaxHamming =>
        (da, db)
      }
    }.groupBy(identity).view.mapValues(_.size.toLong)
      .filter(_._2 >= TrainingData.KeyframeMinShared).toMap
    val got = TrainingData.docVideoKeyframeDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want, s"${got.size} pairs vs expected ${want.size}")
    assert(want.nonEmpty, "fixture must produce at least one shared-frame pair")
  }

  test("t51 composite ids survive documents with more than 64 frames") {
    import spark.implicits._
    import graft.queries.TrainingData
    // two unrelated long docs (>64 kept frames each) plus one genuine
    // dup pair; a too-small id stride would leak doc 1's high frame
    // indices into doc 2's id space and fabricate pairs. Frames carry
    // seeded-random printable content — constant-character frames
    // would all aHash to 0 and legitimately pair everything
    def doc(seed: Int, frames: Int): String = {
      val rnd = new scala.util.Random(seed)
      Array.fill(frames * 48)((33 + rnd.nextInt(94)).toChar).mkString
    }
    val docs = Seq(
      (1L, doc(101, 160)), (2L, doc(202, 160)),
      (10L, doc(303, 8)), (11L, doc(303, 8))
    ).toDF("doc_id", "text")
    val got = TrainingData.videoKeyframeDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((10L, 11L)), s"genuine dup pair missing: $got")
    assert(!got.keySet.exists(k => k._1 <= 2L || k._2 <= 2L),
      s"unrelated long docs fabricated a pair: $got")
  }

  test("imagePhash: hostile BMP headers fall back instead of crashing") {
    import spark.implicits._
    // 'BM' magic + 54-byte header with a negative data offset and an
    // overflowing width — both must reject in the direct walk AND in
    // ImageIO, landing on the deterministic fallback (decoded=false)
    def bmp(dataOff: Int, w: Int, h: Int): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put('B'.toByte).put('M'.toByte).putInt(64).putInt(0).putInt(dataOff)
      b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      b.array()
    }
    val hostile = Seq(
      (1L, bmp(0x80000000, 1, 1)), // negative data offset
      (2L, bmp(54, 0x40000000, 1)), // width overflows rowBytes
      (3L, bmp(54, 1, -5)) // negative height
    ).toDF("doc_id", "payload")
    val rows = operators.Multimodal.imagePhash(hostile, "doc_id").collect()
    assert(rows.length == 3)
    assert(rows.forall(!_.getBoolean(2)), "hostile BMPs must not claim decoded")
  }

  test("incrementalHammingDedup: exact/near/new against the index only") {
    import spark.implicits._
    val index = Seq(
      (1L, 100L), (2L, 100L), // identical index fps: smallest id elected
      (3L, (1L << 40) | (1L << 41))
    ).toDF("doc_id", "fp")
    val batch = Seq(
      (10L, 100L), // exact copy of index 1 and 2 -> match_id 1
      (11L, 100L ^ (1L << 63)), // 1 bit from index 1/2 -> near, match 1
      (12L, (1L << 40) | (1L << 41) | (1L << 5) | (1L << 20)), // 2 bits from 3
      (13L, -1L), // nothing close -> new
      (14L, -1L) // identical to 13 — batch-internal dup must stay new
    ).toDF("doc_id", "fp")
    val got = graft.operators.Dedup.incrementalHammingDedup(
      index, batch, "doc_id", "fp", maxHamming = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap
    assert(got(10L) == (("exact", Some(1L), Some(0L))))
    assert(got(11L) == (("near", Some(1L), Some(1L))))
    assert(got(12L) == (("near", Some(3L), Some(2L))))
    assert(got(13L) == (("new", None, None)))
    assert(got(14L) == (("new", None, None)),
      "a batch-internal duplicate must not match another batch row")
  }

  test("incremental dedup disposes batch docs as exact/near/new") {
    import spark.implicits._
    val index = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "spark shuffles partition data across the cluster network layer"),
      (3L, "completely unrelated content about cooking pasta with garlic")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // exact copy of index doc 2
      (10L, "spark shuffles partition data across the cluster network layer"),
      // near-dup of index doc 1 (one word changed)
      (11L, "the quick brown fox jumps over the lazy cat again and again"),
      // brand new
      (12L, "vector databases index embeddings for similarity search at scale"),
      // exact dup WITHIN the batch only — must stay 'new': batch
      // self-dedup is not this operator's contract
      (13L, "vector databases index embeddings for similarity search at scale")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.incrementalDedup(index, batch, "doc_id", "text")
      .orderBy("batch_id").collect()
    def row(id: Long) = out.find(_.getLong(0) == id).get
    assert(row(10L).getString(1) == "exact" && row(10L).getLong(2) == 2L)
    assert(row(10L).isNullAt(3), "exact rows carry no jaccard")
    assert(row(11L).getString(1) == "near" && row(11L).getLong(2) == 1L)
    assert(row(11L).getDouble(3) >= 0.5)
    assert(row(12L).getString(1) == "new" && row(12L).isNullAt(2))
    assert(row(13L).getString(1) == "new",
      "batch-internal duplicates are out of contract")
    assert(out.length == 4)
    // plan shape: every join is an equi-join (digest / band-key /
    // id) — nothing quadratic sneaks in
    val plan = graft.operators.Dedup
      .incrementalDedup(index, batch, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      "incremental dedup must stay equi-join only")
  }

  test("WAV RIFF walker survives truncation and bit flips") {
    val bytes = "pcm fuzz fixture payload".getBytes("UTF-8")
    val wav = Multimodal.buildWav(bytes)
    for (cut <- Seq(4, 11, 12, 20, 43, wav.length - 3)) {
      val t = java.util.Arrays.copyOfRange(wav, 0, cut)
      // must not throw; a successful parse must stay in bounds
      Multimodal.decodeAudio(t).foreach { info =>
        assert(info.pcm.length <= t.length)
      }
    }
    for (i <- Seq(0, 8, 16, 22, 36, 40)) {
      val m = wav.clone(); m(i) = (m(i) ^ 0xff).toByte
      Multimodal.decodeAudio(m) // result unspecified; no throw
    }
    // a fmt chunk claiming a length past EOF is rejected, not read
    val bad = wav.clone()
    bad(16) = 0x7f.toByte // fmt chunk size low byte -> huge
    assert(Multimodal.decodeAudio(bad).isEmpty ||
      Multimodal.decodeAudio(bad).get.pcm.length <= bad.length)
  }

  test("WAV walker rejects Int-overflow chunk lengths without throwing") {
    // chunk length in [0x7FFFFFEC, 0x7FFFFFFF]: an Int-arithmetic
    // bounds check overflows negative and walks pos below zero; the
    // Long walk must simply reject. 0xFFFFFFFF exercises the
    // unsigned-as-Long read on the same guard.
    for (len <- Seq(0x7FFFFFF0, 0x7FFFFFFF, 0xFFFFFFFF)) {
      val bb = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("ISO-8859-1")).putInt(56)
        .put("WAVE".getBytes("ISO-8859-1"))
        .put("JUNK".getBytes("ISO-8859-1")).putInt(len)
      assert(Multimodal.decodeAudio(bb.array()).isEmpty,
        f"chunk len 0x$len%08x must be rejected, not overflow")
    }
  }

  test("Mp4 demux rejects corrupt sample tables instead of crashing") {
    import graft.operators.Mp4
    val samples = Seq.tabulate(5)(i =>
      Array.tabulate(8 + i)(j => ((i * 7 + j) & 0xff).toByte))
    val mp4 = Mp4.build(samples)
    def fourccAt(name: String): Int =
      mp4.indices.find(i => i + 4 <= mp4.length &&
        new String(mp4, i, 4, "ISO-8859-1") == name).get
    def putBe32(b: Array[Byte], off: Int, v: Long): Unit = {
      b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
      b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
    }
    // (a) faststart-style truncation: the sample table stays
    // self-consistent but a chunk offset points past EOF — demux must
    // refuse (sampleFrames would otherwise copy out of range or
    // zero-pad frames flagged demuxed=true)
    val pastEof = mp4.clone()
    putBe32(pastEof, fourccAt("stco") + 12, mp4.length + 1000L)
    assert(Mp4.demux(pastEof).isEmpty,
      "chunk offsets past EOF must demux to None")
    // (b) a corrupt uniform stsz with sample_count near 2^31 must be
    // bounded BEFORE allocation (OutOfMemoryError is not an Exception
    // and would escape demux's catch)
    val huge = mp4.clone()
    val stsz = fourccAt("stsz")
    putBe32(huge, stsz + 8, 4L) // uniform sample_size
    putBe32(huge, stsz + 12, 0x7FFFFFF0L) // sample_count
    assert(Mp4.demux(huge).isEmpty,
      "2^31-scale sample_count must be rejected, not allocated")
  }

  test("t39 token-budget sampling matches a direct recomputation") {
    import graft.operators.CorpusOps
    val budgets = Map("src0" -> 100000L, "src1" -> 500L, "src2" -> 40L)
    val shards = 8
    val docs = Tables.documents(spark, dir)
    val got = CorpusOps.tokenBudgetSample(docs, "doc_id", "text", "source",
      budgets, shards).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

    // direct recomputation: shard-major order, strict prefix per source
    val raw = docs.select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.split("\\s+").length.toLong))
    def hash(id: Long) = {
      val s0 = (id & 4294967295L) ^ 123456789L
      val h1 = ((s0 ^ (s0 >>> 16)) * 73244475L) & 4294967295L
      val h2 = h1 ^ ((id >> 32) & 4294967295L)
      val h3 = ((h2 ^ (h2 >>> 16)) * 73244475L) & 4294967295L
      h3 ^ (h3 >>> 16)
    }
    val expect = raw.groupBy(_._2).toSeq.flatMap { case (src, ds) =>
      val ordered = ds.sortBy(d => (hash(d._1) % shards, hash(d._1), d._1))
      val cums = ordered.scanLeft(0L)(_ + _._3).tail
      ordered.zip(cums).collect {
        case ((id, s, n), cum) if cum <= budgets.getOrElse(src, 0L) =>
          (id, s, n, cum)
      }
    }.sortBy(_._1)
    assert(got.toSeq == expect, "shard-major prefix truncation is exact")

    // regimes: src0 keeps all its docs, src1 truncates, unknown drop
    val perSrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    val rawPerSrc = raw.groupBy(_._2).view.mapValues(_.length).toMap
    assert(perSrc.getOrElse("src0", 0) == rawPerSrc("src0"), "src0 saturates")
    assert(perSrc.getOrElse("src1", 0) < rawPerSrc("src1"), "src1 truncates")
    assert(got.forall(r => budgets.contains(r._2)), "unbudgeted sources drop")

    // plan shape: the doc window partitions by (source, shard) — never
    // one partition per source — and the shard allocation broadcasts
    val df = CorpusOps.tokenBudgetSample(docs, "doc_id", "text", "source",
      budgets, shards)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      "shard allocation must ride a broadcast")
    val docWindow = plan.linesIterator.filter(_.contains("windowspecdefinition"))
      .filter(_.contains("doc_id"))
    assert(docWindow.forall(_.contains("shard")),
      "per-doc window must partition by (source, shard)")
    // the tokenized relation is checkpointed before fan-out: neither
    // consumer (shard aggregate, doc window) re-reads the corpus, so
    // the final plan contains no parquet scan at all
    assert(!plan.contains("Scan parquet"),
      "tokenization lineage must not re-read the corpus per consumer")
  }

  test("t37 per-source quality pruning matches a direct recomputation") {
    import graft.queries.TrainingData
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tf: Map[(Long, String), Long] = docs
      .flatMap { case (id, _, t) => t.trim.split("\\s+").map(w => (id, w)) }
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val cnt: Map[String, Long] =
      tf.groupBy(_._1._2).map { case (w, g) => w -> g.values.sum }
    val score: Map[Long, Long] = tf.groupBy(_._1._1).map { case (id, g) =>
      val n = g.values.sum
      val hit = g.map { case ((_, w), c) => c * cnt(w) }.sum
      id -> hit / n
    }
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (_, g) =>
      val target = math.ceil(g.length * 0.25).toInt
      val sorted = g.map(d => score(d._1)).sorted(Ordering[Long].reverse)
      // max score whose >=-count reaches target == the target-th largest
      val thr = sorted(target - 1)
      g.collect { case (id, s, _) if score(id) >= thr => (id, s, score(id)) }
    }.toSet
    val pruned = TrainingData.docQualityPrune(spark, dir)
    val got = pruned.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.size < docs.length, "pruning must actually drop documents")
    // scale contract: thresholds come back via a broadcast join; the
    // corpus is never globally sorted
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("real BPE count follows the min-rank merge loop") {
    import graft.functions.Bpe
    // hand-traced against Bpe.Merges: "customer" fully collapses
    // (e r -> s t -> m er -> c u -> cu st -> cust o -> custo mer)
    assert(Bpe.count("customer") == 1L)
    assert(Bpe.count("order") == 1L)
    // no applicable merges -> one token per char
    assert(Bpe.count("xyz") == 3L)
    assert(Bpe.count("aaaa") == 4L)
    // leftmost non-overlapping within a run: e,r,e,r -> er,er
    assert(Bpe.count("erer") == 2L)
    // pre-token boundaries: merges never cross whitespace
    assert(Bpe.count("customer order") == 2L)
    assert(Bpe.count("") == 0L)
    // control chars below U+0009 are stripped, not tokenized
    assert(Bpe.count("xyzxyz") == Bpe.count("xyzxyz"))
  }

  test("bpe_token_count expression matches driver-side Bpe.count") {
    import org.apache.spark.sql.functions._
    import graft.functions.{Bpe, GraftFunctions}
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, dir).limit(100)
    val rows = docs.select(col("text"),
      expr("bpe_token_count(text)").as("n")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) == Bpe.count(r.getString(0)))
    }
    // non-degenerate on the fixture: strictly finer than words,
    // strictly coarser than characters
    val agg = graft.queries.TrainingData.docBpeReal(spark, dir)
      .agg(sum("n_bpe_real")).collect()(0).getLong(0)
    val stats = Tables.documents(spark, dir).select(
      sum(graft.functions.TextFunctions.nTokens(col("text"))).as("w"),
      sum(length(col("text")).cast("long")).as("c")).collect()(0)
    assert(agg > stats.getLong(0), "BPE tokens > word count")
    assert(agg < stats.getLong(1), "BPE tokens < char count")
  }

  test("learnBpeMerges: hand-computed merges on a toy corpus") {
    import spark.implicits._
    import graft.operators.CorpusOps
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val learned = CorpusOps.learnBpeMerges(docs, "text", numMerges = 10)
    // pair counts: (l,o)=3 (o,w)=3 (w,e)=1 (e,r)=1 → tie (l,o)<(o,w);
    // then (lo,w)=3; remaining pairs have count 1 → training stops
    assert(learned.map { case (k, l, r, c) => (k, l, r, c) } ==
      Seq((0, "l", "o", 3L), (1, "lo", "w", 3L)))
  }

  test("learnBpeMerges: odd same-char runs merge greedily, leftover last") {
    import spark.implicits._
    import graft.operators.CorpusOps
    // 3×"aaaaa": round 0 counts (a,a)=12, greedy merge -> [aa,aa,a]
    // per word; round 1 counts (aa,aa)=3 and (aa,a)=3 — tie breaks
    // on pair text, (aa,a) < (aa,aa) — ONLY under leftover-last.
    // Leftover-middle ([aa,a,aa]) would count (aa,a)=3,(a,aa)=3 and
    // pick (a,aa) instead, so this pins the application order.
    val docs = Seq((1L, "aaaaa aaaaa aaaaa")).toDF("doc_id", "text")
    val learned = CorpusOps.learnBpeMerges(docs, "text", numMerges = 2)
      .map { case (_, l, r, c) => (l, r, c) }
    assert(learned == Seq(("a", "a", 12L), ("aa", "a", 3L)), learned.toString)
  }

  test("learnBpeMerges: randomized differential vs a driver-side reference") {
    import spark.implicits._
    import graft.operators.CorpusOps
    // driver-side reference: same vocab counting, same (count desc,
    // pair asc) tie-break, same greedy left-to-right merge
    def reference(words: Seq[String], numMerges: Int): Seq[(String, String, Long)] = {
      var vocab: Map[Vector[String], Long] = words.groupBy(identity).view
        .mapValues(_.size.toLong).toMap
        .map { case (w, f) => w.toVector.map(_.toString) -> f }
        .filter(_._1.size > 1)
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var done = false
      while (out.size < numMerges && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((syms, f) <- vocab; i <- 0 until syms.size - 1)
          counts((syms(i), syms(i + 1))) =
            counts.getOrElse((syms(i), syms(i + 1)), 0L) + f
        val best = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
        best match {
          case Some(((l, r), c)) if c >= 2 =>
            out += ((l, r, c))
            vocab = vocab.map { case (syms, f) =>
              val b = Vector.newBuilder[String]
              var i = 0
              while (i < syms.size) {
                if (i < syms.size - 1 && syms(i) == l && syms(i + 1) == r) {
                  b += (l + r); i += 2
                } else { b += syms(i); i += 1 }
              }
              b.result() -> f
            }.groupBy(_._1).view.mapValues(_.values.sum).toMap
              .filter(_._1.size > 1)
          case _ => done = true
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 3) {
      val alphabet = "abcd"
      // long same-char runs force the greedy-application edge: on an
      // odd run the leftover single goes LAST (aaaaa -> aa,aa,a); a
      // replace-fixpoint-style application puts it in the middle and
      // diverges the next round's pair counts (the old t34 oracle bug)
      val runs = Seq("aaaaa", "aaaaaaa", "bbbbbb", "aabaaa")
      val words = runs ++ Seq.fill(120)(
        (0 until (2 + rnd.nextInt(5)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val docs = words.grouped(10).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val got = CorpusOps.learnBpeMerges(docs, "text", numMerges = 6)
        .map { case (_, l, r, c) => (l, r, c) }
      val want = reference(words, 6)
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("learnBpeMerges: batched rounds are bit-identical to sequential") {
    import spark.implicits._
    import graft.operators.CorpusOps
    // random small-alphabet corpora are maximally batch-HOSTILE:
    // created pairs ((ab,c) after merging (a,b)) dominate the next
    // argmax, so the safety guards must keep truncating the batch —
    // any unsound batching diverges here within a round or two
    val rnd = new scala.util.Random(13)
    for (trial <- 0 until 3) {
      val alphabet = "abcd"
      val words = Seq("aaaaa", "aaaaaaa") ++ Seq.fill(150)(
        (0 until (2 + rnd.nextInt(5)))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
      val docs = words.grouped(10).zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
        .toDF("doc_id", "text")
      val seq1 = CorpusOps.learnBpeMerges(docs, "text", numMerges = 8, batchSize = 1)
      val bat8 = CorpusOps.learnBpeMerges(docs, "text", numMerges = 8, batchSize = 8)
      assert(bat8 == seq1, s"trial $trial: batched diverged from sequential")
    }
  }

  test("learnBpeMerges: a batch-friendly corpus learns B merges per round") {
    import spark.implicits._
    import graft.operators.CorpusOps
    // 32 two-letter words over 64 distinct symbols: no trigrams (so no
    // created-pair bound), all pairs symbol-disjoint, all merged
    // symbols fresh, distinct descending counts — every guard passes
    // and each Spark round learns a full batch of 8
    val alphabet = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ Seq('#', '%')
    val pairs = alphabet.grouped(2).map(g => s"${g(0)}${g(1)}").toSeq
    assert(pairs.size == 32)
    val words = pairs.zipWithIndex.flatMap { case (w, i) =>
      Seq.fill(100 - i)(w)
    }
    val docs = words.grouped(50).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
    var rounds = 0
    val learned = CorpusOps.learnBpeMerges(docs, "text", numMerges = 32,
      batchSize = 8, onRound = _ => rounds += 1)
    assert(learned.size == 32)
    assert(rounds == 4, s"expected ceil(32/8) = 4 Spark rounds, got $rounds")
    // learned in descending count order, each word's own pair
    assert(learned.map { case (_, l, r, c) => (s"$l$r", c) } ==
      pairs.zipWithIndex.map { case (w, i) => (w, (100 - i).toLong) })
  }

  test("learnBpeMerges reproduces the shipped merges table from its corpus") {
    import graft.operators.CorpusOps
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    var rounds = 0
    val learned = CorpusOps.learnBpeMerges(docs, "text", numMerges = 48,
        onRound = _ => rounds += 1)
      .map { case (_, l, r, _) => s"$l $r" }
    assert(learned == graft.functions.Bpe.Merges.toSeq,
      s"learned ${learned.take(8)}... vs shipped ${graft.functions.Bpe.Merges.take(8).toSeq}...")
    // real-corpus batching efficiency: the guards must still beat
    // one-merge-per-round on natural text (created pairs dominate
    // early, the tail batches) — regression-pin the upper bound
    info(s"48 merges learned in $rounds Spark rounds (sequential would take 48)")
    assert(rounds < 48, s"batching degenerated to sequential: $rounds rounds")
  }

  test("sorted_inter_count matches array_intersect/array_union on random arrays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val rnd = new scala.util.Random(21)
    // random sorted duplicate-free long and string arrays, including
    // empties, disjoint, identical, and subset shapes
    val rows = (0 until 200).map { i =>
      val a = rnd.shuffle((0 until 60).toList).take(rnd.nextInt(20)).sorted
      val b = rnd.shuffle((0 until 60).toList).take(rnd.nextInt(20)).sorted
      (i.toLong, a.map(_.toLong), b.map(_.toLong),
        a.map(x => f"s$x%03d"), b.map(x => f"s$x%03d"))
    }
    val df = rows.toDF("id", "la", "lb", "sa", "sb")
    val bad = df.select(
      (expr("sorted_inter_count(la, lb)") =!=
        size(array_intersect(col("la"), col("lb"))).cast("long")).as("badL"),
      (expr("sorted_inter_count(sa, sb)") =!=
        size(array_intersect(col("sa"), col("sb"))).cast("long")).as("badS"))
      .filter(col("badL") || col("badS")).count()
    assert(bad == 0, s"$bad rows diverged from array_intersect")
  }

  test("PQ encode: codebook vectors quantize to themselves with zero error") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", m = 4, ksub = 16)
    assert(enc.count() == emb.count(), "one code row per vector")
    assert(enc.filter(size(col("codes")) =!= 4).count() == 0)
    // the 16 smallest-id vectors ARE the centroids: each must encode
    // to its own code in every subspace with exactly zero residual
    val own = enc.filter(col("vec_id") < 16).orderBy("vec_id").collect()
    own.zipWithIndex.foreach { case (r, i) =>
      assert(r.getSeq[Long](1) == Seq.fill(4)(i.toLong),
        s"centroid $i self-code: ${r.getSeq[Long](1)}")
      assert(r.getDouble(2) == 0.0, s"centroid $i residual ${r.getDouble(2)}")
    }
    // everyone else has a strictly positive residual
    assert(enc.filter(col("vec_id") >= 16 && col("quant_err") <= 0.0).count() == 0)
  }

  test("PQ ADC: a centroid query's own cell ranks first; k rows per query") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val top = Similarity.pqAdcTopK(emb, "vec_id", "embedding",
      Seq(0L, 7L, 42L), k = 5, m = 4, ksub = 16)
    val byQ = top.groupBy("query_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byQ == Map(0L -> 5L, 7L -> 5L, 42L -> 5L), byQ.toString)
    // query 7 is itself a codebook vector: LUT distance to its own
    // codes is 0, so every vector sharing all 4 of its codes —
    // in particular none can beat approx_dist of a vector encoded
    // onto centroid 7 in all subspaces; ranks are strictly ordered
    val r7 = top.filter(col("query_id") === 7L).orderBy("rank").collect()
    assert(r7.map(_.getDouble(3)).toSeq ==
      r7.map(_.getDouble(3)).sorted.toSeq, "approx_dist ascending by rank")
    assert(r7.forall(_.getDouble(3) >= 0.0), "L2² distances are non-negative")
    // ADC agrees with exhaustive reconstruction: approximate distance
    // of (query, v) = sum of LUT entries of v's codes — spot-check one
    // pair against the encode relation by recomputation
    val probe = top.filter(col("query_id") === 0L && col("rank") === 1L)
      .select("vec_id").collect().head.getLong(0)
    assert(probe != 0L, "self is excluded from results")
  }

  // driver-side reference of the t53 audio fingerprint contract:
  // stretched 64-bin energies of the PCM (= text bytes), strict
  // above-mean bits
  private def refAudioFp(bytes: Array[Byte]): Long = {
    val e = new Array[Long](64)
    bytes.zipWithIndex.foreach { case (b, k) =>
      val d = (b & 0xff) - 128
      e((k.toLong * 64 / bytes.length).toInt) += d.toLong * d
    }
    val mean = e.sum / 64
    e.zipWithIndex.foldLeft(0L) { case (h, (v, i)) =>
      if (v > mean) h | (1L << i) else h
    }
  }

  test("t53 audio fp: real WAV decode matches a direct recomputation from text") {
    import org.apache.spark.sql.functions._
    import graft.queries.TrainingData
    val docs = Tables.documents(spark, dir)
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
    val text = docs.select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Multimodal.audioFingerprint(
      Multimodal.withWavPayload(docs, "doc_id", "text"), "doc_id").collect()
    assert(rows.length == text.size)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("decoded")),
        "every fixture WAV must decode through the real RIFF walk")
      val bytes = text(r.getLong(r.fieldIndex("doc_id"))).getBytes("UTF-8")
      assert(r.getLong(r.fieldIndex("afp")) == refAudioFp(bytes))
    }
    // the non-audio fallback path still fingerprints (flagged)
    val junk = spark.createDataFrame(Seq((1L, "definitely not audio")))
      .toDF("doc_id", "text")
    val fb = Multimodal.audioFingerprint(
      Multimodal.withPayload(junk, "doc_id", "text"), "doc_id").collect().head
    assert(!fb.getBoolean(fb.fieldIndex("decoded")))
    assert(fb.getLong(fb.fieldIndex("afp")) ==
      refAudioFp("definitely not audio".getBytes("UTF-8")))
  }

  test("t53 audio fp dedup: every planted twin pair is recalled") {
    import org.apache.spark.sql.functions._
    import graft.queries.TrainingData
    val pairs = TrainingData.docAudioFpDedup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val stride = TrainingData.TwinStride
    val docs = Tables.documents(spark, dir)
      .filter(length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // verbatim twins: hamming 0, always paired
    val exactTwins = docs.filter(_ % 9 == 2)
    exactTwins.foreach { id =>
      val hit = pairs.find(p => p._1 == id && p._2 == id + stride)
      assert(hit.isDefined, s"verbatim twin of $id not paired")
      assert(hit.get._3 == 0L, s"verbatim twin of $id at hamming ${hit.get._3}")
    }
    // perturbed twins: one sample changed -> within the banding bound
    val nearTwins = docs.filter(_ % 9 == 5)
    nearTwins.foreach { id =>
      val hit = pairs.find(p => p._1 == id && p._2 == id + 2 * stride)
      assert(hit.isDefined, s"perturbed twin of $id not paired")
      assert(hit.get._3 <= TrainingData.AudioFpMaxHamming)
    }
    assert(exactTwins.nonEmpty && nearTwins.nonEmpty, "vacuous fixture")
  }

  test("t54 HLL: registers and estimate match a driver-side reference; " +
      "estimate lands within the theoretical error band") {
    val texts = Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    // independent reference: same tokens/3-grams/hash stream as KMV
    val grams = texts.flatMap { t =>
      val ts = t.trim.split("\\s+").toSeq
      if (ts.length < 3) Seq.empty[String]
      else ts.sliding(3).map(_.mkString(" ")).toSeq
    }
    val hs = grams.map(g =>
      (PolyHash.eval(g) * 2654435761L + 123456789L) % 4294967296L)
    val regs = new Array[Int](256)
    hs.foreach { h =>
      val b = (h % 256).toInt
      val rem = h / 256
      val rho = if (rem == 0) 25
        else 25 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
      if (rho > regs(b)) regs(b) = rho
    }
    val zScaled = regs.map(r => 1L << (25 - r)).sum
    val nZero = regs.count(_ == 0)
    val est = math.floor(0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 *
      (1L << 25).toDouble / zScaled.toDouble).toLong
    val exact = hs.distinct.length.toLong
    val row = graft.queries.TrainingData.docHllSketch(spark, dir).collect().head
    assert(row.getLong(row.fieldIndex("p")) == 8L)
    assert(row.getLong(row.fieldIndex("m")) == 256L)
    assert(row.getLong(row.fieldIndex("n_zero_regs")) == nZero.toLong)
    assert(row.getLong(row.fieldIndex("z_scaled")) == zScaled)
    assert(row.getLong(row.fieldIndex("est_distinct")) == est)
    assert(row.getLong(row.fieldIndex("exact_distinct")) == exact)
    // 1.04/sqrt(256) = 6.5% standard error; 3 sigma = ~20%
    assert(math.abs(est - exact).toDouble / exact < 0.20,
      s"HLL estimate $est vs exact $exact drifted past 3 sigma")
  }

  test("energyFp64 fuzz: imperative bins equal an independent functional " +
      "fold over full-range bytes (the fixture only exercises ASCII)") {
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { _ =>
      val n = rnd.nextInt(300)
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      val ref = {
        val bins = bytes.zipWithIndex
          .groupBy { case (_, k) => (k.toLong * 64 / math.max(n, 1)).toInt }
          .map { case (b, xs) => b -> xs.map { case (v, _) =>
            val d = (v & 0xff) - 128; d.toLong * d }.sum }
        val mean = bins.values.sum / 64
        (0 until 64).foldLeft(0L) { (h, b) =>
          if (bins.getOrElse(b, 0L) > mean) h | (1L << b) else h }
      }
      assert(Multimodal.energyFp64(bytes) == ref)
    }
  }

  test("CM/Bloom probe constants stay overflow-free at the hash-space edge") {
    val maxBase = 2147483646L // PolyHash < 2^31
    CorpusOps.CmProbes.foreach { case (a, b) =>
      // the product must not wrap before the % 2^32 reduction
      assert(maxBase <= (Long.MaxValue - b) / a,
        s"probe ($a, $b) overflows at the PolyHash edge")
    }
  }

  test("t61 CM sketch: matches a driver-side reference; never undercounts") {
    val texts = Tables.documents(spark, dir)
      .select("text").collect().map(_.getString(0))
    val grams = texts.flatMap { t =>
      val ts = t.trim.split("\\s+").toSeq
      if (ts.length < 2) Seq.empty[String]
      else ts.sliding(2).map(_.mkString(" ")).toSeq
    }
    val counts = grams.groupBy(identity).map { case (g, xs) =>
      g -> xs.size.toLong }
    val width = 1024
    val counters = scala.collection.mutable.Map.empty[(Int, Long), Long]
    counts.foreach { case (g, c) =>
      CorpusOps.CmProbes.zipWithIndex.foreach { case ((a, b), j) =>
        val bucket = (PolyHash.eval(g) * a + b) % 4294967296L % width
        counters((j, bucket)) = counters.getOrElse((j, bucket), 0L) + c
      }
    }
    def est(g: String): Long =
      CorpusOps.CmProbes.zipWithIndex.map { case ((a, b), j) =>
        counters((j, (PolyHash.eval(g) * a + b) % 4294967296L % width))
      }.min
    val topRef = counts.toSeq.sortBy { case (g, c) => (-c, g) }.take(20)
    val got = graft.queries.TrainingData.docCmSketch(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.map(r => (r._1, r._2)).toSeq == topRef, "true top-20 diverged")
    got.foreach { case (g, cnt, e) =>
      assert(e == est(g), s"estimate for '$g' diverged: $e vs ${est(g)}")
      assert(e >= cnt, s"CM undercounted '$g': $e < $cnt")
    }
    assert(got.exists { case (_, cnt, e) => e > cnt },
      "vacuous fixture: no collision overcount at this width")
  }

  test("t60 perceptron: matches a driver-side unrolled reference and the " +
      "trained weights actually separate the labels through t45's scorer") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val f = 64
    // independent reference: same features, labels, and update rule
    def featsOf(t: String): Map[Int, Long] =
      t.trim.split("\\s+").toSeq
        .map(tk => (PolyHash.eval(tk) % f).toInt)
        .groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val rows = docs.map { case (_, t, lang) =>
      (if (lang == "en") 1L else -1L, featsOf(t)) }
    val w = Array.fill(f)(0L)
    for (_ <- 1 to 3) {
      val g = Array.fill(f)(0L)
      rows.foreach { case (y, x) =>
        val score = x.map { case (b, c) => c * w(b) }.sum
        if (y * score <= 0) x.foreach { case (b, c) => g(b) += y * c }
      }
      (0 until f).foreach(b => w(b) += g(b))
    }
    val got = graft.queries.TrainingData.docPerceptronTrain(spark, dir)
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    (0 until f).foreach(b =>
      assert(got(b) == w(b), s"bucket $b: ${got(b)} vs reference ${w(b)}"))
    // convergence on separable data: build a corpus whose positive
    // and negative classes use words with DISJOINT hash buckets —
    // round 1's everything-misclassified step already yields a
    // perfect separator, and every later round must be a fixed point
    val spark0 = spark
    import spark0.implicits._
    val cand = (0 until 300).map(i => s"tok$i")
    val byBucket = cand.groupBy(t => (PolyHash.eval(t) % f).toInt)
    val distinct = byBucket.values.map(_.head).toSeq.take(10)
    assert(distinct.size == 10, "need 10 bucket-distinct words")
    val (pos, neg) = distinct.splitAt(5)
    val sep = (0 until 40).map { i =>
      val ws = if (i % 2 == 0) pos else neg
      (i.toLong, (0 until 6).map(j => ws((i + j) % 5)).mkString(" "),
        i % 2 == 0)
    }.toDF("doc_id", "text", "is_pos")
    val w2 = CorpusOps.perceptronTrain(sep, "doc_id", "text",
      positive = col("is_pos"), f = f, rounds = 2).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val w5 = CorpusOps.perceptronTrain(sep, "doc_id", "text",
      positive = col("is_pos"), f = f, rounds = 5).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    assert(w2 == w5, "separable corpus must reach a fixed point")
    // the converged weights classify the corpus perfectly through
    // t45's inference operator (same featurization by construction)
    val scored = CorpusOps.hashedLinearScore(sep, "doc_id", "text",
        (0 until f).map(b => w2.getOrElse(b, 0L)), bias = 0L, threshold = 0L)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    sep.select("doc_id", "is_pos").collect().foreach { r =>
      assert(scored(r.getLong(0)) == r.getBoolean(1),
        s"doc ${r.getLong(0)} misclassified after convergence")
    }
  }

  test("t59 IVF-PQ: rows agree with the exhaustive ADC scan on distance; " +
      "probing only prunes, never rescores") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val qids = Seq(0L, 7L, 42L)
    val ivfpq = Similarity.ivfPqTopK(emb, "vec_id", "embedding", qids,
      k = 5, minNlist = 16, nprobe = 2, m = 4, ksub = 16).collect()
    // exhaustive ADC over the whole corpus at huge k = the reference
    val full = Similarity.pqAdcTopK(emb, "vec_id", "embedding", qids,
        k = 100000, m = 4, ksub = 16).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(ivfpq.nonEmpty, "no IVF-PQ results")
    ivfpq.foreach { r =>
      val key = (r.getLong(r.fieldIndex("query_id")),
        r.getLong(r.fieldIndex("vec_id")))
      val d = r.getDouble(r.fieldIndex("approx_dist"))
      assert(full.get(key).contains(d),
        s"IVF-PQ rescored $key: $d vs ${full.get(key)}")
    }
    // per query: <= k rows, contiguous ranks from 1
    ivfpq.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val ranks = rows.map(_.getLong(1)).sorted
      assert(ranks.length <= 5 && ranks.toSeq == (1L to ranks.length.toLong),
        s"query $q ranks $ranks")
    }
  }

  test("persisted IVF-PQ index: build-once search equals the one-shot " +
      "operator row-for-row") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val qids = Seq(0L, 7L, 42L)
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq")
      .resolve("index").toString
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", path,
      minNlist = 16, m = 4, ksub = 16)
    val fromIndex = Similarity.searchIvfPqIndex(spark, path,
      emb.filter(col("vec_id").isin(qids: _*)), "vec_id", "embedding",
      k = 5, nprobe = 2)
    val oneShot = Similarity.ivfPqTopK(emb, "vec_id", "embedding", qids,
      k = 5, minNlist = 16, nprobe = 2, m = 4, ksub = 16)
    assert(fromIndex.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(fromIndex).isEmpty,
      "persisted-index search diverges from the one-shot pipeline")
    assert(fromIndex.count() > 0)
  }

  test("inverted-index search prunes by the SPARK tokenization: " +
      "edge-whitespace terms keep their buckets") {
    import spark.implicits._
    // doc 2's text ends in a tab: Spark's trim strips only spaces, so
    // tokenization yields a trailing EMPTY term with a real posting.
    // A query carrying the same edge produces that term too — its
    // bucket must survive pruning, or the pruned search diverges from
    // the one-shot scorer (a driver-side String.trim/split
    // re-tokenization drops exactly this term)
    val docs = Seq((1L, "alpha beta"), (2L, "alpha gamma \t"))
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_invidx_ws")
      .resolve("index").toString
    CorpusOps.buildInvertedIndex(docs, "doc_id", "text", path)
    val queries = Seq(1L -> "gamma \t")
    val oneShot = CorpusOps.bm25TopK(docs, "doc_id", "text", queries,
      k1 = 1.2, b = 0.75, k = 10).orderBy("query_id", "rank").collect().toSeq
    val pruned = CorpusOps.searchInvertedIndex(spark, path, queries,
      k1 = 1.2, b = 0.75, k = 10).orderBy("query_id", "rank").collect().toSeq
    assert(oneShot.nonEmpty && pruned == oneShot,
      s"pruned search diverged on edge-whitespace terms: $pruned vs $oneShot")
  }

  test("repairInvertedIndexMeta rebuilds lost corpus stats from postings") {
    val docs = Tables.documents(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_invidx_rep")
      .resolve("index").toString
    CorpusOps.buildInvertedIndex(docs, "doc_id", "text", path)
    val before = spark.read.parquet(s"$path/meta").collect().head
    // simulate the crash window: meta gone, postings intact
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
    }
    rmrf(java.nio.file.Paths.get(s"$path/meta"))
    CorpusOps.repairInvertedIndexMeta(spark, path)
    val after = spark.read.parquet(s"$path/meta").collect().head
    assert(after.getLong(0) == before.getLong(0) &&
      after.getLong(1) == before.getLong(1),
      s"repaired meta $after diverges from the original $before")
  }

  test("searchIvfPqIndex fails loudly on a pre-cell-layout index") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq_old")
      .resolve("index").toString
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", path,
      minNlist = 16, m = 4, ksub = 16)
    // rewrite codes in the OLD unpartitioned (id, sub, code) layout
    val flat = spark.read
      .schema("id LONG, sub LONG, code LONG, cell LONG")
      .parquet(s"$path/codes")
      .select("id", "sub", "code").collect()
    import spark.implicits._
    val oldCodes = flat.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq.toDF("id", "sub", "code")
    oldCodes.write.mode("overwrite").parquet(s"$path/codes_old")
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmrf(java.nio.file.Paths.get(s"$path/codes"))
    java.nio.file.Files.move(java.nio.file.Paths.get(s"$path/codes_old"),
      java.nio.file.Paths.get(s"$path/codes"))
    val ex = intercept[IllegalArgumentException] {
      Similarity.searchIvfPqIndex(spark, path,
        emb.filter(col("vec_id") === 0L), "vec_id", "embedding", k = 5)
    }
    assert(ex.getMessage.contains("cell partition column"),
      s"expected the layout guard, got: ${ex.getMessage}")
  }

  test("phraseSearch: adjacency, word order, in-phrase duplicates, " +
      "multi-hit counting — hand-computed") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c a b"),   // "a b" at 0 and 3
      (2L, "b a c"),       // both words, never adjacent in order
      (3L, "a a a"),       // "a a" at 0 and 1 (2 overlaps, not 3)
      (4L, "x a b a y"))   // "a b a" at 1; "a b" at 1
      .toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_phrase")
      .resolve("index").toString
    CorpusOps.buildInvertedIndex(docs, "doc_id", "text", path)
    val got = CorpusOps.phraseSearch(spark, path,
        Seq(1L -> "a b", 2L -> "a b a", 3L -> "a a"), k = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val expect = Set(
      (1L, 1L, 1L, 2L), // q1 "a b": doc1 twice
      (1L, 2L, 4L, 1L), //           doc4 once; docs 2/3 never
      (2L, 1L, 4L, 1L), // q2 "a b a": only doc4
      (3L, 1L, 3L, 2L)) // q3 "a a": doc3's overlapping pair, twice
    assert(got == expect, s"got $got")
  }

  test("phraseSearch fails loudly on a pre-positional-postings index") {
    import spark.implicits._
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val path = java.nio.file.Files.createTempDirectory("graft_phrase_old")
      .resolve("index").toString
    CorpusOps.buildInvertedIndex(docs, "doc_id", "text", path)
    // strip positions, simulating an index persisted before the column
    val flat = spark.read.parquet(s"$path/postings")
      .select("term", "doc_id", "dl", "tf").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def rmrf(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
    rmrf(java.nio.file.Paths.get(s"$path/postings"))
    flat.toSeq.toDF("term", "doc_id", "dl", "tf")
      .write.parquet(s"$path/postings")
    val ex = intercept[IllegalArgumentException] {
      CorpusOps.phraseSearch(spark, path, Seq(1L -> "a b"), k = 5)
    }
    assert(ex.getMessage.contains("positions column"),
      s"expected the layout guard, got: ${ex.getMessage}")
  }

  test("t66 persisted inverted-index search reproduces t30 row-for-row") {
    val oneShot = queries.TrainingData.docBm25(spark, dir).collect().toSeq
    val fromIndex = queries.TrainingData.docBm25Index(spark, dir)
      .collect().toSeq
    assert(oneShot == fromIndex,
      s"t66 diverged from t30: ${fromIndex.diff(oneShot).take(5)}")
    assert(oneShot.nonEmpty)
  }

  test("inverted-index ingestion: build(head) + append(tail) searches " +
      "exactly like build(all)") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, dir)
    val full = java.nio.file.Files.createTempDirectory("graft_invidx_full")
      .resolve("index").toString
    // URI-style path: append's meta-existence check must go through
    // the HADOOP filesystem — a java.nio check reports false for
    // "file:/..." and silently resets meta to batch-only stats
    val inc = "file:" + java.nio.file.Files
      .createTempDirectory("graft_invidx_inc").resolve("index").toString
    CorpusOps.buildInvertedIndex(docs, "doc_id", "text", full)
    CorpusOps.buildInvertedIndex(docs.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", inc)
    CorpusOps.appendToInvertedIndex(spark, inc,
      docs.filter(col("doc_id") % 5 === 0), "doc_id", "text")
    val queries = Seq(1L -> "spark window join", 2L -> "hash merge batch")
    val a = CorpusOps.searchInvertedIndex(spark, full, queries,
      k1 = 1.2, b = 0.75, k = 10).orderBy("query_id", "rank").collect().toSeq
    val b = CorpusOps.searchInvertedIndex(spark, inc, queries,
      k1 = 1.2, b = 0.75, k = 10).orderBy("query_id", "rank").collect().toSeq
    assert(a.nonEmpty && a == b,
      s"incrementally-built index diverged: ${b.diff(a).take(5)}")
    // merged meta equals the full corpus stats exactly
    val mFull = spark.read.parquet(s"$full/meta").collect().head
    val mInc = spark.read.parquet(s"$inc/meta").collect().head
    assert(mFull.getLong(0) == mInc.getLong(0) &&
      mFull.getLong(1) == mInc.getLong(1))
  }

  test("t63 persisted search reproduces t59 row-for-row at the gate " +
      "parameters (m=8, ksub=64)") {
    val oneShot = queries.TrainingData.annIvfPq(spark, dir).collect().toSeq
    val persisted = queries.TrainingData.annIvfPqPersisted(spark, dir)
      .collect().toSeq
    assert(oneShot == persisted,
      s"t63 diverged from t59: ${persisted.diff(oneShot).take(5)}")
    assert(oneShot.nonEmpty)
  }

  test("t67 re-rank: exact cosine over exactly the ADC top-R candidates, " +
      "driver-differential") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val qids = Seq(0L, 7L, 42L)
    val path = java.nio.file.Files.createTempDirectory("graft_rerank")
      .resolve("index").toString
    Similarity.buildIvfPqIndex(emb, "vec_id", "embedding", path,
      minNlist = 16, m = 4, ksub = 16)
    val queries = emb.filter(col("vec_id").isin(qids: _*))
    val rr = Similarity.searchIvfPqIndexRerank(spark, path, queries, emb,
        "vec_id", "embedding", k = 5, rerank = 15)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rr.nonEmpty)
    val cand = Similarity.searchIvfPqIndex(spark, path, queries,
        "vec_id", "embedding", k = 15)
      .collect().map(r => r.getLong(0) -> r.getLong(2))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val vecs = emb.select(col("vec_id"),
        expr("transform(embedding, v -> cast(v as double))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos(a: Long, q: Long): Double = {
      val x = vecs(a); val y = vecs(q)
      dot(x, y) / (math.sqrt(dot(x, x)) * math.sqrt(dot(y, y)))
    }
    qids.foreach { q =>
      val expect = cand(q).toSeq.map(v => (cos(v, q), v))
        .sortBy { case (c, v) => (-c, v) }.take(5).zipWithIndex
        .map { case ((c, v), i) => (q, (i + 1).toLong, v, c) }
      val got = rr.filter(_._1 == q).sortBy(_._2).toSeq
      assert(got == expect, s"query $q: $got vs $expect")
    }
  }

  test("IVF-PQ ingestion: appended batch routed by the frozen quantizer, " +
      "differentially checked and searchable") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val path = java.nio.file.Files.createTempDirectory("graft_ivfpq_app")
      .resolve("index").toString
    Similarity.buildIvfPqIndex(emb.filter(col("vec_id") < 400), "vec_id",
      "embedding", path, minNlist = 16, m = 4, ksub = 16)
    val batch = emb.filter(col("vec_id") >= 400)
    Similarity.appendToIvfPqIndex(spark, path, batch, "vec_id", "embedding")
    // cell rides the partition directories; pin LONG as the operators do
    val cells = spark.read.schema("id LONG, cell LONG")
      .parquet(s"$path/cells")
    val codes = spark.read.schema("id LONG, sub LONG, code LONG, cell LONG")
      .parquet(s"$path/codes")
    assert(cells.count() == 500L, "cells must cover index + batch")
    assert(codes.count() == 500L * 4, "codes must cover index + batch")
    // differential: one appended vector's routing against the STORED
    // (80%-trained) quantizer, recomputed driver-side
    val cents = spark.read.parquet(s"$path/centroids").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2)))
    val cbRows = spark.read.parquet(s"$path/codebook").collect()
      .map(r => (r.getLong(r.fieldIndex("sub")), r.getLong(r.fieldIndex("code")),
        r.getSeq[Double](r.fieldIndex("cv")).toArray))
    val probeId = 453L
    val x = emb.filter(col("vec_id") === probeId)
      .select(expr("transform(embedding, v -> cast(v as double))"))
      .collect().head.getSeq[Double](0).toArray
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    val xn = math.sqrt(dot(x, x))
    val expectCell = cents.map { case (cid, ce, cn) =>
      (-(dot(x, ce) / (xn * cn)), cid) }.min._2
    val gotCell = cells.filter(col("id") === probeId)
      .collect().head.getLong(1)
    assert(gotCell == expectCell, s"cell $gotCell vs $expectCell")
    val dsub = x.length / 4
    (0 until 4).foreach { sub =>
      val sv = x.slice(sub * dsub, sub * dsub + dsub)
      val expectCode = cbRows.filter(_._1 == sub).map { case (_, code, cv) =>
        ((dot(sv, sv) - 2.0 * dot(sv, cv)) + dot(cv, cv), code) }.min._2
      val gotCode = codes
        .filter(col("id") === probeId && col("sub") === sub.toLong)
        .collect().head.getLong(2)
      assert(gotCode == expectCode, s"sub $sub: code $gotCode vs $expectCode")
    }
    // the appended vectors are searchable through the frozen index
    val hits = Similarity.searchIvfPqIndex(spark, path,
      emb.filter(col("vec_id") === probeId), "vec_id", "embedding", k = 5)
    assert(hits.count() > 0, "appended vector found no neighbors")
    assert(hits.filter(col("vec_id") === probeId).count() == 0,
      "self must stay excluded")
  }

  test("t58 curriculum order: contiguous permutation realizing " +
      "(bin desc, shuffle_key, doc_id)") {
    val rows = CorpusOps.curriculumOrder(
        Tables.documents(spark, dir), "doc_id", "text", nBins = 4,
        bucketBits = 6)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("order_idx")),
        r.getLong(r.fieldIndex("bin")),
        r.getLong(r.fieldIndex("shuffle_key")),
        r.getLong(r.fieldIndex("doc_id"))))
      .sortBy(_._1)
    // contiguous 1..N — the two-phase offsets left no gap and no dup
    assert(rows.map(_._1).toSeq == (1L to rows.length.toLong))
    // the realized order is exactly (bin desc, shuffle_key, doc_id)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 > b._2 ||
        (a._2 == b._2 && (a._3 < b._3 || (a._3 == b._3 && a._4 < b._4))),
        s"order violated between $a and $b")
    }
    assert(rows.map(_._2).distinct.length > 1,
      "vacuous fixture: a single quality bin exercises no bin boundary")
  }

  test("t57 cross-modal dedup: every modality branch reachable; fixture " +
      "verbatim twins land in 'both'") {
    import org.apache.spark.sql.functions._
    import graft.queries.TrainingData
    // synthetic docs engineered per branch. The pHash grid over a
    // len-1024 doc samples EXACTLY positions 128r + 4c (r,c in 0..7)
    // — all multiples of 4 — so a rewrite that only touches odd
    // positions is invisible to the image channel while rewriting
    // every word for the text channel.
    val unit = "foo bar baz qux "           // 16 chars, len 1024 total
    val imgA = unit * 64
    val imgB = imgA.zipWithIndex.map { case (ch, i) =>
      if (i % 4 == 1 && ch != ' ') (ch + 1).toChar else ch
    }.mkString
    assert(imgA.length == 1024 && imgB.length == 1024)
    // text-only: a LONG inserted prefix changes the length by ~10%,
    // so the stretched canvas re-samples every cell at a shifted
    // absolute offset (image channel sees noise), while the shingle
    // set stays ~82% shared (text channel pairs them)
    val words = (0 until 200).map(i => s"w$i").mkString(" ")
    val txtA = "start " + words
    val txtB = ("zz " * 40) + words
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq(
      (1L, imgA), (2L, imgB),               // image-only pair
      (10L, txtA), (11L, txtB),             // text-only pair
      (20L, "a perfectly identical doc right here"),
      (21L, "a perfectly identical doc right here") // both
    ).toDF("doc_id", "text")
    val got = TrainingData.crossModalDedup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(4)).toMap
    assert(got.get((1L, 2L)).contains("image"), s"got $got")
    assert(got.get((10L, 11L)).contains("text"), s"got $got")
    assert(got.get((20L, 21L)).contains("both"), s"got $got")
    // fixture: every verbatim twin pair must agree across channels
    val fix = TrainingData.docCrossModalDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(4)).toMap
    val stride = TrainingData.TwinStride
    val twins = Tables.documents(spark, dir)
      .filter(col("doc_id") % 9 === 2 && length(col("text")) > 0 &&
        octet_length(col("text")) === length(col("text")))
      .select("doc_id").collect().map(_.getLong(0))
    assert(twins.nonEmpty, "vacuous fixture")
    twins.foreach { id =>
      assert(fix.get((id, id + stride)).contains("both"),
        s"verbatim twin of $id not in 'both': ${fix.get((id, id + stride))}")
    }
  }

  test("t55 KMV set-ops: sketches and estimators match a driver-side " +
      "reference; union estimate lands within the error band") {
    val k = 200
    val byDoc = Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def hashes(side: Long): Set[Long] = byDoc.filter(_._1 % 2 == side)
      .flatMap { case (_, t) =>
        val ts = t.trim.split("\\s+").toSeq
        if (ts.length < 3) Seq.empty[String]
        else ts.sliding(3).map(_.mkString(" ")).toSeq
      }
      .map(g => (PolyHash.eval(g) * 2654435761L + 123456789L) % 4294967296L)
      .toSet
    val ha = hashes(0); val hb = hashes(1)
    val sa = ha.toSeq.sorted.take(k).toSet
    val sb = hb.toSeq.sorted.take(k).toSet
    val merged = (sa ++ sb).toSeq.sorted.take(k)
    val rho = merged.count(h => sa(h) && sb(h)).toLong
    def est(s: Set[Long]): Long =
      if (s.size < k) s.size.toLong
      else (k - 1).toLong * 4294967296L / s.max
    val estU = if (merged.size < k) merged.size.toLong
      else (k - 1).toLong * 4294967296L / merged.max
    val row = graft.queries.TrainingData.docKmvSetOps(spark, dir)
      .collect().head
    def g(n: String) = row.getLong(row.fieldIndex(n))
    assert(g("k") == k.toLong)
    assert(g("est_a") == est(sa), "side-A estimator diverged")
    assert(g("est_b") == est(sb), "side-B estimator diverged")
    assert(g("est_union") == estU, "union estimator diverged")
    assert(g("rho") == rho, "combined-bottom-k intersection count diverged")
    assert(g("est_intersect") ==
      (if (merged.size < k) rho else rho * estU / k))
    assert(g("exact_union") == (ha ++ hb).size.toLong)
    assert(g("exact_intersect") == (ha & hb).size.toLong)
    // union: 1/sqrt(k-1) = 7.1% sigma; 3 sigma = ~21%. The
    // intersection estimator's relative error scales as 1/sqrt(rho)
    // (~16% sigma at the fixture's rho) — assert 3-sigma-ish there too
    assert(math.abs(g("est_union") - g("exact_union")).toDouble /
      g("exact_union") < 0.21, s"union ${g("est_union")} vs ${g("exact_union")}")
    assert(g("exact_intersect") == 0 || rho == 0 ||
      math.abs(g("est_intersect") - g("exact_intersect")).toDouble /
        g("exact_intersect") < 3.0 / math.sqrt(rho.toDouble),
      s"intersect ${g("est_intersect")} vs ${g("exact_intersect")} at rho $rho")
  }

  test("t112 IVF margin mining: sound pairs, measured recall vs the exact baseline") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, dir)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.marginMutualPairs(
      emb, "vec_id", "embedding", col("label") % 2 === 0, k = 4))
    val ivf = pairs(Similarity.marginMutualPairsIvf(
      emb, "vec_id", "embedding", col("label") % 2 === 0, k = 4))
    assert(exact.nonEmpty && ivf.nonEmpty)
    // margins depend on neighborhood sums, which the probe-limited path
    // only approximates — overlap is the measured quality floor, not a
    // correctness contract (the DuckDB oracle gates the IVF contract
    // itself exactly). Measured: 0.41 at sf0.01, nprobe=2.
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.2, f"IVF margin recall collapsed: $recall%.2f")
  }

  test("shared LSH front end: every family consumer equals its standalone plan") {
    val docs = Tables.documents(spark, dir)
    val shared = operators.Dedup.lshCandidates(docs, "doc_id", "text")
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame, what: String): Unit =
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"$what diverged between shared and standalone front ends")
    same(operators.Dedup.minhashLsh(docs, "doc_id", "text", candOpt = Some(shared)),
      operators.Dedup.minhashLsh(docs, "doc_id", "text"), "minhashLsh")
    same(operators.Dedup.containmentPairs(docs, "doc_id", "text", candOpt = Some(shared)),
      operators.Dedup.containmentPairs(docs, "doc_id", "text"), "containmentPairs")
    same(operators.Dedup.editDistanceDedup(docs, "doc_id", "text", candOpt = Some(shared)),
      operators.Dedup.editDistanceDedup(docs, "doc_id", "text"), "editDistanceDedup")
    same(operators.Dedup.contrastivePairs(docs, "doc_id", "text", candOpt = Some(shared)),
      operators.Dedup.contrastivePairs(docs, "doc_id", "text"), "contrastivePairs")
  }

  test("t154 semantic leakage: a planted cross-split twin surfaces " +
      "as a leaked cell; shares sum to 1e6 minus floor dust") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    // find a train-split vector and clone it under an id that hashes
    // into a DIFFERENT split — the pair is a guaranteed semantic leak
    // (cosine exactly 1.0, same LSH bucket by construction)
    val sp = operators.CorpusOps.assignSplits(emb, "vec_id", 10, 10)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val srcId = sp.collectFirst { case (id, "train") => id }.get
    val twinId = (1L to 100000L).map(-_)
      .find(i => operators.CorpusOps.idMixLong(i) % 100 < 10).get // 'val'
    val twin = emb.filter(col("vec_id") === srcId)
      .withColumn("vec_id", lit(twinId))
    val cells = operators.CorpusOps.semanticSplitLeakage(
        emb.unionByName(twin), "vec_id", "embedding", threshold = 0.4)
      .collect()
    assert(cells.exists(r => r.getBoolean(3) &&
      r.getString(0) == "train" && r.getString(1) == "val"),
      s"planted train/val twin not surfaced: ${cells.toSeq}")
    assert(cells.map(_.getLong(4)).sum > 1000000L - cells.length &&
      cells.map(_.getLong(4)).sum <= 1000000L)
  }

  test("t153 IVF staleness: self-audit drifts exactly zero; shares " +
      "sum to 1e6 minus floor dust; a planted shift raises drift") {
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, dir)
    val d = java.nio.file.Files.createTempDirectory("graft_stale")
    val p = d.resolve("idx").toString
    val split = emb.filter(col("vec_id") % 10 === 0)
    Similarity.buildIvfPqIndex(split, "vec_id", "embedding", p,
      minNlist = 16, m = 4, ksub = 16)
    // auditing the index against ITS OWN snapshot: same frozen
    // centroids, same rows -> every cell drifts exactly 0
    val self = Similarity.ivfStalenessReport(spark, p, split,
      "vec_id", "embedding").collect()
    assert(self.nonEmpty && self.forall(_.getLong(5) == 0L),
      s"self-audit must read zero drift: ${self.map(_.getLong(5)).toSeq}")
    // ppm shares sum to 1e6 minus at most nlist floor crumbs
    val full = Similarity.ivfStalenessReport(spark, p, emb,
      "vec_id", "embedding").collect()
    val si = full.map(_.getLong(3)).sum
    val sc = full.map(_.getLong(4)).sum
    assert(si > 1000000L - full.length && si <= 1000000L, s"si=$si")
    assert(sc > 1000000L - full.length && sc <= 1000000L, s"sc=$sc")
    // planted drift: rotate every current vector one position — the
    // rotated corpus must read MORE total drift than the real one
    val rotated = emb.withColumn("embedding",
      concat(slice(col("embedding"), 2, 1 << 20),
        slice(col("embedding"), 1, 1)))
    val drifted = Similarity.ivfStalenessReport(spark, p, rotated,
      "vec_id", "embedding").collect()
    assert(drifted.map(_.getLong(5)).sum > full.map(_.getLong(5)).sum,
      "a rotated corpus must drift more than the genuine one")
  }

  test("t151 LSH curve: candidates and yield grow with band count; " +
      "the family row replays minhashLsh exactly") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val curve = operators.Dedup.lshParameterCurve(docs, "doc_id", "text")
      .orderBy("bands").collect()
    assert(curve.length == 3)
    // narrower band keys collide more: candidates and verified pairs
    // are non-decreasing in the band count (collision supersets)
    val cands = curve.map(_.getLong(2)).toSeq
    val ver = curve.map(_.getLong(3)).toSeq
    assert(cands == cands.sorted, s"candidates not monotone: $cands")
    assert(ver == ver.sorted, s"verified not monotone: $ver")
    // relative recall tops out at exactly 1e6 on the best choice
    assert(curve.map(_.getLong(5)).max == 1000000L)
    // the bands=16 row IS the family configuration: its verified
    // count equals the t06 operator's pair count
    val family = operators.Dedup.minhashLsh(docs, "doc_id", "text").count()
    assert(curve.last.getLong(3) == family,
      s"curve(16) ${curve.last.getLong(3)} != minhashLsh $family")
  }

  test("t149 recall audit: recall bounded and positive; a planted " +
      "exact twin is always recovered; probe set is deterministic") {
    import org.apache.spark.sql.functions._
    val rows = graft.queries.TrainingData.embRecallAudit(spark, dir)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.getLong(3) >= 0L && r.getLong(3) <= 1000000L))
    // the production LSH path recovers a nonzero share of exact
    // neighbors on the real table
    assert(rows.map(_.getLong(1)).sum > 0L)
    // planted twin: copy a probe's vector under a fresh id — it
    // shares EVERY sign bucket with its original and dominates at
    // cosine 1.0, so the probe's audit row must score >= 1 hit
    val emb = Tables.embeddings(spark, dir)
    val probeId = rows.head.getLong(0)
    val twin = emb.filter(col("vec_id") === probeId)
      .withColumn("vec_id", lit(-1L))
    val audited = operators.Similarity.annRecallAudit(
        emb.unionByName(twin), "vec_id", "embedding", k = 3, probeMod = 7L)
      .filter(col("vec_id") === probeId).collect()
    assert(audited.length == 1 && audited(0).getLong(1) >= 1L,
      s"planted exact twin not recovered: ${audited.toSeq}")
    // deterministic: identical probe ids and hit counts on re-run
    val again = graft.queries.TrainingData.embRecallAudit(spark, dir)
      .collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("t145 class scatter: hand-computed basis-vector fixture; full " +
      "matrix with non-negative masses on the real table") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two orthogonal unit-basis clusters: within-scatter exactly 0,
    // between-scatter exactly 2 (||e_i - e_j||^2 for orthonormal
    // vectors) -> 2e6 at the 1e6 fixed point, floors exact
    def basis(d: Int): Seq[Float] =
      (0 until 64).map(i => if (i == d) 1.0f else 0.0f)
    val fix = Seq(
      (0L, basis(0), 0), (1L, basis(0), 0),
      (2L, basis(1), 1), (3L, basis(1), 1),
      (4L, Seq.fill(64)(0.0f), 1)) // zero vector: excluded, no direction
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.classScatter(fix, "vec_id", "embedding", "label")
      .orderBy("label_a", "label_b").collect()
    assert(got.length == 3)
    val within = got.filter(_.getBoolean(4))
    val between = got.filterNot(_.getBoolean(4))
    assert(within.forall(_.getLong(5) == 0L))
    assert(between.length == 1 && between(0).getLong(5) == 2000000L)
    // zero vector excluded: label 1 population reads 2, not 3
    assert(got.filter(r => r.getLong(0) == 1L && r.getLong(1) == 1L)
      .head.getLong(2) == 2L)
    // real table: 10 labels -> full 55-cell upper triangle, every mean
    // squared distance of unit vectors in [0, 4e6]
    val real = graft.queries.TrainingData.embClassScatter(spark, dir)
      .collect()
    assert(real.length == 55)
    assert(real.forall(r => r.getLong(5) >= 0L && r.getLong(5) <= 4000000L))
    assert(real.count(_.getBoolean(4)) == 10)
  }

  test("t169 holdout refresh: both epochs fill the exact Hamilton " +
      "budget, admitted == evicted per source, the leakage guard " +
      "holds, and the draw is reproducible") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.TrainingData.docHoldoutRefresh(spark, dir)
      .collect().toSeq
    assert(got.nonEmpty)
    val bySource = got.groupBy(_.getAs[String]("source"))
    for ((src, rows) <- bySource) {
      val alloc = rows.head.getAs[Long]("alloc")
      val held = rows.count(_.getAs[String]("status") == "held")
      val admitted = rows.count(_.getAs[String]("status") == "admitted")
      val evicted = rows.count(_.getAs[String]("status") == "evicted")
      // both epochs realize exactly the source's seat count
      assert(held + admitted == alloc,
        s"$src: new holdout ${held + admitted} != alloc $alloc")
      assert(held + evicted == alloc,
        s"$src: prev holdout ${held + evicted} != alloc $alloc")
      // the rotation invariant: what leaves equals what enters
      assert(admitted == evicted, s"$src: admitted $admitted != evicted $evicted")
      // rank_new present iff the doc is in the NEW holdout
      assert(rows.forall(r =>
        (r.getAs[String]("status") != "evicted") == !r.isNullAt(3)))
    }
    // total budget: the new holdout fills all 200 seats
    assert(got.count(_.getAs[String]("status") != "evicted") == 200)
    // all three statuses realized (the refresh actually rotates AND
    // actually keeps a core)
    assert(Set("held", "admitted", "evicted").subsetOf(
      got.map(_.getAs[String]("status")).toSet))
    // leakage guard: no selected doc is a near-dup pair endpoint
    val docs = Tables.documents(spark, dir)
    val members = graft.operators.Dedup.minhashLsh(docs, "doc_id",
        "text", 3, 64, 16, 0.5)
      .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(got.forall(r => !members.contains(r.getAs[Long]("doc_id"))),
      "a near-dup cluster member reached the holdout")
    // deterministic: the same epochs replay the same relation
    val again = graft.queries.TrainingData.docHoldoutRefresh(spark, dir)
      .collect().toSeq
    assert(again == got, "holdout refresh must be reproducible")
  }
}
