package graft

import graft.ops.{TextOps, VectorOps}
import org.scalatest.funsuite.AnyFunSuite

/** Scale-shape contracts of the training-data pipeline ops:
  *  - ngramJaccard candidates come from MinHash bands, not min-shingle
  *    blocking — a near-dup pair whose min shingles differ is still found
  *    (the round-1 blocking missed exactly those);
  *  - annIvf's k-means probe keeps high recall vs the exact baseline. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ngramJaccard finds a near-dup pair whose min shingles differ") {
    // b is a near-dup of a (first token changed): its lexicographic-min
    // shingle differs from a's, so min-shingle blocking would miss the pair.
    val a = "alpha beta gamma delta epsilon theta kappa lambda mu nu xi omicron"
    val b = "zeta beta gamma delta epsilon theta kappa lambda mu nu xi omicron"
    val docs = Seq((0L, a), (1L, b), (2L, "totally unrelated words about ships and rivers flowing north"))
      .toDF("doc_id", "text")
    // sanity: the old blocking key (min shingle) really differs
    val shA = graft.analysis.TextHash.shingles(graft.analysis.Analyzer.tokenizeRaw(a)).min
    val shB = graft.analysis.TextHash.shingles(graft.analysis.Analyzer.tokenizeRaw(b)).min
    assert(shA != shB)
    val pairs = TextOps.ngramJaccardOver(docs, 0.5)
      .select("a", "b", "jaccard").as[(Long, Long, Double)].collect()
    assert(pairs.exists { case (x, y, j) => x == 0L && y == 1L && j >= 0.8 },
      s"near-dup (0,1) not found; got ${pairs.mkString(", ")}")
  }

  test("connectedComponents labels every member with the component min id") {
    // chain 1-2-3-4 (diameter 3: exercises multi-round propagation),
    // separate pair 7-9, clique 10-11-12, singleton 20 not in any pair
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (7L, 9L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("a", "b")
    val got = TextOps.connectedComponents(pairs)
      .as[(Long, Long, Boolean)].collect().sortBy(_._1)
    val want = Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false), (4L, 1L, false),
      (7L, 7L, true), (9L, 7L, false),
      (10L, 10L, true), (11L, 10L, false), (12L, 10L, false))
    assert(got.toSeq == want, s"got ${got.mkString(", ")}")
  }

  test("connectedComponents ≡ driver-side union-find on random graphs") {
    val rnd = new scala.util.Random(20260818L)
    for (trial <- 0 until 4) {
      val nNodes = 20 + rnd.nextInt(60)
      val edges = Seq.fill(10 + rnd.nextInt(80)) {
        val a = rnd.nextInt(nNodes).toLong
        val b = rnd.nextInt(nNodes).toLong
        if (a < b) (a, b) else (b, a)
      }.filter { case (a, b) => a != b }.distinct
      // oracle: classic union-find with path compression
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap { case (a, b) => Seq(a, b) }.distinct
      val want = nodes.map(n => (n, find(n))).sortBy(_._1)
      val got = TextOps.connectedComponents(edges.toDF("a", "b"))
        .as[(Long, Long, Boolean)].collect().map(r => (r._1, r._2)).sortBy(_._1)
      assert(got.toSeq == want, s"[trial $trial] components diverge from union-find")
    }
  }

  test("dupClusters keep flags exactly one representative per cluster") {
    val cl = TextOps.dupClusters(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Boolean)].collect()
    assert(cl.nonEmpty) // sf0.001 carries near-dup docs by construction
    val byCluster = cl.groupBy(_._2)
    byCluster.foreach { case (c, members) =>
      assert(members.count(_._3) == 1, s"cluster $c keep-count != 1")
      assert(members.map(_._1).min == c, s"cluster $c label is not the min member")
    }
  }

  test("simHashPairs banded candidates are exhaustive for hamming <= 3") {
    // brute-force ALL pairs at hamming <= 3 over sf0.001 and require the
    // banded op to find exactly that set (pigeonhole: 4 bands, <= 3
    // differing bits => >= 1 band agrees, so banding loses nothing)
    val sf = "/root/testdata/sf0.001"
    val sh = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) =>
        (id, graft.analysis.TextHash.simHash63(
          graft.analysis.Analyzer.termFreqs(graft.analysis.Analyzer.tokenizeRaw(t))))
      }
    val brute = (for {
      i <- sh.indices; j <- (i + 1) until sh.length
      h = java.lang.Long.bitCount(sh(i)._2 ^ sh(j)._2)
      if h <= 3
      (a, b) = if (sh(i)._1 < sh(j)._1) (sh(i)._1, sh(j)._1) else (sh(j)._1, sh(i)._1)
    } yield (a, b, h.toLong)).toSet
    val banded = TextOps.simHashPairs(spark, sf, 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(banded == brute,
      s"banded ${banded.size} vs brute ${brute.size}; missing ${(brute -- banded).take(5)}")
    assert(brute.nonEmpty, "fixture corpus should contain near-dup simhashes")
  }

  test("annIvf recall@10 vs exact cosTopK on sf0.1 embeddings") {
    val sf = "/root/testdata/sf0.1"
    val exact = VectorOps.cosTopK(spark, sf, 0L, 10)
      .select("vec_id").as[Long].collect().toSet
    val approx = VectorOps.annIvf(spark, sf, 0L, 10, 2)
      .select("vec_id").as[Long].collect().toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    info(s"recall@10 (nprobe=2/8) = $recall")
    assert(recall >= 0.9, s"recall $recall < 0.9")
  }

  test("quantizeMilli ≡ the SQL round(x·1000) expression on floats") {
    // the fused band-key kernel quantizes inside the UDF; its rounding must
    // be bit-identical to the round(cast(x as double) * 1000) expression
    // the DuckDB oracle mirrors — including decimal-halfway floats
    // (0.0625f · 1000 = 62.5 exactly) and negatives (HALF_UP is
    // half-AWAY-FROM-ZERO: -62.5 → -63)
    import org.apache.spark.sql.functions.{col, expr}
    val rnd = new scala.util.Random(3)
    val adversarial = Seq(0.0625f, -0.0625f, 0.1875f, -0.1875f, 0.5f, -0.5f,
      0.0005f, -0.0005f, 1.0005f, -1.0005f, 0.0f, 1e-8f, -1e-8f, 0.9995f)
    val xs = adversarial ++ Seq.fill(20000)((rnd.nextDouble() * 2 - 1).toFloat)
    val viaSql = xs.toDF("x")
      .select(col("x"),
        expr("cast(round(cast(x as double) * 1000, 0) as bigint)").as("q"))
      .collect().map(r => (r.getFloat(0), r.getLong(1)))
    viaSql.foreach { case (x, q) =>
      assert(VectorOps.quantizeMilli(x) == q,
        s"quantizeMilli($x) = ${VectorOps.quantizeMilli(x)} but SQL round gives $q")
    }
  }

  test("similarPairs is deterministic and label-free") {
    val sf = "/root/testdata/sf0.1"
    val p1 = VectorOps.similarPairs(spark, sf, 10).collect().toSeq
    val p2 = VectorOps.similarPairs(spark, sf, 10).collect().toSeq
    assert(p1 == p2 && p1.size == 10)
    info(s"top cos = ${p1.head.getAs[Double]("cos")}, #10 cos = ${p1.last.getAs[Double]("cos")}")
    // output is ordered by similarity, pairs canonical (a < b)
    val cosines = p1.map(_.getAs[Double]("cos"))
    assert(cosines == cosines.sortBy(-_))
    assert(p1.forall(r => r.getAs[Long]("a") < r.getAs[Long]("b")))
  }

  test("repetition: bigram dup/top fractions on known fixtures") {
    val docs = Seq(
      (0L, "a b a b a b"), // bigrams: ab,ba,ab,ba,ab → n=5, distinct=2, top=3
      (1L, "one two three four"), // all distinct → dup 0, top 1/3
      (2L, "single"), // <2 tokens → zeros
      (3L, "")
    ).toDF("doc_id", "text")
    val rows = TextOps.repetitionOver(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(2), x.getDouble(3)))).toMap
    assert(rows(0L) == ((5L, 0.6, 0.6)))
    assert(rows(1L) == ((3L, 0.0, 0.3333)))
    assert(rows(2L) == ((0L, 0.0, 0.0)))
    assert(rows(3L) == ((0L, 0.0, 0.0)))
  }

  test("decontaminate flags only non-eval docs sharing a shingle with the eval slice") {
    // evalMod=13, evalRem=7 → doc 7 is the eval slice
    val docs = Seq(
      (7L, "the secret benchmark answer sequence here"),
      (1L, "prefix words then secret benchmark answer trailing"), // shares shingles with 7
      (2L, "completely different content with no overlap at all"),
      (21L, "benchmark answer sequence appears here too") // shares 'benchmark answer sequence'
    ).toDF("doc_id", "text")
    val hits = TextOps.decontaminateOver(docs, 13L, 7L)
      .as[(Long, Long)].collect().toMap
    assert(hits.contains(1L) && hits(1L) >= 1L)
    assert(hits.contains(21L) && hits(21L) >= 1L)
    assert(!hits.contains(2L), s"doc 2 shares no shingle; got $hits")
    assert(!hits.contains(7L), "the eval doc itself must not be flagged")
  }

  test("stratifiedSample is deterministic and matches the hash predicate exactly") {
    val sf = "/root/testdata/sf0.001"
    val rates = Map("src0" -> 0.75, "src3" -> 0.25)
    val kept = TextOps.stratifiedSample(spark, sf, rates, 0.5)
      .as[(Long, String)].collect()
    val kept2 = TextOps.stratifiedSample(spark, sf, rates, 0.5)
      .as[(Long, String)].collect()
    assert(kept.toSeq == kept2.toSeq, "sampling must be reproducible")
    // recompute the predicate driver-side over the full table
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").as[(Long, String)].collect()
    val expect = all.filter { case (id, src) =>
      val thr = math.round(rates.getOrElse(src, 0.5) * 10000).toInt
      graft.analysis.TextHash.polyHash31(s"smpl:$id") % 10000 < thr
    }.sortBy(_._1)
    assert(kept.toSeq == expect.toSeq)
    assert(kept.nonEmpty && kept.length < all.length)
  }

  test("filterPipeline keep ≡ conjunction of the standalone ops' thresholds") {
    val sf = "/root/testdata/sf0.001"
    val fp = TextOps.filterPipeline(spark, sf, Set("en"), 30L, 0.35, 0.05)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))).toMap
    // cross-check against the standalone ops (three scans vs one)
    val lang = TextOps.langId(spark, sf).as[(Long, String)].collect().toMap
    val qual = TextOps.quality(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    val rep = TextOps.repetition(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val total = fp.size
    assert(total == lang.size)
    fp.foreach { case (id, (pl, n, q, dup, keep)) =>
      assert(pl == lang(id), s"doc $id lang")
      assert(n == qual(id)._1 && q == qual(id)._2, s"doc $id quality")
      assert(dup == rep(id), s"doc $id dup_frac")
      val expect = pl == "en" && n >= 30L && q >= 0.35 && dup <= 0.05
      assert(keep == expect, s"doc $id keep")
    }
    val kept = fp.count(_._2._5)
    info(s"kept $kept / $total")
    assert(kept > 0 && kept < total, "thresholds must split the corpus")
  }

  test("embedCluster assigns every vector to one of K stable clusters") {
    val sf = "/root/testdata/sf0.001"
    val a1 = VectorOps.embedCluster(spark, sf).as[(Long, Int)].collect()
    val a2 = VectorOps.embedCluster(spark, sf).as[(Long, Int)].collect()
    assert(a1.toSeq == a2.toSeq, "assignment must be deterministic")
    val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(a1.length.toLong == n, "every vector exactly once")
    assert(a1.forall { case (_, k) => k >= 0 && k < VectorOps.KmeansK })
    assert(a1.map(_._2).distinct.length > 1, "more than one cluster in use")
  }

  test("SimilarityConfig knobs are real: more MinHash bands only add recall") {
    import graft.ops.SimilarityConfig
    val sf = "/root/testdata/sf0.001"
    // k=16 keeps the first 8 permutations (bands 0-3 identical to the
    // default) and ADDS bands 4-7 — candidates can only grow
    val d8 = TextOps.minHashPairs(spark, sf).as[(Long, Long)].collect().toSet
    val d16 = TextOps.minHashPairs(spark, sf, SimilarityConfig(minHashK = 16))
      .as[(Long, Long)].collect().toSet
    assert(d8.subsetOf(d16), s"k8 pairs missing at k16: ${(d8 -- d16).take(5)}")
    // wider embedding bands (48 bits, 12 rows/band) shrink buckets: the
    // candidate set can only shrink, and survivors stay cosine-ordered
    val p48 = VectorOps.similarPairs(spark, sf, 10, SimilarityConfig(lshBits = 48))
      .select("a", "b").as[(Long, Long)].collect().toSet
    val p32 = VectorOps.similarPairs(spark, sf, 10)
      .select("a", "b").as[(Long, Long)].collect().toSet
    info(s"pairs: k8=${d8.size} k16=${d16.size}, lsh32=${p32.size} lsh48=${p48.size}")
    assert(p48.nonEmpty, "48-bit banding should still find the near-dup clusters")
  }

  test("SimilarityConfig.forCorpus scales the key spaces with corpus size") {
    import graft.ops.SimilarityConfig
    val small = SimilarityConfig.forCorpus(5000L)
    assert(small.lshRows >= 13, s"rows ${small.lshRows} too small for 5k docs")
    assert(small.kmeansK >= 64 && small.kmeansK <= 80, s"nlist ≈ √n (got ${small.kmeansK})")
    val big = SimilarityConfig.forCorpus(100000000L) // 100M docs
    assert(big.lshRows > small.lshRows, "rows must grow with n")
    assert(big.minHashK == 16, "large corpora get more MinHash bands")
    assert(big.kmeansK == math.round(math.sqrt(1e8)).toInt)
    // every generated config is itself valid (requires pass)
    Seq(1L, 100L, 1000000L, 10000000000L).foreach(SimilarityConfig.forCorpus)
  }

  test("language ID votes across en/fr/de/es/it; no function words → und") {
    import graft.ops.TextOps.predictLang
    assert(predictLang("the quick brown fox jumps over the lazy dog") == "en")
    assert(predictLang("le chat est sur la table dans la maison") == "fr")
    assert(predictLang("die Katze ist auf dem Tisch und der Hund auch") == "de")
    assert(predictLang("el gato está sobre la mesa porque quiere comer algo") == "es")
    assert(predictLang("il gatto è sul tavolo perché vuole mangiare qualcosa") == "it")
    assert(predictLang("zxqv 12345 blorp") == "und")
    assert(predictLang("") == "und")
  }

  test("chunks: strided windows tile every doc; hashes match a driver recompute") {
    import graft.analysis.{Analyzer, TextHash}
    val sf = "/root/testdata/sf0.001"
    val (window, stride) = (64, 48)
    val got = TextOps.chunks(spark, sf, window, stride)
      .as[(Long, Long, Long, Long)].collect().groupBy(_._1)
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got.nonEmpty)
    texts.foreach { case (id, t) =>
      val toks = Analyzer.tokenizeRaw(t)
      val want = (0 until toks.length by stride).map { st =>
        val c = toks.slice(st, math.min(st + window, toks.length))
        (id, (st / stride).toLong, c.length.toLong, TextHash.polyHash31(c.mkString(" ")))
      }
      assert(got.getOrElse(id, Array.empty).sortBy(_._2).toSeq == want,
        s"doc $id chunk mismatch")
      // tiling: consecutive chunk starts advance by stride and cover [0, n)
      if (toks.nonEmpty)
        assert((want.size - 1) * stride < toks.length && want.last._3 >= 1)
    }
  }

  test("pmi rows reproduce from driver-side unigram/bigram counts") {
    import graft.analysis.Analyzer
    val sf = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").as[String].collect()
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bg = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val toks = Analyzer.tokenizeRaw(t)
      toks.foreach(w => uni(w) = uni.getOrElse(w, 0L) + 1L)
      toks.sliding(2).filter(_.length == 2)
        .foreach(p => bg((p(0), p(1))) = bg.getOrElse((p(0), p(1)), 0L) + 1L)
    }
    val (tu, tb) = (uni.values.sum, bg.values.sum)
    def micro(num: Long, den: Long): Long =
      math.round(10000.0 * math.log(num.toDouble / den))
    val minCount = 3L
    val want = bg.collect { case ((w1, w2), nab) if nab >= minCount =>
      (w1, w2, nab, (micro(tu, uni(w1)) + micro(tu, uni(w2)) - micro(tb, nab))
        .toDouble / 10000.0)
    }.toSet
    val got = TextOps.pmi(spark, sf, minCount)
      .as[(String, String, Long, Double)].collect().toSet
    assert(want.nonEmpty, "fixture corpus should carry repeated bigrams")
    assert(got == want, s"pmi mismatch; e.g. ${(want -- got).take(3)}")
  }

  test("nearDupEdit = simHashPairs verified by true edit distance") {
    val sf = "/root/testdata/sf0.001"
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    def lev(a: String, b: String): Int = {
      val prev = Array.range(0, b.length + 1)
      for (i <- 1 to a.length) {
        var diag = prev(0); prev(0) = i
        for (j <- 1 to b.length) {
          val cur = math.min(math.min(prev(j) + 1, prev(j - 1) + 1),
            diag + (if (a(i - 1) == b(j - 1)) 0 else 1))
          diag = prev(j); prev(j) = cur
        }
      }
      prev(b.length)
    }
    val maxEdit = 32
    val cand = TextOps.simHashPairs(spark, sf, 3)
      .as[(Long, Long, Long)].collect()
    val want = cand.flatMap { case (a, b, h) =>
      val d = lev(texts(a), texts(b))
      if (d <= maxEdit) Some((a, b, h, d.toLong)) else None
    }.toSet
    val got = TextOps.nearDupEdit(spark, sf, 3, maxEdit)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture corpus should contain verified near-dups")
    assert(got == want)
  }

  test("packChunks ≡ driver prefix sum over the chunk stream") {
    val sf = "/root/testdata/sf0.001"
    val budget = 100L
    val ch = TextOps.chunks(spark, sf, 64, 48)
      .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    var s = 0L
    val want = ch.map { case (d, c, n, _) =>
      val start = s; s += n
      (d, c, start / budget, start % budget)
    }.toSeq
    val got = TextOps.packChunks(spark, sf, 64, 48, budget)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == want)
    assert(got.head == ((got.head._1, got.head._2, 0L, 0L)))
    assert(got.forall(_._4 < budget))
  }

  test("dedupIncremental ≡ cross-boundary restriction of minHashPairs") {
    val sf = "/root/testdata/sf0.001"
    val (mod, rem) = (10L, 3L)
    val pairs = TextOps.minHashPairs(spark, sf).as[(Long, Long)].collect()
    def isNew(id: Long) = id % mod == rem
    val byNew = pairs.flatMap { case (a, b) =>
      if (isNew(a) && !isNew(b)) Some((a, b))
      else if (isNew(b) && !isNew(a)) Some((b, a))
      else None
    }.groupBy(_._1)
    val want = byNew.map { case (id, olds) =>
      (id, olds.length.toLong, olds.map(_._2).min)
    }.toSet
    val got = TextOps.dedupIncremental(spark, sf, mod, rem)
      .as[(Long, Long, Long)].collect().toSet
    assert(want.nonEmpty, "fixture corpus should have cross-batch collisions")
    assert(got == want)
  }

  test("substrDupSpans: cross-doc repeat, within-doc repeat, interval merge, sub-threshold miss") {
    // tokens t0..t29 are all distinct; the repeated phrase is p0..p9
    def toks(xs: Seq[String]) = xs.mkString(" ")
    val phrase = (0 until 10).map(i => s"p$i") // 10 tokens ≥ n=8
    val uniq = (i: Int, k: Int) => (i until i + k).map(j => s"u${j}x")
    val docs = Seq(
      // doc 0: phrase at positions 5..15 (cross-doc repeat with doc 1)
      (0L, toks(uniq(0, 5) ++ phrase ++ uniq(5, 5))),
      // doc 1: the same phrase TWICE, back to back at 3..13 and 13..23 —
      // the two repeats' shingle intervals touch, must merge to one span
      (1L, toks(uniq(100, 3) ++ phrase ++ phrase ++ uniq(103, 4))),
      // doc 2: a 7-token repeat of doc 0's tail — below n=8, no span
      (2L, toks(uniq(200, 6) ++ phrase.take(7) ++ uniq(206, 6))),
      // doc 3: all unique — no span
      (3L, toks(uniq(300, 20)))
    ).toDF("doc_id", "text")
    val got = TextOps.substrDupSpansOver(docs, 8)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 0: shingles at pos 5,6,7 are repeated (phrase windows fully
    // inside p0..p9) → span [5, 15)
    // doc 1: phrase×2 = p0..p9 p0..p9 at 3..23; every 8-window inside the
    // 20-token repeated block occurs elsewhere (doc 0 or the other copy);
    // the mixed windows spanning the seam (…p9 p0…) occur ONCE in the
    // corpus — but their intervals overlap the pure windows' intervals
    // only if duplicated, which they are not, so the span is the union of
    // duplicated windows: pos 3..15 → [3, 23)
    val d0 = got.filter(_._1 == 0L)
    assert(d0 == Seq((0L, 5L, 15L, 10L)), s"doc0 got $d0")
    val d1 = got.filter(_._1 == 1L)
    assert(d1.size == 1 && d1.head._2 == 3L && d1.head._3 == 23L, s"doc1 got $d1")
    assert(!got.exists(_._1 == 2L), s"doc2 span below threshold: $got")
    assert(!got.exists(_._1 == 3L), s"doc3 has no repeats: $got")
  }

  test("containment flags the subset pair Jaccard dilutes; symmetric dups score 1/1") {
    val core = (0 until 30).map(i => s"w$i").mkString(" ")
    val extra = (0 until 6).map(i => s"x$i").mkString(" ")
    val docs = Seq(
      (0L, core),                  // contained in 1 (cont_ab = 1.0)
      (1L, s"$core $extra"),       // superset of 0
      (2L, core),                  // exact twin of 0 → both directions 1.0
      (3L, "totally unrelated words about ships and rivers flowing north")
    ).toDF("doc_id", "text")
    val got = TextOps.containmentOver(docs, 0.9)
      .as[(Long, Long, Double, Double)].collect().toSeq.sortBy(p => (p._1, p._2))
    val m = got.map(p => (p._1, p._2) -> (p._3, p._4)).toMap
    assert(m.get((0L, 1L)).exists { case (ab, ba) => ab == 1.0 && ba < 0.9 },
      s"subset pair (0,1) wrong: $got")
    assert(m.get((0L, 2L)).contains((1.0, 1.0)), s"twin pair (0,2) wrong: $got")
    assert(!m.contains((0L, 3L)) && !m.contains((1L, 3L)), s"unrelated doc flagged: $got")
  }

  test("substrDedupApply removes exactly the span tokens; whole-doc duplicates vanish") {
    def toks(xs: Seq[String]) = xs.mkString(" ")
    val phrase = (0 until 10).map(i => s"p$i")
    val uniq = (i: Int, k: Int) => (i until i + k).map(j => s"u${j}x")
    val docs = Seq(
      (0L, toks(uniq(0, 5) ++ phrase ++ uniq(5, 5))),  // span [5,15) removed
      (1L, toks(phrase)),                              // whole doc duplicated → vanishes
      (2L, toks(phrase)),                              // its twin → vanishes
      (3L, toks(uniq(300, 12)))                        // untouched
    ).toDF("doc_id", "text")
    val got = TextOps.substrDedupApplyOver(docs, 8)
      .as[(Long, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(0L, 3L), s"got ids ${got.map(_._1)}")
    assert(got.head == ((0L, toks(uniq(0, 5) ++ uniq(5, 5)), 10L)), s"doc0 got ${got.head}")
    assert(got(1) == ((3L, toks(uniq(300, 12)), 12L)), s"doc3 got ${got(1)}")
  }
}
