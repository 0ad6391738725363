package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{DedupOps, SimilarityOps, TextOps}

/** Quality assertions for the dedup / similarity stack on planted data:
  * exact copies, near-duplicates (small edits), and clustered embeddings
  * with known ground truth — the approximate paths must actually recall.
  */
class DedupQualitySpec extends AnyFunSuite {

  private val spark = SparkSessionFixture.spark
  import spark.implicits._

  private val vocab = Seq("spark", "shuffle", "partition", "catalyst", "codegen",
    "frontier", "domain", "resolver", "banner", "redirect", "cuckoo", "filter",
    "politeness", "bucket", "salt", "checkpoint", "lineage", "manifest")

  private def mkDoc(seed: Long, words: Int = 60): String =
    (0 until words).map(i => vocab(Math.floorMod(TextOps.mix64(seed * 977 + i), vocab.size.toLong).toInt))
      .mkString(" ")

  private def edit(doc: String, nEdits: Int, seed: Long): String = {
    val toks = doc.split(" ")
    (0 until nEdits).foreach { e =>
      val pos = Math.floorMod(TextOps.mix64(seed + e), toks.length.toLong).toInt
      toks(pos) = "edited" + e
    }
    toks.mkString(" ")
  }

  // 12 base docs, each with one near-dup (2 edits) and one exact copy
  private lazy val corpus = {
    val rows = (0 until 12).flatMap { i =>
      val base = mkDoc(i.toLong)
      Seq((i * 10L, base),                        // base
        (i * 10L + 1, base),                      // exact copy
        (i * 10L + 2, edit(base, 2, i.toLong)))   // near-dup
    }
    rows.toDF("doc_id", "text")
  }

  test("exact dedup groups exact copies, and only them") {
    val groups = DedupOps.exactDupGroups(corpus, "doc_id", "text")
      .where($"n_copies" > 1).collect()
    assert(groups.length == 12)
    assert(groups.forall(_.getAs[Long]("n_copies") == 2))
    // keep-one policy retains the minimum id of each pair
    val kept = DedupOps.dedupedCorpus(corpus, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert((0 until 12).forall(i => kept.contains(i * 10L) && !kept.contains(i * 10L + 1)))
    assert((0 until 12).forall(i => kept.contains(i * 10L + 2))) // near-dups survive exact pass
  }

  test("MinHash LSH recalls all planted near-dup pairs with no cross-doc noise") {
    val pairs = DedupOps.minhashCandidatePairs(corpus, "doc_id", "text",
      shingleK = 3, bands = 4, rowsPerBand = 2)
      .as[(Long, Long)].collect().toSet
    (0 until 12).foreach { i =>
      val base = i * 10L
      assert(pairs.contains((base, base + 1)), s"exact pair of doc $i missed")
      assert(pairs.contains((base, base + 2)) || pairs.contains((base + 1, base + 2)),
        s"near-dup pair of doc $i missed")
    }
    // no pair joins two different base documents
    assert(pairs.forall { case (a, b) => a / 10 == b / 10 }, s"false positives: $pairs")
  }

  test("n-gram Jaccard verification separates near-dups from unrelated docs") {
    val j = DedupOps.ngramJaccardPairs(corpus, "doc_id", "text", shingleK = 3, minShared = 1)
      .select($"id_a", $"id_b", $"n_inter", $"n_union").as[(Long, Long, Long, Long)]
      .collect()
    val sameBase = j.filter { case (a, b, _, _) => a / 10 == b / 10 }
    val crossBase = j.filter { case (a, b, _, _) => a / 10 != b / 10 }
    assert(sameBase.nonEmpty)
    sameBase.foreach { case (_, _, inter, union) =>
      assert(inter.toDouble / union > 0.5, s"planted pair scored $inter/$union")
    }
    crossBase.foreach { case (a, b, inter, union) =>
      assert(inter.toDouble / union < 0.5, s"unrelated $a-$b scored $inter/$union")
    }
  }

  test("SimHash: near-dups within small Hamming distance, unrelated far") {
    (0 until 12).foreach { i =>
      val base = TextOps.simhash64(mkDoc(i.toLong).split(" ").toSeq)
      val near = TextOps.simhash64(edit(mkDoc(i.toLong), 2, i.toLong).split(" ").toSeq)
      assert(TextOps.hamming64(base, near) <= 12)
    }
    // docs from the SAME small vocabulary legitimately hash close (bag-of-
    // words similarity is real); truly unrelated content must be far
    val h0 = TextOps.simhash64(mkDoc(0L).split(" ").toSeq)
    val otherVocab = (0 until 60).map(i => s"tok${TextOps.mix64(i.toLong) & 0xff}")
    val far = TextOps.hamming64(h0, TextOps.simhash64(otherVocab))
    assert(far > 20, s"disjoint-vocab doc too close: $far")
    // and near-dups are strictly closer than same-vocab reshuffles
    val nearD = TextOps.hamming64(h0,
      TextOps.simhash64(edit(mkDoc(0L), 2, 0L).split(" ").toSeq))
    val reshuffleD = (1 until 12).map(i =>
      TextOps.hamming64(h0, TextOps.simhash64(mkDoc(i.toLong).split(" ").toSeq))).min
    assert(nearD < reshuffleD, s"near=$nearD not closer than reshuffle=$reshuffleD")
  }

  test("duplicateSpanStats: hand-computed span counts, short docs survive as (0,0)") {
    // window = 3 over whitespace-lowercased tokens:
    //   d1 "a b c d e"      spans {abc, bcd, cde}
    //   d2 "x y A B C D q"  spans {xya, yab, abc, bcd, cdq} — shares abc,
    //                       bcd with d1 CASE-INSENSITIVELY
    //   d3 "p p p p"        spans {ppp, ppp} — duplicated WITHIN the doc
    //   d4 "s t"            shorter than the window → (0, 0), row kept
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x y A B C D q"),
      (3L, "p p p p"),
      (4L, "s t")).toDF("doc_id", "text")
    val out = DedupOps.duplicateSpanStats(docs, "doc_id", "text", window = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 3L, 2L), (2L, 5L, 2L), (3L, 2L, 2L), (4L, 0L, 0L)))
    // partitioning-invariant, and never a cartesian plan
    val again = DedupOps.duplicateSpanStats(docs.repartition(5), "doc_id",
      "text", window = 3)
    assert(again.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq == out)
    assert(!again.queryExecution.executedPlan.toString.contains("Cartesian"))
  }

  test("dropDuplicateSpans keeps the globally first occurrence, removes every other") {
    // window = 3, case-SENSITIVE tokens:
    //   d1 "a b c d e f"       spans abc bcd cde def
    //   d2 "z a b c d y"       shares abc (pos 2) and bcd (pos 3) with d1;
    //                          d1 is keeper (min doc id) → d2 loses token
    //                          indices {2,3,4} ∪ {3,4,5} → "z y"
    //   d3 "p q r p q r p q r" within-doc run: every cyclic 3-gram repeats;
    //                          first occurrences (pos 1..3) win, the rest
    //                          covers indices 4..9 → "p q r"
    //   d4 "s t"               sub-window → untouched
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "z a b c d y"),
      (3L, "p q r p q r p q r"),
      (4L, "s t")).toDF("doc_id", "text")
    val out = DedupOps.dropDuplicateSpans(docs, "doc_id", "text", window = 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, "a b c d e f", 6L, 0L),
      (2L, "z y", 6L, 4L),
      (3L, "p q r", 9L, 6L),
      (4L, "s t", 2L, 0L)))
    // case-sensitive: "A B C" does NOT match "a b c", nothing is removed
    val cased = Seq((1L, "a b c d"), (2L, "A B C d")).toDF("doc_id", "text")
    val cOut = DedupOps.dropDuplicateSpans(cased, "doc_id", "text", window = 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(cOut.forall(_._4 == 0L), s"case-folded removal: $cOut")
    // partitioning-invariant
    val again = DedupOps.dropDuplicateSpans(docs.repartition(5), "doc_id",
      "text", window = 3).as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(again == out)
  }

  test("dupClusters: transitive chains cluster together under min-label propagation") {
    import org.apache.spark.sql.functions.col
    // planted chain: A≈B, B≈C but A and C differ by 4 edits (may miss the
    // direct pair) — the component must still merge all three
    val base = mkDoc(99L, words = 80)
    val b = edit(base, 2, 991L)
    val c = edit(b, 2, 992L)
    val docs = Seq((1L, base), (2L, b), (3L, c), (50L, mkDoc(7L)), (51L, mkDoc(8L)))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b") // chain only
    val clusters = DedupOps.dupClusters(docs, pairs, "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(clusters(1L) == 1L && clusters(2L) == 1L && clusters(3L) == 1L,
      s"chain not merged: $clusters")
    assert(clusters(50L) == 50L && clusters(51L) == 51L) // isolated stay put
    // determinism: same output at a different partitioning
    val again = DedupOps.dupClusters(docs.repartition(7), pairs.repartition(3), "doc_id")
      .as[(Long, Long)].collect().toMap
    assert(again == clusters)
    // end-to-end on the planted corpus: every exact copy and near-dup
    // lands in its base doc's cluster
    val cand = DedupOps.minhashCandidatePairs(corpus, "doc_id", "text")
    val verified = DedupOps.ngramJaccardForPairs(corpus, cand, "doc_id", "text",
      shingleK = 3, minShared = 1)
      .where(col("n_inter") * 10 >= col("n_union") * 5)
    val cl = DedupOps.dupClusters(corpus, verified, "doc_id")
      .as[(Long, Long)].collect().toMap
    (0 until 12).foreach { i =>
      assert(cl(i * 10L + 1) == i * 10L, s"exact copy of $i not clustered")
      assert(cl(i * 10L + 2) == i * 10L, s"near-dup of $i not clustered")
    }
  }

  test("dropContaminatedSpans: excises ALL bench-span occurrences, case-sensitive, run dissolution") {
    val bench = Seq((100L, "x y z q r")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "a b x y z c d"),  // embedded bench span → excised, rest kept
      (2L, "x y z q r s"),    // shared 5-run dissolves via its windows
      (3L, "a b"),            // sub-window → untouched
      (4L, "X y z c c c")     // case differs → NOT contaminated
    ).toDF("doc_id", "text")
    val out = DedupOps.dropContaminatedSpans(corpus, bench, "doc_id", "text",
      window = 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      1L -> (("a b c d", 7L, 3L)),
      2L -> (("s", 6L, 5L)),  // no keeper: every occurrence goes
      3L -> (("a b", 2L, 0L)),
      4L -> (("X y z c c c", 6L, 0L))))
    // partitioning-invariant; bench fp set rides a broadcast join
    val again = DedupOps.dropContaminatedSpans(corpus.repartition(5),
      bench.repartition(2), "doc_id", "text", 3)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(again == out)
    val plan = DedupOps.dropContaminatedSpans(corpus, bench, "doc_id",
      "text", 3).queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"bench side not broadcast:\n$plan")
  }

  test("crossSourceDupMatrix: cross pairs, within-source diagonal, singletons inert") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), // A,B,A share cluster 1
      (4L, 4L),                                      // singleton → inert
      (5L, 5L), (6L, 5L)                             // B,B → diagonal
    ).toDF("doc_id", "cluster")
    val labels = Seq((1L, "A"), (2L, "B"), (3L, "A"), (4L, "A"),
      (5L, "B"), (6L, "B")).toDF("doc_id", "source")
    val out = DedupOps.crossSourceDupMatrix(clusters, labels, "doc_id", "source")
      .as[(String, String, Long)].collect().toSet
    // cluster 1: A appears twice → (A,A); A+B → (A,B); cluster 5: (B,B)
    assert(out == Set(("A", "A", 1L), ("A", "B", 1L), ("B", "B", 1L)))
    // partitioning-invariant (exact aggregates + equi-joins only)
    val again = DedupOps.crossSourceDupMatrix(clusters.repartition(7),
      labels.repartition(3), "doc_id", "source")
      .as[(String, String, Long)].collect().toSet
    assert(again == out)
  }

  test("dupClusters: reliable checkpointDir produces the same labels as localCheckpoint") {
    val base = mkDoc(99L, words = 80)
    val b = edit(base, 2, 991L)
    val c = edit(b, 2, 992L)
    val docs = Seq((1L, base), (2L, b), (3L, c), (50L, mkDoc(7L)), (51L, mkDoc(8L)))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val local = DedupOps.dupClusters(docs, pairs, "doc_id")
      .as[(Long, Long)].collect().toMap
    // the preemptible-fleet posture: rounds go through Dataset.checkpoint
    // to shared storage instead of executor-memory localCheckpoint —
    // labels must be identical (the checkpoint mode is an availability
    // knob, never a semantics knob)
    val dir = graft.TmpDirs.create("dupclusters-ck").toString
    val reliable = DedupOps.dupClusters(docs, pairs, "doc_id",
      checkpointDir = Some(dir)).as[(Long, Long)].collect().toMap
    assert(reliable == local, s"reliable $reliable != local $local")
    // the checkpoint files actually went to the reliable dir
    assert(new java.io.File(dir).listFiles != null &&
      new java.io.File(dir).listFiles.nonEmpty, s"no checkpoint files in $dir")
  }

  test("ivfNearDupPairs: precision 1 vs the exact pair set, recall bounded, default is spread") {
    // clustered fixture: within-cluster cosines are high, cross-cluster low
    val dims = 32
    def vec(cluster: Int, point: Int): Array[Float] = {
      val center = Array.tabulate(dims)(d =>
        (Math.floorMod(TextOps.mix64(cluster * 131L + d), 2000L) - 1000L) / 1000f)
      Array.tabulate(dims)(d =>
        center(d) + (Math.floorMod(TextOps.mix64(cluster * 7919L + point * 271L + d), 200L) - 100L) / 2000f)
    }
    val rows = for (cl <- 0 until 8; p <- 0 until 16)
      yield ((cl * 16 + p).toLong, vec(cl, p))
    val emb = rows.toDF("vec_id", "embedding")
    val exact = SimilarityOps.blockedNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.8).as[(Long, Long)].collect().toSet
    assert(exact.size > 100, s"fixture too sparse: ${exact.size} exact pairs")
    val ivf = SimilarityOps.ivfNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.8, nlist = 8).as[(Long, Long)].collect().toSet
    // precision 1: every emitted pair passed the true cosine test
    assert(ivf.subsetOf(exact), s"false pairs: ${ivf diff exact}")
    // the SemDeDup tradeoff is bounded: only cell-boundary pairs are lost
    val recall = ivf.size.toDouble / exact.size
    assert(recall >= 0.6, s"IVF near-dup recall $recall (${ivf.size}/${exact.size})")
    // deterministic, and the argless default is the spread quantizer
    assert(SimilarityOps.ivfNearDupPairs(emb.repartition(7), "vec_id", "embedding",
      threshold = 0.8, nlist = 8).as[(Long, Long)].collect().toSet == ivf)
    assert(SimilarityOps.ivfNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.8, nlist = 8, centroids = "spread")
      .as[(Long, Long)].collect().toSet == ivf)
  }

  test("IVF ANN recalls clustered neighbors (recall@5 >= 0.6 vs brute force)") {
    val dims = 32
    def vec(cluster: Int, point: Int): Array[Float] = {
      val center = Array.tabulate(dims)(d =>
        (Math.floorMod(TextOps.mix64(cluster * 131L + d), 2000L) - 1000L) / 1000f)
      Array.tabulate(dims)(d =>
        center(d) + (Math.floorMod(TextOps.mix64(cluster * 7919L + point * 271L + d), 200L) - 100L) / 2000f)
    }
    val rows = for (c <- 0 until 8; p <- 0 until 16)
      yield ((c * 16 + p).toLong, vec(c, p))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" % 16 === 0)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = SimilarityOps.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4, centroids = "first")
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      ivf.get(q).map(a => (a intersect truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"IVF mean recall@5 = $mean")

    // 'spread' quantizer: this fixture is maximally id-correlated (ids
    // 0..15 are ALL cluster 0, exactly the nlist lowest ids), so "first"
    // centroids collapse into one cluster; hash-sampled centroids are
    // id-decorrelated, deterministic, and must at least match recall
    val spread = SimilarityOps.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4, centroids = "spread")
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val spreadRecalls = exact.map { case (q, truth) =>
      spread.get(q).map(a => (a intersect truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val spreadMean = spreadRecalls.sum / spreadRecalls.size
    assert(spreadMean >= mean - 1e-9,
      s"spread quantizer recall $spreadMean < first-quantizer $mean on an " +
        "id-correlated corpus")
    // deterministic: identical output across invocations (no RNG state)
    val again = SimilarityOps.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4, centroids = "spread")
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(again == spread.toSeq.flatMap { case (q, ns) => ns.toSeq.map(q -> _) }.toSet)
    // "spread" is the production DEFAULT (q36 pins "first" explicitly for
    // its oracle): an argless call must equal the explicit spread call
    val dflt = SimilarityOps.ivfTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 16, nprobe = 4)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(dflt == again, "ivfTopK default quantizer is not 'spread'")
  }

  test("IVF 'spread' beats 'first' on an id-ordered corpus at nlist = 64") {
    // the degenerate case the default flip is FOR: ids assigned
    // cluster-by-cluster, so the 64 lowest ids span only clusters 0-3 and
    // "first" centroids leave clusters 4-7 unrepresented. The damage shows
    // up as CELL IMBALANCE, not recall: the unrepresented half of the
    // corpus collapses into mega-cells (per-query candidate work tends
    // back toward |corpus| — the thing IVF exists to avoid), while nprobe
    // still finds the mega-cell, keeping recall deceptively high.
    val dims = 32
    def vec(cluster: Int, point: Int): Array[Float] = {
      val center = Array.tabulate(dims)(d =>
        (Math.floorMod(TextOps.mix64(cluster * 131L + d), 2000L) - 1000L) / 1000f)
      Array.tabulate(dims)(d =>
        center(d) + (Math.floorMod(TextOps.mix64(cluster * 7919L + point * 271L + d), 200L) - 100L) / 2000f)
    }
    val rows = for (c <- 0 until 8; p <- 0 until 16)
      yield ((c * 16 + p).toLong, vec(c, p))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" % 16 === 7)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def meanRecall(centroids: String): Double = {
      val got = SimilarityOps.ivfTopK(emb, queries, "vec_id", "embedding",
          k = 5, nlist = 64, nprobe = 8, centroids = centroids)
        .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val rs = exact.map { case (q, truth) =>
        got.get(q).map(a => (a intersect truth).size.toDouble / truth.size).getOrElse(0.0)
      }
      rs.sum / rs.size
    }
    // spread recall stays high in absolute terms
    val spread = meanRecall("spread")
    assert(spread >= 0.9, s"spread recall $spread < 0.9 at nlist=64")
    // and the index is materially better balanced: max cell population
    // (per-query worst-case candidate count for a probed cell) shrinks
    def maxCell(centroids: String): Long =
      SimilarityOps.ivfFit(emb, "vec_id", "embedding", nlist = 64, centroids)
        .cells.groupBy("cell").count()
        .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    val firstMax = maxCell("first")
    val spreadMax = maxCell("spread")
    assert(spreadMax < firstMax,
      s"spread max cell $spreadMax !< first max cell $firstMax — " +
        "the id-ordered degeneracy did not show, fixture broken")
  }

  test("ivfFitRefined: Lloyd rounds are partitioning-invariant and improve the quantizer") {
    val dims = 32
    def vec(cluster: Int, point: Int): Array[Float] = {
      val center = Array.tabulate(dims)(d =>
        (Math.floorMod(TextOps.mix64(cluster * 131L + d), 2000L) - 1000L) / 1000f)
      Array.tabulate(dims)(d =>
        center(d) + (Math.floorMod(TextOps.mix64(cluster * 7919L + point * 271L + d), 200L) - 100L) / 2000f)
    }
    val rows = for (c <- 0 until 8; p <- 0 until 16)
      yield ((c * 16 + p).toLong, vec(c, p))
    val emb = rows.toDF("vec_id", "embedding")

    // refineIters = 0 degenerates to the plain sampled fit EXACTLY
    val seedIdx = SimilarityOps.ivfFit(emb, "vec_id", "embedding", nlist = 8,
      centroids = "first")
    val zero = SimilarityOps.ivfFitRefined(emb, "vec_id", "embedding",
      nlist = 8, centroids = "first", refineIters = 0)
    assert(zero.cents.map { case (c, v) => (c, v.toSeq) } ==
      seedIdx.cents.map { case (c, v) => (c, v.toSeq) })
    def cellsOf(idx: SimilarityOps.IvfIndex): Map[Long, Long] =
      idx.cells.select($"neighbor_id", $"cell").as[(Long, Long)].collect().toMap
    assert(cellsOf(zero) == cellsOf(seedIdx))

    // worst-case seeds: "first" picks ids 0..7 — ALL inside cluster 0.
    // Lloyd rounds must pull centroids toward the corpus's density: the
    // spherical-k-means objective (mean cosine of each vector to its
    // assigned centroid) improves materially over the seed quantizer.
    def objective(idx: SimilarityOps.IvfIndex): Double = {
      val cents = idx.cents.toMap
      val assigned = idx.cells.select($"neighbor_id", $"nvec", $"cell")
        .as[(Long, Array[Float], Long)].collect()
      assigned.map { case (_, v, c) =>
        val cv = cents(c)
        var dot, na, nb = 0.0
        for (i <- v.indices) {
          dot += v(i).toDouble * cv(i); na += v(i).toDouble * v(i); nb += cv(i).toDouble * cv(i)
        }
        dot / math.sqrt(na * nb)
      }.sum / assigned.length
    }
    val refined = SimilarityOps.ivfFitRefined(emb, "vec_id", "embedding",
      nlist = 8, centroids = "first", refineIters = 3)
    val seedObj = objective(seedIdx)
    val refObj = objective(refined)
    assert(refObj > seedObj + 0.01,
      s"Lloyd did not improve the quantizer: $refObj vs seed $seedObj")

    // the fixed-point long reduction makes the rounds partitioning-
    // independent: identical centroids AND cells from a 7-way repartition
    val refined7 = SimilarityOps.ivfFitRefined(emb.repartition(7), "vec_id",
      "embedding", nlist = 8, centroids = "first", refineIters = 3)
    assert(refined7.cents.map { case (c, v) => (c, v.toSeq) } ==
      refined.cents.map { case (c, v) => (c, v.toSeq) })
    assert(cellsOf(refined7) == cellsOf(refined))

    // the refined index still serves: recall@5 >= 0.6 via the same
    // ivfQuery path the sampled index uses
    val queries = emb.where($"vec_id" % 16 === 3)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = SimilarityOps.ivfQuery(refined, queries, "vec_id", "embedding",
        k = 5, nprobe = 2)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      got.get(q).map(a => (a intersect truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"refined IVF mean recall@5 = $mean")
  }

  test("IVF index: fit once, serve many; save/load round-trips exactly") {
    val dims = 16
    def vec(i: Long): Array[Float] = Array.tabulate(dims)(d =>
      (Math.floorMod(TextOps.mix64(i * 37L + d), 2000L) - 1000L) / 1000f)
    val emb = (0L until 96L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val q1 = emb.where($"vec_id" % 12 === 0)
    val q2 = emb.where($"vec_id" % 12 === 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Int)].collect().toSet

    // one-shot path == fit-then-query (ivfTopK delegates; both bit-equal)
    val oneShot = rows(SimilarityOps.ivfTopK(emb, q1, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3))
    val idx = SimilarityOps.ivfFit(emb, "vec_id", "embedding", nlist = 8)
    assert(rows(SimilarityOps.ivfQuery(idx, q1, "vec_id", "embedding", 3,
      nprobe = 3)) == oneShot)

    // the SAME index serves a different query batch (no refit)
    val served2 = rows(SimilarityOps.ivfQuery(idx, q2, "vec_id", "embedding", 3,
      nprobe = 3))
    assert(served2 == rows(SimilarityOps.ivfTopK(emb, q2, "vec_id", "embedding",
      k = 3, nlist = 8, nprobe = 3)))

    // persist + reload: identical answers from the on-disk index
    val dir = graft.TmpDirs.create("ivf-idx").toString
    SimilarityOps.ivfSave(idx, dir)
    val loaded = SimilarityOps.ivfLoad(spark, dir)
    assert(rows(SimilarityOps.ivfQuery(loaded, q1, "vec_id", "embedding", 3,
      nprobe = 3)) == oneShot)
    assert(rows(SimilarityOps.ivfQuery(loaded, q2, "vec_id", "embedding", 3,
      nprobe = 3)) == served2)
  }

  test("PQ ANN: exact copy attains the minimal ADC distance; recall on clusters") {
    // 8 clusters x 16 points (the IVF fixture), PLUS an exact copy of each
    // query vector: identical vectors encode to identical codes, so the
    // copy's ADC distance is Σ_j min_c lut[j][c] — the global minimum.
    // Other cluster members can TIE it (codes are lossy — sharing all 8
    // codes with the query is common inside a tight cluster) and ties
    // break by neighbor_id asc, so the copies get the LOWEST ids to make
    // "copy is rank 1" deterministic rather than tie-luck
    val dims = 32
    def vec(cluster: Int, point: Int): Array[Float] = {
      val center = Array.tabulate(dims)(d =>
        (Math.floorMod(TextOps.mix64(cluster * 131L + d), 2000L) - 1000L) / 1000f)
      Array.tabulate(dims)(d =>
        center(d) + (Math.floorMod(TextOps.mix64(cluster * 7919L + point * 271L + d), 200L) - 100L) / 2000f)
    }
    val base = for (c <- 0 until 8; p <- 0 until 16)
      yield ((c * 16 + p).toLong, vec(c, p))
    val copies = (0 until 8).map(c => (-1000L - c, vec(c, 0)))
    val emb = (base ++ copies).toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" % 16 === 0 && $"vec_id" >= 0)

    val got = SimilarityOps.pqTopK(emb, queries, "vec_id", "embedding",
        k = 5, m = 8, nCodes = 16)
      .select($"query_id", $"neighbor_id", $"dist_fp", $"rank")
      .as[(Long, Long, Long, Int)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet == (0 until 8).map(c => c * 16L).toSet)
    byQ.foreach { case (q, rows) =>
      val copy = rows.find(_._2 == -1000L - q / 16)
        .getOrElse(fail(s"query $q: exact copy not in top-5"))
      assert(copy._4 == 1, s"query $q: exact copy at rank ${copy._4}")
      assert(copy._3 == rows.map(_._3).min,
        s"query $q: copy dist ${copy._3} above the top distance")
    }

    // recall vs brute force on the same corpus (codes are lossy — bound,
    // not equality; threshold has margin under the measured value)
    val exact = SimilarityOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = byQ.view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.get(q).map(a => (a intersect truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.4, s"PQ mean recall@5 = $mean")

    // partitioning-invariant (fixed-point longs everywhere)
    val again = SimilarityOps.pqTopK(emb.repartition(7), queries, "vec_id",
        "embedding", k = 5, m = 8, nCodes = 16)
      .select($"query_id", $"neighbor_id", $"dist_fp", $"rank")
      .as[(Long, Long, Long, Int)].collect()
    assert(again.toSet == got.toSet)
  }

  test("IVF-PQ: degenerates to pure PQ at nprobe = nlist; copy wins rank 1 in its cell") {
    val dims = 32
    def vec(cluster: Int, point: Int): Array[Float] = {
      val center = Array.tabulate(dims)(d =>
        (Math.floorMod(TextOps.mix64(cluster * 131L + d), 2000L) - 1000L) / 1000f)
      Array.tabulate(dims)(d =>
        center(d) + (Math.floorMod(TextOps.mix64(cluster * 7919L + point * 271L + d), 200L) - 100L) / 2000f)
    }
    val base = for (c <- 0 until 8; p <- 0 until 16)
      yield ((c * 16 + p).toLong, vec(c, p))
    val copies = (0 until 8).map(c => (-1000L - c, vec(c, 0)))
    val emb = (base ++ copies).toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" % 16 === 0 && $"vec_id" >= 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Int)].collect().toSet

    // probing EVERY cell makes the cell restriction vacuous: candidates =
    // the whole corpus exactly once (each vector lives in ONE cell), so
    // IVF-PQ must equal pure PQ bit-for-bit
    val all = rows(SimilarityOps.ivfPqTopK(emb, queries, "vec_id",
      "embedding", k = 5, nlist = 8, nprobe = 8, m = 8, nCodes = 16))
    assert(all == rows(SimilarityOps.pqTopK(emb, queries, "vec_id",
      "embedding", k = 5, m = 8, nCodes = 16)))

    // restricted probing: an exact copy assigns to the query's own nearest
    // cell (identical vector → identical cell), attains the minimal ADC
    // distance there, and holds the lowest id → always rank 1
    val got = SimilarityOps.ivfPqTopK(emb, queries, "vec_id", "embedding",
        k = 5, nlist = 8, nprobe = 2, m = 8, nCodes = 16)
      .select($"query_id", $"neighbor_id", $"dist_fp", $"rank")
      .as[(Long, Long, Long, Int)].collect()
    got.groupBy(_._1).foreach { case (q, rs) =>
      val copy = rs.find(_._2 == -1000L - q / 16)
        .getOrElse(fail(s"query $q: exact copy not retrieved"))
      assert(copy._4 == 1, s"query $q: exact copy at rank ${copy._4}")
    }
    // partitioning-invariant (fixed-point longs end to end)
    val again = rows(SimilarityOps.ivfPqTopK(emb.repartition(7), queries,
      "vec_id", "embedding", k = 5, nlist = 8, nprobe = 2, m = 8, nCodes = 16))
    assert(again == got.toSet)
  }

  test("PQ index: seeds encode losslessly; fit/encode once, serve many; save/load") {
    val dims = 16
    def vec(i: Long): Array[Float] = Array.tabulate(dims)(d =>
      (Math.floorMod(TextOps.mix64(i * 37L + d), 2000L) - 1000L) / 1000f)
    val emb = (0L until 96L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val q1 = emb.where($"vec_id" % 12 === 0)
    val q2 = emb.where($"vec_id" % 12 === 5)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long, Int)].collect().toSet

    val cb = SimilarityOps.pqFit(emb, "vec_id", "embedding", m = 4, k = 8,
      centroids = "first")
    assert(cb.m == 4 && cb.subDim == 4 && cb.k == 8)
    val codes = SimilarityOps.pqEncode(emb, "vec_id", "embedding", cb)
    val codeMap = codes.as[(Long, Array[Int])].collect().toMap
    assert(codeMap.values.forall(_.forall(c => c >= 0 && c < 8)))
    // "first" codebook = slices of vectors 0..7: each seed's own sub-slice
    // is IN the codebook, so its chosen codeword must be at fp distance 0
    (0L until 8L).foreach { id =>
      val v = vec(id)
      codeMap(id).zipWithIndex.foreach { case (c, j) =>
        val cw = cb.codewords(j)(c)
        val d = (0 until 4).map { i =>
          val dd = v(j * 4 + i).toDouble - cw(i).toDouble
          math.floor(dd * dd * (1L << 20)).toLong
        }.sum
        assert(d == 0L, s"seed $id subspace $j encodes at distance $d")
      }
    }

    // one-shot == fit-then-encode-then-query
    val oneShot = rows(SimilarityOps.pqTopK(emb, q1, "vec_id", "embedding",
      k = 3, m = 4, nCodes = 8, centroids = "first"))
    assert(rows(SimilarityOps.pqQuery(cb, codes, q1, "vec_id", "embedding", 3))
      == oneShot)
    // the SAME codes serve a different query batch (no re-encode)
    val served2 = rows(SimilarityOps.pqQuery(cb, codes, q2, "vec_id", "embedding", 3))
    assert(served2 == rows(SimilarityOps.pqTopK(emb, q2, "vec_id", "embedding",
      k = 3, m = 4, nCodes = 8, centroids = "first")))

    // persist + reload: identical answers from the on-disk index
    val dir = graft.TmpDirs.create("pq-idx").toString
    SimilarityOps.pqSave(cb, codes, dir)
    val (cb2, codes2) = SimilarityOps.pqLoad(spark, dir)
    assert(rows(SimilarityOps.pqQuery(cb2, codes2, q1, "vec_id", "embedding", 3))
      == oneShot)
    assert(rows(SimilarityOps.pqQuery(cb2, codes2, q2, "vec_id", "embedding", 3))
      == served2)
  }

  test("SRP-LSH ANN recalls clustered neighbors (recall@5 >= 0.6 vs brute force)") {
    // 8 clusters x 16 points: unit-ish center + small deterministic noise
    val dims = 32
    def vec(cluster: Int, point: Int): Array[Float] = {
      val center = Array.tabulate(dims)(d =>
        (Math.floorMod(TextOps.mix64(cluster * 131L + d), 2000L) - 1000L) / 1000f)
      Array.tabulate(dims)(d =>
        center(d) + (Math.floorMod(TextOps.mix64(cluster * 7919L + point * 271L + d), 200L) - 100L) / 2000f)
    }
    val rows = for (c <- 0 until 8; p <- 0 until 16)
      yield ((c * 16 + p).toLong, vec(c, p))
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.where($"vec_id" % 16 === 0) // one query per cluster
    val exact = SimilarityOps.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val approx = SimilarityOps.lshTopK(emb, queries, "vec_id", "embedding",
        dims = dims, k = 5, bits = 6, tables = 6)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (q, truth) =>
      approx.get(q).map(a => (a intersect truth).size.toDouble / truth.size).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.6, s"ANN mean recall@5 = $mean")
    // and exact top-5 of a clustered query is dominated by its own cluster
    exact.foreach { case (q, ns) =>
      val own = ns.count(n => n / 16 == q / 16)
      assert(own >= 4, s"query $q: only $own/5 neighbors in-cluster")
    }
  }

  test("semanticDedup: component partition, singleton inertness, min-id keepers") {
    import spark.implicits._
    val dims = 32
    def vec(cluster: Int, point: Int): Array[Float] = {
      val center = Array.tabulate(dims)(d =>
        (Math.floorMod(TextOps.mix64(cluster * 131L + d), 2000L) - 1000L) / 1000f)
      Array.tabulate(dims)(d =>
        center(d) + (Math.floorMod(TextOps.mix64(cluster * 7919L + point * 271L + d), 200L) - 100L) / 2000f)
    }
    // 8 tight clusters of 16 + one isolated far-away vector
    val rows = (for (cl <- 0 until 8; p <- 0 until 16)
      yield ((cl * 16 + p).toLong, vec(cl, p))) :+ ((999L, vec(99, 0)))
    val emb = rows.toDF("vec_id", "embedding")
    val kept = SimilarityOps.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.8, nlist = 8).as[(Long, Long)].collect()
    // components PARTITION the corpus: sizes sum to |corpus|, reps unique
    assert(kept.map(_._2).sum == 129L)
    assert(kept.map(_._1).distinct.length == kept.length)
    // real dedup happened, and the isolated vector survives as a singleton
    assert(kept.length < 129 && kept.length >= 9)
    assert(kept.toMap.get(999L).contains(1L), s"isolated vector lost: ${kept.toSeq}")
    // keepers are the min id of each propagated component (the rollup glue
    // over the operator's own published parts)
    val pairs = SimilarityOps.ivfNearDupPairs(emb, "vec_id", "embedding",
      threshold = 0.8, nlist = 8)
    val expect = DedupOps.dupClusters(emb.select($"vec_id"), pairs, "vec_id")
      .as[(Long, Long)].collect().groupBy(_._2)
      .map { case (_, ms) => (ms.map(_._1).min, ms.size.toLong) }.toSet
    assert(kept.toSet == expect)
    // partitioning-invariant
    val again = SimilarityOps.semanticDedup(emb.repartition(7), "vec_id",
      "embedding", threshold = 0.8, nlist = 8)
      .as[(Long, Long)].collect().toSet
    assert(again == kept.toSet)
  }

  test("incrementalNearDup: ledger screening, within-batch keeper, successor ledger") {
    import spark.implicits._
    // accumulated corpus = the 12 base docs; batch = their exact copies +
    // near-dups + one fresh doc with unrelated text
    val baseDocs = (0 until 12).map(i => (i * 10L, mkDoc(i.toLong))).toDF("doc_id", "text")
    val fresh = (900L, "totally novel words appearing nowhere else in any fixture " * 3)
    val batch = ((0 until 12).flatMap { i =>
      val base = mkDoc(i.toLong)
      Seq((i * 10L + 1, base), (i * 10L + 2, edit(base, 2, i.toLong)))
    } :+ fresh).toDF("doc_id", "text")
    val ledger = DedupOps.bandLedger(baseDocs, "doc_id", "text")
    val out = DedupOps.incrementalNearDup(batch, ledger, "doc_id", "text")
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    (0 until 12).foreach { i =>
      // exact copy: identical text → identical minima → ALL 4 bands hit
      assert(out(i * 10L + 1)._1 == 4L, s"copy of $i: ${out(i * 10L + 1)}")
      // 2-edit near-dup: LSH recall (the candidate-pairs spec above) → ≥1
      assert(out(i * 10L + 2)._1 >= 1L, s"near-dup of $i: ${out(i * 10L + 2)}")
      // near-dup shares a bucket with the earlier in-batch copy
      assert(out(i * 10L + 2)._2.contains(i * 10L + 1))
      // the copy has no EARLIER in-batch collision (it is each group's min)
      assert(out(i * 10L + 1)._2.isEmpty)
    }
    assert(out(900L) == ((0L, None)), s"fresh doc flagged: ${out(900L)}")
    // successor property: ledger ∪ batch bands == ledger of the full corpus
    val grown = ledger.unionByName(DedupOps.bandLedger(batch, "doc_id", "text"))
      .distinct().as[(Int, String)].collect().toSet
    val full = DedupOps.bandLedger(baseDocs.unionByName(batch), "doc_id", "text")
      .as[(Int, String)].collect().toSet
    assert(grown == full)
    // partitioning-invariant
    val again = DedupOps.incrementalNearDup(batch.repartition(7),
      ledger.repartition(3), "doc_id", "text")
      .as[(Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again == out)
  }

  test("contaminationReport: hand-computed leak counts; agreement with the acting rewrite") {
    import spark.implicits._
    val bench = Seq(
      (100L, "a b c d e"), // spans: "a b c", "b c d", "c d e"
      (101L, "k l"),       // sub-window → (0, 0, 0)
      (102L, "p q r s")    // spans: "p q r", "q r s" — no corpus overlap
    ).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "x b c d y"),   // carries "b c d"
      (2L, "a b c d z"),   // carries "a b c" AND "b c d"
      (3L, "a b C d e")    // case differs → carries nothing
    ).toDF("doc_id", "text")
    val out = DedupOps.contaminationReport(corpus, bench, "doc_id", "text",
      window = 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      100L -> ((3L, 2L, 2L)), // "a b c" (doc 2), "b c d" (docs 1+2)
      101L -> ((0L, 0L, 0L)),
      102L -> ((2L, 0L, 0L))))
    // the acting op rewrites exactly the corpus docs the report counts
    val acted = DedupOps.dropContaminatedSpans(corpus, bench, "doc_id",
      "text", window = 3)
      .where($"n_removed" > 0).select("doc_id").as[Long].collect().toSet
    assert(acted == Set(1L, 2L))
    // partitioning-invariant; bench span set rides broadcast joins
    val again = DedupOps.contaminationReport(corpus.repartition(5),
      bench.repartition(2), "doc_id", "text", 3)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(again == out)
    val plan = DedupOps.contaminationReport(corpus, bench, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"bench side not broadcast:\n$plan")
  }

  // Scala-side brute-force shingle Jaccard, the truth setSimJoinPrefix
  // must reproduce EXACTLY (recall 1 is the operator's whole point).
  private def bruteSetSim(docs: Seq[(Long, String)], k: Int, jacMill: Long)
      : Set[(Long, Long, Long, Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      val toks = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      id -> toks.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSet
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size.toLong
      union = (sa | sb).size.toLong
      if inter * 1000 >= jacMill * union
    } yield (a, b, inter, union, inter * 1000 / union)).toSet
  }

  test("setSimJoinPrefix: EXACTLY the brute-force pair set (recall 1), all thresholds") {
    // planted structure: 3 exact-ish families + random docs + a shared
    // hot shingle in EVERY doc (the naive self-join's quadratic killer)
    val base = (0L until 30L).map(i => i -> (mkDoc(i) + " hot stop word"))
    val near = Seq(100L -> edit(base(0)._2, 2, 7L),
      101L -> edit(base(1)._2, 4, 8L), 102L -> base(2)._2)
    val docs = (base ++ near).toDF("doc_id", "text")
    for (t <- Seq(300L, 500L, 800L)) {
      val got = DedupOps.setSimJoinPrefix(docs, "doc_id", "text",
          jacMill = t, shingleK = 3)
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val want = bruteSetSim(base ++ near, 3, t)
      assert(got == want, s"t=$t: got ${got.size}, want ${want.size}; " +
        s"missing=${want -- got} extra=${got -- want}")
    }
    // the planted families are actually in there at t=500
    val got500 = DedupOps.setSimJoinPrefix(docs, "doc_id", "text", 500L, 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got500.exists(p => p._1 == 2L && p._2 == 102L && p._3 == p._4),
      "exact copy must appear with inter == union")
    assert(got500.exists(p => p._1 == 0L && p._2 == 100L))
  }

  test("setSimJoinPrefix: partitioning-invariant; candidates join on rare shingles only") {
    val docs = ((0L until 20L).map(i => i -> mkDoc(i, 40)) :+
      (200L -> edit(mkDoc(3L, 40), 1, 9L))).toDF("doc_id", "text")
    val a = DedupOps.setSimJoinPrefix(docs, "doc_id", "text", 400L, 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val b = DedupOps.setSimJoinPrefix(docs.repartition(7), "doc_id", "text",
        400L, 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b && a.nonEmpty)
    // a corpus where EVERY doc shares one hot shingle but nothing else:
    // prefix filtering must emit zero pairs (the hot shingle lands in
    // every suffix), where the naive self-join would go quadratic
    val hot = (0L until 40L).map(i =>
      i -> (mkDoc(i * 31 + 5, 50) + " aaa bbb ccc")).toDF("doc_id", "text")
    val pairs = DedupOps.setSimJoinPrefix(hot, "doc_id", "text", 700L, 3)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(pairs.isEmpty, s"unrelated hot-shingle docs must not pair: ${pairs.toSeq}")
  }
}
