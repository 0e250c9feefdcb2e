package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops._

/** Property tests for the algebraic laws SURVEY.md §5 calls out:
  * combiner ≡ reducer on pre-merged input, bounded top-k ≡ sort-take,
  * salted aggregation ≡ direct aggregation, Jaccard bounds.
  * Data-driven through Spark on small generated datasets.
  */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic scalacheck sampling (no scalatestplus bridge in the
    * offline cache): n samples from fixed seeds.
    */
  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val kvGen: Gen[List[(Int, Long)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0, 5), Gen.choose(-1000L, 1000L)))

  test("combiner law: combineByKey(_+_) == reduceRecords(sum) (A1/C3)") {
    samples(kvGen, 5).filter(_.nonEmpty).foreach { data =>
      val ds = data.toDS()
      val a = MapRed.combineByKey(ds)(_ + _).collect().sortBy(_._1).toSeq
      val b = MapRed.reduceRecords(ds)((k, vs) => Iterator((k, vs.sum)))
        .collect().sortBy(_._1).toSeq
      assert(a == b)
    }
  }

  test("TopKAggregator merge law: topk over partitions == topk over whole (T1/T2)") {
    val cases = samples(Gen.zip(Gen.listOfN(50, Gen.choose(-500.0, 500.0)), Gen.choose(1, 8)), 20)
    cases.filter(_._1.nonEmpty).foreach { case (vs, k) =>
      val agg = graft.functions.TopKAggregator(k)
      // fold through two partial buffers then merge (the shuffle path)
      val (l, r) = vs.splitAt(vs.length / 2)
      val merged = agg.merge(
        l.foldLeft(agg.zero)(agg.reduce),
        r.foldLeft(agg.zero)(agg.reduce))
      val expected = vs.sorted(Ordering[Double].reverse).take(k)
      assert(agg.finish(merged).toList == expected)
    }
  }

  test("salted aggregation equals direct aggregation (skew path)") {
    samples(kvGen, 3).filter(_.nonEmpty).foreach { data =>
      val df = data.toDF("k", "v")
      val direct = LibOps.sumByKey(df, Seq("k"), "v").orderBy("k")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      val salted = LibOps.saltedSumByKey(df, Seq("k"), "v", buckets = 4).orderBy("k")
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(direct == salted)
    }
  }

  test("jaccard is within [0,1] and symmetric pairs have id_a < id_b") {
    val docs = graft.io.Tables.documents(spark, TestSpark.Sf0001).limit(60)
    val pairs = DedupOps.ngramJaccardPairs(docs, "text", "doc_id").collect()
    pairs.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("id_a") < r.getAs[Long]("id_b"))
    }
  }

  test("word_ngrams ties out with shingles: distinct(ngrams) == shingle set") {
    val textGen: Gen[String] =
      Gen.chooseNum(1, 12).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    samples(textGen, 30).foreach { text =>
      val df = Seq(Tuple1(text)).toDF("text")
      val Array(ngrams, shingleStrings) = df.select(
        graft.functions.TextFunctions.word_ngrams(col("text"), 2).as("ng"),
        TextOps.shingles(col("text"), 2).as("sh")).collect()(0) match {
        case r => Array(r.getSeq[String](0), r.getSeq[String](1))
      }
      val words = text.split(' ')
      if (words.length >= 2) {
        assert(ngrams.length == words.length - 1)          // every occurrence
        assert(ngrams.distinct.toSet == shingleStrings.toSet) // same universe
      } else {
        assert(ngrams.isEmpty)                    // counting wants real n-grams
        assert(shingleStrings == Seq(text))       // dedup keeps whole-text token
      }
    }
  }

  test("spanDedup equals a brute-force reference on random small corpora") {
    // reference: count every sliding n-window string corpus-wide,
    // mark positions whose window occurs >= 2 times, merge positions
    // into maximal spans (gap <= n), report per-doc stats — the
    // operator's contract, computed with none of its machinery
    val n = 3
    def reference(docs: Seq[(Long, String)]): Map[Long, (Int, Long, Long, Double)] = {
      val wins = docs.flatMap { case (id, t) =>
        val ws = t.split(" ", -1)
        if (ws.length < n) Seq.empty
        else (0 to ws.length - n).map(p => (id, p, ws.slice(p, p + n).mkString(" ")))
      }
      val occ = wins.groupBy(_._3).view.mapValues(_.size).toMap
      val dupByDoc = wins.filter(w => occ(w._3) >= 2)
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      docs.map { case (id, t) =>
        val nt = t.split(" ", -1).length
        val ps = dupByDoc.getOrElse(id, Seq.empty)
        if (ps.isEmpty) id -> ((0, 0L, 0L, 0.0))
        else {
          val spans = ps.tail.foldLeft(List((ps.head, ps.head))) {
            case ((s, e) :: rest, p) =>
              if (p - e <= n) (s, p) :: rest else (p, p) :: (s, e) :: rest
            case (Nil, p) => List((p, p))
          }
          val dupTokens = spans.map { case (s, e) => e + n - s }.map(_.toLong).sum
          val frac = BigDecimal(dupTokens.toDouble / nt)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          id -> ((spans.size, ps.size.toLong, dupTokens, frac))
        }
      }.toMap
    }
    val corpusGen: Gen[List[(Long, String)]] =
      Gen.listOfN(8, Gen.chooseNum(0, 15).flatMap(len =>
        Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" "))))
        .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    samples(corpusGen, 12).foreach { docs =>
      val exp = reference(docs)
      val got = DedupOps.spanDedup(docs.toDF("doc_id", "text"),
          "text", "doc_id", n = n).collect()
      assert(got.length == docs.size)
      got.foreach { r =>
        val id = r.getLong(0)
        val (eSpans, eNg, eTok, eFrac) = exp(id)
        assert(r.getInt(1) == eSpans, s"doc $id n_spans: $docs")
        assert(r.getLong(2) == eNg, s"doc $id n_dup_ngrams: $docs")
        assert(r.getLong(3) == eTok, s"doc $id dup_tokens: $docs")
        assert(math.abs(r.getDouble(4) - eFrac) < 1e-9, s"doc $id dup_frac: $docs")
      }
    }
  }

  test("spanRemoval equals a brute-force reference on random corpora") {
    // reference: benchmark 3-window string set; per train doc, union
    // of [p, p+2] over hit windows; drop those 0-based positions —
    // the operator's contract with none of its machinery
    val n = 3
    def windows(t: String): Seq[(Int, String)] = {
      val ws = t.split(" ", -1)
      if (ws.length < n) Seq.empty
      else (0 to ws.length - n).map(p => (p, ws.slice(p, p + n).mkString(" ")))
    }
    def reference(train: Seq[(Long, String)], bench: Seq[String])
        : Map[Long, (Int, Int, String)] = {
      val bm = bench.flatMap(windows).map(_._2).toSet
      train.map { case (id, t) =>
        val ws = t.split(" ", -1)
        val covered = windows(t).filter(w => bm.contains(w._2))
          .flatMap(w => w._1 until w._1 + n).toSet
        val clean = ws.zipWithIndex.collect {
          case (w, i) if !covered.contains(i) => w }.mkString(" ")
        id -> ((ws.length, covered.size, clean))
      }.toMap
    }
    val docGen = Gen.chooseNum(1, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c")).map(_.mkString(" ")))
    val caseGen = Gen.zip(Gen.listOfN(6, docGen), Gen.listOfN(2, docGen))
    samples(caseGen, 10).foreach { case (trainTxt, benchTxt) =>
      val train = trainTxt.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val exp = reference(train, benchTxt)
      val got = DeconOps.spanRemoval(
          train.toDF("doc_id", "text"),
          benchTxt.zipWithIndex.map { case (t, i) => (100L + i, t) }
            .toDF("doc_id", "text"))
        .collect()
      assert(got.length == train.size)
      got.foreach { r =>
        val id = r.getLong(0)
        val (eTok, eRm, eClean) = exp(id)
        assert(r.getInt(1) == eTok, s"doc $id n_tokens: $train vs $benchTxt")
        assert(r.getInt(2) == eRm, s"doc $id n_removed: $train vs $benchTxt")
        assert(r.getString(3) == eClean, s"doc $id clean: $train vs $benchTxt")
      }
    }
  }

  test("bm25PerQuery equals a brute-force reference on random corpora") {
    val (k1, b) = (1.2, 0.75)
    def reference(queries: Seq[(Long, String)], corpus: Seq[(Long, String)])
        : Map[(Long, Long), (Int, Double)] = {
      val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
      val nDocs = corpus.size.toLong
      val avgdl = corpus.map(c => toks(c._1).length).sum.toDouble / nDocs
      val dfOf = toks.values.flatMap(_.distinct).groupBy(identity)
        .view.mapValues(_.size.toDouble).toMap
      (for {
        (qid, qt) <- queries
        qTerms = qt.split(" ", -1).distinct.toSet
        (nid, ws) <- toks if nid != qid
        shared = qTerms.intersect(ws.toSet) if shared.nonEmpty
      } yield {
        val dl = ws.length.toDouble
        val score = shared.toSeq.sorted.map { t =>
          val tf = ws.count(_ == t).toDouble
          val idf = math.log(1.0 + (nDocs - dfOf(t) + 0.5) / (dfOf(t) + 0.5))
          idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        }.sum
        (qid, nid) -> ((shared.size, score))
      }).toMap
    }
    val docGen = Gen.chooseNum(1, 10).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    samples(Gen.listOfN(6, docGen), 10).foreach { txts =>
      val corpus = txts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val queries = corpus.take(2)
      val exp = reference(queries, corpus)
      val got = TextOps.bm25PerQuery(
          queries.toDF("doc_id", "text"), corpus.toDF("doc_id", "text"),
          topN = 50)
        .collect()
      assert(got.length == exp.size, s"pair count: $corpus")
      got.foreach { r =>
        val key = (r.getLong(0), r.getLong(1))
        val (eN, eScore) = exp(key)
        assert(r.getInt(2) == eN, s"pair $key n_terms: $corpus")
        assert(math.abs(r.getDouble(3) - BigDecimal(eScore)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1.5e-4,
          s"pair $key score ${r.getDouble(3)} vs $eScore: $corpus")
      }
      // ranks are dense per query over (rounded score desc, nid asc)
      got.groupBy(_.getLong(0)).values.foreach { rows =>
        val sorted = rows.sortBy(r => (-r.getDouble(3), r.getLong(1)))
        assert(sorted.map(_.getInt(4)).toSeq == (1 to rows.size),
          s"rank order: $corpus")
      }
    }
  }

  test("mmrTopK equals a brute-force greedy reference on random vectors") {
    // reference: exact cosine pool of size poolN (rounded 4, rank on
    // unrounded, ties by nid), then greedy λ·sim − (1−λ)·max-csim
    // (rounded 4) with (mmr desc, nid asc) argmax — the operator's
    // contract, computed with plain Scala collections
    val (k, poolN, lam) = (4, 6, 0.7)
    def round4(x: Double) =
      math.copySign(math.floor(math.abs(x) * 1e4 + 0.5) / 1e4, x)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
             math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    def reference(vs: Seq[(Long, Seq[Float])], qids: Seq[Long])
        : Seq[(Long, Long, Int, Double)] = {
      val m = vs.toMap
      qids.flatMap { q =>
        val pool = vs.filter(_._1 != q)
          .map { case (id, v) => (id, cos(m(q), v)) }
          .sortBy { case (id, s) => (-s, id) }.take(poolN)
          .map { case (id, s) => (id, round4(s)) }
        val sel = scala.collection.mutable.ArrayBuffer[(Long, Int, Double)]()
        while (sel.length < k && sel.length < pool.length) {
          val cands = pool.filterNot(c => sel.exists(_._1 == c._1))
          val scored = cands.map { case (id, s) =>
            val pen = if (sel.isEmpty) 0.0
              else sel.map(x => round4(cos(m(id), m(x._1)))).max
            (id, s, lam * s - (1 - lam) * pen)
          }
          val best = scored.minBy { case (id, _, mmr) => (-mmr, id) }
          sel += ((best._1, sel.length + 1, best._2))
        }
        sel.map { case (id, st, s) => (q, id, st, s) }
      }
    }
    val vecGen = Gen.listOfN(4, Gen.chooseNum(-4, 4).map(_.toFloat))
    val setGen = Gen.listOfN(9, vecGen)
      // zero vectors make cosine 0/0 — the op's NULL path, excluded here
      .suchThat(_.forall(v => v.exists(_ != 0f)))
      .map(_.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) })
    samples(setGen, 8).foreach { vs =>
      val qids = Seq(0L, 1L)
      val exp = reference(vs, qids)
      val df = vs.map { case (id, v) => (id, v.toArray) }
        .toDF("vec_id", "embedding")
      val got = SimOps.mmrTopK(df.filter($"vec_id" < 2), df,
          "vec_id", "embedding", k = k, poolN = poolN, lambda = lam)
        .orderBy("qid", "step").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      assert(got.length == exp.length, s"row count: $vs")
      got.zip(exp).foreach { case (g, e) =>
        assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3,
          s"pick sequence: got ${g} want ${e} on $vs")
        assert(math.abs(g._4 - e._4) < 1e-9, s"sim: $g vs $e on $vs")
      }
    }
  }

  test("groupedBudgetSample equals the naive per-group running-sum reference") {
    // groups with NULLs, integer-valued scores (forcing ties through
    // the (score DESC, id ASC) tiebreak), NULL scores, small budgets
    val rowGen: Gen[List[(Option[Int], Option[Double], Int)]] =
      Gen.listOfN(40, Gen.zip(
        Gen.option(Gen.choose(0, 3)),
        Gen.option(Gen.choose(0, 5).map(_.toDouble)),
        Gen.choose(1, 30)))
    samples(rowGen, 8).filter(_.nonEmpty).foreach { raw =>
      val rows = raw.zipWithIndex.map { case ((g, sc, tok), i) =>
        (g, i.toLong, sc, tok)
      }
      val budget = 60L
      // reference: per group, order by (score DESC NULLS LAST, id ASC),
      // running token sum over ALL rows, keep cum <= budget
      val expected = rows.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
        val ordered = rs.sortBy { case (_, id, sc, _) =>
          (sc.isEmpty, sc.map(-_).getOrElse(0.0), id)
        }
        var cum = 0L
        ordered.flatMap { case (_, id, _, tok) =>
          cum += tok
          if (cum <= budget) Some((id, cum)) else None
        }
      }.toSet
      val got = SampleOps.groupedBudgetSample(
          rows.toDF("g", "id", "score", "tok"), "g", "score", "tok", "id", budget)
        .select("id", "cum_tokens").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"rows=$rows")
    }
  }

  test("epochMixture copies = floor(epochs) + mixtureSample fractional membership") {
    val df = (1L to 30L).map(i => (i, "g")).toDF("id", "g")
    samples(Gen.choose(0, 30).map(_ / 10.0), 12).foreach { e =>
      val frac = e - math.floor(e)
      val fracKept =
        SampleOps.mixtureSample(df, "g", "id", Map(), defaultRate = frac)
          .select("id").collect().map(_.getLong(0)).toSet
      val expected = (1L to 30L).flatMap { id =>
        val n = math.floor(e).toInt + (if (fracKept(id)) 1 else 0)
        (0 until n).map(c => (id, c))
      }.toSet
      val got = SampleOps.epochMixture(df, "g", "id", Map(), defaultEpochs = e)
        .select("id", "copy_idx").collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSet
      assert(got == expected, s"epochs=$e")
    }
  }

  test("crossSourceOverlap equals the exact-duplicate matrix on random corpora") {
    // generator restricted to EXACT copies of base texts: identical
    // docs always band-collide (equal signatures) and verify at
    // jaccard 1.0; distinct bases share no shingles (distinct word
    // sets) so they never survive verification — the expected matrix
    // is pure combinatorics over (text-group × source) assignments
    val bases = Vector(
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight",
      "red green blue cyan magenta yellow black white")
    val caseGen = Gen.listOfN(10,
      Gen.zip(Gen.choose(0, 2), Gen.oneOf("srcA", "srcB", "srcC")))
    samples(caseGen, 8).foreach { assign =>
      val docs = assign.zipWithIndex.map { case ((b, s), i) =>
        (i.toLong, bases(b), s) }
      val exp = docs.combinations(2).toSeq
        .filter { case Seq(a, b) => a._2 == b._2 }
        .map { case Seq(a, b) =>
          if (a._3 <= b._3) (a._3, b._3) else (b._3, a._3) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = DedupOps.crossSourceOverlap(
          docs.toDF("doc_id", "text", "source"), "text", "doc_id", "source")
        .collect()
        .map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(2), r.getDouble(3)))).toMap
      assert(got.keySet == exp.keySet, s"matrix cells: $assign")
      got.foreach { case (cell, (n, avg)) =>
        assert(n == exp(cell), s"cell $cell count: $assign")
        assert(avg == 1.0, s"cell $cell avg jaccard: $assign")
      }
    }
  }

  test("dsirWeights equals a brute-force reference on random corpora") {
    def md5hex(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    def grams(t: String): Seq[String] = {
      val ws = t.split(" ", -1).toSeq
      ws ++ ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }
    def bucket(g: String): Int =
      (java.lang.Long.parseLong(md5hex(g).substring(0, 6), 16) % 256).toInt
    def reference(corpus: Seq[(Long, String)],
                  target: Seq[String]): Map[Long, (Int, Double)] = {
      val tH = target.flatMap(grams).groupBy(bucket)
        .view.mapValues(_.size.toLong).toMap
      val cH = corpus.flatMap(d => grams(d._2)).groupBy(bucket)
        .view.mapValues(_.size.toLong).toMap
      val (nt, nq) = (tH.values.sum, cH.values.sum)
      def lr(b: Int): Double =
        math.log((tH.getOrElse(b, 0L) + 1.0) / (nt + 256.0)) -
          math.log((cH.getOrElse(b, 0L) + 1.0) / (nq + 256.0))
      corpus.map { case (id, t) =>
        val gs = grams(t)
        // the operator's DECIMAL(28,12) term quantization, then round-4
        val s = gs.groupBy(bucket).toSeq.map { case (b, g) =>
          BigDecimal(g.size.toDouble * lr(b))
            .setScale(12, BigDecimal.RoundingMode.HALF_UP) }.sum
        id -> ((gs.size,
          BigDecimal(s.toDouble).setScale(4, BigDecimal.RoundingMode.HALF_UP)
            .toDouble))
      }.toMap
    }
    val docGen = Gen.chooseNum(1, 10).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" ")))
    val caseGen = Gen.zip(Gen.listOfN(8, docGen), Gen.listOfN(3, docGen))
    samples(caseGen, 8).foreach { case (corpusTxt, targetTxt) =>
      val corpus = corpusTxt.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val exp = reference(corpus, targetTxt)
      val got = SampleOps.dsirWeights(
          corpus.toDF("doc_id", "text"),
          targetTxt.zipWithIndex.map { case (t, i) => (100L + i, t) }
            .toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2))))
        .toMap
      assert(got.keySet == exp.keySet, s"doc set: $corpusTxt vs $targetTxt")
      got.foreach { case (id, (n, w)) =>
        assert(n == exp(id)._1, s"doc $id n_grams: $corpusTxt vs $targetTxt")
        assert(w == exp(id)._2, s"doc $id logw: $corpusTxt vs $targetTxt")
      }
    }
  }

  test("curriculumOrder equals the naive single-window reference") {
    def md5hex(s: String) =
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s)
    val caseGen = Gen.listOfN(40, Gen.choose(0, 3))
    samples(caseGen, 8).foreach { stages =>
      val rows = stages.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      val expected = rows
        .sortBy { case (id, s) => (s, md5hex(id.toString), id) }
        .zipWithIndex.map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
      val got = SampleOps.curriculumOrder(
          rows.toDF("id", "diff"), col("diff"), "id")
        .select("id", "pos").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"order mismatch for stages $stages")
    }
  }

  test("funnel equals a brute-force sequential reference on random streams") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val types = Vector("s0", "s1", "s2", "n0", "n1")
    val steps = Seq("s0", "s1", "s2")
    val winH = 10
    val winUs = winH.toLong * 3600L * 1000000L
    val evGen = Gen.listOfN(60,
      Gen.zip(Gen.choose(0, 3), Gen.choose(0, 4), Gen.choose(0, 5000)))
    samples(evGen, 8).filter(_.nonEmpty).foreach { raw =>
      val rows = raw.map { case (u, t, m) =>
        (u.toLong, types(t), new Timestamp(base + m * 60000L)) }
      // brute force: per user, sequential first-reach under the window
      val byUser = rows.groupBy(_._1).view.mapValues(evs =>
        evs.map(e => (e._2, e._3.getTime * 1000L)))
      val reached: Seq[Set[Long]] = steps.indices.map { k =>
        byUser.filter { case (_, evs) =>
          steps.take(k + 1).foldLeft(Option(Long.MinValue)) {
            case (None, _) => None
            case (Some(prev), st) =>
              val cands = evs.filter(e => e._1 == st && e._2 > prev &&
                (prev == Long.MinValue || e._2 <= prev + winUs))
              if (cands.isEmpty) None else Some(cands.map(_._2).min)
          }.isDefined
        }.keySet.toSet
      }
      val got = TimeOps.funnel(rows.toDF("user_id", "event_type", "ts"),
          "user_id", "ts", "event_type", steps, withinHours = Some(winH))
        .orderBy("step_idx").collect().map(_.getAs[Long]("n_users"))
      assert(got.toSeq == reached.map(_.size.toLong),
        s"funnel mismatch: got ${got.toSeq} vs ${reached.map(_.size)}")
    }
  }

  test("transitionMatrix equals a brute-force pair-count reference") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val types = Vector("a", "b", "c")
    val evGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0, 2), Gen.choose(0, 2), Gen.choose(0, 8)))
    samples(evGen, 8).filter(_.nonEmpty).foreach { raw =>
      val rows = raw.zipWithIndex.map { case ((u, t, m), i) =>
        (u.toLong, i.toLong, types(t), new Timestamp(base + m * 60000L)) }
      // brute force: per user sort by (ts, event_id), successive pairs
      val pairs = rows.groupBy(_._1).toSeq.flatMap { case (_, evs) =>
        val sorted = evs.sortBy(e => (e._4.getTime, e._2)).map(_._3)
        sorted.zip(sorted.drop(1))
      }
      val expCnt = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val fromTot = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      def r4(x: Double): Double =
        BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val got = TimeOps.transitionMatrix(
          rows.toDF("user_id", "event_id", "event_type", "ts"),
          "user_id", "ts", "event_id", "event_type")
        .collect().map(r => ((r.getString(0), r.getString(1)),
          (r.getLong(2), r.getDouble(3)))).toMap
      assert(got.keySet == expCnt.keySet)
      got.foreach { case (k, (n, pct)) =>
        assert(n == expCnt(k), s"count mismatch at $k")
        assert(pct == r4(n.toDouble / fromTot(k._1)), s"pct mismatch at $k")
      }
    }
  }

  test("rateAnomaly equals an exact-integer rolling-moments reference") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val nHours = 12; val trailing = 3
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evGen = Gen.listOfN(50, Gen.zip(Gen.choose(0, 1), Gen.choose(0, nHours - 1)))
    samples(evGen, 8).filter(_.nonEmpty).foreach { raw =>
      val rows = raw.map { case (t, h) =>
        (Seq("x", "y")(t), new Timestamp(base + h * 3600000L)) }
      val got = TimeOps.rateAnomaly(rows.toDF("event_type", "ts"),
          "ts", "event_type", "2024-01-01 00:00:00", nHours, trailing, 2.0)
        .collect().map(r => ((r.getString(0), r.getInt(1)),
          (r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]),
           r.getBoolean(4)))).toMap
      // brute: dense per-type counts, exact integer moments
      val types = rows.map(_._1).distinct
      val exp = for (t <- types; h <- trailing until nHours) yield {
        def cnt(hh: Int): Long =
          rows.count(e => e._1 == t && (e._2.getTime - base) / 3600000L == hh)
        val look = (h - trailing until h).map(cnt)
        val (s1, s2) = (look.sum, look.map(c => c * c).sum)
        val c = cnt(h)
        val z = if (trailing * s2 == s1 * s1) None
          else {
            val m = s1.toDouble / trailing
            Some((c - m) / math.sqrt((s2.toDouble - s1.toDouble * s1 / trailing) / trailing))
          }
        ((t, h), (c, z.map(r4), z.exists(v => math.abs(v) > 2.0)))
      }
      assert(got == exp.toMap, s"rateAnomaly mismatch")
    }
  }

  test("ksReport equals an exact brute-force KS reference") {
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val gen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 2), Gen.choose(0, 9)))
    samples(gen, 8).filter(_.map(_._1).distinct.size >= 2).foreach { raw =>
      val rows = raw.map { case (g, v) => (s"g$g", v) }
      val got = LibOps.ksReport(rows.toDF("g", "v"), "g", "v")
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getBoolean(4))))
        .toMap
      val support = rows.map(_._2).distinct.sorted
      val nTot = rows.size.toLong
      val exp = rows.groupBy(_._1).map { case (g, mine) =>
        val n = mine.size.toLong
        val rest = nTot - n
        val d = support.map { x =>
          val cg = mine.count(_._2 <= x).toLong
          val cr = rows.count(e => e._1 != g && e._2 <= x).toLong
          math.abs(cg.toDouble / n - cr.toDouble / rest)
        }.max
        val crit = 1.358 * math.sqrt(nTot.toDouble / (n.toDouble * rest.toDouble))
        (g, (n, r6(d), r6(crit), d > crit))
      }
      assert(got == exp, s"ksReport mismatch: $got vs $exp")
    }
  }

  test("attributionWeights equals an exact-rational brute-force reference") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val winUs = 4L * 3600L * 1000000L
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0, 2), Gen.choose(0, 2), Gen.choose(0, 600)))
    val types = Vector("view", "click", "purchase")
    samples(evGen, 8).filter(_.nonEmpty).foreach { raw =>
      val rows = raw.zipWithIndex.map { case ((u, t, m), i) =>
        (u.toLong, i.toLong, types(t), new Timestamp(base + m * 60000L)) }
      val got = TimeOps.attributionWeights(
          rows.toDF("user_id", "event_id", "event_type", "ts"),
          "user_id", "ts", "event_id", "event_type", "purchase",
          Seq("view", "click"), windowHours = 4)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          (r.getString(2), r.getLong(3),
           Option(r.get(4)).map(v => r6(v.asInstanceOf[Double]))))).toMap
      // brute: per (conversion, touch) pair with exact BIGINT raws
      val exp = (for {
        c <- rows if c._3 == "purchase"
        ts = (t: (Long, Long, String, Timestamp)) => t._4.getTime * 1000L
        touches = rows.filter(t => t._3 != "purchase" && t._1 == c._1 &&
          ts(t) < ts(c) && ts(t) >= ts(c) - winUs)
        tot = touches.map(t => winUs - (ts(c) - ts(t))).sum
        t <- touches
      } yield {
        val raw = winUs - (ts(c) - ts(t))
        ((c._2, t._2), (t._3, ts(c) - ts(t),
          if (tot == 0) None else Some(r6(raw.toDouble / tot.toDouble))))
      }).toMap
      assert(got == exp, s"attribution mismatch")
    }
  }

  test("rollingActiveUsers equals a brute-force sliding-distinct reference") {
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val w = 3
    def r4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val evGen = Gen.listOfN(40, Gen.zip(Gen.choose(0, 3), Gen.choose(0, 9)))
    samples(evGen, 8).filter(_.nonEmpty).foreach { raw =>
      val rows = raw.map { case (u, d) =>
        (u.toLong, new Timestamp(base + d * 86400000L + 3600000L)) }
      val got = TimeOps.rollingActiveUsers(rows.toDF("user_id", "ts"),
          "user_id", "ts", windowDays = w)
        .collect().map(r => (r.getDate(0).toString,
          (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val byDay = raw.map { case (u, d) => (u, d) }.distinct
      val exp = byDay.map(_._2).distinct.map { d =>
        val dau = byDay.count(_._2 == d).toLong
        val wau = byDay.filter(e => e._2 <= d && e._2 > d - w)
          .map(_._1).distinct.size.toLong
        val day = new java.sql.Date(base + d * 86400000L).toString
        (day, (dau, wau, r4(dau.toDouble / wau)))
      }.toMap
      assert(got == exp, s"rollingActive mismatch: $got vs $exp")
    }
  }

  test("minhash signature similarity approximates exact jaccard on dup docs") {
    // two near-identical docs: signature agreement should be high
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = ((1 to 39).map(i => s"w$i") :+ "different").mkString(" ")
    val df = Seq((1L, base), (2L, near)).toDF("doc_id", "text")
    val sigs = DedupOps.minhashSignature(df, "text").orderBy("doc_id")
      .select("minhash_sig").collect().map(_.getSeq[Long](0))
    val agree = sigs(0).zip(sigs(1)).count { case (a, b) => a == b }.toDouble / sigs(0).length
    assert(agree > 0.5, s"signature agreement $agree too low for ~0.9-jaccard docs")
  }

  test("spanIndexMerge fold-in equals rebuild on random corpora (generator law)") {
    // the occurrence-additivity law over RANDOM doc sets (the OpsSpec
    // variant uses the real table at fixed splits): small vocab +
    // short docs force heavy window collisions, doc lengths straddle
    // the n=3 window threshold, batches may be empty on either side.
    val docGen = Gen.listOfN(24,
      Gen.zip(Gen.choose(0, 1), // 0 = corpus, 1 = batch
        Gen.listOfN(6, Gen.choose(0, 4)).map(_.map(i => s"t$i")),
        Gen.choose(1, 6)))      // effective length (may be < n)
    samples(docGen, 8).foreach { raw =>
      val rows = raw.zipWithIndex.map { case ((side, ws, len), i) =>
        (i.toLong, side, ws.take(len).mkString(" ")) }
      val corpus = rows.filter(_._2 == 0).map(r => (r._1, r._3))
        .toDF("doc_id", "text")
      val batch = rows.filter(_._2 == 1).map(r => (r._1, r._3))
        .toDF("doc_id", "text")
      val all = rows.map(r => (r._1, r._3)).toDF("doc_id", "text")
      val merged = DedupOps.spanIndexMerge(
          DedupOps.spanIndex(corpus, "text", "doc_id", n = 3),
          batch, "text", "doc_id", n = 3)
        .select(hex(col("fp")), col("occ"))
        .collect().map(_.toString).sorted.toSeq
      val rebuilt = DedupOps.spanIndex(all, "text", "doc_id", n = 3)
        .select(hex(col("fp")), col("occ"))
        .collect().map(_.toString).sorted.toSeq
      assert(merged == rebuilt,
        s"merge != rebuild on ${rows.count(_._2 == 0)}+${rows.count(_._2 == 1)} docs")
    }
  }

  test("zipfFit equals a brute-force quantized-OLS reference") {
    // replicate the op's exact arithmetic: per-term ln doubles
    // quantized to DECIMAL(28,12) (HALF_UP, Spark's cast mode), exact
    // BigDecimal sums, final OLS in double — any drift in rank ties,
    // head selection, or sum order shows up as a hard mismatch.
    val docGen = Gen.listOfN(12,
      Gen.listOfN(8, Gen.choose(0, 9)).map(_.map(i => s"w$i").mkString(" ")))
    samples(docGen, 6).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val topK = 6
      val row = TextOps.zipfFit(df, "text", topK = topK).collect()(0)
      // split(" ", -1): keep empty tokens incl. trailing — the engine's
      // words() (Spark split) and DuckDB string_split both do
      val counts = texts.flatMap(_.split(" ", -1))
        .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
      val head = counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(topK)
      val n = head.size
      assert(row.getLong(0) == n.toLong)
      def q12(d: Double): BigDecimal =
        BigDecimal(d).setScale(12, BigDecimal.RoundingMode.HALF_UP)
      val pts = head.zipWithIndex.map { case ((_, c), i) =>
        (math.log((i + 1).toDouble), math.log(c.toDouble)) }
      val sx = pts.map(p => q12(p._1)).sum.toDouble
      val sy = pts.map(p => q12(p._2)).sum.toDouble
      val sxy = pts.map(p => q12(p._1 * p._2)).sum.toDouble
      val sxx = pts.map(p => q12(p._1 * p._1)).sum.toDouble
      val denom = n * sxx - sx * sx
      if (denom == 0.0) assert(row.isNullAt(1))
      else {
        val slope = (n * sxy - sx * sy) / denom
        def r6(d: Double): Double = BigDecimal(d)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(row.getDouble(1) == r6(slope),
          s"slope ${row.getDouble(1)} != ${r6(slope)}")
        assert(row.getDouble(2) == r6((sy - slope * sx) / n))
      }
    }
  }

  test("pageRank equals a brute-force all-integer-fixpoint reference") {
    // replicate the op's exact arithmetic: rank units of 1e-12, every
    // rounding the rational half-up integer division
    // half_up(a/b) = (2a+b) div (2b), exact BigInt throughout — any
    // drift in dangling handling, per-edge contribution rounding, or
    // the damped update shows as a hard mismatch on the exact
    // rank_e12 integers. Also pins mass conservation: |Σu − 1e12|
    // bounded by one half-unit per rounded term.
    def hu(a: BigInt, b: BigInt): BigInt = (a * 2 + b) / (b * 2)
    val S = BigInt(GraphOps.Scale)
    val edgeGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0, 9), Gen.choose(0, 9), Gen.choose(1, 5)))
    samples(edgeGen, 5).filter(_.nonEmpty).foreach { raw =>
      val df = raw.map { case (a, b, w) => (s"n$a", s"n$b", w.toLong) }
        .toDF("src", "dst", "w")
      val got = GraphOps.pageRank(df, "src", "dst", "w", iters = 3)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val ew = raw.groupBy(t => (s"n${t._1}", s"n${t._2}"))
        .map { case ((s, d), ts) => (s, d, BigInt(ts.map(_._3.toLong).sum)) }.toSeq
      val outw = ew.groupBy(_._1).map { case (s, es) => (s, es.map(_._3).sum) }
      val nodes = (ew.map(_._1) ++ ew.map(_._2)).distinct.sorted
      val n = BigInt(nodes.size)
      val base = hu(15 * S, 100 * n)
      var r = nodes.map(_ -> hu(S, n)).toMap
      for (_ <- 1 to 3) {
        val dang = nodes.filterNot(outw.contains).map(r).sum
        val contrib = scala.collection.mutable.Map[String, BigInt]()
          .withDefaultValue(BigInt(0))
        for ((s, d, w) <- ew)
          contrib(d) += hu(r(s) * w, outw(s))
        r = nodes.map(v => v ->
          (base + hu(contrib(v) * 85, BigInt(100))
                + hu(dang * 85, 100 * n))).toMap
      }
      val expect = r.map { case (k, v) => (k, v.toLong) }
      assert(got == expect)
      val mass = got.values.map(BigInt(_)).sum
      assert((mass - S).abs <= nodes.size * 2 + ew.size,
        s"mass $mass drifted from $S")
      // explicit stageDir (the graded configuration) must equal the
      // auto-staged default above — both go through the parquet
      // round-trip since round 8 (the unstaged path is unreachable);
      // the BigInt reference is what pins the round-trip's VALUES
      val dir = java.nio.file.Files.createTempDirectory("pr_stage").toString
      val staged = GraphOps.pageRank(df, "src", "dst", "w", iters = 3,
          stageDir = Some(dir))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(staged == expect)
    }
  }

  test("heapsFit equals a brute-force quantized-OLS reference") {
    val HALF_UP = BigDecimal.RoundingMode.HALF_UP
    def q12(d: Double): BigDecimal = BigDecimal(d).setScale(12, HALF_UP)
    def r6(d: Double): Double = BigDecimal(d).setScale(6, HALF_UP).toDouble
    val docGen = Gen.listOfN(10,
      Gen.listOfN(6, Gen.choose(0, 7)).map(_.map(i => s"w$i").mkString(" ")))
    samples(docGen, 6).foreach { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val row = TextOps.heapsFit(df, "text", "doc_id").collect()(0)
      // brute force in doc_id order
      var seen = Set.empty[String]
      var (cumTok, cumVoc) = (0L, 0L)
      val pts = texts.zipWithIndex.flatMap { case (t, _) =>
        val ws = t.split(" ", -1).toSeq // keep empty tokens, like words()
        cumTok += ws.size
        val fresh = ws.distinct.filterNot(seen)
        seen ++= fresh
        cumVoc += fresh.size
        if (cumTok > 0 && cumVoc > 0)
          Some((math.log(cumTok.toDouble), math.log(cumVoc.toDouble)))
        else None
      }
      val n = pts.size
      assert(row.getLong(0) == n.toLong)
      val sx = pts.map(p => q12(p._1)).sum.toDouble
      val sy = pts.map(p => q12(p._2)).sum.toDouble
      val sxy = pts.map(p => q12(p._1 * p._2)).sum.toDouble
      val sxx = pts.map(p => q12(p._1 * p._1)).sum.toDouble
      val denom = n * sxx - sx * sx
      if (denom == 0.0) assert(row.isNullAt(1))
      else {
        val slope = (n * sxy - sx * sy) / denom
        assert(row.getDouble(1) == r6(slope),
          s"beta ${row.getDouble(1)} != ${r6(slope)}")
        assert(row.getDouble(2) == r6((sy - slope * sx) / n))
      }
    }
  }

  test("aucByGroup equals per-group brute-force pair counting") {
    def r6(d: Double): Double = BigDecimal(d)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rowGen = Gen.listOfN(80,
      Gen.zip(Gen.choose(0, 2), Gen.choose(-5L, 5L), Gen.oneOf(true, false)))
    samples(rowGen, 6).foreach { data =>
      val df = data.map { case (g, s, y) => (s"g$g", s, y) }
        .toDF("grp", "score", "y")
      val got = EvalOps.aucByGroup(df, "score", "y", "grp")
        .collect().map(r => (r.getString(0),
          (r.getLong(1), r.getLong(2),
           if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
      data.groupBy(t => s"g${t._1}").foreach { case (g, rows) =>
        val pos = rows.filter(_._3).map(_._2)
        val neg = rows.filterNot(_._3).map(_._2)
        val (p, nn) = (pos.size.toLong, neg.size.toLong)
        val expected =
          if (p == 0 || nn == 0) None
          else {
            val num2 = (for (a <- pos; b <- neg) yield
              if (a > b) 2L else if (a == b) 1L else 0L).sum
            Some(r6(num2.toDouble / (p.toDouble * nn.toDouble * 2)))
          }
        assert(got(g) == ((p, nn, expected)), s"group $g")
      }
    }
  }

  test("minLabelPropagate equals a brute-force k-round reference; converges to CC") {
    // the graded function is "labels after exactly k rounds" — mirror
    // it with plain Scala maps; with k >= node count the result must
    // equal brute-force connected components (the dedupClusters
    // contract for bounded-diameter graphs)
    val edgeGen = Gen.listOfN(20, Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))
    samples(edgeGen, 6).filter(_.nonEmpty).foreach { raw =>
      val df = raw.toDF("a", "b")
      val nbrs = (raw ++ raw.map(_.swap)).groupBy(_._1)
        .map { case (n, es) => (n, es.map(_._2).toSet) }
      val nodes = nbrs.keySet.toSeq.sorted
      def propagate(k: Int): Map[Long, Long] = {
        var l = nodes.map(n => n -> n).toMap
        for (_ <- 1 to k)
          l = nodes.map(n => n -> math.min(l(n), nbrs(n).map(l).min)).toMap
        l
      }
      for (k <- Seq(1, 3)) {
        val got = GraphOps.minLabelPropagate(df, "a", "b", iters = k)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == propagate(k), s"k=$k edges=$raw")
      }
      // k >= |nodes| guarantees convergence: equals brute-force CC.
      // staged — unstaged the chain re-derives ~2^k subtrees (each
      // round references its predecessor twice), unusable past k ~ 5
      val dir = java.nio.file.Files.createTempDirectory("lp_stage").toString
      val conv = GraphOps.minLabelPropagate(df, "a", "b",
          iters = nodes.size, stageDir = Some(dir))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      def ccOf(start: Long): Long = {
        var seen = Set(start); var frontier = Set(start)
        while (frontier.nonEmpty) {
          frontier = frontier.flatMap(nbrs) -- seen; seen ++= frontier
        }
        seen.min
      }
      assert(conv == nodes.map(n => n -> ccOf(n)).toMap)
    }
  }

  test("scoreCountsMerge: merge == rebuild, chains compose, aucFromCounts == aucReport") {
    // the eval layer's spanIndexMerge law: class counts are additive
    // over disjoint row sets, so folding a batch's scoreCounts into a
    // stored state equals rebuilding from the union — checked on
    // random (group, score, label) data as states (row-compare), as a
    // two-step chain, through the AUC consumer, and with keys
    val rowGen = Gen.listOfN(60,
      Gen.zip(Gen.choose(0, 2), Gen.choose(-4L, 4L), Gen.oneOf(true, false)))
    samples(rowGen, 5).foreach { data =>
      val df = data.zipWithIndex.map { case ((g, s, y), i) =>
        (i.toLong, s"g$g", s, y) }.toDF("id", "grp", "score", "y")
      def rows(x: org.apache.spark.sql.DataFrame): Seq[String] =
        x.collect().map(_.toString).sorted.toSeq
      val a = df.filter($"id" % 2 === 0)
      val b = df.filter($"id" % 2 =!= 0 && $"id" < 40)
      val c = df.filter($"id" % 2 =!= 0 && $"id" >= 40)
      val full = EvalOps.scoreCounts(df, "score", "y")
      val merged = EvalOps.scoreCountsMerge(
        EvalOps.scoreCountsMerge(
          EvalOps.scoreCounts(a, "score", "y"),
          EvalOps.scoreCounts(b, "score", "y")),
        EvalOps.scoreCounts(c, "score", "y"))
      assert(rows(merged) == rows(full), "chained state merge != rebuild")
      assert(rows(EvalOps.aucFromCounts(merged)) ==
        rows(EvalOps.aucReport(df, "score", "y")),
        "AUC from merged state != one-shot aucReport")
      val keyedFull = EvalOps.scoreCounts(df, "score", "y", Seq("grp"))
      val keyedMerged = EvalOps.scoreCountsMerge(
        EvalOps.scoreCounts(a, "score", "y", Seq("grp")),
        EvalOps.scoreCounts(df.filter($"id" % 2 =!= 0), "score", "y", Seq("grp")),
        Seq("grp"))
      assert(rows(keyedMerged) == rows(keyedFull), "keyed merge != rebuild")
    }
  }

  test("labelConvergenceAudit equals brute-force per-round change counts") {
    // the audit's contract: n_changed at round i is EXACTLY the count
    // of endpoints whose label moved in simultaneous-update round i,
    // and a 0 is permanent (min-label propagation is monotone, so
    // once nothing moves, nothing ever moves again)
    val edgeGen = Gen.listOfN(16, Gen.zip(Gen.choose(0L, 9L), Gen.choose(0L, 9L)))
    samples(edgeGen, 4).filter(_.nonEmpty).foreach { raw =>
      val df = raw.toDF("a", "b")
      val nbrs = (raw ++ raw.map(_.swap)).groupBy(_._1)
        .map { case (n, es) => (n, es.map(_._2).toSet) }
      val nodes = nbrs.keySet.toSeq.sorted
      var l = nodes.map(n => n -> n).toMap
      val expect = (1 to 5).map { _ =>
        val nl = nodes.map(n => n -> math.min(l(n), nbrs(n).map(l).min)).toMap
        val changed = nodes.count(n => nl(n) != l(n)).toLong
        l = nl
        changed
      }
      val got = GraphOps.labelConvergenceAudit(df, "a", "b", iters = 5)
        .orderBy(col("round")).collect().map(_.getLong(1)).toSeq
      assert(got == expect, s"edges=$raw")
      // monotone convergence: zeros only as a suffix
      val firstZero = got.indexWhere(_ == 0L)
      if (firstZero >= 0)
        assert(got.drop(firstZero).forall(_ == 0L), s"non-suffix zero: $got")
    }
  }

  test("componentsIncremental equals brute-force components of the union") {
    // the quotient-graph law: with snapshot labels = canonical
    // component minima of the OLD edges, folding a batch of new edges
    // via label-quotient propagation must equal connected components
    // of old ∪ new — bridging old components, extending them with
    // unseen nodes, and creating brand-new components all occur in
    // random splits. iters = node count guarantees convergence on
    // both the snapshot and the quotient.
    val edgeGen = Gen.listOfN(18, Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L)))
    samples(edgeGen, 5).filter(_.size >= 2).foreach { raw =>
      val (oldRaw, newRaw) = raw.zipWithIndex.partition(_._2 % 3 != 0)
      val oldE = oldRaw.map(_._1); val newE = newRaw.map(_._1)
      if (oldE.nonEmpty && newE.nonEmpty) {
        val k = 12
        val snap = GraphOps.minLabelPropagate(oldE.toDF("a", "b"), "a", "b", k)
        val got = GraphOps.componentsIncremental(snap, newE.toDF("a", "b"),
            "a", "b", k)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        // brute-force CC of the union over ALL touched nodes
        val union = oldE ++ newE
        val nbrs = (union ++ union.map(_.swap)).groupBy(_._1)
          .map { case (n, es) => (n, es.map(_._2).toSet) }
        def ccOf(start: Long): Long = {
          var seen = Set(start); var frontier = Set(start)
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(n => nbrs.getOrElse(n, Set.empty)) -- seen
            seen ++= frontier
          }
          seen.min
        }
        val expect = nbrs.keySet.map(n => n -> ccOf(n)).toMap
        assert(got == expect, s"old=$oldE new=$newE")
      }
    }
  }

  test("componentsIncremental chained folds compose: fold b1 then b2 == fold (b1 ∪ b2) == one-shot") {
    // real ingest CHAINS folds (round-8 verdict task: the graded
    // instance folds one batch; daily ingest folds forever). The
    // closure argument: componentsIncremental's output is itself a
    // converged canonical labeling of the union (labels = component
    // minima — the quotient propagation of minima yields minima), so
    // it satisfies the op's own snapshot precondition and a second
    // fold composes exactly: fold(fold(snap, b1), b2) ==
    // fold(snap, b1 ∪ b2) == brute-force CC of old ∪ b1 ∪ b2.
    val edgeGen = Gen.listOfN(21, Gen.zip(Gen.choose(0L, 13L), Gen.choose(0L, 13L)))
    samples(edgeGen, 5).filter(_.size >= 3).foreach { raw =>
      val grouped = raw.zipWithIndex.groupMap(_._2 % 3)(_._1)
      val oldE = grouped.getOrElse(0, Nil)
      val b1 = grouped.getOrElse(1, Nil)
      val b2 = grouped.getOrElse(2, Nil)
      if (oldE.nonEmpty && b1.nonEmpty && b2.nonEmpty) {
        val k = 14
        def labs(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
          df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val snap = GraphOps.minLabelPropagate(oldE.toDF("a", "b"), "a", "b", k)
        val chained = labs(GraphOps.componentsIncremental(
          GraphOps.componentsIncremental(snap, b1.toDF("a", "b"), "a", "b", k),
          b2.toDF("a", "b"), "a", "b", k))
        val oneFold = labs(GraphOps.componentsIncremental(
          snap, (b1 ++ b2).toDF("a", "b"), "a", "b", k))
        assert(chained == oneFold, s"chained folds != single fold of the union")
        val union = oldE ++ b1 ++ b2
        val nbrs = (union ++ union.map(_.swap)).groupBy(_._1)
          .map { case (n, es) => (n, es.map(_._2).toSet) }
        def ccOf(start: Long): Long = {
          var seen = Set(start); var frontier = Set(start)
          while (frontier.nonEmpty) {
            frontier = frontier.flatMap(n => nbrs.getOrElse(n, Set.empty)) -- seen
            seen ++= frontier
          }
          seen.min
        }
        assert(chained == nbrs.keySet.map(n => n -> ccOf(n)).toMap,
          s"old=$oldE b1=$b1 b2=$b2")
      }
    }
  }

  test("KMV sketch state: merge == rebuild, chains compose, estimate == kmvDistinct") {
    // the spanIndexMerge law family for the count-distinct index:
    // k-smallest-of-distinct-union is associative, so folding a batch
    // sketch into a stored state equals rebuilding from the union —
    // compared on the exact state rows AND the exact estimates.
    val k = 8
    val gen = Gen.listOfN(120, Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 40L)))
    samples(gen, 5).foreach { data =>
      val (a, b) = data.splitAt(data.length / 2)
      def mk(rows: Seq[(Int, Long)]) =
        rows.map { case (g, v) => (s"g$g", v) }.toDF("g", "v")
      def stateSet(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
      val skA = LibOps.kmvSketch(mk(a), Seq("g"), "v", k)
      val skB = LibOps.kmvSketch(mk(b), Seq("g"), "v", k)
      val merged = LibOps.kmvMerge(skA, skB, Seq("g"), k)
      val rebuilt = LibOps.kmvSketch(mk(data), Seq("g"), "v", k)
      assert(stateSet(merged) == stateSet(rebuilt))
      // chained compose: fold b in two pieces
      val (b1, b2) = b.splitAt(b.length / 2)
      val chained = LibOps.kmvMerge(
        LibOps.kmvMerge(skA, LibOps.kmvSketch(mk(b1), Seq("g"), "v", k), Seq("g"), k),
        LibOps.kmvSketch(mk(b2), Seq("g"), "v", k), Seq("g"), k)
      assert(stateSet(chained) == stateSet(rebuilt))
      // the estimate off the merged state == the one-pass estimator
      val est = LibOps.kmvEstimate(merged, Seq("g"), k)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      val direct = LibOps.kmvDistinct(mk(data), Seq("g"), "v", k)
        .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      assert(est == direct)
    }
  }

  test("sharded KMV: drop-shard == rebuild-without; estimate off shards == unsharded") {
    // the retraction law for the family whose state cannot subtract
    // (round 10): per-shard sketches make deletion a shard anti-join,
    // and the estimate off the shard union is EXACT because each of
    // the union's k smallest hashes lies within its own shard's k
    // smallest — compared against the direct single-pass estimator
    // on random 3-shard splits, including k-saturated groups.
    val k = 8
    val gen = Gen.listOfN(120,
      Gen.zip(Gen.choose(0, 2), Gen.zip(Gen.choose(0, 2), Gen.choose(0L, 40L))))
    samples(gen, 5).foreach { data =>
      val rows = data.map { case (sh, (g, v)) => (sh.toLong, s"g$g", v) }
      val df = rows.toDF("shard", "g", "v")
      val st = LibOps.kmvSketchSharded(df, Seq("g"), "v", "shard", k)
      def estOf(state: org.apache.spark.sql.DataFrame) =
        LibOps.kmvEstimateSharded(state, Seq("g"), k)
          .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      def directOf(d: org.apache.spark.sql.DataFrame) =
        LibOps.kmvDistinct(d, Seq("g"), "v", k)
          .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
      // full-state estimate == the unsharded one-pass estimator
      assert(estOf(st) == directOf(df))
      // drop shard 1 == rebuild over the survivors
      val retracted = LibOps.kmvShardDelete(st,
        Seq(1L).toDF("shard"), "shard")
      assert(estOf(retracted) ==
        directOf(df.filter(org.apache.spark.sql.functions.col("shard") =!= 1L)),
        s"shard retraction != rebuild-without on $rows")
    }
  }

  test("aucReport equals brute-force pair counting (Mann–Whitney law)") {
    // AUC over the aggregated score domain must equal the O(n²)
    // definition: P(random pos outranks random neg), ties half —
    // heavy integer ties and single-class degenerate draws included.
    val slGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(-3, 3), Gen.oneOf(true, false)))
    samples(slGen, 10).foreach { data =>
      val df = data.toDF("score", "y")
      val row = EvalOps.aucReport(df, "score", "y").collect()(0)
      val pos = data.filter(_._2).map(_._1)
      val neg = data.filterNot(_._2).map(_._1)
      assert(row.getLong(0) == pos.length && row.getLong(1) == neg.length)
      if (pos.isEmpty || neg.isEmpty) assert(row.isNullAt(2))
      else {
        val num2 = (for (p <- pos; n <- neg)
          yield if (p > n) 2L else if (p == n) 1L else 0L).sum
        val brute = BigDecimal(num2.toDouble / (2.0 * pos.length * neg.length))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(row.getDouble(2) - brute) < 1e-12,
          s"auc ${row.getDouble(2)} != brute $brute")
      }
    }
  }

  test("prCurve equals brute-force thresholding; calibration bins sum back") {
    val slGen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0, 4), Gen.oneOf(true, false)))
    samples(slGen, 6).filter(d => d.exists(_._2)).foreach { data =>
      val df = data.toDF("score", "y")
      val pr = EvalOps.prCurve(df, "score", "y").orderBy("threshold").collect()
      val p = data.count(_._2).toLong
      pr.foreach { r =>
        val t = r.getLong(0)
        val tp = data.count(d => d._1 >= t && d._2).toLong
        val fp = data.count(d => d._1 >= t && !d._2).toLong
        assert(r.getLong(1) == tp && r.getLong(2) == fp && r.getLong(3) == p - tp)
      }
      // recall non-increasing in threshold; thresholds are the distinct scores
      val recalls = pr.map(_.getDouble(5))
      assert(recalls.zip(recalls.tail).forall { case (a, b) => a >= b })
      assert(pr.map(_.getLong(0)).toSet == data.map(_._1.toLong).toSet)
      val cal = EvalOps.calibrationBins(df, "score", "y").collect()
      assert(cal.map(_.getLong(1)).sum == data.length.toLong)
      assert(cal.map(_.getLong(2)).sum == p)
    }
  }

  test("DeltaState equals the sequential delete-then-merge fold on random batch sequences") {
    // the protocol law behind streaming_fold_delta_parity, randomized:
    // for ANY sequence of add/del batches (adds of fresh ids, dels
    // drawn from anything seen — base, earlier adds, the same batch's
    // adds-not-yet-visible, or ids never present at all), the
    // delta-resolved state must equal folding delete-then-merge
    // sequentially — and compacting at an arbitrary point changes
    // nothing. Dels of same-batch adds exercise the strictly-older
    // rule (they must NOT kill them); dels of absent ids exercise
    // anti-join no-ops.
    import graft.streaming.DeltaState
    import graft.streaming.DeltaState.DeltaFoldSpec
    // a del candidate is either an absolute id in the base/absent range
    // (0–60; generated add ids start at 101, so these never alias an
    // add) or — the round-11 advice fix — an INDEX into the add ids
    // generated so far INCLUDING the current batch's, resolved at run
    // time, so the same-batch branch (the tombstone must NOT kill its
    // own batch's adds — the strictly-older `__db > __b` core) and the
    // prior-add retraction branch are both actually exercised
    val seqGen = for {
      nBase <- Gen.choose(0, 12)
      nBatches <- Gen.choose(1, 4)
      batches <- Gen.listOfN(nBatches, Gen.zip(
        Gen.choose(0, 6),                          // fresh adds in this batch
        Gen.listOfN(4, Gen.zip(Gen.oneOf(false, true), Gen.choose(0L, 60L)))))
      compactAt <- Gen.choose(0, nBatches)
    } yield (nBase, batches, compactAt)
    val spec = DeltaFoldSpec(
      add = b => b.filter($"op" === "add").select($"id", ($"id" * 7).as("sig")),
      del = Some(b => b.filter($"op" === "del").select($"id")))
    samples(seqGen, 6).zipWithIndex.foreach { case ((nBase, batches, compactAt), ci) =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"ds_law_$ci").toString + "/s"
      var next = 100L
      val base = (0L until nBase.toLong).map(i => (i, i * 7))
      DeltaState.init(spark, dir, base.toDF("id", "sig"))
      var ref = base.toMap
      var allAdds = Vector.empty[Long]
      batches.zipWithIndex.foreach { case ((nAdds, delPicks), bi) =>
        val adds = (0 until nAdds).map(_ => { next += 1; next })
        allAdds ++= adds
        val delIds = delPicks.map { case (fromAdds, v) =>
          if (fromAdds && allAdds.nonEmpty) allAdds((v % allAdds.size).toInt)
          else v
        }
        val batch = adds.map(i => (i, "add"))
          .++(delIds.map(i => (i, "del"))).toDF("id", "op")
        DeltaState.applyDeltaBatch(spark, dir, bi.toLong, batch, spec)
        // reference: dels apply to the state BEFORE the batch, adds after
        ref = (ref -- delIds) ++ adds.map(i => i -> i * 7)
        if (compactAt == bi + 1) DeltaState.compact(spark, dir)
        val got = DeltaState.read(spark, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got == ref.toSeq.sorted,
          s"case $ci batch $bi (compactAt=$compactAt): delta state != sequential fold")
      }
      graft.io.FsOps.rm(spark, dir)
    }
  }

  test("overlay composition equals read() on random batch sequences") {
    // the batch-scale view's contract, randomized (DeltaStateSpec pins
    // one deterministic case): for ANY pending chain,
    // base.antiJoin(tombstones) ∪ resolvedAdds ≡ read()'s resolution —
    // the bucketed-base consumers (the delta probes) stand on exactly
    // this identity, so it must hold under same-batch dels, dels of
    // prior adds, dels of absent ids, and overlay-internal retraction
    import graft.streaming.DeltaState
    import graft.streaming.DeltaState.DeltaFoldSpec
    val seqGen = for {
      nBase <- Gen.choose(1, 10)
      nBatches <- Gen.choose(1, 3)
      batches <- Gen.listOfN(nBatches, Gen.zip(
        Gen.choose(1, 5),
        Gen.listOfN(3, Gen.zip(Gen.oneOf(false, true), Gen.choose(0L, 40L)))))
    } yield (nBase, batches)
    val spec = DeltaFoldSpec(
      add = b => b.filter($"op" === "add").select($"id", ($"id" * 7).as("sig")),
      del = Some(b => b.filter($"op" === "del").select($"id")))
    samples(seqGen, 5).zipWithIndex.foreach { case ((nBase, batches), ci) =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"ov_law_$ci").toString + "/s"
      var next = 100L
      val base = (0L until nBase.toLong).map(i => (i, i * 7))
      DeltaState.init(spark, dir, base.toDF("id", "sig"))
      var allAdds = Vector.empty[Long]
      batches.zipWithIndex.foreach { case ((nAdds, delPicks), bi) =>
        val adds = (0 until nAdds).map(_ => { next += 1; next })
        allAdds ++= adds
        val delIds = delPicks.map { case (fromAdds, v) =>
          if (fromAdds && allAdds.nonEmpty) allAdds((v % allAdds.size).toInt)
          else v
        }
        DeltaState.applyDeltaBatch(spark, dir, bi.toLong,
          adds.map(i => (i, "add")).++(delIds.map(i => (i, "del")))
            .toDF("id", "op"), spec)
      }
      val (resolvedAdds, tombs) = DeltaState.overlay(spark, dir)
      val composed = tombs.fold(base.toDF("id", "sig"))(t =>
          base.toDF("id", "sig").join(t, Seq("id"), "left_anti"))
        .unionByName(resolvedAdds)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val viaRead = DeltaState.read(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(composed == viaRead,
        s"case $ci: overlay composition != read() resolution")
      graft.io.FsOps.rm(spark, dir)
    }
  }

  test("MergeFold equals the sequential merge fold on random signed batch sequences") {
    // the aggregate twin of the DeltaState law: for ANY sequence of
    // signed partial batches (adds +w, retractions −w, keys drawn from
    // base keys, prior batches' keys, or fresh), the merge-resolved
    // state must equal folding group-sum sequentially — and compacting
    // at an arbitrary point changes nothing. Keys that cancel to zero
    // must DROP (the =!= 0 filter is what keeps drop-zero associative
    // where drop-negative would not be).
    import graft.streaming.DeltaState
    import graft.streaming.DeltaState.MergeFoldSpec
    val seqGen = for {
      nBase <- Gen.choose(0, 8)
      nBatches <- Gen.choose(1, 4)
      batches <- Gen.listOfN(nBatches,
        Gen.listOfN(5, Gen.zip(Gen.choose(0L, 12L), Gen.choose(-2L, 3L))))
      compactAt <- Gen.choose(0, nBatches)
    } yield (nBase, batches, compactAt)
    val spec = MergeFoldSpec(
      partial = b => b.groupBy($"k").agg(sum($"w").as("n")).filter($"n" =!= 0),
      merge = df => df.groupBy($"k").agg(sum($"n").as("n")).filter($"n" =!= 0))
    samples(seqGen, 6).zipWithIndex.foreach { case ((nBase, batches, compactAt), ci) =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"mf_law_$ci").toString + "/s"
      val base = (0L until nBase.toLong).map(k => (k, k + 1))
      DeltaState.init(spark, dir, base.toDF("k", "n"))
      var ref = base.toMap
      batches.zipWithIndex.foreach { case (pairs, bi) =>
        DeltaState.applyDeltaBatch(spark, dir, bi.toLong,
          pairs.toDF("k", "w"), spec)
        pairs.foreach { case (k, w) =>
          val n = ref.getOrElse(k, 0L) + w
          ref = if (n == 0) ref - k else ref + (k -> n)
        }
        if (compactAt == bi + 1) spec.compactStore(spark, dir)
        val got = spec.resolve(spark, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got == ref.toSeq.sorted,
          s"case $ci batch $bi (compactAt=$compactAt): merge state != sequential fold")
      }
      graft.io.FsOps.rm(spark, dir)
    }
  }

  test("MergeFold generality: a top-k-min merge (the kmv re-rank shape) satisfies the protocol") {
    // merge need not be a sum — any group-merge with
    // merge(merge(X) ∪ Y) ≡ merge(X ∪ Y) qualifies. k smallest values
    // per key (the kmvMerge re-rank law) is associative because each
    // of the union's k smallest is within its own side's k smallest.
    import graft.streaming.DeltaState
    import graft.streaming.DeltaState.MergeFoldSpec
    val k = 3
    def topK(df: org.apache.spark.sql.DataFrame) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"v")
      df.withColumn("__r", org.apache.spark.sql.functions.row_number.over(w))
        .filter($"__r" <= k).drop("__r")
    }
    val spec = MergeFoldSpec(partial = b => topK(b), merge = df => topK(df))
    val seqGen = Gen.listOfN(3,
      Gen.listOfN(6, Gen.zip(Gen.choose(0L, 2L), Gen.choose(0L, 50L))))
    samples(seqGen, 4).zipWithIndex.foreach { case (batches, ci) =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"mf_kmv_$ci").toString + "/s"
      DeltaState.init(spark, dir, Seq.empty[(Long, Long)].toDF("g", "v"))
      var all = Seq.empty[(Long, Long)]
      batches.zipWithIndex.foreach { case (pairs, bi) =>
        DeltaState.applyDeltaBatch(spark, dir, bi.toLong,
          pairs.toDF("g", "v"), spec)
        all ++= pairs
        if (bi == 1) spec.compactStore(spark, dir)
        val want = all.groupBy(_._1).toSeq.flatMap { case (g, vs) =>
          vs.map(_._2).sorted.take(k).map((g, _))
        }.sorted
        val got = spec.resolve(spark, dir).collect()
          .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
        assert(got == want,
          s"case $ci batch $bi: top-$k merge state != k smallest of everything")
      }
      graft.io.FsOps.rm(spark, dir)
    }
  }
}
