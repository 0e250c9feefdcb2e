package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (SURVEY.md §2.11 — training-data
  * curation). Before training, every document that shares verbatim
  * n-grams with an evaluation benchmark must be found (and usually
  * dropped), or the benchmark is compromised. The standard recipe is
  * exact n-gram collision: any train doc containing an n-gram that
  * also appears in the benchmark is contaminated.
  *
  * Scale shape (the part that matters at 100 TB): the benchmark side
  * is always tiny relative to the corpus (benchmarks are thousands of
  * docs, the corpus is billions), so its DISTINCT n-gram set is
  * broadcast and the corpus scan never shuffles — contamination
  * detection is a map-side join over one pass of the training data.
  * The per-doc n-gram explosion is bounded by doc length; n-grams are
  * deduplicated per doc BEFORE the join so a pathological repeated
  * phrase cannot inflate the probe side.
  */
object DeconOps {

  /** Per-train-doc contamination against `benchmark`: the count of the
    * doc's distinct word `n`-grams that appear anywhere in the
    * benchmark, plus the contaminated flag. Docs shorter than `n`
    * words have no n-grams and are trivially clean (n_grams = 0).
    *
    * Output: (idCol, n_grams, n_shared, contaminated), one row per
    * train doc.
    */
  def decontaminate(train: DataFrame, benchmark: DataFrame,
                    textCol: String = "text", idCol: String = "doc_id",
                    n: Int = 3): DataFrame = {
    import graft.functions.TextFunctions.word_ngrams
    // distinct per doc: collisions are counted once per (doc, gram)
    val trainGrams = train.select(col(idCol),
      explode_outer(array_distinct(word_ngrams(col(textCol), n))).as("gram"))
    // global distinct over the benchmark — small by contract, broadcast
    val bmGrams = benchmark
      .select(explode(word_ngrams(col(textCol), n)).as("gram"))
      .distinct()
      .withColumn("hit", lit(1))
    trainGrams
      .join(broadcast(bmGrams), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(count(col("gram")).cast("int").as("n_grams"),
           count(col("hit")).cast("int").as("n_shared"))
      .withColumn("contaminated", col("n_shared") >= 1)
  }

  /** Bloom-accelerated exact decontamination — the shape that survives
    * when the benchmark side outgrows broadcast. `decontaminate`
    * broadcasts the exact gram set (tens of bytes per gram: at ~1e8
    * held-out grams that is multi-GB per executor). Here the corpus
    * probes a Bloom filter of the benchmark grams instead
    * (~1.2 bytes/gram at 3% fpp — two orders smaller), and only the
    * surviving ~fpp fraction of (doc, gram) rows reaches the exact
    * verify join. Same trick Spark's InjectRuntimeFilter plays on join
    * builds, applied to curation.
    *
    * Result is EXACT, not approximate: Bloom filters have no false
    * negatives, and false positives are removed by the keyed equi-join
    * against the true benchmark grams — so the output (and the DuckDB
    * oracle) is identical to `decontaminate`'s.
    *
    * Scale shape: per-doc `n_grams` is computed row-locally (no
    * explosion survives past the probe), the corpus never shuffles its
    * text, and the verify join moves only the bloom-surviving grams —
    * at a 3% fpp that is ~3% of the corpus gram stream plus the true
    * hits.
    *
    * `expectedGrams` sizes the filter; pass the known benchmark gram
    * cardinality in production. The default (-1) counts the benchmark
    * side — a bounded job over the SMALL side only, run once at plan
    * construction (same documented trade-off as SimOps.detectDim).
    *
    * Output contract: ONE ROW PER DISTINCT `idCol` (the final
    * aggregate groups on it) — duplicate ids pool their grams into a
    * single row. Feed deduplicated documents; an upstream id collision
    * here is data corruption this op does not try to repair.
    */
  def bloomDecontaminate(train: DataFrame, benchmark: DataFrame,
                         textCol: String = "text", idCol: String = "doc_id",
                         n: Int = 3, fpp: Double = 0.03,
                         expectedGrams: Long = -1L): DataFrame = {
    import graft.functions.TextFunctions.word_ngrams
    import graft.functions.BloomFunctions.bloom_probe
    val bmGrams = benchmark
      .select(explode(word_ngrams(col(textCol), n)).as("gram"))
      .distinct()
      // pin: the gram set feeds three consumers (cardinality count,
      // bloom build, exact verify join) — without the checkpoint each
      // would rescan and re-shuffle the benchmark corpus (the BpeOps
      // vocab-pinning idiom)
      .localCheckpoint(true)
    val expected =
      if (expectedGrams > 0) expectedGrams
      else math.max(1L, bmGrams.count())
    // distributed build over the benchmark side (treeAggregate under
    // stat.bloomFilter) — the driver holds only the finished bits
    val bloom = bmGrams.stat.bloomFilter(col("gram"), expected, fpp)
    // ONE corpus pass: the distinct-gram array is computed once and
    // feeds both size() and the probe stream (round 3 recomputed
    // word_ngrams for each — doubling the most expensive row-local
    // work per doc at scale). The bloom probe runs INSIDE the array
    // via a higher-order filter, so only probe-positive grams explode;
    // explode_outer keeps one NULL-gram row for clean docs, which is
    // what lets a single downstream aggregate stay total over the
    // corpus with no join-back to a second scan.
    val slim = train
      .select(col(idCol),
        array_distinct(word_ngrams(col(textCol), n)).as("__grams"))
      .select(col(idCol),
        coalesce(size(col("__grams")), lit(0)).cast("int").as("n_grams"),
        explode_outer(filter(col("__grams"),
          g => bloom_probe(g, bloom))).as("gram"))
    slim
      // left equi-join on gram = the exact verify; bloom false
      // positives fail to match (NULL __bm) and count as clean
      .join(bmGrams.withColumn("__bm", lit(1)), Seq("gram"), "left")
      .groupBy(col(idCol))
      .agg(max(col("n_grams")).as("n_grams"),
        count(col("__bm")).cast("int").as("n_shared"))
      .withColumn("contaminated", col("n_shared") >= 1)
  }

  /** Span-level decontamination REMOVAL — [[decontaminate]] flags; this
    * REWRITES: every token covered by at least one train-doc `n`-gram
    * window that appears verbatim in the benchmark is dropped, and the
    * survivors rejoin in order (the GPT-3/FLAN-style surgical
    * alternative to discarding whole documents — at corpus scale,
    * whole-doc removal over-deletes: one leaked question in a long doc
    * costs the entire doc).
    *
    * Output: (idCol, n_tokens, n_removed, clean_text), one row per
    * train doc — clean docs pass through verbatim (n_removed = 0),
    * NULL-text docs keep a NULL clean_text.
    *
    * Scale shape: the benchmark gram set broadcasts (small by
    * contract — the [[decontaminate]] argument); the corpus pays one
    * windowed explode whose HIT subset (contamination-sized, rare by
    * definition) expands to covered positions and groups per doc; the
    * rebuild is a row-local lambda filter over the doc's own tokens
    * against its (tiny) removed-position set. No corpus window, no
    * corpus self-join; clean docs flow through a left join with a
    * NULL set.
    */
  def spanRemoval(train: DataFrame, benchmark: DataFrame,
                  textCol: String = "text", idCol: String = "doc_id",
                  n: Int = 3): DataFrame = {
    import graft.functions.TextFunctions.word_ngrams
    val bmGrams = benchmark
      .select(explode(word_ngrams(col(textCol), n)).as("gram"))
      .distinct()
    // 0-based window starts whose gram hits the benchmark, expanded to
    // the n covered token positions (distinct: overlapping hit windows
    // cover a position once)
    val hits = train
      .select(col(idCol), posexplode(word_ngrams(col(textCol), n)))
      .withColumnRenamed("col", "gram")
      .join(broadcast(bmGrams), "gram")
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
    // collect_set dedups overlapping windows' shared positions — no
    // separate distinct() shuffle ahead of the per-doc aggregate
    val removed = hits.groupBy(col(idCol))
      .agg(sort_array(collect_set(col("p"))).as("__rm"))
    train.select(col(idCol), col(textCol))
      .join(removed, Seq(idCol), "left")
      // hoisted: one split serves size() and the rebuild lambda
      .withColumn("__ws", split(col(textCol), " "))
      .select(col(idCol),
        coalesce(size(col("__ws")), lit(0)).cast("int").as("n_tokens"),
        coalesce(size(col("__rm")), lit(0)).cast("int").as("n_removed"),
        when(col(textCol).isNull, lit(null).cast("string"))
          .otherwise(concat_ws(" ", filter(col("__ws"),
            (t: Column, i: Column) => not(array_contains(
              coalesce(col("__rm"), array().cast("array<int>")), i)))))
          .as("clean_text"))
  }

  /** Embedding-space (semantic) decontamination — the third member of
    * the decon family: exact n-gram overlap and its Bloom variant
    * catch verbatim leakage, but a PARAPHRASED benchmark item shares
    * no 3-grams with its source. Here a train doc is contaminated when
    * its embedding sits within cosine `tau` of ANY benchmark
    * embedding — the semantic-similarity contamination scan (the
    * dedup_semantic argument applied to held-out data).
    *
    * Candidates are bucket-bounded (the shared sign-LSH family), so
    * recall has the same trade as every LSH op here; the verdict per
    * train doc is its best in-bucket benchmark neighbor. Emits
    * (idCol, bench_id, sim, contaminated), total over the train set —
    * docs with no in-bucket benchmark (or NULL embedding) keep a NULL
    * neighbor and contaminated = false (the d05 convention).
    *
    * Scale shape: the BENCHMARK side is small by contract (held-out
    * eval sets) — it broadcasts, bucketed once; the train corpus never
    * shuffles its embeddings: one narrow sketch projection, a
    * map-side bucket join, then a partial-aggregated max over
    * (sim, −bench_id) replaces the per-query window (no
    * corpus-sized window shuffle; ties go to the lowest bench id,
    * the usual determinism rule).
    */
  def semanticDecontaminate(train: DataFrame, benchmark: DataFrame,
                            idCol: String, embCol: String,
                            tau: Double = 0.95, dim: Int = -1): DataFrame = {
    val d = if (dim > 0) dim else SimOps.detectDim(Seq(benchmark, train), embCol)
    val b = benchmark.where(col(embCol).isNotNull)
      .select(col(idCol).as("bench_id"), col(embCol).as("b_emb"))
      .withColumn("bucket", SimOps.lshBucket(col("b_emb"), d))
    val t = train
      .select(col(idCol), col(embCol))
      .where(col(embCol).isNotNull)
      .withColumn("bucket", SimOps.lshBucket(col(embCol), d))
    val scored = t.join(broadcast(b), Seq("bucket"))
      .withColumn("sim", round(SimOps.cosine(col(embCol), col("b_emb")), 4))
    // shared best-match reduction (SimOps.bestNeighbor): highest sim,
    // ties to the lowest bench id, numeric-id check included
    val top = SimOps.bestNeighbor(scored, idCol, "bench_id")
      .select(col(idCol), col("bench_id"), col("sim"))
    train.select(col(idCol))
      .join(top, Seq(idCol), "left")
      .select(col(idCol), col("bench_id"), col("sim"),
        coalesce(col("sim") >= tau, lit(false)).as("contaminated"))
  }
}
