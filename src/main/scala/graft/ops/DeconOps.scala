package graft.ops

import org.apache.spark.sql.DataFrame
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
}
