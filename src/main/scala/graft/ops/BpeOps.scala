package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training (SURVEY.md §2.11 —
  * the tokenizer-construction step of a training-data pipeline).
  * Classic BPE (Sennrich et al. 2016, "Neural Machine Translation of
  * Rare Words with Subword Units"): start from characters, repeatedly
  * merge the most frequent adjacent symbol pair across the corpus.
  *
  * Scale shape: the corpus collapses to its word-type vocabulary ONCE
  * (partial-aggregated (word, count) — the wordcount shuffle), and
  * every merge iteration runs over vocab-sized data: one pair-count
  * aggregate (partial+final, pairs bounded by total vocab chars) and a
  * 1-row argmax collect, exactly the trainCentroids driver-loop
  * pattern. Corpus bytes are never touched again after the vocab pass
  * — at 100 TB the per-iteration cost is proportional to |vocab|, not
  * corpus size.
  *
  * Determinism (the oracle contract): pair counts are exact integers;
  * the argmax tie-breaks lexicographically on the pair string; merge
  * application is a literal string replace with leftmost
  * non-overlapping semantics, identical in the JVM and DuckDB — so an
  * unrolled SQL replay produces byte-identical merges.
  *
  * Representation: each symbol is wrapped in  separators
  * ("low" → ␟l␟␟o␟␟w␟), so the pair (a,b) is the literal substring
  * "␟a␟␟b␟" and merging it to "␟ab␟" preserves the wrapping invariant
  * — greedy left-to-right, no regex needed. "aaa" merges (a,a) to
  * [aa, a], matching reference BPE's position walk.
  */
object BpeOps {

  private val S = "\u001f" // unit separator: never appears in tokens

  /** Train `nMerges` BPE merges over the whitespace words of `textCol`.
    * Returns one row per merge: (step, lhs, rhs, pair_count), in merge
    * order. Stops early (fewer rows) if no adjacent pair remains.
    */
  def trainMerges(df: DataFrame, nMerges: Int,
                  textCol: String = "text"): DataFrame = {
    require(nMerges > 0, s"trainMerges: nMerges=$nMerges")
    val spark = df.sparkSession
    // the ONLY corpus-sized pass: word-type vocabulary with counts,
    // each word char-wrapped into the ␟-separated representation
    var vocab = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(regexp_replace(col("word"), "(.)", s"$S$$1$S").as("rep"))
      .agg(count(lit(1)).as("wc"))
      // pin the vocab: every iteration (and the final count) re-reads
      // this, not the corpus
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      // adjacent-pair counts over vocab rows, weighted by word count;
      // overlapping adjacencies all count (the reference position walk)
      // ␟h␟␟e␟ → "h e": the native 2-gram kernel then emits the pairs
      val tokStr = trim(regexp_replace(col("rep"), S + S, " "), S)
      val pairs = vocab
        .select(col("wc"), explode(
          graft.functions.TextFunctions.word_ngrams(tokStr, 2)).as("pair"))
        .groupBy(col("pair")).agg(sum(col("wc")).as("cnt"))
      val best = pairs.orderBy(col("cnt").desc, col("pair")).limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val pair = best(0).getString(0)
        val cnt = best(0).getLong(1)
        val Array(a, b) = pair.split(" ", 2)
        merges += ((step, a, b, cnt))
        // literal replace, leftmost non-overlapping in both engines
        vocab = vocab
          .withColumn("rep",
            regexp_replace(col("rep"),
              java.util.regex.Pattern.quote(s"$S$a$S$S$b$S"),
              java.util.regex.Matcher.quoteReplacement(s"$S$a$b$S")))
          .localCheckpoint(true)
        step += 1
      }
    }
    import spark.implicits._
    merges.result().toDF("step", "lhs", "rhs", "pair_count")
  }

  /** Tokenizer APPLICATION: run a trained merge list over the corpus
    * and count the resulting tokens per doc. Pure row-local work — the
    * whole text is symbol-wrapped in one regexp (spaces stay bare, so
    * merges can never cross a word boundary) and each merge is one
    * literal replace; the projection chain is codegen'd and scales
    * linearly with corpus bytes, the shape tokenization must have at
    * 100 TB. Token count = half the separator count.
    */
  def applyMerges(df: DataFrame, merges: Seq[(String, String)],
                  textCol: String = "text",
                  idCol: String = "doc_id"): DataFrame = {
    val rep0 = regexp_replace(col(textCol), "([^ ])", s"$S$$1$S")
    val rep = merges.foldLeft(rep0) { case (c, (a, b)) =>
      regexp_replace(c,
        java.util.regex.Pattern.quote(s"$S$a$S$S$b$S"),
        java.util.regex.Matcher.quoteReplacement(s"$S$a$b$S"))
    }
    df.select(col(idCol),
      ((length(rep) - length(regexp_replace(rep, S, "")))
        .cast("long") / 2).cast("int").as("n_tokens"))
  }

  /** The unrolled DuckDB replay of `trainMerges` — one CTE stage per
    * merge, each recomputing pair counts, picking the same
    * lexicographic-tiebreak argmax, and applying the same literal
    * replace. Generated here so Spark and SQL can never drift.
    */
  def mergesOracleSql(nMerges: Int, table: String = "documents",
                      textCol: String = "text"): String = {
    val toks = (v: String) =>
      s"string_split(trim(replace($v.rep, chr(31)||chr(31), ' '), chr(31)), ' ')"
    val sb = new StringBuilder
    sb.append(s"""
      WITH v0 AS (
        SELECT regexp_replace(word, '(.)', chr(31)||'\\1'||chr(31), 'g') AS rep,
               count(*) AS wc
        FROM (SELECT unnest(string_split($textCol, ' ')) AS word FROM $table) t
        WHERE len(word) > 0 GROUP BY 1)""")
    for (i <- 1 to nMerges) {
      val p = s"(SELECT wc, unnest(list_transform(range(1, len(tk)), j -> tk[j] || ' ' || tk[j+1])) AS pair FROM (SELECT wc, ${toks(s"v${i - 1}")} AS tk FROM v${i - 1}) s)"
      sb.append(s""",
      pairs$i AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt FROM $p u GROUP BY 1),
      best$i AS (SELECT pair, cnt FROM pairs$i ORDER BY cnt DESC, pair LIMIT 1),
      v$i AS (
        SELECT replace(v${i - 1}.rep,
                 chr(31)||string_split(b.pair, ' ')[1]||chr(31)||chr(31)||string_split(b.pair, ' ')[2]||chr(31),
                 chr(31)||replace(b.pair, ' ', '')||chr(31)) AS rep, wc
        FROM v${i - 1} CROSS JOIN best$i b)""")
    }
    sb.append((1 to nMerges).map { i =>
      s"""
      SELECT $i AS step, string_split(pair, ' ')[1] AS lhs,
             string_split(pair, ' ')[2] AS rhs, cnt AS pair_count
      FROM best$i"""
    }.mkString("", " UNION ALL", "\n      ORDER BY step"))
    sb.toString
  }

  /** DuckDB replay of `trainMerges` + `applyMerges`: the trainer CTEs
    * (shared prefix with `mergesOracleSql`) feed per-doc replace
    * stages via scalar subqueries on each round's best pair; the final
    * token count is the same separator arithmetic the engine uses.
    */
  def tokenizeOracleSql(nMerges: Int, table: String = "documents",
                        textCol: String = "text",
                        idCol: String = "doc_id"): String = {
    val trainer = mergesOracleSql(nMerges, table, textCol)
    val prefix = trainer.substring(0, trainer.lastIndexOf("\n      SELECT 1 AS step"))
    val sb = new StringBuilder(prefix)
    sb.append(s""",
      docrep0 AS (
        SELECT $idCol, regexp_replace($textCol, '([^ ])',
                 chr(31)||'\\1'||chr(31), 'g') AS rep
        FROM $table)""")
    for (i <- 1 to nMerges) {
      sb.append(s""",
      docrep$i AS (
        SELECT $idCol, coalesce(replace(rep,
          (SELECT chr(31)||string_split(pair, ' ')[1]||chr(31)||chr(31)||string_split(pair, ' ')[2]||chr(31) FROM best$i),
          (SELECT chr(31)||replace(pair, ' ', '')||chr(31) FROM best$i)), rep) AS rep
        FROM docrep${i - 1})""")
      // coalesce(..., rep): if merges exhausted before round i, best_i
      // is empty, the scalar subqueries are NULL, and the un-guarded
      // replace would cascade NULL reps — the engine's applyMerges just
      // applies the (shorter) real merge list, so fall back to rep
    }
    sb.append(s"""
      SELECT $idCol,
             CAST((len(rep) - len(replace(rep, chr(31), ''))) // 2 AS INTEGER) AS n_tokens
      FROM docrep$nMerges ORDER BY $idCol""")
    sb.toString
  }
}
