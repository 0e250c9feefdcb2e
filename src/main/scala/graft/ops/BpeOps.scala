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
    *
    * Two execution paths with identical semantics (OpsSpec pins the
    * equivalence): after the corpus collapses to its word-type
    * vocabulary — the standard trick: word types ≪ corpus — a vocab of
    * at most `maxInMemoryVocab` types is collected and the merge loop
    * runs in memory (a real tokenizer's 32k merges would otherwise be
    * 32k driver-round-trip jobs); an oversized vocab falls back to the
    * distributed per-merge aggregate. Both tie-break the argmax on the
    * UTF-8 byte order of the "lhs rhs" pair string — what Spark's and
    * DuckDB's ORDER BY compare.
    */
  def trainMerges(df: DataFrame, nMerges: Int,
                  textCol: String = "text",
                  maxInMemoryVocab: Int = 4 * 1000 * 1000): DataFrame = {
    require(nMerges > 0, s"trainMerges: nMerges=$nMerges")
    val spark = df.sparkSession
    // the ONLY corpus-sized pass: word-type vocabulary with counts,
    // each word char-wrapped into the ␟-separated representation.
    // ([^ ]) not (.): after the space split they match the same chars,
    // but '.' excludes \r/ /… in Java while RE2-family engines
    // exclude only \n — [^ ] wraps the identical set everywhere (and
    // matches applyMerges' wrap)
    var vocab = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .where(length(col("word")) > 0)
      .groupBy(regexp_replace(col("word"), "([^ ])", s"$S$$1$S").as("rep"))
      .agg(count(lit(1)).as("wc"))
      // pin the vocab: every iteration (and the final count) re-reads
      // this, not the corpus
      .localCheckpoint(true)
    // gate on BYTES as well as rows: 4M word types is fine, but only
    // if the reps fit the driver — a row-count-only gate would collect
    // multi-GB vocabularies (long words × 3x separator wrapping) and
    // OOM instead of falling back to the distributed loop. octet_length
    // (UTF-8 bytes), not length (chars): a CJK vocab is ~3 bytes/char.
    // The 128 MB cap budgets the collect-side expansion (per-symbol
    // String objects in trainInMemory cost ~10x the raw bytes).
    val gate = vocab.agg(count(lit(1)), sum(octet_length(col("rep")))).head()
    val (vocabRows, vocabBytes) =
      (gate.getLong(0), if (gate.isNullAt(1)) 0L else gate.getLong(1))
    if (vocabRows <= maxInMemoryVocab && vocabBytes <= 128L * 1024 * 1024) {
      import spark.implicits._
      val collected = vocab.collect().map { r =>
        val rep = r.getString(0)
        // ␟c␟␟h␟… → [c, h, …]: strip the outer separators, split on
        // the inter-symbol ␟␟ boundary
        (rep.stripPrefix(S).stripSuffix(S).split(S + S), r.getLong(1))
      }
      return trainInMemory(collected, nMerges).toDF("step", "lhs", "rhs", "pair_count")
    }
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

  /** UTF-8 unsigned-byte order of the "lhs rhs" pair string — the
    * exact collation Spark's UTF8String and DuckDB's default ORDER BY
    * use. JVM String.compareTo (UTF-16 code units) differs above the
    * BMP, so the fast path must not use it.
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** The driver-side merge loop over a collected word-type vocabulary
    * — semantics identical to the distributed loop: overlapping
    * adjacencies all count, argmax tie-breaks on the UTF-8 order of
    * "lhs rhs", merge application is the greedy leftmost
    * non-overlapping walk (what the literal ␟a␟␟b␟ replace does on the
    * wrapped representation). O(vocab symbols) per merge.
    */
  private def trainInMemory(vocab0: Array[(Array[String], Long)],
                            nMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab = vocab0
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      vocab.foreach { case (syms, wc) =>
        var i = 0
        while (i < syms.length - 1) {
          val key = syms(i) + " " + syms(i + 1)
          counts.update(key, counts.getOrElse(key, 0L) + wc)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var bestPair: String = null
        var bestCnt = Long.MinValue
        counts.foreach { case (p, c) =>
          if (c > bestCnt || (c == bestCnt && utf8Less(p, bestPair)))
            { bestPair = p; bestCnt = c }
        }
        val Array(a, b) = bestPair.split(" ", 2)
        val ab = a + b
        merges += ((step, a, b, bestCnt))
        vocab = vocab.map { case (syms, wc) =>
          var hit = false
          var i = 0
          while (!hit && i < syms.length - 1) {
            hit = syms(i) == a && syms(i + 1) == b
            i += 1
          }
          if (!hit) (syms, wc)
          else {
            val out = Array.newBuilder[String]
            var j = 0
            while (j < syms.length) {
              if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                out += ab
                j += 2
              } else {
                out += syms(j)
                j += 1
              }
            }
            (out.result(), wc)
          }
        }
        step += 1
      }
    }
    merges.result()
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
                  idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), tokenCountExpr(merges, textCol).as("n_tokens"))

  /** The row-local post-merge token count as a Column — shared by
    * [[applyMerges]] (per-doc grading) and [[fertility]] (per-group
    * rollup): symbol-wrap, literal-replace chain, separator count / 2.
    */
  private def tokenCountExpr(merges: Seq[(String, String)],
                             textCol: String): org.apache.spark.sql.Column = {
    val rep0 = regexp_replace(col(textCol), "([^ ])", s"$S$$1$S")
    val rep = merges.foldLeft(rep0) { case (c, (a, b)) =>
      regexp_replace(c,
        java.util.regex.Pattern.quote(s"$S$a$S$S$b$S"),
        java.util.regex.Matcher.quoteReplacement(s"$S$a$b$S"))
    }
    ((length(rep) - length(regexp_replace(rep, S, "")))
      .cast("long") / 2).cast("int")
  }

  /** Tokenizer fertility report — the vocab-quality diagnostic every
    * multilingual tokenizer ships with: per `groupCol` (language,
    * source), tokens-per-word (fertility — how many BPE tokens an
    * average whitespace word fragments into; high fertility = the
    * vocab under-serves that language) and chars-per-token
    * (compression). One row-local projection (the merge chain, a
    * split size, a length) feeding one partial-aggregated rollup —
    * no joins, no windows; at 100 TB this is a single corpus pass.
    * The ratios divide exact integer sums in double (IEEE-correctly
    * rounded in any engine), so the report grades bit-for-bit.
    */
  def fertility(df: DataFrame, merges: Seq[(String, String)],
                groupCol: String = "lang",
                textCol: String = "text"): DataFrame =
    // the merge-chain regexps are CPU-heavy map work: fan a
    // too-few-splits input out first (Par.fanOut no-ops at real split
    // counts; measured ×10 warm 5.4 s → 3.5 s)
    graft.ops.Par.fanOut(df.select(col(groupCol), col(textCol)))
      .select(col(groupCol),
        tokenCountExpr(merges, textCol).as("__t"),
        size(split(col(textCol), " ")).as("__w"),
        length(col(textCol)).as("__c"))
      .groupBy(col(groupCol))
      .agg(
        sum(col("__t")).cast("long").as("tokens"),
        sum(col("__w")).cast("long").as("words"),
        sum(col("__c")).cast("long").as("chars"),
        round(sum(col("__t")).cast("double") / sum(col("__w")), 4)
          .as("fertility"),
        round(sum(col("__c")).cast("double") / sum(col("__t")), 4)
          .as("chars_per_token"))

  /** The unrolled DuckDB replay of `trainMerges` — one CTE stage per
    * merge, each recomputing pair counts, picking the same
    * lexicographic-tiebreak argmax, and applying the same literal
    * replace. Generated here so Spark and SQL can never drift.
    *
    * Every stage CTE is `AS MATERIALIZED`: each v_i is referenced
    * twice (by pairs_{i+1} and v_{i+1}), and DuckDB's default inlining
    * re-expands the whole chain per reference — exponential work and
    * one parquet open per inlined v0 ("Too many open files" at 256
    * stages). Materialization makes the replay linear in nMerges.
    */
  def mergesOracleSql(nMerges: Int, table: String = "documents",
                      textCol: String = "text"): String = {
    val toks = (v: String) =>
      s"string_split(trim(replace($v.rep, chr(31)||chr(31), ' '), chr(31)), ' ')"
    val sb = new StringBuilder
    sb.append(s"""
      WITH v0 AS MATERIALIZED (
        SELECT regexp_replace(word, '([^ ])', chr(31)||'\\1'||chr(31), 'g') AS rep,
               count(*) AS wc
        FROM (SELECT unnest(string_split($textCol, ' ')) AS word FROM $table) t
        WHERE len(word) > 0 GROUP BY 1)""")
    for (i <- 1 to nMerges) {
      val p = s"(SELECT wc, unnest(list_transform(range(1, len(tk)), j -> tk[j] || ' ' || tk[j+1])) AS pair FROM (SELECT wc, ${toks(s"v${i - 1}")} AS tk FROM v${i - 1}) s)"
      sb.append(s""",
      pairs$i AS (SELECT pair, CAST(sum(wc) AS BIGINT) AS cnt FROM $p u GROUP BY 1),
      best$i AS MATERIALIZED (SELECT pair, cnt FROM pairs$i ORDER BY cnt DESC, pair LIMIT 1),
      v$i AS MATERIALIZED (
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
                        idCol: String = "doc_id"): String =
    docrepOracleCtes(nMerges, table, textCol, idCol) + s"""
      SELECT $idCol,
             CAST((len(rep) - len(replace(rep, chr(31), ''))) // 2 AS INTEGER) AS n_tokens
      FROM docrep$nMerges ORDER BY $idCol"""

  /** Trainer replay + per-doc replace stages through `docrep$nMerges`
    * — the shared prefix of [[tokenizeOracleSql]] and
    * [[fertilityOracleSql]].
    */
  private def docrepOracleCtes(nMerges: Int, table: String,
                               textCol: String, idCol: String): String = {
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
    sb.toString
  }

  /** DuckDB replay of `trainMerges` + [[fertility]]: the docrep chain
    * feeds a per-`groupCol` rollup of token/word/char sums and the two
    * exact-integer-division ratios.
    */
  def fertilityOracleSql(nMerges: Int, table: String = "documents",
                         textCol: String = "text",
                         idCol: String = "doc_id",
                         groupCol: String = "lang"): String =
    docrepOracleCtes(nMerges, table, textCol, idCol) + s""",
      f AS (
        SELECT d.$groupCol,
               (len(r.rep) - len(replace(r.rep, chr(31), ''))) // 2 AS t,
               len(string_split(d.$textCol, ' ')) AS w,
               len(d.$textCol) AS c
        FROM docrep$nMerges r JOIN $table d USING ($idCol))
      SELECT $groupCol,
             CAST(sum(t) AS BIGINT) AS tokens,
             CAST(sum(w) AS BIGINT) AS words,
             CAST(sum(c) AS BIGINT) AS chars,
             round(CAST(sum(t) AS DOUBLE) / sum(w), 4) AS fertility,
             round(CAST(sum(c) AS DOUBLE) / sum(t), 4) AS chars_per_token
      FROM f GROUP BY $groupCol ORDER BY $groupCol"""
}
