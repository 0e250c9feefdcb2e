package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Tables
import graft.ops._

/** Shared helpers of the per-family query registries: testdata table
  * accessors, scratch-dir plumbing, and the oracle-SQL fragments used
  * by more than one family. */
private[graft] object QHelp {


  private[graft] def li(s: SparkSession, d: String) = Tables.lineitem(s, d)

  private[graft] def ord(s: SparkSession, d: String) = Tables.orders(s, d)

  private[graft] def cust(s: SparkSession, d: String) = Tables.customer(s, d)

  private[graft] def nat(s: SparkSession, d: String) = Tables.nation(s, d)

  private[graft] def reg(s: SparkSession, d: String) = Tables.region(s, d)

  private[graft] def ev(s: SparkSession, d: String) = Tables.events(s, d)

  private[graft] def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  private[graft] def emb(s: SparkSession, d: String) = Tables.embeddings(s, d)


  /** Gaps-and-islands sessionization oracle, shared by q16 and
    * streaming_sessions_parity — ONE definition of the session
    * semantics (gap >= threshold starts a new session, half-open like
    * Spark's session_window; epoch-second floors), so the batch and
    * streaming graded paths can never drift apart.
    */
  private[graft] def sessionOracleSql(extraAggCols: String): String = s"""
      WITH x AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events),
      y AS (
        SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM x)
      SELECT user_id,
             CAST(floor(epoch(min(ts))) AS BIGINT) AS session_start,
             count(*) AS n_events$extraAggCols
      FROM y GROUP BY user_id, sid
      ORDER BY user_id, session_start, n_events"""


  /** dedup_clusters — transitive closure over near-dup pairs (the step
    * after pair generation in production dedup): min-label propagation
    * to connected components; cluster id = component minimum, so
    * keeping `doc_id == cluster_id` dedups the corpus. Oracled with a
    * DuckDB recursive CTE over the same exact-Jaccard edges.
    */
  /** Shared cluster CTE chain (d06 + dedup_keep_best): exact-Jaccard
    * near-dup edges and their transitive closure; defined once so the
    * two graded paths cannot drift. Ends with the `reach` relation —
    * append `cl AS (SELECT a AS doc_id, min(b) AS cluster_id FROM
    * reach GROUP BY a)`-style selections.
    */
  /** The dup-edge chain alone (shingles → pruned postings → Jaccard
    * pairs → symmetric `edges`), shared by the recursive-closure
    * oracles below AND the bounded-round graph_components replay — one
    * definition of the near-dup edge semantics.
    */
  private[graft] def clusterEdgeCtes: String = """
      WITH RECURSIVE sets AS (
        SELECT doc_id,
               CASE WHEN len(w) >= 3
                    THEN list_distinct(list_transform(range(1, len(w) - 1),
                           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                    ELSE [text] END AS sh
        FROM (SELECT doc_id, text, string_split(text, ' ') AS w FROM documents) b),
      posts AS (
        SELECT doc_id, CAST(len(sh) AS BIGINT) AS sz, unnest(sh) AS s FROM sets),
      keep AS (
        SELECT s FROM posts GROUP BY s HAVING count(*) <= 100),
      pr AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.sz AS sz_a, b.sz AS sz_b,
               count(*) AS n_inter
        FROM posts a JOIN keep USING (s) JOIN posts b USING (s)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2, 3, 4),
      dup AS (
        SELECT id_a, id_b FROM pr
        WHERE n_inter::DOUBLE / (sz_a + sz_b - n_inter) >= 0.8),
      edges AS (
        SELECT id_a AS a, id_b AS b FROM dup
        UNION ALL SELECT id_b, id_a FROM dup)"""


  private[graft] def clusterCtesSql: String = s"""$clusterEdgeCtes,
      reach(a, b) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)"""


  /** text_quality_model — linear quality classifier inference
    * (TextOps.qualityModel): fixed-point micro-ratio features, integer
    * weighted sum, margin decision. Bit-exact in any engine (pure
    * BIGINT arithmetic, floor division, no sigmoid), so score AND
    * decision are hash-graded. Weights: bias calibrated so the corpus
    * splits near 50/50 and the decision column carries information.
    */
  /** Shared quality-model SQL fragments (text_quality_model +
    * streaming_quality_parity — the clusterCtesSql idiom): feature
    * CTEs and the integer score expression defined once so the batch
    * and streaming oracles cannot drift.
    */
  private[graft] def qualityModelCtes: String = """
      WITH f AS (
        SELECT doc_id,
               len(string_split(lower(text), ' ')) AS n_tok,
               length(text) AS n_char,
               len(list_filter(string_split(lower(text), ' '),
                 w -> w IN ('the','a','of','and','to','in','is','it'))) AS n_stop,
               len(list_distinct(string_split(lower(text), ' '))) AS n_dist,
               length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
               length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digit
        FROM documents),
      m AS (
        SELECT doc_id,
               (1000000 * n_stop) // greatest(n_tok, 1) AS stop_m,
               (1000000 * (n_tok - n_dist)) // greatest(n_tok, 1) AS dup_m,
               (1000000 * n_punct) // greatest(n_char, 1) AS punct_m,
               (1000000 * n_digit) // greatest(n_char, 1) AS digit_m,
               least(n_tok, 64) AS len_c
        FROM f)"""


  private[graft] def qualityScoreSql: String =
    "540000 + 4*stop_m - 3*dup_m - 2*punct_m - 3*digit_m + 15625*len_c"


  // ---------------------------------------------------------- similarity

  /** DuckDB mirror of SimOps' sign-LSH bucket: the SAME seeded plane
    * matrix inlined as literals (Double.toString round-trips exactly),
    * bit p set when dot(emb, plane_p) >= 0.
    *
    * Precision contract: DuckDB's `list_dot_product` is NOT the same
    * fold as the engine's sequential loop (measured: ~half of all
    * plane dots differ at 1 ulp on sf0.1), so engine≡oracle holds
    * because the DATA carries margin, not bit-for-bit arithmetic. A
    * sign flip needs a dot within ~1 ulp of 0 and a rank flip needs
    * two in-bucket cosines within ~1 ulp; measured sf0.1 minima are
    * |dot| ≥ 3.6e-5 and nonzero sim gap ≥ 1.1e-6 — ten orders of
    * magnitude of headroom. Regenerated testdata should re-check those
    * margins before trusting a hash mismatch here.
    */
  private[graft] def lshBucketSql(embExpr: String, dim: Int): String =
    SimOps.planesFor(dim).zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product($embExpr, [${p.mkString(", ")}]::DOUBLE[]) >= 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("\n          + ")


  /** ann_ivf_trained_topk — the IVF probe path under a TRAINED codebook:
    * SimOps.trainCentroids (2 unrolled Lloyd's iterations, centroid
    * components rounded to 1e-6 precisely so cross-engine float-merge
    * order cannot leak into the result) then the same probe/re-rank as
    * ann_ivf_topk. The oracle replays the whole trainer in SQL —
    * codebook init, two assign/recompute rounds (empty cells keep their
    * previous centroid, ties to the higher cell), probe, exact re-rank —
    * so the distributed k-means itself is hash-graded, not just
    * recall-tested.
    */
  // a04 oracle generators (the lshBucketSql idiom): the trained-IVF
  // oracle replays SimOps.trainCentroids in SQL, which needs the same
  // score / argmax-assign / recompute blocks five times — emitted from
  // one definition each so a semantics fix cannot miss a copy.
  private[graft] def a04Score(out: String, cb: String, src: String = "e"): String =
    s"""$out AS (
      |        SELECT $src.vec_id, $src.emb, cb.cell,
      |               list_dot_product($src.emb, cb.cvec) * (1.0 / sqrt(list_dot_product(cb.cvec, cb.cvec))) AS score
      |        FROM $src CROSS JOIN $cb cb)""".stripMargin


  private[graft] def a04Argmax(out: String, cols: String, src: String,
                        where: String, keep: String): String =
    s"""$out AS (
      |        SELECT $cols FROM (
      |          SELECT vec_id, emb, cell, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cell DESC) r
      |          FROM $src$where) t WHERE $keep)""".stripMargin


  /** One unrolled Lloyd's round: score vs cb`i`, assign argmax cell
    * (ties to the higher cell, like CellArgmax), per-dimension mean
    * rounded to 1e-6 (half-away, same as trainCentroids.round6), empty
    * cells keep their previous centroid.
    */
  private[graft] def a04Round(i: Int): String =
    s"""${a04Score(s"s$i", s"cb$i")},
      |      ${a04Argmax(s"a$i", "vec_id, emb, cell", s"s$i", "", "r = 1")},
      |      m$i AS (
      |        SELECT cell, p.p AS pos, round(avg(emb[p.p]), 6) AS m
      |        FROM a$i CROSS JOIN pos p GROUP BY cell, p.p),
      |      cb${i + 1} AS (
      |        SELECT g.cell, list(coalesce(m$i.m, g.prev) ORDER BY g.pos) AS cvec
      |        FROM (SELECT c.cell, p.p AS pos, c.cvec[p.p] AS prev FROM cb$i c CROSS JOIN pos p) g
      |        LEFT JOIN m$i ON m$i.cell = g.cell AND m$i.pos = g.pos
      |        GROUP BY g.cell)""".stripMargin


  /** Cluster-valid scratch dir: rooted at the session's warehouse dir
    * (a shared filesystem on a real cluster — a relative local path
    * would resolve per-node and break any read-back), keyed by PID so
    * concurrent processes don't race (overwrite-while-read), while
    * staying self-overwriting within one process so bench loops don't
    * accumulate dirs without bound.
    */
  private[graft] def tmpDir(s: SparkSession, name: String): String = {
    val wh = s.conf.get("spark.sql.warehouse.dir").stripSuffix("/")
    s"$wh/graft_tmp/${name}_${ProcessHandle.current().pid()}"
  }


  /** Injective SQL-identifier-safe tag for a dataset path (hex of its
    * UTF-8 bytes — lossy sanitization could alias two paths): q57b
    * keys its per-JVM catalog tables and scratch dirs by it. Hex
    * doubles the length, so paths past 32 chars fall back to the md5
    * hex of the path (32 chars, bounded for any input — collision odds
    * 2^-64-class, documented rather than structural; the repo's own
    * dataset paths stay on the injective branch).
    */
  private[graft] def pathTag(d: String): String = {
    val hex = d.getBytes("UTF-8").map(b => f"$b%02x").mkString
    if (hex.length <= 64) hex
    else java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  }
}
