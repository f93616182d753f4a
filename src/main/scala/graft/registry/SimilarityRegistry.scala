package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis
import graft.operators.{BloomPrune, Corpus, Dedup, Reco, Relational, Similarity, Sketches, Skew, TimeWindows, TrainingMix}
import graft.plans.LabelPropagation
import graft.sources.{Bucketing, Multimodal}
import graft.streaming.RealTime

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is a named entry in
  * [[queries]]; every SQL-expressible one has matching ANSI SQL in
  * [[oracleSql]] (run by the driver in DuckDB over the same parquet tables).
  * Column names and types are kept identical on both sides — the driver
  * hash-compares values after sorting columns by name.
  */

import graft.EntryHelpers._

/** Registry: embedding similarity-search queries — one `queries` entry and one DuckDB
  * `oracles` twin per graded query. Composed into SparkEntry (driver
  * contract); keys must stay globally unique across registries
  * (spec-asserted in EntrySpec).
  */
private[graft] object SimilarityRegistry {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // k-means E-step over the full corpus: broadcast centroids, map-side
    // argmax, integer output
    "q71_kmeans_assign" -> ((s, dir) =>
      Similarity.ivfAssign(Tables.embeddings(s, dir)).select("vec_id", "cell")),
    // k-means M-step (one Lloyd iteration with q71): per-cell count +
    // mean vector on the micro-unit integer grid — order-invariant, so
    // the float mean becomes gradeable
    "q127_kmeans_update" -> ((s, dir) =>
      Similarity.kmeansUpdateExact(Tables.embeddings(s, dir))),
    // int8 scalar quantization: per-vector range + exact code checksum
    "q81_quantize" -> ((s, dir) =>
      Similarity.quantizeEmbeddings(Tables.embeddings(s, dir))),
    // per-label farthest-from-centroid vectors: exact decimal distance
    // numerators over micro-quantized coordinates, per-label ranking
    "q170_embedding_outliers" -> ((s, dir) =>
      Similarity.embeddingOutliers(Tables.embeddings(s, dir))),
    // MMR diverse retrieval: one distributed relevance pass into a
    // 64-candidate pool, then 5 greedy diversity rounds over it
    "q188_mmr_select" -> ((s, dir) =>
      Similarity.mmrSelect(Tables.embeddings(s, dir))),
    // kNN label-consistency audit: IVF cell self-join, ExactTopK
    // neighbors, broadcast label lookups — the label-noise detector
    "q200_knn_label_consistency" -> ((s, dir) =>
      Similarity.knnLabelConsistency(Tables.embeddings(s, dir))),
    // inter-label centroid gap matrix on the micro grid — exact decimal
    // numerators, label-pair join over the metadata-sized centroid table
    "q235_centroid_gaps" -> ((s, dir) =>
      Similarity.centroidGaps(Tables.embeddings(s, dir))),
    // IVF-cell label purity: unsupervised cells vs the label column in
    // exact ppm — the external clustering index on the q71 assignment
    "q243_cell_purity" -> ((s, dir) =>
      Similarity.cellPurity(Tables.embeddings(s, dir))),
    // top principal direction by 3-round integer power iteration over
    // the milli-grid second-moment matrix, with the Rayleigh quotient
    "q220_pca_power" -> ((s, dir) =>
      Similarity.pcaPower(Tables.embeddings(s, dir))),
    "q37_sim_topk_brute" -> ((s, dir) =>
      Similarity.bruteForceTopK(simQueries(s, dir), Tables.embeddings(s, dir))),
    // Registered form is the IVF-cell-bucketed near-dup (equi-join on cell,
    // scale-safe); the all-pairs quadratic form stays as spec ground truth.
    "q38_embedding_neardup" -> ((s, dir) =>
      Similarity.embeddingNearDupPairsIVF(Tables.embeddings(s, dir), threshold = 0.4)),
    "q41_sim_topk_ivf" -> ((s, dir) =>
      Similarity.ivfTopK(simQueries(s, dir), Tables.embeddings(s, dir))),
    // semantic train/test contamination: held-out (odd) vectors with a
    // training (even) vector inside cosine 0.4 in a shared IVF cell
    "q98_semantic_contamination" -> ((s, dir) =>
      Similarity.semanticContamination(Tables.embeddings(s, dir))),
    // ANN tuning curve: recall@5 at nprobe 1/2/4 against one barriered
    // brute truth — the latency/recall trade-off sweep beside q83
    "q225_ann_tuning" -> ((s, dir) =>
      Similarity.annTuning(simQueries(s, dir), Tables.embeddings(s, dir))),
    // SLICE twin for the sf10 oracle gate: the identical tuning sweep with
    // the CORPUS reduced to vec_id % 4 == 0 (queries stay the full q37
    // panel) — q225's DuckDB twin re-derives the hierarchical assignment
    // 3x and exceeded the oracle's disk at sf10
    "q285_ann_tuning_slice" -> ((s, dir) =>
      Similarity.annTuning(simQueries(s, dir),
        Tables.embeddings(s, dir).where(col("vec_id") % 4 === 0))),
    // sign-random-projection signatures: cosine-LSH bits over the micro
    // grid with one-JVM ±1 plane literals; bucket sizes = near-dup sets
    "q227_srp_signatures" -> ((s, dir) =>
      Similarity.srpSignatures(Tables.embeddings(s, dir))),
    // ANN quality report card: recall@k (and rank drift) of the q41 IVF
    // result against the q37 brute-force ground truth
    "q83_ann_recall" -> ((s, dir) =>
      Similarity.annRecall(s,
        Similarity.ivfTopK(simQueries(s, dir), Tables.embeddings(s, dir)),
        Similarity.bruteForceTopK(simQueries(s, dir), Tables.embeddings(s, dir)))),
  )

  def oracles: Map[String, String] = Map(
    // float→double widening, one division, floor — all bit-deterministic
    "q81_quantize" ->
      """WITH r AS (
        |  SELECT vec_id, embedding,
        |    CAST(list_min(embedding) AS DOUBLE) AS q_min,
        |    CAST(list_max(embedding) AS DOUBLE) AS q_max
        |  FROM embeddings),
        |s AS (
        |  SELECT vec_id, embedding, q_min, q_max,
        |    CASE WHEN q_max > q_min THEN q_max - q_min ELSE CAST(1 AS DOUBLE) END AS scale
        |  FROM r)
        |SELECT vec_id, q_min, q_max,
        |  CAST(list_sum(list_transform(embedding, x ->
        |    least(255, CAST(floor((CAST(x AS DOUBLE) - q_min) / scale * 256.0) AS BIGINT))))
        |    AS BIGINT) AS code_sum
        |FROM s""".stripMargin,
    // q71's two-level assignment + aligned-unnest explode onto the
    // micro-unit grid; integer (cell, dim) sums, one final division
    "q127_kmeans_update" ->
      s"""WITH ${hierAssignSql(1)},
         |x AS (
         |  SELECT cell,
         |    unnest(range(0, len(embedding))) AS dim,
         |    unnest(list_transform(embedding,
         |      v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))) AS micro
         |  FROM assign),
         |g AS (
         |  SELECT cell, dim, CAST(sum(micro) AS BIGINT) AS s, count(*) AS n
         |  FROM x GROUP BY 1, 2)
         |SELECT cell, CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n_members,
         |  CAST(s AS DOUBLE) / n AS centroid_micro
         |FROM g""".stripMargin,
    // same bit-identical cosine + (DESC sim, ASC id) argmax contract as q41
    "q71_kmeans_assign" ->
      s"""WITH ${hierAssignSql(1)}
         |SELECT vec_id, cell FROM assign""".stripMargin,
    "q37_sim_topk_brute" -> bruteTopkOracle,
    "q38_embedding_neardup" ->
      s"""WITH ${hierAssignSql(4)}
         |SELECT DISTINCT a_id, b_id, sim FROM (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |         ${cosineSql("a.embedding", "b.embedding")} AS sim
         |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id < b.vec_id)
         |WHERE sim >= 0.4""".stripMargin,
    "q41_sim_topk_ivf" -> ivfTopkOracle,
    // same cell-join candidates as q38, split odd (test) vs even (train);
    // argmax = row_number over (sim DESC, train_id ASC), the ExactTopK
    // tie-break contract
    "q98_semantic_contamination" ->
      s"""WITH ${hierAssignSql(4)},
         |pairs AS (
         |  SELECT DISTINCT test_id, train_id, sim FROM (
         |    SELECT t.vec_id AS test_id, r.vec_id AS train_id,
         |           ${cosineSql("t.embedding", "r.embedding")} AS sim
         |    FROM assign t JOIN assign r ON t.cell = r.cell
         |    WHERE t.vec_id % 2 = 1 AND r.vec_id % 2 = 0)
         |  WHERE sim >= 0.4),
         |ranked AS (
         |  SELECT test_id, train_id, sim,
         |    row_number() OVER (PARTITION BY test_id ORDER BY sim DESC, train_id) AS rn,
         |    count(*) OVER (PARTITION BY test_id) AS n_hits
         |  FROM pairs)
         |SELECT test_id, CAST(n_hits AS BIGINT) AS n_hits,
         |  train_id AS best_train_id, sim AS best_sim
         |FROM ranked WHERE rn = 1""".stripMargin,
    // recall@k of the IVF result vs the brute-force ground truth: both
    // sides are the (deterministic, independently oracled) q37/q41 result
    // sets, so the recall computation itself oracles as a join + counts
    "q83_ann_recall" ->
      s"""WITH ivf AS ($ivfTopkOracle),
         |brute AS ($bruteTopkOracle),
         |m AS (
         |  SELECT i.q_id, i.vec_id, i.rank AS ivf_rank, b.rank AS true_rank
         |  FROM ivf i JOIN brute b ON i.q_id = b.q_id AND i.vec_id = b.vec_id),
         |ks AS (SELECT unnest(range(1, 6)) AS k),
         |nq AS (SELECT count(DISTINCT q_id) AS n_queries FROM brute),
         |h AS (
         |  SELECT k, count(*) AS n_hits,
         |         avg(CAST(abs(ivf_rank - true_rank) AS DOUBLE)) AS mre
         |  FROM ks JOIN m ON m.ivf_rank <= ks.k AND m.true_rank <= ks.k
         |  GROUP BY k)
         |SELECT ks.k AS k, nq.n_queries AS n_queries,
         |  COALESCE(h.n_hits, 0) AS n_hits,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / (nq.n_queries * ks.k) AS recall,
         |  COALESCE(h.mre, CAST(0 AS DOUBLE)) AS mean_rank_err
         |FROM ks LEFT JOIN h ON ks.k = h.k CROSS JOIN nq""".stripMargin,
    // same micro grid, same HUGEINT cross-centroid numerators, same
    // nano floor
    "q235_centroid_gaps" ->
      """WITH ex AS (
        |  SELECT label, unnest(range(0, len(embedding))) AS dim,
        |    unnest(list_transform(embedding,
        |      v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))) AS m
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, dim, CAST(sum(m) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM ex GROUP BY 1, 2),
        |g AS (
        |  SELECT a.label AS label_a, b.label AS label_b, a.n AS na, b.n AS nb,
        |    sum((CAST(a.s AS HUGEINT) * b.n - CAST(b.s AS HUGEINT) * a.n)
        |      * (CAST(a.s AS HUGEINT) * b.n - CAST(b.s AS HUGEINT) * a.n)) AS num
        |  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
        |  GROUP BY 1, 2, 3, 4)
        |SELECT label_a, label_b, na AS n_a, nb AS n_b,
        |  CAST(num // (CAST(na AS HUGEINT) * na * nb * nb * 1000) AS BIGINT)
        |    AS gap_nano
        |FROM g""".stripMargin,
    // q71's stride-seeded assignment, label lookup, per-cell plurality
    // with (cnt DESC, label) ties, exact ppm purity
    "q243_cell_purity" ->
      s"""WITH ${hierAssignSql(1)},
        |asn AS (
        |  SELECT a.vec_id, e.label, a.cell
        |  FROM assign a JOIN embeddings e ON e.vec_id = a.vec_id),
        |cl AS (
        |  SELECT cell, label, CAST(count(*) AS BIGINT) AS cnt
        |  FROM asn GROUP BY 1, 2),
        |top AS (
        |  SELECT cell, label, cnt,
        |    CAST(sum(cnt) OVER (PARTITION BY cell) AS BIGINT) AS n_members,
        |    row_number() OVER (PARTITION BY cell
        |      ORDER BY cnt DESC, label) AS rn
        |  FROM cl)
        |SELECT cell, n_members, label AS top_label, cnt AS top_count,
        |  cnt * 1000000 // n_members AS purity_ppm
        |FROM top WHERE rn = 1""".stripMargin,
    // same one-JVM plane literals, same micro-grid integer dots, same
    // window bucket sizes
    "q227_srp_signatures" -> {
      val bitExprs = graft.operators.SrpPlanes.signs(64).zipWithIndex
        .map { case (signs, p) =>
          val lst = signs.mkString("[", ", ", "]")
          s"CASE WHEN list_sum(list_transform(range(0, 64), d -> " +
            s"CAST(floor(CAST(embedding[d+1] AS DOUBLE) * 1000000) AS BIGINT)" +
            s" * ($lst)[d+1])) >= 0 THEN ${1L << p} ELSE 0 END"
        }.mkString("\n        + ")
      s"""WITH s AS (
         |  SELECT vec_id, CAST($bitExprs AS BIGINT) AS sig FROM embeddings)
         |SELECT vec_id, sig,
         |  CAST(count(*) OVER (PARTITION BY sig) AS BIGINT) AS n_same_sig
         |FROM s""".stripMargin
    },
    // same brute truth, same q41 cell join per probe width, same ppm floor
    "q225_ann_tuning" ->
      s"""WITH brute AS ($bruteTopkOracle),
         |nq AS (SELECT CAST(count(DISTINCT q_id) AS BIGINT) AS n_queries FROM brute),
         |i1 AS (${ivfTopkOracleN(1)}),
         |i2 AS (${ivfTopkOracleN(2)}),
         |i4 AS (${ivfTopkOracleN(4)}),
         |h AS (
         |  SELECT CAST(1 AS BIGINT) AS nprobe, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM i1 WHERE EXISTS (SELECT 1 FROM brute b
         |    WHERE b.q_id = i1.q_id AND b.vec_id = i1.vec_id)
         |  UNION ALL
         |  SELECT 2, CAST(count(*) AS BIGINT) FROM i2
         |  WHERE EXISTS (SELECT 1 FROM brute b
         |    WHERE b.q_id = i2.q_id AND b.vec_id = i2.vec_id)
         |  UNION ALL
         |  SELECT 4, CAST(count(*) AS BIGINT) FROM i4
         |  WHERE EXISTS (SELECT 1 FROM brute b
         |    WHERE b.q_id = i4.q_id AND b.vec_id = i4.vec_id))
         |SELECT nprobe, n_queries, n_hits,
         |  n_hits * 1000000 // (n_queries * 5) AS recall_ppm
         |FROM h CROSS JOIN nq""".stripMargin,
    // q225's oracle with every CORPUS reference routed through the es
    // slice CTE (queries stay the full panel; inner WITHs see outer es)
    "q285_ann_tuning_slice" ->
      s"""WITH es AS MATERIALIZED (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id % 4 = 0),
         |brute AS (${bruteTopkOracleFrom("es")}),
         |nq AS (SELECT CAST(count(DISTINCT q_id) AS BIGINT) AS n_queries FROM brute),
         |i1 AS (${ivfTopkOracleN(1, "es")}),
         |i2 AS (${ivfTopkOracleN(2, "es")}),
         |i4 AS (${ivfTopkOracleN(4, "es")}),
         |h AS (
         |  SELECT CAST(1 AS BIGINT) AS nprobe, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM i1 WHERE EXISTS (SELECT 1 FROM brute b
         |    WHERE b.q_id = i1.q_id AND b.vec_id = i1.vec_id)
         |  UNION ALL
         |  SELECT 2, CAST(count(*) AS BIGINT) FROM i2
         |  WHERE EXISTS (SELECT 1 FROM brute b
         |    WHERE b.q_id = i2.q_id AND b.vec_id = i2.vec_id)
         |  UNION ALL
         |  SELECT 4, CAST(count(*) AS BIGINT) FROM i4
         |  WHERE EXISTS (SELECT 1 FROM brute b
         |    WHERE b.q_id = i4.q_id AND b.vec_id = i4.vec_id))
         |SELECT nprobe, n_queries, n_hits,
         |  n_hits * 1000000 // (n_queries * 5) AS recall_ppm
         |FROM h CROSS JOIN nq""".stripMargin,
    // same micro quantization, same HUGEINT (m*n - s)^2 numerators, the
    // same per-label (num DESC, vec_id) ranking and final division
    "q170_embedding_outliers" ->
      """WITH ex AS (
        |  SELECT label, vec_id,
        |    unnest(range(0, len(embedding))) AS dim,
        |    unnest(list_transform(embedding,
        |      v -> CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT))) AS m
        |  FROM embeddings),
        |cent AS (
        |  SELECT label, dim, CAST(sum(m) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM ex GROUP BY 1, 2),
        |dist AS (
        |  SELECT ex.label, ex.vec_id, cent.n,
        |    sum((CAST(ex.m AS HUGEINT) * cent.n - cent.s)
        |      * (CAST(ex.m AS HUGEINT) * cent.n - cent.s)) AS dist_num
        |  FROM ex JOIN cent ON cent.label = ex.label AND cent.dim = ex.dim
        |  GROUP BY 1, 2, 3)
        |SELECT label, vec_id, n AS n_members,
        |  CAST(dist_num // (CAST(n AS HUGEINT) * n * 1000) AS BIGINT) AS dist_nano
        |FROM (SELECT *, row_number() OVER (PARTITION BY label
        |    ORDER BY dist_num DESC, vec_id) AS rn FROM dist)
        |WHERE rn <= 5""".stripMargin,
    // same pool, same unrolled greedy, same 0.5-weighted score and
    // (score DESC, vec_id) picks
    "q188_mmr_select" -> s"WITH ${mmrOracle(5)}",
    // same milli grid, same unrolled 3 iterations with truncating
    // renormalization (DuckDB // floors negatives — spelled as
    // sign·(|w|·1000 // max) to match Spark's truncating div)
    "q220_pca_power" -> {
      def iter(i: Int): String =
        s"""w$i AS MATERIALIZED (
           |  SELECT m.i AS d, CAST(sum(m.mij * v${i - 1}.vi) AS BIGINT) AS wi
           |  FROM m JOIN v${i - 1} ON m.j = v${i - 1}.d GROUP BY 1),
           |v$i AS MATERIALIZED (
           |  SELECT d, CAST(CASE WHEN wi < 0 THEN -((-wi) * 1000 // mx)
           |    ELSE wi * 1000 // mx END AS BIGINT) AS vi
           |  FROM w$i CROSS JOIN (SELECT max(abs(wi)) AS mx FROM w$i))""".stripMargin
      s"""WITH x AS (
        |  SELECT vec_id, t.i AS i,
        |    CAST(floor(CAST(embedding[t.i + 1] AS DOUBLE) * 1000) AS BIGINT) AS xi
        |  FROM embeddings, range(64) t(i)),
        |m AS MATERIALIZED (
        |  SELECT a.i AS i, b.i AS j, CAST(sum(a.xi * b.xi) AS BIGINT) AS mij
        |  FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
        |v0 AS (SELECT DISTINCT i AS d, CAST(1000 AS BIGINT) AS vi FROM m),
        |${iter(1)},
        |${iter(2)},
        |${iter(3)},
        |num AS (
        |  SELECT CAST(sum(CAST(a.vi AS HUGEINT) * m.mij * b.vi) AS HUGEINT) AS num
        |  FROM m JOIN v3 b ON m.j = b.d JOIN v3 a ON m.i = a.d),
        |den AS (SELECT CAST(sum(vi * vi) AS BIGINT) AS den FROM v3)
        |SELECT d AS dim, vi AS component_milli,
        |  CAST(num * 1000 // CAST(den AS HUGEINT) AS BIGINT) AS lambda_milli
        |FROM v3 CROSS JOIN num CROSS JOIN den""".stripMargin
    },
    // same stride centroids, same rn<=2 probe assignment, same DISTINCT
    // cell candidates, (sim DESC, b_id) top-5, broadcast label lookups
    "q200_knn_label_consistency" ->
      s"""WITH ${hierAssignSql(2)},
        |nbrc AS (
        |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
        |  FROM assign a JOIN assign b ON a.cell = b.cell AND a.vec_id <> b.vec_id),
        |sims AS (
        |  SELECT c.a_id, c.b_id, ${cosineSql("ea.embedding", "eb.embedding")} AS sim
        |  FROM nbrc c JOIN embeddings ea ON ea.vec_id = c.a_id
        |              JOIN embeddings eb ON eb.vec_id = c.b_id),
        |top AS (
        |  SELECT a_id, b_id FROM (
        |    SELECT a_id, b_id,
        |      row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rn
        |    FROM sims) WHERE rn <= 5)
        |SELECT t.a_id AS vec_id, la.label, CAST(count(*) AS BIGINT) AS n_neighbors,
        |  CAST(sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_same,
        |  CAST(sum(CASE WHEN la.label = lb.label THEN 1 ELSE 0 END) * 1000000
        |    // count(*) AS BIGINT) AS consistency_ppm
        |FROM top t JOIN embeddings la ON la.vec_id = t.a_id
        |           JOIN embeddings lb ON lb.vec_id = t.b_id
        |GROUP BY 1, 2""".stripMargin,
  )
}
