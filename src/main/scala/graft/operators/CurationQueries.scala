package graft.operators

import graft.EngineQuery
import graft.dsl._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The END-TO-END curation pipeline — the chain a training-data run executes
  * nightly, here as ONE oracled query so the stages are proven to COMPOSE
  * (per-operator gates can't catch cross-stage schema or semantic drift).
  * Reference context: reader.py is the ingest step of such a pipeline; the
  * stages are the engine's own gated operators chained over `documents`:
  *
  *   raw → quality filter (q45's score expression at the ≥ 0.25 operating
  *         point — this corpus's 10–99-token docs cap the length prior at
  *         0.495, so q45's 0.5 report threshold would zero the funnel; the
  *         SCORE is q45's verbatim, only the cut is corpus-calibrated)
  *       → exact dedup (q23's digest keying, min doc_id survives)
  *       → near-dup dedup (q36 pairs → q60 components, min-label survives)
  *       → decontamination (q50's 8-shingle overlap vs the src0 benchmark,
  *         benchmark docs themselves removed from the training set)
  *       → chunking (q83's 64-token windows at stride 48)
  *
  * emitting one survivor/token report row per stage — the "data funnel"
  * datasheet every curation run publishes.
  *
  * Scale shape: the expensive artifacts are all SHARED, not recomputed —
  * near-dup pairs come from the session-memoized corpus pair list
  * ([[TextQueries.corpusJaccardPairs]]): pairwise Jaccard is independent of
  * the rest of the corpus, so the subset's pair graph IS the full graph
  * filtered to surviving endpoints (two id-keyed semi-joins), and label
  * propagation runs over pair-scale edges only. Survivor sets flow between
  * stages as id-scale frames (never text); each stage's report is one
  * combinable aggregate. The only corpus-scale passes are the ones the
  * member queries already pay: one text scan for scoring/digests, the
  * memoized shingle pass, and the q50 8-shingle pass restricted to
  * decontamination candidates (survivors only — the semi-join runs BEFORE
  * the shingle explode, so eliminated docs are never shingled).
  */
object CurationQueries {

  val q214 = EngineQuery(
    "q214_curation_e2e",
    Some("""WITH RECURSIVE
           |raw AS (SELECT doc_id, lang, source, text,
           |          string_split(text, ' ') AS tk,
           |          len(string_split(text, ' ')) AS ntok
           |        FROM documents),
           |sc AS (SELECT *,
           |        least(1.0, CAST(ntok AS DOUBLE) / 200.0)
           |          * (1.0 - CAST(len(list_filter(tk,
           |               x -> list_contains(['the','a','of','and','in','to'], x))) AS DOUBLE)
           |            / CAST(ntok AS DOUBLE)) AS score
           |      FROM raw),
           |s1 AS (SELECT * FROM sc WHERE score >= 0.25),
           |k AS (SELECT doc_id, sha256(lower(trim(text))) AS key FROM s1),
           |keep2 AS (SELECT min(doc_id) AS doc_id FROM k GROUP BY key),
           |s2 AS (SELECT s1.* FROM s1 JOIN keep2 USING (doc_id)),
           |sh AS (SELECT DISTINCT doc_id,
           |         unnest(list_transform(generate_series(1, ntok - 4),
           |           i -> array_to_string(tk[i:i+4], ' '))) AS sh
           |       FROM s2 WHERE ntok >= 5),
           |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
           |c AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
           |      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
           |      GROUP BY 1, 2),
           |pairs AS (SELECT doc_a, doc_b
           |          FROM c JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
           |          WHERE CAST(common AS DOUBLE) / CAST(x.n + y.n - common AS DOUBLE) >= 0.5),
           |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
           |        UNION SELECT doc_b, doc_a FROM pairs),
           |reach AS (SELECT a, b FROM sym
           |          UNION
           |          SELECT r.a, s2x.b FROM reach r JOIN sym s2x ON r.b = s2x.a),
           |lab AS (SELECT a AS doc_id, least(a, min(b)) AS cluster FROM reach GROUP BY a),
           |losers AS (SELECT doc_id FROM lab WHERE doc_id <> cluster),
           |s3 AS (SELECT * FROM s2 WHERE doc_id NOT IN (SELECT doc_id FROM losers)),
           |ev AS (SELECT DISTINCT array_to_string(tk[i:i+7], ' ') AS sh8
           |       FROM raw, unnest(generate_series(1, ntok - 7)) AS u(i)
           |       WHERE source = 'src0' AND ntok >= 8),
           |hit AS (SELECT DISTINCT d.doc_id
           |        FROM (SELECT doc_id, array_to_string(tk[i:i+7], ' ') AS sh8
           |              FROM s3, unnest(generate_series(1, ntok - 7)) AS u(i)
           |              WHERE ntok >= 8) d JOIN ev USING (sh8)),
           |s4 AS (SELECT * FROM s3 WHERE source <> 'src0'
           |         AND doc_id NOT IN (SELECT doc_id FROM hit)),
           |ch AS (SELECT doc_id, least(64, ntok - s + 1) AS chunk_len
           |       FROM s4, unnest(generate_series(1, ntok, 48)) AS u(s)),
           |rep AS (
           |  SELECT 0 AS stage, 'raw' AS name, count(*) AS n_docs,
           |         sum(ntok) AS n_tokens FROM raw
           |  UNION ALL SELECT 1, 'quality', count(*), sum(ntok) FROM s1
           |  UNION ALL SELECT 2, 'exact_dedup', count(*), sum(ntok) FROM s2
           |  UNION ALL SELECT 3, 'near_dedup', count(*), sum(ntok) FROM s3
           |  UNION ALL SELECT 4, 'decontaminate', count(*), sum(ntok) FROM s4
           |  UNION ALL SELECT 5, 'chunks', count(*), sum(chunk_len) FROM ch)
           |SELECT CAST(stage AS INT) AS stage, name,
           |       CAST(n_docs AS BIGINT) AS n_docs,
           |       CAST(n_tokens AS BIGINT) AS n_tokens
           |FROM rep ORDER BY ALL""".stripMargin)) { t =>
    val raw = t.documents.select(col("doc_id"), col("source"), col("text"),
      size(toks(col("text"))).cast("long").as("ntok"))

    // Stage 1 — quality (q45's exact score expression, reapplied verbatim).
    val tk = toks(col("text"))
    val stops = Seq("the", "a", "of", "and", "in", "to")
    val stopRatio =
      size(filter(tk, x => x.isin(stops: _*))).cast("double") / size(tk).cast("double")
    val score = least(lit(1.0), size(tk).cast("double") / 200.0) * (lit(1.0) - stopRatio)
    val s1 = raw.filter(score >= 0.25)

    // Stage 2 — exact dedup (q23's digest keying over the stage-1 survivors;
    // min doc_id per digest survives). The survivor set leaves this stage as
    // an id-scale frame — text never flows between stages.
    val keyed = s1.select(col("doc_id"),
      unhex(sha2(lower(trim(col("text"))), 256)).as("key"))
    val s2ids = keyed.groupBy("key").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").localCheckpoint()
    def stage(ids: DataFrame): DataFrame = raw.join(ids, Seq("doc_id"), "left_semi")

    // Stage 3 — near-dup dedup. Pairwise Jaccard does not depend on the
    // rest of the corpus, so the survivors' pair graph is the memoized
    // corpus pair list (q36's) filtered to surviving endpoints — two
    // id-keyed semi-joins instead of a fresh corpus self-join. Components
    // and min-label survivors then run at pair scale (q60's propagation).
    val pairs = TextQueries.corpusJaccardPairs(t)
      .join(s2ids.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_semi")
      .join(s2ids.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_semi")
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val losers = TextQueries.propagateMinLabels(
        pairs, maxIters = 40, doublingAfter = TextQueries.DoublingAfter)._1
      .filter(col("doc_id") =!= col("label"))
      .select("doc_id")
    val s3ids = s2ids.join(losers, Seq("doc_id"), "left_anti").localCheckpoint()

    // Stage 4 — decontamination (q50's 8-shingle overlap). The benchmark
    // (src0) shingle set comes from the RAW corpus — benchmarks are not
    // curated — and broadcasts; candidate docs are semi-joined to the
    // stage-3 survivors BEFORE the shingle explode, so eliminated docs are
    // never shingled. Benchmark docs themselves leave the training set here.
    val sh8src = t.documents
      .select(col("doc_id"), col("source"), toks(col("text")).as("tk"))
      .filter(size(col("tk")) >= 8)
    val ev = sh8src.filter(col("source") === "src0")
      .select(explode(shingles(col("tk"), 8)).as("sh")).distinct()
    val hitIds = sh8src.filter(col("source") =!= "src0")
      .join(s3ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(shingles(col("tk"), 8)).as("sh"))
      .join(broadcast(ev), "sh")
      .select("doc_id").distinct()
    val s4ids = stage(s3ids).filter(col("source") =!= "src0")
      .join(hitIds, Seq("doc_id"), "left_anti")
      .select("doc_id").localCheckpoint()

    // Stage 5 — chunking of the final set (q83's 64-token windows at
    // stride 48): the pipeline's output unit count and padded token volume.
    val chunks = stage(s4ids)
      .select(col("ntok"),
        explode(sequence(lit(1), col("ntok").cast("int"), lit(48))).as("s"))
      .select(least(lit(64L), col("ntok") - col("s") + 1).as("chunk_len"))

    def rep(stageId: Int, name: String, df: DataFrame, tokCol: String): DataFrame =
      df.agg(count(lit(1)).as("n_docs"), sum(col(tokCol)).as("n_tokens"))
        .select(lit(stageId).cast("int").as("stage"), lit(name).as("name"),
          col("n_docs"), col("n_tokens"))
    orderedByAll(
      rep(0, "raw", raw, "ntok")
        .unionByName(rep(1, "quality", s1, "ntok"))
        .unionByName(rep(2, "exact_dedup", stage(s2ids), "ntok"))
        .unionByName(rep(3, "near_dedup", stage(s3ids), "ntok"))
        .unionByName(rep(4, "decontaminate", stage(s4ids), "ntok"))
        .unionByName(rep(5, "chunks", chunks, "chunk_len")))
  }

  val all: Seq[EngineQuery] = Seq(q214)
}
