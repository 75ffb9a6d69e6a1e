package graft.operators

import graft.{EngineQuery, dsl}
import graft.dsl._
import org.apache.spark.sql.functions._

/** The tokenize-adjacent tail of a pre-training data pipeline (SURVEY.md §2
  * Part B extension, q83–q85): once documents are deduped/filtered/sampled
  * (q23/q24/q45/q50/q57/q72), they get CHUNKED into model-window-sized
  * pieces, PACKED into fixed-token-budget sequences, and the corpus mix is
  * REBALANCED to a target per-source composition. All three are pure
  * column/window arithmetic — map-only or single-shuffle — because at
  * 100 TB the chunker runs once over every byte of the corpus.
  */
object TrainingDataQueries {

  /** Overlapping-window document chunking: 64-token windows, stride 48
    * (16-token overlap) — posexplode of the window-start sequence, slice per
    * start. Map-only (Generate + Project over one scan, no shuffle until
    * the output sort); each chunk is emitted as its md5 signature, not its
    * text, so output volume stays bounded in the oracle compare. */
  val q83 = EngineQuery(
    "q83_chunk",
    Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents
           |           WHERE len(string_split(text, ' ')) >= 1),
           |c AS (SELECT doc_id, len(tk) AS n, unnest(generate_series(1, len(tk), 48)) AS s, tk
           |      FROM t)
           |SELECT doc_id,
           |       CAST((s - 1) // 48 AS INT) AS chunk_idx,
           |       CAST(least(64, n - s + 1) AS INT) AS chunk_len,
           |       substring(md5(array_to_string(tk[s:s+63], ' ')), 1, 8) AS sig
           |FROM c ORDER BY ALL""".stripMargin)) { t =>
    val docs = t.documents
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .filter(size(col("tk")) >= 1)
    orderedByAll(
      docs
        .select(col("doc_id"), col("tk"), size(col("tk")).as("n"),
          explode(sequence(lit(1), size(col("tk")), lit(48))).as("s"))
        .select(
          col("doc_id"),
          ((col("s") - 1) / 48).cast("int").as("chunk_idx"),
          least(lit(64), col("n") - col("s") + 1).cast("int").as("chunk_len"),
          substring(md5(concat_ws(" ", slice(col("tk"), col("s"), lit(64))).cast("binary")), 1, 8)
            .as("sig")))
  }

  /** Greedy sequential sequence packing: per lang, docs in doc_id order
    * fill 2048-token bins; a doc's bin is its START offset's bin
    * (floor((cumsum − ntok)/2048)). One window over a lang hash partition +
    * one aggregation — the packing plan that holds when "lang" is a
    * partition-sized shard key. */
  val q84 = EngineQuery(
    "q84_pack",
    Some("""WITH t AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS ntok FROM documents),
           |c AS (SELECT lang, ntok,
           |        sum(ntok) OVER (PARTITION BY lang ORDER BY doc_id
           |                        ROWS UNBOUNDED PRECEDING) AS cum
           |      FROM t)
           |SELECT lang, CAST((cum - ntok) // 2048 AS BIGINT) AS bin,
           |       CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(ntok) AS BIGINT) AS tokens
           |FROM c GROUP BY 1, 2 ORDER BY ALL""".stripMargin)) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("lang").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    orderedByAll(
      t.documents
        .select(col("doc_id"), col("lang"), size(toks(col("text"))).cast("long").as("ntok"))
        .withColumn("cum", sum(col("ntok")).over(w))
        .select(col("lang"), expr("(cum - ntok) div 2048").as("bin"), col("ntok"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens")))
  }

  /** Corpus-mix rebalancing to an equal per-source target: each source's
    * keep-rate is min(1, fair_share / its_count), applied as a
    * content-hash threshold (first 4 md5 hex digits vs floor(rate·65536)) —
    * the deterministic, engine-portable form of weighted sampling. The
    * rate table is per-source (tiny) → broadcast; the corpus passes once
    * map-side. */
  val q85 = EngineQuery(
    "q85_mix_rebalance",
    Some("""WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY 1),
           |tot AS (SELECT sum(cnt) AS total, count(*) AS ns FROM c),
           |r AS (SELECT source, least(1.0, (CAST(total AS DOUBLE) / CAST(ns AS DOUBLE))
           |                                 / CAST(cnt AS DOUBLE)) AS rate
           |      FROM c, tot)
           |SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept,
           |       round(max(rate), 4) AS rate
           |FROM documents d JOIN r USING (source)
           |WHERE CAST(('0x' || substring(md5(d.text), 1, 4)) AS INTEGER)
           |      < CAST(floor(rate * 65536) AS INTEGER)
           |GROUP BY 1 ORDER BY ALL""".stripMargin)) { t =>
    val counts = t.documents.groupBy("source").agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).cast("double").as("total"),
      count(lit(1)).cast("double").as("ns"))
    val rates = counts.crossJoin(broadcast(tot))
      .select(col("source"),
        least(lit(1.0), (col("total") / col("ns")) / col("cnt").cast("double")).as("rate"))
    orderedByAll(
      t.documents
        .join(broadcast(rates), "source")
        .filter(conv(substring(md5(col("text").cast("binary")), 1, 4), 16, 10).cast("int")
          < floor(col("rate") * 65536).cast("int"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"), round4(max(col("rate"))).as("rate")))
  }

  /** q84's pack accounting on REAL subword counts: sequence bins are
    * budgeted in greedy-BPE tokens ([[graft.functions.GreedyBpeTokens]] —
    * what a training job's tokenizer actually emits) instead of whitespace
    * words, with the whitespace count kept as the comparison column. Same
    * scale shape as q84: one map-only tokenize pass, one window on the lang
    * hash partition, one aggregation — never a global sort. Greedy
    * longest-match is not reasonably SQL-expressible → no DuckDB oracle;
    * BpeSpec pins the expression to an independent reference implementation
    * and this query's totals to a locally recomputed packing. */
  val q89 = EngineQuery("q89_bpe_pack", None) { t =>
    import org.apache.spark.sql.expressions.Window
    val counted = t.documents
      .select(col("doc_id"), col("lang"), toks(col("text")).as("tk"))
      .select(col("doc_id"), col("lang"),
        size(col("tk")).cast("long").as("ws_tok"),
        size(graft.functions.GreedyBpeTokens(col("tk"))).cast("long").as("bpe_tok"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    orderedByAll(
      counted
        .withColumn("cum", sum(col("bpe_tok")).over(w))
        .select(col("lang"), expr("(cum - bpe_tok) div 2048").as("bin"),
          col("bpe_tok"), col("ws_tok"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("bpe_tok")).as("bpe_tokens"),
          sum(col("ws_tok")).as("ws_tokens")))
  }

  /** Token-budget sampling — "take ~50k whitespace tokens per source,
    * reproducibly": docs order by their content hash within each source
    * (a deterministic, engine-portable shuffle — same trick as q57/q85),
    * and a running token sum admits docs while the budget lasts (the doc
    * that crosses the line is kept, so every source lands just over
    * budget — the usual convention). One window over a source hash
    * partition + the final rollup; rerunning, or running on another
    * engine, selects the IDENTICAL subset — which is what makes a training
    * mix auditable.
    *
    * 100 TB note: a window partitioned by a low-cardinality source key puts
    * a corpus-fraction per task. The budget bounds the fix: since only
    * ~budget tokens per source survive, first pre-filter each source to the
    * docs whose hash falls below a threshold sized (from per-source token
    * counts, one cheap agg) to cover ~2× the budget, then run this exact
    * window on the surviving sliver — same selection (hash order is
    * preserved by a hash-prefix filter), task size bounded by the budget,
    * not the corpus. */
  val q100 = EngineQuery(
    "q100_token_budget",
    Some("""WITH d AS (SELECT source, doc_id,
           |             len(string_split(text, ' ')) AS ntok,
           |             md5(text) AS h
           |           FROM documents),
           |c AS (SELECT source, ntok,
           |        sum(ntok) OVER (PARTITION BY source ORDER BY h, doc_id
           |                        ROWS UNBOUNDED PRECEDING) AS cum
           |      FROM d)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(ntok) AS BIGINT) AS tokens
           |FROM c WHERE cum - ntok < 50000
           |GROUP BY source ORDER BY ALL""".stripMargin)) { t =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    orderedByAll(
      t.documents
        .select(col("source"), col("doc_id"),
          size(toks(col("text"))).cast("long").as("ntok"),
          md5(col("text").cast("binary")).as("h"))
        .withColumn("cum", sum(col("ntok")).over(w))
        .filter(col("cum") - col("ntok") < 50000L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens")))
  }

  /** Distributed BPE vocabulary TRAINING ([[graft.functions.BpeTrainer]]):
    * learn the merge table itself from the corpus — the one LLM-pipeline
    * operator a data team couldn't previously run on this engine (q89 only
    * APPLIES a frozen vocab). One corpus-scale word-count pass, then one
    * q60-style superstep per merge rank (distributed weighted pair-count +
    * 1-row argmax) over the Zipf-bounded word-frequency table. Training is
    * memoized per (session, dir); this query emits the learned merge table
    * (vocab-budget-bounded, like q92's centroids). Iterative argmax over a
    * trainer loop is not SQL-expressible → no DuckDB oracle; BpeTrainSpec
    * pins the distributed merge sequence to an independent single-node
    * reference trainer, rank by rank. */
  val q106 = EngineQuery("q106_bpe_train", None) { t =>
    val merges = graft.functions.BpeTrainer.trainedMerges(t, 40)
    val spark = t.spark
    import spark.implicits._
    orderedByAll(
      merges.map(m => (m.rank, m.left, m.right, m.left + m.right, m.freq))
        .toDF("rank", "left", "right", "merged", "freq"))
  }

  /** The trained vocab DEPLOYED: q89's subword accounting re-run with the
    * merges q106 learned from this very corpus (plus the [a-z0-9] single
    * characters as the base alphabet) instead of the frozen demo vocab —
    * the full train->freeze->tokenize loop of a real tokenizer pipeline in
    * one engine session. Same map-only tokenize scale shape as q89; the
    * learned vocab rides the codegen expression as a constant payload.
    * No oracle (the vocab is a trainer artifact, not SQL-expressible);
    * BpeTrainSpec pins the totals to a local recomputation. */
  val q107 = EngineQuery("q107_bpe_train_tokenize", None) { t =>
    val vocab = graft.functions.BpeTrainer.vocabOf(
      graft.functions.BpeTrainer.trainedMerges(t, 40),
      (('a' to 'z') ++ ('0' to '9')).map(_.toString))
    orderedByAll(
      t.documents
        .select(col("lang"), toks(col("text")).as("tk"))
        .select(col("lang"),
          size(col("tk")).cast("long").as("ws_tok"),
          size(graft.functions.GreedyBpeTokens(col("tk"), vocab)).cast("long").as("bpe_tok"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("bpe_tok")).as("bpe_tokens"),
          round4(sum(col("bpe_tok")).cast("double") / sum(col("ws_tok"))).as("bpe_per_word")))
  }

  /** Deterministic epoch re-sharding — the "global shuffle" every training
    * run needs, done the way it scales: no global sort or permutation
    * materializes; each document's shard for epoch e is a pure hash of
    * (doc_id, e), so the assignment is MAP-ONLY, reproducible bit-for-bit
    * across reruns (the q57/q100 content-hash discipline — never rand()),
    * and re-deals every epoch. The audit output proves the two properties a
    * training job cares about: per-shard token balance (≈1.0 each) and a
    * different deal per epoch. Only (epoch, shard)-scale rows ever reach an
    * exchange (partial-agg), and the per-epoch normalizer is a broadcast
    * 2-row aggregate. The physical shard WRITE is q91's partitioned layout;
    * this operator is the assignment + audit half. */
  val q111 = EngineQuery(
    "q111_epoch_shard",
    Some("""WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents),
           |e AS (SELECT 0 AS epoch UNION ALL SELECT 1),
           |s AS (SELECT epoch,
           |        CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
           |             CAST(epoch AS VARCHAR)), 1, 1) AS INTEGER) AS shard,
           |        ntok
           |      FROM d CROSS JOIN e),
           |g AS (SELECT epoch, shard, count(*) AS n_docs, sum(ntok) AS tokens
           |      FROM s GROUP BY 1, 2),
           |t AS (SELECT epoch, sum(tokens) AS tot FROM g GROUP BY 1)
           |SELECT epoch, shard, CAST(n_docs AS BIGINT) AS n_docs,
           |       CAST(tokens AS BIGINT) AS tokens,
           |       round(16.0 * tokens / tot, 4) AS balance
           |FROM g JOIN t USING (epoch) ORDER BY ALL""".stripMargin)) { t =>
    val spark = t.spark
    import spark.implicits._
    val d = t.documents.select(col("doc_id"),
      size(toks(col("text"))).cast("long").as("ntok"))
    val epochs = broadcast(Seq(0, 1).toDF("epoch"))
    val sharded = d.crossJoin(epochs)
      .select(col("epoch"),
        conv(substring(md5(concat(col("doc_id").cast("string"), lit(":"),
          col("epoch").cast("string"))), 1, 1), 16, 10).cast("int").as("shard"),
        col("ntok"))
    val g = sharded.groupBy("epoch", "shard")
      .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("tokens"))
    val tot = g.groupBy("epoch").agg(sum(col("tokens")).as("tot"))
    orderedByAll(
      g.join(broadcast(tot), "epoch")
        .select(col("epoch"), col("shard"), col("n_docs"), col("tokens"),
          round4(lit(16.0) * col("tokens") / col("tot")).as("balance")))
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-Res): each
    * document draws key = ln(u)/w with u uniform and w its token count, and
    * the top-k keys per language ARE a weighted sample without replacement —
    * the standard one-pass trick for "sample a 1% training mix where a doc's
    * inclusion odds scale with its length". The uniform is DERIVED FROM
    * CONTENT (md5(text) → 16-bit u), the q57/q100/q111 discipline: no
    * rand(), no seed plumbing, bit-reproducible across reruns, engines and
    * partitionings. Rank boundaries are safe across engines: the measured
    * rank-5/6 key gap is ≥1.65e-6 at every gate SF, ~10 orders above
    * cross-libm ln() ulp.
    *
    * Plan for 100 TB: scoring is map-only inside the scan; per-lang top-k
    * is the q105 shape — rank window whose limit Spark pushes below the
    * exchange as WindowGroupLimit, so each map task forwards at most k rows
    * per lang and the shuffle carries candidates, not the corpus. */
  val q115 = EngineQuery(
    "q115_weighted_sample",
    Some("""WITH d AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS ntok,
           |             (CAST('0x' || substr(md5(text), 1, 4) AS INTEGER) + 0.5)
           |               / 65536.0 AS u
           |           FROM documents),
           |k AS (SELECT doc_id, lang, ntok, ln(u) / ntok AS skey FROM d),
           |r AS (SELECT lang, doc_id, ntok,
           |        row_number() OVER (PARTITION BY lang ORDER BY skey DESC, doc_id)
           |          AS rn
           |      FROM k)
           |SELECT lang, CAST(rn AS INT) AS rank, doc_id,
           |       CAST(ntok AS BIGINT) AS ntok
           |FROM r WHERE rn <= 5 ORDER BY ALL""".stripMargin)) { t =>
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("skey").desc, col("doc_id"))
    val scored = t.documents
      .select(col("doc_id"), col("lang"),
        size(toks(col("text"))).cast("long").as("ntok"),
        ((conv(substring(md5(col("text").cast("binary")), 1, 4), 16, 10)
          .cast("double") + 0.5) / 65536.0).as("u"))
      .withColumn("skey", log(col("u")) / col("ntok"))
    orderedByAll(
      scored
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select(col("lang"), col("rn").cast("int").as("rank"),
          col("doc_id"), col("ntok")))
  }

  /** Global contiguous ordinal assignment (the distributed `zipWithIndex`):
    * every document gets a stable 0-based id under the doc_id total order —
    * the "give 100 TB of samples contiguous training ids" primitive that a
    * naive `row_number() OVER (ORDER BY ...)` gets WRONG at scale (an
    * unpartitioned window collapses the whole table into one task).
    *
    * Scale shape (what RDD.zipWithIndex does, kept in DataFrame algebra so
    * the id math stays codegen'd):
    *  1. ONE range exchange + in-partition sort; localCheckpoint pins the
    *     partition contents so both downstream jobs see identical splits.
    *  2. `monotonically_increasing_id` encodes (partition << 33 | local
    *     row number) — per-partition ordinals for free, zero extra shuffle.
    *  3. A counts-per-partition aggregate (≤ #partitions rows to the
    *     driver — bounded model-state-sized collect, the q108/q106 rule)
    *     prefix-sums into per-partition offsets, broadcast back.
    *  4. gid = offset(partition) + local — map-side add under a broadcast
    *     join; the corpus itself never moves again.
    * RangePartitioner orders partition indices by key range, so
    * offset+local reproduces the global rank exactly. */
  val q152 = EngineQuery(
    "q152_global_index",
    Some("""SELECT doc_id,
           |       CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS gid
           |FROM documents ORDER BY ALL""".stripMargin)) { t =>
    // The shared range-exchange global-rank core (since round 9 also
    // behind q196's AUC rank-sum and q200's conformal order statistic).
    orderedByAll(graft.functions.GlobalRank
      .withGlobalId(t.documents.select("doc_id"), Seq(col("doc_id")))
      .select(col("doc_id"), col("gid")))
  }

  /** Rendezvous (highest-random-weight) shard assignment — the stable
    * routing function a corpus store uses so that ADDING a shard only moves
    * ~1/(N+1) of the documents (classic hash-mod-N reshuffles almost
    * everything): each doc goes to the shard maximizing
    * hash(doc_id, shard). Assignment is a pure map-side array expression —
    * the per-doc argmax runs over a literal sequence of shard ids, zero
    * exchange — and the report is the 8-key shard aggregate: per shard of
    * the N=8 placement, how many docs it holds and how many would leave if
    * shard 8 joined (they can only move TO the new shard, one of HRW's
    * guarantees). moved_frac ≈ 1/9 per shard is minimal-disruption
    * working as designed.
    *
    * Engine/oracle hash parity needs no bigint convs: both engines compare
    * the first 15 hex chars of md5("docId:shard") AS STRINGS — equal-length
    * lowercase hex compares lexicographically exactly like the number it
    * spells, on both sides. */
  val q169 = EngineQuery(
    "q169_rendezvous_shard",
    Some("""WITH a AS (SELECT doc_id, r.range AS s,
           |             substr(md5(doc_id::VARCHAR || ':' || r.range::VARCHAR), 1, 15) AS h
           |           FROM documents CROSS JOIN range(9) r),
           |s8 AS (SELECT doc_id, s AS shard8 FROM
           |        (SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
           |         FROM a WHERE s < 8) WHERE rn = 1),
           |s9 AS (SELECT doc_id, s AS shard9 FROM
           |        (SELECT doc_id, s, row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, s DESC) AS rn
           |         FROM a) WHERE rn = 1)
           |SELECT CAST(shard8 AS INT) AS shard,
           |       CAST(count(*) AS BIGINT) AS n_docs,
           |       CAST(sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
           |       round(sum(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 4) AS moved_frac
           |FROM s8 JOIN s9 USING (doc_id) GROUP BY 1 ORDER BY ALL""".stripMargin)) { t =>
    def hrw(nShards: Int) =
      array_max(transform(sequence(lit(0), lit(nShards - 1)), s =>
        struct(
          substring(md5(concat(col("doc_id").cast("string"), lit(":"), s.cast("string"))), 1, 15).as("h"),
          s.as("s")))).getField("s")
    val moved = col("shard8") =!= col("shard9")
    orderedByAll(
      t.documents.select(col("doc_id"), hrw(8).as("shard8"), hrw(9).as("shard9"))
        .groupBy(col("shard8").cast("int").as("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(moved, 1L).otherwise(0L)).as("n_moved"),
          round4(sum(when(moved, 1L).otherwise(0L)) / count(lit(1)).cast("double"))
            .as("moved_frac")))
  }

  /** Vocabulary freeze + integer encoding — the word-level tokenizer step
    * between curation and q84's packing: the top-256 corpus tokens become
    * ids 1..256 (rank by exact (count DESC, token) — an integer cutoff, no
    * FP on the boundary), everything else OOV id 0, and each document is
    * re-emitted as its id sequence. q106/q107 are the subword (BPE) form;
    * this is the frozen-vocab word form, and the id sequences ship as a
    * space-joined STRING column (arrays don't survive the gate's
    * cell-compare; a string hashes exactly).
    *
    * Scale shape: the vocab is ONE combinable token-count exchange +
    * TakeOrdered (the q174 move), then collected — 256 rows, the
    * driver-sized-model pattern of q37's centroids — and encoding is a
    * map-only literal-map lookup: at 100 TB the encode pass touches every
    * byte once and exchanges NOTHING. The oracle can't hold a literal map,
    * so it derives the identical vocab in SQL and takes the positional-
    * join path; same values, different (acceptable) plan. */
  val q178 = EngineQuery(
    "q178_vocab_encode",
    Some("""WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token FROM documents),
           |c AS (SELECT token, count(*) AS n FROM tok GROUP BY 1
           |      ORDER BY n DESC, token LIMIT 256),
           |v AS (SELECT token, CAST(row_number() OVER (ORDER BY n DESC, token) AS INT) AS id FROM c),
           |d AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
           |e0 AS (SELECT doc_id, unnest(generate_series(1, len(tk))) AS i, tk FROM d),
           |e AS (SELECT doc_id, i, tk[i] AS t FROM e0),
           |j AS (SELECT e.doc_id, e.i, coalesce(v.id, 0) AS id
           |      FROM e LEFT JOIN v ON v.token = e.t)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
           |  CAST(sum(CASE WHEN id = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           |  string_agg(CAST(id AS VARCHAR), ' ' ORDER BY i) AS ids_str
           |FROM j GROUP BY 1 ORDER BY ALL""".stripMargin)) { t =>
    val tok = t.documents.select(explode(toks(col("text"))).as("token"))
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token")).limit(256)
      .select("token").collect().map(_.getString(0))
    val vmap = typedLit(vocab.zipWithIndex.map { case (w, i) => w -> (i + 1) }.toMap)
    val enc = t.documents
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .withColumn("ids", transform(col("tk"),
        w => coalesce(element_at(vmap, w), lit(0))))
    orderedByAll(enc.select(
      col("doc_id"),
      size(col("ids")).cast("long").as("n_toks"),
      size(filter(col("ids"), i => i === 0)).cast("long").as("n_oov"),
      concat_ws(" ", transform(col("ids"), i => i.cast("string"))).as("ids_str")))
  }

  /** Train/val/test split leakage audit — the check a curation pipeline
    * runs AFTER splitting and BEFORE training: duplicate clusters that
    * span split boundaries leak eval answers into train. The cluster key
    * here is the 8-token OPENING (shared boilerplate intros — the
    * template-leakage proxy; q23's full-text digest finds zero dups in
    * this fixture, and a vacuous audit gates nothing). Docs are split by
    * the first hex nibble of md5(doc_id) (12/2/2 train/val/test — a pure
    * function of the id, reproducible anywhere; hex-string comparison
    * behaves identically on both engines per q169's convention); the
    * report buckets duplicate clusters by how many splits they touch.
    *
    * Scale shape: one digest-keyed combinable exchange (q23's), then
    * cluster-scale rollups — the corpus text never shuffles. At 100 TB
    * the leakage check costs exactly one dedup pass. */
  val q179 = EngineQuery(
    "q179_split_leakage",
    Some("""WITH s AS (SELECT doc_id,
           |    md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS dg,
           |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
           |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM documents),
           |g AS (SELECT dg, count(*) AS n_docs, count(DISTINCT split) AS n_splits
           |      FROM s GROUP BY 1 HAVING count(*) >= 2)
           |SELECT CAST(n_splits AS INT) AS n_splits,
           |  CAST(count(*) AS BIGINT) AS n_clusters,
           |  CAST(sum(n_docs) AS BIGINT) AS n_docs
           |FROM g GROUP BY 1 ORDER BY ALL""".stripMargin)) { t =>
    val s = t.documents.select(col("doc_id"),
      md5(concat_ws(" ", slice(toks(col("text")), 1, 8))).as("dg"),
      when(substring(md5(col("doc_id").cast("string")), 1, 1) < "c", "train")
        .when(substring(md5(col("doc_id").cast("string")), 1, 1) < "e", "val")
        .otherwise("test").as("split"))
    val g = s.groupBy("dg")
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("split")).as("n_splits"))
      .filter(col("n_docs") >= 2)
    orderedByAll(g.groupBy(col("n_splits").cast("int").as("n_splits"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("n_docs")).as("n_docs")))
  }

  /** q189: train the fastText-style linear quality classifier — the
    * distill-a-heuristic-into-a-cheap-filter step of a pretraining data
    * pipeline (the corpus filters behind GPT-3/LLaMA-class models are
    * linear classifiers over hashed text features). Full-batch logistic
    * GD, [[graft.functions.LogRegTrainer]]'s one-job-per-iteration /
    * no-shuffle / driver-sized-model shape; the target label is the
    * stopword-density quality rule, which is LINEAR in the hashed feature
    * space — so training accuracy far above the base rate is the
    * correctness signal LogRegTrainSpec pins (plus 1e-8 weight parity vs
    * the single-node reference). Output is the training report: metrics
    * are exact counts or 4dp-rounded scalars. No oracle: feature hashing
    * (MurmurHash3) is not expressible in ANSI SQL — spec-verified like
    * q106/q108. */
  val q189 = EngineQuery("q189_quality_classifier", None) { t =>
    val m = graft.functions.LogRegTrainer.trained(t)
    val spark = t.spark
    import spark.implicits._
    orderedByAll(Seq(
      ("accuracy", BigDecimal(m.accuracy).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("base_rate", BigDecimal(m.nPos.toDouble / m.nDocs).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("iters", m.losses.length.toDouble),
      ("loss_final", BigDecimal(m.losses.last).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("loss_first", BigDecimal(m.losses.head).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble),
      ("n_docs", m.nDocs.toDouble),
      ("n_pos", m.nPos.toDouble)).toDF("metric", "value"))
  }

  /** q194: SERVE the trained quality classifier — the filter pass that
    * actually curates the corpus (q189 is train, q194 is the other half of
    * the train→serve split this engine applies to every model family:
    * q92/q108 k-means, q106/q107 BPE, q146/q186 PQ). The memoized model's
    * weights ship to executors once (driver-sized broadcast); scoring +
    * thresholding run inside one mapPartitions pass over the corpus using
    * the SAME featurize as training (shared single definition — serving
    * skew between train- and serve-time features is the classic production
    * failure this kills); the only exchange is the per-(source, lang)
    * retention rollup, combinable and id-scale. Output: the per-slice
    * retention report a curation run publishes — n_docs, n_kept, kept
    * fraction, mean score. No oracle (hashed features, like q189) —
    * LogRegTrainSpec pins scoring parity and the retention invariants. */
  val q194 = EngineQuery("q194_classifier_filter", None) { t =>
    val m = graft.functions.LogRegTrainer.trained(t)
    val spark = t.spark
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(m.weights)
    val scored = t.documents
      .select(col("source"), col("lang"), col("text"))
      .as[(String, String, String)]
      .mapPartitions { it =>
        val w = bc.value
        it.map { case (source, lang, text) =>
          val s = graft.functions.LogRegTrainer.score(w, text)
          (source, lang, s, if (s >= 0.5) 1L else 0L)
        }
      }
      .toDF("source", "lang", "score", "kept")
    orderedByAll(scored
      .groupBy(col("source"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("kept")).as("n_kept"),
        round4(sum(col("kept")).cast("double") / count(lit(1))).as("retention"),
        round4(avg(col("score"))).as("mean_score")))
  }

  val all: Seq[EngineQuery] =
    Seq(q83, q84, q85, q89, q100, q106, q107, q111, q115, q152, q169, q178,
      q179, q189, q194)
}
