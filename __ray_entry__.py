"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init()`` / ``ray.shutdown()`` here or in the library code these
callables use.

- ``entry()``: flagship near-dup clustering over the sf0.001
  `documents` table (the caption-side dedup engine end-to-end).
- ``queries()``: one entry per implemented operator/pipeline from
  SURVEY.md §2 plus the training-data-scale additions (dedup,
  similarity search, text analysis).
- ``oracle_sql()``: DuckDB-equivalent SQL for every SQL-expressible
  query, with IDENTICAL output column names. Non-SQL pipelines (LSH
  clustering, winnowing, approximate ANN, heuristic language ID) are
  intentionally absent -> driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: full near-dup
    clustering of `documents` (exact + MinHash-LSH + substring +
    union-find CC). Returns the (doc_id, cluster_id) Dataset."""
    from stack_trace_deduplication_ray.pipelines.text import minhash_dedup_clusters

    return minhash_dedup_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from stack_trace_deduplication_ray.pipelines import (
        analysis,
        dedup,
        delta,
        evaluation,
        neural,
        ranking,
        relational,
        rerank,
        pretrain,
        similarity,
        text,
        training,
    )

    return {
        # --- flagship image+caption dedup (north_rule core) ----------
        "image_dedup_clusters": dedup.image_dedup_clusters,
        "image_dedup_recall": dedup.image_dedup_recall,
        # --- incremental attach (T10/T11 accumulated-state model) ----
        "delta_dedup_clusters": delta.delta_dedup_clusters,
        "delta_dedup_equivalence": delta.delta_dedup_equivalence,
        "delta_minhash_dedup_clusters": delta.delta_minhash_dedup_clusters,
        "image_feature_table": dedup.image_feature_table,
        "video_frame_table": dedup.video_frame_table,
        # --- dedup over documents (SURVEY §2.6, north_rule core) -----
        "exact_dedup_keep_first": text.exact_dedup_keep_first,
        "corpus_stats": text.corpus_stats,
        "minhash_dedup_clusters": text.minhash_dedup_clusters,
        "simhash_text_clusters": text.simhash_text_clusters,
        "cluster_size_histogram": text.cluster_size_histogram,
        "jaccard_pairs_by_source": text.jaccard_pairs_by_source,
        "substring_candidate_pairs": text.substring_candidate_pairs,
        "substring_pairs_exact": text.substring_pairs_exact,
        "report_dedup_clusters": text.report_dedup_clusters,
        "cross_segment_new_docs": text.cross_segment_new_docs,
        # --- classic rankers (Lerch TF-IDF / FaST alignment) ----------
        "lerch_pair_scores": ranking.lerch_pair_scores,
        "fast_pair_scores": ranking.fast_pair_scores,
        # --- P4/P5 neural cross-encoders (seeded numpy inference) ----
        "s3m_pair_scores": neural.s3m_pair_scores,
        "cross_encoder_rerank": neural.cross_encoder_rerank,
        # head training (train_model.py shape; analytic gradients,
        # distributed feature extraction + grad passes) — rows-only:
        # an iterative optimizer is not SQL-expressible; proxy =
        # val_auc_trained >> val_auc_untrained on the held-out split
        "train_cross_encoder_metrics": (
            training.train_cross_encoder_metrics
        ),
        # full-model BPTT fine-tune (hand-derived gradients for every
        # parameter, FD-verified) — rows-only for the same reason
        "train_s3m_full_metrics": training.train_s3m_full_metrics,
        # learned scoring end-to-end: trained weights installed into
        # the serving actor pool, held-out Acc@1/MRR before vs after
        "trained_retrieval_metrics": training.trained_retrieval_metrics,
        # the trained P5 RERANKER in the serving pool (what the
        # reference trains its cross_enc branch for) — rows-only
        "trained_rerank_metrics": training.trained_rerank_metrics,
        # P5 reranker training (token-level cross-encoder, the
        # reference's cross_enc branch) — rows-only
        "train_rerank_encoder_metrics": (
            training.train_rerank_encoder_metrics
        ),
        # siamese bi-encoder training (InfoNCE, in-batch negatives —
        # the reference's similarity-model branch) — rows-only
        "train_bi_encoder_metrics": training.train_bi_encoder_metrics,
        # the GRU-cell variant (rnn_type="gru" / GRUEmb) — rows-only
        "train_bi_encoder_gru_metrics": (
            training.train_bi_encoder_gru_metrics
        ),
        # indexing payoff: trained embeddings -> cosine 1-NN over the
        # corpus, same-cluster accuracy before vs after — rows-only
        "trained_embedding_ann": training.trained_embedding_ann,
        # unsupervised SGNS pretraining (SkipGramBOW.initialize) and
        # the pretrain->fine-tune flow (documented corpus-limited
        # transfer) — rows-only
        "pretrain_skipgram_metrics": pretrain.pretrain_skipgram_metrics,
        "pretrained_init_benefit": pretrain.pretrained_init_benefit,
        # --- T13 embedding client (local deterministic backend) ------
        "embed_client_vectors": analysis.embed_client_vectors,
        "embed_client_cost": analysis.embed_client_cost,
        # --- text analysis (training-data ops) ------------------------
        "token_counts": analysis.token_counts,
        "token_document_frequency": analysis.token_document_frequency,
        "quality_scores": analysis.quality_scores,
        "language_id": analysis.language_id,
        "fingerprints": analysis.fingerprints,
        "bpe_token_counts": analysis.bpe_token_counts,
        "padded_sequences": analysis.padded_sequences,
        # --- relational / aggregation / top-k (SURVEY §2.5, §2.7) ----
        "events_top_value_per_type": relational.events_top_value_per_type,
        "events_daily_user_agg": relational.events_daily_user_agg,
        "users_first_event": relational.users_first_event,
        "events_sessionize": relational.events_sessionize,
        "events_prev_same_type": relational.events_prev_same_type,
        "events_replay_attach": relational.events_replay_attach,
        "events_replay_windowed": relational.events_replay_windowed,
        "systematic_sample": relational.systematic_sample,
        "normalized_texts": relational.normalized_texts,
        "lineitem_pricing_summary": relational.lineitem_pricing_summary,
        "segment_order_stats": relational.segment_order_stats,
        "top_orders_by_revenue": relational.top_orders_by_revenue,
        # --- similarity search over embeddings ------------------------
        "knn_brute_force": similarity.knn_brute_force,
        "same_label_near_pairs": similarity.same_label_near_pairs,
        "lsh_near_pairs": similarity.lsh_near_pairs,
        "ann_recall": similarity.ann_recall,
        "ivf_knn": similarity.ivf_knn,
        "ivf_recall": similarity.ivf_recall,
        "embedding_dedup_clusters": similarity.embedding_dedup_clusters,
        "knn_label_accuracy": similarity.knn_label_accuracy,
        # --- ranked-prediction evaluator battery ----------------------
        "retrieval_rank_metrics": evaluation.retrieval_rank_metrics,
        "retrieval_threshold_metrics": evaluation.retrieval_threshold_metrics,
        "threshold_fbeta_auc": evaluation.threshold_fbeta_auc,
        "bootstrap_acc1_ci": evaluation.bootstrap_acc1_ci,
        # --- two-stage retrieve-then-rerank serving pipeline ----------
        "retrieve_rerank_metrics": rerank.retrieve_rerank_metrics,
        "mock_rerank_metrics": rerank.mock_rerank_metrics,
    }


def oracle_sql() -> dict[str, str]:
    # The flagship text-clustering oracle (exact + MinHash-LSH +
    # winnowed-substring + CC) is machine-generated pure SQL — the
    # repo's 64-bit hash kernels re-derived in DuckDB integer
    # arithmetic; see eval/sql_oracle.py.
    from stack_trace_deduplication_ray.eval.sql_oracle import (
        ann_recall_sql,
        cluster_size_histogram_sql,
        embedding_dedup_clusters_sql,
        lsh_near_pairs_sql,
        minhash_dedup_clusters_sql,
        mock_rerank_metrics_sql,
        report_dedup_clusters_sql,
        retrieve_rerank_metrics_sql,
        simhash_text_clusters_sql,
        substring_candidate_pairs_sql,
    )

    # The report oracle parses the raw V1/V0 JSON files in SQL
    # (read_json_auto), so the fixture the driver's sf0.01 query run
    # reads must exist before DuckDB executes; write it here (cheap,
    # deterministic, same (n, seed) as pipelines.text at sf0.01).
    import os as _os

    from stack_trace_deduplication_ray.sources.reports import (
        write_reports_fixture,
    )

    _rep_dir = "/tmp/stack_dedup_fixtures/reports_240"
    if not _os.path.exists(_os.path.join(_rep_dir, "_DONE")):
        write_reports_fixture(_rep_dir, n=240, seed=7)
        open(_os.path.join(_rep_dir, "_DONE"), "w").close()

    sqls = {
        "report_dedup_clusters": report_dedup_clusters_sql(_rep_dir),
        "lsh_near_pairs": lsh_near_pairs_sql(),
        "embedding_dedup_clusters": embedding_dedup_clusters_sql(),
        "retrieve_rerank_metrics": retrieve_rerank_metrics_sql(),
        "mock_rerank_metrics": mock_rerank_metrics_sql(),
        "ann_recall": ann_recall_sql(),
        "minhash_dedup_clusters": minhash_dedup_clusters_sql(),
        # the incremental-attach path must land on the SAME clustering
        # as a from-scratch run, so it shares the full-run SQL oracle
        # (split is internal to the query; the result is corpus-wide)
        "delta_minhash_dedup_clusters": minhash_dedup_clusters_sql(),
        "substring_candidate_pairs": substring_candidate_pairs_sql(),
        "simhash_text_clusters": simhash_text_clusters_sql(),
        "cluster_size_histogram": cluster_size_histogram_sql(),
        "exact_dedup_keep_first": """
            SELECT min(doc_id) AS keep_id, count(*) AS n
            FROM documents GROUP BY text
        """,
        "corpus_stats": """
            SELECT count(*) AS n_rows, count(DISTINCT text) AS n_unique
            FROM documents
        """,
        "cross_segment_new_docs": """
            SELECT d.doc_id FROM documents d
            WHERE d.source != 'src0'
              AND d.text NOT IN (
                  SELECT text FROM documents WHERE source = 'src0'
              )
        """,
        "jaccard_pairs_by_source": """
            WITH tok AS (
                SELECT DISTINCT doc_id, source,
                       unnest(string_split(text, ' ')) AS t
                FROM documents
            ),
            sizes AS (
                SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id
            ),
            inter AS (
                SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS i
                FROM tok a JOIN tok b
                  ON a.source = b.source AND a.t = b.t AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
            )
            SELECT i.src, i.dst,
                   round(i.i * 1.0 / (sa.sz + sb.sz - i.i), 6) AS jac
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.src
            JOIN sizes sb ON sb.doc_id = i.dst
            WHERE i.i * 1.0 / (sa.sz + sb.sz - i.i) >= 0.5
        """,
        "lerch_pair_scores": """
            WITH n AS (SELECT count(*) AS n_docs FROM documents),
            tok AS (
                SELECT DISTINCT doc_id, source,
                       unnest(string_split(text, ' ')) AS t
                FROM documents
            ),
            idf AS (
                SELECT t, 1 + ln((SELECT n_docs FROM n) * 1.0 / (count(*) + 1))
                           AS w
                FROM (SELECT DISTINCT doc_id, t FROM tok) GROUP BY t
            ),
            pairs AS (
                SELECT a.doc_id AS src, b.doc_id AS dst,
                       round(sum(i.w * i.w), 4) AS score
                FROM tok a
                JOIN tok b ON a.source = b.source AND a.t = b.t
                          AND a.doc_id < b.doc_id
                JOIN idf i ON i.t = a.t
                GROUP BY a.doc_id, b.doc_id
            ),
            ranked AS (
                SELECT src, dst, score, row_number() OVER (
                    PARTITION BY src ORDER BY score DESC, dst ASC
                ) AS rn FROM pairs
            )
            SELECT src, dst, score FROM ranked WHERE rn <= 5
        """,
        "fast_pair_scores": """
            -- FaST positional alignment (P1/P2): tokens reversed
            -- (deepest frame first), weight = pos^-1 * exp(-df/N);
            -- the two-pointer merge over id-sorted streams matches the
            -- k-th occurrence of each shared token in both docs, adds
            -- (w_a+w_b)*exp(-|pos_a-pos_b|) for matches, subtracts w
            -- for every unmatched occurrence, and normalizes by total
            -- weight. Pair set = same-source docs sharing >= 1 token,
            -- per-src top-5 by (score desc, dst asc).
            WITH n AS (SELECT count(*) AS n_docs FROM documents),
            tokpos AS (
                SELECT doc_id, source, u['t'] AS t,
                       array_length(string_split(text, ' '))
                           - u['ord'] + 1 AS pos
                FROM (
                    SELECT doc_id, source, text,
                           unnest(list_transform(
                               string_split(text, ' '),
                               (x, i) -> {'t': x, 'ord': i})) AS u
                    FROM documents
                )
            ),
            df AS (
                SELECT t, count(DISTINCT doc_id) AS df
                FROM tokpos GROUP BY t
            ),
            tv AS (
                SELECT p.doc_id, p.source, p.t, p.pos,
                       row_number() OVER (
                           PARTITION BY p.doc_id, p.t ORDER BY p.pos
                       ) AS k,
                       pow(p.pos, -1.0)
                           * exp(-1.0 * df.df
                                 / (SELECT n_docs FROM n)) AS w
                FROM tokpos p JOIN df USING (t)
            ),
            sw AS (SELECT doc_id, sum(w) AS tot FROM tv GROUP BY doc_id),
            m AS (
                SELECT ta.doc_id AS src, tb.doc_id AS dst,
                       sum((ta.w + tb.w)
                           * exp(-1.0 * abs(ta.pos - tb.pos))) AS msum,
                       sum(ta.w + tb.w) AS mw
                FROM tv ta
                JOIN tv tb ON tb.source = ta.source AND tb.t = ta.t
                          AND tb.k = ta.k AND ta.doc_id < tb.doc_id
                GROUP BY ta.doc_id, tb.doc_id
            ),
            scored AS (
                SELECT m.src, m.dst,
                       round((m.msum - (sa.tot + sb.tot - m.mw))
                             / (sa.tot + sb.tot), 4) AS score
                FROM m
                JOIN sw sa ON sa.doc_id = m.src
                JOIN sw sb ON sb.doc_id = m.dst
            ),
            ranked AS (
                SELECT src, dst, score, row_number() OVER (
                    PARTITION BY src ORDER BY score DESC, dst ASC
                ) AS rn FROM scored
            )
            SELECT src, dst, score FROM ranked WHERE rn <= 5
        """,
        "token_counts": """
            SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
            FROM documents
        """,
        "embed_client_cost": """
            SELECT doc_id,
                   LEAST(len(string_split(text, ' ')), 256)::BIGINT
                       AS consumed_tokens
            FROM documents
        """,
        "token_document_frequency": """
            SELECT t AS token, count(*) AS df
            FROM (SELECT DISTINCT doc_id,
                         unnest(string_split(text, ' ')) AS t
                  FROM documents)
            GROUP BY t
        """,
        "quality_scores": """
            SELECT doc_id,
                   length(text) AS n_chars_actual,
                   len(string_split(text, ' ')) AS n_words,
                   length(text)
                     - length(replace(replace(text, '.', ''), ',', ''))
                     AS n_punct
            FROM documents
        """,
        "fingerprints": """
            SELECT doc_id, md5(text) AS fp FROM documents
        """,
        "language_id": """
            WITH d AS (
                SELECT DISTINCT doc_id, tok FROM (
                    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                    FROM documents
                )
            ), h AS (
                SELECT doc_id,
                    count(*) FILTER (WHERE tok IN
                        ('der','die','das','und','ist')) AS de,
                    count(*) FILTER (WHERE tok IN
                        ('the','and','of','a','to','fast','slow')) AS en,
                    count(*) FILTER (WHERE tok IN
                        ('el','la','de','y','que')) AS es,
                    count(*) FILTER (WHERE tok IN
                        ('le','la','et','de','un')) AS fr,
                    count(*) FILTER (WHERE tok IN
                        ('的','是','了','在')) AS zh
                FROM d GROUP BY doc_id
            )
            SELECT doc_id,
                CASE WHEN greatest(de,en,es,fr,zh) = 0 THEN 'unknown'
                     WHEN de >= en AND de >= es AND de >= fr
                          AND de >= zh THEN 'de'
                     WHEN en >= es AND en >= fr AND en >= zh THEN 'en'
                     WHEN es >= fr AND es >= zh THEN 'es'
                     WHEN fr >= zh THEN 'fr'
                     ELSE 'zh' END AS lang_pred,
                greatest(de,en,es,fr,zh) AS marker_hits
            FROM h
        """,
        "padded_sequences": """
            WITH s AS (
                SELECT doc_id,
                       list_transform(string_split(text, ' '),
                                      w -> length(w)) AS seq
                FROM documents
            ), t AS (
                SELECT doc_id,
                       list_concat(list_concat(
                           [2], seq[greatest(len(seq)-16+1,1):len(seq)]
                       ), [3]) AS p
                FROM s
            )
            SELECT doc_id,
                   len(p) AS n_ids,
                   p[1] AS first_id,
                   p[len(p)] AS last_id,
                   CAST(list_sum(list_transform(p, (x, i) -> x * i))
                        AS BIGINT) AS checksum
            FROM t
        """,
        "events_top_value_per_type": """
            SELECT event_type, event_id, value FROM (
                SELECT event_type, event_id, value,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY value DESC, event_id ASC
                       ) AS rn
                FROM events
            ) WHERE rn <= 10
        """,
        "events_daily_user_agg": """
            SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   count(*) AS n, round(sum(value), 4) AS total
            FROM events GROUP BY user_id, day
        """,
        "users_first_event": """
            SELECT user_id, arg_min(event_id, ts) AS first_event_id
            FROM events GROUP BY user_id
        """,
        "events_sessionize": """
            WITH o AS (
                SELECT user_id, event_id, ts,
                       lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS pts
                FROM events
            ),
            marked AS (
                SELECT user_id, event_id, ts,
                       CASE WHEN pts IS NULL
                                 OR ts - pts > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_s
                FROM o
            ),
            sess AS (
                SELECT user_id,
                       sum(new_s) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS session_id
                FROM marked
            )
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events
            FROM sess GROUP BY user_id, session_id
        """,
        "events_replay_attach": """
            SELECT event_id,
                   issue_id,
                   CASE WHEN issue_id = event_id THEN 1 ELSE 0 END AS is_new
            FROM (
                SELECT event_id,
                       min(event_id) OVER (
                           PARTITION BY event_type, props
                           ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                       ) AS issue_id
                FROM events
            )
        """,
        "substring_pairs_exact": """
            WITH d AS (
                SELECT doc_id,
                       trim(regexp_replace(text, '\\s+', ' ', 'g')) AS t
                FROM documents
            ), g AS (
                SELECT DISTINCT doc_id, substring(t, CAST(i AS INT), 39) AS gram
                FROM d, UNNEST(generate_series(1, length(t) - 38)) AS u(i)
                WHERE length(t) >= 39
            )
            SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
            FROM g a JOIN g b USING (gram)
            WHERE a.doc_id < b.doc_id
        """,
        "events_replay_windowed": """
            WITH o AS (
                SELECT event_id, event_type, props, ts,
                       lag(ts) OVER (
                           PARTITION BY event_type, props
                           ORDER BY ts, event_id
                       ) AS prev_ts
                FROM events
            ), f AS (
                SELECT *,
                       CASE WHEN prev_ts IS NULL
                                 OR ts - prev_ts > INTERVAL 240 MINUTE
                            THEN 1 ELSE 0 END AS is_new_i
                FROM o
            ), s AS (
                SELECT *,
                       sum(is_new_i) OVER (
                           PARTITION BY event_type, props
                           ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW
                       ) AS sess
                FROM f
            )
            SELECT event_id,
                   first_value(event_id) OVER (
                       PARTITION BY event_type, props, sess
                       ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS issue_id,
                   CAST(is_new_i AS BIGINT) AS is_new
            FROM s
        """,
        "events_prev_same_type": """
            SELECT event_id, prev_event_id FROM (
                SELECT event_id,
                       lag(event_id) OVER (
                           PARTITION BY event_type ORDER BY ts, event_id
                       ) AS prev_event_id,
                       ts,
                       lag(ts) OVER (
                           PARTITION BY event_type ORDER BY ts, event_id
                       ) AS pts
                FROM events
            )
            WHERE pts IS NOT NULL AND ts - pts <= INTERVAL 60 MINUTE
        """,
        "systematic_sample": """
            SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0
        """,
        "normalized_texts": """
            SELECT doc_id,
                   lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
                       AS text_norm
            FROM documents
        """,
        "lineitem_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 4)
                       AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= DATE '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
        """,
        "segment_order_stats": """
            SELECT c.c_mktsegment,
                   count(*) AS n_orders,
                   round(max(o.o_totalprice), 4) AS max_price,
                   round(avg(o.o_totalprice), 4) AS avg_price
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "top_orders_by_revenue": """
            SELECT o.o_orderkey,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 4)
                       AS revenue,
                   o.o_orderdate
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderkey, o.o_orderdate
            ORDER BY revenue DESC, o.o_orderkey ASC
            LIMIT 10
        """,
        "knn_brute_force": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   round(list_cosine_similarity(e.embedding, q.qe), 4) AS cos
            FROM embeddings e, q
            WHERE e.vec_id != 0
            ORDER BY cos DESC, e.vec_id ASC
            LIMIT 10
        """,
        "knn_label_accuracy": """
            WITH sims AS (
                SELECT a.vec_id, a.label AS true_label, b.label AS cand_label,
                       list_cosine_similarity(a.embedding, b.embedding) AS cos,
                       b.vec_id AS bid
                FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
            ),
            ranked AS (
                SELECT *, row_number() OVER (
                    PARTITION BY vec_id ORDER BY cos DESC, bid ASC
                ) AS rn FROM sims
            )
            SELECT count(*) AS n,
                   CAST(sum(CASE WHEN cand_label = true_label
                                 THEN 1 ELSE 0 END) AS BIGINT)
                       AS correct,
                   round(sum(CASE WHEN cand_label = true_label THEN 1 ELSE 0 END)
                         * 1.0 / count(*), 4) AS accuracy
            FROM ranked WHERE rn = 1
        """,
        "retrieval_rank_metrics": """
            WITH sims AS (
                SELECT a.vec_id AS q, a.label AS ql, b.label AS cl,
                       list_cosine_similarity(a.embedding, b.embedding)
                           AS cos,
                       b.vec_id AS c
                FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
            ),
            ranked AS (
                SELECT q, ql, cl, row_number() OVER (
                    PARTITION BY q ORDER BY cos DESC, c ASC
                ) AS rn FROM sims
            ),
            firsts AS (
                SELECT q, min(CASE WHEN cl = ql THEN rn END) AS r
                FROM ranked WHERE rn <= 10 GROUP BY q
            )
            SELECT count(*) AS n_queries,
                   round(avg(CASE WHEN r = 1 THEN 1.0 ELSE 0.0 END), 4)
                       AS acc1,
                   round(avg(CASE WHEN r <= 3 THEN 1.0 ELSE 0.0 END), 4)
                       AS acc3,
                   round(avg(CASE WHEN r <= 5 THEN 1.0 ELSE 0.0 END), 4)
                       AS acc5,
                   round(avg(CASE WHEN r <= 10 THEN 1.0 ELSE 0.0 END), 4)
                       AS acc10,
                   round(avg(CASE WHEN r IS NOT NULL THEN 1.0 / r
                                  ELSE 0.0 END), 4) AS mrr10
            FROM firsts
        """,
        "threshold_fbeta_auc": """
            -- evaluator battery, SQL-expressible half (A6/A7): best
            -- F-beta over every threshold + rank-sum ROC-AUC with
            -- average tie ranks, over (top-1 cosine, top-1 label
            -- match). Scores quantized to 4 decimals on both engines
            -- so the threshold boundary set is identical.
            WITH sims AS (
                SELECT a.vec_id AS q, a.label AS ql, b.label AS cl,
                       list_cosine_similarity(a.embedding, b.embedding)
                           AS cos,
                       b.vec_id AS c
                FROM embeddings a JOIN embeddings b
                  ON a.vec_id != b.vec_id
            ),
            tops AS (
                SELECT q, round(cos, 4) AS s,
                       CASE WHEN cl = ql THEN 1 ELSE 0 END AS y
                FROM (SELECT *, row_number() OVER (
                          PARTITION BY q ORDER BY cos DESC, c ASC
                      ) AS rn FROM sims)
                WHERE rn = 1
            ),
            n AS (SELECT count(*) AS cnt, sum(y) AS npos FROM tops),
            ranked AS (
                SELECT s, y,
                       row_number() OVER (ORDER BY s DESC) AS rid
                FROM tops
            ),
            cum AS (
                SELECT s,
                       sum(y) OVER (ORDER BY s DESC, rid) AS tp,
                       sum(1 - y) OVER (ORDER BY s DESC, rid) AS fp
                FROM ranked
            ),
            conf AS (
                SELECT s AS t, max(tp) AS tp, max(fp) AS fp
                FROM cum GROUP BY s
            ),
            fb AS (
                SELECT b.lbl, c.t,
                       CASE WHEN (1 + b.b2) * c.tp + c.fp
                                 + b.b2 * ((SELECT npos FROM n) - c.tp)
                                 > 0
                            THEN (1 + b.b2) * c.tp
                                 / ((1 + b.b2) * c.tp + c.fp
                                    + b.b2 * ((SELECT npos FROM n)
                                              - c.tp))
                            ELSE 0.0 END AS f
                FROM conf c
                CROSS JOIN (VALUES ('0.25', 0.0625), ('0.5', 0.25),
                                   ('1.0', 1.0), ('2.0', 4.0),
                                   ('3.0', 9.0)) AS b(lbl, b2)
            ),
            best AS (
                SELECT lbl, f, t FROM (
                    SELECT *, row_number() OVER (
                        PARTITION BY lbl ORDER BY f DESC, t DESC
                    ) AS rn FROM fb)
                WHERE rn = 1
            ),
            rr AS (
                SELECT y, avg(rn) OVER (PARTITION BY s) AS ar
                FROM (SELECT s, y,
                             row_number() OVER (ORDER BY s ASC) AS rn
                      FROM tops)
            ),
            auc AS (
                SELECT (sum(CASE WHEN y = 1 THEN ar END)
                        - (SELECT npos FROM n)
                          * ((SELECT npos FROM n) + 1) / 2.0)
                       / ((SELECT npos FROM n)
                          * ((SELECT cnt FROM n)
                             - (SELECT npos FROM n))) AS v
                FROM rr
                WHERE (SELECT npos FROM n) > 0
                  AND (SELECT npos FROM n) < (SELECT cnt FROM n)
            )
            SELECT 'f' || lbl AS metric, round(f, 4) AS value FROM best
            UNION ALL
            SELECT 'f' || lbl || '_threshold', round(t, 4) FROM best
            UNION ALL
            SELECT 'roc_auc', round(v, 4) FROM auc
        """,
        "bootstrap_acc1_ci": """
            -- percentile bootstrap CI of Accuracy@1 (A8) with the
            -- deterministic Lehmer-LCG resampler (two MINSTD rounds;
            -- all intermediates < 2^47 so BIGINT math is exact and
            -- identical to the numpy int64 path). CI bounds are
            -- DISCRETE order statistics of the per-iteration success
            -- SUMS (ranks 3 and 98 of 100), and every ratio is
            -- rounded half-up via pure integer arithmetic
            -- ((num*20000 + den) // (2*den) / 10000.0) so the result
            -- is exact-int64 end to end -- no float quantile
            -- interpolation that could round differently per engine.
            WITH sims AS (
                SELECT a.vec_id AS q, a.label AS ql, b.label AS cl,
                       list_cosine_similarity(a.embedding, b.embedding)
                           AS cos,
                       b.vec_id AS c
                FROM embeddings a JOIN embeddings b
                  ON a.vec_id != b.vec_id
            ),
            tops AS (
                SELECT q, CASE WHEN cl = ql THEN 1 ELSE 0 END AS y
                FROM (SELECT *, row_number() OVER (
                          PARTITION BY q ORDER BY cos DESC, c ASC
                      ) AS rn FROM sims)
                WHERE rn = 1
            ),
            ord AS (
                SELECT y, row_number() OVER (ORDER BY q) - 1 AS idx
                FROM tops
            ),
            n AS (SELECT count(*) AS cnt FROM ord),
            draws AS (
                -- draw index j ranges over 0..n-1 = ord.idx itself
                -- (generate_series can't take a subquery bound here)
                SELECT i.i,
                       (((((i.i * 1000003 + j.idx) % 2147483646 + 1)
                          * 48271 % 2147483647)
                         * 48271 % 2147483647))
                       % (SELECT cnt FROM n) AS pick
                FROM generate_series(0, 99) AS i(i), ord AS j
            ),
            sums AS (
                SELECT d.i, sum(o.y) AS s
                FROM draws d JOIN ord o ON o.idx = d.pick
                GROUP BY d.i
            ),
            ranked AS (
                SELECT s, row_number() OVER (ORDER BY s) AS rk
                FROM sums
            )
            SELECT 'acc1_mean' AS metric,
                   ((sum(y) * 20000 + (SELECT cnt FROM n))
                    // (2 * (SELECT cnt FROM n))) / 10000.0 AS value
            FROM ord
            UNION ALL
            SELECT 'acc1_ci_lo',
                   ((s * 20000 + (SELECT cnt FROM n))
                    // (2 * (SELECT cnt FROM n))) / 10000.0
            FROM ranked WHERE rk = 3
            UNION ALL
            SELECT 'acc1_ci_hi',
                   ((s * 20000 + (SELECT cnt FROM n))
                    // (2 * (SELECT cnt FROM n))) / 10000.0
            FROM ranked WHERE rk = 98
        """,
        "same_label_near_pairs": """
            SELECT a.vec_id AS src, b.vec_id AS dst,
                   round(list_cosine_similarity(a.embedding, b.embedding), 4)
                       AS cos
            FROM embeddings a JOIN embeddings b
              ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.4
        """,
    }
    # the full evaluator battery = union of its two deterministic
    # halves (the engine side composes the same halves off one ranks
    # pass; the driver's compare is row-order-insensitive)
    sqls["retrieval_threshold_metrics"] = (
        f"SELECT * FROM ({sqls['threshold_fbeta_auc']}) "
        f"UNION ALL SELECT * FROM ({sqls['bootstrap_acc1_ci']})"
    )
    return sqls
