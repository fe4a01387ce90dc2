"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

- ``entry()``: flagship CDC replay over the input_hint table shape
  (synthetic change events on (repo, path) keys -> exactly-once upserted
  lake), returning the live table as a Dataset.
- ``queries()``: 121 pipelines — one per operator family from SURVEY.md
  section 2 (flatten/validate/evolve/joins incl. as-of [plain +
  range-sharded], anti/semi [direct + Bloom-prefiltered], windowed
  aggregates incl. RANGE-frame sliding windows, exact + histogram
  quantiles, partitioned writes, nested struct/list projection) plus
  the training-data operators (dedup exact/minhash/simhash/ngram/
  embedding, ANN search, text analysis incl. Gopher-style repetition,
  real-PNG multimodal chains). SURVEY.md section 8 maps each to its
  implementation.
- ``oracle_sql()``: DuckDB-equivalent SQL per query (50 hash-exact —
  exactly filling the driver's 50-entry correctness window; the
  ordering contract below keeps every oracle-backed entry inside it).
  Aggregates use scaled-integer measures (cents / e4 / e6) so engine
  and oracle match bit-for-bit. The tail beyond the window is pytest-
  gated: fuzzy/codec operators (minhash/simhash LSH, IVF-ANN, lang-id,
  media chains) have recall/error-bound/pixel oracles, and the
  SQL-expressible tail entries (decontaminate, vocab_topk) carry their
  own hash-exact DuckDB comparisons in tests/ since the window is
  saturated.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from glue_etl_pipeline_ray.pipelines import queries as Q


def entry() -> Any:
    """Flagship pipeline: CDC replay over the BASELINE.json input_hint
    table shape — deterministic synthetic change events on
    ``(repo, path, commit, lang, content)`` keys, replayed through the
    pipelined exchange into an upserted lake; returns the live table as
    a streaming Dataset (stable 5-column schema)."""
    import os
    import tempfile

    from glue_etl_pipeline_ray.gen import generate_change_events
    from glue_etl_pipeline_ray.pipelines.replay import ReplayEngine
    from glue_etl_pipeline_ray.spec import repo_file_spec

    work = tempfile.mkdtemp(prefix="gepr_entry_")
    meta = generate_change_events(
        work, n_events=6_000, n_repos=12, n_paths=40, n_batches=3,
        evolve_from_batch=None, seed=42,
    )
    eng = ReplayEngine(repo_file_spec(num_buckets=16), os.path.join(work, "lake"))
    eng.replay(meta["events_dir"])
    return eng.final_dataset()


def queries() -> dict[str, Callable[[str], Any]]:
    # ORDERING CONTRACT: every oracle-backed (hash-exact) query precedes
    # every no-oracle one, so the driver's correctness window (first 50
    # entries) always covers the full hash-exact set.  Enforced by
    # tests/test_entry_queries.py::test_oracle_backed_queries_come_first.
    return {
        # ---- oracle-backed (hash-exact vs DuckDB) ----
        # CDC / engine core
        "cdc_lww_upsert": Q.q_cdc_lww_upsert,
        "cdc_change_feed": Q.q_cdc_change_feed,
        "cdc_incremental_view": Q.q_cdc_incremental_view,
        "cdc_replicate": Q.q_cdc_replicate,
        "cdc_dead_letter": Q.q_cdc_dead_letter,
        # flatten / project / normalize / evolve
        "flatten_project_json": Q.q_flatten_project_json,
        "partition_derive": Q.q_partition_derive,
        "type_normalize": Q.q_type_normalize,
        "schema_union_backfill": Q.q_schema_union_backfill,
        "str_list_promote": Q.q_str_list_promote,
        "nested_project": Q.q_nested_project,
        "partitioned_write": Q.q_partitioned_write,
        "event_audit": Q.q_event_audit,
        # joins
        "broadcast_lookup_join": Q.q_broadcast_lookup_join,
        "anti_join_inactive": Q.q_anti_join_inactive,
        "anti_join_bloom": Q.q_anti_join_bloom,
        "semi_join_active": Q.q_semi_join_active,
        "asof_prev_order": Q.q_asof_prev_order,
        "asof_prev_order_sharded": Q.q_asof_prev_order_sharded,
        "hash_join_orders": Q.q_hash_join_orders,
        # aggregations / sort / limit
        "classify_counts": Q.q_classify_counts,
        "tumbling_window": Q.q_tumbling_window,
        "session_windows": Q.q_session_windows,
        "pricing_summary": Q.q_pricing_summary,
        "topk_users": Q.q_topk_users,
        "distinct_users": Q.q_distinct_users,
        "topk_per_group": Q.q_topk_per_group,
        "cumsum_per_user": Q.q_cumsum_per_user,
        "sliding_window_30m": Q.q_sliding_window_30m,
        "grouped_quantiles": Q.q_grouped_quantiles,
        "value_quantiles_hist": Q.q_value_quantiles_hist,
        "user_event_paths": Q.q_user_event_paths,
        "pivot_counts": Q.q_pivot_counts,
        # documents: dedup + text analysis (exact variants)
        "hash_sample": Q.q_hash_sample,
        "dedup_exact": Q.q_dedup_exact,
        "dedup_ngram_jaccard": Q.q_dedup_ngram_jaccard,
        "doc_fingerprint": Q.q_doc_fingerprint,
        "token_stats": Q.q_token_stats,
        "token_stats_bpe": Q.q_token_stats_bpe,
        "quality_score": Q.q_quality,
        "doc_repetition": Q.q_doc_repetition,
        # embeddings: exact similarity
        "ann_cosine_topk": Q.q_ann_cosine_topk,
        "dedup_embed_cosine": Q.q_dedup_embed_cosine,
        # round-3 additions (all hash-exact)
        "dedup_clusters": Q.q_dedup_clusters,
        "pii_redact": Q.q_pii_redact,
        "lag_lead": Q.q_lag_lead,
        "range_band_join": Q.q_range_band_join,
        "rollup_agg": Q.q_rollup_agg,
        "grouped_mode": Q.q_grouped_mode,
        "shipping_priority": Q.q_shipping_priority,
        # ---- pytest-gated tail (beyond the driver's 50-entry window):
        # sketches/LSH/codecs have recall / error-bound / pixel oracles;
        # decontaminate + vocab_topk have hash-exact DuckDB gates in
        # tests/ (the window above is saturated) ----
        "decontaminate": Q.q_decontaminate,
        "doc_chunk": Q.q_doc_chunk,
        "dataset_split": Q.q_dataset_split,
        "mixture_sample": Q.q_mixture_sample,
        "domain_cap": Q.q_domain_cap,
        "vocab_topk": Q.q_vocab_topk,
        "shuffle_train_order": Q.q_shuffle_train_order,
        "range_scan_pruned": Q.q_range_scan_pruned,
        "zorder_box_scan": Q.q_zorder_box_scan,
        "embed_project": Q.q_embed_project,
        "tfidf_terms": Q.q_tfidf_terms,
        "novel_content_filter": Q.q_novel_content_filter,
        "dedup_substring": Q.q_dedup_substring,
        "dedup_segments": Q.q_dedup_segments,
        "dedup_fuzzy_keep_one": Q.q_dedup_fuzzy_keep_one,
        "cdc_pruned_scan": Q.q_cdc_pruned_scan,
        "profile_table": Q.q_profile_table,
        "training_data_pipeline": Q.q_training_data_pipeline,
        "interval_join": Q.q_interval_join,
        "embed_kmeans": Q.q_embed_kmeans,
        "dedup_semantic": Q.q_dedup_semantic,
        "sequence_pack": Q.q_sequence_pack,
        "topk_users_sketch": Q.q_topk_users_sketch,
        "distinct_users_hll": Q.q_distinct_users_hll,
        "value_quantiles_sketch": Q.q_value_quantiles_sketch,
        "grouped_quantiles_sketch": Q.q_grouped_quantiles_sketch,
        "dedup_minhash": Q.q_dedup_minhash,
        "dedup_simhash": Q.q_dedup_simhash,
        "rolling_fingerprint": Q.q_rolling_fingerprint,
        "lang_id": Q.q_lang_id,
        "unigram_logprob": Q.q_unigram_logprob,
        "ann_ivf_topk": Q.q_ann_ivf_topk,
        "ann_project_rerank": Q.q_ann_project_rerank,
        "text_normalize": Q.q_text_normalize,
        "dedup_embed_lsh": Q.q_dedup_embed_lsh,
        "media_decode_real": Q.q_media_decode_real,
        "media_embed_real": Q.q_media_embed_real,
        "media_decode": Q.q_media_decode,
        "media_resize": Q.q_media_resize,
        "frame_sample_real": Q.q_frame_sample_real,
        "frame_sample": Q.q_frame_sample,
        "media_embed": Q.q_media_embed,
        "bm25_topk": Q.q_bm25_topk,
        "left_outer_join": Q.q_left_outer_join,
        "grouped_distinct_hll": Q.q_grouped_distinct_hll,
        "cdc_redrive": Q.q_cdc_redrive,
        "cdc_reshard": Q.q_cdc_reshard,
        "cdc_backfill": Q.q_cdc_backfill,
        "cdc_delete_where": Q.q_cdc_delete_where,
        "cdc_update_where": Q.q_cdc_update_where,
        "cdc_merge_into": Q.q_cdc_merge_into,
        "cdc_restore": Q.q_cdc_restore,
        "rows_frame_agg": Q.q_rows_frame_agg,
        "classifier_score": Q.q_classifier_score,
        "rank_functions": Q.q_rank_functions,
        "pagerank_suppliers": Q.q_pagerank_suppliers,
        "grouped_stats": Q.q_grouped_stats,
        "corr_qty_price": Q.q_corr_qty_price,
        "cube_agg": Q.q_cube_agg,
        "scd2_history": Q.q_scd2_history,
        "full_outer_join": Q.q_full_outer_join,
        "vocab_lev1": Q.q_vocab_lev1,
        "triangle_count": Q.q_triangle_count,
        "bpe_train": Q.q_bpe_train,
        "copurchase_cosine": Q.q_copurchase_cosine,
        "dedup_phash": Q.q_dedup_phash,
        "ann_pq_topk": Q.q_ann_pq_topk,
        "cdc_filter_scan": Q.q_cdc_filter_scan,
        "decontaminate_embed": Q.q_decontaminate_embed,
        "dedup_phash_keep_one": Q.q_dedup_phash_keep_one,
        "topk_per_group_sketch": Q.q_topk_per_group_sketch,
    }


def oracle_sql() -> dict[str, str]:
    stop = "('the', 'a', 'data', 'value', 'row')"
    enum = "('click', 'view', 'purchase', 'signup')"
    return {
        "cdc_lww_upsert": f"""
            SELECT CAST(user_id AS VARCHAR) AS user_id,
                   event_type,
                   CAST(round(value * 100) AS BIGINT) AS value_cents
            FROM (
                SELECT user_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY event_id DESC) AS rn
                FROM events
            )
            WHERE rn = 1 AND event_type <> 'error'
        """,
        "cdc_replicate": f"""
            -- the CDF-replicated downstream lake must equal the LWW
            -- snapshot (same contract as cdc_lww_upsert)
            SELECT CAST(user_id AS VARCHAR) AS user_id,
                   event_type,
                   CAST(round(value * 100) AS BIGINT) AS value_cents
            FROM (
                SELECT user_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY event_id DESC) AS rn
                FROM events
            )
            WHERE rn = 1 AND event_type <> 'error'
        """,
        "cdc_change_feed": """
            -- net insert/update/delete set between the batch<=1 and
            -- batch<=3 LWW snapshots of the derived change stream
            -- (batch = event_id % 4, seq = event_id, error -> DELETE)
            WITH cdc AS (
                SELECT CAST(user_id AS VARCHAR) AS user_id, event_type,
                       CAST(round(value * 100) AS BIGINT) AS value_cents,
                       event_id AS seq, event_id % 4 AS batch,
                       (event_type = 'error') AS is_del
                FROM events
            ),
            snap_old AS (
                SELECT user_id, event_type, value_cents FROM (
                    SELECT *, row_number() OVER (PARTITION BY user_id
                                                 ORDER BY seq DESC) rn
                    FROM cdc WHERE batch <= 1
                ) WHERE rn = 1 AND NOT is_del
            ),
            snap_new AS (
                SELECT user_id, event_type, value_cents FROM (
                    SELECT *, row_number() OVER (PARTITION BY user_id
                                                 ORDER BY seq DESC) rn
                    FROM cdc WHERE batch <= 3
                ) WHERE rn = 1 AND NOT is_del
            )
            SELECT COALESCE(n.user_id, o.user_id) AS user_id,
                   CASE WHEN n.user_id IS NULL THEN o.event_type
                        ELSE n.event_type END AS event_type,
                   CASE WHEN n.user_id IS NULL THEN o.value_cents
                        ELSE n.value_cents END AS value_cents,
                   CASE WHEN o.user_id IS NULL THEN 'insert'
                        WHEN n.user_id IS NULL THEN 'delete'
                        ELSE 'update' END AS change_type
            FROM snap_new n FULL OUTER JOIN snap_old o
              ON n.user_id = o.user_id
            WHERE o.user_id IS NULL OR n.user_id IS NULL
               OR n.event_type IS DISTINCT FROM o.event_type
               OR n.value_cents IS DISTINCT FROM o.value_cents
        """,
        "cdc_incremental_view": """
            -- the incrementally-maintained view must equal a direct
            -- aggregate over the final (batch<=3) LWW live snapshot
            WITH cdc AS (
                SELECT CAST(user_id AS VARCHAR) AS user_id, event_type,
                       CAST(round(value * 100) AS BIGINT) AS value_cents,
                       event_id AS seq, event_id % 4 AS batch,
                       (event_type = 'error') AS is_del
                FROM events
            ),
            snap_new AS (
                SELECT user_id, event_type, value_cents FROM (
                    SELECT *, row_number() OVER (PARTITION BY user_id
                                                 ORDER BY seq DESC) rn
                    FROM cdc WHERE batch <= 3
                ) WHERE rn = 1 AND NOT is_del
            )
            SELECT event_type, count(*) AS n_rows,
                   CAST(sum(value_cents) AS BIGINT) AS sum_value_cents
            FROM snap_new GROUP BY event_type
        """,
        "cdc_dead_letter": f"""
            SELECT event_id,
                   concat_ws(';',
                       CASE WHEN event_type NOT IN {enum}
                            THEN 'enum:event_type' END,
                       CASE WHEN value < 0 OR value > 90
                            THEN 'range:value' END) AS error
            FROM events
            WHERE event_type NOT IN {enum} OR value < 0 OR value > 90
        """,
        "event_audit": f"""
            SELECT event_id,
                   CAST(event_type IN {enum}
                        AND value >= 0 AND value <= 90 AS BIGINT) AS passed,
                   concat_ws(';',
                       CASE WHEN event_type NOT IN {enum}
                            THEN 'enum:event_type' END,
                       CASE WHEN value < 0 OR value > 90
                            THEN 'range:value' END) AS error
            FROM events
        """,
        "flatten_project_json": """
            SELECT event_id, user_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events
        """,
        "partition_derive": """
            SELECT year(ts) AS year, month(ts) AS month, day(ts) AS day,
                   hour(ts) AS hour, count(*) AS n_events
            FROM events GROUP BY 1, 2, 3, 4
        """,
        "type_normalize": """
            SELECT event_id, upper(event_type) AS event_type_uc,
                   CAST(round(value * 100) AS BIGINT) AS value_cents
            FROM events
        """,
        "schema_union_backfill": """
            SELECT event_id, CAST(round(value * 100) AS BIGINT) AS value_cents,
                   CAST(NULL AS VARCHAR) AS extra
            FROM events WHERE ts < TIMESTAMP '2024-02-01'
            UNION ALL
            SELECT event_id, CAST(round(value * 100) AS BIGINT) AS value_cents,
                   event_type AS extra
            FROM events WHERE ts >= TIMESTAMP '2024-02-01'
        """,
        "str_list_promote": """
            -- expected promotion OUTPUTS derived from the raw JSON column;
            -- the wire SHAPE selector is md5(props) computed independently
            -- here (DuckDB md5) and in the engine (hashlib), so this CASE
            -- cannot share the engine's synthesis arithmetic
            SELECT event_id,
                   CASE WHEN sel = 0 THEN CAST(2 AS BIGINT)
                        WHEN sel = 1 THEN 1 ELSE 0 END AS n_tags,
                   CASE WHEN sel = 0 THEN 'k' || k || ',x'
                        WHEN sel = 1 THEN 'k' || k ELSE '' END
                       AS tags_joined
            FROM (
                SELECT event_id,
                       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
                       (strpos('0123456789abcdef',
                               substr(md5(props), 1, 1)) - 1) % 3 AS sel
                FROM events
            )
        """,
        "nested_project": """
            SELECT event_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k,
                   event_type AS meta_type,
                   CAST(round(value * 100) AS BIGINT) AS first_v_cents
            FROM events
        """,
        "partitioned_write": """
            SELECT year(ts) AS year, month(ts) AS month, day(ts) AS day,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2, 3
        """,
        "broadcast_lookup_join": """
            SELECT r.r_name AS region_name, count(*) AS n_customers
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY 1
        """,
        "anti_join_inactive": """
            SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM events e
                              WHERE e.user_id = c.c_custkey)
        """,
        "anti_join_bloom": """
            SELECT c_custkey FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM events e
                              WHERE e.user_id = c.c_custkey)
        """,
        "semi_join_active": """
            SELECT c_custkey FROM customer c
            WHERE EXISTS (SELECT 1 FROM events e
                          WHERE e.user_id = c.c_custkey)
        """,
        "sliding_window_30m": """
            SELECT event_id, user_id,
                   CAST(count(*) OVER w AS BIGINT) AS n_last_30m,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w
                        AS BIGINT) AS cents_last_30m
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 30 MINUTE PRECEDING
                         AND CURRENT ROW)
        """,
        "grouped_quantiles": """
            SELECT event_type, count(*) AS n,
                   quantile_disc(cents, 0.5) AS p50_cents,
                   quantile_disc(cents, 0.9) AS p90_cents
            FROM (SELECT event_type,
                         CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
            GROUP BY 1
        """,
        "value_quantiles_hist": """
            SELECT CAST(count(*) AS BIGINT) AS n,
                   quantile_disc(cents, 0.5) AS p50_cents,
                   quantile_disc(cents, 0.9) AS p90_cents,
                   quantile_disc(cents, 0.99) AS p99_cents
            FROM (SELECT CAST(round(value * 100) AS BIGINT) AS cents
                  FROM events)
        """,
        "user_event_paths": """
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                   string_agg(event_type, '>' ORDER BY ts, event_id)
                       AS event_path
            FROM events GROUP BY 1
        """,
        "pivot_counts": f"""
            SELECT user_id,
                   {', '.join(
                       "CAST(sum(CASE WHEN event_type = '" + c + "'"
                       " THEN 1 ELSE 0 END) AS BIGINT) AS n_" + c
                       for c in ('click', 'view', 'purchase', 'signup')
                   )},
                   CAST(sum(CASE WHEN event_type = 'purchase'
                            THEN CAST(round(value * 100) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS cents_purchase
            FROM events GROUP BY 1
        """,
        "hash_join_orders": """
            SELECT c.c_mktsegment,
                   CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS price_cents,
                   count(*) AS n_orders
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY 1
        """,
        "asof_prev_order": """
            SELECT a.o_orderkey,
                   strftime(b.o_orderdate, '%Y-%m-%d') AS prev_order_date
            FROM orders a
            ASOF LEFT JOIN orders b
              ON a.o_custkey = b.o_custkey AND a.o_orderdate > b.o_orderdate
        """,
        "asof_prev_order_sharded": """
            SELECT a.o_orderkey,
                   strftime(b.o_orderdate, '%Y-%m-%d') AS prev_order_date
            FROM orders a
            ASOF LEFT JOIN orders b
              ON a.o_custkey = b.o_custkey AND a.o_orderdate > b.o_orderdate
        """,
        "classify_counts": """
            SELECT event_type, count(*) AS n FROM events GROUP BY 1
        """,
        "tumbling_window": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                       AS window_start,
                   event_type,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS value_cents,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "session_windows": """
            WITH o AS (
                SELECT user_id, ts, event_id,
                       CAST(round(value * 100) AS BIGINT) AS cents,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), s AS (
                -- order by (ts, event_id) like the brk window: under a
                -- tied ts the prefix sum would otherwise split sessions
                -- differently from the engine's sorted-ts gap pass
                SELECT user_id, ts, cents,
                       sum(brk) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS sid
                FROM o
            )
            SELECT user_id,
                   strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
                   count(*) AS n_events,
                   CAST(sum(cents) AS BIGINT) AS sum_cents
            FROM s GROUP BY user_id, sid
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(qty) AS BIGINT) AS sum_qty_x100,
                   CAST(sum(price) AS BIGINT) AS sum_base_cents,
                   CAST(sum(price * (100 - disc)) AS BIGINT) AS sum_disc_e4,
                   CAST(sum(price * (100 - disc) * (100 + tax)) AS BIGINT)
                       AS sum_charge_e6,
                   count(*) AS count_order
            FROM (
                SELECT l_returnflag, l_linestatus,
                       CAST(round(l_quantity * 100) AS BIGINT) AS qty,
                       CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
                       CAST(round(l_discount * 100) AS BIGINT) AS disc,
                       CAST(round(l_tax * 100) AS BIGINT) AS tax
                FROM lineitem
                WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            )
            GROUP BY 1, 2
        """,
        "topk_users": """
            SELECT user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                       AS total_cents
            FROM events GROUP BY 1
            ORDER BY total_cents DESC, user_id LIMIT 10
        """,
        "token_stats_bpe": """
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text,
                        ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))
                        AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "topk_per_group": """
            SELECT o_custkey, o_orderkey, price_cents, rank FROM (
                SELECT o_custkey, o_orderkey,
                       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
                       row_number() OVER (
                           PARTITION BY o_custkey
                           ORDER BY round(o_totalprice * 100) DESC, o_orderkey
                       ) AS rank
                FROM orders
            ) WHERE rank <= 3
        """,
        "cumsum_per_user": """
            SELECT event_id, user_id,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS running_cents
            FROM events
        """,
        "distinct_users": """
            SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_users
            FROM events
        """,
        "hash_sample": """
            SELECT doc_id, text FROM documents WHERE md5(text) < '20'
        """,
        "dedup_exact": """
            SELECT doc_id, text, lang, source, n_chars FROM (
                SELECT *, row_number() OVER (PARTITION BY md5(text)
                                             ORDER BY doc_id) AS rn
                FROM documents
            ) WHERE rn = 1
        """,
        "dedup_ngram_jaccard": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
                FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
                WHERE len(t) >= 3
                UNION
                SELECT doc_id, array_to_string(t, ' ') AS shingle
                FROM toks WHERE len(t) < 3
            ), sizes AS (
                SELECT doc_id, count(*) AS size FROM sh GROUP BY doc_id
            ), pairs AS (
                SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                       count(*) AS inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle
                                   AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            )
            SELECT p.doc_id_a, p.doc_id_b, sa.size AS size_a,
                   sb.size AS size_b, CAST(p.inter AS BIGINT) AS inter
            FROM pairs p
            JOIN sizes sa ON sa.doc_id = p.doc_id_a
            JOIN sizes sb ON sb.doc_id = p.doc_id_b
            WHERE 5 * p.inter >= 4 * (sa.size + sb.size - p.inter)
        """,
        "dedup_clusters": """
            -- connected components over the exact Jaccard>=0.8 duplicate
            -- graph (same pairs CTE as dedup_ngram_jaccard); component
            -- label = min reachable doc_id
            WITH RECURSIVE toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), sh AS (
                SELECT DISTINCT doc_id,
                       t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
                FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
                WHERE len(t) >= 3
                UNION
                SELECT doc_id, array_to_string(t, ' ') AS shingle
                FROM toks WHERE len(t) < 3
            ), sizes AS (
                SELECT doc_id, count(*) AS size FROM sh GROUP BY doc_id
            ), cand AS (
                SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS inter
                FROM sh a JOIN sh b ON a.shingle = b.shingle
                                   AND a.doc_id < b.doc_id
                GROUP BY 1, 2
            ), dup AS (
                SELECT c.da, c.db FROM cand c
                JOIN sizes sa ON sa.doc_id = c.da
                JOIN sizes sb ON sb.doc_id = c.db
                WHERE 5 * c.inter >= 4 * (sa.size + sb.size - c.inter)
            ), edges AS (
                SELECT da AS a, db AS b FROM dup
                UNION SELECT db, da FROM dup
            ), reach(node, r) AS (
                SELECT a, b FROM edges
                UNION
                SELECT reach.node, e.b FROM reach
                JOIN edges e ON reach.r = e.a
            )
            SELECT CAST(node AS BIGINT) AS doc_id,
                   CAST(least(node, min(r)) AS BIGINT) AS cluster_id
            FROM reach GROUP BY node
        """,
        "pii_redact": """
            SELECT c_custkey,
                   regexp_replace(c_name, '[0-9]+', '<NUMID>', 'g')
                       AS c_name_redacted,
                   CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT)
                       AS n_numid
            FROM customer
        """,
        "lag_lead": """
            SELECT event_id, user_id,
                   LAG(CAST(round(value * 100) AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY event_id)
                       AS prev_cents,
                   LEAD(CAST(round(value * 100) AS BIGINT))
                       OVER (PARTITION BY user_id ORDER BY event_id)
                       AS next_cents
            FROM events
        """,
        "range_band_join": """
            SELECT e.event_id, CAST(b.band_id AS BIGINT) AS band_id,
                   CAST(round(e.value * 100) AS BIGINT) AS value_cents
            FROM events e
            JOIN (VALUES (0, 0, 1500), (1, 1500, 3000), (2, 3000, 4500),
                         (3, 4500, 6000), (4, 6000, 7500), (5, 7500, 9100))
                 AS b(band_id, lo, hi)
              ON round(e.value * 100) >= b.lo
             AND round(e.value * 100) < b.hi
        """,
        "rollup_agg": """
            SELECT CAST(year(ts) AS BIGINT) AS year,
                   CAST(month(ts) AS BIGINT) AS month,
                   count(*) AS n_events,
                   CAST(sum(round(value * 100)) AS BIGINT) AS sum_value_cents
            FROM events GROUP BY 1, 2
            UNION ALL
            SELECT CAST(year(ts) AS BIGINT), -1, count(*),
                   CAST(sum(round(value * 100)) AS BIGINT)
            FROM events GROUP BY 1
            UNION ALL
            SELECT -1, -1, count(*),
                   CAST(sum(round(value * 100)) AS BIGINT)
            FROM events
        """,
        "shipping_priority": """
            -- TPC-H Q3 shape; revenue in int64 cents via floor() so both
            -- engines compute identical integers (no round-half ambiguity)
            SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
                   CAST(sum(CAST(floor(
                       l.l_extendedprice * (1 - l.l_discount) * 100
                   ) AS BIGINT)) AS BIGINT) AS rev_cents
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'BUILDING'
              AND o.o_orderdate < TIMESTAMP '1998-06-01'
              AND l.l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY 1, 2, 3
            ORDER BY rev_cents DESC, l.l_orderkey ASC
            LIMIT 10
        """,
        "grouped_mode": """
            SELECT user_id, mode_type, n FROM (
                SELECT user_id, event_type AS mode_type,
                       count(*) AS n,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY count(*) DESC,
                                                   event_type ASC) AS rn
                FROM events GROUP BY user_id, event_type
            ) WHERE rn = 1
        """,
        "doc_fingerprint": """
            SELECT doc_id, md5(text) AS fp FROM documents
        """,
        "token_stats": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                       AS n_uniq_tokens
            FROM documents
        """,
        "quality_score": f"""
            SELECT doc_id, n_tokens, n_stopwords,
                   (n_tokens >= 5 AND n_tokens <= 100000
                    AND n_stopwords * 2 <= n_tokens) AS is_quality
            FROM (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                       CAST(len(list_filter(string_split(text, ' '),
                                            x -> x IN {stop})) AS BIGINT)
                           AS n_stopwords
                FROM documents
            )
        """,
        "doc_repetition": """
            WITH toks AS (
                SELECT doc_id, string_split(text, ' ') AS t FROM documents
            ), bi AS (
                SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
                FROM toks, UNNEST(range(1, len(t))) AS u(i)
                WHERE len(t) >= 2
            ), cnt AS (
                SELECT doc_id, bg, count(*) AS c FROM bi GROUP BY 1, 2
            )
            SELECT doc_id,
                   CAST(sum(c) AS BIGINT) AS n_bigrams,
                   CAST(sum(c) - count(*) AS BIGINT) AS n_dup_bigrams,
                   CAST(max(c) AS BIGINT) AS top_bigram_n
            FROM cnt GROUP BY 1
        """,
        "ann_cosine_topk": """
            WITH q AS (
                SELECT vec_id AS query_id, embedding AS qe
                FROM embeddings WHERE vec_id < 5
            ), sims AS (
                SELECT q.query_id, e.vec_id,
                       list_cosine_similarity(q.qe, e.embedding) AS sim
                FROM q, embeddings e WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, CAST(rn AS BIGINT) AS rank, vec_id FROM (
                SELECT query_id, vec_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY sim DESC, vec_id) AS rn
                FROM sims
            ) WHERE rn <= 10
        """,
        "dedup_embed_cosine": """
            SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
            FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
        """,
        # rows-only (non-SQL-expressible): dedup_embed_lsh, dedup_minhash, dedup_simhash,
        # dedup_phash, rolling_fingerprint, lang_id, ann_ivf_topk, ann_pq_topk,
        # media_decode, frame_sample
    }
